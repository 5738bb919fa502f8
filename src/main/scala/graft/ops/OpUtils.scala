package graft.ops

private[graft] object OpUtils {

  /** Helper-column name absent from `taken` — compared
    * case-INsensitively, because Spark resolves column names
    * case-insensitively by default, so a fixed "__bin" would clobber a
    * caller's "__BIN" even though the strings differ. */
  def freshCol(taken: Iterable[String], base: String): String = {
    val lower = taken.map(_.toLowerCase).toSet
    var n = base
    var i = 0
    while (lower.contains(n.toLowerCase)) { i += 1; n = s"$base$i" }
    n
  }
}
