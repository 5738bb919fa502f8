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

  /** Parallelism floor for CPU-dense narrow stages (media codec decode,
    * tokenize+shingle). A narrow stage runs only as wide as its input's
    * partition count, regardless of cores: a blob table read from a
    * couple of parquet files decodes 2-wide on a 32-core host — the
    * round-10 quiet-window adjudication measured exactly that (2.0-2.4x
    * on llm19/llm32/llm58 from a 32-file → 2-file layout change, and
    * worse still on a 1-file layout). When the incoming partitioning is
    * narrower than half the session default parallelism, repartition up
    * to the default; otherwise pass through untouched. At 100 TB a scan
    * has thousands of partitions, so the floor is a no-op by
    * construction — it only ever fires on narrow inputs, where the
    * shuffle it inserts is small for the same reason the input is
    * narrow. Decode cost dominates blob-shuffle cost by orders of
    * magnitude whenever the branch triggers. Streaming frames pass
    * through (micro-batch partitioning is the planner's). */
  def parallelismFloor(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (target > 1 && df.rdd.getNumPartitions < math.max(2, target / 2))
        df.repartition(target)
      else df
    }
  }
}
