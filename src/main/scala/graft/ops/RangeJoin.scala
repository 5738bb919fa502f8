package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join (point-in-interval). Spark plans a bare
  * `l.v BETWEEN r.lo AND r.hi` join as broadcast-nested-loop — every
  * (point, interval) pair is tested, O(n·m) work that does not survive a
  * 100× scale-up. Binning turns it into an equi-join: intervals explode
  * to the bins they cover, points map to their single bin, the bin
  * equi-join co-locates only plausible candidates (shuffle-hash/SMJ,
  * AQE-skew-splittable), and the exact predicate filters inside the
  * bin. Work drops to O(n + m·bins_per_interval + candidates).
  *
  * Each (point, interval) pair meets at most once — a point has exactly
  * one bin and an interval emits each covered bin once — so no dedup
  * pass is needed and results match the naive join exactly.
  *
  * `binWidth` tuning: ~ the median interval width, so intervals explode
  * to O(1) bins while bins stay selective.
  */
object RangeJoin {

  /** Helper-column name absent from every given column set (a fixed
    * "__bin" would clobber or collide with same-named caller columns;
    * case-insensitive per Spark's default resolution). */
  private def fresh(base: String, taken: Set[String]): String =
    OpUtils.freshCol(taken, base)

  /** Covered-bin array for one interval, with every edge case explicit:
    * NULL bounds -> null array (explode drops the row — such an interval
    * can never match); inverted bounds (lo > hi) -> empty array (an
    * empty interval matches nothing; naive sequence() would count DOWN
    * and build a huge descending array); a span of >= maxBins bins ->
    * loud raise_error with the offending interval (one absurdly wide
    * interval would otherwise blow memory or hit Spark's sequence cap —
    * this operator exists to survive scale-up). */
  private def binsFor(lo: Column, hi: Column, binWidth: Double,
      maxBins: Long): Column = {
    val loBin = floor(lo / binWidth).cast("long")
    val hiBin = floor(hi / binWidth).cast("long")
    when(loBin.isNull || hiBin.isNull, lit(null).cast("array<long>"))
      .when(hiBin < loBin, array().cast("array<long>"))
      .when(hiBin - loBin < lit(maxBins), sequence(loBin, hiBin))
      .otherwise(raise_error(format_string(
        s"range-join interval [%s, %s] spans >= $maxBins bins at " +
          s"binWidth=$binWidth; raise binWidth or maxBinsPerInterval",
        lo, hi)).cast("array<long>"))
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val bin = fresh("__bin", points.columns.toSet ++ intervals.columns)
    val pb = points.withColumn(bin,
      floor(col(pointCol) / binWidth).cast("long"))
    val ib = intervals.withColumn(bin,
      explode(binsFor(col(loCol), col(hiCol), binWidth, maxBinsPerInterval)))
    pb.join(ib, bin)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }

  /** Interval-overlap join: pairs (l, r) with l.lo <= r.hi AND r.lo <=
    * l.hi — the time-range / genomics workhorse that a bare inequality
    * join plans as a nested loop. Both sides explode to covered bins and
    * meet on a bin equi-join; a pair of overlapping intervals shares a
    * contiguous bin range, whose FIRST bin is max(firstBin(l),
    * firstBin(r)) — emitting a pair only in that bin makes each pair
    * meet exactly once, so there is NO distinct/dedup pass (dedup would
    * be a second full shuffle of the candidate set at scale).
    *
    * Column names across the two sides must be disjoint. `binWidth`
    * tunes as in [[pointInInterval]]; both sides are guarded by
    * `maxBinsPerInterval`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      binWidth: Double, maxBinsPerInterval: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"intervalOverlap requires disjoint column names; overlapping: ${dup.toSeq.sorted.mkString(", ")}")
    val taken = left.columns.toSet ++ right.columns
    val binL = fresh("__bin", taken); val firstL = fresh("__first", taken)
    val binR = fresh("__bin_r", taken); val firstR = fresh("__first_r", taken)
    def binned(df: DataFrame, lo: String, hi: String,
        bin: String, first: String): DataFrame =
      df.withColumn(first, floor(col(lo) / binWidth).cast("long"))
        .withColumn(bin,
          explode(binsFor(col(lo), col(hi), binWidth, maxBinsPerInterval)))
    val lb = binned(left, loL, hiL, binL, firstL)
    val rb = binned(right, loR, hiR, binR, firstR)
    lb.join(rb, col(binL) === col(binR) &&
        col(binL) === greatest(col(firstL), col(firstR)) &&
        col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .drop(binL, binR, firstL, firstR)
  }
}
