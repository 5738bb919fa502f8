package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering — `row_number() OVER (ORDER BY ...)`
  * without the single-partition window it normally plans to.
  *
  * A global row number is the backbone of curriculum ordering (train on
  * easy documents first), deterministic corpus sharding, and resumable
  * iteration order. The naive form funnels the entire corpus through one
  * task and dies at scale. This implementation distributes it:
  *
  *   1. `repartitionByRange(sortCols)` — range partition i holds keys
  *      that sort strictly before partition i+1's (Spark samples
  *      boundaries; with a TOTAL order the output is independent of
  *      where the boundaries land);
  *   2. local `row_number()` per range partition (parallel);
  *   3. partition counts → cumulative offsets (one row per partition —
  *      driver-scale regardless of corpus size);
  *   4. broadcast the offsets back: global pos = offset + local rank.
  *
  * Identical to the naive global window (the oracle for llm27 IS the
  * naive form) — but every corpus-sized stage is partition-parallel.
  *
  * `sortCols` MUST form a total order (include a unique tiebreak column):
  * under ties that span a range-partition boundary the local ranks would
  * depend on which side of the boundary a row landed.
  */
object GlobalOrder {

  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "pos", numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted.withColumn("__lrn", row_number().over(wLocal))
    // one row per partition: the tiny side of the two-level cumsum.
    // Branches from `parted` (NOT `local`) so the counts branch carries
    // no window/sort; the range exchange below it is identical to the
    // main branch's and is reused at runtime (one shuffle write, two
    // readers — verified in GlobalOrderSpec's plan assertion).
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", sum(col("__cnt")).over(wOff) - col("__cnt"))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, (col("__off") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }
}
