package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order and chunked into fixed-capacity token sequences
  * ("concat then chunk" — a document may straddle a sequence boundary).
  * Each doc gets (seq_id, seq_offset) = where its first token lands.
  *
  * The core is a GLOBAL running sum of token counts in id order. The
  * naive form — one `Window.orderBy(id)` with no partitioning — funnels
  * the whole corpus through a single partition and dies at scale. This
  * implementation distributes it as a two-level cumsum:
  *
  *   1. bucket = id / bucketSize — deterministic contiguous ranges;
  *   2. within-bucket cumsum: window PARTITIONED by bucket (parallel);
  *   3. bucket totals -> cumsum over buckets (tiny: #buckets rows);
  *   4. broadcast-join the bucket offsets back.
  *
  * Global cum = bucket_offset + within_cum, identical to the naive
  * single-partition window (verified by the llm23 oracle, which IS the
  * naive form), but every heavy stage is partition-parallel.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, bucketSize: Long = 1024L): DataFrame = {
    val withN = df.select(col(idCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("__bucket", (col(idCol) / bucketSize).cast("long"))
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = withN.withColumn("__cum_in", sum(col("n_tokens")).over(wIn))
    val wB = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = inBucket.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btotal"))
      .withColumn("__boffset", sum(col("__btotal")).over(wB) - col("__btotal"))
      .select(col("__bucket"), col("__boffset"))
    inBucket.join(broadcast(offsets), "__bucket")
      .withColumn("__start", col("__boffset") + col("__cum_in") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        // true integer division (`DIV`), not `/`: long / long in Spark is
        // DOUBLE division, exact only below 2^53 total tokens — DIV keeps
        // seq_id exact at any running-sum magnitude
        expr(s"__start DIV $capacity").as("seq_id"),
        (col("__start") % capacity).as("seq_offset"))
  }
}
