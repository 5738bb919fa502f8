package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ordering — `row_number() OVER (ORDER BY ...)`
  * without the single-partition window it normally plans to.
  *
  * A global row number is the backbone of curriculum ordering (train on
  * easy documents first), deterministic corpus sharding, and resumable
  * iteration order. The naive form funnels the entire corpus through one
  * task and dies at scale. This implementation distributes it:
  *
  *   1. `repartitionByRange(sortCols)` + `sortWithinPartitions` — range
  *      partition i holds keys that sort strictly before partition i+1's
  *      (Spark samples boundaries; with a TOTAL order the output is
  *      independent of where the boundaries land);
  *   2. `zipWithIndex` over that ONE sorted RDD: a first pass counts
  *      rows per partition (one long per partition back to the driver —
  *      driver-scale regardless of corpus size), a second pass assigns
  *      offset + local index.
  *
  * Both passes run over the SAME RDD object, so they see the same
  * `RangePartitioner` instance and the same shuffle output (the count
  * job's upstream stages are skipped stages reading the files the sort
  * job wrote). Correctness is structural: it cannot depend on Catalyst
  * exchange reuse (`spark.sql.exchange.reuse`), plan-shape drift, or the
  * boundary-sampling seed, because there is exactly one partitioning in
  * existence. (An earlier formulation derived a per-partition-counts
  * branch from a second DataFrame reference and relied on runtime
  * exchange reuse to keep the two branches' boundaries identical.)
  *
  * Identical to the naive global window (the oracle for llm27 IS the
  * naive form) — but every corpus-sized stage is partition-parallel. The
  * `.rdd` hop costs one Tungsten→Row deserialization of the sorted data;
  * that is a narrow, partition-parallel map with no extra shuffle.
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
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed,
      StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false)))
  }
}
