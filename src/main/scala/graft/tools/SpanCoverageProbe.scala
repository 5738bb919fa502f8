package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement probe for the llm49 plan decision (round-7 brief item):
  * span-dup coverage in its four shapes — {string, 128-bit hash} span
  * keys × {recompute, checkpoint} for the twice-consumed occurrence
  * frame — min-of-3 after warmup on a given SF dir. The numbers feed
  * DESIGN.md's "span coverage plan choice" note; the operator itself
  * stays on whichever shape wins at scale (hash keys), with the
  * recompute-vs-checkpoint choice re-validated here whenever the span
  * path changes. `runMain graft.tools.SpanCoverageProbe [sfDir]`. */
object SpanCoverageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    // the coverage tail of Dedup.spanDupCoverage, parameterized over a
    // possibly-checkpointed occurrence frame (the operator recomputes)
    def coverage(occ: DataFrame, key: Seq[String], w: Int): DataFrame = {
      val dup = occ.groupBy(key.map(col): _*)
        .agg(countDistinct(col("__id")).as("__nd"))
        .filter(col("__nd") >= 2).select(key.map(col): _*)
      val hits = occ.join(dup, key, "left_semi")
        .select(col("__id"), col("st"), (col("st") + w).as("en"))
      val byDoc = Window.partitionBy(col("__id")).orderBy(col("st"), col("en"))
      val islands = hits
        .withColumn("__prev_max", max(col("en")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("__island", sum(
          when(col("__prev_max").isNull || col("st") > col("__prev_max"), 1)
            .otherwise(0)).over(byDoc))
        .groupBy(col("__id"), col("__island"))
        .agg((max(col("en")) - min(col("st"))).as("__c"))
        .groupBy(col("__id"))
        .agg(sum(col("__c")).cast("bigint").as("dup_tokens"))
      docs.select(col("doc_id"),
          size(graft.ops.TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"))
        .join(islands.withColumnRenamed("__id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
    }

    def run(name: String)(mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        dt
      }
      once() // warmup
      val best = (1 to 3).map(_ => once()).min
      println(f"PROBE $name: $best%.3f s")
    }

    val w = 8
    run("string/recompute") { () =>
      graft.ops.Dedup.spanDupCoverage(docs, "text", "doc_id", w = w)
    }
    run("hash/recompute (headline llm49)") { () =>
      graft.ops.Dedup.spanDupCoverage(docs, "text", "doc_id", w = w,
        hashSpans = true)
    }
    run("string/checkpoint") { () =>
      val occ = graft.ops.Dedup.spanOccurrences(docs, "text", "doc_id", w)
        .localCheckpoint(true)
      coverage(occ, Seq("span"), w)
    }
    run("hash/checkpoint") { () =>
      val occ = graft.ops.Dedup.spanOccurrencesHashed(docs, "text", "doc_id", w)
        .localCheckpoint(true)
      coverage(occ, Seq("__h1", "__h2"), w)
    }
    spark.stop()
  }
}
