package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the ANN serve top-k stage (guide §1.4): the sf0.1
  * bench's serve queries are sub-second and overhead-dominated, so the
  * window → pre-reduced-aggregate change cannot be measured there. This
  * synthesizes a scored candidate set at a size where the ranking stage
  * dominates (the input both forms share — scoring itself is identical
  * code either way), then times
  *
  *   window: row_number() OVER (PARTITION BY query_id
  *           ORDER BY sim DESC, vec_id) <= k   (incl. WindowGroupLimit)
  *   agg:    Similarity.topKPerQuery (TopKSimAgg partial aggregation)
  *
  * through the noop sink, interleaved A/B/A/B, median-of-N.
  *
  *   runMain graft.tools.TopKProbe [nRows] [nQueries] [k] [reps]
  *
  * The synthetic sims derive from xxhash64 — deterministic, no
  * Date/random, evenly distributed so every query group is the same
  * size and the comparison is skew-free. */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 50000000L
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val k = if (args.length > 2) args(2).toInt else 10
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the shared scored set: (query_id, vec_id, sim)
    val scored = spark.range(0, nRows, 1, cpus.toInt * 4)
      .select((col("id") % nQueries).as("query_id"),
        col("id").as("vec_id"),
        (xxhash64(col("id")).cast("double") / lit(Long.MaxValue.toDouble))
          .as("sim"))

    def windowForm(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("sim"), col("rank"))
    }
    def aggForm(df: DataFrame): DataFrame =
      graft.ops.Similarity.topKPerQuery(df, k, "vec_id")

    def time(name: String, df: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"topk-probe: $name")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      dt
    }
    // equality gate first (also the warmup): both forms must return the
    // same rows before their timings mean anything
    val wRows = windowForm(scored).collect().map(_.toSeq).toSet
    val aRows = aggForm(scored).collect().map(_.toSeq).toSet
    require(wRows == aRows, s"forms disagree: ${wRows.size} vs ${aRows.size}")
    println(s"equality gate: ${wRows.size} rows identical")

    val samples = (1 to reps).map { _ =>
      (time("window", windowForm(scored)), time("agg", aggForm(scored)))
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val (w, a) = (med(samples.map(_._1)), med(samples.map(_._2)))
    println(f"rows=$nRows queries=$nQueries k=$k cpus=$cpus reps=$reps")
    println(f"window median: $w%.3f s  (samples ${samples.map(_._1).map(x => f"$x%.2f").mkString(",")})")
    println(f"agg    median: $a%.3f s  (samples ${samples.map(_._2).map(x => f"$x%.2f").mkString(",")})")
    println(f"speedup: ${w / a}%.2fx")
    spark.stop()
  }
}
