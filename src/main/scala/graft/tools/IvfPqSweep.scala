package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Knob sweep for the composed IVF-PQ index: recall@k and wall time per
  * (nProbe, ksub, rerank) config vs exact brute-force ground truth —
  * the evidence a shipped-knob change must carry (DESIGN "deliberate
  * trades are pre-adjudicated": sweep the cheaper configs, show the
  * shipped one is minimum-viable).
  *
  * Run: `sbt "runMain graft.tools.IvfPqSweep /root/testdata/sf0.1 [k]"`.
  */
object IvfPqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings").localCheckpoint(true)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") % 250 === 0), k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val nExact = exact.select(col("query_id")).distinct().count()
    val configs = Seq(
      // (kClusters, nProbe, ksub, rerank)
      (32, 20, 64, 16), (32, 16, 64, 16), (32, 12, 64, 16),
      (32, 16, 64, 8), (32, 12, 64, 8), (32, 16, 16, 16),
      (32, 10, 64, 16), (32, 12, 16, 16))
    configs.foreach { case (kClusters, nProbe, ksub, rerank) =>
      // 2 timed runs, report the second (JIT/codegen warm)
      var recall = 0.0
      var wall = 0.0
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        val ann = Similarity.ivfPqTopK(emb, queries, k = k,
          kClusters = kClusters,
          nProbe = nProbe, m = 16, ksub = ksub, rerank = rerank)
        val hits = ann.join(exact, Seq("query_id", "neighbor_id")).count()
        wall = (System.nanoTime() - t0) / 1e9
        recall = hits.toDouble / (nExact * k)
      }
      println(f"SWEEP ivfpq kC=$kClusters%-3d nProbe=$nProbe%-3d ksub=$ksub%-3d " +
        f"rerank=$rerank%-3d recall=$recall%.3f wall=$wall%.2fs")
    }
    spark.stop()
  }
}
