package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-query match counts vs exact top-k for the checked
  * (% 250) subset, for each ANN variant at a given sfDir — used to set
  * the annGate recall bounds empirically. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") % 250 === 0), 10)
      .select(col("query_id"), col("neighbor_id")).withColumn("in_exact", lit(1))
    val variants = Map(
      "ivf" -> Similarity.ivfTopK(emb, queries, k = 10, kClusters = 16, nProbe = 6),
      "pq" -> Similarity.pqTopK(emb, queries, k = 10, m = 8, ksub = 16),
      "ivfpq" -> Similarity.ivfPqTopK(emb, queries, k = 10, kClusters = 16,
        nProbe = 6, m = 8, ksub = 16))
    variants.foreach { case (name, ann) =>
      // left join FROM the checked queries: a query with zero ANN
      // matches must report 0, not vanish from the min (an inner join
      // would overstate the empirical minimum these bounds are set from)
      val m = exact.select(col("query_id")).distinct()
        .join(ann.join(exact, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_match")),
          Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_match"), lit(0L)).as("n_match"))
      val rows = m.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      println(s"PROBE $name $sfDir min=${if (rows.nonEmpty) rows.map(_._2).min else -1} " +
        rows.map { case (q, n) => s"$q:$n" }.mkString(" "))
    }
    spark.stop()
  }
}
