package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), per the builder mandate: brute-force cosine top-k as
  * the baseline, SRP-LSH bucketing as the scale path.
  *
  * 100 TB posture: the query set is broadcast (never shuffle the corpus
  * by query), similarity runs through the codegen'd CosineSimilarity
  * expression, and top-k is a per-partition window — no global sort. The
  * LSH variant prunes the corpus side to matching buckets first, turning
  * a full scan per query into a bucket-join; multi-probe (flipping one
  * plane bit) recovers recall at bucket boundaries.
  */
object Similarity {

  /** Deterministic random hyperplanes (seeded) for sign-random-projection. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Adds an integer `bucket` column: bit i = sign(v . plane_i). */
  def srpBucket(df: DataFrame, embCol: String, nPlanes: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      when(dot_product(col(embCol), lit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /** Brute-force cosine top-k: every query vs every corpus vector.
    * Correctness baseline and the right plan when queries are few —
    * the corpus is scanned once, queries ride along broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      embCol: String = "embedding", id: String = "vec_id"): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(embCol).as("q_emb"))
    val scored = corpus.select(col(id), col(embCol))
      .crossJoin(broadcast(q))
      .filter(col(id) =!= col("query_id"))
      .withColumn("sim", cosine_sim(col(embCol), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(id))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(id).as("neighbor_id"), col("sim"), col("rank"))
  }

  /** SRP-LSH top-k: corpus pruned to the query's bucket plus one-bit-flip
    * probe buckets. Approximate — recall measured against bruteForceTopK
    * in the spec suite. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, embCol: String = "embedding", id: String = "vec_id",
      dim: Int = 64): DataFrame = {
    val cb = srpBucket(corpus, embCol, nPlanes, dim)
    val qb = srpBucket(queries, embCol, nPlanes, dim)
      .select(col(id).as("query_id"), col(embCol).as("q_emb"), col("bucket").as("q_bucket"))
    // multi-probe: original bucket + each one-bit flip
    val probes = qb.withColumn("probe",
      explode(array(col("q_bucket") +:
        (0 until nPlanes).map(i => col("q_bucket").bitwiseXOR(lit(1 << i))): _*)))
    val scored = cb.join(broadcast(probes), col("bucket") === col("probe"))
      .filter(col(id) =!= col("query_id"))
      .withColumn("sim", cosine_sim(col(embCol), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(id))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(id).as("neighbor_id"), col("sim"), col("rank"))
  }
}
