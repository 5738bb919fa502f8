package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Segment profiler for the IVF ANN path (llm16): times the k-means
  * training sample, the driver Lloyd iterations, the distributed
  * search, and the annGate wrapper separately, so a headline-bench
  * drift on llm16 can be attributed to the segment that moved.
  * `runMain graft.tools.ProfileIvf [reps] [sfDir]`. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count()
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    def timed(name: String)(body: => Any): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        dt
      }
      println(f"SEG $name: min=${ts.min}%.3f median=${ts.sorted.apply(reps / 2)}%.3f")
    }
    val queries = emb.filter(col("vec_id") % 50 === 0)
    // warmups
    Similarity.kmeansCentroids(emb, "embedding", 16)
    graft.queries.Llm.defs.find(_.name == "llm16_knn_ivf").get.fn(spark, sfDir).count()
    release()

    timed("centroids(train+lloyd)") {
      Similarity.kmeansCentroids(emb, "embedding", 16)
    }
    val cents = Similarity.kmeansCentroids(emb, "embedding", 16)
    timed("ivfSearch(given centroids)") {
      // same plan ivfTopK builds after training
      val cb = emb.withColumn("cell", Similarity.cellOf(cents)(col("embedding")))
      Similarity.ivfScore(cb,
        Similarity.ivfProbes(queries, cents, 6, "embedding", "vec_id"),
        10, "embedding", "vec_id").count()
    }
    timed("cbAssign only") {
      emb.withColumn("cell", Similarity.cellOf(cents)(col("embedding"))).count()
    }
    timed("probes only") {
      Similarity.ivfProbes(queries, cents, 6, "embedding", "vec_id").count()
    }
    timed("scored join, no topk") {
      val cb = emb.withColumn("cell", Similarity.cellOf(cents)(col("embedding")))
      val probes = Similarity.ivfProbes(queries, cents, 6, "embedding", "vec_id")
      import graft.functions.VectorFunctions.cosine_sim
      cb.join(broadcast(probes), "cell")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", cosine_sim(col("embedding"), col("q_emb")))
        .count()
    }
    timed("trainSample via takeOrdered (rdd)") {
      import spark.implicits._
      emb.select(col("embedding")).as[Array[Float]].rdd
        .map(v => (scala.util.hashing.MurmurHash3.arrayHash(v, 42), v))
        .takeOrdered(100000)(Ordering.by((t: (Int, Array[Float])) => t._1))
        .length
    }
    timed("ivfTopK(end-to-end)") {
      Similarity.ivfTopK(emb, queries, k = 10, kClusters = 16, nProbe = 6).count()
    }
    timed("llm16(full, with gate)") {
      graft.queries.Llm.defs.find(_.name == "llm16_knn_ivf").get.fn(spark, sfDir).count()
    }
    spark.stop()
  }
}
