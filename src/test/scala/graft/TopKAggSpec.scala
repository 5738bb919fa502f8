package graft

import graft.ops.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKSimAgg (the map-side pre-reduced top-k that replaced the
  * row_number window in every ANN serve path) must reproduce the window
  * byte-for-byte: same rows, same sims, same ranks, same tie order —
  * on adversarial inputs (heavy sim ties, duplicate (sim, id) pairs,
  * groups smaller/larger than k, many input partitions so partial
  * buffers really merge). */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  /** The window form the aggregate replaced — the reference semantics. */
  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getInt(3))).toSet

  test("topKPerQuery equals the row_number window on tie-heavy random data") {
    val rnd = new scala.util.Random(42)
    // 60 queries x ~200 candidates, sims drawn from 8 distinct values so
    // ties are everywhere and the id tie-break decides most ranks
    val rows = for {
      q <- 0 until 60
      c <- 0 until (150 + rnd.nextInt(100))
    } yield (q.toLong, rnd.nextLong().abs % 100000, rnd.nextInt(8) * 0.125)
    val scored = rows.toDF("query_id", "vec_id", "sim").repartition(13)
    for (k <- Seq(1, 7, 10)) {
      val win = asSet(windowTopK(scored, k))
      val agg = asSet(Similarity.topKPerQuery(scored, k, "vec_id"))
      assert(agg == win, s"k=$k")
    }
  }

  test("topKPerQuery handles duplicate (sim, id) pairs like the window") {
    // duplicates rank adjacently in the window; the bounded heap must
    // keep them while below k and drop equal-to-worst when full
    val rows = Seq(
      (1L, 7L, 5.0), (1L, 7L, 5.0), (1L, 9L, 3.0), (1L, 9L, 3.0),
      (2L, 1L, 1.0), (2L, 1L, 1.0), (2L, 1L, 1.0))
    val scored = rows.toDF("query_id", "vec_id", "sim").repartition(3)
    for (k <- Seq(1, 2, 3, 5)) {
      val win = asSet(windowTopK(scored, k))
      val agg = asSet(Similarity.topKPerQuery(scored, k, "vec_id"))
      assert(agg == win, s"k=$k")
    }
  }

  test("topKPerQuery underfilled groups and k larger than the group") {
    val rows = Seq((1L, 5L, 0.9), (1L, 6L, 0.8), (2L, 5L, 0.1))
    val scored = rows.toDF("query_id", "vec_id", "sim")
    val agg = asSet(Similarity.topKPerQuery(scored, 10, "vec_id"))
    assert(agg == asSet(windowTopK(scored, 10)))
    assert(agg.size == 3)
  }

  test("topKPerQuery null sims sort last like the window's DESC NULLS LAST") {
    val rows = Seq[(Long, Long, java.lang.Double)](
      (1L, 5L, 0.9), (1L, 6L, null), (1L, 7L, null), (1L, 8L, 0.2),
      (2L, 3L, null), (2L, 4L, null), (2L, 5L, null))
    val scored = rows.toDF("query_id", "vec_id", "sim").repartition(4)
    for (k <- Seq(1, 2, 3, 4)) {
      val win = asSet(windowTopK(scored, k))
      val agg = asSet(Similarity.topKPerQuery(scored, k, "vec_id"))
      assert(agg == win, s"k=$k")
    }
  }

  test("TopKSimBuffer serialize/deserialize round-trips mid-merge") {
    val a = new graft.functions.TopKSimBuffer(3)
    a.add(5L, 0.5); a.add(9L, 0.9); a.add(1L, 0.1); a.add(7L, 0.9)
    a.addNullSim(11L)
    val b = graft.functions.TopKSimBuffer.fromBytes(3, a.toBytes)
    val (ids, sims, n, nullIds, nNull) = b.ordered
    // (0.9, 7) before (0.9, 9) — tie by ascending id; 0.1 fell off
    assert(n == 3 && ids.take(3).toSeq == Seq(7L, 9L, 5L))
    assert(sims.take(3).toSeq == Seq(0.9, 0.9, 0.5))
    assert(nNull == 0) // non-null side is full: null ids emit nothing
  }
}
