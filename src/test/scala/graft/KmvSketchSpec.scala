package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** KMV sketch (functions.KmvSketchAgg + KmvKernels): accuracy bounds,
  * exactness while unsaturated, merge algebra, partitioning invariance.
  */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 1024

  test("unsaturated sketch is exact: n < k -> estimate == n") {
    val d = spark.range(0, 700).select(($"id" % 500).as("v"))
    val est = d.agg(kmv_estimate(kmv_sketch($"v", K), K)).head().getDouble(0)
    assert(est == 500.0)
  }

  test("saturated estimate within 10% of the true distinct count") {
    val d = spark.range(0, 200000).select(($"id" % 37777).as("v"))
    val est = d.agg(kmv_estimate(kmv_sketch($"v", K), K)).head().getDouble(0)
    assert(math.abs(est - 37777.0) / 37777.0 < 0.10, s"est=$est")
  }

  test("sketch is deterministic and partitioning-invariant") {
    val d = spark.range(0, 50000).select(($"id" % 9001).as("v"))
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(kmv_sketch($"v", K).as("sk")).head().getSeq[Long](0)
    val base = sk(d)
    assert(base == sk(d.repartition(17)))
    assert(base.length == K)
    // ascending unsigned order
    assert(base.sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
      case _ => true
    })
  }

  test("merge of partial sketches equals the sketch of the whole") {
    val whole = spark.range(0, 60000).select(($"id" % 8111).as("v"))
    val skWhole = whole.agg(kmv_sketch($"v", K).as("sk")).head().getSeq[Long](0)
    val parts = whole.withColumn("half", ($"v" % 2 === 0).cast("int"))
      .groupBy($"half").agg(kmv_sketch($"v", K).as("sk"))
    val merged = parts.agg(collect_list($"sk").as("sks"))
      .select(kmv_merge(element_at($"sks", 1), element_at($"sks", 2), K))
      .head().getSeq[Long](0)
    assert(skWhole == merged)
  }

  test("intersection estimate within 20% on a known overlap") {
    val a = spark.range(0, 20000).toDF("v")
    val b = spark.range(10000, 30000).toDF("v")
    val ska = a.agg(kmv_sketch($"v", K).as("sk"))
    val skb = b.agg(kmv_sketch($"v", K).as("sk"))
    val row = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
      .select(
        kmv_intersect_estimate($"sk", $"sk2", K).as("inter"),
        kmv_estimate(kmv_merge($"sk", $"sk2", K), K).as("union"))
      .head()
    assert(math.abs(row.getDouble(0) - 10000.0) / 10000.0 < 0.20,
      s"intersect est=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 30000.0) / 30000.0 < 0.10,
      s"union est=${row.getDouble(1)}")
  }

  test("nulls are skipped; strings and longs both hash") {
    val d = Seq(Some("x"), Some("y"), None, Some("x")).toDF("v")
    val est = d.agg(kmv_estimate(kmv_sketch($"v", K), K)).head().getDouble(0)
    assert(est == 2.0)
  }

  test("q62 query shape: pairwise exact set algebra + in-bound estimates") {
    val out = SparkEntry.queries("q62_kmv_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exA, exB, exU, exI) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(exU == exA + exB - exI, "inclusion-exclusion must hold exactly")
      assert(exU >= math.max(exA, exB) && exI <= math.min(exA, exB))
      // every estimate-error invariant the oracle gates on must be true
      (6 to 9).foreach(i => assert(r.getBoolean(i), s"estimate bound $i violated"))
    }
  }
}
