package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Plan-shape and equivalence specs for the scale techniques. */
class ScaleTechniquesSpec extends SparkTestBase {

  test("bucketed join plan contains no shuffle exchange") {
    // disable broadcast so the plan must rely on bucket co-location
    // (at real scale neither fact table broadcasts — this simulates it)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.SparkEntry.queries("q55_bucketed_join")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan should be bucketed:\n$plan")
      val exchanges = plan.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      // exactly one hash exchange (for groupBy) — none for the join sides
      assert(exchanges <= 1, s"bucketed join should not shuffle its inputs:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join") {
    val sfDir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumnRenamed("o_custkey", "custkey")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumnRenamed("c_custkey", "custkey")
    val plain = orders.join(customer, "custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(orders, customer, "custkey", salts = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("latest-image agg formulation equals window formulation") {
    val sfDir = "/root/testdata/sf0.001"
    val cdc = graft.queries.Cdc.scan(spark, sfDir)
    val a = graft.queries.Cdc.latestImage(cdc, Seq("o_orderkey"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    val cols = graft.queries.Cdc.latestImage(cdc, Seq("o_orderkey")).columns
    val b = graft.queries.Cdc.latestImageWindow(cdc, Seq("o_orderkey"))
      .select(cols.toIndexedSeq.map(col): _*)
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("seeded sample lands near the requested fraction") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val total = li.count()
    val sampled = graft.SparkEntry.queries("q53_sample")(spark, "/root/testdata/sf0.001").count()
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac far from 0.1")
  }

  test("salted left join preserves unmatched rows") {
    val sfDir = "/root/testdata/sf0.001"
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("custkey", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("custkey", "w")
    val out = Skew.saltedJoin(left, right, "custkey", salts = 4, joinType = "left")
      .collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(out.head.fieldIndex("w"))) == 1)
  }
}
