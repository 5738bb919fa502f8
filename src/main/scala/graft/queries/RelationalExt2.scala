package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third tranche of the relational surface: session windows, string
  * aggregation, interval arithmetic, null-safe comparison, lateral
  * correlated subquery, sampling.
  */
object RelationalExt2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // session windows (5-minute gap) — same operator batch and streaming;
    // oracle reconstructs sessions via gaps-and-islands
    QDef("q48_session_window",
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |              OR ts - LAG(ts) OVER w > INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e
        |)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))
    },

    QDef("q49_string_agg",
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
          .as("priorities"))
    },

    QDef("q50_interval_arith",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  o_orderdate - INTERVAL 1 MONTH AS month_before
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
          (col("o_orderdate") - expr("INTERVAL 1 MONTH")).as("month_before"))
    },

    QDef("q51_null_safe_compare",
      """SELECT c_custkey, s_suppkey,
        |  c_custkey IS NOT DISTINCT FROM s_suppkey AS same_key
        |FROM customer FULL OUTER JOIN supplier ON c_custkey = s_suppkey
        |WHERE c_custkey IS NULL OR c_custkey <= 20""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "supplier"), col("c_custkey") === col("s_suppkey"), "full")
        .filter(col("c_custkey").isNull || col("c_custkey") <= 20)
        .select(col("c_custkey"), col("s_suppkey"),
          (col("c_custkey") <=> col("s_suppkey")).as("same_key"))
    },

    QDef("q52_lateral_subquery",
      """SELECT r_name, n_in_region FROM region,
        |  LATERAL (SELECT COUNT(*) AS n_in_region FROM nation
        |           WHERE n_regionkey = r_regionkey)""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT r_name, n_in_region FROM region,
              |  LATERAL (SELECT COUNT(*) AS n_in_region FROM nation
              |           WHERE n_regionkey = r_regionkey)""".stripMargin)
    },

    // TABLESAMPLE is nondeterministic across engines -> rows-only check;
    // the spec-level invariant is the sample fraction bound
    QDef.noOracle("q53_sample") { (s, dir) =>
      t(s, dir, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .select(col("l_orderkey"), col("l_linenumber"))
    },

    // LIMIT/OFFSET pagination under a total order (unique key tiebreak
    // makes the page deterministic; Spark plans a GlobalLimit over the
    // sorted stream — only offset+limit rows cross the final stage)
    QDef("q59_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 50""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(50).limit(20)
    },

    // JOIN ... USING: coalesced join column appears once in the output
    QDef("q60_join_using",
      """SELECT n_nationkey, count(*) AS n_cust
        |FROM (SELECT c_nationkey AS n_nationkey FROM customer) c
        |JOIN (SELECT n_nationkey FROM nation) n USING (n_nationkey)
        |GROUP BY n_nationkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("n_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"))
      c.join(n, usingColumns = Seq("n_nationkey"))
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
    },

    // count-min sketch heavy hitters: one pass builds a ~KB sketch
    // (mergeable across partitions — the 100 TB path: sketch per
    // partition, merge at the driver, never shuffle raw keys); per-key
    // estimates are then read from the SKETCH, not the data. Driver-side
    // work is O(sketch + keys), deterministic via the fixed seed.
    // No DuckDB analogue -> rows-only check + error-bound spec.
    QDef.noOracle("q61_heavy_hitters_cms") { (s, dir) =>
      import s.implicits._
      val bytes = t(s, dir, "lineitem")
        .select(expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("sk"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      val keys = t(s, dir, "supplier").select($"s_suppkey").as[Long].collect().sorted
      keys.map(k => (k, cms.estimateCount(Long.box(k)))).toSeq
        .toDF("s_suppkey", "est_items")
    },

    // KMV theta-style distinct sketch (custom TypedImperativeAggregate,
    // functions.KmvSketchAgg): per-status sketches of the customer-key
    // sets, then union AND intersection estimates computed purely from
    // the stored sketches — the set algebra HLL cannot do. Estimates are
    // JVM-hash-dependent -> rows-only driver check; the error-bound and
    // merge-invariance specs live in KmvSketchSpec
    QDef.noOracle("q62_kmv_distinct") { (s, dir) =>
      import graft.functions.VectorFunctions._
      val k = 1024
      val sk = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(kmv_sketch(col("o_custkey"), k).as("sk"))
      val a = sk.select(col("o_orderstatus").as("status_a"), col("sk").as("sk_a"))
      val b = sk.select(col("o_orderstatus").as("status_b"), col("sk").as("sk_b"))
      a.join(b, col("status_a") < col("status_b"))
        .select(col("status_a"), col("status_b"),
          kmv_estimate(col("sk_a"), k).as("est_a"),
          kmv_estimate(col("sk_b"), k).as("est_b"),
          kmv_estimate(kmv_merge(col("sk_a"), col("sk_b"), k), k).as("est_union"),
          kmv_intersect_estimate(col("sk_a"), col("sk_b"), k).as("est_intersect"))
    },

    // sink surface: write csv/json/orc, read back, aggregate — the
    // round-trip must preserve values exactly
    QDef("q54_sink_roundtrip",
      """SELECT fmt, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'csv' AS fmt, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT 'json', o_totalprice FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT 'orc', o_totalprice FROM orders WHERE o_orderkey % 7 = 0
        |) GROUP BY fmt""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val base = java.nio.file.Files.createTempDirectory("graft-sinks").toString
      src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      src.write.mode("overwrite").json(s"$base/json")
      src.write.mode("overwrite").orc(s"$base/orc")
      val fromCsv = s.read.option("header", "true")
        .schema("o_orderkey LONG, o_totalprice DOUBLE").csv(s"$base/csv")
      val fromJson = s.read.schema("o_orderkey LONG, o_totalprice DOUBLE").json(s"$base/json")
      val fromOrc = s.read.orc(s"$base/orc")
      fromCsv.select(lit("csv").as("fmt"), col("o_totalprice"))
        .union(fromJson.select(lit("json").as("fmt"), col("o_totalprice")))
        .union(fromOrc.select(lit("orc").as("fmt"), col("o_totalprice")))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total"))
    }
  )
}
