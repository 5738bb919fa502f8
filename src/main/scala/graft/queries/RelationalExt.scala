package graft.queries

import graft.{QDef, Tables}
import graft.functions.Udfs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of the Tier-B surface (SURVEY.md §2.B): JSON, arrays/
  * explode, exact statistics from decimal moments, median/percentiles,
  * scalar UDF and typed Aggregator (the MySQL UDF-API analogue), map
  * functions, approximate aggregates.
  */
object RelationalExt {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // statuses joined to one string: the driver's pandas compare can't
    // hash raw array cells, and the string form is canonical anyway
    QDef("q39_array_agg",
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  CAST(len(list(DISTINCT l_linestatus)) AS INTEGER) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          size(collect_set(col("l_linestatus"))).as("n_statuses"))
    },

    QDef("q40_explode",
      """SELECT tok, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |) GROUP BY tok""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    },

    QDef("q41_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events WHERE event_type = 'view'""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("event_type") === "view")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
    },

    // exact statistics from decimal moments: variance/stddev derived from
    // order-independent decimal sums, so Spark and DuckDB agree to the bit
    QDef("q42_stats_agg",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS s2,
        |  (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1) AS variance
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val s1 = sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
      val s2 = sum((col("l_quantity") * col("l_quantity")).cast("decimal(24,6)")).cast("double")
      val n = count(lit(1))
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(n.as("n"), s1.as("s1"), s2.as("s2"),
          ((s2 - s1 * s1 / n) / (n - lit(1))).as("variance"))
    },

    QDef("q43_percentiles",
      """SELECT l_returnflag,
        |  median(l_quantity) AS med,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"))
    },

    QDef("q44_scalar_udf",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IS NULL THEN -1
        |       WHEN o_orderpriority LIKE '1%' THEN 0
        |       WHEN o_orderpriority LIKE '2%' OR o_orderpriority LIKE '3%' THEN 1
        |       ELSE 2 END AS prio_bucket
        |FROM orders""".stripMargin) { (s, dir) =>
      val bucket = udf(Udfs.priorityBucket _)
      t(s, dir, "orders")
        .select(col("o_orderkey"), bucket(col("o_orderpriority")).as("prio_bucket"))
    },

    QDef("q45_typed_aggregator",
      """SELECT l_returnflag,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
        .as[(String, Double, Double)]
      val agg = new Udfs.DiscountedRevenue().toColumn
      li.groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.name("revenue"))
        .toDF("l_returnflag", "revenue")
    },

    QDef("q46_map_funcs",
      """SELECT event_id,
        |  CAST(2024 AS INTEGER) AS yr,
        |  event_type AS k1,
        |  CAST(map_extract(MAP {event_type: value}, event_type)[1] AS DOUBLE) AS self_lookup
        |FROM events WHERE event_id < 100""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("event_id") < 100)
        .select(col("event_id"),
          lit(2024).as("yr"),
          map_keys(map(col("event_type"), col("value"))).getItem(0).as("k1"),
          element_at(map(col("event_type"), col("value")), col("event_type")).as("self_lookup"))
    },

    // approximate aggregates: the estimates are implementation-specific,
    // so the query emits the EXACT reference values (oracle-recomputable
    // real content) plus error-bound booleans the oracle asserts true —
    // the invariant is driver-gated, not just spec-pinned. Bounds from
    // measured error: acd relerr ≤ 2.7% across SFs (HLL++ rsd 5%) →
    // 10%; approx median sits inside [p40, p60] with wide margin.
    QDef("q47_approx_aggs",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS acd_ok, true AS amed_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("acd"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("amed"),
          expr("percentile(l_extendedprice, 0.40)").as("p40"),
          expr("percentile(l_extendedprice, 0.60)").as("p60"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("acd") - col("exact_parts")) <=
            col("exact_parts").cast("double") * 0.10).as("acd_ok"),
          (col("amed") >= col("p40") && col("amed") <= col("p60")).as("amed_ok"))
    }
  )
}
