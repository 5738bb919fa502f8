package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The Tier-B relational surface (SURVEY.md §2.B): every capability the
  * reference delegates to the MySQL SQL layer, expressed as Catalyst
  * built-ins over the driver parquet tables, each with a DuckDB oracle.
  *
  * Determinism rules (so Spark and DuckDB hash-match bit-for-bit):
  *  - Sums over doubles are lifted per-row to DECIMAL (exact, order-
  *    independent) and the final aggregate cast back to DOUBLE. The data's
  *    doubles carry <=2 decimal digits, so a 6-digit decimal lift rounds
  *    identically from the binary double in both engines.
  *  - Every computed column is aliased identically on both sides.
  *  - Integer results are cast so DuckDB's widening (HUGEINT sums, BIGINT
  *    length/extract) matches Spark's types.
  *  - LIMIT queries carry a total-order ORDER BY (unique tiebreak column).
  */
object Relational {

  /** Per-row decimal lift for exact, order-independent double aggregation. */
  private def dec(c: Column): Column = c.cast("decimal(18,6)")
  /** sum(double) that hash-matches DuckDB: exact decimal sum, then double. */
  private def sumd(c: Column): Column = sum(dec(c)).cast("double")

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // ---- aggregation ----------------------------------------------------
    QDef("q01_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS sum_disc_price,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 4)
            .cast("double").as("sum_disc_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("count_order"))
    },

    // ---- filter + projection (pushed to the parquet scan) ---------------
    QDef("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue,
        |  l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 4)
            .cast("double").as("revenue"),
          col("l_shipdate"))
    },

    // ---- multi-way equi join + aggregation ------------------------------
    QDef("q03_join_agg",
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      // nation/customer are small dims: broadcast them so the only shuffle
      // left is the final aggregation (at 100 TB lineitem never shuffles
      // for these joins).
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 4)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    QDef("q04_left_join",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("total_spent"))
    },

    QDef("q05_right_join",
      """SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"), count(col("o_orderkey")).as("n_orders"))
    },

    QDef("q06_full_outer_join",
      """SELECT c_custkey, s_suppkey, c_name, s_name
        |FROM customer FULL OUTER JOIN supplier ON c_custkey = s_suppkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "supplier"), col("c_custkey") === col("s_suppkey"), "full")
        .select(col("c_custkey"), col("s_suppkey"), col("c_name"), col("s_name"))
    },

    QDef("q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },

    QDef("q08_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    QDef("q09_cross_join",
      "SELECT r_name, n_name FROM region CROSS JOIN nation") { (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
    },

    QDef("q10_theta_join",
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier JOIN nation ON s_nationkey < n_nationkey""".stripMargin) { (s, dir) =>
      // non-equi predicate => broadcast-nested-loop; both sides are dims so
      // this stays tiny even at 100 TB (never theta-join two fact tables).
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") < col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_nationkey"), col("n_name"))
    },

    // ---- distinct -------------------------------------------------------
    QDef("q11_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    QDef("q12_count_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // ---- rollup / cube / grouping sets ----------------------------------
    QDef("q13_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("qty"))
    },

    QDef("q14_cube",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },

    QDef("q15_grouping_sets",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    QDef("q16_having",
      """SELECT o_custkey, COUNT(*) AS n
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 12)
    },

    // ---- window functions ----------------------------------------------
    QDef("q17_window_rank",
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
        |  DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).as("rn"), rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"), ntile(4).over(w).as("quartile"))
    },

    QDef("q18_window_analytic",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  LAG(o_totalprice) OVER w AS prev_price,
        |  LEAD(o_totalprice) OVER w AS next_price,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(w).as("first_order"))
    },

    QDef("q19_window_frame",
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(COUNT(*)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt3
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          count(lit(1)).over(w.rowsBetween(-2, Window.currentRow)).as("cnt3"))
    },

    // ---- order by / limit / top-k ---------------------------------------
    QDef("q20_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      // orderBy+limit => TakeOrderedAndProject: per-partition top-k heaps,
      // only k rows cross the wire — the right plan at any scale.
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    },

    // ---- set operations -------------------------------------------------
    QDef("q21_union_all",
      """SELECT n_nationkey AS k FROM nation
        |UNION ALL SELECT s_nationkey AS k FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
    },

    QDef("q22_union_distinct",
      """SELECT c_nationkey AS k FROM customer
        |UNION SELECT s_nationkey AS k FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
    },

    QDef("q23_intersect",
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
    },

    QDef("q24_except",
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey AS k FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
    },

    QDef("q25_intersect_all",
      """SELECT o_custkey AS k FROM orders
        |INTERSECT ALL SELECT c_custkey AS k FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .intersectAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
    },

    QDef("q26_except_all",
      """SELECT o_custkey AS k FROM orders
        |EXCEPT ALL SELECT c_custkey AS k FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .exceptAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
    },

    // ---- subqueries / CTE -----------------------------------------------
    QDef("q27_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)""".stripMargin)
    },

    QDef("q28_in_subquery",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer
              |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin)
    },

    QDef("q29_correlated_subquery",
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
        |WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
              |WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
              |                        WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    },

    QDef("q30_cte",
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        |)
        |SELECT c_mktsegment, CAST(SUM(n_orders) AS BIGINT) AS total_orders
        |FROM per_cust JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""WITH per_cust AS (
              |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
              |)
              |SELECT c_mktsegment, CAST(SUM(n_orders) AS BIGINT) AS total_orders
              |FROM per_cust JOIN customer ON c_custkey = o_custkey
              |GROUP BY c_mktsegment""".stripMargin)
    },

    // ---- scalar functions ------------------------------------------------
    QDef("q31_string_funcs",
      """SELECT c_custkey,
        |  UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
        |  SUBSTR(c_name, 1, 8) AS prefix8,
        |  CAST(LENGTH(c_name) AS INTEGER) AS name_len,
        |  CONCAT(c_name, ':', c_mktsegment) AS tagged,
        |  REPLACE(c_name, '#', '@') AS repl,
        |  TRIM(c_name) AS trimmed,
        |  REVERSE(c_mktsegment) AS rseg,
        |  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer WHERE c_name LIKE '%1%'""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_name").like("%1%"))
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"), lower(col("c_mktsegment")).as("lseg"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          length(col("c_name")).as("name_len"),
          concat(col("c_name"), lit(":"), col("c_mktsegment")).as("tagged"),
          regexp_replace(col("c_name"), "#", "@").as("repl"),
          trim(col("c_name")).as("trimmed"),
          reverse(col("c_mktsegment")).as("rseg"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
    },

    QDef("q32_date_funcs",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
    },

    QDef("q33_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS abs_d,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS fl, CAST(CEIL(l_quantity) AS BIGINT) AS ce,
        |  SQRT(l_quantity) AS sq,
        |  l_quantity * l_quantity AS qty2,
        |  CAST(MOD(l_orderkey, 7) AS BIGINT) AS m7,
        |  ROUND(LN(l_extendedprice), 4) AS ln4,
        |  CAST(GREATEST(l_tax, l_discount) AS DOUBLE) AS gr,
        |  CAST(LEAST(l_tax, l_discount) AS DOUBLE) AS le
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          floor(col("l_quantity")).as("fl"), ceil(col("l_quantity")).as("ce"),
          sqrt(col("l_quantity")).as("sq"),
          (col("l_quantity") * col("l_quantity")).as("qty2"),
          (col("l_orderkey") % 7).as("m7"),
          round(log(col("l_extendedprice")), 4).as("ln4"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
    },

    QDef("q34_conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("urgent"))
    },

    // ---- pivot (expressed as conditional aggregation in the oracle) ------
    QDef("q35_pivot",
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS A,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS N,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS R
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
    },

    // ---- events: latest-per-key (as-of idiom) + regexp ------------------
    QDef("q36_latest_per_key",
      """SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"))
    },

    QDef("q37_regexp",
      """SELECT event_id,
        |  CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS INTEGER) AS k_val,
        |  REGEXP_MATCHES(props, '[05]}$') AS ends_in_0_or_5
        |FROM events WHERE event_type = 'click'""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("event_type") === "click")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k_val"),
          col("props").rlike("[05]\\}$").as("ends_in_0_or_5"))
    },

    QDef("q38_window_range_frame",
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT event_id, user_id,
              |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
              |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
              |FROM events""".stripMargin)
    }
  )
}
