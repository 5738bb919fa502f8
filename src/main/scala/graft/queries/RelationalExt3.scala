package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth tranche of the relational surface: unpivot, distribution
  * window functions, IGNORE NULLS forward-fill, bitwise aggregates,
  * higher-order array functions, recursive CTE.
  */
object RelationalExt3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // UNPIVOT (wide -> long): Dataset.unpivot plans a single Expand —
    // one pass over the input, no join/shuffle
    QDef("q63_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
        |WHERE l_orderkey % 500 = 0""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("quantity"), col("l_discount").as("discount"),
          col("l_tax").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "metric", "value")
    },

    // distribution window functions: percent_rank/cume_dist are exact
    // int/int double divisions (bit-portable); nth_value over an explicit
    // running frame (rank functions take the default frame — Spark
    // rejects explicit frames for them, so two windows)
    QDef("q64_window_dist",
      """SELECT o_orderkey, o_orderstatus,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
        |  nth_value(o_totalprice, 2) OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
        |FROM orders WHERE o_orderkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"),
          nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
    },

    // forward-fill (gap-fill) via LAST_VALUE ... IGNORE NULLS over a
    // running frame — the standard repair idiom for sparse time series;
    // partition-parallel per key, no cross-key state
    QDef("q65_forward_fill",
      """SELECT o_orderkey, o_custkey,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM (SELECT o_orderkey, o_custkey,
        |        CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS v
        |      FROM orders)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("v",
          when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_totalprice")))
        .select(col("o_orderkey"), col("o_custkey"),
          last(col("v"), ignoreNulls = true).over(w).as("filled"))
    },

    // bitwise scalar ops + bitwise aggregates (AND/OR/XOR fold per group)
    QDef("q66_bitwise",
      """SELECT o_orderstatus,
        |  bit_and(o_orderkey & 255) AS and_low, bit_or(o_orderkey % 64) AS or_mod,
        |  bit_xor(o_orderkey) AS xor_all,
        |  CAST(SUM(o_orderkey << 1) AS BIGINT) AS sum_shifted
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(expr("bit_and(o_orderkey & 255)").as("and_low"),
          expr("bit_or(o_orderkey % 64)").as("or_mod"),
          expr("bit_xor(o_orderkey)").as("xor_all"),
          sum(shiftleft(col("o_orderkey"), 1)).cast("bigint").as("sum_shifted"))
    },

    // higher-order array functions (transform/filter/aggregate/exists) —
    // codegen'd lambda evaluation, no UDF
    // array outputs are emitted as array_join'd CSV of DECIMAL(18,6)
    // strings: raw array columns crash the oracle harness's pandas sort
    // (unhashable ndarray), and decimal-at-fixed-scale rendering is
    // bit-identical across engines where double→string is not
    QDef("q67_higher_order_array",
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_transform([l_quantity, l_discount, l_tax],
        |    x -> CAST(CAST(x * 2.0 AS DECIMAL(18,6)) AS VARCHAR)), ',') AS doubled_csv,
        |  array_to_string(list_transform(
        |    list_filter([l_quantity, l_discount, l_tax], x -> x > 0.05),
        |    x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), ',') AS big_csv,
        |  CAST(CAST(list_reduce([0.0, l_quantity, l_discount, l_tax],
        |    (a, x) -> a + x) AS DECIMAL(18,6)) AS DOUBLE) AS total,
        |  len(list_filter([l_quantity, l_discount, l_tax], x -> x > 0.05)) > 0 AS has_big
        |FROM lineitem WHERE l_orderkey % 500 = 0""".stripMargin) { (s, dir) =>
      val arr = array(col("l_quantity"), col("l_discount"), col("l_tax"))
      val decStr = (x: Column) => x.cast("decimal(18,6)").cast("string")
      t(s, dir, "lineitem").filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          array_join(transform(arr, x => decStr(x * 2.0)), ",").as("doubled_csv"),
          array_join(transform(filter(arr, x => x > 0.05), decStr), ",").as("big_csv"),
          aggregate(arr, lit(0.0), (a, x) => a + x)
            .cast("decimal(18,6)").cast("double").as("total"),
          exists(arr, x => x > 0.05).as("has_big"))
    },

    // Hive-style partitioned write + partition-pruned read-back: the
    // 100 TB output layout (one directory per partition value; a reader
    // filtering on the partition column never opens other partitions —
    // PartitionFilters in the scan, verified by plan in the spec suite)
    QDef("q72_partitioned_write",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('en', 'fr') GROUP BY lang""".stripMargin) { (s, dir) =>
      // pid-scoped + shutdown-cleaned (TmpDirs): concurrent JVMs don't
      // clobber each other, repeated runs don't leak dataset copies
      val out = graft.TmpDirs.scoped(
        "graft-q72-" + java.lang.Integer.toHexString(dir.hashCode))
      // repartition BY the partition column first: without it every
      // input task writes a file into every lang directory (tasks ×
      // langs small files — the classic partitioned-write explosion;
      // at 100 TB that's millions of tiny files). One shuffle buys one
      // file per partition value, independent of input layout.
      t(s, dir, "documents").repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "fr"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("bigint").as("chars"))
    },

    // NATURAL JOIN: implicit equi-join on the shared column name
    QDef("q69_natural_join",
      """SELECT r_name, COUNT(*) AS n
        |FROM (SELECT n_name, n_regionkey AS r_regionkey FROM nation) n
        |NATURAL JOIN region GROUP BY r_name""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT r_name, COUNT(*) AS n
              |FROM (SELECT n_name, n_regionkey AS r_regionkey FROM nation) n
              |NATURAL JOIN region GROUP BY r_name""".stripMargin)
    },

    // inline VALUES table joined against a real table — the literal
    // lookup-table idiom (plans as a broadcast LocalRelation, no scan)
    QDef("q70_values_table",
      """SELECT t.code, COUNT(*) AS n FROM customer c
        |JOIN (VALUES ('BUILDING', 1), ('AUTOMOBILE', 2)) AS t(seg, code)
        |  ON c.c_mktsegment = t.seg
        |GROUP BY t.code""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT t.code, COUNT(*) AS n FROM customer c
              |JOIN (VALUES ('BUILDING', 1), ('AUTOMOBILE', 2)) AS t(seg, code)
              |  ON c.c_mktsegment = t.seg
              |GROUP BY t.code""".stripMargin)
    },

    // interval-overlap join (ops.RangeJoin.intervalOverlap): the binned
    // first-common-bin rewrite of a nested-loop inequality join; oracle
    // is the naive overlap join, proving each pair appears exactly once
    QDef("q71_interval_overlap",
      """SELECT p_partkey, l_orderkey, l_linenumber
        |FROM (SELECT p_partkey, p_retailprice - 50 AS p_lo, p_retailprice + 50 AS p_hi
        |      FROM part WHERE p_partkey % 20 = 0) p
        |JOIN (SELECT l_orderkey, l_linenumber,
        |        l_extendedprice - 25 AS l_lo, l_extendedprice + 25 AS l_hi
        |      FROM lineitem WHERE l_orderkey % 100 = 0) l
        |  ON p_lo <= l_hi AND l_lo <= p_hi""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part").filter(col("p_partkey") % 20 === 0)
        .select(col("p_partkey"),
          (col("p_retailprice") - 50).as("p_lo"), (col("p_retailprice") + 50).as("p_hi"))
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") - 25).as("l_lo"), (col("l_extendedprice") + 25).as("l_hi"))
      graft.ops.RangeJoin.intervalOverlap(p, l, "p_lo", "p_hi", "l_lo", "l_hi",
          binWidth = 100.0)
        .select(col("p_partkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // recursive CTE (linear recursion) — generates the 0..24 key range
    // and joins it back to a real table
    QDef("q68_recursive_cte",
      """WITH RECURSIVE r(n) AS (
        |  SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 24)
        |SELECT r.n, n_name FROM r JOIN nation ON n_nationkey = r.n""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""WITH RECURSIVE r(n) AS (
              |  SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 24)
              |SELECT r.n, n_name FROM r JOIN nation ON n_nationkey = r.n""".stripMargin)
    }
  )
}
