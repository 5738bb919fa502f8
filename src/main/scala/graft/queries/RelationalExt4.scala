package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifth tranche of the relational surface: exact-moment bivariate
  * statistics (correlation/covariance) and multi-stage funnel analysis.
  */
object RelationalExt4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // Pearson correlation + sample covariance from exact decimal moments
    // (Σx, Σy, Σxy, Σx², Σy², n) — the q42 determinism route extended to
    // two variables: built-in corr() streams Welford-style co-moments
    // whose result depends on partition order, while decimal sums are
    // order-independent and the final double expression is a fixed-order
    // IEEE tree both engines evaluate identically (sqrt is correctly
    // rounded). Three bit-portability rules, each observed failing before
    // this shape: (1) every double multiply feeds a divide or sqrt —
    // never `a*b - c*d`, which a C++ engine with fp contraction fuses
    // into a differently-rounded FMA; (2) the squared moments multiply in
    // DECIMAL, not double — casting a double SQUARE to decimal rounds at
    // a digit where the engines' double→decimal conversions disagree,
    // while the 2dp column cast is unambiguous and decimal×decimal is
    // exact; (3) the second-moment sums ROUND to scale 0 before the
    // double cast — their scale-4 integers pass 2^53 already at sf0.001,
    // where DuckDB's int128→double double-rounds, while a scale-0 value
    // is one correctly-rounded conversion in both engines at any
    // magnitude. One partial-aggregated shuffle, same cost as a GROUP BY
    QDef("q73_exact_corr",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  (CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE)
        |     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |  / (sqrt(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))), 0) AS DOUBLE)
        |       - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |         * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |     * sqrt(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE)
        |       - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |         * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))) AS corr_qty_price,
        |  (CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE)
        |     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1) AS covar_samp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val n = count(lit(1))
      val xd = col("l_quantity").cast("decimal(12,2)")
      val yd = col("l_extendedprice").cast("decimal(12,2)")
      val sx = sum(xd).cast("double")
      val sy = sum(yd).cast("double")
      val sxy = round(sum(xd * yd), 0).cast("double")
      val sxx = round(sum(xd * xd), 0).cast("double")
      val syy = round(sum(yd * yd), 0).cast("double")
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(n.as("n"),
          ((sxy - sx * sy / n)
            / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))).as("corr_qty_price"),
          ((sxy - sx * sy / n) / (n - lit(1))).as("covar_samp"))
    },

    // aggregate FILTER clause (per-aggregate predicates in one pass —
    // the conditional-aggregation surface beyond CASE): one scan, one
    // partial-aggregated shuffle; each FILTER evaluates map-side.
    // DECIMAL(18,2), not (18,6): prices are 2dp, and the smaller scale
    // keeps the scaled sum inside 2^53 (exact double cast) to ~sf100
    QDef("q75_filtered_agg",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_custs,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE) AS urgent_total
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
              |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
              |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_custs,
              |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              |    FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE) AS urgent_total
              |FROM orders GROUP BY o_orderstatus""".stripMargin)
    },

    // multi-stage funnel (view → click after view → purchase after click):
    // each stage is a per-user MIN-timestamp aggregation joined back to
    // the event stream — three shuffles all keyed on user_id, so at scale
    // the stages co-partition and the joins are shuffle-free after the
    // first exchange; stage tables shrink monotonically (classic funnel)
    QDef("q74_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click_after_view,
        |       (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin) { (s, dir) =>
      val events = t(s, dir, "events")
      def stage(prev: DataFrame, prevTs: String, evType: String, outTs: String) =
        events.filter(col("event_type") === evType)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs))
          .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
      val v = events.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = stage(v, "t1", "click", "t2")
      val p = stage(c, "t2", "purchase", "t3")
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
    }
  )
}
