package graft.queries

import graft.QDef
import graft.cdc.{CdcFixture, CdcSchema}
import org.apache.spark.sql.functions._

/** CDC capabilities beyond the plain scan: time-travel snapshots by GTID
  * (the CDC idiom the reference enables but cannot express itself),
  * change-range deltas, and multi-table logs.
  */
object CdcExt {

  val defs: Seq[QDef] = Seq(

    // as-of snapshot: the table's state as of transaction G. The __gtid
    // filter pushes into the source, so only the needed log prefix is
    // decoded — log-position pruning would skip whole files at scale.
    QDef("cdc09_asof_snapshot",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 AND 1000000 + idx <= 1000750
        |       THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
        |FROM ord""".stripMargin) { (s, dir) =>
      val snapshotGtid = 1000750L // inserts + first 751 update txns
      val cdc = Cdc.scan(s, dir).filter(col(CdcSchema.GtidCol) <= snapshotGtid)
      Cdc.latestImage(cdc, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // change-range delta: which keys changed between two transactions
    QDef("cdc10_changes_between",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey, CAST(1000000 + idx AS BIGINT) AS __gtid
        |FROM ord
        |WHERE o_orderkey % 10 = 0 AND 1000000 + idx > 1000200 AND 1000000 + idx <= 1000900""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir)
        .filter(col(CdcSchema.GtidCol) > 1000200L && col(CdcSchema.GtidCol) <= 1000900L
          && col(CdcSchema.OpCol) === CdcSchema.Op.UpdateAfter)
        .select(col("o_orderkey"), col(CdcSchema.GtidCol))
    },

    // second table in the same log: the audit stream (interleaved
    // TABLE_MAPs exercised end-to-end)
    QDef("cdc11_audit_table",
      """WITH ord AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |), batches AS (SELECT DISTINCT idx // 10 AS b FROM ord)
        |SELECT b AS audit_id, 'audit-' || CAST(b AS VARCHAR) AS note,
        |  CAST(1 AS INTEGER) AS __op, 500000 + b AS __gtid
        |FROM batches WHERE b % 40 = 0""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", "audit")
        .load()
        .select(col("audit_id"), col("note"), col(CdcSchema.OpCol), col(CdcSchema.GtidCol))
    },

    // nullable column through the full verified path: NULL bitmap on the
    // wire -> InternalRow null -> parquet null -> DuckDB NULL compare
    QDef("cdc12_nullable_column",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey AS note_id,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'n' || CAST(o_orderkey AS VARCHAR) END AS note,
        |  CAST(3000000 + idx AS BIGINT) AS __gtid
        |FROM ord WHERE o_orderkey % 20 = 0""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", "notes")
        .load()
        .select(col("note_id"), col("note"), col(CdcSchema.GtidCol))
    }
  )
}
