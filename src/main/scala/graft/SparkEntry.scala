package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2's inventory surfaces here as a named
  * query; each with ANSI-SQL oracle where the semantics are
  * SQL-expressible (the driver hash-compares against DuckDB).
  */
object SparkEntry {

  private def allDefs: Seq[QDef] =
    graft.queries.Relational.defs ++ graft.queries.RelationalExt.defs ++
      graft.queries.RelationalExt2.defs ++ graft.queries.RelationalExt3.defs ++
      graft.queries.RelationalExt4.defs ++ graft.queries.Cdc.defs ++
      graft.queries.CdcExt.defs ++ graft.queries.Llm.defs ++
      graft.queries.LlmExt.defs ++ graft.queries.LlmExt2.defs ++
      graft.queries.Streaming.defs ++
      graft.queries.ScaleTechniques.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * CDC source scan → latest-image compaction → join → aggregation. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Cdc.defs.find(_.name == "cdc07_current_join_agg").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
