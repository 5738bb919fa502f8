package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs over the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check
  * (used for ops whose semantics aren't SQL-expressible, e.g. MinHash
  * dedup or streaming).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(sql))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
