package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal accessor for the `private[sql]` pieces a library-level
  * extension needs. Custom Catalyst expressions (graft.functions) need a
  * `Column` wrapper to compose with the public DataFrame API, and a
  * custom whole-operator plan (graft.plans.AsOfJoin) needs
  * plan <-> DataFrame conversion plus strategy registration; Spark 4
  * exposes no public constructors for these, so this one-file subpackage
  * of `org.apache.spark.sql` is the conventional extension-point shim.
  * No other Spark internals are touched this way.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed (resolved-attribute) logical plan of a DataFrame. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[Row]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** The LAST micro-batch's executed physical plan of a streaming
    * query, rendered — the streaming face of `df.queryExecution
    * .executedPlan` (PlanLint audits it for scale anti-patterns; the
    * public API exposes `explain()` only as a side-effecting print).
    * None before the first batch or for non-classic query handles. */
  def lastStreamingPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString)
      case _ => None
    }

  /** Idempotently register an extra planner strategy on a live session
    * (the public `experimental` hook; `SparkSessionExtensions` covers the
    * build-time path — see graft.GraftExtensions). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[CSparkSession].experimental
    if (!exp.extraStrategies.exists(_ eq s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
