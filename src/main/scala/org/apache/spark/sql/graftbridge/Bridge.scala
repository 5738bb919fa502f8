package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column <-> Expression
  * converters. Custom Catalyst expressions (graft.functions) need a
  * `Column` wrapper to compose with the public DataFrame API; Spark 4
  * exposes no public constructor for that, so this one-file subpackage of
  * `org.apache.spark.sql` is the conventional extension-point shim. No
  * other Spark internals are touched this way.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
