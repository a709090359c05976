package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Expression conversion for the
  * custom Catalyst expressions in `graft.functions`. Spark 4's classic
  * Column wraps a ColumnNode; `classic.ExpressionUtils` performs the
  * conversion but is sql-package-private, so this shim lives in
  * `org.apache.spark.sql` — the standard pattern for library-level
  * Catalyst extensions that don't need a full SparkSessionExtensions
  * registration. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
