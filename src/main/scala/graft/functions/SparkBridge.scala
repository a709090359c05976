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

  /** Execute a hand-built/rewritten logical plan as a DataFrame —
    * used by the plan-rewrite tests to run a rule's output and compare
    * it against the original query's result. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Last-executed micro-batch physical plan of a streaming query —
    * lets specs assert streaming plan shape (e.g. that an admission
    * gate's verify side scans the persisted index artifact and never
    * the source table). The wrapper/execution types are sql-private,
    * hence this bridge. */
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q.asInstanceOf[execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString

  /** Session-local function registration (the non-extensions path). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
