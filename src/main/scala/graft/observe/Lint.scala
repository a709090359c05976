package graft.observe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions.col

/** Plan lint — the 100 TB discipline PlanSpec enforces on the engine's
  * own queries, offered to the USER's queries as a relation: hand any
  * DataFrame in and get back the scale hazards its physical plan
  * carries, before a cluster burns a day discovering them. Pure plan
  * metadata (zero jobs); the rules are exactly the invariants this
  * repo machine-checks on itself:
  *
  *  - `cartesian-product` (error): every pair of rows meets — O(n·m)
  *    at any scale; almost always a missing join key.
  *  - `single-partition-window` (error): an unpartitioned window
  *    funnels the whole input through ONE task (the q133 trap —
  *    100 TB through one sort buffer).
  *  - `broadcast-nested-loop` (warn): legitimate for a model-sized
  *    side streamed against once (the q31/q93 pattern); fatal if the
  *    "small" side is not actually small — surfaced for a human call.
  *  - `filter-not-pushed` (warn): a Filter sits directly on a scan
  *    but NOTHING reached the parquet reader — every row group is
  *    read and decoded before the predicate runs (non-pushable
  *    expressions: UDFs, transforms of the column, …).
  *  - `full-width-scan` (info): the scan fetches every column of a
  *    wider relation — fine for `SELECT *`, a pruning bug otherwise.
  *
  * One row per finding: `(rule, severity, node)`, `node` = the plan
  * node's one-line rendering (truncated) so the finding points at the
  * operator, not just the rule name. */
object Lint {

  private def head(p: SparkPlan): String = {
    val s = p.simpleStringWithNodeId()
    if (s.length <= 120) s else s.take(117) + "..."
  }

  def planLint(df: DataFrame): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    val plan = df.queryExecution.sparkPlan
    val findings = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String)]
    plan.foreach {
      case p: CartesianProductExec =>
        findings += (("cartesian-product", "error", head(p)))
      case p: BroadcastNestedLoopJoinExec =>
        findings += (("broadcast-nested-loop", "warn", head(p)))
      case p: WindowExec if p.partitionSpec.isEmpty =>
        findings += (("single-partition-window", "error", head(p)))
      case FilterExec(_, scan: FileSourceScanExec)
          // null-guards alone don't prune row groups: judge by the
          // TRANSLATED source filters (what parquet actually receives,
          // rendered in scan metadata), not dataFilters (the catalyst
          // predicates, which keep non-translatable expressions). A
          // comma inside a rendered filter only makes this check MORE
          // conservative (the fragment won't parse as IsNotNull).
          if scan.metadata.getOrElse("PushedFilters", "[]")
            .stripPrefix("[").stripSuffix("]")
            .split(",").map(_.trim).filter(_.nonEmpty)
            .forall(_.startsWith("IsNotNull(")) &&
            scan.partitionFilters.isEmpty =>
        findings += (("filter-not-pushed", "warn", head(scan)))
      case scan: FileSourceScanExec
          if scan.relation.dataSchema.size > 1 &&
            scan.output.size >= scan.relation.dataSchema.size =>
        findings += (("full-width-scan", "info", head(scan)))
      case _ =>
    }
    findings.toSeq.distinct
      .toDF("rule", "severity", "node")
      .orderBy(col("severity"), col("rule"), col("node"))
  }
}
