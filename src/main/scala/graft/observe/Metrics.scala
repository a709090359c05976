package graft.observe

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Self-observability via Spark's own metrics infrastructure — the
  * engine-native answer to the reference's "observe the warehouse"
  * loop (BASELINE.json north star: "Databricks observability using
  * Spark metrics").
  *
  * Two planes:
  *  - **Query-level**: [[org.apache.spark.sql.Observation]] /
  *    `Dataset.observe` — named aggregates piggybacked on an action's
  *    single pass (`CollectMetrics` node), so row counts / sums for the
  *    materialization event come for free with the write instead of a
  *    second scan. This is how the reference's `row_count` metadata
  *    (`dlt_assets.py:150-151`, one COUNT scan per table per hour)
  *    should be computed when you own the engine.
  *  - **Task-level**: a [[SparkListener]] aggregating executor task
  *    metrics per stage (records/bytes read, shuffle traffic, spills) —
  *    the raw feed a 1000-executor deployment ships to its metrics
  *    sink; here surfaced as a queryable DataFrame.
  */
object Metrics {

  /** Write the flagship result once, harvesting row_count and an
    * acctbal sum from the SAME pass via observe — the
    * single-scan version of the reference's write+count lifecycle. */
  def observedWrite(
      s: SparkSession, dir: String, outPath: String): Map[String, Any] = {
    val obs = Observation("flagship_metrics")
    graft.ops.Relational.flagship(s, dir)
      .observe(obs,
        count(lit(1)).as("row_count"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .write.mode("overwrite").parquet(outPath)
    obs.get
  }

  /** Plan-derived access lineage: which tables a query READS, and
    * which columns actually survive pruning — the third observability
    * plane (query-level metrics, task-level metrics, and now
    * data-access lineage). Walks the OPTIMIZED plan's file-source
    * relations, so the column list is what the scan will truly fetch
    * (column pruning applied), not what the user referenced — the
    * honest input for access auditing, impact analysis ("who reads
    * this column I want to drop"), and cache/layout decisions. Pure
    * plan metadata: zero jobs, zero data pages. One row per scanned
    * relation: `(table, columns, n_columns)`, table = the scan's root
    * path leaf. */
  def accessLineage(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sparkPlan (pre-AQE physical): FileSourceScanExec's output IS the
    // pruned column set the scan fetches, and its pushed filters are
    // the predicates parquet will evaluate against row-group stats
    val rows = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        val table = f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("<unknown>")
        (table,
          f.output.map(_.name).sorted,
          f.output.size.toLong,
          f.dataFilters.map(_.sql).sorted)
    }.distinct
    rows.toDF("table", "columns", "n_columns", "pushed_filters")
      .orderBy(col("table"), col("columns"))
  }

  /** Cumulative per-stage task metrics captured by [[listen]]. */
  private val stageMetrics = TrieMap.empty[Int, (Long, Long, Long, Long)]

  private lazy val listener = new SparkListener {
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        stageMetrics.put(ev.stageInfo.stageId, (
          m.inputMetrics.recordsRead,
          m.inputMetrics.bytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled))
      }
    }
  }

  @volatile private var listening = false

  /** Install the task-metrics listener (idempotent). */
  def listen(s: SparkSession): Unit = synchronized {
    if (!listening) {
      s.sparkContext.addSparkListener(listener)
      listening = true
    }
  }

  /** Snapshot of captured stage metrics as a relation — joinable with
    * the materialization plane like any other metadata table. */
  def executionMetrics(s: SparkSession): DataFrame = {
    import s.implicits._
    stageMetrics.readOnlySnapshot().toSeq
      .map { case (id, (recs, in, shuf, spill)) => (id, recs, in, shuf, spill) }
      .toDF("stage_id", "records_read", "bytes_read",
        "shuffle_bytes_written", "bytes_spilled")
      .orderBy(col("stage_id"))
  }
}
