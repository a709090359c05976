package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sensor semantics — SURVEY.md §2.10 (reference
  * `dlt_sensor.py:8-46`, `job_discovery.py:22-55`), re-expressed as
  * Structured Streaming over an update-event feed.
  *
  * The reference polls REST every ≥60 s and keeps a
  * `{pipeline_id:update_id → state}` cursor JSON; here the cursor is the
  * streaming state store (per-key `GroupState`, RocksDB/HDFS-backed on a
  * real cluster — exactly-once across restarts without hand-rolled
  * cursor serialization), and each micro-batch is one "poll".
  *
  * Scale: state is partitioned by group key across executors; a million
  * concurrently-tracked pipelines is a few hundred bytes each of state,
  * shuffled once per batch by key. Watermarks bound state for the
  * dedup/window operators so state never grows unboundedly.
  */
object Sensors {

  /** One observed update of a monitored entity (≅ DLT pipeline update /
    * job run poll result). */
  case class UpdateEvent(entityId: Long, updateId: Long, state: String, ts: Timestamp)

  /** Sensor output: emitted at most once per (entityId, updateId). */
  case class SensorEmit(entityId: Long, updateId: Long, state: String, ts: Timestamp)

  /** Terminal pipeline-update states (`pipeline_discovery.py:74`). */
  val terminal: Set[String] = Set("COMPLETED", "FAILED", "CANCELED")

  /** T1 + T4 — rising-edge detection with at-most-once emission:
    * emit when a key FIRST reaches a terminal state (`dlt_sensor.py:27`:
    * `state == COMPLETED && last_recorded != COMPLETED`), never again
    * (`:41` cursor update). State per (entityId, updateId): a Boolean
    * "already emitted" flag — the smallest faithful cursor. */
  def risingEdge(updates: Dataset[UpdateEvent]): Dataset[SensorEmit] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(u => (u.entityId, u.updateId))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(emitOnce)
  }

  private def emitOnce(
      key: (Long, Long),
      events: Iterator[UpdateEvent],
      state: GroupState[Boolean]): Iterator[SensorEmit] = {
    if (state.getOption.contains(true)) Iterator.empty
    else {
      // Batch arrival order is not event order: sort by event time.
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.state))
      sorted.find(e => terminal(e.state)) match {
        case Some(e) =>
          state.update(true)
          Iterator.single(SensorEmit(key._1, key._2, e.state, e.ts))
        case None => Iterator.empty
      }
    }
  }

  /** Poll-until-terminal-or-timeout state machine output. */
  case class PollResult(entityId: Long, outcome: String, state: String)

  /** T2 — trigger-and-poll with timeout (`job_discovery.py:22-55`):
    * per entity, succeed on the first terminal state; if the event-time
    * watermark passes `timeout` past the entity's first-seen ts without
    * one, emit a TIMEOUT row (the reference returns
    * `{"status": "timeout"}` after 600 s of 5 s polls). Event-time
    * timeout ⇒ deterministic under replay, unlike wall-clock. */
  def pollWithTimeout(
      updates: Dataset[UpdateEvent],
      timeoutMs: Long = 600000L): Dataset[PollResult] = {
    import updates.sparkSession.implicits._
    updates
      .withWatermark("ts", "1 second") // EventTimeTimeout needs a watermark
      .groupByKey(_.entityId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entityId: Long, events: Iterator[UpdateEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(PollResult(entityId, "timeout", ""))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.state))
            sorted.find(e => terminal(e.state)) match {
              case Some(e) =>
                state.remove()
                Iterator.single(PollResult(entityId, "done", e.state))
              case None =>
                val start = state.getOption
                  .getOrElse(sorted.headOption.map(_.ts.getTime).getOrElse(0L))
                state.update(start)
                state.setTimeoutTimestamp(start + timeoutMs)
                Iterator.empty
            }
          }
      }
  }

  /** T4 standalone — at-most-once per (entityId, updateId) via
    * `dropDuplicatesWithinWatermark`: the streaming state analog of
    * the reference's cursor-key dedup, with state EVICTION actually
    * wired. A plain `dropDuplicates` under a watermark only evicts
    * when the event-time column is part of the dedup KEYS — with
    * (entityId, updateId) alone the state would grow one row per
    * update forever, the exact unbounded-state class the curated
    * gate's dedup plane was rebuilt to avoid (E162); the
    * within-watermark variant evicts by each row's stored event time,
    * so state is the lateness window. The contract is unchanged for
    * in-bound data: a redelivery INSIDE the 1-hour lateness bound is
    * dropped; one beyond it is by definition outside the stream's
    * declared disorder and would re-emit — T4's cursor semantics under
    * a bounded-lateness feed. */
  def dedupUpdates(updates: Dataset[UpdateEvent]): Dataset[UpdateEvent] =
    updates
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("entityId", "updateId"))

  /** T3 — event-time tumbling window counts with watermark (the
    * credible-observer windowed aggregation; append mode finalizes a
    * window once the watermark passes its end). */
  def windowedStateCounts(updates: Dataset[UpdateEvent]): DataFrame =
    updates
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("state"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("state"), col("n"))

  /** Gap-based SESSION windows over the stream — the streaming face of
    * q57's batch sessionization, on Spark's native `session_window`:
    * per (user, session) event counts, sessions GROWING as events
    * arrive (any event within 30 min of the session extends it; Spark
    * merges overlapping candidate windows in the state store) and
    * FINALIZING in append mode once the watermark passes gap-end — the
    * training-pipeline/product-analytics sessionizer with state
    * bounded by watermark eviction, per-key session state instead of a
    * per-user event array. The identical plan runs in batch (the
    * watermark is a no-op there), which is what the stream ≡ batch
    * spec gates. */
  def sessionCounts(updates: Dataset[UpdateEvent]): DataFrame =
    updates
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("entityId"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("entityId").as("user_id"), col("n_events"))

  /** T6 — watermarked stream-stream interval join: pair each terminal
    * update with the start poll of the same (entity, update) observed
    * at most 2 hours earlier, emitting the update's wall-clock
    * duration — the metric the reference computes imperatively inside
    * its trigger-and-poll loops (`job_discovery.py:22-55` `time.time()`
    * deltas, `pipeline_discovery.py:43-66`).
    *
    * Both sides carry a 1 hour watermark and the join condition bounds
    * `end_ts - start_ts` to [0, 2 h], so Spark can evict join state for
    * starts older than the bound — state stays O(in-flight updates),
    * never O(history). Emits one row per (start poll, terminal poll)
    * pair; feed starts through [[dedupUpdates]] first for exactly one
    * row per update. */
  def updateDurations(updates: Dataset[UpdateEvent]): DataFrame = {
    val starts = updates.filter(u => u.state == "RUNNING").toDF()
      .select(col("entityId"), col("updateId"), col("ts").as("start_ts"))
      .withWatermark("start_ts", "1 hour")
    val ends = updates.filter(u => terminal(u.state)).toDF()
      .select(col("entityId").as("end_entity"), col("updateId").as("end_update"),
        col("state").as("end_state"), col("ts").as("end_ts"))
      .withWatermark("end_ts", "1 hour")
    starts.join(ends,
      col("entityId") === col("end_entity") &&
        col("updateId") === col("end_update") &&
        col("end_ts") >= col("start_ts") &&
        col("end_ts") <= col("start_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("entityId"), col("updateId"), col("end_state"),
        col("start_ts"), col("end_ts"),
        (unix_millis(col("end_ts")) - unix_millis(col("start_ts")))
          .as("duration_ms"))
  }

  /** Batch twin of T1 for snapshot feeds (reference's sensor diff of
    * current vs previously-recorded state): new-terminal keys are those
    * terminal now and not terminal (or absent) before. Anti-join form —
    * broadcast-friendly when the previous snapshot is the smaller side. */
  def snapshotRisingEdge(prev: DataFrame, curr: DataFrame): DataFrame = {
    val terminalNow = curr.filter(col("state").isin(terminal.toSeq: _*))
    val terminalBefore = prev.filter(col("state").isin(terminal.toSeq: _*))
      .select(col("entityId"), col("updateId"))
    terminalNow.join(terminalBefore, Seq("entityId", "updateId"), "left_anti")
  }
}
