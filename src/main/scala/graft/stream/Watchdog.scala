package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Freshness watchdog — the PUSH form of the reference's freshness
  * checks (`dlt_assets.py:154-156` reads a table's last-update timestamp
  * and compares it to now; `dlt_sensor.py` polls): instead of a scan
  * that asks "how stale is every table?", each table's event feed ARMS
  * a per-key timer, and a table that stops reporting fires an alert the
  * moment the event-time watermark passes its deadline — no polling
  * scan, no per-table query fan-out.
  *
  * Built on Spark 4's arbitrary-state v2 (`transformWithState` +
  * [[StatefulProcessor]]): per-key `ValueState` holds the max event
  * time seen, and ONE registered event-time timer per key carries the
  * deadline. Timers live in the state store (RocksDB-backed), so a
  * million monitored tables is a million (long, long) pairs partitioned
  * across executors — state is O(keys), re-armed in place, and the
  * whole machine replays deterministically because expiry is judged
  * against the watermark, not the wall clock.
  */
object Watchdog {

  /** One materialization heartbeat of a monitored table. */
  case class TableEvent(tableName: String, ts: Timestamp)

  /** Emitted once per lapse: the key went `staleAfterMs` past its last
    * heartbeat. `deadlineMs` is the expired timer's timestamp (last
    * heartbeat + staleAfterMs) — the instant the table BECAME stale,
    * not the batch time that noticed it. */
  case class StaleAlert(tableName: String, lastSeen: Timestamp, deadlineMs: Long)

  private class FreshnessProcessor(staleAfterMs: Long)
      extends StatefulProcessor[String, TableEvent, StaleAlert] {

    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long](
        "lastSeen", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[TableEvent],
        timerValues: TimerValues): Iterator[StaleAlert] = {
      val batchMax = rows.map(_.ts.getTime).max
      val newMax =
        if (lastSeen.exists()) math.max(lastSeen.get(), batchMax) else batchMax
      // Re-arm: exactly one live timer per key (delete-then-register;
      // a late batch that does not advance the max still re-arms the
      // same deadline, which is a no-op by construction).
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(newMax + staleAfterMs)
      lastSeen.update(newMax)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StaleAlert] = {
      val last = lastSeen.get()
      // Keep the state so a revived heartbeat re-arms from the true
      // max; the fired timer is auto-deleted by the runtime.
      Iterator.single(
        StaleAlert(key, new Timestamp(last), expiredTimerInfo.getExpiryTimeInMs()))
    }
  }

  /** Stale-table alert stream: one [[StaleAlert]] per key each time it
    * lapses `staleAfterMs` past its newest heartbeat (a key that
    * revives and lapses again alerts again — the re-armed timer). The
    * input needs a watermark on `ts`; expiry is watermark-driven
    * (deterministic under replay). Requires the RocksDB state store
    * provider, the transformWithState backend. */
  def staleAlerts(
      events: Dataset[TableEvent],
      staleAfterMs: Long): Dataset[StaleAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.tableName)
      .transformWithState(
        new FreshnessProcessor(staleAfterMs),
        TimeMode.EventTime(),
        OutputMode.Update())
  }
}
