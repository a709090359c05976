package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — a change-feed stream continuously maintaining
  * a keyed parquet snapshot (the `MERGE INTO` + `applyChanges` analog,
  * composing [[graft.ops.Cdc.merge]] with
  * [[graft.observe.Compact.overwritePartitions]]).
  *
  * The snapshot lives hive-partitioned by a key bucket
  * (`bucket = key % nBuckets`). Each micro-batch:
  *
  *   1. buckets its changes map-only and derives the TOUCHED bucket
  *      set (≤ nBuckets longs — model-sized driver data);
  *   2. reads ONLY those partitions of the snapshot (partition
  *      pruning on the hive column — machine-fact, not hope);
  *   3. applies the broadcast-anti merge (the base slice never
  *      shuffles);
  *   4. dynamic-partition-overwrites — so the rewrite touches exactly
  *      the buckets the batch touched.
  *
  * That last property is the 100 TB story: per-batch cost is
  * O(changed-buckets' data), never O(snapshot). A hot-key feed
  * rewrites one bucket forever; the other nBuckets−1 partitions'
  * files are never opened, listed, or rewritten (StreamingSpec
  * asserts their files byte-identical across batches). nBuckets is
  * the rewrite-granularity knob: more buckets = finer rewrites but
  * more small files — compaction (E28) owns that trade-off.
  *
  * Transactionality: plain parquet directory swap is per-partition
  * atomic-rename (the IndexStore publish discipline); a table format
  * with a transaction log would slot its commit in step 4 and nothing
  * else changes.
  */
object Upsert {

  private def bucketed(df: DataFrame, key: String, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(col(key), lit(nBuckets.toLong)))

  /** Seed the bucket-partitioned snapshot from a base relation. */
  def initSnapshot(s: SparkSession, snapshotDir: String, base: DataFrame,
      key: String, nBuckets: Int): Unit =
    bucketed(base, key, nBuckets)
      .write.partitionBy("bucket").parquet(snapshotDir)

  /** Apply one change batch (rows carry the snapshot schema plus an
    * `op` column: I/U/D). Shared by the streaming sink and batch
    * backfills — ONE code path, the admission-control discipline. */
  def applyBatch(s: SparkSession, snapshotDir: String, key: String,
      nBuckets: Int, changes: DataFrame): Unit = {
    val chB = bucketed(changes, key, nBuckets)
    val touched = chB.select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val base = s.read.parquet(snapshotDir)
        .filter(col("bucket").isin(touched: _*))
      val merged = graft.ops.Cdc.merge(base, chB, key)
      graft.observe.Compact.overwritePartitions(
        s, snapshotDir, "bucket", merged)
    }
  }

  /** The streaming face: foreachBatch over the change feed. */
  def sink(s: SparkSession, snapshotDir: String, key: String,
      nBuckets: Int, changes: DataFrame, checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(s, snapshotDir, key, nBuckets, batch)
      }
      .start()
}
