package graft.observe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance — the file-layout plane of a 100 TB warehouse.
  *
  * The reference observes tables but never maintains them; at scale the
  * engine owning the tables must also own their layout, because layout
  * IS performance: a table fragmented into millions of small files
  * spends its scan time in file-open overhead, and a table with no
  * clustering reads every row group for every selective query.
  *
  *  - [[compact]]: rewrite a directory into ~`targetRows`-row files
  *    (small-file compaction). Row-count-based sizing keeps the fixture
  *    deterministic; a production variant sizes by bytes
  *    (`spark.sql.files.maxRecordsPerFile` or AQE advisory size).
  *  - [[clusteredWrite]]: range-repartition + sort within partitions on
  *    the cluster columns before writing. Files then hold DISJOINT
  *    value ranges, so parquet row-group min/max stats (and file-level
  *    pruning in table formats that index them) answer selective scans
  *    with a fraction of the files — the poor man's Z-order for
  *    1-dimensional predicates.
  *  - [[fileInventory]]: per-file row counts + per-file min/max of a
  *    probe column, derived with `input_file_name()` — the evidence
  *    relation the two ops above are judged by (and the engine analog
  *    of a table format's file manifest).
  */
object Compact {

  def compact(s: SparkSession, inDir: String, outDir: String,
      targetRows: Long): Unit = {
    val df = s.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    // repartition(n) without keys is round-robin: even output sizes
    // regardless of input skew — exactly what compaction wants.
    df.repartition(files).write.mode("overwrite").parquet(outDir)
  }

  def clusteredWrite(s: SparkSession, inDir: String, outDir: String,
      files: Int, clusterCols: Seq[String]): Unit = {
    val df = s.read.parquet(inDir)
    val cols = clusterCols.map(col)
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
  }

  def fileInventory(s: SparkSession, dir: String, probeCol: String): DataFrame =
    s.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min(col(probeCol)).as("min_probe"),
        max(col(probeCol)).as("max_probe"))
      .orderBy(col("min_probe"))
}
