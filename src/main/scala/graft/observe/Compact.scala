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

  /** Partition-scoped backfill — Spark's dynamic partition overwrite
    * (`partitionOverwriteMode=dynamic`) as the idempotent-backfill
    * primitive: `replacement` rewrites ONLY the hive-style partitions
    * its rows belong to; every other partition's files are untouched
    * (same paths, same bytes — ObserveSpec asserts this by mtime and
    * content). This is how an hourly pipeline re-runs one bad
    * day/language without rewriting — or even listing — the other
    * 100 TB: the write plans against the replacement rows alone, and
    * commit swaps just the affected partition directories. STATIC
    * mode (the default) would silently drop every untouched partition,
    * which is exactly the production incident this wrapper exists to
    * make unrepresentable. */
  def overwritePartitions(s: SparkSession, tableDir: String,
      partitionCol: String, replacement: DataFrame): Unit = {
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      replacement.write.mode("overwrite")
        .partitionBy(partitionCol).parquet(tableDir)
    } finally {
      prev match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  def fileInventory(s: SparkSession, dir: String, probeCol: String): DataFrame =
    s.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min(col(probeCol)).as("min_probe"),
        max(col(probeCol)).as("max_probe"))
      .orderBy(col("min_probe"))

  /** Footer-statistics inventory — the O(metadata) flavor of
    * [[fileInventory]] and the engine analog of a table format's
    * transaction-log manifest (the reference reads `lastModified` from
    * `DESCRIBE DETAIL`, `dlt_assets.py:154-156`, never scanning data).
    * One row per file: exact row count and the max of a designated
    * timestamp column, both lifted from parquet row-group metadata —
    * no row of data is ever decoded.
    *
    * Footer reads are DISTRIBUTED (one task per slice of the file
    * list): at 100 TB a table is tens of thousands of files, and a
    * driver-side footer loop would serialize the hourly observation
    * plane; per-file work is a few KB of footer I/O.
    *
    * Timestamp stats are normalized to MICROSECONDS per each column's
    * parquet logical-type unit; nanos truncate with floor-div, exactly
    * matching the engine's ns→µs read conversion
    * ([[graft.Tables]] loadEvents), so `max(footer stats) ==
    * max(scanned column)` bit-for-bit. Files with missing/invalid
    * stats yield NULL (the caller's freshness default) rather than a
    * wrong answer.
    *
    * @param files   (table_name, path) pairs to inventory
    * @param statsCol table_name → timestamp column for freshness;
    *                 absent tables report NULL max_ts_micros
    */
  def footerInventory(s: SparkSession, files: Seq[(String, String)],
      statsCol: Map[String, String]): DataFrame = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val slices = math.max(1, math.min(files.size, s.sparkContext.defaultParallelism))
    // Ship the SESSION's Hadoop conf to the footer tasks: a bare
    // `new Configuration()` reads only classpath defaults and would
    // silently drop session FS settings — object-store credentials,
    // endpoints, timeouts — exactly where this runs at 100 TB. The
    // resolved entries ride once per executor as a broadcast (Hadoop's
    // Configuration is not serializable and Spark's wrapper is
    // spark-private); each partition rebuilds the conf once, not per
    // file.
    val confEntries = {
      val hc = s.sessionState.newHadoopConf()
      hc.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    val hcB = s.sparkContext.broadcast(confEntries)
    s.sparkContext.parallelize(files, slices).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      hcB.value.foreach { case (k, v) => conf.set(k, v) }
      it.map { case (name, path) =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val maxMicros: Option[Long] = statsCol.get(name).flatMap { c =>
          import org.apache.parquet.schema.LogicalTypeAnnotation
          val toMicros: Option[Long => Long] =
            footer.getFileMetaData.getSchema.getFields.asScala
              .find(_.getName == c)
              .flatMap(f => Option(f.asPrimitiveType().getLogicalTypeAnnotation))
              .collect {
                case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  t.getUnit match {
                    case LogicalTypeAnnotation.TimeUnit.MILLIS => (v: Long) => v * 1000L
                    case LogicalTypeAnnotation.TimeUnit.MICROS => (v: Long) => v
                    case LogicalTypeAnnotation.TimeUnit.NANOS =>
                      (v: Long) => Math.floorDiv(v, 1000L)
                  }
              }
          toMicros.flatMap { conv =>
            val maxes = blocks.flatMap { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == c).flatMap { cc =>
                val st = cc.getStatistics
                if (st == null || !st.hasNonNullValue()) None
                else Some(conv(st.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
              }
            }
            // every row group must carry stats, else the max is unknown
            if (maxes.size == blocks.size && maxes.nonEmpty) Some(maxes.max)
            else None
          }
        }
        (name, path, rows, maxMicros)
      } finally reader.close()
      }
    }.toDF("table_name", "file", "n_rows", "max_ts_micros")
  }
}
