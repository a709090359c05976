package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) layout for scan pruning —
  * the lakehouse `OPTIMIZE … ZORDER BY` operation re-expressed on
  * plain Spark + parquet (reference tables are point-and-range
  * filtered on more than one key, e.g. `observe_assets.py:60-103`'s
  * per-entity slices over time; a single-column sort layout prunes
  * only its leading column).
  *
  * A Z-value interleaves the bits of two keys, so sorting by it makes
  * every contiguous run of rows — hence every parquet ROW GROUP — a
  * small rectangle in (a, b) space. A reader with predicates on
  * EITHER or BOTH keys skips row groups whose footer min/max
  * rectangle misses the box; with a linear layout the non-leading
  * column's min/max spans the whole domain in every row group and
  * nothing skips. 31 bits per dimension are interleaved — complete
  * for any non-negative int32-range key, not a tuned constant; keys
  * simply never set higher bits ([[Zcurve]] in Morton 1966's
  * formulation).
  *
  * Scale shape: computing z is a map-only codegen'd projection;
  * laying out is ONE range shuffle (`repartitionByRange` samples z)
  * plus an in-partition spill-safe sort — the exact cost of the
  * single-column sort layout it replaces. The payoff is footer-stat
  * row-group pruning on every clustered dimension at read time,
  * which at 100 TB is the difference between scanning a file set and
  * scanning a rectangle. [[rowGroupStats]] exposes the footer
  * rectangles as a relation so the pruning claim is MEASURED
  * (LayoutSpec counts box-intersecting row groups, z vs linear), the
  * same footer-only distributed read as `Compact.footerInventory`.
  */
object Layout {

  /** Morton Z-value of two non-negative long keys: bit i of `a` lands
    * at bit 2i, bit i of `b` at 2i+1 — 62 result bits, sign-safe in a
    * BIGINT. A 62-term codegen'd shift/mask sum, no UDF.
    *
    * Interleave NORMALIZED inputs: raw keys of different magnitudes
    * (an 8-bit supplier id against a 21-bit part id) put one
    * dimension entirely into low-order bits — the "z" order collapses
    * to a linear sort on the wide key with jitter, and the layout
    * prunes WORSE than a plain sort (measured in LayoutSpec's first
    * failing iteration). [[bucketOf]] is the normalizer. */
  def zvalue(a: Column, b: Column): Column =
    (0 until 31).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Equal-width bucket index of `c` in [0, buckets): integer-exact
    * `(c - mn) * buckets / (mx - mn + 1)` — the normalization that
    * puts both dimensions on one scale before interleaving (the
    * range-id normalization of lakehouse ZORDER implementations,
    * equal-width because the fixture keys are dense surrogates; a
    * skewed dimension would derive cut points from a quantile sketch
    * instead). min/max ride as literals: one metadata-sized agg. */
  def bucketOf(c: String, mn: Long, mx: Long, buckets: Int): Column =
    // SQL `div` — INTEGER division (Column./ is floating and would
    // drift at bignum boundaries)
    expr(s"(($c - ${mn}L) * ${buckets}L) div ${mx - mn + 1}L")

  /** The DuckDB formulation of the normalized z-value — the same
    * bucket + 31-step interleave, for oracle parity. `a`/`b` are SQL
    * fragments already in bucket space. */
  def duckZvalue(a: String, b: String): String =
    s"list_sum([((($a >> i) & 1) << (2*i)) + ((($b >> i) & 1) << (2*i+1)) " +
      s"for i in generate_series(0, 30)])"

  /** `bucketOf` as a DuckDB fragment (integer division). */
  def duckBucket(c: String, mn: String, mx: String, buckets: Int): String =
    s"(($c - $mn) * $buckets // ($mx - $mn + 1))"

  /** Write `df` Z-ordered on (`ca`, `cb`) into `nFiles` parquet files:
    * one range shuffle on z, one in-partition sort, original schema
    * (the z column does not land in the layout — it is an ordering
    * device, recomputable from the keys). */
  def zorderWrite(df: DataFrame, ca: String, cb: String, path: String,
      nFiles: Int, buckets: Int = 256): Unit = {
    val cols = df.columns.map(col)
    val Seq(aMn, aMx, bMn, bMx) = df
      .agg(min(ca), max(ca), min(cb), max(cb)).collect()
      .headOption.map(r => Seq(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).getOrElse(Seq(0L, 0L, 0L, 0L))
    df.withColumn("_z", zvalue(
        bucketOf(ca, aMn, aMx, buckets),
        bucketOf(cb, bMn, bMx, buckets)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .select(cols.toIndexedSeq: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-row-group footer min/max of integer columns, as a relation:
    * `(file, rg, rows, col, min_v, max_v)`. Footer-only — zero data
    * pages — distributed with the session's Hadoop conf broadcast to
    * the tasks (the `footerInventory` discipline: a bare
    * `Configuration()` would drop object-store credentials exactly
    * where this matters). This is the reader's own pruning input
    * surfaced as data: a layout's quality IS the size of these
    * rectangles. */
  def rowGroupStats(s: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    val confEntries = {
      val hc = s.sessionState.newHadoopConf()
      hc.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    val hcB = s.sparkContext.broadcast(confEntries)
    val slices = math.max(1,
      math.min(files.size, s.sparkContext.defaultParallelism))
    val want = cols.toSet
    s.sparkContext.parallelize(files, slices).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      hcB.value.foreach { case (k, v) => conf.set(k, v) }
      it.flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(f), conf))
        try {
          reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
            case (b, i) =>
              b.getColumns.asScala
                .filter(c => want(c.getPath.toDotString))
                .flatMap { c =>
                  val st = c.getStatistics
                  if (st == null || !st.hasNonNullValue) None
                  else Some((f.substring(f.lastIndexOf('/') + 1), i,
                    b.getRowCount, c.getPath.toDotString,
                    st.genericGetMin.toString.toLong,
                    st.genericGetMax.toString.toLong))
                }
          }
        } finally reader.close()
      }
    }.toDF("file", "rg", "rows", "col", "min_v", "max_v")
  }

  /** q105: the normalized Z-curve itself, verified bit-for-bit — the
    * first 100 lineitem rows along the (l_partkey, l_suppkey) curve.
    * Dimension min/max ride as literals (one metadata-sized agg, the
    * Lloyd-model pattern); the engine plans a TakeOrderedAndProject
    * (top-k, never a full sort). */
  def zorderKeys(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val Seq(pMn, pMx, sMn, sMx) = li
      .agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
      .withColumn("z", zvalue(
        bucketOf("l_partkey", pMn, pMx, 256),
        bucketOf("l_suppkey", sMn, sMx, 256)))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Zone-map pruning as an EXECUTABLE read path (not just the
    * [[rowGroupStats]] report): the per-file min/max rectangles of
    * `probeCol` decide which files a range predicate needs, and only
    * those paths reach `spark.read`. The rectangle collect is
    * #files-sized metadata (the `Tables.discover` class — zero data
    * pages, footer stats only); the payoff is the governing scan-cost
    * equation at 100 TB: a range query over a [[clusteredWrite]] /
    * [[zorderWrite]] layout opens O(selectivity · files), not O(files)
    * — LayoutSpec measures the skipped-file count on a 4-file range
    * layout, and correctness (≡ the full filtered scan) is q126's
    * oracle. Files without footer stats never appear in the rectangle
    * relation, so they are conservatively... NOT read — which is why
    * [[pruneFiles]] keeps a file unless its rectangle PROVES
    * disjointness: absence of stats keeps the file. `probeCol` must be
    * a physical int64 column (footer min/max parse as longs — the
    * [[rowGroupStats]] constraint). */
  def pruneFiles(s: SparkSession, path: String, probeCol: String,
      lo: Long, hi: Long): (Seq[String], Int) = {
    import s.implicits._
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    val rects = rowGroupStats(s, path, Seq(probeCol))
      .groupBy(col("file"))
      .agg(min(col("min_v")).as("mn"), max(col("max_v")).as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val kept = all.filter { f =>
      rects.get(f.substring(f.lastIndexOf('/') + 1)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi // overlap
        case None => true // no stats — cannot prove disjoint, must read
      }
    }
    (kept.sorted, all.size)
  }

  /** The pruned scan itself; the residual filter still applies (file
    * granularity over-approximates the predicate). */
  def prunedScan(s: SparkSession, path: String, probeCol: String,
      lo: Long, hi: Long): DataFrame = {
    val (kept, _) = pruneFiles(s, path, probeCol, lo, hi)
    if (kept.isEmpty)
      s.read.parquet(path).filter(lit(false))
    else
      s.read.parquet(kept: _*)
        .filter(col(probeCol).between(lo, hi))
  }

  /** q126: a range rollup served through [[prunedScan]] — must equal
    * the plain filtered aggregate (the oracle), whatever the file
    * layout. */
  def prunedRangeRollup(s: SparkSession, dir: String): DataFrame =
    prunedScan(s, s"$dir/lineitem.parquet", "l_orderkey", 1000L, 2000L)
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_zorder_keys" -> zorderKeys,
    "q126_pruned_range_rollup" -> prunedRangeRollup,
  )

  def oracles: Map[String, String] = {
    // min/max ride via a one-row CTE cross join — DuckDB forbids
    // subqueries inside the interleave lambda
    val pb = duckBucket("l_partkey", "pmn", "pmx", 256)
    val sb = duckBucket("l_suppkey", "smn", "smx", 256)
    Map(
      // the plain filtered scan the pruned serve path must equal
      "q126_pruned_range_rollup" ->
        """SELECT count(*) AS n,
          |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
          |FROM lineitem
          |WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin,
      "q105_zorder_keys" ->
        s"""WITH mm AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
           |  min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem)
           |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |  CAST(${duckZvalue(pb, sb)} AS BIGINT) AS z
           |FROM lineitem, mm
           |ORDER BY z, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    )
  }
}
