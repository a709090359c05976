package graft.observe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The hourly materialization plane — SURVEY.md §3.2 (reference
  * `dlt_assets.py:136-188`): per-table row counts (A1), last-modified
  * freshness (S6/A3), schema snapshot size (S5), `kinds` set (A6),
  * markdown explore link (F3), assembled into one `materializations`
  * relation and appendable to an events table (K2/K3).
  *
  * The reference does this as N+1 warehouse queries per hour (one COUNT,
  * one DESCRIBE DETAIL, one columns query *per table*); here the whole
  * plane is one Spark job: per-table aggregates are parallel count-only /
  * max-only scans (parquet footer + column-pruned ts scan — no full-row
  * materialization), unioned and joined to driver-side schema metadata.
  * At 100 TB each per-table agg is a distributed scan of just the
  * timestamp column with partial aggregation; the union is metadata-thin
  * (one row per table).
  */
object Materialize {

  /** Timestamp column per table for freshness (max event-time); tables
    * without an event-time column report NULL last_modified, like the
    * reference's `lastModified or createdAt or None` (P9). */
  private val tsColumn: Map[String, String] = Map(
    "orders" -> "o_orderdate",
    "lineitem" -> "l_shipdate",
    "events" -> "ts")

  /** The unified materializations relation over every discovered table. */
  def materializations(s: SparkSession, dir: String): DataFrame = {
    val perTable = Tables.discover(dir).map { name =>
      val t = Tables.load(s, dir, name)
      val fresh = tsColumn.get(name) match {
        case Some(c) => max(col(c)).as("last_modified")
        case None => max(lit(null).cast("timestamp")).as("last_modified")
      }
      val nCols = t.schema.fields.length.toLong
      t.agg(count(lit(1)).as("row_count"), fresh)
        .select(
          lit(name).as("table_name"),
          col("row_count"),
          col("last_modified"),
          lit(nCols).as("n_columns"))
    }.reduce(_.unionByName(_))
    perTable
      .withColumn("kinds",
        concat_ws(",", array_distinct(array(
          lit("table"), lit("parquet"), lit("graft")))))
      .withColumn("md_link",
        format_string("[main.%s](graft://main/%s)",
          col("table_name"), col("table_name")))
      .orderBy(col("table_name"))
  }

  /** K2/K3 sink: append materialization events (observation timestamp
    * stamped at write time, like `AssetMaterialization`'s event time).
    * Side-effecting — exercised by ScalaTest, not the oracle harness. */
  def appendEvents(df: DataFrame, outPath: String): Unit =
    df.withColumn("observed_at", current_timestamp())
      .withColumn("event_kind", lit("materialization"))
      .write.mode("append").parquet(outPath)

  /** Mergeable-sketch profile (X6 scale flavor): percentile_approx +
    * HLL approx_count_distinct in ONE pass with NO Expand — compare
    * `Relational.profileLineitem` (exact countDistinct×4 ⇒ Catalyst
    * Expand ≈5× input rows through the shuffle). Sketches merge
    * associatively, so partial aggregation stays map-side at 100 TB.
    * The oracle checks the percentile fields (deterministic cross-engine
    * on these heavily-duplicated columns); the HLL estimates are
    * engine-specific and gated by a ScalaTest tolerance check instead. */
  def profileSketch(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_discount", "l_tax")
    // accuracy 1e5 ⇒ rank error ≤ 6 rows at sf0.1; the tightest
    // duplicate-value boundary in the fixture sits 27 rows from a
    // percentile target (measured), so the sketch equals the exact
    // discrete quantile with 4.5× margin. (At 10k accuracy the ±60-row
    // slack crossed that boundary and flipped p50.) At 100 TB you dial
    // accuracy down and accept ±n/accuracy.
    // ONE sketch per column (array-of-percentiles form), not one per
    // requested percentile — 3× less sketch building and merging.
    val aggs = cols.flatMap { c =>
      Seq(
        percentile_approx(col(c),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(100000)).as(s"pq_$c"),
        round(min(col(c)), 4).as(s"min_$c"),
        round(max(col(c)), 4).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val stackExpr = cols
      .map(c => s"'$c', pq_$c[0], pq_$c[1], pq_$c[2], min_$c, max_$c")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    Tables.load(s, dir, "lineitem")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"),
        expr(s"$stackExpr as (col_name, p25, p50, p75, min_v, max_v)"))
      .select(col("col_name"), col("n_rows"), col("p25"), col("p50"),
        col("p75"), col("min_v"), col("max_v"))
      .orderBy(col("col_name"))
  }

  /** Grouped sketch profile (X6 per-key flavor): per-language document-
    * length quantiles — one `percentile_approx` sketch per group, built
    * map-side and merged, so a 100 TB corpus profiles every language in
    * a single pass with `groups × sketch` shuffle bytes. Accuracy 1e5
    * makes the sketch exact below 100 k rows per group (fixture groups
    * are ≤ ~21 k at sf0.1); at real scale you dial accuracy down and
    * accept rank error n/accuracy, as q42 documents. */
  def langLengthProfile(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("n_chars"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(100000)).as("pq"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(col("lang"), col("n_docs"),
        col("pq")(0).as("p25"), col("pq")(1).as("p50"), col("pq")(2).as("p75"),
        col("min_chars"), col("max_chars"))
      .orderBy(col("lang"))

  /** Full HLL profile (engine-specific estimates; ScalaTest asserts
    * within-2% of exact — no cross-engine oracle is possible because
    * HLL++ implementations differ). rsd=0.01. */
  def profileHll(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice", "l_partkey")
    val aggs = cols.map(c => approx_count_distinct(col(c), 0.01).as(s"ad_$c")) :+
      count(lit(1)).as("n_rows")
    Tables.load(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental materialization: diff the current snapshot against the
    * previous one and emit events ONLY for added/removed/changed tables
    * — at 100 TB the hourly loop re-observes thousands of tables but
    * only the drifted few produce events (full-outer join on the key,
    * both sides metadata-thin). */
  def snapshotDelta(prev: DataFrame, curr: DataFrame): DataFrame = {
    val p = prev.select(col("table_name"), col("row_count").as("prev_count"),
      col("last_modified").as("prev_modified"))
    val c = curr.select(col("table_name"), col("row_count"),
      col("last_modified"))
    c.join(p, Seq("table_name"), "full_outer")
      .withColumn("change",
        when(col("prev_count").isNull, "added")
          .when(col("row_count").isNull, "removed")
          .when(col("row_count") =!= col("prev_count") ||
            (col("last_modified").isNotNull &&
              col("last_modified") =!= col("prev_modified")), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(col("table_name"), col("change"),
        col("prev_count"), col("row_count"))
      .orderBy(col("table_name"))
  }

  /** q61 fixture: previous snapshot = current minus the events table,
    * with lineitem's count off by one — yields one "added" and one
    * "changed" row, deterministically. */
  def materializationDelta(s: SparkSession, dir: String): DataFrame = {
    // The snapshot is 1 row per table but costs #tables scan jobs to
    // build — pin the 10-row result instead of replaying every
    // per-table agg on both diff sides.
    val curr = materializations(s, dir).localCheckpoint()
    val prev = curr
      .filter(col("table_name") =!= "events")
      .withColumn("row_count",
        when(col("table_name") === "lineitem", col("row_count") - 1)
          .otherwise(col("row_count")))
    snapshotDelta(prev, curr)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_materializations" -> materializations,
    "q42_profile_sketch" -> profileSketch,
    "q61_materialization_delta" -> materializationDelta,
    "q65_lang_length_profile" -> langLengthProfile,
  )

  val oracles: Map[String, String] = Map(
    "q41_materializations" -> {
      val rows = Seq(
        ("customer", "CAST(NULL AS TIMESTAMP)"),
        ("documents", "CAST(NULL AS TIMESTAMP)"),
        ("embeddings", "CAST(NULL AS TIMESTAMP)"),
        ("events", "CAST(max(ts) AS TIMESTAMP)"),
        ("lineitem", "CAST(max(l_shipdate) AS TIMESTAMP)"),
        ("nation", "CAST(NULL AS TIMESTAMP)"),
        ("orders", "CAST(max(o_orderdate) AS TIMESTAMP)"),
        ("part", "CAST(NULL AS TIMESTAMP)"),
        ("region", "CAST(NULL AS TIMESTAMP)"),
        ("supplier", "CAST(NULL AS TIMESTAMP)"))
      val nColsSql = Map(
        "region" -> 2, "nation" -> 3, "customer" -> 5, "supplier" -> 4,
        "part" -> 6, "orders" -> 6, "lineitem" -> 11, "events" -> 6,
        "documents" -> 5, "embeddings" -> 3)
      rows.map { case (t, freshExpr) =>
        s"""SELECT '$t' AS table_name, count(*) AS row_count,
           |  $freshExpr AS last_modified,
           |  CAST(${nColsSql(t)} AS BIGINT) AS n_columns,
           |  'table,parquet,graft' AS kinds,
           |  '[main.$t](graft://main/$t)' AS md_link FROM $t""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },
    "q61_materialization_delta" ->
      """SELECT 'events' AS table_name, 'added' AS change,
        |  CAST(NULL AS BIGINT) AS prev_count,
        |  (SELECT count(*) FROM events) AS row_count
        |UNION ALL
        |SELECT 'lineitem', 'changed',
        |  (SELECT count(*) - 1 FROM lineitem),
        |  (SELECT count(*) FROM lineitem)
        |ORDER BY table_name""".stripMargin,
    "q65_lang_length_profile" ->
      """SELECT lang, count(*) AS n_docs,
        |  quantile_disc(n_chars, 0.25) AS p25,
        |  quantile_disc(n_chars, 0.5) AS p50,
        |  quantile_disc(n_chars, 0.75) AS p75,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q42_profile_sketch" -> {
      val cols = Seq("l_discount", "l_quantity", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  quantile_disc($c, 0.25) AS p25, quantile_disc($c, 0.5) AS p50,
           |  quantile_disc($c, 0.75) AS p75,
           |  round(min($c), 4) AS min_v, round(max($c), 4) AS max_v
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
  )
}
