package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The asset-node graph relation — SURVEY.md §1.1 (reference
  * `dlt_assets.py:122-129` AssetSpec nodes with `kinds` sets and
  * descriptions, `__init__.py:17` heterogeneous splice).
  *
  * Every table, job, and pipeline becomes one node row with a `kinds`
  * set (A6 `array_distinct` union — reference `kinds={table_kind,
  * datasource_kind, "databricks"}`), deduped first-seen by key (D1) and
  * spliced with `unionByName` (D3). Collect-set aggregation (A5) builds
  * the per-key kind sets from the heterogeneous union.
  */
object Nodes {

  /** All nodes: discovered tables ∪ jobs ∪ pipelines. `kinds` rendered
    * as a sorted comma-join for deterministic cross-engine compare.
    * The table side comes from the P2-filtered discovery plane
    * ([[Discovery.tablesMeta]]) — system/scratch namespaces never
    * become asset nodes, exactly where the reference applies its
    * excluded-catalogs/schemas skip-list (`dlt_assets.py:28-31`). */
  def nodes(s: SparkSession, dir: String): DataFrame = {
    val tables = Discovery.tablesMeta(s, dir)
      .select(
        concat_ws(".", col("table_schema"), col("table_name")).as("key"),
        lit("table").as("kind"),
        col("data_source_format").as("fmt"))
    val jobs = graft.model.Runs.jobs(s, dir)
      .select(
        concat(lit("job."), col("name")).as("key"),
        when(col("is_pipeline"), "pipeline").otherwise("job").as("kind"),
        lit("graft").as("fmt"))
    tables.unionByName(jobs)
      .select(col("key"),
        concat_ws(",", array_sort(array_distinct(
          array(col("kind"), col("fmt"), lit("graft"))))).as("kinds"),
        format_string("node %s of kind %s", col("key"), col("kind"))
          .as("description"))
      .dropDuplicates("key")
      .orderBy(col("key"))
  }

  /** A5 collect-to-set: distinct market segments per nation, as a
    * sorted set — the reference's `list(set(all_upstreams))` shape
    * (`dlt_assets.py:77`) over real data. */
  def segmentsPerNation(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("c_mktsegment"))))
          .as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_segments_per_nation" -> segmentsPerNation,
    "q52_nodes" -> nodes,
  )

  val oracles: Map[String, String] = Map(
    "q51_segments_per_nation" ->
      """SELECT n_name,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  count(DISTINCT c_mktsegment) AS n_segments
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q52_nodes" ->
      """WITH t AS (
        |  SELECT 'main.' || tn AS key, 'table' AS kind, 'parquet' AS fmt
        |  FROM (VALUES ('customer'),('documents'),('embeddings'),('events'),
        |    ('lineitem'),('nation'),('orders'),('part'),('region'),('supplier'))
        |    AS v(tn)
        |  UNION ALL
        |  SELECT 'job.' || coalesce(
        |      CASE WHEN id % 5 <> 0 THEN 'job_name_' || id END, 'job_' || id),
        |    CASE WHEN id % 3 = 0 THEN 'pipeline' ELSE 'job' END, 'graft'
        |  FROM range(20) r(id))
        |SELECT key,
        |  array_to_string(list_sort(list_distinct([kind, fmt, 'graft'])), ',')
        |    AS kinds,
        |  'node ' || key || ' of kind ' || kind AS description
        |FROM t ORDER BY key""".stripMargin,
  )
}
