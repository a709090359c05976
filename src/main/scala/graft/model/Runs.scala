package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The jobs / pipelines / runs data plane — SURVEY.md §1.1, §2.1
  * S8/S9/S11/S12 (reference `job_discovery.py`, `pipeline_discovery.py`).
  *
  * The reference pages these out of REST endpoints (`/jobs/list`,
  * `/pipelines`, `/jobs/runs/list?limit=1`, `/jobs/runs/get-output`); the
  * engine models them as relations. `jobs`/`pipelines` are generated
  * entity tables (S8/S9 list shapes, with the reference's
  * `settings.name or f"job_{id}"` coalesce default, P9/F7); `runs` is
  * derived deterministically from the `events` feed — each event becomes
  * a run attempt of entity `user_id % 20` with the reference's lifecycle
  * vocabulary (`job_discovery.py:42-48`): life-cycle states
  * TERMINATED/SKIPPED/INTERNAL_ERROR/RUNNING/PENDING and result states
  * SUCCESS/FAILED for terminal runs.
  */
object Runs {

  val terminalStates: Seq[String] = Seq("TERMINATED", "SKIPPED", "INTERNAL_ERROR")

  /** S8: the jobs list — entity table with P9 coalesce-default names. */
  def jobs(s: SparkSession, dir: String): DataFrame =
    s.range(0, 20)
      .select(
        col("id").as("job_id"),
        // every 5th job has no settings.name → default name (P9)
        coalesce(
          when(col("id") % 5 =!= 0, concat(lit("job_name_"), col("id"))),
          concat(lit("job_"), col("id"))).as("name"),
        (col("id") % 3 === 0).as("is_pipeline"))

  /** S9: the pipelines list — the is_pipeline slice of the entity
    * table, with the reference's sanitize_name (F1,
    * `pipeline_discovery.py:6-7`), derived asset key (F4) and monitor
    * URL (F3, `dlt_sensor.py:28`). */
  def pipelines(s: SparkSession, dir: String): DataFrame =
    jobs(s, dir)
      .filter(col("is_pipeline"))
      .select(
        col("job_id").as("pipeline_id"),
        regexp_replace(col("name"), "[^a-zA-Z0-9_]+", "_").as("safe_name"),
        concat_ws(".", lit("dlt_pipeline"),
          regexp_replace(col("name"), "[^a-zA-Z0-9_]+", "_")).as("asset_key"),
        format_string("https://host/pipelines/%s/updates", col("job_id"))
          .as("url"))
      .orderBy(col("pipeline_id"))

  /** S8 in its true wire form: the jobs list parsed from raw JSON
    * payload strings (the reference consumes `/jobs/list` JSON bodies)
    * with `from_json` against an explicit schema — never schema
    * inference, which at 100 TB is an extra full scan of the payloads.
    * Every 7th payload is corrupt; `from_json` yields a null struct for
    * it (PERMISSIVE), which is surfaced as `ok = false` with null
    * fields rather than failing the batch — the reference's
    * per-element error tolerance (T5, `table_discovery.py` try/except)
    * as a row-level contract. Name defaulting is the P9 coalesce. */
  def jobsFromJson(s: SparkSession, dir: String): DataFrame = {
    val payloads = s.range(0, 21)
      .select(
        col("id").as("payload_id"),
        when(col("id") % 7 === 6, lit("{not json"))
          .otherwise(format_string(
            """{"job_id":%d,"settings":{"name":"j%d"}}""",
            col("id"), col("id"))).as("payload"))
    payloads
      .withColumn("p",
        from_json(col("payload"), org.apache.spark.sql.types.StructType
          .fromDDL("job_id BIGINT, settings STRUCT<name: STRING>")))
      .select(
        col("payload_id"),
        col("p.job_id").as("job_id"),
        when(col("p.job_id").isNotNull,
          coalesce(col("p.settings.name"),
            concat(lit("job_"), col("p.job_id")))).as("name"),
        col("p.job_id").isNotNull.as("ok"))
      .orderBy(col("payload_id"))
  }

  /** Runs derived from the events feed: state machine vocabulary of the
    * reference mapped from event_type; run_id = event_id (unique),
    * entity_id = user_id % 20. */
  def runs(s: SparkSession, dir: String): DataFrame =
    runsProjection(Tables.load(s, dir, "events"))

  private def runsProjection(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("run_id"),
      (col("user_id") % 20).as("entity_id"),
      col("ts"),
      when(col("event_type") === "purchase", "TERMINATED")
        .when(col("event_type") === "error", "INTERNAL_ERROR")
        .when(col("event_type") === "signup", "SKIPPED")
        .when(col("event_type") === "view", "RUNNING")
        .otherwise("PENDING").as("state"),
      when(col("event_type") === "purchase", "SUCCESS")
        .when(col("event_type") === "error", "FAILED")
        .otherwise(lit(null).cast("string")).as("result_state"))

  /** [[runs]] restricted to terminal states, with the restriction ALSO
    * phrased on the SOURCE column — `event_type IN (purchase, error,
    * signup)`, the inverse image of the CASE state mapping — so the
    * predicate pushes into the parquet reader and prunes row groups.
    * A filter on the mapped `state` column alone wraps the source
    * column in a CASE parquet cannot evaluate, and every row group
    * decodes first (the self-lint `filter-not-pushed` class). The F8
    * state-set membership still applies over the mapped column, where
    * it is the identity on the pre-filtered rows. */
  private def terminalRuns(s: SparkSession, dir: String): DataFrame =
    runsProjection(Tables.load(s, dir, "events")
      .filter(col("event_type").isin("purchase", "error", "signup")))
      .filter(col("state").isin(terminalStates: _*))

  /** S11/A4: latest run per entity via max_by aggregation — partial
    * aggregation is map-side (each partition keeps one candidate per
    * entity before the shuffle), unlike a window sort which shuffles
    * every row. The 100 TB-preferred plan for top-1-per-key. */
  def latestRunPerEntity(s: SparkSession, dir: String): DataFrame =
    runs(s, dir)
      .groupBy(col("entity_id"))
      .agg(max_by(
        struct(col("run_id"), col("state"), col("result_state"), col("ts")),
        struct(col("ts"), col("run_id"))).as("r"))
      .select(col("entity_id"), col("r.run_id").as("run_id"),
        col("r.state").as("state"), col("r.result_state").as("result_state"),
        col("r.ts").as("ts"))
      .orderBy(col("entity_id"))

  /** F8: terminal-state set membership + per-entity outcome counts. */
  def terminalRunStats(s: SparkSession, dir: String): DataFrame =
    terminalRuns(s, dir)
      .groupBy(col("entity_id"))
      .agg(
        count(lit(1)).as("n_terminal"),
        count(when(col("result_state") === "SUCCESS", 1)).as("n_success"),
        count(when(col("result_state") === "FAILED", 1)).as("n_failed"))
      .orderBy(col("entity_id"))

  /** S12: run-output lookup — join the latest terminal run per entity to
    * its output payload (to_json struct, F6) on run_id, the engine form
    * of `/jobs/runs/get-output`. Both sides derive from runs.
    *
    * 100 TB note: the broadcast hint MUST sit on `latestTerminal` — it is
    * ≤|entities| rows (one per entity after the max_by), while `outputs`
    * is O(terminal runs), i.e. a constant fraction of the full events
    * feed. Broadcasting the outputs side would collect the runs relation
    * to the driver at scale. */
  def runOutputLookup(s: SparkSession, dir: String): DataFrame = {
    val latestTerminal = terminalRuns(s, dir)
      .groupBy(col("entity_id"))
      .agg(max_by(struct(col("run_id"), col("result_state"), col("ts")),
        struct(col("ts"), col("run_id"))).as("r"))
      .select(col("entity_id"), col("r.run_id").as("run_id"),
        col("r.result_state").as("result_state"))
    val outputs = terminalRuns(s, dir)
      .select(col("run_id"),
        to_json(struct(col("run_id"), col("state"),
          coalesce(col("result_state"), lit("")).as("result_state")))
          .as("output_json"))
    broadcast(latestTerminal)
      .join(outputs, "run_id")
      .select(col("entity_id"), col("run_id"), col("result_state"),
        col("output_json"))
      .orderBy(col("entity_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_jobs_list" -> jobs,
    "q80_jobs_from_json" -> jobsFromJson,
    "q54_pipelines_list" -> pipelines,
    "q44_latest_run_per_entity" -> latestRunPerEntity,
    "q45_terminal_run_stats" -> terminalRunStats,
    "q46_run_output_lookup" -> runOutputLookup,
  )

  private val runsSql =
    """runs AS (
      |  SELECT event_id AS run_id, user_id % 20 AS entity_id, ts,
      |    CASE event_type WHEN 'purchase' THEN 'TERMINATED'
      |      WHEN 'error' THEN 'INTERNAL_ERROR' WHEN 'signup' THEN 'SKIPPED'
      |      WHEN 'view' THEN 'RUNNING' ELSE 'PENDING' END AS state,
      |    CASE event_type WHEN 'purchase' THEN 'SUCCESS'
      |      WHEN 'error' THEN 'FAILED' ELSE NULL END AS result_state
      |  FROM events)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q43_jobs_list" ->
      """SELECT id AS job_id,
        |  coalesce(CASE WHEN id % 5 <> 0 THEN 'job_name_' || id END,
        |           'job_' || id) AS name,
        |  id % 3 = 0 AS is_pipeline
        |FROM range(20) t(id) ORDER BY job_id""".stripMargin,
    "q80_jobs_from_json" ->
      """WITH p AS (SELECT id AS payload_id,
        |  CASE WHEN id % 7 = 6 THEN '{not json'
        |    ELSE '{"job_id":' || id || ',"settings":{"name":"j' || id || '"}}'
        |  END AS payload FROM range(21) t(id))
        |SELECT payload_id,
        |  CASE WHEN json_valid(payload)
        |    THEN CAST(payload->>'$.job_id' AS BIGINT) END AS job_id,
        |  CASE WHEN json_valid(payload)
        |    THEN coalesce(payload->>'$.settings.name',
        |      'job_' || (payload->>'$.job_id')) END AS name,
        |  json_valid(payload) AS ok
        |FROM p ORDER BY payload_id""".stripMargin,
    "q54_pipelines_list" ->
      """SELECT id AS pipeline_id,
        |  regexp_replace(coalesce(CASE WHEN id % 5 <> 0 THEN 'job_name_' || id END,
        |    'job_' || id), '[^a-zA-Z0-9_]+', '_', 'g') AS safe_name,
        |  'dlt_pipeline.' || regexp_replace(coalesce(
        |    CASE WHEN id % 5 <> 0 THEN 'job_name_' || id END, 'job_' || id),
        |    '[^a-zA-Z0-9_]+', '_', 'g') AS asset_key,
        |  'https://host/pipelines/' || id || '/updates' AS url
        |FROM range(20) t(id) WHERE id % 3 = 0 ORDER BY pipeline_id""".stripMargin,
    "q44_latest_run_per_entity" ->
      s"""WITH $runsSql
         |SELECT entity_id, run_id, state, result_state, ts FROM (
         |  SELECT *, row_number() OVER (PARTITION BY entity_id
         |    ORDER BY ts DESC, run_id DESC) AS rn FROM runs)
         |WHERE rn = 1 ORDER BY entity_id""".stripMargin,
    "q45_terminal_run_stats" ->
      s"""WITH $runsSql
         |SELECT entity_id, count(*) AS n_terminal,
         |  count(*) FILTER (result_state = 'SUCCESS') AS n_success,
         |  count(*) FILTER (result_state = 'FAILED') AS n_failed
         |FROM runs
         |WHERE state IN ('TERMINATED', 'SKIPPED', 'INTERNAL_ERROR')
         |GROUP BY entity_id ORDER BY entity_id""".stripMargin,
    "q46_run_output_lookup" ->
      s"""WITH $runsSql,
         |term AS (SELECT * FROM runs
         |  WHERE state IN ('TERMINATED', 'SKIPPED', 'INTERNAL_ERROR')),
         |latest AS (SELECT entity_id, run_id, result_state FROM (
         |  SELECT *, row_number() OVER (PARTITION BY entity_id
         |    ORDER BY ts DESC, run_id DESC) AS rn FROM term) WHERE rn = 1),
         |outputs AS (SELECT run_id,
         |  '{"run_id":' || run_id || ',"state":"' || state ||
         |  '","result_state":"' || coalesce(result_state, '') || '"}' AS output_json
         |  FROM term)
         |SELECT entity_id, latest.run_id AS run_id, result_state, output_json
         |FROM latest JOIN outputs ON latest.run_id = outputs.run_id
         |ORDER BY entity_id""".stripMargin,
  )
}
