package graft.observe

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the quality plane of the reference's
  * DLT pipelines (reference `dlt_assets.py` materializes DLT assets;
  * DLT's `expect` / `expect_or_drop` decorators are that surface's
  * constraint system), re-expressed as engine operators:
  *
  *  - [[check]]: violation counts for EVERY rule in ONE aggregation
  *    pass — per-rule `sum(when(!cond, 1))` partials ride a single
  *    scan, so auditing 20 constraints on a 100 TB table costs one
  *    read, not twenty.
  *  - [[enforce]]: the `expect_or_drop` analog — split into (kept,
  *    quarantined) by the conjunction of all rules; both sides are
  *    lazy plans off one scan (the q50 quarantine discipline).
  *
  * NULL discipline: a NULL predicate is a VIOLATION (`coalesce(cond,
  * false)`) — constraints are claims about every row, and "unknown"
  * fails the claim; plain SQL `FILTER (WHERE NOT cond)` would silently
  * pass NULLs, the classic audit hole.
  */
object Expectations {

  /** Per-rule violation report: rule · n_rows · n_viol · viol_ppm
    * (integer parts-per-million, so cross-engine float division can
    * only differ below the floor). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    val aggs = count(lit(1)).as("n") +:
      rules.zipWithIndex.map { case ((_, c), i) =>
        sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(s"v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', n, v$i" }
      .mkString(", ")
    one.selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_rows, n_viol)")
      .withColumn("viol_ppm",
        expr("CAST(floor(n_viol * 1000000.0 / n_rows) AS BIGINT)"))
      .orderBy(col("rule"))
  }

  /** Attach the rule violations as OBSERVED metrics (one counter per
    * rule, plus the row count) — ZERO extra pass, batch or streaming:
    * the audit rides whatever job runs anyway (the A2 `Observation`
    * discipline lifted to constraints). On a stream the counters
    * surface per micro-batch via
    * `StreamingQueryProgress.observedMetrics(name)` — the DLT
    * expectations dashboard, without a second query. */
  def observed(df: DataFrame, name: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (rn, c) =>
        sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(rn)
      }
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** expect_or_drop: rows passing EVERY rule vs the quarantine. Both
    * are plans over the same scan; callers write each side once. */
  def enforce(df: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val pass = rules.map { case (_, c) => coalesce(c, lit(false)) }
      .reduce(_ && _)
    (df.filter(pass), df.filter(!pass))
  }

  /** q119's rule set over `orders` — two clean rules and two with real
    * fixture violations, so the report proves both directions. */
  private def orderRules: Seq[(String, Column)] = Seq(
    ("r1_positive_price", col("o_totalprice") > 0),
    ("r2_open_or_done", col("o_orderstatus").isin("O", "F")),
    ("r3_modest_price", col("o_totalprice") < 200000),
    ("r4_has_priority", col("o_orderpriority").isNotNull))

  def orderExpectations(s: SparkSession, dir: String): DataFrame =
    check(graft.Tables.load(s, dir, "orders"), orderRules)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_expectations" -> orderExpectations,
  )

  val oracles: Map[String, String] = Map(
    // NULL-as-violation spelled out per rule; one scan in both engines
    "q119_expectations" ->
      """WITH t AS (SELECT count(*) AS n,
        |  count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)) AS v0,
        |  count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F'), FALSE)) AS v1,
        |  count(*) FILTER (WHERE NOT coalesce(o_totalprice < 200000, FALSE)) AS v2,
        |  count(*) FILTER (WHERE o_orderpriority IS NULL) AS v3
        |  FROM orders)
        |SELECT rule, n AS n_rows, v AS n_viol,
        |  CAST(floor(v * 1000000.0 / n) AS BIGINT) AS viol_ppm
        |FROM (
        |  SELECT 'r1_positive_price' AS rule, n, v0 AS v FROM t
        |  UNION ALL SELECT 'r2_open_or_done', n, v1 FROM t
        |  UNION ALL SELECT 'r3_modest_price', n, v2 FROM t
        |  UNION ALL SELECT 'r4_has_priority', n, v3 FROM t)
        |ORDER BY rule""".stripMargin,
  )
}
