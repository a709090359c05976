package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters sketch as a typed `Aggregator` — the
  * mergeable-summary flavor of vocabulary building (SURVEY §2.11,
  * north-star X4/X6).
  *
  * The exact token-frequency pipeline (`Llm.tokenFreq`, q53) shuffles
  * one partial count per distinct (token, salt) pair; on a 100 TB
  * web-scale corpus the distinct-token set itself (hundreds of millions
  * of misspellings/URLs/ids) is the cost. SpaceSaving bounds the
  * summary at CAP counters per partition with the classic
  * evict-min-and-inherit rule (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005 — public
  * algorithm): counts are overestimates by at most ε = n/CAP, and any
  * token with true frequency > n/CAP is guaranteed present. Buffers
  * merge associatively (sum common counters, keep top CAP), so Spark
  * runs it as ordinary partial aggregation — one ≤CAP-entry map per
  * partition through the shuffle, independent of vocabulary size.
  *
  * With CAP ≥ distinct vocabulary (true for the fixture corpus) no
  * counter is ever evicted and the sketch IS exact — which is what
  * makes q75 oracle-checkable against the exact q53 SQL while the
  * operator stays honestly approximate at scale.
  */
object Sketches {

  private val CAP = 1024
  private val TOPN = 100

  /** (token → count) bounded at CAP entries. */
  type SSBuf = Map[String, Long]

  def spaceSavingAgg(cap: Int, topn: Int): Aggregator[String, SSBuf, Seq[(String, Long)]] =
    new Aggregator[String, SSBuf, Seq[(String, Long)]] {
      override def zero: SSBuf = Map.empty

      override def reduce(b: SSBuf, token: String): SSBuf =
        b.get(token) match {
          case Some(n) => b.updated(token, n + 1)
          case None if b.size < cap => b.updated(token, 1L)
          case None =>
            // evict the min counter; the newcomer inherits its count
            // (the overestimate that yields the ε = n/cap guarantee)
            val (minTok, minN) = b.minBy { case (t, n) => (n, t) }
            (b - minTok).updated(token, minN + 1)
        }

      override def merge(b1: SSBuf, b2: SSBuf): SSBuf = {
        val summed = b2.foldLeft(b1) { case (acc, (t, n)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + n)
        }
        if (summed.size <= cap) summed
        else summed.toSeq
          .sortBy { case (t, n) => (-n, t) }
          .take(cap).toMap
      }

      override def finish(b: SSBuf): Seq[(String, Long)] =
        b.toSeq.sortBy { case (t, n) => (-n, t) }.take(topn)

      override def bufferEncoder = ExpressionEncoder[SSBuf]()
      override def outputEncoder = ExpressionEncoder[Seq[(String, Long)]]()
    }

  val spaceSaving: Aggregator[String, SSBuf, Seq[(String, Long)]] =
    spaceSavingAgg(CAP, TOPN)

  /** Top-100 tokens by (sketched) frequency — output shape and, at
    * fixture vocabulary sizes, values identical to exact q53. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ss = udaf(spaceSaving, ExpressionEncoder[String]())
    graft.Tables.loadSpread(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(ss(col("token")).as("top"))
      .select(explode(col("top")).as("it"))
      .select(col("it._1").as("token"), col("it._2").as("n"))
      .orderBy(col("n").desc, col("token"))
  }

  // ---------------------------------------------------------------
  // Count-Min sketch (q117) — the point-query counterpart of
  // SpaceSaving's top-k: estimate ANY token's frequency from a
  // fixed-size counter grid (Cormode & Muthukrishnan, "An improved
  // data stream summary: the count-min sketch and its applications",
  // J. Algorithms 2005 — public algorithm).
  // ---------------------------------------------------------------

  /** CMS geometry: depth (independent hash rows) × width (counters per
    * row). 4×512 = 2 048 counters TOTAL regardless of corpus size —
    * the entire sketch is one partial-agg-friendly aggregation whose
    * shuffle carries at most depth·width rows per map partition, and
    * two sketches merge by cell-wise sum (how the counters groupBy
    * already combines partials). Estimates overshoot by at most
    * ε·n = (e/width)·n with probability 1 − exp(−depth); they NEVER
    * undershoot, which q117 asserts structurally (`overcount ≥ 0` for
    * every probed token, by construction of the min over rows). */
  private[graft] val cmsDepth = 4
  private[graft] val cmsWidth = 512L
  private val cmsMod = 1000003L // prime > width keeps the row mixes apart

  /** Cross-engine token hash: base-31 polynomial over the code points
    * of the first 7 characters. 31⁶·0xFFFF ≈ 5.8e13 and the 7-term sum
    * stays < 2^49, so the double-space `pow` products are integer-exact
    * in BOTH engines (the same discipline as the 1e6-unit vector
    * lanes); the result casts to bigint and all downstream cell math is
    * pure integer. Collisions only ever INFLATE a CMS cell — they can
    * weaken the estimate, never break the ≥-exact guarantee. */
  private def cmsPolyHash(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), least(length(tok), lit(7))),
        i => ascii(tok.substr(i, lit(1))).cast("double") *
          pow(lit(31.0), (i - lit(1)).cast("double"))),
      lit(0.0), (acc, x) => acc + x).cast("bigint")

  /** Row-r cell of hash p: an affine remix per row, then the width
    * fold — non-negative operands throughout, so `%` agrees with
    * DuckDB's. */
  private def cmsCell(p: Column, r: Column): Column =
    (p * (r + lit(1L)) + r * lit(99991L)) % lit(cmsMod) % lit(cmsWidth)

  /** q117: build the 4×512 Count-Min grid over the document token
    * stream in ONE aggregation, then probe it for the 20 most frequent
    * tokens and report estimate vs exact. The exact leg (a full
    * distinct-token count) exists only as the verification harness —
    * at 100 TB a consumer runs the counters leg alone, whose state is
    * 2 048 rows no matter how many tokens flow through it. The probe
    * join broadcasts the grid (it is sketch-sized by definition). */
  def cmsTokenCounts(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.Tables.loadSpread(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("p", cmsPolyHash(col("token")))
    val rowIds = explode(sequence(lit(0L), lit(cmsDepth - 1L))).as("r")
    val counters = toks
      .select(col("p"), rowIds)
      .withColumn("c", cmsCell(col("p"), col("r")))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val exact = toks
      .groupBy(col("token"), col("p"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
    exact
      .select(col("token"), col("n"), col("p"), rowIds)
      .withColumn("c", cmsCell(col("p"), col("r")))
      .join(broadcast(counters), Seq("r", "c"))
      .groupBy(col("token"), col("n"))
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("n"))
      .orderBy(col("n").desc, col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_heavy_hitters" -> heavyHitters,
    "q117_cms_token_counts" -> cmsTokenCounts,
  )

  val oracles: Map[String, String] = Map(
    // exact SQL: valid because CAP ≥ fixture vocabulary (no evictions)
    "q75_heavy_hitters" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // independent relational formulation of the identical grid: same
    // polynomial hash (integer-exact double pow products), same affine
    // row remix, pure integer cell math
    "q117_cms_token_counts" ->
      """WITH tok AS (
        |  SELECT token,
        |    CAST(coalesce(list_sum(list_transform(
        |      range(0, least(length(token), 7)),
        |      i -> CAST(ascii(substring(token, CAST(i + 1 AS INTEGER), 1)) AS DOUBLE)
        |           * power(31, i))), 0) AS BIGINT) AS p
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0),
        |counters AS (
        |  SELECT r, (p * (r + 1) + r * 99991) % 1000003 % 512 AS c,
        |    count(*) AS cnt
        |  FROM tok, range(0, 4) rr(r) GROUP BY 1, 2),
        |exact AS (
        |  SELECT token, any_value(p) AS p, count(*) AS n FROM tok
        |  GROUP BY token ORDER BY n DESC, token LIMIT 20),
        |probes AS (
        |  SELECT token, n, r, (p * (r + 1) + r * 99991) % 1000003 % 512 AS c
        |  FROM exact, range(0, 4) rr(r))
        |SELECT token, n, CAST(min(cnt) AS BIGINT) AS cms_est,
        |  CAST(min(cnt) - n AS BIGINT) AS overcount
        |FROM probes JOIN counters USING (r, c)
        |GROUP BY token, n ORDER BY n DESC, token""".stripMargin,
  )
}
