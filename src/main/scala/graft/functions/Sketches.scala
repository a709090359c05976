package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_heavy_hitters" -> heavyHitters,
  )

  val oracles: Map[String, String] = Map(
    // exact SQL: valid because CAP ≥ fixture vocabulary (no evictions)
    "q75_heavy_hitters" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
  )
}
