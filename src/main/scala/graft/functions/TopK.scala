package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Bounded-heap top-k-per-key aggregation — SURVEY §2.11 (custom
  * aggregation via `Aggregator`/`udaf`).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy
  * (v.desc)) <= k`) sorts EVERY row of every key group after a full
  * shuffle. This Aggregator keeps only k candidates per key per
  * partition (map-side partial aggregation), shuffles k rows per key,
  * and merges heaps — the 100 TB plan for "top k orders per customer":
  * shuffle volume drops from O(rows) to O(keys · k).
  *
  * Buffer is a sorted ≤k list ordered by (value desc, id asc) — the
  * deterministic tie-break the oracle mirrors.
  */
object TopK {

  type Item = (Double, Long) // (value, id)

  private val K = 3

  private def better(a: Item, b: Item): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert into a sorted ≤k buffer: a full buffer rejects a
    * non-improving row with ONE comparison (the overwhelmingly common
    * case on a skewed key — a host with 10⁹ pages sees k splices, not
    * 10⁹), and a qualifying row SPLICES at its position in O(k) rather
    * than re-sorting — adversarial best-first arrival on a hot key
    * would otherwise pay O(k log k) per event. */
  private def spliceSorted[T](k: Int, before: (T, T) => Boolean)(
      buf: Seq[T], it: T): Seq[T] = {
    if (buf.size >= k && !before(it, buf.last)) buf
    else {
      val i = buf.indexWhere(b => before(it, b))
      val at = if (i < 0) buf.size else i
      val out = (buf.take(at) :+ it) ++ buf.drop(at)
      if (out.size > k) out.take(k) else out
    }
  }

  private def insert(k: Int)(buf: Seq[Item], it: Item): Seq[Item] =
    spliceSorted(k, better)(buf, it)

  /** Bounded top-k (value, id) heap per group, parameterized by k —
    * the capture is a plain Int, so the Aggregator stays serializable
    * and each call site picks its own bound. */
  def topKAggOf(k: Int): Aggregator[Item, Seq[Item], Seq[Item]] =
    new Aggregator[Item, Seq[Item], Seq[Item]] {
      override def zero: Seq[Item] = Seq.empty
      override def reduce(b: Seq[Item], a: Item): Seq[Item] = insert(k)(b, a)
      override def merge(b1: Seq[Item], b2: Seq[Item]): Seq[Item] =
        b2.foldLeft(b1)(insert(k))
      override def finish(r: Seq[Item]): Seq[Item] = r
      override def bufferEncoder = ExpressionEncoder[Seq[Item]]()
      override def outputEncoder = ExpressionEncoder[Seq[Item]]()
    }

  /** top-3 (value, id) per group. */
  val topKAgg: Aggregator[Item, Seq[Item], Seq[Item]] = topKAggOf(K)

  type Ev = (Long, Long, String) // (t, id, payload)

  private def earlier(a: Ev, b: Ev): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Bounded EARLIEST-k (t, id, payload) collector per group, plus the
    * group's total element count (so callers can flag truncation).
    * The sessionizer/funnel companion of [[topKAggOf]]: state is a
    * sorted ≤k list + one counter — map-side partial, O(k) per key
    * through the shuffle no matter how hot the key, where a plain
    * `collect_list` grows one row to the key's full event volume (the
    * bot-user memory bomb). Order/ties are (t asc, id asc), the
    * `row_number() OVER (ORDER BY ts, event_id)` ordering an oracle
    * mirrors exactly. */
  def earliestKAggOf(
      k: Int): Aggregator[Ev, (Seq[Ev], Long), (Seq[Ev], Long)] =
    new Aggregator[Ev, (Seq[Ev], Long), (Seq[Ev], Long)] {
      private def ins(buf: Seq[Ev], it: Ev): Seq[Ev] =
        spliceSorted(k, earlier)(buf, it)
      override def zero: (Seq[Ev], Long) = (Seq.empty, 0L)
      override def reduce(b: (Seq[Ev], Long), a: Ev): (Seq[Ev], Long) =
        (ins(b._1, a), b._2 + 1)
      override def merge(
          b1: (Seq[Ev], Long), b2: (Seq[Ev], Long)): (Seq[Ev], Long) =
        (b2._1.foldLeft(b1._1)(ins), b1._2 + b2._2)
      override def finish(r: (Seq[Ev], Long)): (Seq[Ev], Long) = r
      override def bufferEncoder = ExpressionEncoder[(Seq[Ev], Long)]()
      override def outputEncoder = ExpressionEncoder[(Seq[Ev], Long)]()
    }

  /** Top-3 orders per customer via the heap aggregation; output shape
    * identical to the window formulation (custkey, rank, orderkey,
    * price) so the DuckDB window oracle verifies it. */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(topKAgg, ExpressionEncoder[Item]())
    graft.Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"),
        posexplode(col("top")).as(Seq("r", "item")))
      .select(
        col("o_custkey"),
        (col("r") + 1).cast("bigint").as("rank"),
        col("item._2").as("o_orderkey"),
        col("item._1").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** The shared Knuth multiplicative hash, overflow-safe: `doc_id` is
    * reduced mod M BEFORE the multiply, so the intermediate product is
    * ≤ (M−1)·A ≈ 2.7e18 < 2^63 for the ENTIRE 64-bit id range — the
    * naive `id * A` wraps silently in Spark (and errors in DuckDB) for
    * id ≳ 3.46e9, i.e. exactly at web-corpus scale. By modular
    * arithmetic `((id mod M) · A) mod M = (id · A) mod M`, so values
    * are unchanged wherever the naive form didn't wrap. `pmod` keeps
    * the result non-negative for negative ids. */
  def knuthHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(1000000007L))

  /** The DuckDB-portable rendering of [[knuthHash]] (nonneg ids). */
  def knuthHashSql(idExpr: String): String =
    s"(($idExpr % 1000000007) * 2654435761) % 1000000007"

  /** Deterministic stratified fixed-size sample: 3 docs per language,
    * selected by a Knuth multiplicative hash of `doc_id` — the
    * reproducible alternative to rng sampling for eval-set carving
    * (same docs on any engine, any run, any partitioning; the sampling
    * companion of `Llm.splitAssignment`). Selection reuses [[topKAgg]]
    * on the negated hash, so each stratum's sample is a map-side
    * bounded heap: shuffle volume is O(strata · k), and no stratum ever
    * sorts — the window formulation is only the oracle. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(topKAgg, ExpressionEncoder[Item]())
    graft.Tables.load(s, dir, "documents")
      .withColumn("h", knuthHash(col("doc_id")))
      .groupBy(col("lang"))
      // min-k by hash == max-k of the negated hash (exact for h < 2^53)
      .agg(topk((-col("h")).cast("double"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("r", "item")))
      .select(
        col("lang"),
        (col("r") + 1).cast("bigint").as("rank"),
        col("item._2").as("doc_id"),
        (-col("item._1")).cast("bigint").as("h"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Deterministic WEIGHTED sample without replacement, 3 docs per
    * language, weight = `n_chars` — A-Res (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006, public
    * algorithm): each item draws u ∈ (0,1) and the k largest
    * `u^(1/weight)` keys ARE a weighted sample. u comes from the same
    * Knuth multiplicative hash as [[stratifiedSample]], so the sample
    * is reproducible on any engine/partitioning; selection reuses
    * [[topKAgg]], so it stays a map-side bounded heap (O(strata · k)
    * through the shuffle) rather than a per-stratum sort. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(topKAgg, ExpressionEncoder[Item]())
    graft.Tables.load(s, dir, "documents")
      .withColumn("u",
        (knuthHash(col("doc_id")) + lit(0.5)) / lit(1000000007L))
      .withColumn("akey", pow(col("u"), lit(1.0) / col("n_chars")))
      .groupBy(col("lang"))
      .agg(topk(col("akey"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("r", "item")))
      .select(
        col("lang"),
        (col("r") + 1).cast("bigint").as("rank"),
        col("item._2").as("doc_id"),
        round(col("item._1"), 6).as("akey"))
      .orderBy(col("lang"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_topk_orders_per_customer" -> topOrdersPerCustomer,
    "q74_stratified_sample" -> stratifiedSample,
    "q82_weighted_sample" -> weightedSample,
  )

  val oracles: Map[String, String] = Map(
    "q62_topk_orders_per_customer" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q74_stratified_sample" ->
      s"""SELECT lang, rank, doc_id, h FROM (
         |  SELECT lang, doc_id, ${knuthHashSql("doc_id")} AS h,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${knuthHashSql("doc_id")}, doc_id) AS rank
         |  FROM documents)
         |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "q82_weighted_sample" ->
      s"""WITH k AS (SELECT lang, doc_id,
         |  pow((${knuthHashSql("doc_id")} + 0.5) / 1000000007,
         |      1.0 / n_chars) AS akey
         |  FROM documents)
        |SELECT lang, rank, doc_id, round(akey, 6) AS akey FROM (
        |  SELECT lang, doc_id, akey,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY akey DESC, doc_id) AS rank
        |  FROM k)
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
  )
}
