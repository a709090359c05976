package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the `MERGE INTO` analog over immutable
  * parquet snapshots.
  *
  * The reference's warehouse is append/refresh only (each Dagster
  * materialization rewrites a table, reference `dlt_assets.py:136-188`);
  * a production lake additionally has to APPLY a change feed (upserts +
  * deletes from an operational store) to a large base snapshot. This
  * module is that operator, Spark-first:
  *
  *   merged = (base ⟕anti touched-keys) ∪ updated-rows ∪ inserted-rows
  *
  * Scale shape: the change feed is orders of magnitude smaller than the
  * base (a day of OLTP churn vs a 100 TB snapshot), so the touched-key
  * anti join BROADCASTS the key set — the base table never shuffles.
  * The union is plan-level (no data movement), and whatever aggregation
  * or write follows sees one partial-agg pass. A same-size feed would
  * flip the anti join to sort-merge automatically by removing the
  * broadcast hint; semantics are unchanged. PlanSpec asserts the
  * broadcast side so the base-never-shuffles property is machine-checked.
  */
object Cdc {

  /** Generic MERGE: apply `changes` (an `op` column: I/U/D, rows carry
    * the full target schema for I and U) to `base` keyed by `key`.
    * Updates and deletes remove the old row via one anti join on the
    * touched-key set; updates and inserts then union their new
    * versions in. The changes side is broadcast — see the scale note
    * above.
    *
    * PRECONDITION: at most one op per key per batch (the contract
    * every CDC log compaction provides). Conflicting U+D rows for one
    * key would both fire — the U would resurrect the deleted row. A
    * multi-op feed must first reduce to latest-op-per-key (A4's
    * `max_by` on the feed's sequence number). */
  def merge(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val touched = changes
      .filter(col("op").isin("U", "D"))
      .select(col(key))
    val upserts = changes
      .filter(col("op").isin("U", "I"))
      .drop("op")
    base
      .join(broadcast(touched), Seq(key), "left_anti")
      .unionByName(upserts)
  }

  /** The deterministic change feed q116 derives from the base itself
    * (the fixture has no OLTP side; both engines re-derive the same
    * feed):
    *   - key % 97 == 0  → UPDATE: price + 10.00, priority "0-CDC"
    *   - key % 101 == 0 → DELETE (update keys excluded: one op per key)
    *   - key % 103 == 0 → INSERT a new row under key −k (negatives are
    *     disjoint from the base key space by construction)
    */
  private def changeFeed(base: DataFrame): DataFrame = {
    val k: Column = col("o_orderkey")
    val upd = base.filter(k % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("o_orderpriority", lit("0-CDC"))
      .withColumn("op", lit("U"))
    val del = base.filter(k % 101 === 0 && k % 97 =!= 0)
      .withColumn("op", lit("D"))
    val ins = base.filter(k % 103 === 0)
      .withColumn("o_orderkey", -k)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("op", lit("I"))
    upd.unionByName(del).unionByName(ins)
  }

  /** q116: apply the derived change feed to `orders` and report the
    * merged snapshot per status — row counts and exact price cents
    * (prices ride as `round(price·100)` bigints through the sum, so
    * summation order cannot produce float drift cross-engine). The
    * inserted "N" status row proves inserts landed; the counts prove
    * deletes removed exactly the delete keys; the cents total proves
    * every update's new price is in the snapshot. */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.load(s, dir, "orders")
    merge(base, changeFeed(base), "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("bigint"))
          .as("price_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_cdc_merge" -> cdcMerge,
  )

  val oracles: Map[String, String] = Map(
    // the same feed + merge as one CTE chain; sum over bigint cents is
    // order-free, and DuckDB's HUGEINT sum casts back to BIGINT
    "q116_cdc_merge" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + 10.0 AS o_totalprice, o_orderdate,
        |    '0-CDC' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |del AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0),
        |ins AS (
        |  SELECT -o_orderkey AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 103 = 0),
        |touched AS (
        |  SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM del),
        |merged AS (
        |  SELECT * FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
