package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lineage graph operators — SURVEY.md §2.6, the reference's most
  * distinctive computation (`dlt_assets.py:59-77` recursive upstream
  * crawl with visited-set cycle guard, self-edge filter, final dedup).
  *
  * The reference walks the graph root-by-root with O(V·E) REST calls; here
  * the edge relation is a DataFrame and the transitive closure is computed
  * for ALL roots at once by semi-naïve iteration: each round joins only
  * the newly-discovered frontier against the edge table, anti-joins
  * against the accumulated closure (the `visited` set, D4), and stops when
  * the frontier is empty. `localCheckpoint` truncates the logical plan per
  * round so the plan doesn't grow unboundedly (SURVEY §7.4 risk 1).
  *
  * 100 TB design: each iteration is one shuffle join keyed on the join
  * column; pre-partitioning `edges` by `src` and reusing that partitioning
  * for every round avoids re-shuffling the (static) edge side. Iterations
  * are bounded by graph diameter, not vertex count.
  */
object Lineage {

  /** The star schema's FK-implied lineage DAG plus a synthetic self-edge
    * (filtered, mirroring `dlt_assets.py:68-69` P5). */
  def edgeFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq(
      ("nation", "region"),
      ("customer", "nation"),
      ("supplier", "nation"),
      ("orders", "customer"),
      ("lineitem", "orders"),
      ("lineitem", "part"),
      ("lineitem", "supplier"),
      ("events", "events") // self-edge: must be dropped (P5)
    ).toDF("src", "dst")
  }

  /** Edge list with self-edges removed (P5), total order for the oracle. */
  def lineageEdges(s: SparkSession, dir: String): DataFrame =
    edgeFixture(s, dir)
      .filter(col("src") =!= col("dst"))
      .orderBy(col("src"), col("dst"))

  /** Transitive closure of an arbitrary (src, dst) edge DataFrame.
    * Cycle-safe: the anti-join against the accumulated closure guarantees
    * termination (a cycle stops producing new pairs after one lap). */
  def closure(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var acc = e.select(col("src"), col("dst").as("anc"))
    var frontier = acc
    var done = frontier.isEmpty
    while (!done) {
      val next = frontier.as("f")
        .join(e.as("g"), col("f.anc") === col("g.src"))
        .select(col("f.src").as("src"), col("g.dst").as("anc"))
        .distinct()
        .join(acc, Seq("src", "anc"), "left_anti") // visited guard (D4)
        .localCheckpoint()
      done = next.isEmpty
      if (!done) {
        acc = acc.union(next).localCheckpoint()
        frontier = next
      }
    }
    acc
  }

  /** Full ancestor set per table over the fixture DAG (§2.6). */
  def lineageClosure(s: SparkSession, dir: String): DataFrame =
    closure(edgeFixture(s, dir)).orderBy(col("src"), col("anc"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_lineage_edges" -> lineageEdges,
    "q20_lineage_closure" -> lineageClosure,
  )

  private val edgeValues =
    """(VALUES ('nation','region'),('customer','nation'),
      |  ('supplier','nation'),('orders','customer'),
      |  ('lineitem','orders'),('lineitem','part'),
      |  ('lineitem','supplier'),('events','events')) AS t(src, dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q19_lineage_edges" ->
      s"""SELECT src, dst FROM $edgeValues
         |WHERE src <> dst ORDER BY src, dst""".stripMargin,
    "q20_lineage_closure" ->
      s"""WITH RECURSIVE e(src, dst) AS (
         |  SELECT src, dst FROM $edgeValues WHERE src <> dst),
         |c(src, anc) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT c.src, e.dst FROM c JOIN e ON c.anc = e.src)
         |SELECT src, anc FROM c ORDER BY src, anc""".stripMargin,
  )
}
