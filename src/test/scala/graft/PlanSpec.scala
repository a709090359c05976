package graft

import org.apache.spark.sql.functions._

/** Physical-plan invariants — the 100 TB discipline, machine-checked:
  * no accidental cartesian products, pushdown reaching scans, broadcast
  * on dimension joins, top-k planned as TakeOrderedAndProject, and
  * shuffle-free joins on co-bucketed tables. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Queries that intentionally use a broadcast nested-loop: a handful
    * of broadcast query vectors / centroids against the streaming side. */
  private val bnljAllowed = Set(
    "q31_topk_cosine", "q38_ivf_topk", "q39_embed_neardup")

  test("no query plans a CartesianProduct; BNLJ only where intended") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!bnljAllowed(name)) {
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended broadcast nested-loop join")
      }
    }
  }

  test("flagship: filter pushed to scan, dim side broadcast") {
    val p = plan("q01_flagship_us_customers")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(n_name,NATION_1)"))
  }

  test("top-k plans TakeOrderedAndProject, never a global sort") {
    val p = plan("q03_top_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("set-membership filter pushed to parquet") {
    val p = plan("q15_error_purchase_by_user")
    assert(p.contains("In(event_type"))
  }

  test("column pruning: narrow projection reaches the scan") {
    val p = plan("q03_top_orders")
    // the orders scan must not read all 6 columns for a 3-column query
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_orderpriority"))
  }

  test("latest-run uses partial max_by aggregation, not a window sort") {
    val p = plan("q44_latest_run_per_entity")
    assert(p.contains("partial_max_by"))
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "))
  }

  test("partitioned write + read prunes partitions at the scan") {
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    Tables.load(s, sf, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val read = s.read.parquet(out).filter(col("lang") === "en")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"partition filter not applied:\n$p")
    // pruned read touches only the en partition
    assert(read.count() ===
      Tables.load(s, sf, "documents").filter(col("lang") === "en").count())
  }

  test("co-bucketed tables join without a shuffle") {
    val s = spark // tables land in ./spark-warehouse (gitignored)
    val n = 8
    Tables.load(s, sf, "orders")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.load(s, sf, "customer")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    try {
      val joined = s.table("orders_b")
        .join(s.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: no Exchange needed
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
