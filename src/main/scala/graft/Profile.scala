package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev utility: run declared queries through the noop sink and dump
  * the EXECUTED plan tree with each node's SQL metrics (rows, shuffle
  * bytes, fetch wait, codegen duration, spill). This is the guide-§7
  * "SQL tab" view for a headless box — it attributes a slow query to
  * an operator without the UI.
  *
  * `sbt "runMain graft.Profile <sfDir> <query>..."` — each query runs
  * once to warm (artifact builds, codegen), then a timed noop run
  * whose final adaptive plan is printed with metrics.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // df.write runs its own QueryExecution (the noop command), so the
    // metrics live there, not on the DataFrame's plan: capture the
    // last executed QE via a listener.
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = lastQe = qe
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    args.drop(1).foreach { q =>
      SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val df = SparkEntry.queries(q)(spark, dir)
      lastQe = null
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; wait for ours
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (lastQe == null && System.nanoTime() < deadline) Thread.sleep(50)
      // scalastyle:off println
      println(f"== $q%s  $dt%.2f s (warm noop)")
      def fmt(v: Long, unit: String): String = unit match {
        case "size"   => f"${v / 1048576.0}%.1fMB"
        case "timing" => f"${v / 1000.0}%.2fs"
        case "nsTiming" => f"${v / 1e9}%.2fs"
        case _        => if (v >= 1000000) f"${v / 1e6}%.1fM" else v.toString
      }
      def walk(p: SparkPlan, depth: Int): Unit = {
        val interesting = p.metrics.toSeq.filter { case (k, m) =>
          m.value > 0 && (k == "numOutputRows" || k.contains("time") ||
            k.contains("Time") || k.contains("bytes") || k.contains("spill") ||
            k.contains("duration") || k.contains("records") ||
            k.contains("peak") || k.contains("rowsOutput"))
        }.sortBy(_._1).map { case (k, m) =>
          s"$k=${fmt(m.value, m.metricType)}"
        }.mkString(" ")
        println("  " * depth + p.nodeName + "  " + interesting)
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(s.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
            Seq(r.child)
          case _ => p.children ++ p.subqueries
        }
        kids.foreach(walk(_, depth + 1))
      }
      if (lastQe != null) walk(lastQe.executedPlan, 1)
      lastQe = null
      // scalastyle:on println
    }
    spark.stop()
  }
}
