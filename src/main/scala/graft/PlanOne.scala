package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print ONE query's formatted physical plan (and
  * optionally time it) without regenerating all of PLANS.md:
  * `sbt "runMain graft.PlanOne q38_ivf_topk [/root/testdata/sf0.01]"`.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"[planone] $name rows=$n first=${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime()
    df.count()
    println(s"[planone] second=${(System.nanoTime()-t1)/1e9}s")
    // scalastyle:on println
    spark.stop()
  }
}
