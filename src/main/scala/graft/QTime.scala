package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual declared queries in isolation.
  *
  * `runMain graft.QTime <sfDir> <queryName>...` — each query is run
  * once to warm codegen/IO, then timed on a second noop-sink run. Use
  * this to attribute a slow `Bench` line to the query itself vs
  * cold-start, without paying a full bench sweep per hypothesis.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"TIMED $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
