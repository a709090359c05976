package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE declared query against a warehouse dir and
  * print its wall time + row count — the profiling loop for a single
  * operator without paying a full Bench sweep.
  * `sbt "runMain graft.RunOne q134_copurchase_triangles /root/testdata/sf0.1"`
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <queryName> <sfDir> [runs]")
    val (name, dir) = (args(0), args(1))
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name run $i: $sec%.2f s, $n rows")
    }
    spark.stop()
  }
}
