package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a set of declared queries across a set of
  * warehouse dirs IN ONE JVM and emit one JSON line per (query, dir) —
  * the empirical scaling probe (`runMain graft.ScaleProbe
  * <dir1,dir2,...> <q1,q2,...> [runs]`). Per (query, dir) the
  * reported `warm_sec` is the min over runs 2+, excluding run 1 — the
  * RunOne discipline: the first run absorbs JIT, parquet-footer
  * caches, and any IndexStore artifact BUILD for that fixture, none
  * of which are the query's steady-state cost. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleProbe <dir1,dir2,..> <q1,q2,..> [runs]")
    val dirs = args(0).split(",").toSeq
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Shuffle width is a SCALE variable, not a host constant: a fixture
    // 100× the base with the same cpus-wide shuffle sorts ~GB-sized
    // partitions and spills — a probe artifact a real cluster never
    // sees (its width tracks data). Override per grid; AQE coalesces
    // the excess away on the small fixtures.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; name <- names) {
      val q = SparkEntry.queries(name)
      var rows = 0L
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        rows = q(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = if (times.size > 1) times.drop(1).min else times.head
      println(s"""{"probe":"scale","query":"$name","dir":"$dir",""" +
        s""""warm_sec":$warm,"first_sec":${times.head},"rows":$rows}""")
    }
    spark.stop()
  }
}
