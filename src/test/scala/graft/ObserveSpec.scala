package graft

import java.nio.file.Files

import graft.observe.Materialize
import graft.ops.Multimodal

/** Materialization plane + multimodal decode + discovery behavior. */
class ObserveSpec extends SparkSuite {

  test("materializations: one row per discovered table, counts match") {
    val m = Materialize.materializations(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet === Tables.discover(sf).toSet)
    assert(m("nation") === 25L)
    assert(m("region") === 5L)
  }

  test("materializations freshness: ts tables non-null, dims null") {
    val m = Materialize.materializations(spark, sf)
      .collect().map(r => r.getString(0) -> Option(r.getTimestamp(2))).toMap
    assert(m("events").nonEmpty)
    assert(m("orders").nonEmpty)
    assert(m("lineitem").nonEmpty)
    assert(m("customer").isEmpty)
  }

  test("materializations reads footers, not data: input records ≪ table " +
    "rows, and footer freshness equals the scanned max(ts)") {
    val s = spark
    // Footer maxima must equal what a real column scan computes (the
    // manifest path may never change the answer, only the cost).
    import org.apache.spark.sql.functions._
    val scanned = Tables.load(s, sf, "events")
      .agg(max(col("ts"))).head().getTimestamp(0)
    val m = Materialize.materializations(s, sf)
      .collect().map(r => r.getString(0) -> Option(r.getTimestamp(2))).toMap
    assert(m("events") === Some(scanned))
    // Cost: run the plane under a task-metrics listener — the whole
    // observation tick must read O(#files) records, never O(rows).
    var records = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        records += e.taskMetrics.inputMetrics.recordsRead
    }
    s.sparkContext.addSparkListener(listener)
    try {
      Materialize.materializations(s, sf).collect()
      // listener events are async; give the bus a moment to drain
      val deadline = System.currentTimeMillis() + 5000
      var last = -1L
      while (System.currentTimeMillis() < deadline && records != last) {
        last = records; Thread.sleep(200)
      }
    } finally s.sparkContext.removeSparkListener(listener)
    val totalRows = Tables.discover(sf)
      .map(n => Tables.load(s, sf, n).count()).sum
    assert(records < totalRows / 100,
      s"materializations read $records records for $totalRows table rows — " +
        "that is a data scan, not a footer read")
  }

  test("K2 sink: appendEvents appends with observation metadata") {
    val out = Files.createTempDirectory("graft_events").toString + "/events"
    val m = Materialize.materializations(spark, sf)
    Materialize.appendEvents(m, out)
    Materialize.appendEvents(m, out) // append, not overwrite
    val evs = spark.read.parquet(out)
    assert(evs.count() === 2 * m.count())
    assert(evs.columns.contains("observed_at"))
    assert(evs.columns.contains("event_kind"))
  }

  test("metadata dict: typed MapType payload with rendered schema, " +
    "round-trips through the event sink") {
    import org.apache.spark.sql.types.{MapType, StringType}
    val md = Materialize.materializationMetadata(spark, sf)
    val f = md.schema("metadata")
    assert(f.dataType === MapType(StringType, StringType, valueContainsNull = true))
    val rows = md.collect().map { r =>
      r.getAs[String]("table_name") -> r.getAs[Map[String, String]]("metadata")
    }.toMap
    val li = rows("lineitem")
    assert(li("n_columns") === "11")
    assert(li("row_count").toLong ===
      Tables.load(spark, sf, "lineitem").count())
    assert(li("link") === "[main.lineitem](graft://main/lineitem)")
    assert(li("schema").startsWith("l_orderkey:bigint,"))
    assert(li("schema").endsWith("l_shipdate:timestamp"))
    // the dict survives the K2 sink: parquet serializes the map column
    val out = Files.createTempDirectory("graft_md").toString + "/events"
    Materialize.appendEvents(md, out)
    val back = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("table_name") === "events")
      .head().getAs[Map[String, String]]("metadata")
    assert(back("schema").contains("ts:timestamp"))
  }

  test("snapshot delta: added/removed/changed/unchanged routing") {
    val s = spark
    import s.implicits._
    val tNull = Option.empty[java.sql.Timestamp]
    val prev = Seq(
      ("a", 10L, tNull), ("b", 20L, tNull), ("gone", 1L, tNull))
      .toDF("table_name", "row_count", "last_modified")
    val curr = Seq(
      ("a", 10L, tNull),   // unchanged — filtered out
      ("b", 25L, tNull),   // changed
      ("new", 5L, tNull))  // added
      .toDF("table_name", "row_count", "last_modified")
    val d = Materialize.snapshotDelta(prev, curr)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d === Map("b" -> "changed", "new" -> "added", "gone" -> "removed"))
  }

  test("discovery reacts to directory contents (fallback on empty)") {
    assert(Tables.discover(sf).contains("lineitem"))
    assert(Tables.discover("/nonexistent_dir_xyz") === Tables.all)
  }

  test("multimodal decode: genuine header parse — PNG/WAV/JPEG fields " +
    "are recovered from hand-built payload bytes") {
    // the decoder only sees bytes: hand-assemble containers with known
    // field values and check the parse recovers them
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes ++
      be32(777) ++ be32(321) ++ Array[Byte](8, 6, 0, 0, 0) ++ be32(0) ++
      "pixels".getBytes
    val wav = "RIFF".getBytes ++ le32(36 + 32000) ++ "WAVEfmt ".getBytes ++
      le32(16) ++ Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++
      Array[Byte](2, 0, 16, 0) ++ "data".getBytes ++ le32(32000) ++
      Array.fill[Byte](10)(7) // truncated body: header fields rule
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xC0).map(_.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(480) ++ be16(640) ++
      Array[Byte](1, 1, 0x11, 0) ++ Array.fill[Byte](25)(3)
    val feats = Multimodal.decode(Iterator(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "audio", wav),
      Multimodal.MediaRow(3L, "video", jpg),
      Multimodal.MediaRow(4L, "image", "not a container".getBytes))).toSeq
    val byId = feats.map(f => f.doc_id -> f).toMap
    assert((byId(1L).width, byId(1L).height, byId(1L).duration_ms) ===
      ((777L, 321L, 0L)))
    // duration = dataSize·1000 / byteRate = 32000·1000/16000 = 2000 ms
    assert((byId(2L).width, byId(2L).height, byId(2L).duration_ms) ===
      ((0L, 0L, 2000L)))
    // 25 body bytes after the 15-byte header → 25 frames · 40 ms
    assert((byId(3L).width, byId(3L).height, byId(3L).duration_ms) ===
      ((640L, 480L, 1000L)))
    // unparseable payloads quarantine to zeros, never throw
    assert((byId(4L).width, byId(4L).height, byId(4L).duration_ms) ===
      ((0L, 0L, 0L)))
    // fixture round-trip: every decoded field matches the doc_id
    // formulas the fixture wrote INTO the headers
    val d = Multimodal.decoded(spark, sf).collect()
    assert(d.nonEmpty)
    d.foreach { f =>
      assert(f.frame_hashes.size === 3)
      f.modality match {
        case "image" =>
          assert(f.width === 16 + f.doc_id % 1024)
          assert(f.height === 16 + f.doc_id % 768)
          assert(f.duration_ms === 0L)
        case "audio" =>
          val rate = 8000 + (f.doc_id % 8) * 1000
          val bodyLen = f.payload_len - 44
          assert(f.width === 0L && f.height === 0L)
          assert(f.duration_ms === bodyLen * 1000 / (rate * 2))
        case _ =>
          assert(f.width === 160 + f.doc_id % 800)
          assert(f.height === 120 + f.doc_id % 600)
          assert(f.duration_ms === (f.payload_len - 15) * 40)
      }
    }
  }

  test("media dedup recall: every planted re-encode pairs with its " +
    "base via content blocks (and positional frame hashes provably " +
    "CANNOT pair them); every planted re-upload surfaces in exact " +
    "dedup pointing at its base") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // ground truth from the typed decode over the planted corpus
    val corpus = Multimodal.mediaCorpus(s, sf)
      .withColumnRenamed("media_id", "doc_id")
      .as[Multimodal.MediaRow].mapPartitions(Multimodal.decode _)
      .collect().map(f => f.doc_id -> f).toMap
    // --- near-dup recall: every re-encode with >= 1 full body block
    // must pair with its base (containment already thresholded at 0.8)
    val near = Multimodal.mediaNearDups(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = corpus.keys
      .filter(id => id >= 1000000L && id < 2000000L)
      .filter(id => corpus(id).block_hashes.nonEmpty)
      .map(id => (id - 1000000L, id)).toSet
    assert(expected.nonEmpty, "fixture must plant block-bearing re-encodes")
    assert((expected -- near).isEmpty,
      s"planted re-encode pairs missed: ${(expected -- near).take(3)}")
    // the counterfactual: the re-encode's container shift displaces
    // every positional frame slice, so frame_hashes share NOTHING —
    // only the content-defined blocks can make this pair
    val (b0, v0) = expected.head
    assert(corpus(b0).frame_hashes.toSet
      .intersect(corpus(v0).frame_hashes.toSet).isEmpty,
      "positional frame hashes must NOT survive the re-encode")
    assert(corpus(v0).block_hashes.toSet
      .subsetOf(corpus(b0).block_hashes.toSet),
      "a truncated re-encode's blocks are a prefix subset of its base")
    // --- exact-dup recall: every %7 re-upload is shed toward its base
    val shed = Multimodal.mediaExactDups(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val reuploads = corpus.keys.filter(_ >= 2000000L).toSeq
    assert(reuploads.nonEmpty, "fixture must plant re-uploads")
    reuploads.foreach { id =>
      assert(shed.contains(id), s"re-upload $id must be shed")
      assert(shed(id) < 1000000L,
        s"re-upload $id must keep a BASE row, got ${shed(id)}")
    }
    // a re-encode is NOT an exact dup — its container bytes differ,
    // which is exactly why the block path has to exist
    assert(corpus.keys.filter(id => id >= 1000000L && id < 2000000L)
      .forall(id => !shed.contains(id)),
      "re-encodes must never surface as exact dups")
  }

  test("audio fingerprint kernel: frame energies quantize relative to " +
    "the row's own peak, shingles pack 4 levels, below-resolution and " +
    "non-WAV rows emit nothing") {
    def wav(samples: Seq[Int]): Array[Byte] = {
      val body = samples.flatMap { v =>
        val u = v & 0xFFFF
        Seq((u % 256).toByte, (u / 256).toByte)
      }.toArray
      val b = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + body.length)
      b.put("WAVEfmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(body.length).put(body)
      b.array()
    }
    def fps(p: Array[Byte]): Seq[String] =
      Multimodal.audioFpsOf(Iterator(
        Multimodal.MediaRow(1L, "audio", p))).map(_._2).toSeq
    // four 20-sample frames at amplitudes 100/200/300/400: energies
    // 200k/800k/1.8M/3.2M, levels ⌊fe·63/3.2M⌋ = 3/15/35/63, one
    // shingle, packed (3·64+15)·64+35)·64+63 = 850175 then digested —
    // the fingerprint is md5('850175'), never the raw pack (the
    // fixed-universe saturation fix)
    val base = Seq.fill(20)(100) ++ Seq.fill(20)(200) ++
      Seq.fill(20)(300) ++ Seq.fill(20)(400)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(fps(wav(base)) === Seq(Multimodal.gainFpOf(md,
      ((3L * 64 + 15) * 64 + 35) * 64 + 63)))
    assert(fps(wav(base)).head ===
      md.digest("850175".getBytes).map("%02x".format(_)).mkString,
      "the digest must be md5 of the DECIMAL string (the oracle twin)")
    // polarity inversion: energies are exactly invariant
    assert(fps(wav(base.map(-_))) === fps(wav(base)))
    // a uniform EXACT gain change (×3, no clipping) is also invariant
    assert(fps(wav(base.map(_ * 3))) === fps(wav(base)))
    // 3 frames are below the shingle resolution
    assert(fps(wav(base.take(60))).isEmpty)
    // non-WAV payloads emit nothing (T5)
    assert(fps("not audio at all, just bytes".getBytes).isEmpty)
    // the partial tail frame is EXCLUDED (length-parity noise that
    // slices boilerplate populations below the stop threshold):
    // 61 samples = 3 full frames -> below resolution; 80 = 4 -> fps
    assert(fps(wav(base.take(61))).isEmpty)
    assert(fps(wav(base.take(80) ++ Seq.fill(7)(250))) ===
      fps(wav(base.take(80))),
      "a trailing partial frame must not change the fingerprints")
  }

  test("audio fingerprint min-cap is a UNIFORM sample (the fixed-pack " +
    "saturation class, pinned): on a long clip the kept 256 digests " +
    "select tuples spanning the row's full level range, where the " +
    "r10 numeric-smallest pack kept only the quiet-region corner") {
    // a long pseudo-random clip: > 256 shingles so the cap BINDS
    // (fixture clips are short — the cap never binds there, which is
    // exactly why this property needs a kernel-level pin)
    val rnd = new scala.util.Random(42)
    // a per-frame amplitude envelope spanning ~2 orders of magnitude —
    // real program audio has quiet and loud passages; a constant-power
    // clip would quantize to one tight level band and hide the bias
    val samples = (0 until 600).flatMap { _ =>
      val amp = math.pow(10.0, 2.0 + rnd.nextDouble() * 2.0).toInt
      Seq.fill(20)(rnd.nextInt(2 * amp) - amp)
    }
    def wav(ss: Seq[Int]): Array[Byte] = {
      val body = ss.flatMap { v =>
        val u = v & 0xFFFF
        Seq((u % 256).toByte, (u / 256).toByte)
      }.toArray
      val b = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + body.length)
      b.put("WAVEfmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(body.length).put(body)
      b.array()
    }
    val kept = Multimodal.audioFpSeqOf(wav(samples))
    assert(kept.length === 256, "the cap must bind on a 600-frame clip")
    // recompute every tuple + its digest in-test (the kernel's math),
    // then invert the kept digests back to their tuples
    val frames = samples.grouped(20).map(f =>
      f.map(s => s.toLong * s).sum).toSeq
    val emax = frames.max
    val lv = frames.map(f => if (emax == 0L) 0L else f * 63L / emax)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tuples = (0 to lv.length - 4)
      .map(j => ((lv(j) * 64 + lv(j + 1)) * 64 + lv(j + 2)) * 64 + lv(j + 3))
      .distinct
    val byDigest = tuples.map(t => Multimodal.gainFpOf(md, t) -> t).toMap
    assert(kept.toSet === byDigest.keys.toSeq.sorted.take(256).toSet,
      "kept = the 256 lexicographically smallest digests of ALL tuples")
    val keptTuples = kept.map(byDigest)
    // the digest's sample is UNIFORM over the row's tuples: its kept
    // leading levels span (nearly) the same range as the full set...
    def lead(t: Long) = t >> 18
    assert(lead(keptTuples.max) >= lead(tuples.max) * 8 / 10,
      "a uniform sample must reach into the loud-tuple region")
    // ...where the r10 keying (256 NUMERICALLY smallest packed values)
    // kept ONLY the quiet corner — the biased effective universe whose
    // cross-row concentration made df grow with the corpus
    val packKept = tuples.sorted.take(256)
    assert(lead(packKept.max) < lead(tuples.max) / 2,
      "the numeric pack's cap is a quiet-corner slice, not a sample " +
        "(this is the saturation class E178 retires)")
  }

  test("hostile COMPRESSED-audio payloads (MP3 frame-sync, ID3, AAC " +
    "ADTS, RIFF-wrapped MP3) route through T5 on every audio leg: " +
    "emit nothing, never crash, never hang — the documented MP3/AAC " +
    "boundary's enforcement arms") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // MP3 frame sync (0xFFFB), ID3v2-tagged MP3, AAC ADTS (0xFFF1),
    // and the deepest arm: a VALID RIFF/WAVE container whose fmt tag
    // is 0x0055 (MPEG layer 3) — magic-byte gates alone pass it, only
    // the canonical-PCM header check routes it to T5 instead of
    // "decoding" entropy-coded bytes as garbage PCM
    val junk = Array.tabulate[Byte](400)(i => ((i * 37 + 11) % 251).toByte)
    val mp3 = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00) ++ junk
    val id3 = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 60) ++ junk
    val aac = Array[Byte](0xFF.toByte, 0xF1.toByte, 0x4C.toByte,
      0x80.toByte, 0x1E.toByte, 0x7F.toByte, 0xFC.toByte) ++ junk
    val wavMp3 = {
      val p = ("RIFF" + "\u0000\u0000\u0000\u0000" + "WAVEfmt ")
        .getBytes("US-ASCII") ++ Array.fill[Byte](28)(0) ++ junk
      p(20) = 0x55; p(21) = 0x00 // wFormatTag = MPEG layer 3
      p(34) = 0x10; p(35) = 0x00
      p
    }
    val hostile = Seq(mp3, id3, aac, wavMp3)
    // kernel leg (q161 features / q162-q163-q171 fingerprints): T5 is
    // "emit nothing" — zero-feature rows and empty fingerprint sets
    hostile.foreach { p =>
      assert(Multimodal.audioFpSeqOf(p).isEmpty,
        "a compressed-audio payload must emit NO fingerprints")
    }
    val feats = Multimodal.audioDecode(hostile.zipWithIndex.map {
      case (p, i) => Multimodal.MediaRow(i.toLong, "audio", p)
    }.iterator).toSeq
    assert(feats.forall(f => f.n_samples == 0L && f.peak_abs == 0L),
      "compressed audio must decode to the zero-feature row, not " +
        "garbage PCM features")
    // gate leg (q163 batch + q171 decision): zero flags, zero
    // decisions, and — the FDICT lesson — bounded by a timed join so
    // a regression FAILS instead of hanging the suite
    val in = hostile.zipWithIndex
      .map { case (p, i) => (5500000L + i, p) }
      .toDF("media_id", "payload")
    // capture the whole Try (ADVICE r13): a Spark-side crash must
    // surface AS the failure, distinguishable from a hang (None) or a
    // wrong count — the bare Option swallowed the exception and every
    // failure mode read as the generic time-bound message
    @volatile var counts: Option[scala.util.Try[(Long, Long)]] = None
    val t = new Thread(() => {
      counts = Some(scala.util.Try((
        graft.ops.Multimodal.audioAdmission(s, sf, in).count(),
        graft.ops.Multimodal.audioAdmission(s, sf, in, decision = true)
          .count())))
    })
    t.setDaemon(true); t.start(); t.join(120000)
    assert(counts.nonEmpty,
      "hostile compressed audio hung the gate past the time bound")
    assert(counts.get === scala.util.Success((0L, 0L)),
      "hostile compressed audio must flag nothing and decide nothing " +
        s"on both gate faces; saw ${counts.get}")
  }

  test("AudioCodec seam: a registered stub codec decodes a non-PCM " +
    "container through the SAME kernels — identical fingerprints, " +
    "features, and gate flags as the canonical WAV of the same " +
    "samples; with the codec absent the payload stays T5") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // a toy compressed-ish container: magic 'STUB', 4-byte LE rate,
    // then DELTA-coded samples (each byte a signed delta) — cheap to
    // decode, impossible for the canonical PCM parser to accept
    def stubPayload(rate: Int, samples: Seq[Int]): Array[Byte] = {
      val deltas = samples.zip(0 +: samples.dropRight(1))
        .map { case (v, prev) => (v - prev).toByte }
      val b = java.nio.ByteBuffer.allocate(8 + deltas.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("STUB".getBytes("US-ASCII")).putInt(rate)
      deltas.foreach(b.put)
      b.array()
    }
    // decodes BOTH stub containers: 'STUB' = byte-delta-coded samples,
    // 'STUW' = absolute 16-bit LE samples (for arbitrary-amplitude
    // corpus rows the one-byte delta cannot carry)
    object StubCodec extends graft.ops.AudioCodec {
      override def decode(p: Array[Byte]) =
        if (p.length < 8 || !(p(0) == 'S' && p(1) == 'T' && p(2) == 'U'))
          None
        else {
          val bb = java.nio.ByteBuffer.wrap(p)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val rate = bb.getInt(4).toLong
          if (p(3) == 'B') {
            val out = new Array[Int](p.length - 8)
            var acc = 0
            var i = 0
            while (i < out.length) {
              acc += p(8 + i); out(i) = acc; i += 1
            }
            Some(graft.ops.DecodedPcm(rate, out))
          } else if (p(3) == 'W') {
            val out = new Array[Int]((p.length - 8) / 2)
            var i = 0
            while (i < out.length) {
              out(i) = bb.getShort(8 + 2 * i).toInt; i += 1
            }
            Some(graft.ops.DecodedPcm(rate, out))
          } else None
        }
    }
    def wav(samples: Seq[Int]): Array[Byte] = {
      val body = samples.flatMap { v =>
        val u = v & 0xFFFF
        Seq((u % 256).toByte, (u / 256).toByte)
      }.toArray
      val b = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + body.length)
      b.put("WAVEfmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(body.length).put(body)
      b.array()
    }
    // small-amplitude ramp/wave: delta-codable within a byte
    val samples = (0 until 120).map(i => (i % 40) - 20)
    val asWav = wav(samples)
    val asStub = stubPayload(8000, samples)
    // ABSENT codec: the stub container is T5 on every leg
    assert(graft.ops.Multimodal.audioFpSeqOf(asStub).isEmpty,
      "an unregistered container must emit no fingerprints (T5)")
    assert(graft.ops.Multimodal.audioDecode(Iterator(
      graft.ops.Multimodal.MediaRow(1L, "audio", asStub)))
      .next().n_samples === 0L)
    // REGISTERED codec: the seam feeds the same folds — fingerprints
    // and features equal the canonical WAV's, and the GATE flags the
    // stub payload against the corpus exactly as it would the WAV
    graft.ops.AudioCodecs.withCodec(StubCodec) {
      assert(graft.ops.Multimodal.audioFpSeqOf(asStub) ===
        graft.ops.Multimodal.audioFpSeqOf(asWav),
        "stub-decoded samples must fingerprint identically to the WAV")
      val f = graft.ops.Multimodal.audioDecode(Iterator(
        graft.ops.Multimodal.MediaRow(1L, "audio", asStub))).next()
      val g = graft.ops.Multimodal.audioDecode(Iterator(
        graft.ops.Multimodal.MediaRow(2L, "audio", asWav))).next()
      assert(f.n_samples === g.n_samples && f.peak_abs === g.peak_abs &&
        f.mean_sq === g.mean_sq && f.top_frame_energy === g.top_frame_energy)
      assert(f.n_samples === 120L)
      // gate leg: re-container a REAL corpus audio row as a stub
      // payload; the admission gate must flag it against its base —
      // the codec swap is a config, the gate plan does not change
      val corpusRow = graft.ops.Multimodal.audioVariantCorpus(s, sf)
        .orderBy(col("media_id")).limit(1).collect().head
      val baseId = corpusRow.getLong(0)
      val pcm = graft.ops.CanonicalPcmWav
        .decode(corpusRow.getAs[Array[Byte]](1)).get
      val reStub = stubPayloadWide(pcm.rate.toInt, pcm.samples)
      val flags = graft.ops.Multimodal.audioAdmission(s, sf,
        Seq((8800000L, reStub)).toDF("media_id", "payload"))
        .select(col("in_id"), col("corpus_id")).collect()
      assert(flags.exists(r => r.getLong(0) == 8800000L &&
        r.getLong(1) == baseId),
        s"the stub re-container of corpus row $baseId must be flagged " +
          s"against its base; saw ${flags.mkString(",")}")
    }
    // restored after withCodec: the stub container is T5 again
    assert(graft.ops.Multimodal.audioFpSeqOf(asStub).isEmpty)
  }

  /** Stub container with 16-bit little-endian ABSOLUTE samples (magic
    * 'STUW') for arbitrary-amplitude corpus rows — the wide twin of
    * the delta-coded 'STUB' arm; the test's StubCodec decodes both. */
  private def stubPayloadWide(rate: Int, samples: Array[Int]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("STUW".getBytes("US-ASCII")).putInt(rate)
    samples.foreach(v => b.putShort(v.toShort))
    b.array()
  }

  test("canonical STEREO PCM16 WAV routes to T5 (ADVICE r13): the " +
    "mono requirement is part of the canonical gate — an interleaved " +
    "L/R stream must not silently decode as one mono stream") {
    def stereoWav(frames: Seq[(Int, Int)]): Array[Byte] = {
      val body = frames.flatMap { case (l, r) =>
        Seq(l, r).flatMap { v =>
          val u = v & 0xFFFF
          Seq((u % 256).toByte, (u / 256).toByte)
        }
      }.toArray
      val b = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + body.length)
      b.put("WAVEfmt ".getBytes).putInt(16).putShort(1)
        .putShort(2) // nChannels = 2
        .putInt(8000).putInt(32000).putShort(4).putShort(16)
      b.put("data".getBytes).putInt(body.length).put(body)
      b.array()
    }
    val p = stereoWav((0 until 100).map(i => (i * 3, -i * 3)))
    assert(graft.ops.CanonicalPcmWav.decode(p).isEmpty)
    assert(graft.ops.Multimodal.audioFpSeqOf(p).isEmpty,
      "stereo canonical PCM must emit no fingerprints until a " +
        "downmixing codec is registered")
    assert(graft.ops.Multimodal.audioDecode(Iterator(
      graft.ops.Multimodal.MediaRow(1L, "audio", p))).next()
      .n_samples === 0L,
      "stereo canonical PCM must decode to the zero-feature row")
  }

  test("audio gain near-dup recall: every eligible planted re-master " +
    "pairs with its base via energy fingerprints (and the byte-block " +
    "path provably CANNOT pair them)") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // kernel-level ground truth: fingerprint set per corpus row
    val corpus = Multimodal.audioVariantCorpus(s, sf)
    val nCorpus = corpus.count()
    val fpsOf = corpus.withColumnRenamed("media_id", "doc_id")
      .withColumn("modality", lit("audio"))
      .as[Multimodal.MediaRow].mapPartitions(Multimodal.audioFpsOf _)
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[String])
    // the exact invariance claim, kernel-level: a polarity flip keeps
    // the ENTIRE fingerprint set (energies are exactly invariant)
    val inverted = fpsOf.keys.filter(id =>
      id >= 4000000L && id < 5000000L).toSeq
    assert(inverted.nonEmpty, "fixture must plant inverted re-masters")
    inverted.foreach { v =>
      assert(fpsOf(v) === fpsOf(v - 4000000L),
        s"inverted $v must keep its base's exact fingerprint set")
    }
    // expected pairs, re-derived from ground truth + the documented
    // semantics (corpus-relative stop prune, containment >= 0.6)
    val thr = Multimodal.audioFpDfThreshold(nCorpus)
    val df = fpsOf.values.toSeq.flatten.groupBy(identity)
      .map { case (fp, v) => fp -> v.size.toLong }
    def rare(id: Long): Set[String] = fpsOf(id).filter(df(_) <= thr)
    def expectPair(b: Long, v: Long): Boolean = {
      val common = (rare(b) & rare(v)).size.toLong
      val least = math.min(fpsOf(b).size, fpsOf(v).size).toLong
      least > 0 && common * 1000000L / least >= 600000L
    }
    val pairs = Multimodal.audioGainNearDups(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    inverted.filter(v => expectPair(v - 4000000L, v)).foreach { v =>
      assert(pairs.contains((v - 4000000L, v)),
        s"planted inverted pair (${v - 4000000L}, $v) missed")
    }
    // half-gain re-masters: the relative profile is NEAR-invariant
    // (floor-halving perturbs each frame energy by O(1/s)), so recall
    // is a fixture-pinned empirical result, asserted against the same
    // ground-truth rule — not claimed as an invariant
    val half = fpsOf.keys.filter(_ >= 5000000L).toSeq
    assert(half.nonEmpty, "fixture must plant half-gain re-masters")
    val expectedHalf = half.filter(v => expectPair(v - 5000000L, v))
    assert(expectedHalf.nonEmpty,
      "fixture must make at least one half-gain re-master eligible")
    expectedHalf.foreach { v =>
      assert(pairs.contains((v - 5000000L, v)),
        s"planted half-gain pair (${v - 5000000L}, $v) missed")
    }
    // the counterfactual: a re-MASTER rewrites every payload byte, so
    // q156's content hash and q157's content-defined blocks share
    // NOTHING — only the energy-profile fingerprints can pair it
    val blocks = corpus.withColumnRenamed("media_id", "doc_id")
      .withColumn("modality", lit("audio"))
      .as[Multimodal.MediaRow].mapPartitions(Multimodal.decode _)
      .collect().map(f => f.doc_id -> f.block_hashes.toSet).toMap
    val probed = inverted.filter(v => blocks(v - 4000000L).nonEmpty)
    assert(probed.nonEmpty, "fixture must carry block-bearing audio")
    probed.foreach { v =>
      assert(blocks(v).intersect(blocks(v - 4000000L)).isEmpty,
        s"inverted $v must share NO content blocks with its base")
    }
  }

  test("raster average-hash kernel: mean-relative bits from real " +
    "pixels, exact invariance under an exposure halving, and the " +
    "resolution/garbage floors") {
    def pgm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] =
      (s"P5\n$w $h\n255\n").getBytes ++
        (0 until h).flatMap(y => (0 until w).map(x => px(y, x).toByte))
    // 16×16, left half dark (10), right half bright (200): cell means
    // are 10/200, global mean 105 → exactly the right-half bits set
    val split = pgm(16, 16, (_, x) => if (x < 8) 10 else 200)
    val expected = 0xF0F0F0F0F0F0F0F0L
    assert(Multimodal.rasterAHashOf(split) === Some(expected))
    // a −1-stop exposure re-master (every pixel halved): 5/100,
    // mean 52 — the SAME bits, though every payload byte changed
    val halved = pgm(16, 16, (_, x) => if (x < 8) 5 else 100)
    assert(Multimodal.rasterAHashOf(halved) === Some(expected))
    // sub-8×8 rasters are below the grid's resolution; garbage is T5
    assert(Multimodal.rasterAHashOf(pgm(7, 16, (_, _) => 9)).isEmpty)
    assert(Multimodal.rasterAHashOf("not a raster".getBytes).isEmpty)
    // HOSTILE headers must emit nothing, never crash or index out of
    // bounds (r10 ADVICE): dims whose product wraps a Long negative,
    // a digit run long enough to overflow the accumulator itself,
    // zero edges, and edges past the 2^20 plausibility cap
    assert(Multimodal.rasterAHashOf(
      "P5\n3037000500 3037000500\n255\n".getBytes ++
        Array.fill[Byte](64)(1)).isEmpty,
      "w*h Long-overflow header must be rejected")
    assert(Multimodal.rasterAHashOf(
      ("P5\n99999999999999999999999999 16\n255\n").getBytes ++
        Array.fill[Byte](64)(1)).isEmpty,
      "digit-run accumulator overflow must be rejected")
    assert(Multimodal.rasterAHashOf(
      "P5\n0 16\n255\n".getBytes ++ Array.fill[Byte](64)(1)).isEmpty)
    assert(Multimodal.rasterAHashOf(
      s"P5\n${1 << 21} 16\n255\n".getBytes ++
        Array.fill[Byte](64)(1)).isEmpty,
      "edges past the 2^20 cap must be rejected before the w*h bound")
    // the same guard protects the q159 thumbnail kernel
    val hostile = Multimodal.rasterDecode(Iterator(
      Multimodal.RasterRow(1L,
        "P5\n3037000500 3037000500\n255\n".getBytes ++
          Array.fill[Byte](64)(1)))).toSeq
    assert(hostile.head.width === 0L && hostile.head.thumb_hex === "")
  }

  test("png codec: a real zlib/filtered roundtrip recovers every " +
    "pixel through all five filter types, and hostile containers " +
    "emit nothing") {
    val px = (y: Int, x: Int) => (y * 31 + x * 7 + 3) % 256
    // 11×7: rows exercise filters 0,1,2,3,4,0,1
    val p = Multimodal.pngOf(11, 7, px)
    // the container is genuinely compressed and chunked: two IDATs
    assert(new String(p, 12, 4, "US-ASCII") === "IHDR")
    val decoded = Multimodal.pngGrayOf(p)
    assert(decoded.isDefined, "a real PNG must decode")
    val (w, h, pix) = decoded.get
    assert((w, h) === ((11L, 7L)))
    for (y <- 0 until 7; x <- 0 until 11)
      assert((pix(y * 11 + x) & 0xFF) === px(y, x),
        s"pixel ($y, $x) must survive the filter/deflate roundtrip")
    // single-row and single-column edges still roundtrip
    val thin = Multimodal.pngOf(1, 9, (y, _) => (y * 40) % 256)
    assert(Multimodal.pngGrayOf(thin).exists(_._3.length === 9))
    // hostile arms, each must emit nothing rather than crash (T5):
    assert(Multimodal.pngGrayOf("not a png".getBytes).isEmpty)
    // truncated mid-IDAT (the inflate cannot fill h*(w+1) bytes)
    assert(Multimodal.pngGrayOf(p.take(p.length - 20)).isEmpty)
    // a color-type-2 (RGB) IHDR must be rejected, not mis-decoded
    val rgb = p.clone(); rgb(8 + 8 + 9) = 2
    assert(Multimodal.pngGrayOf(rgb).isEmpty)
    // implausible dims: w forged past the 2^20 cap
    val big = p.clone()
    big(16) = 0x7F.toByte // IHDR width high byte
    assert(Multimodal.pngGrayOf(big).isEmpty)
    // the ZIP-BOMB shape: in-cap edges whose decoded budget (h·(w+1))
    // dwarfs the tiny payload must be rejected BEFORE the inflate
    // target allocates (2^19 × 2^19 ≈ 2^38 filtered bytes from a
    // <1 KB container)
    val bomb = p.clone()
    bomb(17) = 0x08.toByte; bomb(18) = 0x00.toByte; bomb(19) = 0x00.toByte
    bomb(21) = 0x08.toByte; bomb(22) = 0x00.toByte; bomb(23) = 0x00.toByte
    assert(Multimodal.pngGrayOf(bomb).isEmpty,
      "a zip-bomb IHDR must emit nothing, not allocate the target")
    // the FDICT stall (ADVICE r11, high): a zlib header with the
    // preset-dictionary bit set makes Inflater return 0 forever with
    // finished()==false and needsInput()==false — the decode must
    // treat needsDictionary() as a stall and reject, not spin the
    // executor. CMF=0x78 FLG=0x20 keeps (CMF·256+FLG) % 31 == 0 so
    // the header itself is VALID zlib — only the dictionary demand
    // (illegal in PNG streams) distinguishes it.
    val fdict = p.clone()
    var ci = 8
    var patched = false
    while (!patched && ci + 8 <= fdict.length) {
      val len = ((fdict(ci) & 0xFF) << 24) | ((fdict(ci + 1) & 0xFF) << 16) |
        ((fdict(ci + 2) & 0xFF) << 8) | (fdict(ci + 3) & 0xFF)
      if (new String(fdict, ci + 4, 4, "US-ASCII") == "IDAT") {
        fdict(ci + 8) = 0x78.toByte; fdict(ci + 9) = 0x20.toByte
        patched = true
      } else ci += 8 + len + 4
    }
    assert(patched, "fixture must contain an IDAT to patch")
    // run on a daemon thread with a timed join: a regression here is
    // an INFINITE inflate loop no interrupt can break, so the test
    // must fail by timeout instead of hanging the suite
    @volatile var fdictRes: Option[Option[(Long, Long, Array[Byte])]] = None
    val fdictT = new Thread(() => {
      fdictRes = Some(Multimodal.pngGrayOf(fdict))
    })
    fdictT.setDaemon(true); fdictT.start(); fdictT.join(30000)
    assert(fdictRes.contains(None),
      "an FDICT zlib header must reject as a stall, never hang")
    // the q166 kernel thumb equals the q159 kernel thumb for the
    // same pixels — ONE box-filter implementation behind two codecs
    val viaPgm = Multimodal.rasterDecode(Iterator(Multimodal.RasterRow(
      7L, ("P5\n11 7\n255\n").getBytes ++
        (0 until 7).flatMap(y => (0 until 11).map(x =>
          px(y, x).toByte))))).next()
    val viaPng = Multimodal.pngGrayOf(p).map { case (pw, ph, pp) =>
      (pw, ph, pp) }.get
    assert((viaPng._1, viaPng._2) === ((viaPgm.width, viaPgm.height)))
    // container-agnostic signature (q167's kernel claim): the SAME
    // pixels produce the SAME average hash whether they arrive as a
    // raw P5 or as a zlib PNG — a re-container cannot evade the gate
    // (16×16: above the 8×8 signature floor)
    val px16 = (y: Int, x: Int) => (y * 13 + x * 29 + 5) % 256
    val png16 = Multimodal.pngOf(16, 16, px16)
    val pgm16 = ("P5\n16 16\n255\n").getBytes ++
      (0 until 16).flatMap(y => (0 until 16).map(x => px16(y, x).toByte))
    assert(Multimodal.rasterAHashAnyOf(png16).isDefined)
    assert(Multimodal.rasterAHashAnyOf(png16) ===
      Multimodal.rasterAHashAnyOf(pgm16))
  }

  test("jpeg codec: the JDK ImageIO roundtrip recovers every pixel " +
    "within a tight bound through a REAL DCT/Huffman encode, dims " +
    "exactly, and hostile containers emit nothing") {
    val px = (y: Int, x: Int) => (y * 5 + x * 3 + 7) % 256
    val p = Multimodal.jpegOf(24, 17, px)
    assert((p(0) & 0xFF) === 0xFF && (p(1) & 0xFF) === 0xD8,
      "the fixture must be a genuine JPEG container")
    val (w, h, pix) = Multimodal.jpegGrayOf(p).get
    assert((w, h) === ((24L, 17L)), "dims must parse exactly")
    // lossy but BOUNDED: encoder and decoder are independent library
    // paths, so a near-identity roundtrip pins the real decode
    var maxErr = 0
    for (y <- 0 until 17; x <- 0 until 24)
      maxErr = math.max(maxErr,
        math.abs((pix(y * 24 + x) & 0xFF) - px(y, x)))
    assert(maxErr <= 24, s"reconstruction error $maxErr exceeds q168's bound")
    assert(maxErr > 0,
      "a zero-error roundtrip would mean the codec was bypassed — " +
        "JPEG quantization is real")
    // hostile arms (T5): garbage, truncation mid-entropy-stream, and
    // a forged non-JPEG signature all emit nothing
    assert(Multimodal.jpegGrayOf("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.jpegGrayOf(p.take(p.length / 2)).isEmpty)
    val forged = p.clone(); forged(0) = 0x00
    assert(Multimodal.jpegGrayOf(forged).isEmpty)
    // forged 65500×65500 SOF dims (4.3G pixels from a 500-byte
    // container): the header-only dims gate must reject BEFORE
    // ImageIO allocates the raster
    val sof = (0 until p.length - 1).find(i =>
      (p(i) & 0xFF) == 0xFF && (p(i + 1) & 0xFF) == 0xC0).get
    val bombJ = p.clone()
    bombJ(sof + 5) = 0xFF.toByte; bombJ(sof + 6) = 0xDC.toByte // h
    bombJ(sof + 7) = 0xFF.toByte; bombJ(sof + 8) = 0xDC.toByte // w
    assert(Multimodal.jpegGrayOf(bombJ).isEmpty,
      "forged giant SOF dims must emit nothing, not allocate 4.3G px")
  }

  test("jpeg codec runs with NO disk cache: decode and encode work " +
    "even when ImageIO's file cache is globally enabled and pointed " +
    "at a dangling directory (the r11 weak item — per-row temp files " +
    "in a mapPartitions hot path, and a hard failure on a full or " +
    "read-only tmpdir)") {
    import javax.imageio.ImageIO
    val px = (y: Int, x: Int) => (y * 5 + x * 3 + 7) % 256
    val prevUse = ImageIO.getUseCache
    val prevDir = ImageIO.getCacheDirectory
    // a directory that VALIDATES at set time then stops existing: any
    // code path that touches FileCacheImageInputStream/OutputStream
    // throws on temp-file creation (permission bits can't carry this
    // arm — the suite runs as root, which bypasses them)
    val gone = Files.createTempDirectory("graft-imageio-gone").toFile
    try {
      ImageIO.setUseCache(true)
      ImageIO.setCacheDirectory(gone)
      assert(gone.delete(), "the cache dir must be dangling for the arm")
      val p = Multimodal.jpegOf(24, 17, px)
      val decoded = Multimodal.jpegGrayOf(p)
      assert(decoded.isDefined,
        "the kernel must decode through a MEMORY-cached stream — a " +
          "FileCache stream would throw here and T5 would silently " +
          "drop a VALID image")
      assert(decoded.get._1 === 24L && decoded.get._2 === 17L)
    } finally {
      ImageIO.setUseCache(prevUse)
      ImageIO.setCacheDirectory(prevDir)
      gone.delete()
    }
  }

  test("container-agnostic signature across all THREE codecs: the " +
    "same robust pixels produce the same average hash as raw P5, " +
    "zlib PNG, and lossy JPEG — no re-container evades the gate") {
    // per-cell rails (220/30) with exact 5×5 cells at 40×40: the
    // margins dwarf the JPEG codec's measured error, so even the
    // LOSSY arm reproduces the hash exactly (the q169 determinism
    // contract)
    val bits = 0x5A3C96E1D2B4780FL
    val px = (y: Int, x: Int) =>
      if ((bits & (1L << ((y / 5) * 8 + (x / 5)))) != 0L) 220 else 30
    val pgm = ("P5\n40 40\n255\n").getBytes ++
      (0 until 40).flatMap(y => (0 until 40).map(x => px(y, x).toByte))
    val png = Multimodal.pngOf(40, 40, px)
    val jpg = Multimodal.jpegOf(40, 40, px)
    val viaPgm = Multimodal.rasterAHashAnyOf(pgm)
    assert(viaPgm.contains(bits),
      "the per-cell rail image's ahash must BE the planted word")
    assert(Multimodal.rasterAHashAnyOf(png) === viaPgm)
    assert(Multimodal.rasterAHashAnyOf(jpg) === viaPgm,
      "a lossy re-container must produce the identical perceptual " +
        "hash on margin-robust pixels")
  }

  test("the raster perceptual CORPUS index is container-agnostic " +
    "(r12 weak item): it carries signatures for the PNG and JPEG " +
    "corpus arms, the PNG arm's hash equals its P5 pixel twin's, " +
    "and the JPEG arm's hash IS the planted corpus word") {
    val s = spark
    val idx = Multimodal.rasterAHashIdx(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pngIds = idx.keys.filter(id => id >= 8100000L && id < 8200000L)
    val jpgIds = idx.keys.filter(id => id >= 8200000L && id < 8300000L)
    assert(pngIds.nonEmpty, "the corpus index must carry the PNG arm")
    assert(jpgIds.nonEmpty, "the corpus index must carry the JPEG arm")
    // the JPEG arm's decoded ahash is the planted word EXACTLY (the
    // q169 rails/popcount determinism contract, now on the CORPUS)
    jpgIds.foreach { rid =>
      val id = rid - 8200000L
      assert(idx(rid) === Multimodal.jpegCorpusWord(id),
        s"JPEG corpus arm $rid must hash to its planted word")
    }
    // the PNG arm's hash equals the SAME pixels hashed as raw P5 —
    // the container contributes nothing to the signature
    pngIds.take(8).foreach { rid =>
      val id = rid - 8100000L
      val w = (9 + id % 16).toInt; val h = (9 + id % 12).toInt
      val hdr = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val pix = (0 until h).flatMap(y => (0 until w).map(x =>
        ((id * 53 + y.toLong * (7 + id % 17) + x.toLong * (13 + id % 19)
          + y.toLong * x * (3 + id % 23)) % 256).toByte))
      assert(Multimodal.rasterAHashOf(hdr ++ pix) === Some(idx(rid)),
        s"PNG corpus arm $rid must hash as its P5 twin")
    }
  }

  test("raster perceptual dedup recall: planted exposure re-masters " +
    "pair with their base within Hamming 1 (and neither the payload " +
    "bytes nor the q159 resample bytes could)") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val corpus = Multimodal.rasterVariantTable(s, sf)
      .withColumnRenamed("raster_id", "doc_id")
      .as[Multimodal.RasterRow].collect()
      .map(r => r.doc_id -> r.payload).toMap
    val hashOf = corpus.flatMap { case (id, p) =>
      Multimodal.rasterAHashOf(p).map(id -> _)
    }
    // the %6 exposure re-masters only — the PNG/JPEG corpus arms live
    // at +8.1M/+8.2M and carry their own imagery, not a re-master
    val variants =
      hashOf.keys.filter(v => v >= 8000000L && v < 8100000L).toSeq
    assert(variants.nonEmpty, "fixture must plant exposure re-masters")
    val pairs = Multimodal.rasterPerceptualDups(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground-truth expectation: variant pairs with its base iff the
    // two hashes sit within Hamming 1 (banding is lossless there by
    // the pigeonhole bound, and the fixture plants no stop buckets)
    variants.foreach { v =>
      val d = java.lang.Long.bitCount(hashOf(v) ^ hashOf(v - 8000000L))
      if (d <= 1)
        assert(pairs.contains((v - 8000000L, v)),
          s"planted exposure pair (${v - 8000000L}, $v) at d=$d missed")
    }
    val recalled = variants.count(v =>
      pairs.contains((v - 8000000L, v)))
    assert(recalled * 100 >= variants.size * 90,
      s"fixture-pinned recall regressed: $recalled/${variants.size}")
    // the counterfactual, BYTE level: the re-master shares essentially
    // no payload bytes, and even the q159 box-filter output differs
    // (the averages halve) — only the mean-relative bit pattern pairs
    val v0 = variants.find(v =>
      pairs.contains((v - 8000000L, v))).get
    val b0 = v0 - 8000000L
    assert(!java.util.Arrays.equals(corpus(v0), corpus(b0)))
    def thumb(id: Long): String =
      Multimodal.rasterDecode(Iterator(
        Multimodal.RasterRow(id, corpus(id)))).next().thumb_hex
    assert(thumb(v0) !== thumb(b0),
      "the resample bytes must differ — resample-byte equality " +
        "provably cannot pair an exposure re-master")
  }

  test("observed write: metrics harvested from the write's single pass") {
    val out = Files.createTempDirectory("graft_obs").toString + "/us"
    val m = graft.observe.Metrics.observedWrite(spark, sf, out)
    val written = spark.read.parquet(out)
    assert(m("row_count") === written.count())
    // the observed sum matches a recomputation over the written result
    val recomputed = written
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("c_acctbal"), 2)).head().getDouble(0)
    assert(m("sum_acctbal") === recomputed)
  }

  test("access lineage: the scan relation reports pruned columns and " +
    "pushed filters, zero jobs") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 30)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("s"))
      .join(graft.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey")).limit(5),
        col("l_returnflag").isNotNull, "left_outer")
    val rows = graft.observe.Metrics.accessLineage(df).collect()
    val byTable = rows.map(r => r.getString(0) ->
      (r.getSeq[String](1), r.getSeq[String](3))).toMap
    assert(byTable.keySet === Set("lineitem.parquet", "orders.parquet"))
    val (liCols, liFilters) = byTable("lineitem.parquet")
    assert(liCols === Seq("l_extendedprice", "l_quantity", "l_returnflag"),
      s"lineitem scan must be pruned to the 3 used columns: $liCols")
    assert(liFilters.exists(_.contains("l_quantity")),
      s"the quantity predicate must reach the scan: $liFilters")
    assert(byTable("orders.parquet")._1 === Seq("o_orderkey"))
  }

  test("plan lint: flags cartesian, unpartitioned window, unpushed " +
    "filter; a disciplined query lints clean of errors") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.observe.Lint.planLint(df).collect().map(_.getString(0)).toSet
    val a = Seq(1, 2).toDF("x")
    val b = Seq(3, 4).toDF("y")
    assert(rules(a.crossJoin(b)).contains("broadcast-nested-loop") ||
      rules(a.crossJoin(b)).contains("cartesian-product"))
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(rules(a.crossJoin(b)).contains("cartesian-product"))
    finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(rules(a.withColumn("r",
      row_number().over(Window.orderBy(col("x")))))
      .contains("single-partition-window"))
    // a predicate parquet cannot evaluate: nothing reaches the reader
    val li = graft.Tables.load(spark, sf, "lineitem")
    assert(rules(li.filter(length(col("l_returnflag")) > 3)
      .select(col("l_orderkey"))).contains("filter-not-pushed"))
    // full-width scan: selecting every column of a wide relation
    assert(rules(li).contains("full-width-scan"))
    assert(!rules(li.select(col("l_orderkey"), col("l_quantity")))
      .contains("full-width-scan"),
      "a pruned scan must not be flagged full-width")
    // the flagship query: broadcast dim join, pushed filters — no
    // error-severity findings
    val clean = graft.observe.Lint.planLint(
      graft.ops.Relational.flagship(spark, sf)).collect()
    assert(!clean.exists(_.getString(1) === "error"),
      s"flagship must lint clean: ${clean.mkString(";")}")
  }

  test("lint: unbounded-in-row-expansion fires on the self-quadratic " +
    "transform shape; linear self-zips and cross-array nesting stay " +
    "clean") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.observe.Lint.planLint(df).collect().map(_.getString(0)).toSet
    val arr = Seq((1L, Seq(1L, 2L, 3L))).toDF("k", "a")
    // the quadratic pair-emission shape: per element, iterate the own
    // array's tail
    val quad = arr.select(explode(expr(
      "flatten(transform(a, (x, i) -> " +
        "transform(slice(a, i + 2, size(a)), y -> x + y)))")).as("p"))
    assert(rules(quad).contains("unbounded-in-row-expansion"),
      s"the self-quadratic transform must be flagged: ${rules(quad)}")
    // linear: zip the array against its own tail (adjacent pairs)
    val lin = arr.select(explode(expr(
      "arrays_zip(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1))"))
      .as("p"))
    assert(!rules(lin).contains("unbounded-in-row-expansion"),
      "a linear self-zip must not be flagged")
    // nesting over a DIFFERENT array is a plain cross product of two
    // bounded arrays, not self-quadratic
    val two = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .select(expr("transform(a, x -> transform(b, y -> x + y))").as("m"))
    assert(!rules(two).contains("unbounded-in-row-expansion"),
      "cross-array nesting must not be flagged")
    // the executed-plan mode sees the same hazard through the noop
    // write + AQE-final plan unwrap
    assert(graft.observe.Lint.executedPlanLint(quad).collect()
      .map(_.getString(0)).contains("unbounded-in-row-expansion"),
      "executedPlanLint must lint the AQE-final plan")
  }

  test("lint: single-partition-window severity walks only the unary " +
    "input chain — a limit below one side of a join does not bound " +
    "the join's output") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def sev(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.observe.Lint.planLint(df).collect()
        .filter(_.getString(0) == "single-partition-window")
        .map(_.getString(1)).toSet
    val big = spark.range(1000).toDF("x")
    // limit directly on the input chain: bounded by a constant → info
    assert(sev(big.limit(5)
      .withColumn("r", row_number().over(Window.orderBy(col("x")))))
      === Set("info"))
    // aggregate on the input chain: bounded by the group grain → warn
    assert(sev(big.groupBy((col("x") % 10).as("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(Window.orderBy(col("n")))))
      === Set("warn"))
    // a limit below ONE side of a join bounds that side only; the
    // join output is unbounded — must stay error (the subtree-exists
    // formulation wrongly downgraded exactly this shape)
    val dim = spark.range(10).toDF("x").limit(5)
    assert(sev(big.join(dim, "x")
      .withColumn("r", row_number().over(Window.orderBy(col("x")))))
      === Set("error"))
    // a rank-filter WindowGroupLimit bounds rows PER KEY — k × #keys
    // in total, still corpus-scaling — so it must NOT downgrade the
    // GLOBAL-window rule (it is a bounded case only for the
    // partitioned-window rule, whose unit of concern is one partition)
    assert(sev(big
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("x") % 100).orderBy(col("x"))))
      .filter(col("rn") <= 1)
      .withColumn("r", row_number().over(Window.orderBy(col("x")))))
      === Set("error"))
  }

  test("lint: unbounded-window-partition fires on the per-source " +
    "running-sum shape; rank-filtered and aggregate-fed windows " +
    "downgrade to info; bounded sliding frames stay clean") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def hits(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.observe.Lint.planLint(df).collect()
        .filter(_.getString(0) == "unbounded-window-partition")
        .map(_.getString(1)).toSet
    val d = graft.Tables.load(spark, sf, "documents")
    // the planted q149/q85 shape the round-7 verdict graded weak: a
    // full-history running sum partitioned by source over the raw
    // corpus — one task per source holds the source's whole history
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assert(hits(d
      .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
      .withColumn("cum", sum(col("n_tok")).over(w))) === Set("warn"))
    // a rank + filter plans a WindowGroupLimit below the window —
    // every partition pre-truncated to k rows → info
    val wr = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    assert(hits(d.withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 1)) === Set("info"))
    // window over an upstream aggregate: partition rows bounded by
    // the group grain → info
    assert(hits(d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("source")).orderBy(col("lang"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      === Set("info"))
    // a bounded sliding frame depends on a constant neighborhood —
    // shardable without the two-pass machinery, never fires
    assert(hits(d.withColumn("m", avg(col("n_chars")).over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(-3, 0)))) === Set.empty)
    // the fixed q85/q149 two-pass windows partition by (source, SHARD)
    // — bounded by construction but statically indistinguishable from
    // a low-cardinality key, so they carry allowlist entries below and
    // PlanSpec pins the >= 2-column partition spec directly
  }

  test("lint: opaque-group-state marks every typed-API grouped " +
    "operator — the E148 shape whose group-slice buffer hid from " +
    "every plan-shape rule through round 8") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def hits(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      graft.observe.Lint.planLint(df).collect()
        .filter(_.getString(0) == "opaque-group-state")
        .map(r => (r.getString(1), r.getString(2))).toSet
    // the planted E148 batch twin: group by source (a low-cardinality
    // key the lambda erases — the grouping attribute is a generated
    // `value` column), fold the slice in a closure. The plan shows
    // exchange + sort + MapGroups and NOTHING of what the closure does
    // with its iterator — exactly where the r8 `rows.toSeq.sortBy`
    // buffer lived.
    val planted = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups((src, rows) => (src, rows.map(_._3).sum))
      .toDF("source", "total")
    val got = hits(planted)
    assert(got.size === 1 && got.head._1 === "info",
      s"the typed grouped op must surface exactly once, info-grade: $got")
    assert(got.head._2.contains("MapGroups"),
      "the finding must point at the grouped-state node itself")
    // the relational twin carries no closure — the agg-buffer/window
    // rules see everything there, so this rule stays silent
    assert(hits(graft.Tables.load(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))) === Set.empty)
  }

  test("lint: unbounded-agg-buffer fires on the exact-percentile and " +
    "collect shapes over raw input; bounded inputs downgrade to info; " +
    "sketch aggregates stay clean") {
    import org.apache.spark.sql.functions._
    def hits(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      graft.observe.Lint.planLint(df).collect()
        .filter(_.getString(0) == "unbounded-agg-buffer")
        .map(r => (r.getString(0), r.getString(1))).toSet
    val li = graft.Tables.load(spark, sf, "lineitem")
    // the q120-shaped plant: exact percentile over a raw corpus column —
    // the buffer holds every distinct price per group
    assert(hits(li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.2, 0.4, 0.6, 0.8))")
        .as("bs"))) === Set(("unbounded-agg-buffer", "warn")))
    // collect_list over raw input: same class
    assert(hits(li.groupBy(col("l_returnflag"))
      .agg(collect_list(col("l_extendedprice")).as("vs")))
      === Set(("unbounded-agg-buffer", "warn")))
    // input bounded by an upstream aggregate (the group grain) → info
    assert(hits(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(n, 0.5)").as("med")))
      === Set(("unbounded-agg-buffer", "info")))
    // input bounded by a limit → info
    assert(hits(li.limit(10).groupBy(col("l_returnflag"))
      .agg(collect_set(col("l_extendedprice")).as("vs")))
      === Set(("unbounded-agg-buffer", "info")))
    // the mergeable sketch — the migration target — never fires
    assert(hits(li.groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p")))
      === Set.empty)
    // plain bounded aggregates never fire
    assert(hits(li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n")))
      === Set.empty)
  }

  // ONE warn allowlist for BOTH lint sweeps (static and AQE-final):
  // the two modes see the same deliberate patterns, and a divergence
  // would mean an AQE re-plan changed a hazard class — which should
  // fail loudly, not be papered over by a second list.
  //  - broadcast-nested-loop: model-sized broadcast sides (query
  //    vectors, centroids, 1-row totals/stats) streamed against
  //    once — PlanSpec pins the same set;
  //  - unbounded-in-row-expansion: in-row pair/containment emission
  //    over arrays whose element count is capped UPSTREAM — shingle
  //    vocabularies bounded by construction (q33/q68/q88), the
  //    admission-capped baskets (q137, see admittedBaskets), and
  //    q142's absolute winnowDfCap;
  //  - single-partition-window: q70's rolling window runs over the
  //    day-grain pre-aggregated relation — one task over O(days)
  //    rows, which is the documented contract.
  //  - unbounded-agg-buffer, each site's buffer bound spelled out:
  //    q51: collect-to-set of market segments — a 5-value catalog
  //      domain that cannot grow with the corpus;
  //    q63: the members collect_list IS the query's deliverable
  //      (cluster → member list); lists are dup-cluster-sized, and
  //      clusters derive from the Jaccard-verified pair graph whose
  //      emission is already stop-threshold-capped;
  //    q78: exact percentile over n_chars — document lengths live in
  //      a fixed human-scale range (≤ ~10⁶ distinct values), so the
  //      value→count buffer cannot grow with the corpus (see the
  //      lengthOutliers scaladoc);
  //    q88: collect_set of SOURCE names per shingle — bounded by the
  //      source catalog, not the corpus;
  //    q142: collect_set(doc_id) per fingerprint, collected ONLY
  //      after the broadcast stop-list anti-join — buffer ≤ the
  //      absolute winnowDfCap (256) by construction.
  private val warnAllowlist: Map[String, Set[String]] = Map(
    "broadcast-nested-loop" -> Set(
      "q31_topk_cosine", "q38_ivf_topk", "q39_embed_neardup",
      "q67_tfidf_top_terms", "q83_filtered_topk", "q93_quantized_topk",
      "q98_semantic_dedup", "q99_dsir_selection", "q108_bm25_topk",
      "q109_hybrid_rrf", "q113_random_projection",
      "q118_skew_replicated_join", "q124_hourly_gapfill",
      "q134_copurchase_triangles", "q137_association_rules",
      "q139_source_kl_mix", "q140_mix_temperature",
      "q143_mix_report",
      // q145/q147/q150: the 10 query vectors stream the O(nlist)
      // centroid model once for probe routing — the q38 shape
      "q145_ivf_adc_topk", "q147_residual_ivf_adc_topk",
      "q150_ivf_multiprobe_topk",
      // q153: the recall AUDIT's exact leg streams the corpus once
      // against the broadcast query handful (the q31 shape) — the
      // audit's documented cost
      "q153_ann_recall_report"),
    "unbounded-in-row-expansion" -> Set(
      "q33_jaccard_pairs", "q68_containment_pairs",
      "q88_contamination_matrix", "q137_association_rules",
      "q142_winnowing_pairs"),
    "single-partition-window" -> Set("q70_rolling_revenue"),
    //  - unbounded-window-partition: every allowlisted site's partition
    //    key INCLUDES a shard that bounds the partition by construction
    //    (statically indistinguishable from a low-cardinality key, so
    //    the rule must warn; PlanSpec pins the >= 2-column spec):
    //    q81: running pack offsets per (lang, SHARD) — the shard is a
    //      Knuth hash mod packingShards, so no partition exceeds
    //      ~corpus/(shards·langs) rows;
    //    q85/q149/q151: the two-pass cumulative cutoff windows per
    //      (source, RANGE-SHARD) — each partition is one
    //      skew-adaptively-sampled range shard of one source
    //      (~corpus/shards), and the global sum is recovered from
    //      broadcast shard offsets (the E126 discipline; the q149
    //      shape this rule was built to catch is planted in its own
    //      test above). q151 runs the same cutoff over its
    //      curated-train subset.
    "unbounded-window-partition" -> Set(
      "q81_sequence_packing", "q85_data_mixture", "q149_mix_extraction",
      "q151_curation_mix_pipeline"),
    "unbounded-agg-buffer" -> Set(
      "q51_segments_per_nation", "q63_dup_clusters",
      "q78_length_outliers", "q88_contamination_matrix",
      "q142_winnowing_pairs",
      // q160: the corpus block-SET fold (collect_set per media) —
      // bounded at blockCap = 16 elements per group BY CONSTRUCTION
      // (the decode stage never emits more blocks per media row),
      // which a plan-shape rule cannot see
      "q160_media_admission"),
    // duplicate-source-scan: each entry is a DELIBERATE re-scan —
    // q22: four narrow one-column scans read the same bytes as one
    //   four-column scan (columnar), buying O(Σ distinct) shuffles;
    // q67/q92/q99: tf/df (resp. per-lang models, two bigram models)
    //   are different GRAINS of a map-only explode — re-running the
    //   scan+explode is strictly cheaper than materializing a
    //   corpus-sized token relation at any scale, and the model
    //   sides are broadcast-sized aggregates;
    // q108/q109: the re-scanned source is the persisted postings
    //   ARTIFACT (pre-aggregated, pruned), not the corpus — df
    //   stats, postings probe and totals are three small reads;
    // q116: base ⋈ changes merge + the snapshot compare read the
    //   base table per the CDC contract;
    // q118: the heavy-key detection pass plus the disjoint
    //   light/heavy legs partition one scan three ways — the
    //   replicated-join design (materializing the corpus costs
    //   more than the extra pruned scan);
    // q122/q128: blocking self-pair legs (resp. two-side
    //   reconciliation anti legs) are scans of both roles by
    //   construction.
    "duplicate-source-scan" -> Set(
      "q22_profile_lineitem", "q67_tfidf_top_terms",
      "q92_lm_rare_filter", "q99_dsir_selection", "q108_bm25_topk",
      "q109_hybrid_rrf", "q116_cdc_merge",
      "q118_skew_replicated_join", "q122_fuzzy_name_pairs",
      "q128_set_reconciliation",
      // q146: paired reads of two PERSISTED artifacts (never the
      // corpus): the prefix index twice (the two roles of the
      // candidate self-pair join — the q122 blocking-legs shape) and
      // the shingle-set artifact twice (the two verification roles);
      // 2× per source is info-grade, but the allowlist entry stays in
      // case AQE fuses the roles differently at another scale
      "q146_prefix_jaccard_pairs",
      // q153: the recall AUDIT deliberately reads the vector table
      // once per leg it compares — the exact brute-force leg (the
      // audit's documented cost) plus each serve path's
      // candidate-bounded float refine; every leg is either the
      // audit itself or O(queries × k) rows
      "q153_ann_recall_report"),
    "filter-not-pushed" -> Set.empty)

  test("self-lint sweep: every declared query lints free of errors; " +
    "warn findings only on the named allowlist") {
    // the engine holds its own queries to the standard it offers
    // users: planLint over all of SparkEntry.queries. `info` rows
    // (full-width-scan, 2× source scans) are informational by
    // contract; warns gate on the shared [[warnAllowlist]].
    val warnAllowed = warnAllowlist
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val findings = graft.observe.Lint.planLint(fn(spark, sf)).collect()
      findings.foreach { r =>
        val (rule, sev) = (r.getString(0), r.getString(1))
        sev match {
          case "error" => bad += s"$name: ERROR $rule"
          case "warn"
              if !warnAllowed.getOrElse(rule, Set.empty)(name) =>
            bad += s"$name: warn $rule"
          case _ => ()
        }
      }
    }
    assert(bad.isEmpty,
      s"queries with un-allowlisted lint findings:\n${bad.mkString("\n")}")
  }

  test("executed-plan lint sweep: every declared query's AQE-FINAL " +
    "plan — runtime join conversions and skew splits included — is " +
    "free of errors; warns only on the named allowlist") {
    // the static sweep sees the pre-AQE plan; this one executes each
    // query at the fixture SF and lints what actually ran (stage
    // internals traversed through the QueryStageExec wrappers). Same
    // shared [[warnAllowlist]]: AQE may convert a join with a
    // runtime-tiny side into a BNLJ the pre-AQE plan rendered as a
    // sort-merge or hash join, but those sides are model-sized at any
    // SF — already the documented broadcast pattern.
    val warnAllowed = warnAllowlist
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val findings =
        graft.observe.Lint.executedPlanLint(fn(spark, sf)).collect()
      findings.foreach { r =>
        val (rule, sev) = (r.getString(0), r.getString(1))
        sev match {
          case "error" => bad += s"$name: ERROR $rule"
          case "warn"
              if !warnAllowed.getOrElse(rule, Set.empty)(name) =>
            bad += s"$name: warn $rule"
          case _ => ()
        }
      }
    }
    assert(bad.isEmpty,
      s"queries with un-allowlisted AQE-final findings:\n${bad.mkString("\n")}")
  }

  test("task-metrics listener surfaces execution metrics as a relation") {
    graft.observe.Metrics.listen(spark)
    Tables.load(spark, sf, "lineitem").count() // generate some stages
    // listener events are async — poll until the snapshot fills
    val deadline = System.currentTimeMillis() + 10000
    while (graft.observe.Metrics.executionMetrics(spark).isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    val em = graft.observe.Metrics.executionMetrics(spark)
    assert(em.columns.toSeq ===
      Seq("stage_id", "records_read", "bytes_read",
        "shuffle_bytes_written", "bytes_spilled"))
    assert(em.count() > 0)
    assert(em.agg(org.apache.spark.sql.functions.sum("records_read"))
      .head().getLong(0) > 0)
  }

  test("flagship lifecycle: cache → write → count → preview (K1/A2/K4)") {
    val out = Files.createTempDirectory("graft_flagship").toString + "/us"
    val (rowCount, preview) = graft.ops.Relational.flagshipLifecycle(spark, sf, out)
    assert(rowCount > 0)
    assert(preview.size <= 5 && preview.nonEmpty)
    assert(spark.read.parquet(out).count() === rowCount)
  }

  test("compact: fragmented table rewritten into few even files, rows kept") {
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"
    val tidy = s"$base/tidy"
    // fragment orders into 50 small files
    Tables.load(spark, sf, "orders").repartition(50)
      .write.mode("overwrite").parquet(frag)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) === 50)
    val n = spark.read.parquet(frag).count()
    graft.observe.Compact.compact(spark, frag, tidy, targetRows = 1000L)
    val expect = ((n + 999) / 1000).toInt
    assert(parquetFiles(tidy) === expect)
    assert(spark.read.parquet(tidy).count() === n)
    // round-robin compaction: file sizes even within one row of ideal
    val inv = graft.observe.Compact.fileInventory(spark, tidy, "o_orderkey")
    val counts = inv.collect().map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
  }

  test("overwritePartitions: backfill rewrites only its partitions; " +
    "untouched partition files stay byte-identical") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_dpo").toString + "/t"
    val docs = Tables.load(spark, sf, "documents")
    docs.write.partitionBy("lang").parquet(dir)
    def files(lang: String) =
      new java.io.File(s"$dir/lang=$lang").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
    val deBefore = files("de")
    val enBefore = spark.read.parquet(dir)
      .filter(col("lang") === "en").count()
    // backfill: replace ONLY lang=en with a corrected slice
    val fix = docs.filter(col("lang") === "en" && col("doc_id") % 2 === 0)
    graft.observe.Compact.overwritePartitions(spark, dir, "lang", fix)
    assert(files("de") === deBefore,
      "untouched partition files must not change")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("lang") === "en").count() < enBefore)
    assert(after.filter(col("lang") === "en" && col("doc_id") % 2 =!= 0)
      .count() === 0, "the bad rows must be gone from the backfilled slice")
    assert(after.filter(col("lang") === "de").count() ===
      docs.filter(col("lang") === "de").count())
    // the wrapper restores the session's overwrite mode
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode",
      "STATIC").toUpperCase === "STATIC")
  }

  test("clusteredWrite: files hold disjoint key ranges (pruning layout)") {
    val base = Files.createTempDirectory("graft_cluster").toString
    val in = s"$base/in"
    val out = s"$base/out"
    Tables.load(spark, sf, "orders").repartition(8) // destroy any order
      .write.mode("overwrite").parquet(in)
    graft.observe.Compact.clusteredWrite(spark, in, out, 4, Seq("o_orderdate"))
    val inv = graft.observe.Compact.fileInventory(spark, out, "o_orderdate")
      .collect()
    assert(inv.length === 4)
    // ranges must not overlap: each file's min is ≥ the previous max
    inv.sliding(2).foreach {
      case Array(a, b) =>
        val (prevMax, nextMin) = (a.getAs[java.time.LocalDateTime](3),
          b.getAs[java.time.LocalDateTime](2))
        assert(nextMin.compareTo(prevMax) >= 0,
          s"overlap: $nextMin < $prevMax")
      case _ => ()
    }
    assert(spark.read.parquet(out).count() ===
      spark.read.parquet(in).count())
  }

  test("PCM feature kernel (q161): known samples yield the exact " +
    "peak / floor-mean-square / hottest frame, and non-WAV payloads " +
    "decode to zeros (T5)") {
    import graft.ops.Multimodal.{AudioFeatures, MediaRow}
    def wav(rate: Int, samples: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + samples.length * 2)
      bb.put("WAVEfmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(rate); bb.putInt(rate * 2)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(samples.length * 2)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    def decode(p: Array[Byte]): AudioFeatures =
      graft.ops.Multimodal.audioDecode(
        Iterator.single(MediaRow(3L, "audio", p))).next()
    // one partial frame: peak 30000, mean_sq = floor(902000025 / 4)
    val a = decode(wav(8000, Seq(1000, -1000, 30000, 5)))
    assert(a === AudioFeatures(3L, 8000L, 4L, 30000L,
      902000025L / 4, 0L, 902000025L))
    // two frames: the SECOND (frame 1, samples 100..120) carries the
    // loud burst — argmax lands there, not on the long quiet frame
    val quiet = Seq.fill(100)(10)
    val loud = Seq.fill(21)(2000)
    val b = decode(wav(16000, quiet ++ loud))
    assert(b.top_frame === 1L &&
      b.top_frame_energy === 21L * 2000L * 2000L)
    assert(b.peak_abs === 2000L && b.n_samples === 121L)
    // T5: a non-WAV payload yields zeros, never a throw
    assert(decode("not audio".getBytes) ===
      AudioFeatures(3L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("raster box filter (q159): the kernel averages exactly the " +
    "source block of each target pixel, sub-target rasters pass " +
    "through unscaled, and garbage payloads decode to zeros (T5)") {
    import graft.ops.Multimodal.{RasterRow, RasterThumb}
    def decode(p: Array[Byte]): RasterThumb =
      graft.ops.Multimodal.rasterDecode(
        Iterator.single(RasterRow(7L, p))).next()
    def pgm(w: Int, h: Int, px: Seq[Int]): Array[Byte] =
      (s"P5\n$w $h\n255\n".getBytes("UTF-8").toSeq ++
        px.map(_.toByte)).toArray
    // 16×1 strip of known values → thumb 8×1, each target pixel the
    // floor-average of its 2-pixel block
    val strip = (0 until 16).map(i => i * 10 + 1) // 1,11,21,...,151
    val t = decode(pgm(16, 1, strip))
    assert((t.width, t.height, t.thumb_w, t.thumb_h) === (16L, 1L, 8L, 1L))
    val expect = (0 until 8).map { i =>
      val av = (strip(2 * i) + strip(2 * i + 1)) / 2
      f"$av%02X"
    }.mkString
    assert(t.thumb_hex === expect,
      s"box filter must average each 2-px block: ${t.thumb_hex}")
    // sub-target raster: identity, pixels byte-identical
    val tiny = decode(pgm(2, 2, Seq(5, 250, 0, 128)))
    assert((tiny.thumb_w, tiny.thumb_h) === (2L, 2L))
    assert(tiny.thumb_hex === "05FA0080")
    // garbage: quarantine default, never a throw
    val bad = decode("not a raster at all".getBytes("UTF-8"))
    assert(bad === RasterThumb(7L, 0L, 0L, 0L, 0L, ""))
    // truncated pixel section: header promises more bytes than exist
    val trunc = decode(pgm(4, 4, Seq(1, 2, 3)))
    assert(trunc.thumb_hex === "")
  }
}
