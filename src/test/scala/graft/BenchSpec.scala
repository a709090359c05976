package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention classifier, pinned on the incident that
  * motivated it: the round-8 driver pass ran the round-1 query set at
  * 1.8× the fingerprint-matched uncontended snapshot while 9.18%
  * hypervisor steal slid under the old hard `steal > 10%` OR-clause —
  * the pass self-reported clean and its numbers were trusted. The
  * verdict is now data-first (current round-1 total vs the stored
  * clean snapshot, gated by that snapshot's own recorded per-query
  * spread), with the hard steal threshold surviving only as a 5%
  * fallback when no clean snapshot exists. Pure function — no Spark. */
class BenchSpec extends AnyFunSuite {

  // the r8local snapshot as stored: total_r1 6.4596 s, median spread
  // 1.6439, contended false
  private val r8Snapshot = Some((6.4596, 1.6439, false))

  test("the r8 incident replayed: 9.18% steal under the old 10% " +
    "threshold, round-1 set 1.8x the clean snapshot -> contended") {
    assert(Bench.contendedVerdict(medianSpread = 1.5, preLoad = 3.197,
      stealPct = 9.18, totalR1 = 11.651, snapshot = r8Snapshot))
  }

  test("a pass inside the snapshot's recorded spread is clean even " +
    "with the same steal reading") {
    assert(!Bench.contendedVerdict(1.3, 1.0, 9.18, 9.0, r8Snapshot))
  }

  test("no matching snapshot falls back to the tightened 5% steal " +
    "threshold") {
    assert(Bench.contendedVerdict(1.3, 1.0, 6.0, 9.0, None))
    assert(!Bench.contendedVerdict(1.3, 1.0, 4.0, 9.0, None))
  }

  test("a snapshot that was itself contended is no reference — the " +
    "fallback applies, not a comparison against hot numbers") {
    assert(!Bench.contendedVerdict(1.3, 1.0, 4.0, 20.0,
      Some((6.46, 1.64, true))))
    assert(Bench.contendedVerdict(1.3, 1.0, 6.0, 20.0,
      Some((6.46, 1.64, true))))
  }

  test("spread floor: a snapshot with spread 1.0 must not flag plain " +
    "measurement noise — the floor is 1.25x") {
    assert(!Bench.contendedVerdict(1.2, 1.0, 0.0, 7.4,
      Some((6.0, 1.0, false))))
    assert(Bench.contendedVerdict(1.2, 1.0, 0.0, 8.0,
      Some((6.0, 1.0, false))))
  }

  test("the whole-pass tripwires still fire on their own: median " +
    "spread above 2x, or a host already loaded at entry") {
    assert(Bench.contendedVerdict(2.5, 1.0, 0.0, 6.0, r8Snapshot))
    assert(Bench.contendedVerdict(1.2, 5.0, 0.0, 6.0, r8Snapshot))
  }

  test("the headline's adjudication record: snapshot_ref names the " +
    "judged-against snapshot with its numbers, r1_clean carries the " +
    "clean basis, and both are null-honest when absent or hot") {
    val (ref, clean) = Bench.adjudicationJson(
      "bench-detail-abc123.json", Some((6.4596, 1.6439, false)))
    assert(ref ===
      """{"file":"bench-detail-abc123.json","total_r1":6.4596,""" +
        """"median_spread":1.6439,"contended":false}""")
    assert(clean === "6.4596")
    // a snapshot that was itself contended is no clean basis
    val (refHot, cleanHot) = Bench.adjudicationJson(
      "bench-detail-abc123.json", Some((6.46, 1.64, true)))
    assert(refHot.contains("\"contended\":true"))
    assert(cleanHot === "null")
    // no snapshot at all
    assert(Bench.adjudicationJson("x", None) === (("null", "null")))
  }

  test("snapshot parse round-trips the detail+headline file shape") {
    val text =
      """{"detail":"materialized","median_spread":1.6438,"pre_load":2.4}""" +
        "\n" +
        """{"metric":"total","total_r1_query_set":6.4595,""" +
        """"contended":false,"value":93.3}"""
    assert(Bench.parseSnapshot(text) === Some((6.4595, 1.6438, false)))
    assert(Bench.parseSnapshot("not a snapshot") === None)
  }

  // ---- per-query outlier gate (r13 verdict task 2) -----------------------

  test("per-query stats parse both shapes: the r13-and-earlier entry " +
    "(min/median/spread) and the current one with appended steal_pct") {
    val old = """"queries_stats":{"q165_raster_admission":{"min":2.23,""" +
      """"median":2.41,"spread":1.12},"q164_raster_phash_dups":""" +
      """{"min":0.43,"median":0.45,"spread":1.09}}"""
    val cur = """"queries_stats":{"q165_raster_admission":{"min":2.23,""" +
      """"median":2.41,"spread":1.12,"steal_pct":3.4}}"""
    assert(Bench.parseSnapshotStats(old) === Map(
      "q165_raster_admission" -> ((2.41, 1.12)),
      "q164_raster_phash_dups" -> ((0.45, 1.09))))
    assert(Bench.parseSnapshotStats(cur) === Map(
      "q165_raster_admission" -> ((2.41, 1.12))))
    assert(Bench.parseSnapshotStats("no stats here") === Map.empty)
  }

  test("the r13 official pass replayed through the per-query gate " +
    "flags exactly q165: 55.86 s min vs a clean-snapshot 2.41 s " +
    "median, while its normal neighbors pass") {
    // clean r13a builder-pass stats for the raster family (median,
    // spread) and the official driver pass's mins — the incident the
    // gate exists for: E153/E203 judged the PASS clean because only
    // the round-1 set is compared, and the 25x single-query outlier
    // shipped as contended:false with no annotation at all.
    val snap = Map(
      "q164_raster_phash_dups" -> ((0.45, 1.31)),
      "q165_raster_admission" -> ((2.41, 1.12)),
      "q170_raster_admission_decision" -> ((2.10, 1.24)),
      "q175_mixed_corpus_admission" -> ((1.20, 1.40)))
    val mins = Map(
      "q164_raster_phash_dups" -> 0.429,
      "q165_raster_admission" -> 55.861,
      "q170_raster_admission_decision" -> 2.120,
      "q175_mixed_corpus_admission" -> 1.168)
    val out = Bench.outliersVs(mins, snap)
    assert(out.keySet === Set("q165_raster_admission"))
    val (m, gate) = out("q165_raster_admission")
    assert(m === 55.861)
    // gate = median x max(spread, 1.25) = 2.41 x 1.25
    assert(math.abs(gate - 2.41 * 1.25) < 1e-9)
  }

  test("the outlier gate's floors: spread floored at 1.25x, and a " +
    "sub-quarter-second excess is jitter, not an outlier (the " +
    "q102-class sub-150 ms watch items must not alarm)") {
    // spread 1.0 recorded -> the 1.25 floor applies, 1.2x is clean
    assert(Bench.outliersVs(Map("q" -> 3.0),
      Map("q" -> ((2.5, 1.0)))).isEmpty)
    // ratio cleared but absolute excess is 90 ms -> jitter, clean
    assert(Bench.outliersVs(Map("q102_bpe_merges" -> 0.126),
      Map("q102_bpe_merges" -> ((0.086, 1.08)))).isEmpty)
    // both cleared -> flagged
    assert(Bench.outliersVs(Map("q" -> 3.2),
      Map("q" -> ((2.5, 1.0)))).nonEmpty)
    // a query with no snapshot record cannot be judged
    assert(Bench.outliersVs(Map("new_q" -> 60.0), Map.empty).isEmpty)
  }
}
