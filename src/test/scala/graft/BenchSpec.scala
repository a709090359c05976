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
}
