package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the era-normalized baseline-gate policy (the logic
  * guarding every round's bench artifact — a bug here either hides a
  * real regression or cries wolf on a whole battery). */
class BaselineGateSpec extends AnyFunSuite {

  private def pins(rs: Seq[(String, Double)]): Map[String, Double] =
    rs.map { case (k, _) => k -> 1.0 }.toMap

  test("uniform era drift is forgiven entirely") {
    // every query 1.4x its pin — the exact false-fail scenario the
    // normalization exists for
    val rs = (1 to 20).map(i => s"q$i" -> 1.4)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.eraDrift === 1.4)
    assert(r.warn.isEmpty && r.fail.isEmpty)
    assert(r.gate == "pass")
    r.normRatios.foreach { case (_, n) => assert(math.abs(n - 1.0) < 1e-12) }
  }

  test("a single real regression still fails inside a drifted era") {
    val rs = (1 to 20).map(i => s"q$i" -> 1.4) :+ ("q_bad" -> 3.2)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.eraDrift === 1.4) // one outlier cannot move the median
    assert(r.fail == Seq("q_bad")) // 3.2 / 1.4 = 2.29 > 2
    assert(r.gate == "fail")
  }

  test("a fast era never hides a regression (clamp at 1)") {
    // box faster than pin era: median 0.7; an unnormalized 1.9 ratio
    // would become 2.7 if we divided by 0.7 upward — and a real 2.1x
    // must not be forgiven by dividing by anything < 1
    val rs = (1 to 20).map(i => s"q$i" -> 0.7) :+ ("q_bad" -> 2.1)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.eraDrift === 1.0)
    assert(r.fail == Seq("q_bad"))
  }

  test("unstable pins get the loosened thresholds on normalized ratios") {
    val rs = Seq("q_stable" -> 1.8, "q_noisy" -> 1.8) ++
      (1 to 19).map(i => s"q$i" -> 1.0)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set("q_noisy"))
    assert(r.eraDrift === 1.0)
    assert(r.warn == Seq("q_stable")) // 1.8 in (1.5, 2.0]
    assert(r.fail.isEmpty) // noisy needs > 2.0 to even warn
  }

  test("measurements under the noise floor are never gated, even at a huge ratio") {
    // 0.05 s pin measured at 0.25 s (5x) — still inside scheduler
    // noise; the MEASURED-side floor keeps it silent
    val rs = (1 to 20).map(i => s"q$i" -> 1.0) :+ ("q_tiny" -> 5.0)
    val base = ((1 to 20).map(i => s"q$i" -> 1.0) :+ ("q_tiny" -> 0.05)).toMap
    val r = BaselineGate.adjudicate(rs, base, Set.empty)
    assert(r.fail.isEmpty && r.warn.isEmpty)
    assert(r.gate == "pass")
  }

  test("a 10x regression on a sub-0.3s pin trips the gate (r16 blind spot)") {
    // The VERDICT r16 #1 scenario: q_topk_agg pinned at 0.15 s read
    // ~1.5 s in the driver battery — 10x — and the pin-side floor kept
    // the gate silent. Measured-side floor: 1.5 s clears 0.3 s, the
    // normalized ratio ~10 > 2 → fail.
    val rs = (1 to 20).map(i => s"q$i" -> 1.0) :+ ("q_small_bad" -> 10.0)
    val base = ((1 to 20).map(i => s"q$i" -> 1.0) :+ ("q_small_bad" -> 0.15)).toMap
    val r = BaselineGate.adjudicate(rs, base, Set.empty)
    assert(r.fail == Seq("q_small_bad"))
    assert(r.gate == "fail")
  }

  test("sub-0.3s pin at a warn-zone ratio gates only when measured clears the floor") {
    // 0.15 s pin at 1.9x = 0.285 s measured: under the floor, silent.
    // 0.25 s pin at 1.9x = 0.475 s measured: over the floor, warns.
    val rs = (1 to 20).map(i => s"q$i" -> 1.0) ++
      Seq("q_under" -> 1.9, "q_over" -> 1.9)
    val base = ((1 to 20).map(i => s"q$i" -> 1.0) ++
      Seq("q_under" -> 0.15, "q_over" -> 0.25)).toMap
    val r = BaselineGate.adjudicate(rs, base, Set.empty)
    assert(r.warn == Seq("q_over"))
    assert(r.fail.isEmpty)
  }

  test("extreme uniform drift escalates to warn_era, not silent pass") {
    val rs = (1 to 20).map(i => s"q$i" -> 1.9)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.fail.isEmpty)
    assert(r.gate == "warn_era")
  }

  test("raw lists report what normalization forgave") {
    val rs = (1 to 20).map(i => s"q$i" -> 2.1)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.fail.isEmpty && r.failRaw.size == 20)
    assert(r.gate == "warn_era") // 2.1 > 1.75
  }

  test("correlated half-suite regression cannot self-normalize to a pass") {
    // The ADVICE r11/r12 medium scenario: 85 of 170 pins at 2.2x raw,
    // the rest at 1.0. Median lands at 1.6, so every normalized ratio
    // is 2.2/1.6 = 1.375 < 1.5 — the old gate said "pass" on a battery
    // where HALF the suite doubled. failRaw (85) > 10% of gated pins
    // (170) must escalate.
    val rs = (1 to 85).map(i => s"q_slow$i" -> 2.2) ++
      (1 to 85).map(i => s"q_ok$i" -> 1.0)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.fail.isEmpty)          // normalization still forgives each
    assert(r.failRaw.size == 85)    // but the raw evidence is recorded
    assert(r.gate == "warn_era")    // and the gate refuses to pass
  }

  test("raw total above the hard bound escalates even with low era drift") {
    // Two UNSTABLE heavy pins (10 s each) at 2.9x: under the loosened
    // thresholds 2.9 neither warns-raw-fails (needs > 3) nor fails
    // normalized, 18 cheap flat pins keep the median at 1.0 — yet the
    // battery total is (2*29 + 9) / (2*10 + 9) = 2.31x. Only the
    // total-ratio clause can catch this shape.
    val heavy = Seq("q_h1" -> 2.9, "q_h2" -> 2.9)
    val flat = (1 to 18).map(i => s"q_f$i" -> 1.0)
    val base = (heavy.map { case (k, _) => k -> 10.0 } ++
      flat.map { case (k, _) => k -> 0.5 }).toMap
    val r = BaselineGate.adjudicate(heavy ++ flat, base,
      unstable = Set("q_h1", "q_h2"))
    assert(r.eraDrift === 1.0)
    assert(r.fail.isEmpty && r.failRaw.isEmpty)
    assert(r.gate == "warn_era")
  }

  test("a healthy battery with a couple of raw stragglers still passes") {
    // 2 raw fails out of 40 gated pins (5%) and total well under 2x —
    // the escalation must not cry wolf on ordinary long-tail noise when
    // normalization already adjudicated them as era drift.
    val rs = (1 to 38).map(i => s"q$i" -> 1.4) ++
      Seq("q_t1" -> 2.1, "q_t2" -> 2.1)
    val r = BaselineGate.adjudicate(rs, pins(rs), Set.empty)
    assert(r.eraDrift === 1.4)
    assert(r.fail.isEmpty && r.failRaw.size == 2)
    assert(r.gate == "pass") // 2/40 = 5% <= 10%, total 1.435 < 2
  }

  test("a ratio key without a pin is ignored, not a crash") {
    // adjudicate() is a pure public API: Bench pre-filters to pinned
    // keys, but the function itself must tolerate an unpinned ratio
    // (it contributes to the median but to no gated list)
    val rs = (1 to 10).map(i => s"q$i" -> 1.0) :+ ("q_unpinned" -> 9.9)
    val r = BaselineGate.adjudicate(rs, pins(rs.init), Set.empty)
    assert(!r.fail.contains("q_unpinned") && !r.warn.contains("q_unpinned"))
    assert(r.gate == "pass")
  }

  test("median: odd and even counts, empty ratios default") {
    assert(BaselineGate.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BaselineGate.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    val r = BaselineGate.adjudicate(Nil, Map.empty, Set.empty)
    assert(r.eraDrift === 1.0 && r.gate == "pass")
  }

  test("committed gate record is a FULL-registry run with repo-relative " +
    "evidence (ADVICE r17 medium: a 1-query /tmp-pointing record once " +
    "replaced the real gate and its 'pass' was vacuous)") {
    val f = new java.io.File("bench_gate.json")
    assume(f.exists, "no committed gate record in cwd — driver layout changed")
    val txt = scala.io.Source.fromFile(f).mkString
    def longField(name: String): Option[Long] =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    def strField(name: String): Option[String] =
      s""""$name"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    val n = longField("n_queries").getOrElse(0L)
    // the registry can grow a few queries between the gate run and the
    // commit under test; a SUBSET record (the failure mode) is far below
    val registry = SparkEntry.queries.size
    assert(n >= registry * 9 / 10,
      s"gate record covers $n of $registry registered queries — subset " +
        "record committed; re-run the full battery with default outputs")
    val qf = strField("queries_file").getOrElse("")
    assert(!qf.startsWith("/tmp") && !qf.startsWith("/var"),
      s"gate record points its evidence outside the repo: $qf")
  }
}
