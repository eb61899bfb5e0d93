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

  test("pins under the noise floor are never gated") {
    val rs = Seq("q_tiny" -> 5.0, "q_big" -> 1.0)
    val base = Map("q_tiny" -> 0.1, "q_big" -> 1.0)
    val r = BaselineGate.adjudicate(rs, base, Set.empty)
    assert(r.fail.isEmpty && r.warn.isEmpty)
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

  test("median: odd and even counts, empty ratios default") {
    assert(BaselineGate.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BaselineGate.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    val r = BaselineGate.adjudicate(Nil, Map.empty, Set.empty)
    assert(r.eraDrift === 1.0 && r.gate == "pass")
  }
}
