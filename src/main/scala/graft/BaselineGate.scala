package graft

/** Pure adjudication logic for the per-query baseline gate, extracted
  * from [[Bench]] so the policy is unit-testable without running a
  * battery (BaselineGateSpec). Semantics documented in BASELINE.md:
  *
  *  - per-query ratio = measured / pinned seconds;
  *  - `eraDrift` = median ratio across all pinned queries, clamped to
  *    >= 1 — the box swings uniformly between speed eras (~1.3-1.4×
  *    same-code), and a median over ~170 pins cannot be moved by any
  *    single real regression, so dividing it out preserves per-query
  *    detection power while forgiving uniform slowness only;
  *  - thresholds warn >1.5× / fail >2× on the NORMALIZED ratio,
  *    loosened to >2× / >3× for pins flagged unstable;
  *  - the 0.3 s noise floor applies to the MEASURED seconds (ratio ×
  *    pin, i.e. normalized measured time for the normalized lists),
  *    NOT the pin (VERDICT r16 #1: 81 of 194 pins sat under a pin-side
  *    floor, so a sub-0.3 s-pin query could regress 10× — to 1-2
  *    MEASURED seconds — with zero warns; gating on measured seconds
  *    keeps scheduler noise ungated while catching any regression big
  *    enough to clear the floor);
  *  - gate = "fail" if any normalized fail; else "warn_era" when
  *    eraDrift > 1.75 (a uniform whole-engine slowdown is
  *    indistinguishable from era drift by this method — escalate to a
  *    human A/B instead of silently passing); else "pass";
  *  - correlated-regression escalation (ADVICE r11/r12 medium): the
  *    median self-normalizes away a real slowdown that spans ~half the
  *    suite (e.g. 85 of 170 pins at 2.2× moves the median to 1.6, so
  *    every normalized ratio "passes"). A would-be pass is therefore
  *    downgraded to "warn_era" when raw fails exceed 10% of gated pins
  *    or the battery-wide raw total exceeds 2× — both shapes mean
  *    either a broad real regression or an era extreme enough that
  *    normalized numbers alone must not be trusted.
  */
object BaselineGate {
  final case class Result(
      eraDrift: Double,
      normRatios: Seq[(String, Double)],
      warn: Seq[String],
      fail: Seq[String],
      warnRaw: Seq[String],
      failRaw: Seq[String],
      gate: String)

  val NoiseFloorSec = 0.3
  val WarnEraAbove = 1.75
  /** Raw-fail fraction of gated pins above which a pass is not trusted. */
  val FailRawFracAbove = 0.10
  /** Hard bound on the battery-wide raw total ratio. */
  val TotalRawAbove = 2.0

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty")
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  def adjudicate(
      ratios: Seq[(String, Double)],
      baseline: Map[String, Double],
      unstable: Set[String]): Result = {
    val eraDrift =
      if (ratios.isEmpty) 1.0 else math.max(1.0, median(ratios.map(_._2)))
    val norm = ratios.map { case (k, r) => k -> r / eraDrift }
    // defensive get: adjudicate() is a public API — a ratio key without
    // a pin must not throw at gate time (Bench pre-filters, but the
    // pure function shouldn't rely on it), matching totalRaw below.
    // Floor check is MEASURED-side (r × pin ≥ 0.3 s): for the
    // normalized lists r×pin is the era-normalized measured seconds,
    // for the raw lists the raw measured seconds — each list gates on
    // the evidence it adjudicates.
    def gatedOn(rs: Seq[(String, Double)])(
        pred: Double => Boolean, loosePred: Double => Boolean): Seq[String] =
      rs.collect {
        case (k, r) if baseline.get(k).exists(p => p > 0 && r * p >= NoiseFloorSec) &&
          (if (unstable(k)) loosePred(r) else pred(r)) => k
      }
    def warnsIn(rs: Seq[(String, Double)]) =
      gatedOn(rs)(r => r > 1.5 && r <= 2.0, r => r > 2.0 && r <= 3.0)
    def failsIn(rs: Seq[(String, Double)]) = gatedOn(rs)(_ > 2.0, _ > 3.0)
    val fail = failsIn(norm)
    val failRaw = failsIn(ratios)
    // Correlated-regression escalation (see scaladoc): raw evidence the
    // median cannot be trusted to normalize away.
    // eligibility matches the raw lists: raw measured seconds ≥ floor
    val gatedPins =
      ratios.count { case (k, r) =>
        baseline.get(k).exists(p => p > 0 && r * p >= NoiseFloorSec) }
    val totalRaw = {
      val pinned = ratios.collect { case (k, r) if baseline.contains(k) =>
        (r * baseline(k), baseline(k)) }
      if (pinned.isEmpty) 0.0 else pinned.map(_._1).sum / pinned.map(_._2).sum
    }
    val correlated =
      (gatedPins > 0 && failRaw.size > FailRawFracAbove * gatedPins) ||
        totalRaw > TotalRawAbove
    val gate =
      if (fail.nonEmpty) "fail"
      else if (eraDrift > WarnEraAbove || correlated) "warn_era"
      else "pass"
    Result(eraDrift, norm, warnsIn(norm), fail,
      warnsIn(ratios), failRaw, gate)
  }
}
