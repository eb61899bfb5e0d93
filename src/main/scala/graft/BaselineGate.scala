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
  *    loosened to >2× / >3× for pins flagged unstable, and skipped
  *    entirely for pins under the 0.3 s noise floor;
  *  - gate = "fail" if any normalized fail; else "warn_era" when
  *    eraDrift > 1.75 (a uniform whole-engine slowdown is
  *    indistinguishable from era drift by this method — escalate to a
  *    human A/B instead of silently passing); else "pass".
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
    def gatedOn(rs: Seq[(String, Double)])(
        pred: Double => Boolean, loosePred: Double => Boolean): Seq[String] =
      rs.collect {
        case (k, r) if baseline(k) >= NoiseFloorSec &&
          (if (unstable(k)) loosePred(r) else pred(r)) => k
      }
    def warnsIn(rs: Seq[(String, Double)]) =
      gatedOn(rs)(r => r > 1.5 && r <= 2.0, r => r > 2.0 && r <= 3.0)
    def failsIn(rs: Seq[(String, Double)]) = gatedOn(rs)(_ > 2.0, _ > 3.0)
    val fail = failsIn(norm)
    val gate =
      if (fail.nonEmpty) "fail"
      else if (eraDrift > WarnEraAbove) "warn_era"
      else "pass"
    Result(eraDrift, norm, warnsIn(norm), fail,
      warnsIn(ratios), failsIn(ratios), gate)
  }
}
