package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Geometry guarantee of q_ann_lsh / q_ann_lsh_probes multi-probe
  * banding (16-bit signature, 4×4-bit bands, own nibble + 4 Hamming-1
  * flips per band) — the 16-bit twin of HammingBandRecallSpec's 64-bit
  * proof, checked against the exact key construction the queries use:
  *
  *  - every pair within total signature Hamming distance ≤ 7 IS a
  *    candidate (pigeonhole: 7 errors over 4 bands leave a band ≤ 1,
  *    and that band's 5-probe set covers Hamming ≤ 1);
  *  - tight at 8: two flipped bits in every band is the canonical miss;
  *  - candidate iff some band at Hamming ≤ 1 (no hidden extra
  *    collisions — the n·5/16-per-band budget arithmetic is the real
  *    collision rule);
  *  - single-probe candidates are a SUBSET of multi-probe candidates
  *    (the 'multi ⊇ single' monotonicity q_ann_lsh_probes reports).
  */
object LshMultiProbeSpec extends Properties("LshMultiProbe") {

  private def nibble(sig: Int, b: Int): Int = (sig >>> (b * 4)) & 0xf
  private def probeKeys(sig: Int, b: Int): Set[Int] =
    Set(nibble(sig, b)) ++ (0 until 4).map(k => nibble(sig, b) ^ (1 << k))
  private def isCandMulti(s1: Int, s2: Int): Boolean =
    (0 until 4).exists(b => probeKeys(s1, b).contains(nibble(s2, b)))
  private def isCandSingle(s1: Int, s2: Int): Boolean =
    (0 until 4).exists(b => nibble(s1, b) == nibble(s2, b))

  private val sigGen: Gen[Int] = Gen.chooseNum(0, 0xffff)
  private def withErrors(s: Int, positions: Seq[Int]): Int =
    positions.foldLeft(s)((acc, p) => acc ^ (1 << p))

  property("recall guaranteed: every distance <= 7 pair is a candidate") =
    Prop.forAll(sigGen, Gen.chooseNum(0, 7).flatMap(n =>
      Gen.pick(n, 0 until 16).map(_.toSeq))) { (s, pos) =>
      val s2 = withErrors(s, pos)
      isCandMulti(s, s2) && isCandMulti(s2, s)
    }

  property("tight at 8: two errors in every band is a miss") =
    Prop.forAll(sigGen, Gen.listOfN(4, Gen.pick(2, 0 until 4))) {
      (s, perBand) =>
        val pos = perBand.zipWithIndex.flatMap { case (ks, b) => ks.map(_ + b * 4) }
        val s2 = withErrors(s, pos)
        Integer.bitCount(s ^ s2) == 8 && !isCandMulti(s, s2)
    }

  property("candidate iff some band at Hamming <= 1") =
    Prop.forAll(sigGen, sigGen) { (s1, s2) =>
      isCandMulti(s1, s2) ==
        (0 until 4).exists(b => Integer.bitCount(nibble(s1, b) ^ nibble(s2, b)) <= 1)
    }

  property("multi-probe candidates are a superset of single-probe") =
    Prop.forAll(sigGen, sigGen) { (s1, s2) =>
      !isCandSingle(s1, s2) || isCandMulti(s1, s2)
    }
}
