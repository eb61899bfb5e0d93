package graft

import org.scalacheck.{Gen, Prop, Properties}

/** The multi-probe 4×16-bit Hamming banding's recall guarantee, proved
  * FROM THE GEOMETRY, not from data (VERDICT r16 #2 "done" criterion):
  * a pure-Scala model of the probe/anchor key construction shared by
  * `Similarity.simhashCandidates`, `Multimodal.hammingNearDup`, and
  * the string twin in `imageNearDupDet` is checked against arbitrary
  * 64-bit hashes with arbitrary planted error patterns —
  *
  *  - every pair within total Hamming distance 7 IS a candidate
  *    (pigeonhole: 7 errors over 4 bands leave some band with ≤ 1,
  *    and that band's 17-probe enumeration hits the anchor key);
  *  - the bound is TIGHT: 2 errors in every band (distance 8) is the
  *    canonical miss — the guarantee claims nothing beyond 7;
  *  - the candidate predicate is symmetric (one probe direction plus
  *    the a < b join predicate loses no pair);
  *  - candidates are exactly "some band at Hamming ≤ 1" — the probe
  *    enumeration adds no false negatives AND no band-distance-≥2
  *    collisions, pinning the n²/964 envelope arithmetic to the
  *    implementation's actual collision rule.
  */
object HammingBandRecallSpec extends Properties("HammingBandRecall") {

  /** exact model of the banding in the three implementations */
  private def bandVal(h: Long, b: Int): Long = (h >>> (b * 16)) & 0xffffL
  private def probeKeys(h: Long, b: Int): Set[Long] =
    Set(bandVal(h, b)) ++ (0 until 16).map(k => bandVal(h, b) ^ (1L << k))
  private def isCandidate(h1: Long, h2: Long): Boolean =
    (0 until 4).exists(b => probeKeys(h1, b).contains(bandVal(h2, b)))

  private val hashGen: Gen[Long] = Gen.long

  /** h2 = h1 with exactly d planted bit errors at distinct positions */
  private def withErrors(h: Long, positions: Seq[Int]): Long =
    positions.foldLeft(h)((acc, p) => acc ^ (1L << p))
  private def distinctPositions(n: Int): Gen[Seq[Int]] =
    Gen.pick(n, 0 until 64).map(_.toSeq)

  property("recall guaranteed: every distance ≤ 7 pair is a candidate") =
    Prop.forAll(hashGen, Gen.chooseNum(0, 7).flatMap(distinctPositions)) {
      (h, pos) =>
        val h2 = withErrors(h, pos)
        isCandidate(h, h2) && isCandidate(h2, h)
    }

  property("tight at 8: two errors in every band is a miss") =
    Prop.forAll(hashGen, Gen.listOfN(4, Gen.pick(2, 0 until 16))) {
      (h, perBand) =>
        val pos = perBand.zipWithIndex.flatMap { case (ks, b) =>
          ks.map(_ + b * 16) }
        val h2 = withErrors(h, pos)
        java.lang.Long.bitCount(h ^ h2) == 8 && !isCandidate(h, h2)
    }

  property("candidate iff some band at Hamming ≤ 1 (the envelope's collision rule)") =
    Prop.forAll(hashGen, hashGen) { (h1, h2) =>
      val someBandLe1 = (0 until 4).exists(b =>
        java.lang.Long.bitCount(bandVal(h1, b) ^ bandVal(h2, b)) <= 1)
      isCandidate(h1, h2) == someBandLe1
    }

  property("symmetric: one probe direction loses no pair") =
    Prop.forAll(hashGen, hashGen) { (h1, h2) =>
      isCandidate(h1, h2) == isCandidate(h2, h1)
    }

  /** exhaustive pigeonhole over ALL error-count compositions: any way
    * of placing ≤ 7 errors into 4 bands leaves a band with ≤ 1 */
  property("pigeonhole composition lemma, exhaustively") = Prop {
    val comps = for {
      a <- 0 to 7; b <- 0 to 7 - a; c <- 0 to 7 - a - b
      dd <- 0 to 7 - a - b - c
    } yield Seq(a, b, c, dd)
    comps.forall(_.exists(_ <= 1))
  }
}
