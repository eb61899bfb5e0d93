package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Executable versions of the int64-headroom claims in the Pipeline
  * query comments: within each documented envelope, the staged Long
  * arithmetic must equal the same staging evaluated in BigInt — i.e.
  * no intermediate silently wrapped. This is the defect class a review
  * caught in q_pmi_colloc's original staging (overflow at ~1e8 tokens
  * against a comment claiming ~1e9): the property would have failed
  * instantly, so it now guards both rankings' formulas against any
  * future re-staging.
  *
  * Pure arithmetic — no SparkSession — so the properties run hundreds
  * of cases in milliseconds.
  */
object IntegerStagingProps extends Properties("IntegerStaging") {

  private def stagedPmiLong(cxy: Long, cx: Long, cy: Long, tu: Long, tb: Long): Long =
    (((cxy * tu) / cx) * 10000 / tb) * tu / cy

  private def stagedPmiBig(cxy: Long, cx: Long, cy: Long, tu: Long, tb: Long): BigInt =
    (((BigInt(cxy) * BigInt(tu)) / BigInt(cx)) * BigInt(10000) / BigInt(tb)) *
      BigInt(tu) / BigInt(cy)

  // the documented JOINT envelope: tu <= 4e14 AND c_xy*tu <= 9e18,
  // counts nested realistically: c_xy <= min(c_x, c_y) <= tu, tb in
  // [tu/2, tu] (bigrams are one fewer per doc than unigrams, never
  // more). forAllNoShrink: scalacheck shrinking does not respect the
  // generator's envelope, so a shrunk counterexample would "falsify"
  // with out-of-envelope args.
  private val pmiGen = for {
    tu <- Gen.choose(1000L, 400000000000000L)
    cx <- Gen.choose(1L, tu)
    cy <- Gen.choose(1L, tu)
    cxy <- Gen.choose(1L, math.min(math.min(cx, cy), 9000000000000000000L / tu))
    tb <- Gen.choose(math.max(1L, tu / 2), tu)
  } yield (cxy, cx, cy, tu, tb)

  property("pmi staging exact through the documented joint envelope") =
    Prop.forAllNoShrink(pmiGen) { case (cxy, cx, cy, tu, tb) =>
      BigInt(stagedPmiLong(cxy, cx, cy, tu, tb)) ==
        stagedPmiBig(cxy, cx, cy, tu, tb)
    }

  // regression documentation: the pre-review order
  // (((c_xy·tu)/c_x)·tu/c_y)·10⁴/tb wraps for a rare pair on a
  // ~1e8-token shard — the case the current staging was rewritten for
  property("the pre-review pmi staging really did overflow in-envelope") = {
    val (cxy, cx, cy, tu, tb) = (5L, 5L, 5L, 100000000L, 90000000L)
    val legacy = ((((cxy * tu) / cx) * tu) / cy) * 10000 / tb
    val legacyBig = ((((BigInt(cxy) * BigInt(tu)) / BigInt(cx)) * BigInt(tu)) /
      BigInt(cy)) * BigInt(10000) / BigInt(tb)
    Prop(BigInt(legacy) != legacyBig) &&
      Prop(BigInt(stagedPmiLong(cxy, cx, cy, tu, tb)) ==
        stagedPmiBig(cxy, cx, cy, tu, tb))
  }

  private def bm25Long(t: Long, tf: Long, dl: Long, n: Long, df: Long): Long =
    ((44 * t * tf * 10000) / (20 * t * tf + 6 * t + 18 * dl * n)) *
      (((2 * n - 2 * df + 1) * 10000) / (2 * df + 1)) / 10000

  private def bm25Big(t: Long, tf: Long, dl: Long, n: Long, df: Long): BigInt =
    ((BigInt(44) * BigInt(t) * BigInt(tf) * BigInt(10000)) /
      (BigInt(20) * BigInt(t) * BigInt(tf) + BigInt(6) * BigInt(t) +
        BigInt(18) * BigInt(dl) * BigInt(n))) *
      ((BigInt(2L * n - 2L * df + 1) * BigInt(10000)) / BigInt(2L * df + 1)) /
      BigInt(10000)

  // the comment's binding constraint is 44·10⁴·T·tf < 2⁶³, i.e.
  // T·tf <= ~2.09e13; generate right up to it, with df <= n <= T and
  // dl up to 1000x the average doc length (T/n), all corpus-consistent
  private val bm25Gen = for {
    tf <- Gen.choose(1L, 1000L)
    t <- Gen.choose(tf, 20900000000000L / tf)
    n <- Gen.choose(1L, math.min(t, 1000000000L))
    dl <- Gen.choose(1L, math.min(t, math.max(1L, t / n * 1000L)))
    df <- Gen.choose(1L, n)
  } yield (t, tf, dl, n, df)

  property("bm25 contrib staging exact through the documented T*tf <= 2e13 envelope") =
    Prop.forAllNoShrink(bm25Gen) { case (t, tf, dl, n, df) =>
      BigInt(bm25Long(t, tf, dl, n, df)) == bm25Big(t, tf, dl, n, df)
    }

  private def dsirLong(ct: Long, cr: Long, tr: Long, tt: Long, v: Long): Long =
    (((ct + 1) * tr) / cr) * 10000 / (tt + v)

  private def dsirBig(ct: Long, cr: Long, tr: Long, tt: Long, v: Long): BigInt =
    ((BigInt(ct) + 1) * BigInt(tr) / BigInt(cr)) * BigInt(10000) /
      (BigInt(tt) + BigInt(v))

  // q_dsir's documented joint envelope: (c_t+1)*t_r <= 9e18 (Zipf
  // shards <= ~5e10 tokens) with corpus-consistent nesting: the raw
  // corpus CONTAINS the target sample, so c_t <= c_r, t_t <= t_r,
  // v <= t_r
  private val dsirGen = for {
    tr <- Gen.choose(1000L, 400000000000000L)
    tt <- Gen.choose(1L, tr)
    ct <- Gen.choose(0L, math.min(tt, 9000000000000000000L / tr - 1))
    cr <- Gen.choose(math.max(1L, ct), tr)
    v <- Gen.choose(1L, tr)
  } yield (ct, cr, tr, tt, v)

  property("dsir lift staging exact through the documented joint envelope") =
    Prop.forAllNoShrink(dsirGen) { case (ct, cr, tr, tt, v) =>
      BigInt(dsirLong(ct, cr, tr, tt, v)) == dsirBig(ct, cr, tr, tt, v)
    }
}
