package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** The codegen'd vector expressions must agree with Spark's own
  * built-in formulations on ARBITRARY finite inputs — lengths 0 to
  * beyond the 128-dim plane table, a wide finite range with rounding
  * tie candidates. Each sample runs
  * through a real DataFrame, so the codegen path (not just the
  * interpreted eval) is what's checked. */
object VectorExprsProps extends Properties("VectorExprs") {

  private lazy val spark = SparkTestBase.session

  private val finiteFloat: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-10f, 10f),
    Gen.chooseNum(-1e6f, 1e6f),
    Gen.oneOf(0f, -0f, 1e-8f, -1e-8f, 0.5f, -0.5f, 1.5e-9f))
    .map(f => if (f.isNaN || f.isInfinite) 0f else f)

  private val vec: Gen[Seq[Float]] =
    Gen.chooseNum(0, 160).flatMap(n => Gen.listOfN(n, finiteFloat))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def refSig(qv: Seq[Long]): Long = {
    var sig = 0L
    for (j <- 0 until 16) {
      var s = 0L
      for (i <- 0 until math.min(qv.length, 128))
        s += qv(i) * (math.floorMod(mix(j * 1000003L + i), 2001L) - 1000L)
      if (s > 0) sig |= (1L << j)
    }
    sig
  }

  property("graft_quantize == transform-lambda; graft_lshsig == reference, any length") =
    Prop.forAll(Gen.listOfN(12, vec)) { vecs =>
      import spark.implicits._
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .selectExpr("vec_id", "graft_quantize(embedding, 100000000) AS qv",
          "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT)) AS qv_hof")
        .selectExpr("vec_id", "qv", "qv_hof", "graft_lshsig(qv) AS sig")
        .collect()
      rows.forall { r =>
        val qv = r.getSeq[Long](1)
        qv == r.getSeq[Long](2) && r.getLong(3) == refSig(qv)
      }
    }

  private val longVec: Gen[Seq[Long]] =
    Gen.listOfN(64, Gen.chooseNum(-200000000L, 200000000L)).map(_.toSeq)

  private def refMaxSim(xs: Seq[Long], ys: Seq[Long], sub: Int): Long =
    (0 until xs.length / sub).map { i =>
      (0 until ys.length / sub).map { j =>
        (0 until sub).map(k => xs(i * sub + k) * ys(j * sub + k)).sum
      }.max
    }.sum

  property("graft_maxsim == the HOF sub-vector fold and a Scala reference, 64-dim") =
    Prop.forAll(Gen.listOfN(6, Gen.zip(longVec, longVec))) { pairs =>
      import spark.implicits._
      val rows = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "qa", "qb")
        .selectExpr("id", "qa", "qb",
          "graft_maxsim(qa, qb, 8) AS ms",
          "aggregate(sequence(0, 7), 0L, (acc, i) -> acc + array_max(" +
            "transform(sequence(0, 7), j -> aggregate(" +
            "zip_with(slice(qa, i * 8 + 1, 8), slice(qb, j * 8 + 1, 8)," +
            " (x, y) -> x * y), 0L, (s2, v) -> s2 + v)))) AS ms_hof")
        .collect()
      rows.forall { r =>
        val (qa, qb) = (r.getSeq[Long](1), r.getSeq[Long](2))
        r.getLong(3) == r.getLong(4) && r.getLong(3) == refMaxSim(qa, qb, 8)
      }
    }
}
