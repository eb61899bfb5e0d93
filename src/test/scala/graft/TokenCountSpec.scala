package graft

import graft.functions.{TokenCount, TokenCountRewrite}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.unsafe.types.UTF8String

/** The injected optimizer rule must be (a) sound — bit-identical to the
  * size∘filter∘split form on every edge — and (b) live — actually
  * firing inside the registered queries' optimized plans. */
class TokenCountSpec extends SparkTestBase {

  private val fixtures: Seq[String] = Seq(
    "", " ", "   ", "a", " a ", "a b", "a  b", "  x   y  z ",
    "a\tb", "a\nb", "héllo wörld", " ", "日本 語  テスト ", "a ", " a")

  test("count() equals split-filter-size semantics on edge fixtures") {
    for (s <- fixtures) {
      val expected = s.split(" ", -1).count(_.nonEmpty)
      assert(TokenCountRewrite.count(UTF8String.fromString(s)) == expected,
        s"mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("rule rewrites the pattern and the rewritten plan evaluates identically") {
    import spark.implicits._
    // repartition keeps ConvertToLocalRelation from pre-evaluating the
    // project, so the optimized expressions stay inspectable
    val df = (fixtures :+ null).toDF("t").repartition(2)
      .select(col("t"),
        expr("size(filter(split(t, ' '), x -> x <> ''))").as("n"),
        expr("size(filter(split(t, ' '), x -> '' != x))").as("n_comm"))
    val opt = df.queryExecution.optimizedPlan
    val tokCounts = opt.expressions.flatMap(_.collect { case tc: TokenCount => tc })
    assert(tokCounts.size == 2, s"expected both forms rewritten:\n$opt")
    assert(!opt.toString.contains("array_filter"), opt.toString)
    // null in → null out (non-legacy size semantics)
    val rows = df.collect().map(r =>
      (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    for ((t, n) <- rows) t match {
      case None    => assert(n.isEmpty)
      case Some(s) => assert(n.contains(s.split(" ", -1).count(_.nonEmpty)), s"'$s'")
    }
  }

  test("non-matching shapes are left alone") {
    import spark.implicits._
    val df = Seq("a b").toDF("t").select(
      expr("size(filter(split(t, ','), x -> x <> ''))").as("comma"),
      expr("size(filter(split(t, ' ', 2), x -> x <> ''))").as("limited"),
      expr("size(filter(split(t, ' '), x -> x <> 'a'))").as("not_empty_cmp"))
    val opt = df.queryExecution.optimizedPlan
    assert(opt.expressions.flatMap(_.collect { case tc: TokenCount => tc }).isEmpty,
      s"over-eager rewrite:\n$opt")
    assert(opt.expressions.flatMap(_.collect { case t: graft.functions.Toks => t }).isEmpty,
      s"over-eager toks rewrite:\n$opt")
    assert(df.collect().head.toSeq == Seq(1, 2, 1))
  }

  test("bare filter∘split tokenizer is rewritten to Toks and evaluates identically") {
    import spark.implicits._
    val df = (fixtures :+ null).toDF("t").repartition(2)
      .select(col("t"), expr("filter(split(t, ' '), x -> x <> '')").as("toks"))
    val opt = df.queryExecution.optimizedPlan
    val toks = opt.expressions.flatMap(_.collect { case t: graft.functions.Toks => t })
    assert(toks.nonEmpty, s"tokenizer not rewritten:\n$opt")
    assert(!opt.toString.contains("array_filter"), opt.toString)
    df.collect().foreach { r =>
      Option(r.getString(0)) match {
        case None    => assert(r.isNullAt(1))
        case Some(s) =>
          assert(r.getSeq[String](1).toList == s.split(" ", -1).filter(_.nonEmpty).toList,
            s"'$s'")
      }
    }
  }

  test("Toks rewrite fires inside a registered tokenize-heavy query") {
    val q = graft.queries.Pipeline.queries("q_gopher_quality")
    val opt = q(spark, sfDir).queryExecution.optimizedPlan
    val hits = opt.collectWithSubqueries { case p =>
      p.expressions.flatMap(_.collect { case t: graft.functions.Toks => t }).size
    }.sum
    assert(hits > 0, s"Toks rewrite did not fire:\n$opt")
  }

  test("rule fires inside the registered token-counting queries") {
    for (q <- Seq(
        graft.queries.Pipeline.queries("q_pack_greedy"),
        graft.queries.Text.queries("q_token_count"))) {
      val opt = q(spark, sfDir).queryExecution.optimizedPlan
      val hits = opt.collectWithSubqueries { case p =>
        p.expressions.flatMap(_.collect { case tc: TokenCount => tc }).size
      }.sum
      assert(hits > 0, s"rule did not fire:\n$opt")
    }
  }

  test("graft_tokcount is directly callable via the injected function") {
    assert(spark.sql("SELECT graft_tokcount('  a b  c ')").head().getInt(0) == 3)
  }
}
