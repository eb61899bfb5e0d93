package graft

import graft.functions.TokenCountRewrite
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** The byte-scan token counter must agree with the exact semantics of
  * `size(filter(split(s, ' '), x -> x <> ''))` — i.e. the number of
  * non-empty fields after splitting on SINGLE SPACES with limit -1 —
  * on arbitrary strings, including multi-byte and supplementary-plane
  * characters and non-space whitespace (which is NOT a delimiter). */
object TokenCountProps extends Properties("TokenCount") {

  private val atom: Gen[String] = Gen.oneOf(
    Gen.const(" "), Gen.const("  "),
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const("é"), Gen.const("日本"), Gen.const("😀"), Gen.const("𝕩"),
    Gen.const("\t"), Gen.const("\n"), Gen.const(" "))

  private val text: Gen[String] = Gen.listOf(atom).map(_.mkString)

  property("count == split-filter-size semantics") = Prop.forAll(text) { s =>
    TokenCountRewrite.count(UTF8String.fromString(s)) ==
      s.split(" ", -1).count(_.nonEmpty)
  }
}
