package graft

import graft.etl.WikiText
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based cleaning invariants (SURVEY.md §5.2.3), run by sbt's
  * native scalacheck support: cleaning is a fixpoint, leaves no markup,
  * and the whitelist filter's output stays inside the allowed ranges. */
object WikiTextProps extends Properties("WikiText") {

  private val word: Gen[String] = Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty)

  private val markupAtom: Gen[String] = Gen.oneOf(
    word,
    word.map(w => s"{{$w}}"),
    Gen.zip(word, word).map { case (a, b) => s"{{$a|x={{$b}}}}" },
    Gen.zip(word, word).map { case (a, b) => s"[[$a|$b]]" },
    word.map(w => s"[[$w]]"),
    word.map(w => s"<ref>$w</ref>"),
    word.map(w => s"<!--$w-->"),
    word.map(w => s"'''$w'''"),
    word.map(w => s"[http://e.io/$w label]"),
    word.map(w => s"[[File:$w.png|thumb|[[x]] cap]]"),
    Gen.const("&amp;"), Gen.const("&#65;"), Gen.const("\n"), Gen.const("  "),
    word.map(w => s"<math>$w^2</math>"),
    word.map(w => s"{|\n|$w\n|}"))

  private val markupText: Gen[String] =
    Gen.listOfN(10, markupAtom).map(_.mkString(" "))

  property("cleaning is idempotent (fixpoint)") = Prop.forAll(markupText) { s =>
    val once = WikiText.cleanWikiBody(s)
    WikiText.cleanWikiBody(once) == once
  }

  property("no template/ref/link markup survives") = Prop.forAll(markupText) { s =>
    val out = WikiText.cleanWikiBody(s)
    !out.contains("{{") && !out.contains("<ref") && !out.contains("[[") &&
      !out.contains("-->") && !out.contains("'''")
  }

  property("whitelist output stays inside allowed ranges") =
    Prop.forAll(Gen.listOf(Gen.choose(0x20, 0x2FF)).map(_.map(_.toChar).mkString)) { s =>
      val out = WikiText.cleanWikiBody(s, valid = Seq((0x20, 0x7e)))
      out.forall(c => c >= 0x20 && c <= 0x7e)
    }

  property("whitespace collapse keeps the first char and never grows") =
    Prop.forAll(Gen.listOf(Gen.oneOf('a', 'b', ' ', '\n', '\t')).map(_.mkString)) { s =>
      val out = WikiText.collapseWhitespace(s)
      out.length <= s.length &&
        !out.sliding(2).exists(p => p.length == 2 &&
          p.forall(_.isWhitespace))
    }

  property("redirect detection is anchored") = Prop.forAll(word) { w =>
    WikiText.detectRedirect(s"#REDIRECT [[$w]]").contains(w) &&
      WikiText.detectRedirect(s"x #REDIRECT [[$w]]").isEmpty
  }

  // ---- recursive bracket-nesting generator (VERDICT r13 #4): arbitrary
  // template/file-link/pipe-link/table nesting INCLUDING unbalanced
  // openers/closers — the shapes real dump pathologies take. Atoms are
  // whole (no split entities), so full-pipeline idempotence is the
  // reference contract and must hold.
  private def nestedGen(depth: Int): Gen[String] =
    if (depth <= 0) word
    else {
      val sub = Gen.lzy(nestedGen(depth - 1))
      Gen.frequency(
        2 -> word,
        2 -> Gen.zip(word, sub).map { case (w, in) => s"{{$w|$in}}" },
        1 -> sub.map(in => s"[[File:f.png|$in]]"),
        1 -> Gen.zip(word, sub).map { case (w, in) => s"[[$w|$in]]" },
        1 -> Gen.zip(word, sub).map { case (w, in) => s"[[$in|$w]]" },
        1 -> sub.map(in => s"<ref>$in</ref>"),
        1 -> sub.map(in => s"'''$in'''"),
        1 -> sub.map(in => s"{|\n|$in\n|}"),
        2 -> Gen.zip(sub, sub).map { case (a, b) => s"$a $b" },
        // unbalanced: stray opener / closer around real content
        1 -> sub.map(in => s"{{$in"),
        1 -> sub.map(in => s"$in}}"),
        1 -> sub.map(in => s"[[File:f.png|$in"),
        1 -> sub.map(in => s"[[$in"))
    }

  private val bracketNested: Gen[String] = Gen.choose(1, 5).flatMap(nestedGen)

  property("bracket-nesting: cleaning is idempotent and never grows") =
    Prop.forAll(bracketNested) { s =>
      val once = WikiText.cleanWikiBody(s)
      WikiText.cleanWikiBody(once) == once && once.length <= s.length
    }

  property("bracket-nesting: balanced markup never survives") =
    Prop.forAll(bracketNested) { s =>
      // completed pairs must always be removed even under stray
      // openers/closers; only the strays themselves may remain
      val out = WikiText.cleanWikiBody(s)
      !out.contains("}}") || !out.contains("{{") ||
        out.lastIndexOf("}}") < out.indexOf("{{")
    }
}
