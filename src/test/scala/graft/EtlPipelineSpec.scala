package graft

import graft.etl.{WikiEtl, WikiXml}

/** End-to-end ETL over the mini dump fixture (FIXTURES.md §2): XML →
  * ns-0 filter → redirect split → clean → deterministic ids → resolved
  * articles/bodies matching `/root/reference/sql/init.sql:5-19` shapes. */
class EtlPipelineSpec extends SparkTestBase {
  private lazy val xml = getClass.getResource("/mini-wiki.xml").getPath

  test("page extraction filters namespaces, keeps redirect text, unescapes XML") {
    val all = WikiXml.allPages(spark, xml).collect()
    assert(all.length == 7)
    val pages = WikiXml.pages(spark, xml).collect().map(r => r.getString(0) -> r).toMap
    assert(pages.size == 6 && !pages.contains("Talk:Alpha"))
    assert(pages("Alif").getString(2) == "#REDIRECT [[Alpha]]")
    val alpha = pages("Alpha").getString(2)
    assert(alpha.contains("<ref>cite</ref>")) // XML layer unescaped &lt; → <
    assert(alpha.contains("&amp;co."))        // but &amp;amp; → &amp; only
    assert(pages("Alpha").getLong(1) == 1L)   // page id, not revision id
  }

  test("full pipeline: shared bodies, resolved chains, dropped cycles/dead-ends") {
    val out = WikiEtl.run(spark, xml)
    val bodies = out.bodies.collect()
    assert(bodies.length == 1)
    val body = bodies.head.getString(1)
    assert(body.startsWith("Alpha is a letter."))
    assert(body.contains("the next one"))
    assert(body.contains("&co."))
    assert(!body.contains("{{") && !body.contains("[[") && !body.contains("<ref"))

    val articles = out.articles.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // Alpha(aid 1), Alif(aid 2), Aleph(aid 3) share body 1; dense ids by (aid, title)
    assert(articles.toSeq == Seq((1L, 1L, "Alpha", 1L), (2L, 2L, "Alif", 1L), (3L, 3L, "Aleph", 1L)))
  }

  test("unicode filter flags flow through the pipeline") {
    val out = WikiEtl.run(spark, xml, removeHtml = true, valid = Seq((0x20, 0x7e)))
    assert(out.bodies.collect().head.getString(1).forall(c => c >= 0x20 && c <= 0x7e))
  }

}
