package graft

import graft.etl.WikiXml
import java.nio.file.{Files, Paths}

/** A2: the reference streams the dump through bz2
  * (`/root/reference/dbfy.py:188`) — Spark's text source decodes .bz2
  * transparently via the Hadoop codec, so the same WikiXml parse works
  * on a compressed dump (single-split read feeding the pipeline's
  * repartition, SURVEY.md §7.5). */
class WikiXmlBz2Spec extends SparkTestBase {

  test("pages parse identically from a bz2-compressed dump") {
    val xml = getClass.getResource("/mini-wiki.xml").getPath
    val bz2Path = s"/tmp/graft-mini-wiki-${System.nanoTime()}.xml.bz2"
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val out = codec.createOutputStream(Files.newOutputStream(Paths.get(bz2Path)))
    out.write(Files.readAllBytes(Paths.get(xml)))
    out.close()

    val plain = WikiXml.pages(spark, xml).collect().map(_.toSeq).toSet
    val compressed = WikiXml.pages(spark, bz2Path).collect().map(_.toSeq).toSet
    assert(compressed == plain && plain.size == 6)
  }

  test("invalid UTF-8 bytes are DELETED, not replaced (A5a errors='ignore')") {
    // gensim: to_unicode(text, "utf8", errors="ignore") drops invalid
    // byte sequences (/root/reference/filters.py:53); the JVM reader
    // yields U+FFFD, which WikiXml deletes post-scan.
    val p = s"/tmp/graft-badutf8-${System.nanoTime()}.xml"
    val head = "<page><title>Bad</title><ns>0</ns><id>9</id><revision><id>1</id><text>ab"
    val tail = "cd</text></revision></page>"
    val bytes = head.getBytes("UTF-8") ++
      Array(0xFF.toByte, 0xFE.toByte) ++ // bytes never valid in UTF-8
      tail.getBytes("UTF-8")
    Files.write(Paths.get(p), bytes)
    val text = WikiXml.pages(spark, p).collect().head.getString(2)
    assert(text == "abcd", s"expected deletion, got: ${text.codePoints().toArray.mkString(",")}")
    assert(!text.contains('�'))
  }

  test("graft_ldot installs through SparkSessionExtensions and works from SQL") {
    import org.apache.spark.sql.SparkSession
    val base = spark // ensure the shared session/context exists first
    // getOrCreate returns the existing session (ignoring withExtensions)
    // unless the default is cleared; the SparkContext is still reused.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT graft_ldot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .collect().head.getLong(0)
      assert(r == 32L) // 4 + 10 + 18
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
