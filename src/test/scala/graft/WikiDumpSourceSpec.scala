package graft

import java.nio.file.{Files, Paths}

import graft.etl.WikiXml
import graft.sources.{WikiDumpScanBuilder, WikiDumpSource}
import org.apache.spark.sql.types.StructType

/** The DSv2 connector must parse identically to the lineSep text-scan
  * route (shared parsing code, pinned here row-for-row), plan one
  * partition per dump file, and push column pruning into the reader. */
class WikiDumpSourceSpec extends SparkTestBase {

  private val fmt = classOf[WikiDumpSource].getName

  test("DSv2 read == WikiXml.allPages on the same dump, row for row") {
    val xml = getClass.getResource("/mini-wiki.xml").getPath
    val v2 = spark.read.format(fmt).load(xml)
      .collect().map(_.toSeq).toSet
    val v1 = WikiXml.allPages(spark, xml)
      .select("title", "ns", "aid", "text")
      .collect().map(_.toSeq).toSet
    assert(v2 == v1 && v2.nonEmpty, s"v2=${v2.size} v1=${v1.size}")
  }

  test("directory input plans one partition per file") {
    val dir = Files.createTempDirectory("graft-dump-dir").toFile
    def page(id: Long) =
      s"<mediawiki><page><title>P$id</title><ns>0</ns><id>$id</id>" +
        s"<revision><id>1</id><text>body $id</text></revision></page></mediawiki>"
    Files.write(Paths.get(dir.getPath, "a.xml"), page(1).getBytes("UTF-8"))
    Files.write(Paths.get(dir.getPath, "b.xml"), page(2).getBytes("UTF-8"))
    val df = spark.read.format(fmt).load(dir.getPath)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("aid").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // multi-path load (Spark passes these as a "paths" JSON array)
    val multi = spark.read.format(fmt)
      .load(s"${dir.getPath}/a.xml", s"${dir.getPath}/b.xml")
    assert(multi.select("aid").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("column pruning reaches the reader (scan reads only requested fields)") {
    val b = new WikiDumpScanBuilder(Seq("/nonexistent"))
    b.pruneColumns(StructType(WikiDumpSource.schema.filter(_.name == "title")))
    assert(b.build().readSchema().fieldNames.toSeq == Seq("title"))

    // end to end: the pruned plan's BatchScan advertises only the
    // requested columns, and the result matches the full read
    val xml = getClass.getResource("/mini-wiki.xml").getPath
    val pruned = spark.read.format(fmt).load(xml).select("title", "aid")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan") && !p.contains("text"), p)
    val full = spark.read.format(fmt).load(xml).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSet
    assert(pruned.collect().map(r => (r.getString(0), r.getLong(1))).toSet == full)
  }

  test("trailing fragments and malformed records drop; entities unescape") {
    val p = s"/tmp/graft-dsv2-${System.nanoTime()}.xml"
    val xml =
      "<mediawiki><page><title>A &amp; B</title><ns>0</ns><id>7</id>" +
        "<revision><id>9</id><text>x &lt;y&gt;</text></revision></page>" +
        "<page><title></title><ns>0</ns><id>8</id></page>" + // no title → drop
        "</mediawiki>"
    Files.write(Paths.get(p), xml.getBytes("UTF-8"))
    val rows = spark.read.format(fmt).load(p).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "A & B" && rows.head.getString(3) == "x <y>")
    assert(rows.head.getLong(2) == 7L) // first <id> is the page id
  }
}
