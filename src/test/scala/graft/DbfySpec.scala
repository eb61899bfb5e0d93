package graft

/** CLI surface: flag parsing matches the reference's formats
  * (`/root/reference/dbfy.py:20-68`), and the parquet-sink path runs
  * the whole pipeline end to end. */
class DbfySpec extends SparkTestBase {

  test("range parsing: hex and decimal, reference format") {
    assert(Dbfy.parseRange("0x0020,0x007e") == (0x20, 0x7e))
    assert(Dbfy.parseRange("32,126") == (32, 126))
    assert(Dbfy.parseRange("0x1004,0x1084") == (0x1004, 0x1084))
    intercept[IllegalArgumentException](Dbfy.parseRange("32"))
  }

  test("arg parsing: reference flags, repeatable unichrs, extension sink") {
    val c = Dbfy.parseArgs(Array(
      "--src", "file:///tmp/dump.xml", "--passwd", "hunter2", "-y",
      "--limit", "100", "--remove_html", "0", "--n_processes", "8",
      "--valid_unichrs", "0x0020,0x007e", "--valid_unichrs", "0x1004,0x1084",
      "--invalid_unichrs", "0,31",
      "--sink", "parquet", "--out", "/tmp/x"))
    assert(c.src == "/tmp/dump.xml" && c.silent && c.limit.contains(100))
    assert(!c.removeHtml)
    assert(c.valid == List((0x20, 0x7e), (0x1004, 0x1084)) && c.invalid == List((0, 31)))
    intercept[IllegalArgumentException](Dbfy.parseArgs(Array("--nope")))
    intercept[IllegalArgumentException](Dbfy.parseArgs(Array("--passwd", "x")))
  }

  test("parquet sink end to end with limit") {
    val xml = getClass.getResource("/mini-wiki.xml").getPath
    val out = s"/tmp/graft-dbfy-${System.nanoTime()}"
    // limit 2 → Alpha + Alif only (dump order); Aleph's chain target is
    // inside the limit so Alif still resolves
    Dbfy.main(Array("--src", xml, "--silent", "--limit", "2",
      "--sink", "parquet", "--out", out))
    val bodies = spark.read.parquet(s"$out/bodies").collect()
    val articles = spark.read.parquet(s"$out/articles").collect()
    assert(bodies.length == 1)
    assert(articles.map(_.getString(2)).sorted.toSeq == Seq("Alif", "Alpha"))
  }
}
