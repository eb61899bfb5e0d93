package graft

import java.io.{BufferedWriter, FileWriter}
import org.apache.spark.sql.SparkSession

/** ETL throughput smoke: generate a synthetic pages-articles dump (N
  * pages with templates/links/refs/entities, 20% redirects incl. chains
  * and cycles), run the full WikiEtl pipeline, report pages/sec.
  *
  * Context (BASELINE.md): the reference's bottleneck is 3 synchronous
  * MySQL round-trips per article — parsing/cleaning throughput here is
  * the comparable engine-side number, and it parallelizes per split.
  *
  * Usage: runMain graft.EtlBench [nPages]
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-etl-bench.xml"
    val w = new BufferedWriter(new FileWriter(path), 1 << 20)
    w.write("<mediawiki>\n")
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { i =>
      val body =
        if (i % 5 == 0) { // redirects: direct, chained, cyclic
          val target = if (i % 25 == 0) s"Page${i + 5}" // chain to next redirect
          else if (i % 35 == 0) s"Page$i"               // self-cycle
          else s"Page${i + 1}"
          s"#REDIRECT [[$target]]"
        } else {
          val words = (1 to 80).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
          s"'''Page$i''' is about $words. {{Infobox|id=$i|nested={{x|y}}}} " +
            s"See [[Page${i % 500 + 1}|related]] and [[Other$i]]. " +
            s"&lt;ref&gt;cite $i&lt;/ref&gt; &amp;amp; more [http://ex.org/$i ext $i] " +
            s"[[Category:Bench]]"
        }
      w.write(s"  <page><title>Page$i</title><ns>${if (i % 50 == 0) 1 else 0}</ns><id>$i</id>\n")
      w.write(s"    <revision><id>${1000000 + i}</id><text>$body</text></revision></page>\n")
    }
    w.write("</mediawiki>\n")
    w.close()

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warm

    val t0 = System.nanoTime()
    val out = graft.etl.WikiEtl.run(spark, path)
    // persist articles too: the sink phases below must time the SINKS,
    // not a recompute of the id-assignment sort
    val articles = out.articles
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBodies = out.bodies.count()
    val nArticles = articles.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // Parquet sink — the 100 TB-native layout (BASELINE.md throughput
    // row, VERDICT r18 #6): both tables, overwrite, default codec.
    val pqDir = s"${System.getProperty("java.io.tmpdir")}/graft-etl-bench-pq"
    val t1 = System.nanoTime()
    out.bodies.write.mode("overwrite").parquet(s"$pqDir/bodies")
    articles.write.mode("overwrite").parquet(s"$pqDir/articles")
    val secPq = (System.nanoTime() - t1) / 1e9

    // JDBC sink — embedded Derby (the in-process stand-in for MySQL),
    // through the exactly-once staged-promote path the reference's
    // per-row-commit loader is benchmarked against (BASELINE.md
    // "implied bottleneck" row). Bodies first: articles carries the FK.
    import graft.etl.MySqlSink
    val url = "jdbc:derby:memory:graft_etl_bench;create=true"
    MySqlSink.bootstrap(url, "app", "app", MySqlSink.derbyDdl)
    def articlesStage(stage: String): Seq[String] = Seq(
      s"""CREATE TABLE $stage (
         |  id BIGINT NOT NULL, aid BIGINT NOT NULL,
         |  title VARCHAR(1027) NOT NULL, body BIGINT NOT NULL,
         |  graft_seq BIGINT GENERATED ALWAYS AS IDENTITY)""".stripMargin,
      s"CREATE INDEX ix_${stage}_id ON $stage (id)")
    val t2 = System.nanoTime()
    MySqlSink.exactlyOnceAppend(out.bodies, url, "app", "app", "bodies",
      MySqlSink.derbyStageDdl, Seq("id", "body"), Seq("id"))
    MySqlSink.exactlyOnceAppend(articles, url, "app", "app", "articles",
      articlesStage, Seq("id", "aid", "title", "body"), Seq("id"))
    val secJdbc = (System.nanoTime() - t2) / 1e9

    out.cleanup()
    articles.unpersist(blocking = false)
    println(f"""{"metric":"etl_pages_per_sec","value":${n / sec}%.1f,"pages":$n,"bodies":$nBodies,"articles":$nArticles,"sec":$sec%.2f,"parquet_sec":$secPq%.2f,"parquet_rows_per_sec":${(nBodies + nArticles) / secPq}%.1f,"jdbc_sec":$secJdbc%.2f,"jdbc_rows_per_sec":${(nBodies + nArticles) / secJdbc}%.1f}""")
    spark.stop()
  }
}
