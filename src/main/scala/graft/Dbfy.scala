package graft

import graft.etl.{MySqlSink, WikiEtl}
import org.apache.spark.sql.SparkSession

/** CLI with the reference's flag surface (`/root/reference/dbfy.py:34-68`)
  * so a wiki-mysql user can switch invocations:
  *
  * {{{
  * spark-submit --class graft.Dbfy ... \
  *   --src file:///dumps/enwiki-pages-articles.xml.bz2 \
  *   --host db --port 3306 --db wiki --user wiki --passwd hunter2 \
  *   --limit 10000 --remove_html 1 \
  *   --valid_unichrs 0x0020,0x007e --invalid_unichrs 0x0000,0x001f -y
  * }}}
  *
  * Differences, all deliberate: `--sink parquet --out <dir>` writes the
  * two tables as parquet for clusters without a reachable MySQL;
  * `--n_processes` is accepted-and-ignored (parallelism belongs to the
  * Spark master/conf); an `http(s)://` --src is downloaded to the local
  * temp dir first (`etl.Download.fetch`, mirroring the reference's
  * download-then-parse at `dbfy.py:84-97`; loopback-tested — this image
  * itself has no egress);
  * `--remove_multiple_whitespaces` is accepted for compatibility but was
  * a dead flag in the reference too (SURVEY.md A5e note).
  */
object Dbfy {

  final case class Config(
      src: String = "",
      silent: Boolean = false,
      host: String = "localhost", port: Int = 3306, db: String = "wiki",
      user: String = "wiki", passwd: String = "",
      limit: Option[Int] = None,
      removeHtml: Boolean = true,
      valid: List[(Int, Int)] = Nil,
      invalid: List[(Int, Int)] = Nil,
      sink: String = "jdbc", out: String = "",
      initScript: Option[String] = None)

  /** `0x0020,0x007e` / `32,126` → inclusive range; the reference parses
    * hex when the token contains an `x` (`dbfy.py:20-31`). */
  private[graft] def parseRange(txt: String): (Int, Int) = {
    require(txt.contains(","), s"range must be 'lo,hi': $txt")
    def toInt(s: String): Int =
      if (s.toLowerCase.contains("x")) Integer.parseInt(s.trim.toLowerCase.replaceFirst("0x", ""), 16)
      else s.trim.toInt
    val Array(l, r) = txt.split(",", 2)
    (toInt(l), toInt(r))
  }

  private[graft] def parseArgs(args: Array[String]): Config = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case Nil => c
      case "--src" :: v :: t => loop(t, c.copy(src = v.replaceFirst("^file://", "")))
      case ("--silent" | "-y") :: t => loop(t, c.copy(silent = true))
      case "--n_processes" :: _ :: t => loop(t, c) // Spark owns parallelism
      case "--host" :: v :: t => loop(t, c.copy(host = v))
      case "--port" :: v :: t => loop(t, c.copy(port = v.toInt))
      case "--db" :: v :: t => loop(t, c.copy(db = v))
      case "--user" :: v :: t => loop(t, c.copy(user = v))
      case "--passwd" :: v :: t => loop(t, c.copy(passwd = v))
      case "--charset" :: _ :: t => loop(t, c) // always utf8mb4 (SURVEY §7.6)
      case "--init_script" :: v :: t => loop(t, c.copy(initScript = Some(v)))
      case "--limit" :: v :: t => loop(t, c.copy(limit = Some(v.toInt)))
      case "--remove_html" :: v :: t => loop(t, c.copy(removeHtml = v.toInt != 0))
      case "--valid_unichrs" :: v :: t => loop(t, c.copy(valid = c.valid :+ parseRange(v)))
      case "--invalid_unichrs" :: v :: t => loop(t, c.copy(invalid = c.invalid :+ parseRange(v)))
      case "--remove_multiple_whitespaces" :: t => loop(t, c) // dead flag in the reference
      case "--sink" :: v :: t => loop(t, c.copy(sink = v))
      case "--out" :: v :: t => loop(t, c.copy(out = v))
      case other :: _ => throw new IllegalArgumentException(s"unknown flag: $other")
    }
    val c = loop(args.toList, Config())
    require(c.src.nonEmpty, "--src is required (local path or file:// URL)")
    require(c.sink == "jdbc" || c.sink == "parquet", "--sink must be jdbc or parquet")
    require(c.sink != "parquet" || c.out.nonEmpty, "--sink parquet requires --out <dir>")
    c
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args)
    if (!c.silent) {
      // the reference refuses to proceed without confirmation
      // (/root/reference/dbfy.py:282-291); same gate here, with a
      // fail-safe abort when no terminal is attached
      val console = System.console()
      if (console == null) {
        System.err.println(
          s"[dbfy] refusing to OVERWRITE the target ${c.sink} sink without " +
            "confirmation and no terminal is attached — pass --silent/-y.")
        sys.exit(2)
      }
      val answer = console.readLine(
        s"[dbfy] this OVERWRITES the target ${c.sink} sink. Continue? (y/n): ")
      if (answer == null || !answer.trim.equalsIgnoreCase("y")) sys.exit(1)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = if (etl.Download.isHttp(c.src)) {
      // the fetched file lands on the DRIVER's local temp dir; on a
      // multi-node master executors cannot read it — tell the user
      // instead of failing later with FileNotFoundException per task
      if (!spark.sparkContext.isLocal)
        System.err.println(
          "[dbfy] WARNING: --src was downloaded to the driver's local " +
            "temp dir; on a multi-node cluster pre-download the dump to " +
            "shared storage (HDFS/NFS) and pass that path instead.")
      etl.Download.fetch(c.src)
    } else c.src
    val outp = WikiEtl.run(spark, src, c.removeHtml, c.valid, c.invalid, c.limit)
    // persist articles so the sink write and the count report share one
    // materialization (bodies is already persisted inside the pipeline)
    val articles = outp.articles.persist()
    c.sink match {
      case "parquet" =>
        outp.bodies.write.mode("overwrite").parquet(s"${c.out}/bodies")
        articles.write.mode("overwrite").parquet(s"${c.out}/articles")
      case "jdbc" =>
        val url = s"jdbc:mysql://${c.host}:${c.port}/${c.db}"
        // DDL over a plain connection (custom --init_script or the
        // shipped schema), then append-mode batch inserts — bodies
        // BEFORE articles so the articles→bodies FK is satisfiable.
        val ddls = c.initScript
          .map(p => MySqlSink.splitScript(
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(p)), "UTF-8")))
          .getOrElse(MySqlSink.dropDdl ++
            Seq(MySqlSink.bodiesDdl, MySqlSink.articlesDdl))
        MySqlSink.bootstrap(url, c.user, c.passwd, ddls)
        MySqlSink.writer(outp.bodies, url, "bodies", c.user, c.passwd).save()
        MySqlSink.writer(articles, url, "articles", c.user, c.passwd).save()
    }
    println(s"""{"bodies":${outp.bodies.count()},"articles":${articles.count()}}""")
    articles.unpersist(blocking = false)
    outp.cleanup()
    if (!preexisting) spark.stop() // don't tear down a caller's session
  }
}
