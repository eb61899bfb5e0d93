package graft.etl

import org.apache.spark.sql.DataFrame

/** MySQL bulk-load sink — the Spark replacement for the reference's
  * per-row `INSERT` + per-row `COMMIT` loop (`/root/reference/
  * database.py:59-104`, `dbfy.py:138-151`): one JDBC batch append per
  * partition, `batchsize`d, with Spark task retries standing in for the
  * reference's reconnect-retry choreography (A10).
  *
  * The DDL mirrors `/root/reference/sql/init.sql:5-19` with two upgrades
  * noted in SURVEY.md §7.6: utf8mb4 (the reference's 3-byte utf8 silently
  * dropped astral-plane rows) and BIGINT surrogate ids.
  *
  * Schema application is a `bootstrap` of explicit DDL over a plain JDBC
  * connection followed by `append`-mode writers — Spark's JDBC
  * `overwrite` would DROP and re-create with dialect-inferred column
  * types and the server's default charset, silently losing
  * utf8mb4/MEDIUMTEXT/VARCHAR(1027)/FK/index. No MySQL server exists in
  * the build image, so MySqlSinkSpec exercises the full
  * bootstrap→write→readback→FK path against embedded Derby (same JDBC
  * machinery, Derby-dialect DDL); the MySQL DDL strings are asserted
  * verbatim.
  */
object MySqlSink {

  val bodiesDdl: String =
    """CREATE TABLE IF NOT EXISTS `bodies` (
      |  `id` BIGINT NOT NULL,
      |  `body` MEDIUMTEXT,
      |  PRIMARY KEY (`id`)
      |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""".stripMargin

  val articlesDdl: String =
    """CREATE TABLE IF NOT EXISTS `articles` (
      |  `id` BIGINT NOT NULL,
      |  `aid` BIGINT NOT NULL,
      |  `title` VARCHAR(1027) NOT NULL,
      |  `body` BIGINT NOT NULL,
      |  PRIMARY KEY (`id`),
      |  KEY `ix_articles_title` (`title`),
      |  CONSTRAINT `fk_articles_body` FOREIGN KEY (`body`) REFERENCES `bodies` (`id`)
      |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""".stripMargin

  /** DROP order respects the articles→bodies FK: the referencing table
    * goes first so the constraint never blocks the drop
    * (`/root/reference/sql/init.sql:1-2`). */
  val dropDdl: Seq[String] =
    Seq("DROP TABLE IF EXISTS `articles`", "DROP TABLE IF EXISTS `bodies`")

  /** Execute bootstrap DDL over a plain JDBC connection — the
    * reference's init-script step (`/root/reference/dbfy.py:138-151`).
    * Statements run in order on one connection; the default sequence is
    * DROP (FK-safe order) then CREATE both tables with the exact
    * charset/type/index/FK shapes above. */
  def bootstrap(url: String, user: String, password: String,
                ddls: Seq[String] = dropDdl ++ Seq(bodiesDdl, articlesDdl)): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try ddls.foreach(st.execute) finally st.close()
    } finally conn.close()
  }

  /** The same two-table schema in Derby dialect (no backticks/charset/
    * engine, MEDIUMTEXT→CLOB, inline FK, separate CREATE INDEX) — used
    * by MySqlSinkSpec and q_sink_jdbc to exercise the full
    * bootstrap→write→readback path against the embedded Derby that
    * ships in /opt/spark/jars, since no MySQL server exists here. */
  val derbyDdl: Seq[String] = Seq(
    """CREATE TABLE bodies (
      |  id BIGINT NOT NULL,
      |  body CLOB,
      |  PRIMARY KEY (id))""".stripMargin,
    """CREATE TABLE articles (
      |  id BIGINT NOT NULL,
      |  aid BIGINT NOT NULL,
      |  title VARCHAR(1027) NOT NULL,
      |  body BIGINT NOT NULL,
      |  PRIMARY KEY (id),
      |  CONSTRAINT fk_articles_body FOREIGN KEY (body) REFERENCES bodies (id))""".stripMargin,
    "CREATE INDEX ix_articles_title ON articles (title)")

  /** Derby has no DROP TABLE IF EXISTS; drop best-effort in FK-safe
    * order so repeated runs against the same in-memory db start clean. */
  def derbyReset(url: String, user: String, password: String): Unit =
    Seq("DROP TABLE articles", "DROP TABLE bodies").foreach { d =>
      try bootstrap(url, user, password, Seq(d))
      catch { case _: java.sql.SQLException => () }
    }

  /** Naive-but-sufficient init-script splitter: `;`-separated
    * statements, line comments stripped. (Semicolons inside string
    * literals would mis-split — the reference's init.sql has none.) */
  def splitScript(sql: String): Seq[String] =
    sql.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
      .split(';').map(_.trim).filter(_.nonEmpty).toSeq

  /** Configured JDBC writer (caller invokes `.save()`). `append` mode:
    * the table shape comes from [[bootstrap]], never from Spark's
    * dialect inference. Callers insert `bodies` BEFORE `articles` so
    * the articles→bodies FK is satisfiable row-by-row (graft.Dbfy does). */
  def writer(df: DataFrame, url: String, table: String,
             user: String, password: String,
             batchSize: Int = 5000) =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")
}
