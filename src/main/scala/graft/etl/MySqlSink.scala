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
  * No MySQL server exists in the build image, so `write` is exercised in
  * tests only down to the options it configures (MySqlSinkSpec); the DDL
  * strings are asserted verbatim.
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

  /** Configured JDBC writer (caller invokes `.save()`); `overwrite`
    * reproduces the reference's DROP+CREATE bootstrap semantics
    * (`/root/reference/sql/init.sql:1-2`). */
  def writer(df: DataFrame, url: String, table: String,
             user: String, password: String,
             batchSize: Int = 5000, overwrite: Boolean = true) =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")
      // no truncate=true: TRUNCATE fails on a table referenced by a FK
      // (the shipped articles→bodies constraint); plain overwrite DROPs
      // and recreates, matching the reference's DROP+CREATE bootstrap.
      // Callers must drop/overwrite `articles` BEFORE `bodies` so the
      // FK never blocks the drop (graft.Dbfy does).
      .mode(if (overwrite) "overwrite" else "append")
}
