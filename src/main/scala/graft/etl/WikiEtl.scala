package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The full reference pipeline, Spark-first (SURVEY.md §3.2 two-phase
  * shape): XML pages → redirect split (A4) → clean content bodies (A5) →
  * deterministic ids (§7.4) → transitive redirect resolution (A7) →
  * `articles`/`bodies` DataFrames matching `/root/reference/sql/init.sql:5-19`.
  *
  * Differences from the reference, all deliberate (SURVEY.md §7.4/§7.6):
  * surrogate ids are deterministic (dense, ordered by `aid`) instead of
  * insertion-order AUTO_INCREMENT; full UTF-8 titles are kept (no silent
  * utf8-3-byte drops); per-row commits become bulk partition writes.
  */
object WikiEtl {

  /** @param cleanup unpersists the pipeline's cached intermediates —
    *   call after the outputs are materialized (written/counted) so
    *   repeated runs on a long-lived session don't accumulate dead
    *   cached partitions. */
  final case class EtlOutput(bodies: DataFrame, articles: DataFrame,
                             cleanup: () => Unit = () => ())

  /** Dense 1-based deterministic id by total order on `sortCols` —
    * the scalable replacement for AUTO_INCREMENT: a range-partitioned
    * sort + `zipWithIndex`, no single-partition window (SURVEY.md §7.4).
    */
  def withDenseId(df: DataFrame, idCol: String, sortCols: String*): DataFrame = {
    val sorted = df.orderBy(sortCols.map(col): _*)
    val schema = StructType(StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** @param xmlPath    pages-articles export XML (or a directory of them)
    * @param removeHtml mirror of `--remove_html` (`/root/reference/dbfy.py:55`)
    * @param valid/invalid unicode ranges (`--valid_unichrs`, A5d)
    */
  /** @param limit stop after the first N namespace-0 pages in dump
    *   order — the reference's serial-path exact semantics (A12,
    *   `/root/reference/dbfy.py:205-208`; the overshooting mp-path
    *   variant is deliberately not reproduced). Applied before the
    *   repartition so "first N" means dump order. */
  def run(
      spark: SparkSession,
      xmlPath: String,
      removeHtml: Boolean = true,
      valid: Seq[(Int, Int)] = Nil,
      invalid: Seq[(Int, Int)] = Nil,
      limit: Option[Int] = None): EtlOutput = {
    val clean = udf((t: String) => WikiText.cleanWikiBody(t, removeHtml, valid, invalid))
    // A dump arrives as one file (bz2: one stream) → the text source
    // yields few input splits. Redistribute BEFORE the expensive
    // parse/clean so all cores work (SURVEY.md §7.3 bz2 note), and
    // persist: both output branches and the redirect join consume this.
    val sourced = WikiXml.pages(spark, xmlPath)
    val pages = limit.fold(sourced)(sourced.limit)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("rdr", regexp_extract(col("text"), WikiText.RedirectRegexSql, 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Phase 1: content pages → cleaned bodies with deterministic ids.
    val content = pages.filter(col("rdr") === "")
      .select(col("title"), col("aid"), clean(col("text")).as("body"))
    val bodies = withDenseId(content, "id", "aid")
      .select(col("id"), col("body"), col("title"), col("aid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contentArticles = bodies.select(col("aid"), col("title"), col("id").as("body_id"))

    // Phase 2: redirects resolved transitively against the content
    // title → body-id map; cycles/dead-ends drop (A7 semantics).
    val redirectPages = pages.filter(col("rdr") =!= "")
      .select(col("title").as("src"), col("rdr").as("dst"), col("aid").as("r_aid"))
    val resolved = Redirects.resolveTransitive(
        redirectPages.select(col("src"), col("dst")),
        contentArticles.select(col("title"), col("body_id").as("bid")))
      .join(redirectPages, "src")
      .select(col("r_aid").as("aid"), col("src").as("title"), col("bid").as("body_id"))

    val articles = withDenseId(
      contentArticles.unionByName(resolved), "id", "aid", "title")
    EtlOutput(
      bodies.select(col("id"), col("body")),
      articles.select(col("id"), col("aid"), col("title"), col("body_id").as("body")),
      cleanup = () => {
        pages.unpersist(blocking = false)
        bodies.unpersist(blocking = false)
      })
  }
}
