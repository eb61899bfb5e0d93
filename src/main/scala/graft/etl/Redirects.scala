package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive redirect resolution — the Spark-native form of the
  * reference's `resolve()` chain walk (`/root/reference/dbfy.py:108-121`,
  * driven at `dbfy.py:155-176`). The reference walks driver-memory dicts
  * recursively; here the whole graph lives in DataFrames and each hop is
  * one distributed self-join, so the redirect graph is no longer bounded
  * by driver RAM (SURVEY.md §1.1).
  *
  * Semantics preserved exactly:
  *   - follow the chain until a title hits the content set → its body id
  *   - cycles never reach content → dropped (reference: RecursionError
  *     caught → None, `dbfy.py:118-121`)
  *   - dead-ends (target neither content nor redirect) → dropped
  *     (`dbfy.py:161-166`)
  *   - hop budget `maxIters` plays the role of Python's recursion limit,
  *     and the DuckDB oracle's WITH RECURSIVE uses the same bound so both
  *     engines drop identical rows (SURVEY.md §7.3).
  */
object Redirects {

  /** @param redirects (src, dst) — one outgoing edge per redirect title
    * @param content   (title, bid) — resolved body id per content title
    * @return (src, bid) for every redirect whose chain reaches content
    *
    * Scale: the frontier shrinks every hop (real redirect chains are a
    * few hops) and is `localCheckpoint`ed each iteration — lineage stays
    * O(1) per hop instead of compounding joins across iterations, and
    * the eager checkpoint doubles as the materialization for the
    * early-exit count. Joins against `content` shuffle on the title key;
    * AQE picks broadcast automatically once the frontier shrinks below
    * the threshold.
    */
  def resolveTransitive(
      redirects: DataFrame,
      content: DataFrame,
      maxIters: Int = 20): DataFrame = {
    // Self-loop edges can never resolve (the reference's recursion just
    // blows up and drops them, dbfy.py:118-121); removing them up front
    // turns those walks into dead-ends — same result, and the frontier
    // drains in O(longest chain) iterations instead of burning the full
    // budget keeping cyclic rows alive.
    val edges = redirects.filter(col("src") =!= col("dst"))
      .select(col("src").as("e_src"), col("dst").as("e_dst"))
    val tgt = content.select(col("title").as("c_title"), col("bid").as("c_bid"))

    var frontier = redirects.select(col("src"), col("dst").as("cur")).localCheckpoint()
    var resolved: DataFrame = null
    var iter = 0
    while (iter < maxIters && frontier.count() > 0) {
      val hits = frontier.join(tgt, col("cur") === col("c_title"))
        .select(col("src"), col("c_bid").as("bid"))
      resolved = if (resolved == null) hits else resolved.union(hits)
      frontier = frontier
        .join(tgt, col("cur") === col("c_title"), "left_anti")
        .join(edges, col("cur") === col("e_src")) // inner: dead-ends drop here
        .select(col("src"), col("e_dst").as("cur"))
        .localCheckpoint()
      iter += 1
    }
    if (resolved == null) redirects.select(col("src"), lit(0L).as("bid")).limit(0)
    else resolved
  }
}
