package graft.etl

import graft.Checkpoints
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
    * few hops) and is checkpointed (Checkpoints.ckpt) each iteration — lineage stays
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
    // The reference resolves through DICTS (redirects / ttl2bid,
    // dbfy.py:183-185) — one entry per title by construction. Mirror
    // that: unique keys on both join sides, deterministically (min), so
    // a dirty dump with duplicate titles can't fan a frontier row into
    // duplicate hits through the left joins below.
    val edges = redirects.filter(col("src") =!= col("dst"))
      .groupBy(col("src").as("e_src")).agg(min(col("dst")).as("e_dst"))
    val tgt = content.groupBy(col("title").as("c_title"))
      .agg(min(col("bid")).as("c_bid"))

    // One expensive materialization per hop: a single left-join pass
    // tags hits (c_bid non-null) and the next frontier (has an outgoing
    // edge) in the SAME checkpoint, so hits are never recomputed
    // when the final union materializes, the per-hop count is a cheap
    // scan of cached blocks, and lineage resets every hop. Hits are
    // buffered and unioned ONCE at the end (r1 unioned inside the loop,
    // compounding lineage across iterations — VERDICT r1 #4).
    var frontier = redirects.select(col("src"), col("dst").as("cur"))
    val hits = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var iter = 0
    var remaining = 1L
    while (iter < maxIters && remaining > 0) {
      // lazy ckpt (r21): the frontier.count() below is the single next
      // consumer and materializes the hop in its own pass
      val step = Checkpoints.ckptLazy(frontier
        .join(tgt, col("cur") === col("c_title"), "left")
        .join(edges, col("cur") === col("e_src"), "left"),
        soleConsumer = "frontier.count() — the hop's remaining-walkers probe")
      hits += step.filter(col("c_bid").isNotNull)
        .select(col("src"), col("c_bid").as("bid"))
      frontier = step // non-hits with an edge walk on; dead-ends drop
        .filter(col("c_bid").isNull && col("e_dst").isNotNull)
        .select(col("src"), col("e_dst").as("cur"))
      remaining = frontier.count()
      iter += 1
    }
    if (hits.isEmpty) redirects.select(col("src"), lit(0L).as("bid")).limit(0)
    else hits.reduce(_ union _)
  }
}
