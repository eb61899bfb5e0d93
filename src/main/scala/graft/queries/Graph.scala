package graft.queries

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped analytics over derived edge tables (extension surface —
  * the reference's wiki corpus is a link graph at heart, and iterative
  * label propagation already powers dedup clustering in
  * `Similarity.hashMinLabels`; this adds the other canonical
  * distributed-graph kernel).
  *
  * PageRank power-iteration step, all-integer arithmetic: ranks are
  * basis points (uniform 10000 per node at iteration 0), a node sends
  * `rank div outdeg` to each successor, and the damped update is
  * `1500 + (85 * inflow) div 100`. Exact in both engines — no float
  * drift across 1000 executors or between Spark and the oracle.
  *
  * Scale shape: the classic two-shuffle step — one aggregate for
  * out-degrees (map-side combining), one shuffle join edges×degrees
  * (both sides already hashed on src), one aggregate of contributions
  * by dst. No broadcast of the rank vector, no driver-side state; a
  * full PageRank is this step under `Checkpoints.ckpt` per iteration,
  * exactly like the CC loop.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // One damped power-iteration step from a uniform rank vector over
    // the order→supplier bipartite edge set. Nodes with no incoming
    // edge have rank 1500 (the teleport floor) and are left implicit;
    // the output lists every node that received inflow.
    "q_pagerank_step" -> ((s, d) => {
      val edges = load(s, d, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_suppkey").as("dst"))
        .distinct()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      edges.join(deg, "src")
        .select(col("dst"), expr("10000 div outdeg").as("c"))
        .groupBy("dst")
        .agg(expr("1500 + (85 * sum(c)) div 100").as("rank_bp"))
        .orderBy("dst")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_pagerank_step" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_orderkey AS src, l_suppkey AS dst FROM lineitem),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)
        |SELECT e.dst,
        |  1500 + (85 * CAST(SUM(10000 // d.outdeg) AS BIGINT)) // 100 AS rank_bp
        |FROM edges e JOIN deg d ON e.src = d.src
        |GROUP BY e.dst ORDER BY e.dst""".stripMargin
  )
}
