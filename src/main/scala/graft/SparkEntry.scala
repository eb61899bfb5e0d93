package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared capability surface (SURVEY.md §2.B):
  * one named entry per operator; `oracleSql` holds the DuckDB-equivalent
  * SQL for every oracle-able query (the driver hash-compares results on
  * the same parquet inputs at sf0.01).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped aggregation (SURVEY.md §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Reference.queries ++
      graft.queries.Text.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Events.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Udaf.queries ++
      graft.queries.Pipeline.queries ++
      graft.sources.Multimodal.queries ++
      graft.queries.Sources.queries ++
      graft.queries.Layout.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Aggregates.oracles ++
      graft.queries.Scalars.oracles ++
      graft.queries.Reference.oracles ++
      graft.queries.Text.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Graph.oracles ++
      graft.queries.Udaf.oracles ++
      graft.queries.Pipeline.oracles ++
      graft.sources.Multimodal.oracles ++
      graft.queries.Sources.oracles ++
      graft.queries.Layout.oracles
}
