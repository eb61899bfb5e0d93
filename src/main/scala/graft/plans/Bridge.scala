package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame-from-LogicalPlan constructor for custom operators.
  * `Dataset.ofRows` is private[sql] in Spark 4, so the call goes through
  * a tiny accessor compiled into the sql.classic package (the standard
  * extension technique when a library adds plan nodes). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.GraftOfRows.apply(spark, plan)
}
