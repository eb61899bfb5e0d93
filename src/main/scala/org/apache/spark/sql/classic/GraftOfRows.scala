package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Same-package accessor for the private[sql] `Dataset.ofRows` —
  * used by graft.plans.Bridge to materialize DataFrames over custom
  * logical operators (see graft.plans.AsOfJoinPlan). */
object GraftOfRows {
  def apply(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
