package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the one operator in the surface where composing
  * built-ins (equi+range join, then per-key window top-1, see
  * `q_join_asof`) has the wrong *shape*: the composition materializes
  * every (left row × earlier right row) pair before discarding all but
  * one per left row. This operator is the justified case for the full
  * custom-plan route (SURVEY.md §4.3 escalation ladder, step c):
  * logical node → strategy → physical sort-merge exec that keeps O(1)
  * state per key and emits exactly |left| rows.
  *
  * Physical contract: both children hash-clustered on the key and
  * sorted by (key, time) — EnsureRequirements inserts the exchanges and
  * sorts, AQE still applies. One forward merge pass per partition: for
  * each left row, the right cursor advances to the last right row with
  * (key, time) ≤ (left key, left time); a key-equality check at emit
  * discards stale candidates from earlier keys. Ties on right time
  * resolve to the last row in sort order.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder.apply(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder.apply(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyTime = UnsafeProjection.create(Seq(leftKey, leftTime), left.output)
      val rKeyTime = UnsafeProjection.create(Seq(rightKey, rightTime), right.output)
      val lKeyOnly = UnsafeProjection.create(Seq(leftKey), left.output)
      val rKeyOnly = UnsafeProjection.create(Seq(rightKey), right.output)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(leftKey.dataType, leftTime.dataType))
      val kOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftKey.dataType))
      val rBuf = rIt.buffered
      val joined = new JoinedRow
      // downstream operators consume UnsafeRow — project the joined view
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(right.output.size)
      var cand: InternalRow = null
      var candKey: InternalRow = null
      var candTime = 0L
      lIt.map { l =>
        val lkt = lKeyTime(l)
        while (rBuf.hasNext && ktOrd.compare(rKeyTime(rBuf.head), lkt) <= 0) {
          val r = rBuf.next().copy()
          cand = r
          val kt = rKeyTime(r)
          candKey = rKeyOnly(r).copy()
          candTime = kt.getLong(1)
        }
        val matched = cand != null && kOrd.compare(candKey, lKeyOnly(l)) == 0 &&
          // candidates are time-sorted, so if the LATEST one is already
          // older than the lookback bound, so is every earlier one.
          // matched implies a non-null left time (see NULL note in asof),
          // so getLong is safe; TIMESTAMP is micros internally.
          (toleranceMicros < 0L || lkt.getLong(1) - candTime <= toleranceMicros)
        resultProj(joined(l, if (matched) cand else nullRight))
      }
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoin.asof(purchases, clicks, "user_id", "user_id",
  * "p_ts", "c_ts")` — column-name based so callers never touch
  * Catalyst internals. Registers the planner strategy on the session's
  * public `experimental.extraStrategies` hook (idempotent). */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, -1L)

  /** As-of with a bounded lookback: right rows older than
    * `leftTime - toleranceMicros` do not match (null-padded). Time
    * columns must be TIMESTAMP (micros) or BIGINT. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceMicros: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // SQL join semantics: a NULL key or time never matches. The merge
    // ordering sorts NULLS FIRST and compares NULL == NULL, so NULL
    // right rows must be dropped here; NULL left rows are safe — their
    // candidate key-equality check can only hit a (non-null) mismatch,
    // emitting the null-padded row a left join requires.
    import org.apache.spark.sql.functions.col
    val rightClean = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val lp = left.queryExecution.analyzed
    val rp = rightClean.queryExecution.analyzed
    if (toleranceMicros >= 0) {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      val tt = attr(left, leftTime).dataType
      require(tt == TimestampType || tt == LongType,
        s"asof tolerance needs TIMESTAMP/BIGINT time columns, got $tt")
    }
    val plan = AsOfJoinPlan(lp, rp,
      attr(left, leftKey), attr(rightClean, rightKey),
      attr(left, leftTime), attr(rightClean, rightTime), toleranceMicros)
    graft.plans.Bridge.ofRows(spark, plan)
  }
}
