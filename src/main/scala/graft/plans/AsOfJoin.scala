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
  * sorts, AQE still applies. One forward merge pass per partition.
  *
  * Directions (pandas `merge_asof` surface):
  *  - `backward` (default): latest right row with time ≤ left time.
  *    Ties on right time resolve to the last row in sort order.
  *  - `forward`: earliest right row with time ≥ left time. Ties resolve
  *    to the first row in sort order.
  *  - `nearest`: whichever of the two is closer in time; an exact
  *    distance tie resolves backward.
  * With `toleranceMicros ≥ 0`, a candidate farther than the tolerance
  * null-pads instead of matching (applies per side for `nearest`).
  *
  * `rightTies` (optional) appends ascending sort keys to the right
  * side's required ordering: with duplicate (key, time) right rows the
  * merge's "first/last row in sort order" would otherwise be whatever
  * order the shuffle happened to deliver — a nondeterministic join.
  * With ties declared, backward's "last" is the greatest tie value and
  * forward's "first" the least, deterministically.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long = -1L,
    direction: String = "backward",
    rightTies: Seq[Expression] = Nil) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, dir, ties) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, dir, ties) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long = -1L,
    direction: String = "backward",
    rightTies: Seq[Expression] = Nil) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder.apply(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder.apply(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ++
      rightTies.map(SortOrder.apply(_,
        org.apache.spark.sql.catalyst.expressions.Ascending)))

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
      // trailing (backward) candidate — persists across left rows; left
      // rows arrive (key, time)-sorted so the cursor never rewinds
      var cand: InternalRow = null
      var candKey: InternalRow = null
      var candTime = 0L

      direction match {
        case "backward" =>
          lIt.map { l =>
            val lkt = lKeyTime(l)
            while (rBuf.hasNext && ktOrd.compare(rKeyTime(rBuf.head), lkt) <= 0) {
              val r = rBuf.next().copy()
              val kt = rKeyTime(r)
              // a null right time must never become the candidate: SQL
              // semantics say it can't match, and reading its time slot
              // would yield garbage 0. The public API pre-filters null
              // right times, but the exec is constructible directly.
              if (!kt.isNullAt(1)) {
                cand = r
                candKey = rKeyOnly(r).copy()
                candTime = kt.getLong(1)
              }
            }
            val matched = cand != null && kOrd.compare(candKey, lKeyOnly(l)) == 0 &&
              // candidates are time-sorted, so if the LATEST one is already
              // older than the lookback bound, so is every earlier one.
              // matched implies a non-null left time (a null left time sorts
              // before every same-key right row, so the key check fails),
              // so getLong is safe; TIMESTAMP is micros internally.
              (toleranceMicros < 0L || lkt.getLong(1) - candTime <= toleranceMicros)
            resultProj(joined(l, if (matched) cand else nullRight))
          }

        case "forward" =>
          lIt.map { l =>
            val lkt = lKeyTime(l)
            // stop at the FIRST right row with (key, time) ≥ (l key, l time);
            // unlike backward nothing needs copying — the candidate is the
            // un-consumed head, valid until the next advance
            while (rBuf.hasNext && ktOrd.compare(rKeyTime(rBuf.head), lkt) < 0)
              rBuf.next()
            // a null left time sorts before every same-key right time, so the
            // head would be that key's EARLIEST row — SQL semantics say null
            // never matches, hence the explicit isNullAt guard (and the
            // mirror guard on the head's own time slot)
            val matched = rBuf.hasNext && !lkt.isNullAt(1) &&
              !rKeyTime(rBuf.head).isNullAt(1) &&
              kOrd.compare(rKeyOnly(rBuf.head), lKeyOnly(l)) == 0 &&
              (toleranceMicros < 0L ||
                rKeyTime(rBuf.head).getLong(1) - lkt.getLong(1) <= toleranceMicros)
            resultProj(joined(l, if (matched) rBuf.head else nullRight))
          }

        case "nearest" =>
          lIt.map { l =>
            val lkt = lKeyTime(l)
            // consume rows ≤ left (key, time) into the backward candidate;
            // the head that remains is the forward candidate
            while (rBuf.hasNext && ktOrd.compare(rKeyTime(rBuf.head), lkt) <= 0) {
              val r = rBuf.next().copy()
              val kt = rKeyTime(r)
              // same null-time guard as backward: a null-time row must
              // not survive as the trailing candidate
              if (!kt.isNullAt(1)) {
                cand = r
                candKey = rKeyOnly(r).copy()
                candTime = kt.getLong(1)
              }
            }
            val lTimeNull = lkt.isNullAt(1)
            val lt = if (lTimeNull) 0L else lkt.getLong(1)
            val bOk = !lTimeNull && cand != null &&
              kOrd.compare(candKey, lKeyOnly(l)) == 0 &&
              (toleranceMicros < 0L || lt - candTime <= toleranceMicros)
            val fOk = !lTimeNull && rBuf.hasNext &&
              !rKeyTime(rBuf.head).isNullAt(1) &&
              kOrd.compare(rKeyOnly(rBuf.head), lKeyOnly(l)) == 0 &&
              (toleranceMicros < 0L ||
                rKeyTime(rBuf.head).getLong(1) - lt <= toleranceMicros)
            val r =
              if (bOk && fOk) {
                // exact-distance tie resolves backward (≤)
                if (lt - candTime <= rKeyTime(rBuf.head).getLong(1) - lt) cand
                else rBuf.head
              } else if (bOk) cand
              else if (fOk) rBuf.head
              else nullRight
            resultProj(joined(l, r))
          }

        case other =>
          throw new IllegalArgumentException(s"unknown as-of direction: $other")
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

  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceMicros: Long): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      toleranceMicros, "backward")

  /** As-of with a bounded lookback/lookahead and a direction
    * (`backward` | `forward` | `nearest`). Right rows farther than
    * `toleranceMicros` from the left time do not match (null-padded).
    * Time columns must be TIMESTAMP (micros) or BIGINT whenever a
    * tolerance is set or direction is `nearest` (both need an integer
    * time distance). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceMicros: Long,
           direction: String): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      toleranceMicros, direction, Nil)

  /** As above, plus `rightTieBreak`: right-side columns appended
    * (ascending) to the merge ordering so that duplicate
    * (key, time) right rows resolve deterministically — backward takes
    * the row with the greatest tie value ("last in sort order"),
    * forward the least ("first in sort order"); `nearest` inherits
    * whichever side wins. Without it, equal-time rows land in shuffle
    * order and the join result can differ run to run. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceMicros: Long,
           direction: String,
           rightTieBreak: Seq[String]): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asof direction must be backward/forward/nearest, got $direction")
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
    // the merge compares left-vs-right keys and times with ONE natural
    // ordering built from the LEFT types — both sides must agree exactly
    // (a BIGINT left time merged against TIMESTAMP right would compare
    // raw bits "successfully" and silently mis-join)
    val lkT = attr(left, leftKey).dataType
    val rkT = attr(rightClean, rightKey).dataType
    require(lkT == rkT, s"asof key types must match, got $lkT vs $rkT")
    val ltT = attr(left, leftTime).dataType
    val rtT = attr(rightClean, rightTime).dataType
    require(ltT == rtT, s"asof time types must match, got $ltT vs $rtT")
    if (toleranceMicros >= 0 || direction == "nearest") {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      require(ltT == TimestampType || ltT == LongType,
        s"asof tolerance/nearest needs TIMESTAMP/BIGINT time columns, got $ltT")
    }
    val plan = AsOfJoinPlan(lp, rp,
      attr(left, leftKey), attr(rightClean, rightKey),
      attr(left, leftTime), attr(rightClean, rightTime),
      toleranceMicros, direction,
      rightTieBreak.map(attr(rightClean, _)))
    graft.plans.Bridge.ofRows(spark, plan)
  }
}
