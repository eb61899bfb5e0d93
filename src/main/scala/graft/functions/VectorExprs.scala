package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the vector hot paths (SURVEY.md §4.3
  * escalation rule: built-in functions → custom `Expression` with
  * `doGenCode` → UDF, in that order, and only when the bench demands).
  *
  * The bench demanded: Spark's higher-order `aggregate(zip_with(...))`
  * does not participate in codegen — every similarity pair paid
  * interpreted-lambda overhead (~16 µs/pair at sf0.1). `graft_ldot`
  * compiles to a primitive `long[]` loop inside whole-stage codegen:
  * no boxing, no lambda dispatch, SIMD-friendly.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are ARRAY<BIGINT> by construction at the (internal) call
  // sites; ExpectsInputTypes is private[sql] in Spark 4 so the type
  // contract lives here instead of in an inputTypes declaration
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ldot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(xs.length, ys.length)
    var i = 0
    var s = 0L
    while (i < n) { s += xs(i) * ys(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) { $s += $xs[$i] * $ys[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Idempotently register the expressions on a session so `expr(...)` /
    * SQL can call them. Safe to call per query. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
      (exprs: Seq[Expression]) => LongDot(exprs.head, exprs(1)))
}
