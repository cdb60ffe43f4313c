package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two `array<long>`
  * vectors — `Σ a[i]·b[i]` over the common prefix length.
  *
  * Why a custom Expression (SURVEY §5 preference order): the built-in
  * composition `aggregate(zip_with(a, b, _*_), 0L, _+_)` is a
  * higher-order function — CodegenFallback, evaluated interpreted with a
  * lambda allocation per element — and it breaks the surrounding
  * whole-stage-codegen span. This expression generates a tight primitive
  * `long` loop over the two `ArrayData` (no boxing, no allocation) via
  * `doGenCode`, so a 2.5M-pair × 64-dim cosine scan stays inside one
  * codegen'd stage. The interpreted `nullSafeEval` twin keeps
  * non-codegen paths (e.g. filters evaluated during planning) correct.
  *
  * Null semantics: NULL if either array is NULL (BinaryExpression
  * null-intolerant default); array ELEMENTS are assumed non-null, as
  * produced by the quantization projections in graft.operators.
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongVectorDot {
  /** DataFrame-API handle for the expression. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(LongVectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
