package graft

import graft.functions.{ChArrayExpr, CityHash64Expr, FormatFloatExpr, LongVectorDot, LongVectorSum}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), then
  * `SELECT vec_dot(a, b)` works from plain SQL — the same expression the
  * DataFrame operators use via [[LongVectorDot.vecDot]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[LongVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => LongVectorDot(children(0), children(1))))
    def unary(name: String, build: Expression => Expression)
        : Seq[Expression] => Expression = { children =>
      if (children.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${children.length}")
      build(children.head)
    }
    ext.injectFunction((
      FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[LongVectorSum].getName, "vec_sum"),
      unary("vec_sum", e => LongVectorSum(e))))
    ext.injectFunction((
      FunctionIdentifier("format_float"),
      new ExpressionInfo(classOf[FormatFloatExpr].getName, "format_float"),
      unary("format_float", FormatFloatExpr.apply)))
    ext.injectFunction((
      FunctionIdentifier("ch_array"),
      new ExpressionInfo(classOf[ChArrayExpr].getName, "ch_array"),
      unary("ch_array", ChArrayExpr.apply)))
    ext.injectFunction((
      FunctionIdentifier("city_hash64"),
      new ExpressionInfo(classOf[CityHash64Expr].getName, "city_hash64"),
      (children: Seq[Expression]) => CityHash64Expr(children)))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // rank-filter → bounded-heap rewrite (Rule[LogicalPlan]): window-
    // idiom SQL plans onto TopKPerKeyExec automatically
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
