package graft

import graft.functions.LongVectorDot
import graft.functions.LongVectorDot.vecDot
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Native vec_dot expression: agreement with the built-in HOF
  * composition, null semantics, prefix-length semantics, and SQL
  * registration. */
class LongVectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot == aggregate(zip_with(...)) on random vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextInt(2000).toLong - 1000),
      Seq.fill(64)(rnd.nextInt(2000).toLong - 1000)))
    val df = rows.toDF("a", "b")
    val native = df.select(vecDot(col("a"), col("b"))).collect().map(_.getLong(0))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)).collect().map(_.getLong(0))
    assert(native.toSeq == hof.toSeq)
  }

  test("null array → null; unequal lengths → common-prefix dot") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(vecDot(col("a"), col("b"))).head().getLong(0) == 32L)
    assert(df.select(vecDot(lit(null).cast("array<long>"), col("b")))
      .head().isNullAt(0))
    val uneven = Seq((Seq(1L, 2L, 3L), Seq(10L))).toDF("a", "b")
    assert(uneven.select(vecDot(col("a"), col("b"))).head().getLong(0) == 10L)
  }

  test("SQL registration: SELECT vec_dot(...) after registerFunction") {
    GraftBridge.registerFunction(spark, "vec_dot",
      exprs => LongVectorDot(exprs(0), exprs(1)))
    val r = spark.sql(
      "SELECT vec_dot(array(1L, 2L), array(3L, 4L)) AS d").head().getLong(0)
    assert(r == 11L)
  }

  test("interpreted eval path agrees with codegen path") {
    // force interpreted evaluation through the expression's eval()
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = LongVectorDot(
      Literal.create(Seq(2L, 3L), ArrayType(LongType)),
      Literal.create(Seq(5L, 7L), ArrayType(LongType)))
    assert(e.eval(null) == 31L)
    assert(LongVectorDot(
      Literal.create(null, ArrayType(LongType)),
      Literal.create(Seq(5L), ArrayType(LongType))).eval(null) == null)
  }
}
