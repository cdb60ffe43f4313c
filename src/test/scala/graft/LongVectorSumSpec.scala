package graft

import graft.functions.LongVectorSum.vecSum
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The native element-wise vector-sum aggregate: parity with the
  * posexplode/groupBy form it replaces, SUM-style null semantics,
  * partial-merge correctness across many input partitions, the ragged
  * hard-error contract, and the SQL registration path.
  */
class LongVectorSumSpec extends SparkSpec {
  import spark.implicits._

  test("vec_sum == posexplode + per-dim sum, across many partitions") {
    val df = (1 to 1000).map { i =>
      (i % 7, Seq(i.toLong, -i.toLong, i.toLong * 2, 5L))
    }.toDF("k", "v").repartition(13)
    val got = df.groupBy("k").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Long]](1).toSeq).toMap
    val want = df.select(col("k"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("k", "d").agg(sum("x").as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(_._2).map(_._3).toSeq
      }
    assert(got == want)
  }

  test("null vectors are skipped; all-null group yields NULL") {
    val df = Seq(
      (1, Option(Seq(1L, 2L))), (1, None), (1, Option(Seq(10L, 20L))),
      (2, None)).toDF("k", "v")
    val rows = df.groupBy("k").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) ->
        Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq))
      .toMap
    assert(rows(1).contains(Seq(11L, 22L)))
    assert(rows(2).isEmpty)
  }

  test("ragged vector lengths are a hard error") {
    val df = Seq((1, Seq(1L, 2L)), (1, Seq(1L, 2L, 3L))).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(vecSum(col("v"))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("a null ELEMENT is a hard error, never silently read as 0 (ADVICE_r07)") {
    val df = Seq((1, Seq(Option(1L), None, Option(3L))),
      (1, Seq(Option(4L), Option(5L), Option(6L)))).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(vecSum(col("v"))).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("null element")) ||
        mentions(t.getCause))
    assert(mentions(e), s"expected the null-element error, got: $e")
  }

  test("SQL path: vec_sum registered on the session") {
    GraftBridge.registerFunction(spark, "vec_sum",
      es => graft.functions.LongVectorSum(es.head))
    Seq((1, Seq(1L, 2L)), (1, Seq(3L, 4L))).toDF("k", "v")
      .createOrReplaceTempView("vs_in")
    val out = spark.sql("SELECT vec_sum(v) AS s FROM vs_in GROUP BY k")
      .collect().head.getAs[scala.collection.Seq[Long]](0).toSeq
    assert(out == Seq(4L, 6L))
  }
}
