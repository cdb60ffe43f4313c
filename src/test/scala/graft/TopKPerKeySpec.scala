package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator must be indistinguishable from
  * row_number().over(window) + filter — on real tables, random data,
  * multiple partitions, desc/asc orders, and k larger than group size.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("matches window row_number on orders (top-3 per customer)") {
    val viaOp = TopKPerKey.topK(
      Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
      keyNames = Seq("o_custkey"),
      orderSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(canon(viaOp) == canon(viaWindow))
    assert(viaOp.count() > 0)
  }

  test("matches window on random data across partitions, asc order") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)((rnd.nextInt(40).toLong, rnd.nextInt(100000), rnd.nextInt(10)))
      .toDF("key", "value", "tie").repartition(16)
    val viaOp = TopKPerKey.topK(data, Seq("key"),
      Seq(("value", true), ("tie", true)), k = 5, rankName = "r")
    val w = Window.partitionBy("key").orderBy(col("value"), col("tie"))
    val viaWindow = data.withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
    assert(canon(viaOp) == canon(viaWindow))
  }

  test("k larger than group size returns whole groups, ranks dense from 1") {
    val data = Seq((1L, 10), (1L, 5), (2L, 7)).toDF("key", "value")
    val r = TopKPerKey.topK(data, Seq("key"), Seq(("value", true)), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(r == Seq((1L, 5, 1), (1L, 10, 2), (2L, 7, 1)))
  }

  test("fully duplicate rows: same multiset as the window form") {
    // non-total order on purpose: rows that compare EQUAL are entire
    // duplicates, so whichever copies survive, the kept CONTENT is
    // identical to row_number().over(window) <= k — the safe tie case
    // documented in topK's scaladoc (the unsafe case, order-equal rows
    // differing in other columns, is arbitrary in BOTH forms)
    val data = Seq.fill(7)((1L, 5)).toDF("key", "value")
      .union(Seq((1L, 9), (2L, 5), (2L, 5)).toDF("key", "value"))
      .repartition(4)
    val viaOp = TopKPerKey.topK(data, Seq("key"), Seq(("value", false)), k = 3)
    val w = Window.partitionBy("key").orderBy(col("value").desc)
    val viaWindow = data.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(canon(viaOp) == canon(viaWindow))
    // group 1: the 9 ranks first, then two of the identical 5s
    assert(viaOp.filter(col("key") === 1L).count() == 3)
    assert(viaOp.filter(col("key") === 2L).count() == 2)
  }

  test("plan shape: one shuffle on the key, no sort node") {
    val data = spark.range(1000).selectExpr("id % 10 AS key", "id AS value")
    val df = TopKPerKey.topK(data, Seq("key"), Seq(("value", false)), k = 2)
    df.collect() // force AQE-finalized plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
    // the partial (map-side) pruning pass sits BELOW the exchange: the
    // shuffle moves <= k rows per key per upstream partition, not n
    assert(plan.contains("TopKPerKeyPartial"), s"no partial pass in:\n$plan")
    val exchangeAt = plan.indexOf("Exchange")
    assert(exchangeAt >= 0 &&
      plan.indexOf("TopKPerKeyPartial") > exchangeAt,
      s"partial pass must be below the exchange:\n$plan")
  }

  test("partial pass participates in whole-stage codegen, and the " +
       "generated path agrees with the interpreted one") {
    val data = spark.range(20000)
      .selectExpr("id % 37 AS key", "(id * 2654435761) % 100000 AS value",
                  "id AS tie")
    val df = TopKPerKey.topK(data, Seq("key"),
      Seq(("value", true), ("tie", true)), k = 4)
    // fallback=false: a codegen compile error in the partial's generated
    // class THROWS instead of silently interpreting, so collect() below
    // proves the generated insert/drain code actually compiled and ran
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val viaCodegen =
      try canon(df) finally spark.conf.unset("spark.sql.codegen.fallback")
    // AQE hides stage subtrees behind leaf QueryStageExec nodes, so
    // assert on the plan STRING: `*(N) TopKPerKeyPartial` means the
    // partial is inside codegen stage N, and the child Project/Range
    // carrying the SAME stage id means the heap insert runs inside the
    // same generated loop as the scan — not a stage of its own
    val plan = df.queryExecution.executedPlan.toString
    val stageId = "\\*\\((\\d+)\\) TopKPerKeyPartial".r
      .findFirstMatchIn(plan).map(_.group(1))
    assert(stageId.isDefined,
      s"partial heap not inside a WholeStageCodegen stage:\n$plan")
    assert(plan.contains(s"*(${stageId.get}) Project") ||
           plan.contains(s"*(${stageId.get}) Range"),
      s"partial heap fused alone:\n$plan")
    // the final heap (post-shuffle) compiles into its own stage too —
    // "TopKPerKey [" excludes the partial ("TopKPerKeyPartial [")
    assert("\\*\\(\\d+\\) TopKPerKey \\[".r.findFirstIn(plan).isDefined,
      s"final heap not inside a WholeStageCodegen stage:\n$plan")
    val viaInterpreted = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try canon(TopKPerKey.topK(data, Seq("key"),
        Seq(("value", true), ("tie", true)), k = 4))
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    assert(viaCodegen == viaInterpreted)
  }
}
