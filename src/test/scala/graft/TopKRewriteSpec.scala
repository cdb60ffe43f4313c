package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

/** TopKRewriteRule: the `Rule[LogicalPlan]` that turns the SQL
  * row_number-rank-filter idiom into the bounded-heap TopKPerKey
  * operator. Runs on an ISOLATED session (`newSession`) so the
  * rule never leaks into other suites' window-form queries. */
class TopKRewriteSpec extends SparkSpec {

  private lazy val session = {
    val s = spark.newSession()
    TopKPerKey.ensureRule(s)
    s
  }

  private def ordersView(): Unit =
    Tables.orders(session, "/root/testdata/sf0.001")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .createOrReplaceTempView("orders_v")

  test("SQL window idiom plans onto TopKPerKeyExec and matches the window answer") {
    ordersView()
    val sql =
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |FROM orders_v""".stripMargin
    val rewritten = session.sql(s"SELECT * FROM ($sql) WHERE rk <= 3")
    rewritten.collect()
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Sort "), s"heap form must not sort:\n$plan")

    // expected = the same SQL on the base session (no rewrite rule)
    Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .createOrReplaceTempView("orders_v")
    val expected = spark.sql(s"SELECT * FROM ($sql) WHERE rk <= 3")
    assert(expected.queryExecution.executedPlan.toString
      .contains("Window"), "control query must use the window operator")
    assert(rewritten.collect().map(_.toString).sorted.toSeq ==
      expected.collect().map(_.toString).sorted.toSeq)
  }

  test("strict < literal normalizes to an inclusive k") {
    ordersView()
    val df = session.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderkey) AS rk
        |  FROM orders_v) WHERE rk < 3""".stripMargin)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.agg(max("rk")).head().getInt(0) == 2)
  }

  test("conservative: multi-expression windows and rn=1 filters stay untouched") {
    ordersView()
    // two window expressions — a rewrite would lose the second column
    val multi = session.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rk,
        |         sum(o_totalprice) OVER (PARTITION BY o_custkey) AS tot
        |  FROM orders_v) WHERE rk <= 2""".stripMargin)
    multi.collect()
    assert(!multi.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // equality predicate is not a top-k bound
    val eq = session.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rk
        |  FROM orders_v) WHERE rk = 1""".stripMargin)
    eq.collect()
    assert(!eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
