package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join technique SURVEY §6 claims for
  * repeated big-big joins at 100 TB: both sides pre-hashed into the
  * same bucket layout on the join key at WRITE time, so the join
  * needs NO exchange of either side at READ time — the shuffle is paid
  * once when the table lands, then amortized over every join after.
  * This spec proves the claim end-to-end on the real tables: bucketed
  * copies of orders/lineitem join with zero Exchange operators in the
  * finalized plan, and the result matches the plain-join answer.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders-lineitem join runs with zero exchanges") {
    // warehouse dir is a static conf on the shared session — use the
    // default (./spark-warehouse, gitignored) and clean via DROP CASCADE
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_items"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not exchange either side; the only allowed
      // exchange is the one the groupBy on a DIFFERENT key needs
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle its sides:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))

      // and the answer is the plain-join answer
      val plain = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_items"))
      assert(joined.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
