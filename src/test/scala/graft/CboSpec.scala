package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer statistics — the planning substrate SURVEY §6
  * relies on at 100 TB, proven end-to-end on real tables:
  *
  *  1. `ANALYZE TABLE` lands EXACT row counts in the optimized plan's
  *     stats (the numbers join reordering and broadcast gating read);
  *  2. with CBO on, column stats make a selective filter's output
  *     estimate shrink below the broadcast threshold, flipping a
  *     shuffle join (SortMergeJoin) to a BroadcastHashJoin AT PLAN
  *     TIME — without stats the filter inherits its child's full size
  *     and the planner must shuffle both sides.
  *
  * At 100 TB this is the difference between shuffling a multi-TB fact
  * table and broadcasting a few-MB filtered dimension: AQE can rescue
  * the join at RUNTIME from actual sizes, but plan-time stats get the
  * right plan before a single task runs (and feed join reordering,
  * which AQE cannot do). Assertions run on `sparkPlan` — the pre-AQE
  * physical plan — so they prove the static planner's decision.
  */
class CboSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ANALYZE stats are exact; CBO flips a selective join to broadcast") {
    val db = "graft_cbo_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val savedThresh =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").saveAsTable(s"$db.orders_s")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").saveAsTable(s"$db.lineitem_s")
      spark.sql(
        s"ANALYZE TABLE $db.orders_s COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_orderkey")
      spark.sql(s"ANALYZE TABLE $db.lineitem_s COMPUTE STATISTICS")

      // 1. plan stats carry the EXACT row count after ANALYZE
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val orders = spark.table(s"$db.orders_s")
      val actual = orders.count()
      assert(orders.queryExecution.optimizedPlan.stats.rowCount
        .contains(BigInt(actual)),
        "ANALYZE must surface an exact rowCount in plan stats")

      // threshold below the size the NON-CBO planner sees for the full
      // table (on-disk bytes, smaller than CBO's rowCount×width
      // estimate): unfiltered orders may not broadcast, so only a
      // stats-shrunk filter estimate can
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val fullSize = spark.table(s"$db.orders_s")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (fullSize / 2).toString)

      // ~1%-selective predicate from the analyzed column's range
      val Array(mn, mx) = orders
        .agg(min("o_totalprice"), max("o_totalprice"))
        .collect().head.toSeq.map(_.toString.toDouble).toArray
      val cut = mn + (mx - mn) * 0.01
      def joined = spark.table(s"$db.lineitem_s")
        .join(orders.filter(col("o_totalprice") < cut),
          col("l_orderkey") === col("o_orderkey"))

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val without = joined.queryExecution.sparkPlan.toString
      assert(without.contains("SortMergeJoin") &&
        !without.contains("BroadcastHashJoin"),
        s"without CBO the filtered side keeps full size -> shuffle join:\n$without")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      val withCbo = joined.queryExecution.sparkPlan.toString
      assert(withCbo.contains("BroadcastHashJoin"),
        s"with CBO + column stats the filter estimate must broadcast:\n$withCbo")

      // and the stats-driven plan returns the same rows
      assert(joined.count() ==
        Tables.lineitem(spark, dir)
          .join(Tables.orders(spark, dir)
            .filter(col("o_totalprice") < cut),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", savedCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
