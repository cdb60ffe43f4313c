package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General OLAP capability on the TPC-H-ish tables (SURVEY.md §2.B).
  *
  * Scale notes (§6): dimension tables (region/nation/supplier/customer at
  * TPC-H ratios) are explicitly `broadcast()` so fact-side scans never
  * shuffle for the dim side; fact aggregations groupBy first (map-side
  * combine) and join the small result afterwards where possible. Float
  * aggregates are rounded identically in the DuckDB oracle (§3).
  */
object Olap {

  /** q1_pricing — grouped aggregation over lineitem (TPC-H Q1 shape).
    * One shuffle over a 6-value grouping key; everything else map-side.
    */
  /** All aggregates on EXACT integer arithmetic (q5's double-SUM form
    * was caught diverging 1 ulp at a rounding half-boundary): sums scale
    * the operands' full decimal precision into integers (qty/price ×10²,
    * disc_price ×10⁴, charge ×10⁶ — 2-dec operands multiplied), so the
    * final division has bounded decimals and the round can never sit on
    * a boundary; averages — whose decimal expansion is unbounded — emit
    * as exact ×10⁴ integers via truncating division, identical in both
    * engines, instead of a rounded double.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val qty = round(col("l_quantity") * 100).cast("long")
    val price = round(col("l_extendedprice") * 100).cast("long")
    val disc = round(col("l_discount") * 100).cast("long")
    val tax = round(col("l_tax") * 100).cast("long")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        qty.as("q"), price.as("p"), disc.as("d"), tax.as("t"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("q").cast("double") / 100d, 2).as("sum_qty"),
        round(sum("p").cast("double") / 100d, 2).as("sum_base_price"),
        round(sum(col("p") * (lit(100L) - col("d"))).cast("double") / 10000d, 4)
          .as("sum_disc_price"),
        round(sum(col("p") * (lit(100L) - col("d")) * (lit(100L) + col("t")))
          .cast("double") / 1000000d, 6).as("sum_charge"),
        expr("(sum(q) * 100) div count(1)").as("avg_qty_x10000"),
        expr("(sum(p) * 100) div count(1)").as("avg_price_x10000"),
        expr("(sum(d) * 100) div count(1)").as("avg_disc_x10000"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String = {
    val q = "CAST(round(l_quantity*100) AS BIGINT)"
    val p = "CAST(round(l_extendedprice*100) AS BIGINT)"
    val d = "CAST(round(l_discount*100) AS BIGINT)"
    val t = "CAST(round(l_tax*100) AS BIGINT)"
    s"""SELECT l_returnflag, l_linestatus,
       |       round(CAST(SUM($q) AS DOUBLE) / 100, 2) AS sum_qty,
       |       round(CAST(SUM($p) AS DOUBLE) / 100, 2) AS sum_base_price,
       |       round(CAST(SUM($p * (100 - $d)) AS DOUBLE) / 10000, 4) AS sum_disc_price,
       |       round(CAST(SUM($p * (100 - $d) * (100 + $t)) AS DOUBLE) / 1000000, 6) AS sum_charge,
       |       CAST(SUM($q) AS BIGINT) * 100 // COUNT(*) AS avg_qty_x10000,
       |       CAST(SUM($p) AS BIGINT) * 100 // COUNT(*) AS avg_price_x10000,
       |       CAST(SUM($d) AS BIGINT) * 100 // COUNT(*) AS avg_disc_x10000,
       |       COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  /** q3_topk_join — customer⋈orders⋈lineitem, revenue per order, top 10
    * (TPC-H Q3 shape). Scale audit (round 2): only the filtered customer
    * DIM is broadcast; orders is fact-scale, so orders⋈lineitem is a
    * shuffle join on orderkey (AQE may still convert it at small SF). The
    * final orderBy+limit executes as TakeOrdered — no global sort.
    */
  def q3TopkJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      // revenue = Σ price·(1−disc) carries EXACTLY 4 decimal digits
      // (2-dec price × 2-dec discount) → exact ×10⁴ integer sum, then
      // round(.,4) which cannot land on a half boundary. A double SUM
      // rounded to 2 was observed to diverge 1 ulp at sf0.001.
      .agg(round((sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long"))))
        .cast("double") / 10000d, 4).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000, 4) AS revenue,
      |       epoch_us(o_orderdate) AS o_orderdate_us
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** q5_region_join — 6-way join (TPC-H Q5 shape): revenue per nation for
    * orders whose customer and supplier share the nation. Scale audit
    * (round 2): only region⋈nation (a few hundred rows at ANY scale) is
    * force-broadcast. customer and supplier GROW with SF (billions of rows
    * at 100 TB) so they are size-gated instead — plain joins that
    * autoBroadcastJoinThreshold/AQE convert to broadcast when (and only
    * when) they actually fit. Join tree: orders⋈customer first (both keyed
    * on custkey, smaller than lineitem), then lineitem once on orderkey,
    * then supplier on suppkey — lineitem passes through a single shuffle
    * chain rather than two.
    */
  def q5RegionJoin(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(li, li("l_orderkey") === ord("o_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === dims("n_nationkey"))
      .groupBy("n_name", "r_name")
      // same exact ×10⁴ integer revenue as q3 — the double-SUM round(.,2)
      // form diverged 1 ulp from the oracle at sf0.001
      .agg(round((sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long"))))
        .cast("double") / 10000d, 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q5Sql: String =
    """SELECT n_name, r_name,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000, 4) AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem, orders, customer, supplier, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name, r_name""".stripMargin

  /** q_window_running — running revenue + per-supplier rank over shipdate.
    * Partition key = l_suppkey (bounded cardinality) so window state stays
    * small per partition at any scale.
    */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    // — the cents column completes a TOTAL order (zero (supp, ship, ok,
    // ln, cents) duplicates verified at sf0.1); without it row_number
    // and the running sum are tie-order-dependent across engines
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val ord = Window.partitionBy("l_suppkey")
      .orderBy(col("ship_us"), col("l_orderkey"), col("l_linenumber"),
        col("cents"))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        cents.as("cents"))
      .withColumn("rn", row_number().over(ord))
      // exact cents under the running window sum — same boundary-proof
      // rationale as q1/q5
      .withColumn("running_rev",
        round(sum(col("cents"))
          .over(ord.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / 100d, 2))
      .filter(col("rn") <= 100)
      .drop("cents")
  }

  val qWindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |       epoch_us(l_shipdate) AS ship_us,
      |       row_number() OVER w AS rn,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) OVER (w
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100, 2) AS running_rev
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY epoch_us(l_shipdate), l_orderkey, l_linenumber,
      |                      CAST(round(l_extendedprice*100) AS BIGINT))
      |QUALIFY rn <= 100""".stripMargin

  /** q_window_ranks — the analytic rank-function family in one window
    * pass: rank, dense_rank, percent_rank, cume_dist, ntile(4) over
    * events per type, value-ordered. All five share ONE window spec so
    * Spark plans a single sort+Window node (one shuffle on event_type);
    * the (cents, event_id) ordering is a total order, so every rank is
    * deterministic and the doubles (percent_rank/cume_dist are exact
    * small rationals divided identically in both engines) hash-compare
    * bit-for-bit after round(6).
    */
  def qWindowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("prk", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w))
  }

  val qWindowRanksSql: String =
    """SELECT event_type, event_id,
      |       CAST(round(value*100) AS BIGINT) AS cents,
      |       rank() OVER w AS rk,
      |       dense_rank() OVER w AS drk,
      |       round(percent_rank() OVER w, 6) AS prk,
      |       round(cume_dist() OVER w, 6) AS cd,
      |       CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY event_type
      |             ORDER BY CAST(round(value*100) AS BIGINT), event_id)""".stripMargin

  /** q_topk_per_group — top-3 orders per customer by totalprice with a
    * deterministic tiebreak on o_orderkey. Runs on the custom
    * [[graft.plans.TopKPerKey]] operator: bounded per-key heaps instead
    * of the full per-partition sort `row_number().over(window)` forces —
    * O(n log k) and O(k·keys) memory, one hash shuffle, no Sort node
    * (TopKPerKeySpec proves result equality with the window form).
    */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topK(
      Tables.orders(spark, dir)
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      keyNames = Seq("o_custkey"),
      orderSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3, rankName = "rk")

  val qTopkPerGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       row_number() OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |FROM orders
      |QUALIFY rk <= 3""".stripMargin

  /** q_sessionize — 30-min-gap sessionization per user: lag to detect
    * session starts, running sum to number sessions, then per-session
    * rollup. Two window passes over the same (user_id, ts) partitioning —
    * Catalyst reuses the single sort+shuffle.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("t_start"),
        max("ts_us").as("t_end"),
        round(sum(round(col("value") * 100).cast("long"))
          .cast("double") / 100d, 2).as("session_value"))
  }

  val qSessionizeSql: String =
    """WITH s AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS prev_ts
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR ts_us - prev_ts > 1800 * 1000000
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM s),
      |g AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM m)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |       min(ts_us) AS t_start, max(ts_us) AS t_end,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS session_value
      |FROM g GROUP BY user_id, session_id""".stripMargin

  /** q_percentiles — exact interpolated percentiles (p50/p95/p99) of
    * extended price per return flag. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the standard linear-interpolation definition
    * (rank = p·(n−1)), so the doubles agree bit-for-bit. Exact
    * percentiles sort each group — fine for bounded group counts, but
    * the exact aggregate buffers EVERY value per group: at 100 TB that
    * is an executor OOM, so the production path is
    * [[qPercentilesApprox]] (bounded-memory sketch). The exact form
    * stays as the oracle-checked correctness baseline at test SF.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      // ONE array-percentile aggregate (r14): one value buffer + one
      // sort per group instead of three, identical interpolation
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))")
          .as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p95"),
        round(col("ps").getItem(2), 4).as("p99"),
        col("n"))

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q_percentiles_approx — the 100 TB percentile path:
    * `approx_percentile` (Greenwald-Khanna quantile summaries — bounded
    * O(1/ε · log εn) memory per group regardless of group size, merged
    * map-side), vs the exact `percentile` which buffers the whole group.
    *
    * Sketch internals differ across engines (Spark GK vs DuckDB
    * t-digest), so raw sketch outputs can never be hash-compared.
    * Instead the CHECKED output is engine-portable by construction: each
    * engine compares ITS OWN sketch against ITS OWN exact quantile and
    * emits whether the relative error is inside the 5% band — a bound
    * both sketches beat by orders of magnitude (Spark's accuracy=10000
    * caps rank error at 0.01%). The exact companion aggregate here
    * exists only to validate the sketch at test SF; the production
    * query is the approx aggregate alone.
    */
  def qPercentilesApprox(spark: SparkSession, dir: String): DataFrame = {
    def ok(p: Double, name: String) = {
      val approx = expr(s"approx_percentile(l_extendedprice, $p, 10000)")
      val exact = expr(s"percentile(l_extendedprice, $p)")
      (abs(approx - exact) / exact < 0.05).as(name)
    }
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(ok(0.5, "p50_ok"), ok(0.95, "p95_ok"), ok(0.99, "p99_ok"),
        count(lit(1)).as("n"))
  }

  val qPercentilesApproxSql: String =
    """SELECT l_returnflag,
      |       abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
      |         / quantile_cont(l_extendedprice, 0.5) < 0.05 AS p50_ok,
      |       abs(approx_quantile(l_extendedprice, 0.95) - quantile_cont(l_extendedprice, 0.95))
      |         / quantile_cont(l_extendedprice, 0.95) < 0.05 AS p95_ok,
      |       abs(approx_quantile(l_extendedprice, 0.99) - quantile_cont(l_extendedprice, 0.99))
      |         / quantile_cont(l_extendedprice, 0.99) < 0.05 AS p99_ok,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q_pivot — wide-format rollup: one row per customer segment, one
    * column per order priority, integer-cents revenue sums. The pivot
    * value list is FIXED (a dynamic pivot would need a driver-side
    * distinct scan and yields nondeterministic schemas); Spark expands
    * it into conditional aggregates — one shuffle, map-side combine —
    * which is also exactly how the oracle expresses it.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val priorities =
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("c_mktsegment")
      .pivot("o_orderpriority", priorities)
      .agg(round(sum("cents").cast("double") / 100d, 2))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
        "4-NOT SPECIFIED" -> "unspecified", "5-LOW" -> "low"))
  }

  val qPivotSql: String =
    """SELECT c_mktsegment,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100, 2) AS urgent,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100, 2) AS high,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100, 2) AS medium,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100, 2) AS unspecified,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100, 2) AS low
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** q_semi_join — customers having at least one URGENT order, via a
    * LEFT SEMI join: the probe side streams once, no fact-side
    * duplication, output bounded by the customer side — the right
    * physical shape for EXISTS at any scale (vs a join+distinct which
    * shuffles the match multiplicity for nothing).
    */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT')""".stripMargin

  /** q_anti_join — customers with no URGENT order (LEFT ANTI): the
    * NOT-EXISTS shape, same single-pass probe properties as the semi
    * join. Counting per segment keeps the checked output small.
    */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs_no_urgent"),
        min("c_custkey").as("min_custkey"))

  val qAntiJoinSql: String =
    """SELECT c_mktsegment,
      |       COUNT(*) AS n_custs_no_urgent,
      |       min(c_custkey) AS min_custkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** q_rollup — revenue by (returnflag, linestatus) with ROLLUP
    * subtotals and grand total; grouping_id disambiguates subtotal rows
    * from real NULL groups (bit semantics identical in both engines).
    * Rollup is a single shuffle — Spark expands grouping sets map-side.
    * Integer-cents sums keep every rollup level exact across engines.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("cents").cast("double") / 100d, 2).as("revenue"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue,
      |       COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** q_cube — the full grouping-set lattice over (returnflag,
    * linestatus): all four aggregation levels (detail, each single-axis
    * subtotal, grand total) in ONE shuffle — Spark expands the lattice
    * map-side exactly as for rollup, so adding the cube's extra sets
    * costs partial-aggregation width, not extra passes. grouping_id
    * disambiguates subtotal rows from real NULL groups; integer-cents
    * sums keep every level exact.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("cents").cast("double") / 100d, 2).as("revenue"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue,
      |       COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** q_promo_revenue — TPC-H Q14 shape: fraction of monthly revenue from
    * PROMO parts. Plan: the shipdate filter pushes to the lineitem scan,
    * `part` is a dimension (grows ~SF but far slower than lineitem) so
    * the join is size-gated, and the promo/total split is a conditional
    * aggregate in ONE pass. Exact ×10⁴ integer revenue; the final
    * promo/total ratio is one double division with identical operands,
    * scaled ×10⁶ and floored so the output is an exact integer in both
    * engines (a rounded ratio of near-arbitrary doubles is exactly the
    * 1-ulp trap the integer rules exist for).
    */
  def qPromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = sum(round(col("l_extendedprice") * 100).cast("long")
      * (lit(100L) - round(col("l_discount") * 100).cast("long")))
    val promoRev = sum(when(col("p_type") === "PROMO",
      round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .otherwise(0L))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(promoRev.as("promo_x10000"), rev.as("total_x10000"))
      .select(col("promo_x10000"), col("total_x10000"),
        expr("(promo_x10000 * 1000000) div total_x10000")
          .as("promo_ratio_x1e6"))
  }

  val qPromoRevenueSql: String =
    """WITH j AS (
      |  SELECT CAST(round(l_extendedprice*100) AS BIGINT)
      |           * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev,
      |         p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-02-01'),
      |a AS (
      |  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_x10000,
      |         CAST(SUM(rev) AS BIGINT) AS total_x10000
      |  FROM j)
      |SELECT promo_x10000, total_x10000,
      |       (promo_x10000 * 1000000) // total_x10000 AS promo_ratio_x1e6
      |FROM a""".stripMargin

  /** q_big_orders — TPC-H Q18 shape (large-volume customers): orders
    * whose total lineitem quantity exceeds a threshold, with customer
    * detail. The plan lesson: AGGREGATE FIRST — lineitem collapses to
    * per-order sums map-side (one shuffle on orderkey), the HAVING cut
    * keeps ~1% of orders, and only that small survivor set joins
    * orders⋈customer (AQE broadcasts it). Join-then-aggregate would
    * shuffle the full fact table through both joins first — the
    * difference between GBs and TBs on the wire at scale.
    */
  def qBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        round(col("l_quantity") * 100).cast("long").as("qty_cents"))
      .groupBy("l_orderkey")
      .agg(sum("qty_cents").as("qty_cents"))
      .filter(col("qty_cents") > 250L * 100L)
    bigOrders
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        round(round(col("o_totalprice") * 100).cast("long")
          .cast("double") / 100d, 2).as("total_price"),
        round(col("qty_cents").cast("double") / 100d, 2).as("sum_qty"))
  }

  val qBigOrdersSql: String =
    """WITH b AS (
      |  SELECT l_orderkey,
      |         CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) > 250 * 100)
      |SELECT c_custkey, c_name, o_orderkey,
      |       epoch_us(o_orderdate) AS o_orderdate_us,
      |       round(CAST(CAST(round(o_totalprice*100) AS BIGINT) AS DOUBLE) / 100.0, 2) AS total_price,
      |       round(CAST(qty_cents AS DOUBLE) / 100.0, 2) AS sum_qty
      |FROM b JOIN orders ON l_orderkey = o_orderkey
      |       JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** q_asof_join — AS-OF join (ClickHouse `ASOF JOIN`, kdb `aj`): for
    * every `purchase` event, the latest `click` by the same user at or
    * before it. Spark has no asof operator; the scalable re-expression
    * is NO JOIN AT ALL — union both sides (they already live in one
    * table here), one window pass per user carrying the last click
    * forward (`last(..., ignoreNulls)` — codegen'd, single shuffle on
    * user_id), then keep the purchase rows. This beats the
    * join-then-filter-then-rank form (which shuffles BOTH sides and
    * explodes matches before ranking) and is exactly how you'd asof-join
    * two 100 TB streams: union-tag, one co-partitioned window, filter.
    * Events with no prior click surface with NULL asof columns (left
    * asof semantics).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("click_ts_us",
        last(when(col("event_type") === "click", col("ts_us")), true).over(w))
      .withColumn("click_cents",
        last(when(col("event_type") === "click", col("cents")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_ts_us"),
        round(col("click_cents").cast("double") / 100d, 2).as("click_value"),
        // integer division in BOTH engines: Spark's double→long cast
        // truncates while DuckDB's rounds, so a float division here
        // would diverge on .5+ fractions
        expr("(ts_us - click_ts_us) div 1000000").as("gap_s"))
  }

  val qAsofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |m AS (
      |  SELECT *,
      |         last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
      |           OVER w AS click_ts_us,
      |         last_value(CASE WHEN event_type = 'click' THEN cents END IGNORE NULLS)
      |           OVER w AS click_cents
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ts_us, click_ts_us,
      |       round(CAST(click_cents AS DOUBLE) / 100.0, 2) AS click_value,
      |       (ts_us - click_ts_us) // 1000000 AS gap_s
      |FROM m WHERE event_type = 'purchase'""".stripMargin

  /** q_range_join — interval-containment join (the "range join" every
    * native engine special-cases): which `purchase` events fall inside a
    * same-user CLICK session's ATTRIBUTION interval — the session span
    * padded ±30 min (without padding, this data's mostly-single-click
    * sessions are zero-width points and containment is vacuous)? A naive
    * formulation is an inequality join — O(n·m) per user with no
    * equality key for hashing. The scalable re-expression BUCKETS time:
    * each session interval explodes into the 1h buckets it covers
    * (bounded by session length — sessions are gap-bounded so this is a
    * small constant), purchases map to their single bucket, and the
    * join becomes EQUALITY on (user_id, bucket) + an exact containment
    * filter + pair dedup. Shuffle keys are (long, long); work is
    * proportional to true overlaps, not user-cross-products — the
    * standard distributed range-join plan (same family as the LSH/band
    * candidate generation used by the dedup operators).
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bucketSize = 3600L * 1000000L // 1h in µs
    val clicks = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    // 30-min-gap sessions over clicks (same rule as q_sessionize)
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sessions = clicks
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg((min("ts_us") - 1800L * 1000000L).as("t_start"),
        (max("ts_us") + 1800L * 1000000L).as("t_end"))
    val sessionBuckets = sessions
      .withColumn("bucket", explode(sequence(
        (col("t_start") / bucketSize).cast("long"),
        (col("t_end") / bucketSize).cast("long"))))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        unix_micros(col("ts")).as("p_ts"))
      .withColumn("p_bucket", (col("p_ts") / bucketSize).cast("long"))
    sessionBuckets.join(purchases,
        col("user_id") === col("p_user") && col("bucket") === col("p_bucket"))
      .filter(col("p_ts") >= col("t_start") && col("p_ts") <= col("t_end"))
      // a purchase can match one session through at most one bucket
      // (buckets within a session are distinct) — but dedup anyway so
      // the contract survives overlapping-interval inputs
      .select(col("user_id"), col("session_id"), col("p_event"),
        col("p_ts"), col("t_start"), col("t_end"))
      .distinct()
  }

  val qRangeJoinSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'click'),
      |m AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                   OR ts_us - lag(ts_us) OVER w > 1800 * 1000000
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |g AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM m),
      |s AS (
      |  SELECT user_id, session_id,
      |         min(ts_us) - 1800 * 1000000 AS t_start,
      |         max(ts_us) + 1800 * 1000000 AS t_end
      |  FROM g GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id AS p_user, event_id AS p_event, epoch_us(ts) AS p_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT DISTINCT s.user_id, s.session_id, p.p_event, p.p_ts,
      |       s.t_start, s.t_end
      |FROM s JOIN p ON s.user_id = p.p_user
      |       AND p.p_ts >= s.t_start AND p.p_ts <= s.t_end""".stripMargin

  /** q_distinct_approx — HyperLogLog distinct counting, the cardinality
    * sketch of every 100 TB rollup (exact COUNT DISTINCT shuffles every
    * key; HLL merges fixed 2^p-byte registers map-side). Sketch
    * internals differ across engines (Spark HLL++ vs DuckDB HLL), so —
    * exactly like q_percentiles_approx — the CHECKED output is each
    * engine validating ITS OWN sketch against ITS OWN exact count
    * within the documented error band (rsd=0.02 here; 5% asserted).
    * The production query is the approx aggregate alone.
    */
  def qDistinctApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        (abs(approx_count_distinct(col("user_id"), 0.02).cast("double") -
          countDistinct(col("user_id")).cast("double")) /
          countDistinct(col("user_id")).cast("double") < 0.05).as("approx_ok"),
        count(lit(1)).as("n_events"))

  val qDistinctApproxSql: String =
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
      |           - CAST(COUNT(DISTINCT user_id) AS DOUBLE))
      |         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) < 0.05 AS approx_ok,
      |       COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** q_stream_window_agg — tumbling 1h windowed aggregation per
    * event_type: the batch twin of the Structured Streaming pipeline in
    * graft.streaming (same groupBy(window(...)) plan shape, so batch and
    * streaming results are interchangeable — streaming parity is spec'd
    * in StreamingSpec).
    */
  def qStreamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 100).cast("long"))
          .cast("double") / 100d, 2).as("total"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"), col("n"), col("total"))

  val qStreamWindowAggSql: String =
    """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS w_start_us,
      |       event_type, COUNT(*) AS n,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q_outer_join — LEFT OUTER join preserving unmatched rows (ClickHouse
    * `LEFT JOIN` / SQL left outer): customers with NO orders survive with
    * null order columns and are counted per nation. Scale shape:
    * aggregate orders per custkey FIRST (map-side combinable, output ≈
    * |customers| ≪ |orders|), then one shuffle join on custkey — the
    * outer side never carries order-level fan-out, and the final
    * per-nation rollup is bounded (25 rows).
    */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("spend_cents"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("order_cnt").isNull, 1L).otherwise(0L)).as("n_no_orders"),
        coalesce(sum(col("order_cnt")), lit(0L)).as("n_orders"),
        round(coalesce(sum(col("spend_cents")), lit(0L)).cast("double") / 100d, 2)
          .as("total_spend"))
  }

  val qOuterJoinSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, COUNT(*) AS order_cnt,
      |         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents
      |  FROM orders GROUP BY 1)
      |SELECT c_nationkey, COUNT(*) AS n_customers,
      |       CAST(SUM(CASE WHEN pc.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders,
      |       CAST(COALESCE(SUM(order_cnt), 0) AS BIGINT) AS n_orders,
      |       round(CAST(COALESCE(SUM(spend_cents), 0) AS DOUBLE) / 100, 2) AS total_spend
      |FROM customer LEFT JOIN pc ON c_custkey = pc.o_custkey
      |GROUP BY c_nationkey""".stripMargin

  /** q_set_ops — INTERSECT / EXCEPT set algebra (ClickHouse supports both):
    * customers who ordered in 1996 vs 1997, partitioned into both / only-A
    * / only-B cohorts. Each set is an aggregate-first DISTINCT on custkey
    * (map-side partial dedup), the set ops hash-join on the 8-byte key,
    * and the output is three counters — bounded at any corpus size.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def buyers(yearN: Int): DataFrame =
      Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")) === yearN)
        .select(col("o_custkey")).distinct()
    val a = buyers(1996)
    val b = buyers(1997)
    def counted(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("cohort"), col("n"))
    counted(a.intersect(b), "both")
      .unionAll(counted(a.except(b), "only_1996"))
      .unionAll(counted(b.except(a), "only_1997"))
  }

  val qSetOpsSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE date_part('year', o_orderdate) = 1996),
      |     b AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE date_part('year', o_orderdate) = 1997)
      |SELECT 'both' AS cohort, COUNT(*) AS n
      |FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1996', COUNT(*)
      |FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1997', COUNT(*)
      |FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""".stripMargin

  /** q_avg_threshold — TPC-H Q17 shape (correlated-subquery decorrelated):
    * revenue from lineitems whose quantity is below 20% of their part's
    * average. The correlated `q < 0.2·avg(q)` becomes an aggregate-join:
    * filter part to the watched brands, join lineitem once, aggregate that
    * SAME subtree per partkey, join the aggregate back — Spark reuses the
    * shuffle (both branches exchange on l_partkey; ReusedExchange in the
    * plan). The threshold compare is EXACT integer cross-multiplication
    * (5·q·n < Σq, all nonnegative) — no division, no float, no rounding
    * rule to diverge between engines.
    */
  def qAvgThreshold(spark: SparkSession, dir: String): DataFrame = {
    val pk = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#4", "Brand#19"))
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"))
      .join(pk, col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("ag_partkey"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n_q"))
    li.join(perPart, col("l_partkey") === col("ag_partkey"))
      .filter(lit(5L) * col("q") * col("n_q") < col("sum_q"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("p")).cast("double") / 100d, 2).as("low_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  val qAvgThresholdSql: String =
    """WITH li AS (
      |  SELECT l_partkey, p_brand,
      |         CAST(round(l_quantity*100) AS BIGINT) AS q,
      |         CAST(round(l_extendedprice*100) AS BIGINT) AS p
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand IN ('Brand#4', 'Brand#19')),
      |ag AS (
      |  SELECT l_partkey AS ag_partkey, CAST(SUM(q) AS BIGINT) AS sum_q,
      |         COUNT(*) AS n_q
      |  FROM li GROUP BY 1)
      |SELECT p_brand,
      |       round(CAST(CAST(SUM(p) AS BIGINT) AS DOUBLE) / 100, 2) AS low_qty_revenue,
      |       COUNT(*) AS n_items
      |FROM li JOIN ag ON l_partkey = ag_partkey
      |WHERE 5 * q * n_q < sum_q
      |GROUP BY p_brand""".stripMargin

  /** q_market_share — TPC-H Q8 shape: one nation's share of yearly order
    * revenue as a conditional-aggregate ratio. customer⋈nation is the
    * size-gated dim join (nation force-broadcast — fixed 25 rows at any
    * SF); orders⋈customer shuffles on custkey at scale. Share emitted as
    * an exact parts-per-million integer via truncating division on
    * nonnegative operands (identical in both engines — floor == trunc for
    * nonneg, the division-parity rule).
    */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("p"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(
        round(sum(col("p")).cast("double") / 100d, 2).as("total_revenue"),
        round(sum(when(col("n_name") === "NATION_3", col("p")).otherwise(0L))
          .cast("double") / 100d, 2).as("nation_revenue"),
        expr("sum(CASE WHEN n_name = 'NATION_3' THEN p ELSE 0 END) * 1000000 div sum(p)")
          .as("share_ppm"))
  }

  val qMarketShareSql: String =
    """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
      |       round(CAST(CAST(SUM(p) AS BIGINT) AS DOUBLE) / 100, 2) AS total_revenue,
      |       round(CAST(CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN p ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2)
      |         AS nation_revenue,
      |       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN p ELSE 0 END) AS BIGINT) * 1000000
      |         // CAST(SUM(p) AS BIGINT) AS share_ppm
      |FROM (SELECT o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS p, o_orderdate
      |      FROM orders) o
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** q_window_frames — the window FRAME family in one pass per frame kind:
    * a ROWS sliding frame (trailing 4 rows), a ROWS running prefix
    * (first_value / nth_value), and a RANGE frame over day offsets
    * (trailing 2 calendar days, ties = peers included). Both ROWS windows
    * share one (suppkey)-partitioned sort; the RANGE window reuses the
    * same exchange (same partition key, different order column) — one
    * shuffle total, state per row is O(frame), not O(partition).
    */
  def qWindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("p"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("timestamp"))
          .cast("long").as("ship_day"))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    // (118k duplicate pairs at sf0.1) — the price column completes a
    // TOTAL order (verified: zero (supp,ok,ln,day,p) duplicates), without
    // which the ROWS frames are tie-order-dependent and the two engines
    // legally disagree (caught as a once-in-a-while sf0.1 hash flake)
    val rows = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_day"), col("l_orderkey"), col("l_linenumber"), col("p"))
    val range = Window.partitionBy(col("l_suppkey")).orderBy(col("ship_day"))
    base
      .withColumn("sliding_cents",
        sum(col("p")).over(rows.rowsBetween(-3, Window.currentRow)))
      .withColumn("first_cents",
        first(col("p")).over(rows.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nth2_cents",
        coalesce(nth_value(col("p"), 2)
          .over(rows.rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(-1L)))
      .withColumn("day2_cents",
        sum(col("p")).over(range.rangeBetween(-1, Window.currentRow)))
      .drop("p")
  }

  val qWindowFramesSql: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey, ship_day,
      |       CAST(SUM(p) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS sliding_cents,
      |       first_value(p) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS first_cents,
      |       COALESCE(nth_value(p, 2) OVER
      |         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS nth2_cents,
      |       CAST(SUM(p) OVER (PARTITION BY l_suppkey ORDER BY ship_day
      |         RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS day2_cents
      |FROM (SELECT l_orderkey, l_linenumber, l_suppkey,
      |             CAST(round(l_extendedprice*100) AS BIGINT) AS p,
      |             date_diff('day', DATE '1995-01-01', l_shipdate) AS ship_day
      |      FROM lineitem)
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY ship_day, l_orderkey, l_linenumber, p)""".stripMargin

  /** q_mode — modal value per group (ClickHouse `topK(1)` / `anyHeavy`
    * shape, exact): the most frequent orderpriority per orderstatus with
    * a deterministic tie rule (count DESC, value ASC). Written as the
    * universal row_number-filter idiom — which [[graft.plans.TopKRewriteRule]]
    * rewrites onto the bounded-heap TopKPerKey operator, so the per-group
    * pick is heap-k over the SMALL aggregated frame (|statuses|×|priorities|
    * rows), sort-free at any corpus size.
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .drop("rn")
  }

  val qModeSql: String =
    """SELECT o_orderstatus, o_orderpriority, cnt FROM (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |         row_number() OVER (PARTITION BY o_orderstatus
      |           ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      |  FROM orders GROUP BY 1, 2)
      |WHERE rn = 1""".stripMargin

  /** q_cust_distribution — TPC-H Q13 shape: the count-of-counts
    * distribution "how many customers placed exactly N orders",
    * INCLUDING the zero-order customers a plain join would drop. Orders
    * aggregate FIRST (the fact table collapses to ≤|customers| rows
    * map-side), then ONE left-outer join on custkey, then a second
    * groupBy whose key space is bounded by max-orders-per-customer —
    * tiny at any corpus size. No fact-×-dim row explosion anywhere.
    */
  def qCustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("c_count"))
    Tables.customer(spark, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val qCustDistributionSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, COUNT(*) AS c_count
      |  FROM orders WHERE o_orderpriority <> '1-URGENT'
      |  GROUP BY o_custkey)
      |SELECT coalesce(c_count, 0) AS c_count, COUNT(*) AS custdist
      |FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin

  /** q_disjunctive — TPC-H Q19 shape: revenue under an OR-of-AND-blocks
    * predicate spanning both join sides (brand × size × quantity bands).
    * Catalyst cannot DERIVE the part-side union filter from a mixed
    * disjunction, so the part-only weakening of each block is applied
    * explicitly before the join — the dim side shrinks at the scan and
    * the join build side stays small; the full predicate then runs
    * post-join. Revenue is the exact ×10⁴ integer sum (q3's rule).
    */
  def qDisjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    // part-only weakening of the OR blocks (explicit partial pushdown)
    val pt = Tables.part(spark, dir)
      .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15))
        || (col("p_brand") === "Brand#23" && col("p_size").between(1, 25))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
      .select("p_partkey", "p_brand", "p_size")
    val full =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
        && col("l_quantity").between(20, 30))
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .filter(full)
      .groupBy("p_brand")
      .agg(round(sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / 10000d, 4).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val qDisjunctiveSql: String =
    """SELECT p_brand,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
      |             / 10000, 4) AS revenue,
      |       COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY p_brand""".stripMargin

  /** q_top_share — TPC-H Q11 shape: parts whose aggregate traded value
    * exceeds a FRACTION of the global total. Two stacked aggregations
    * (part-level, then the 1-row global sum) and a broadcast of the
    * single-row total back across the part-level frame; the threshold
    * compare is exact integer cross-multiplication (val·10⁴ > total) and
    * the share an exact ppm truncating division — no floats anywhere.
    * The corpus shuffles ONCE (on partkey); the global total reuses that
    * aggregated frame, not the corpus.
    */
  def qTopShare(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("p_cents"))
      .groupBy("l_partkey")
      .agg(sum("p_cents").as("val_cents"))
    val tot = pv.agg(sum("val_cents").as("tot_cents"))
    pv.crossJoin(broadcast(tot))
      .filter(col("val_cents") * 10000L > col("tot_cents"))
      .select(col("l_partkey"), col("val_cents"),
        expr("val_cents * 1000000 div tot_cents").as("share_ppm"))
  }

  val qTopShareSql: String =
    """WITH pv AS (
      |  SELECT l_partkey,
      |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
      |           AS val_cents
      |  FROM lineitem GROUP BY l_partkey),
      |tot AS (SELECT CAST(SUM(val_cents) AS BIGINT) AS tot_cents FROM pv)
      |SELECT l_partkey, val_cents,
      |       val_cents * 1000000 // tot_cents AS share_ppm
      |FROM pv, tot
      |WHERE val_cents * 10000 > tot_cents""".stripMargin

  /** q_idle_customers — TPC-H Q22 shape: customers richer than the
    * positive-balance average with no BIG order (>400k — Q22 filters its
    * probe side the same way, by date window), summarized per nation.
    * The global average is a 1-row aggregate broadcast back over
    * customer; the "no big order" test is a LEFT ANTI join probing the
    * FILTERED orders scan (the filter pushes to parquet, shrinking the
    * probe before the shuffle). The average compare is exact integer
    * cross-multiplication (bal·n > Σbal — no division, and a negative
    * balance times positive n stays exact), so no float threshold can
    * flake at a boundary. Output is bounded by |nations|.
    */
  def qIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val posAvg = cust.filter(col("bal_cents") > 0)
      .agg(sum("bal_cents").as("pos_sum"), count(lit(1)).as("pos_n"))
    cust.crossJoin(broadcast(posAvg))
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 400000d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
  }

  val qIdleCustomersSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
      |  FROM customer),
      |a AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS pos_sum,
      |             COUNT(*) AS pos_n
      |      FROM c WHERE bal_cents > 0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |       CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
      |FROM c, a
      |WHERE bal_cents * pos_n > pos_sum
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_nationkey""".stripMargin

  /** q_multi_supp_orders — TPC-H Q21 shape: among orders drawing from ≥2
    * suppliers, exactly ONE lineitem is oversized (qty ≥ 45) — charge it
    * to that supplier and rank suppliers by offence count. The culprit
    * supplier is identified IN-AGGREGATE: a (orderkey, suppkey) rollup,
    * then an orderkey fold that carries `max(suppkey where big)` — so
    * the corpus is scanned and shuffled ONCE and there is NO probe join
    * back to lineitem (the naïve EXISTS form scans it twice). The later
    * exchanges move only aggregated frames; the supplier-name join is a
    * force-broadcast dim; top-10 executes as TakeOrdered — no global
    * sort, output constant-bounded.
    */
  def qMultiSuppOrders(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_quantity") >= 45, 1L).otherwise(0L).as("big"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum("big").as("n_big_s"))
    val culprit = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("n_big_s").as("n_big"),
        max(when(col("n_big_s") >= 1, col("l_suppkey"))).as("culprit"))
      .filter(col("n_supp") >= 2 && col("n_big") === 1)
      .groupBy("culprit")
      .agg(count(lit(1)).as("numwait"))
    culprit
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("culprit") === col("s_suppkey"))
      .select("s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val qMultiSuppOrdersSql: String =
    """WITH ps AS (
      |  SELECT l_orderkey, l_suppkey,
      |         CAST(SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_big_s
      |  FROM lineitem GROUP BY 1, 2),
      |q AS (
      |  SELECT l_orderkey, COUNT(*) AS n_supp,
      |         CAST(SUM(n_big_s) AS BIGINT) AS n_big,
      |         max(CASE WHEN n_big_s >= 1 THEN l_suppkey END) AS culprit
      |  FROM ps GROUP BY 1),
      |c AS (
      |  SELECT culprit, COUNT(*) AS numwait
      |  FROM q WHERE n_supp >= 2 AND n_big = 1
      |  GROUP BY 1)
      |SELECT s_name, numwait
      |FROM c JOIN supplier ON culprit = s_suppkey
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** q_min_price_supplier — TPC-H Q2 decorrelation shape: for each part,
    * the supplier(s) offering its MINIMUM observed price. The correlated
    * `price = (SELECT min ...)` subquery decorrelates into the (part,
    * supplier) offers aggregate plus a per-part MIN WINDOW over that
    * aggregated frame — NOT an aggregate-then-self-join, which plans as
    * a SECOND corpus scan + shuffle (measured: Catalyst does not reuse
    * the offers exchange across the two consumers). Here the corpus is
    * scanned and shuffled exactly once; the window re-shuffles only the
    * |parts × suppliers-per-part| offers frame. Supplier names arrive by
    * broadcast dim join; integer cents keep the min-equality float-free.
    */
  def qMinPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("price_cents").as("offer_cents"))
    offers
      .withColumn("min_cents",
        min("offer_cents").over(Window.partitionBy("l_partkey")))
      .filter(col("offer_cents") === col("min_cents"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_name"), col("min_cents"))
  }

  val qMinPriceSupplierSql: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(round(l_extendedprice*100) AS BIGINT)) AS offer_cents
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (SELECT *, min(offer_cents) OVER (PARTITION BY l_partkey) AS min_cents
      |      FROM offers)
      |SELECT l_partkey, s_name, min_cents
      |FROM w JOIN supplier ON l_suppkey = s_suppkey
      |WHERE offer_cents = min_cents""".stripMargin

  /** q_funnel — sequential conversion funnel WITHIN the 30-min-gap
    * sessions of [[qSessionize]]: view → click-after-view →
    * purchase-after-that-click, per day. Stage timestamps are
    * CONDITIONAL MINIMA with an ordering constraint folded into one
    * aggregation pass (min view ts, min click ts > that, min purchase
    * ts > that — the decorrelated form of a 3-way sequential EXISTS),
    * so the whole funnel costs the sessionize window pass plus one
    * session-keyed aggregation — no self-joins. Output bounded by
    * |days|; conversion rates in exact ppm.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val bySession = Window.partitionBy("user_id", "session_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      // the view and click anchors ride extra windows on the SAME
      // user shuffle (no new exchange)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_us"))).over(bySession))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("ts_us") > col("t_view"), col("ts_us"))).over(bySession))
      .groupBy("user_id", "session_id")
      .agg(min("ts_us").as("t_start"), min("t_view").as("t_view"),
        min("t_click").as("t_click"),
        min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t_click"), col("ts_us"))).as("t_purchase"))
      .select(expr("t_start div 86400000000").as("day"),
        col("t_view").isNotNull.as("s_view"),
        col("t_click").isNotNull.as("s_click"),
        col("t_purchase").isNotNull.as("s_purchase"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("s_view"), 1L).otherwise(0L)).as("n_view"),
        sum(when(col("s_click"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("s_purchase"), 1L).otherwise(0L)).as("n_click_purchase"))
      .filter(col("n_view") > 0)
      .withColumn("click_ppm", expr("n_view_click * 1000000 div n_view"))
      .withColumn("purchase_ppm", expr(
        "CASE WHEN n_view_click > 0 " +
          "THEN n_click_purchase * 1000000 div n_view_click ELSE 0 END"))
  }

  val qFunnelSql: String =
    """WITH s AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS prev_ts
      |  FROM events),
      |m AS (SELECT *, CASE WHEN prev_ts IS NULL
      |                       OR ts_us - prev_ts > 1800 * 1000000
      |                     THEN 1 ELSE 0 END AS is_new
      |      FROM s),
      |g AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
      |        ORDER BY ts_us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS session_id
      |      FROM m),
      |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
      |               OVER (PARTITION BY user_id, session_id) AS t_view
      |      FROM g),
      |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t_view
      |                         THEN ts_us END)
      |               OVER (PARTITION BY user_id, session_id) AS t_click
      |      FROM v),
      |staged AS (
      |  SELECT user_id, session_id,
      |         min(ts_us) AS t_start, min(t_view) AS t_view,
      |         min(t_click) AS t_click,
      |         min(CASE WHEN event_type = 'purchase' AND ts_us > t_click
      |                  THEN ts_us END) AS t_purchase
      |  FROM c GROUP BY 1, 2),
      |f AS (SELECT t_start // 86400000000 AS day,
      |             t_view IS NOT NULL AS s_view,
      |             t_click IS NOT NULL AS s_click,
      |             t_purchase IS NOT NULL AS s_purchase
      |      FROM staged),
      |agg AS (
      |  SELECT day, COUNT(*) AS n_sessions,
      |         CAST(SUM(CASE WHEN s_view THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_view,
      |         CAST(SUM(CASE WHEN s_click THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_view_click,
      |         CAST(SUM(CASE WHEN s_purchase THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_click_purchase
      |  FROM f GROUP BY day)
      |SELECT day, n_sessions, n_view, n_view_click, n_click_purchase,
      |       n_view_click * 1000000 // n_view AS click_ppm,
      |       CASE WHEN n_view_click > 0
      |            THEN n_click_purchase * 1000000 // n_view_click
      |            ELSE 0 END AS purchase_ppm
      |FROM agg WHERE n_view > 0""".stripMargin

  /** q_seq_match — ClickHouse's `sequenceMatch('(?1).*(?2)')` /
    * `sequenceCount('(?1)(?2)')` pair re-expressed (the behavioral
    * pattern primitive next to [[qFunnel]]'s windowFunnel): per user,
    * over the signup/purchase subsequence in (ts, event_id) total
    * order — did a purchase ever follow a signup (match), how many
    * DIRECT signup→purchase adjacencies (strict-count), and the
    * minimum signup→purchase gap among matched purchases. One
    * type-filtered scan (filter pushed to parquet), one user-keyed
    * shuffle carrying both the lag and the running-last-signup
    * windows, |users|-bounded output, exact µs integers; unmatched
    * users carry gap 0 behind the flag.
    */
  def qSeqMatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("last_signup_ts",
        last(when(col("event_type") === "signup", col("ts_us")),
          ignoreNulls = true).over(wPrev))
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("n_signup"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"),
        sum(when(col("event_type") === "purchase" &&
          col("prev_type") === "signup", 1L).otherwise(0L))
          .as("n_adjacent"),
        max(when(col("event_type") === "purchase" &&
          col("last_signup_ts").isNotNull, 1).otherwise(0)).as("matched"),
        min(when(col("event_type") === "purchase" &&
          col("last_signup_ts").isNotNull,
          col("ts_us") - col("last_signup_ts"))).as("min_gap"))
      .select(col("user_id"), col("n_signup"), col("n_purchase"),
        col("n_adjacent"), col("matched"),
        coalesce(col("min_gap"), lit(0L)).as("min_gap_us"))
  }

  val qSeqMatchSql: String =
    """WITH s AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
      |         lag(event_type) OVER wo AS prev_type,
      |         last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts)
      |                    END IGNORE NULLS)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS last_signup_ts
      |  FROM events
      |  WHERE event_type IN ('signup', 'purchase')
      |  WINDOW wo AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT user_id,
      |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_signup,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_purchase,
      |       CAST(SUM(CASE WHEN event_type = 'purchase'
      |                      AND prev_type = 'signup'
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_adjacent,
      |       CAST(MAX(CASE WHEN event_type = 'purchase'
      |                      AND last_signup_ts IS NOT NULL
      |                     THEN 1 ELSE 0 END) AS INT) AS matched,
      |       coalesce(MIN(CASE WHEN event_type = 'purchase'
      |                          AND last_signup_ts IS NOT NULL
      |                         THEN ts_us - last_signup_ts END), 0)
      |         AS min_gap_us
      |FROM s GROUP BY user_id""".stripMargin

  /** q_retention — cohort retention triangle: users grouped by FIRST
    * active week (cohort), counted again in each later week they
    * return — the chart behind every growth dashboard. Shape: per-user
    * first week via one aggregation, then (cohort, offset) counts over
    * the distinct (user, week) activity frame; both aggregations key by
    * user/week prefixes and the triangle output is |weeks|² — bounded
    * regardless of corpus size. Retention in exact ppm of cohort size.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
    val cohorts = activity.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .withColumn("retained_ppm", expr("n_active * 1000000 div cohort_size"))
  }

  val qRetentionSql: String =
    """WITH a AS (SELECT DISTINCT user_id,
      |                  epoch_us(ts) // 604800000000 AS week
      |           FROM events),
      |c AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1),
      |sz AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c GROUP BY 1),
      |r AS (SELECT c.cohort_week, a.week - c.cohort_week AS "offset",
      |             COUNT(*) AS n_active
      |      FROM a JOIN c ON a.user_id = c.user_id
      |      GROUP BY 1, 2)
      |SELECT r.cohort_week, r."offset", r.n_active, sz.cohort_size,
      |       r.n_active * 1000000 // sz.cohort_size AS retained_ppm
      |FROM r JOIN sz ON r.cohort_week = sz.cohort_week""".stripMargin

  /** q_grouping_sets — EXPLICIT grouping sets, the lattice shape rollup
    * and cube cannot express: ((returnflag), (linestatus), ()) — two
    * independent single-axis subtotal views plus the grand total,
    * WITHOUT the detail level a cube would force. Spark expands the
    * requested sets map-side in ONE shuffle exactly as for
    * rollup/cube; grouping_id separates the views; integer cents keep
    * every level exact.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("cents").cast("double") / 100d, 2).as("revenue"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue,
      |       COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  /** q_late_ship_priority — TPC-H Q4 shape (order-priority checking):
    * per priority, how many orders placed in 1997Q1 had AT LEAST ONE
    * lineitem shipped more than 60 days after the order date. The Q4
    * lesson is the EXISTS: a LEFT SEMI join with the correlated date
    * predicate in the join condition — each order contributes once no
    * matter how many late lines (no post-join distinct), and the
    * quarter filter on orders is a plan-time constant that pushes to
    * the parquet scan, so only one quarter of the orders table feeds
    * the join. Output bounded by |priorities| = 5. Microsecond integer
    * date math on both sides — no interval-type semantics to diverge.
    */
  def qLateShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"))
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("sdate_us"))
    orders
      .join(lines, col("o_orderkey") === col("l_orderkey") &&
        col("sdate_us") > col("odate_us") + 60L * 86400L * 1000000L,
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val qLateShipPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND epoch_us(l_shipdate) > epoch_us(o_orderdate)
      |          + CAST(60 AS BIGINT) * 86400 * 1000000)
      |GROUP BY o_orderpriority""".stripMargin

  /** q_priority_class — TPC-H Q12 shape (shipping-priority classes):
    * for lineitems shipped in 1997, per return flag (standing in for
    * ship mode, absent from the synthetic schema), how many belong to
    * critical-priority orders (1-URGENT / 2-HIGH) vs not. The Q12
    * lesson: the CONDITIONAL COUNTS fold into one aggregation after a
    * single fact⋈orders join — no per-class re-scan — and the year
    * filter reaches the lineitem scan. Output bounded by |flags| = 3.
    */
  def qPriorityClass(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  val qPriorityClassSql: String =
    """SELECT l_returnflag,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag""".stripMargin

  /** q_small_qty_revenue — TPC-H Q17 shape (small-quantity-order
    * revenue): total revenue from lineitems whose quantity is below
    * 20% of their part's average quantity, parts restricted to one
    * brand. The Q17 lesson is DECORRELATION: the textbook rewrite turns
    * the correlated `l_quantity < 0.2 * (SELECT avg ...)` into a
    * per-part aggregate RE-JOINED to the fact slice — two fact scans;
    * here the aggregate instead rides a WINDOW over the same
    * brand-broadcast-filtered slice (the q_min_price_supplier shape),
    * so lineitem is scanned ONCE and the only exchange is the
    * partkey-clustered window shuffle of the ~1/25 brand slice
    * (PlanAuditSpec-enforced). The threshold test cross-multiplies
    * integers (qty·10·n < Σqty·2 ⟺ qty < 0.2·avg) — no float boundary.
    */
  def qSmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Window.partitionBy("l_partkey")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("qty_cents"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#13").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty", sum("qty_cents").over(perPart))
      .withColumn("n_lines", count(lit(1)).over(perPart))
      .filter(col("qty_cents") * 10L * col("n_lines") < col("sum_qty") * 2L)
      .agg(coalesce(sum("price_cents"), lit(0L)).as("rev_cents"),
        count(lit(1)).as("n_small"))
      .select(expr("rev_cents div 7").as("avg_yearly_cents"), col("n_small"))
  }

  val qSmallQtyRevenueSql: String =
    """WITH bl AS (
      |  SELECT l_partkey,
      |         CAST(round(l_quantity*100) AS BIGINT) AS qty_cents,
      |         CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#13'),
      |w AS (SELECT price_cents, qty_cents,
      |             CAST(SUM(qty_cents) OVER (PARTITION BY l_partkey) AS BIGINT)
      |               AS sum_qty,
      |             COUNT(*) OVER (PARTITION BY l_partkey) AS n_lines
      |      FROM bl),
      |f AS (SELECT price_cents FROM w
      |      WHERE qty_cents * 10 * n_lines < sum_qty * 2)
      |SELECT CAST(coalesce(SUM(price_cents), 0) AS BIGINT) // 7
      |         AS avg_yearly_cents,
      |       COUNT(*) AS n_small
      |FROM f""".stripMargin

  /** q_multi_distinct — MULTIPLE exact count-distincts in one
    * aggregation (`count(DISTINCT partkey), count(DISTINCT suppkey)`
    * per flag) — the plan shape every "unique users AND unique items
    * per segment" dashboard needs. Spark plans this with EXPAND: each
    * input row fans to one row per distinct-column (n× the rows, but
    * only the grouped key + one column each), then a two-level
    * aggregate dedups and counts — still ONE pass over the fact table,
    * no per-column re-scan, map-side partial dedup before the shuffle.
    * PlanAuditSpec pins the Expand. Output |flags|-bounded.
    */
  def qMultiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        count(lit(1)).as("n_lines"))

  val qMultiDistinctSql: String =
    """SELECT l_returnflag,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |       COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q_band_revenue — TPC-H Q6 shape (forecasting revenue change): the
    * canonical FULL-PUSHDOWN aggregate — revenue = Σ extprice·discount
    * over one shipdate year, a discount band, and a quantity cap, with
    * every predicate reaching the parquet scan (`PushedFilters` on
    * shipdate; the discount/quantity bands are data filters ahead of
    * the single map-side-combinable aggregate). One scan, one 1-row
    * result, zero joins: the query that measures pure scan+filter
    * throughput at 100 TB. Exact integer cents×cents (price·discount
    * is ×10⁴).
    */
  def qBandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_quantity") * 100).cast("long").as("qty_cents"))
      .filter(col("disc_pct") >= 5L && col("disc_pct") <= 7L &&
        col("qty_cents") < 24L * 100L)
      .agg(coalesce(sum(col("price_cents") * col("disc_pct")), lit(0L))
        .as("revenue_x10000"),
        count(lit(1)).as("n_lines"))

  val qBandRevenueSql: String =
    """SELECT CAST(coalesce(SUM(
      |         CAST(round(l_extendedprice*100) AS BIGINT)
      |         * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT)
      |         AS revenue_x10000,
      |       COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      |  AND CAST(round(l_quantity*100) AS BIGINT) < 24 * 100""".stripMargin

  /** q_ship_volume — TPC-H Q7 shape (volume shipping): INTERNATIONAL
    * revenue by (supp_nation, cust_nation, ship year) — every
    * cross-nation lane, the matrix Q7 picks one pair out of. (A fixed
    * pair is vacuous here: the synthetic supplier table is small enough
    * at low SF that specific nations hold no suppliers.) Scale shape:
    * the supplier⋈nation and nation dims BROADCAST into the date-sliced
    * fact scan; the one fact-fact shuffle is orders on orderkey; the
    * customer-nation side joins size-gated. The international filter
    * runs where both nations are first known (after the customer join).
    * Output is |nations|²×|years|-bounded — dims, not data. Exact ×10⁴
    * integer revenue.
    */
  def qShipVolume(spark: SparkSession, dir: String): DataFrame = {
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("v"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("v").as("volume_x10000"), count(lit(1)).as("n_lines"))
  }

  val qShipVolumeSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(SUM(v) AS BIGINT) AS volume_x10000,
      |       COUNT(*) AS n_lines
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
      |             CAST(round(l_extendedprice*100) AS BIGINT)
      |               * (100 - CAST(round(l_discount*100) AS BIGINT)) AS v
      |      FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1998-01-01'
      |        AND n1.n_name <> n2.n_name)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q_returned_items — TPC-H Q10 shape (returned-item reporting): the
    * top-20 customers by revenue lost to returns in one quarter.
    * Aggregate-first: returned lines collapse map-side per order BEFORE
    * any join, and the orderkey join then REUSES that aggregation's
    * hash partitioning (no second fact shuffle); the quarter filter on
    * orders is pushed to its scan; customer/nation attach to the
    * |custkey|-bounded aggregate; top-20 plans as TakeOrdered with a
    * total (revenue, custkey) order — never a global sort.
    */
  def qReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("v"))
      .groupBy("l_orderkey").agg(sum("v").as("ov"))
    val quarter = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    rev.join(quarter, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("ov").as("revenue_x10000"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_x10000"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
      .orderBy(col("revenue_x10000").desc, col("c_custkey").asc)
      .limit(20)
  }

  val qReturnedItemsSql: String =
    """WITH rev AS (
      |  SELECT l_orderkey,
      |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
      |           AS ov
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      |pc AS (
      |  SELECT o_custkey, CAST(SUM(ov) AS BIGINT) AS revenue_x10000
      |  FROM rev JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1)
      |SELECT c_custkey, c_name, n_name, revenue_x10000,
      |       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
      |FROM pc
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue_x10000 DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** q_top_supplier — TPC-H Q15 shape (top supplier via the revenue
    * view): per-supplier quarter revenue, keep the supplier(s) equal to
    * the maximum. The max rides a GLOBAL WINDOW over the
    * |suppliers|-bounded aggregate — the agg-then-rejoin form would
    * scan lineitem twice (broadcast stages are not reused across
    * consumers, see q_small_qty_revenue) while a single-partition pass
    * over |suppliers| rows is O(dims); supplier names broadcast in.
    */
  def qTopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("v"))
      .groupBy("l_suppkey").agg(sum("v").as("total_revenue_x10000"))
    rev
      .withColumn("mx",
        max("total_revenue_x10000").over(Window.partitionBy()))
      .filter(col("total_revenue_x10000") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_x10000"))
  }

  val qTopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
      |           AS total_revenue_x10000
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue_x10000
      |FROM (SELECT *, MAX(total_revenue_x10000) OVER () AS mx FROM rev)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue_x10000 = mx""".stripMargin

  /** q_profit_by_nation — TPC-H Q9 shape (product-type profit): per
    * (supplier nation, order year) profit on the widget product line,
    * cost modeled as 20% of retail value (the synthetic schema has no
    * partsupp/supplycost). The name-filtered part dim and the
    * supplier⋈nation dim both BROADCAST into the fact scan — the part
    * filter cuts lineitem before the one fact-fact shuffle (orders on
    * orderkey for the year). Profit per line is exact ×10⁴ integer:
    * price·(100−disc) − retail·qty div 5, the division truncating on
    * nonnegative operands (identical in both engines); the signed SUM
    * is exact. |nations|×|years|-bounded output.
    */
  def qProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val prt = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents")))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_quantity") * 100).cast("long").as("qty_cents"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("amount",
        col("price_cents") * (lit(100L) - col("disc_pct")) -
          expr("retail_cents * qty_cents div 5"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum("amount").as("profit_x10000"), count(lit(1)).as("n_lines"))
  }

  val qProfitByNationSql: String =
    """SELECT n_name, o_year,
      |       CAST(SUM(amount) AS BIGINT) AS profit_x10000,
      |       COUNT(*) AS n_lines
      |FROM (SELECT n_name,
      |             CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
      |             CAST(round(l_extendedprice*100) AS BIGINT)
      |               * (100 - CAST(round(l_discount*100) AS BIGINT))
      |               - CAST(round(p_retailprice*100) AS BIGINT)
      |                 * CAST(round(l_quantity*100) AS BIGINT) // 5 AS amount
      |      FROM lineitem
      |      JOIN part ON l_partkey = p_partkey
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN nation ON s_nationkey = n_nationkey
      |      JOIN orders ON l_orderkey = o_orderkey
      |      WHERE p_name LIKE '%widget%')
      |GROUP BY 1, 2""".stripMargin

  /** q_trade_volume — TPC-H Q7 (volume shipping): revenue flowing
    * among a four-nation trading bloc (Q7 runs two; four keeps every
    * fixture SF non-empty), split by (supplier nation, customer
    * nation, ship year) for the 1996–1997 window — the one classic
    * TPC-H join pipeline §2.B still lacked (r12). Scale shape: both
    * dims are filtered to the bloc FIRST and broadcast, so the
    * supplier join prunes lineitem to trade-relevant lines before the
    * orders join, and the cross-pair rule (supp ≠ cust nation) is a
    * broadcast-side predicate — the fact tables shuffle once, on the
    * orderkey equi-join, carrying integer cents. Output ≤ 12 nation
    * pairs × 2 years. */
  def qTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_x10000"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev_x10000").as("revenue_x10000"),
        count(lit(1)).as("n_lines"))
  }

  val tradeVolumeSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(SUM(rev) AS BIGINT) AS revenue_x10000,
      |       COUNT(*) AS n_lines
      |FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |             CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
      |             CAST(round(l_extendedprice*100) AS BIGINT)
      |               * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev
      |      FROM lineitem
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN nation sn ON s_nationkey = sn.n_nationkey
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation cn ON c_nationkey = cn.n_nationkey
      |      WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |        AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |        AND sn.n_name <> cn.n_name
      |        AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01')
      |GROUP BY 1, 2, 3""".stripMargin

  /** q_supp_part_cnt — TPC-H Q16 shape (parts/supplier relationship):
    * how many DISTINCT suppliers can furnish each (brand, type, size)
    * part class, excluding suppliers with customer complaints — the
    * synthetic schema has no partsupp, so the supplier↔part relation
    * comes from shipped lineitems, and "complaints" is modeled as a
    * negative account balance. Scale shape: the complained-supplier
    * exclusion is an ANTI-join against a tiny broadcast side; the
    * (partkey, suppkey) relation collapses to DISTINCT pairs BEFORE
    * joining the part dim (8-byte-pair shuffle, the classic Q16
    * decorrelation); count_distinct rides the final class aggregation.
    * Output bounded by |brand|×|type|×|size| classes.
    */
  def qSuppPartCnt(spark: SparkSession, dir: String): DataFrame = {
    val bad = broadcast(Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
    val rel = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .distinct()
    val prt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" &&
        !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    rel.join(prt, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .select(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"), col("supplier_cnt"))
  }

  val qSuppPartCntSql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      |      WHERE l_suppkey NOT IN
      |        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) rel
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q_excess_supplier — TPC-H Q20 shape (potential part promotion):
    * suppliers who shipped MORE than 50 units of some PROMO-type part
    * in 1996 — the "who holds excess stock" screen, decorrelated: the
    * correlated `ps_availqty > 0.5·sum(l_quantity)` subquery becomes
    * one aggregation over the part-filtered, year-sliced fact
    * (threshold vs the group's own sum — a HAVING, no second scan),
    * then a SEMI-join carries the qualifying (part, supplier) pairs
    * onto the supplier dim. Scale shape: part filter broadcasts into
    * the fact scan; one (partkey, suppkey)-keyed shuffle; the semi
    * side is aggregate-bounded. |suppliers|-bounded output, exact
    * integer quantities.
    */
  def qExcessSupplier(spark: SparkSession, dir: String): DataFrame = {
    val promo = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey")))
    val qualifying = Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")) === 1996)
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(sum("l_quantity")).cast("long").as("qty"))
      .filter(col("qty") > 50L)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("long").as("s_nationkey"))
  }

  val qExcessSupplierSql: String =
    """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
      |FROM supplier WHERE s_suppkey IN
      |  (SELECT l_suppkey
      |   FROM lineitem JOIN part ON l_partkey = p_partkey
      |   WHERE p_type = 'PROMO'
      |     AND date_part('year', l_shipdate) = 1996
      |   GROUP BY l_partkey, l_suppkey
      |   HAVING CAST(round(SUM(l_quantity)) AS BIGINT) > 50)""".stripMargin

  /** q_wau_rolling — rolling 7-day active users per day (the DAU/WAU/
    * stickiness panel every product dashboard opens with). The 7-day
    * window is NOT a range self-join: each (user, day) fact explodes to
    * the 7 target days it contributes to (the q_range_eval
    * constant-width device — work is exactly 7× the DAILY-distinct
    * frame, which is already user×day bounded, never 7× the raw
    * events), then one count-distinct per target day. DAU rides the
    * same pre-deduplicated frame. Trailing days past the data's edge
    * are clipped with a scalar max-day aggregate (one number, not a
    * data-derived set); leading days keep their partial windows, like
    * any real dashboard's first week. stickiness = DAU/WAU as ppm, the
    * established integer form.
    */
  def qWauRolling(spark: SparkSession, dir: String): DataFrame = {
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val maxDay = userDays.agg(max("day")).head().getLong(0)
    val wau = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("d"))
      .filter(col("d") <= maxDay)
      .groupBy("d").agg(countDistinct("user_id").as("wau"))
    val dau = userDays.groupBy(col("day").as("d"))
      .agg(countDistinct("user_id").as("dau"))
    wau.join(dau, Seq("d"), "left")
      .select((col("d") * 86400L).as("day_s"), col("wau"),
        coalesce(col("dau"), lit(0L)).as("dau"))
      .withColumn("stickiness_ppm", expr("dau * 1000000 div wau"))
  }

  val wauRollingSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |w AS (
      |  SELECT d, COUNT(DISTINCT user_id) AS wau FROM (
      |    SELECT user_id, unnest(generate_series(day, day + 6)) AS d
      |    FROM ud)
      |  WHERE d <= (SELECT max(day) FROM ud)
      |  GROUP BY d),
      |a AS (SELECT day AS d, COUNT(DISTINCT user_id) AS dau
      |      FROM ud GROUP BY 1)
      |SELECT w.d * 86400 AS day_s, w.wau,
      |       CAST(coalesce(a.dau, 0) AS BIGINT) AS dau,
      |       coalesce(a.dau, 0) * 1000000 // w.wau AS stickiness_ppm
      |FROM w LEFT JOIN a ON w.d = a.d""".stripMargin

  /** q_funnel_time — TIME-TO-CONVERT on top of [[qFunnel]]'s stage
    * counts: for each user who viewed and later purchased, the hours
    * from FIRST view to the first purchase AFTER it, bucketed into a
    * histogram (the "how long does conversion take" curve; the funnel
    * counts say how many convert, this says how fast). The two anchors
    * are conditional mins on ONE user-keyed aggregation — the purchase
    * anchor needs the view time first, so it rides a second pass over
    * the same user-keyed shuffle (two window functions, one exchange,
    * like qFunnel's anchors). Output is a constant-bounded histogram
    * (hour buckets of the data's span), all integer µs math.
    */
  def qFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_us"))).over(byUser))
      .filter(col("event_type") === "purchase" &&
        col("t_view").isNotNull && col("ts_us") > col("t_view"))
      .groupBy("user_id")
      .agg(min("t_view").as("t_view"), min("ts_us").as("t_purchase"))
    e.select(expr("(t_purchase - t_view) div 3600000000").as("hours_bucket"))
      .groupBy("hours_bucket")
      .agg(count(lit(1)).as("n_users"))
  }

  val funnelTimeSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
      |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
      |           OVER (PARTITION BY user_id) AS t_view
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |c AS (
      |  SELECT user_id, min(t_view) AS t_view, min(ts_us) AS t_purchase
      |  FROM s
      |  WHERE event_type = 'purchase' AND t_view IS NOT NULL
      |    AND ts_us > t_view
      |  GROUP BY 1)
      |SELECT (t_purchase - t_view) // 3600000000 AS hours_bucket,
      |       COUNT(*) AS n_users
      |FROM c GROUP BY 1""".stripMargin

  /** q_cohort_ltv — cohort LTV curves (the revenue twin of
    * [[qRetention]]'s activity curves): customers cohorted by the
    * QUARTER of their first order, revenue accumulated per quarter
    * offset, lifetime value per member as the cumulative integer-cents
    * sum over the cohort size.
    *
    * One orders scan, one customer-keyed exchange: the cohort quarter
    * is a `min OVER (PARTITION BY custkey)` window on the scan (no
    * aggregate-then-rejoin, which would scan orders twice — the
    * q_small_qty_revenue rule), and everything downstream operates on
    * the cohort×offset cell frame, bounded by the date span squared
    * (~400 rows regardless of corpus size). The cohort size needs no
    * second pass either: by definition of "first order", every member
    * is active at offset 0, so size == n_active(offset = 0), lifted
    * with a window max over the cell frame.
    */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("c")
    val byCohort = Window.partitionBy("cohort_q")
    val cells = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .cast("long").as("q"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("cohort_q", min("q").over(byCust))
      .groupBy(col("cohort_q"), (col("q") - col("cohort_q")).as("offset_q"))
      .agg(sum("cents").as("rev_cents"),
        countDistinct("c").as("n_active"))
    cells
      .withColumn("cum_rev_cents",
        sum("rev_cents").over(byCohort.orderBy("offset_q")))
      .withColumn("cohort_size",
        max(when(col("offset_q") === 0, col("n_active"))).over(byCohort))
      .withColumn("ltv_cents",
        expr("cum_rev_cents div cohort_size"))
  }

  val cohortLtvSql: String =
    """WITH o AS (
      |  SELECT o_custkey AS c,
      |         year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS q,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |b AS (SELECT c, q, cents,
      |             min(q) OVER (PARTITION BY c) AS cohort_q FROM o),
      |cells AS (
      |  SELECT CAST(cohort_q AS BIGINT) AS cohort_q,
      |         CAST(q - cohort_q AS BIGINT) AS offset_q,
      |         CAST(SUM(cents) AS BIGINT) AS rev_cents,
      |         COUNT(DISTINCT c) AS n_active
      |  FROM b GROUP BY 1, 2),
      |w AS (
      |  SELECT cohort_q, offset_q, rev_cents, n_active,
      |         CAST(SUM(rev_cents) OVER
      |           (PARTITION BY cohort_q ORDER BY offset_q) AS BIGINT)
      |           AS cum_rev_cents,
      |         MAX(CASE WHEN offset_q = 0 THEN n_active END) OVER
      |           (PARTITION BY cohort_q) AS cohort_size
      |  FROM cells)
      |SELECT cohort_q, offset_q, rev_cents, n_active, cum_rev_cents,
      |       cohort_size, cum_rev_cents // cohort_size AS ltv_cents
      |FROM w""".stripMargin

  /** q_rfm — RFM (recency / frequency / monetary) customer
    * segmentation, the classic CRM cut. Scores use FIXED business
    * thresholds, not data-derived quantiles: quantile cutoffs would
    * need a global sort per dimension and make every segment boundary
    * a cross-engine tie hazard, while fixed thresholds are plan-time
    * constants (and how real RFM deployments pin score meanings across
    * refreshes). One orders scan → one custkey-keyed aggregation →
    * CASE score arithmetic → a ≤125-row (5×5×5) segment rollup; the
    * anchor date is a single scalar max over the pruned date column
    * (the qWauRolling device). All money integer cents, all divisions
    * nonnegative integer div.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is parquet TIMESTAMP without timezone: Spark reads it
    // NTZ (LocalDateTime rows) — UNLESS Tables.events already disabled
    // NTZ inference in this session, which flips subsequent reads to
    // TimestampType (java.sql.Timestamp rows). Accept both; lit()
    // round-trips either as the matching literal type, and under the
    // pinned UTC zone the two encode the same wall-clock date.
    val anchor: Column = Tables.orders(spark, dir)
      .agg(max("o_orderdate")).head().get(0) match {
        case t: java.sql.Timestamp => lit(t)
        case d: java.time.LocalDateTime => lit(d)
        case other => throw new IllegalStateException(
          s"unexpected o_orderdate row type: ${other.getClass}")
      }
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("mon_cents"))
      .select(
        datediff(anchor, col("last_order")).cast("long").as("rec_days"),
        col("freq"), col("mon_cents"))
    perCust
      .withColumn("r_score", expr(
        "CASE WHEN rec_days <= 90 THEN 5 WHEN rec_days <= 180 THEN 4 " +
          "WHEN rec_days <= 365 THEN 3 WHEN rec_days <= 730 THEN 2 " +
          "ELSE 1 END").cast("long"))
      .withColumn("f_score", expr(
        "CASE WHEN freq >= 16 THEN 5 WHEN freq >= 12 THEN 4 " +
          "WHEN freq >= 8 THEN 3 WHEN freq >= 4 THEN 2 ELSE 1 END")
        .cast("long"))
      .withColumn("m_score", expr(
        "CASE WHEN mon_cents >= 350000000 THEN 5 " +
          "WHEN mon_cents >= 250000000 THEN 4 " +
          "WHEN mon_cents >= 150000000 THEN 3 " +
          "WHEN mon_cents >= 50000000 THEN 2 ELSE 1 END").cast("long"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum("mon_cents").as("seg_cents"))
      .withColumn("avg_cents", expr("seg_cents div n_customers"))
  }

  val qRfmSql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |         date_diff('day', max(o_orderdate),
      |           (SELECT max(o_orderdate) FROM orders)) AS rec_days,
      |         count(*) AS freq,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |           AS BIGINT) AS mon_cents
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT CAST(CASE WHEN rec_days <= 90 THEN 5
      |              WHEN rec_days <= 180 THEN 4
      |              WHEN rec_days <= 365 THEN 3
      |              WHEN rec_days <= 730 THEN 2 ELSE 1 END AS BIGINT)
      |           AS r_score,
      |         CAST(CASE WHEN freq >= 16 THEN 5 WHEN freq >= 12 THEN 4
      |              WHEN freq >= 8 THEN 3 WHEN freq >= 4 THEN 2
      |              ELSE 1 END AS BIGINT) AS f_score,
      |         CAST(CASE WHEN mon_cents >= 350000000 THEN 5
      |              WHEN mon_cents >= 250000000 THEN 4
      |              WHEN mon_cents >= 150000000 THEN 3
      |              WHEN mon_cents >= 50000000 THEN 2 ELSE 1 END
      |           AS BIGINT) AS m_score,
      |         mon_cents
      |  FROM pc)
      |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
      |       CAST(SUM(mon_cents) AS BIGINT) AS seg_cents,
      |       CAST(SUM(mon_cents) AS BIGINT) // COUNT(*) AS avg_cents
      |FROM s GROUP BY 1, 2, 3""".stripMargin

  /** q_order_gap — the inter-purchase-interval histogram (purchase
    * cadence: the input to replenishment models and the denominator
    * behind "customer is overdue" alerts). Per customer, the day gap
    * between consecutive orders via one lag window — ordered by
    * (o_orderdate, o_orderkey), a TOTAL order because o_orderkey is
    * unique (the verify-skill window rule) — bucketed into weeks.
    * One scan, one custkey exchange, output bounded by the date span
    * in weeks (~350 rows at any corpus size).
    */
  def qOrderGap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .filter(col("prev_date").isNotNull)
      .select(col("o_custkey"),
        expr("CAST(datediff(o_orderdate, prev_date) AS BIGINT) div 7")
          .as("week_bucket"))
      .groupBy("week_bucket")
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct("o_custkey").as("n_customers"))
  }

  val orderGapSql: String =
    """WITH g AS (
      |  SELECT o_custkey,
      |         lag(o_orderdate) OVER
      |           (PARTITION BY o_custkey
      |            ORDER BY o_orderdate, o_orderkey) AS prev_date,
      |         o_orderdate
      |  FROM orders)
      |SELECT CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) // 7
      |         AS week_bucket,
      |       COUNT(*) AS n_gaps,
      |       COUNT(DISTINCT o_custkey) AS n_customers
      |FROM g WHERE prev_date IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** q_basket_pairs — market-basket co-occurrence with lift (the
    * association-rule screen behind "frequently bought together"):
    * top-50 part pairs appearing in the same order, scored by
    * lift = P(p1,p2) / (P(p1)·P(p2)) over the order universe.
    *
    * Pair generation is a self-equi-join of the distinct (order, part)
    * frame on the ORDER key — per-order fan-out is C(basket, 2), and
    * basket size is a physical constant of the domain (≤13 in the
    * fixture, tens in any real store), so pair volume is a
    * constant × |lineitem|, never quadratic in the corpus; the two join
    * inputs are the IDENTICAL subplan, so the shuffle is built once and
    * reused (exchange reuse, plan-audited). The min-support filter
    * (pair_cnt ≥ 2) cuts the long singleton tail BEFORE the frequency
    * joins; part frequencies ride the same distinct frame. Lift as
    * exact integer x1000: pair_cnt · N · 1000 div (c1·c2) — fits int64
    * while pair_cnt·N·1000 < 2^63, i.e. for any non-degenerate basket
    * distribution (pair_cnt ≪ N; a pair in EVERY one of 10^9 orders
    * would need N² ≈ 10^18·1000 — at that degeneracy the pair list
    * itself is the bug to fix first). Top-50 by (pair_cnt DESC, p1,
    * p2) — a total order, so the LIMIT set is deterministic — via
    * TakeOrderedAndProject, never a full sort.
    */
  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    // |orders| enters as a 1-row aggregate broadcast (the q_top_share
    // device) instead of a driver-side eager count() — one Spark job
    // per invocation, not two (VERDICT_r09 item 3: the extra job was
    // the likely source of this query's 3.1 run-to-run spread)
    val nOrders = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n_orders"))
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val freq = items.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 2)
    pairs
      .join(freq.select(col("pk").as("p1"), col("cnt").as("c1")), "p1")
      .join(freq.select(col("pk").as("p2"), col("cnt").as("c2")), "p2")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_x1000",
        expr("pair_cnt * n_orders * 1000 div (c1 * c2)"))
      .select("p1", "p2", "pair_cnt", "c1", "c2", "lift_x1000")
      .orderBy(col("pair_cnt").desc, col("p1"), col("p2"))
      .limit(50)
  }

  val basketPairsSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |freq AS (SELECT pk, COUNT(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS pair_cnt
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p1, p2, pair_cnt, f1.cnt AS c1, f2.cnt AS c2,
      |       pair_cnt * (SELECT COUNT(*) FROM orders) * 1000
      |         // (f1.cnt * f2.cnt) AS lift_x1000
      |FROM pairs
      |JOIN freq f1 ON f1.pk = p1
      |JOIN freq f2 ON f2.pk = p2
      |ORDER BY pair_cnt DESC, p1, p2
      |LIMIT 50""".stripMargin

  /** q_skew_stats — shuffle-key SKEW telemetry, the read a planner (or
    * the engineer deciding between AQE skew-join and manual salting)
    * takes before any big join: per hot join key, the log₂-bucketed
    * key-frequency histogram — n_keys and row mass per
    * floor(log2(df)) bucket, via the repo's bit-length device (no
    * libm). A healthy key space is a tight low-bucket pyramid; rows
    * piling into high buckets is exactly the skew AQE must split (the
    * 100 TB failure mode: one customer/orderkey holding 10⁸ rows).
    * Audited over the two join keys every OLAP query here shuffles on
    * (lineitem.l_orderkey) and every event panel groups on
    * (events.user_id). Scale shape: one map-side-combinable aggregate
    * per table, then a ≤64-row histogram — output bounded by the
    * int64 bit width, never by corpus size.
    */
  def qSkewStats(spark: SparkSession, dir: String): DataFrame = {
    def hist(df: DataFrame, keyCol: String, label: String): DataFrame =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        .select(lit(label).as("key_col"),
          (length(expr("conv(c, 10, 2)")) - 1).cast("long").as("log2_df"),
          col("c"))
        .groupBy("key_col", "log2_df")
        .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"))
    hist(Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(
        hist(Tables.events(spark, dir), "user_id", "events.user_id"))
  }

  val skewStatsSql: String =
    """WITH lk AS (
      |  SELECT 'lineitem.l_orderkey' AS key_col,
      |         CAST(length(bin(COUNT(*))) - 1 AS BIGINT) AS log2_df,
      |         COUNT(*) AS c
      |  FROM lineitem GROUP BY l_orderkey),
      |ek AS (
      |  SELECT 'events.user_id' AS key_col,
      |         CAST(length(bin(COUNT(*))) - 1 AS BIGINT) AS log2_df,
      |         COUNT(*) AS c
      |  FROM events GROUP BY user_id),
      |u AS (SELECT * FROM lk UNION ALL SELECT * FROM ek)
      |SELECT key_col, log2_df, COUNT(*) AS n_keys,
      |       CAST(SUM(c) AS BIGINT) AS n_rows
      |FROM u GROUP BY 1, 2""".stripMargin

  /** q_forecast_revenue — the TPC-H Q6 shape (the "what would revenue
    * change if we dropped these discounts" forecast): one scan of
    * lineitem with ALL THREE predicates pushed to parquet (date range,
    * discount band, quantity ceiling — the plan audit pins all three in
    * PushedFilters), then a single global sum. The discount band is the
    * RAW-COLUMN open interval (0.045, 0.075) — discounts are exact
    * hundredths, so it selects exactly {5%, 6%, 7%} while staying a
    * plain range the parquet reader can evaluate against row-group
    * stats (the r10 `round(l_discount*100).between(5,7)` form was an
    * expression filter that could never push — ADVICE_r10). revenue =
    * Σ price · discount stays EXACT: cents × integer-percent, so the
    * output is the ×10⁴-scaled integer and no float ever sums. The
    * canonical "filter selectivity is the whole query" scan — at
    * 100 TB this is the query whose runtime IS the scan rate, which is
    * why the predicates must reach the reader.
    */
  def qForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") > 0.045 && col("l_discount") < 0.075 &&
        col("l_quantity") < 24)
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_discount") * 100).cast("long"))
        .as("revenue_x10000"),
        count(lit(1)).as("n_items"))

  val forecastRevenueSql: String =
    """SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_x10000,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount > 0.045 AND l_discount < 0.075
      |  AND l_quantity < 24""".stripMargin

  /** q_pareto — revenue concentration per nation (the 80/20 read a
    * go-to-market review runs): the minimum number of customers whose
    * descending-revenue cumulative sum reaches 80% of the nation's
    * total. Per-customer revenue is one algebraic groupBy in exact
    * cents; the ranking window partitions by nation (25 partitions,
    * each customer appears once — NOT a corpus-wide sort), and the 80%
    * crossing is the integer cross-multiply `5·prev_cum < 4·total` so
    * no division or float touches the hash-compared output. Ties break
    * on c_custkey — a verified total order. Output: 25 rows.
    */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val byRev = Window.partitionBy("n_name")
      .orderBy(col("cents").desc, col("c_custkey"))
    rev
      .withColumn("cum", sum("cents").over(
        byRev.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum("cents").over(Window.partitionBy("n_name")))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(((col("cum") - col("cents")) * 5 < col("total") * 4)
          .cast("long")).as("n_top80"),
        max("total").as("total_cents"))
  }

  val paretoSql: String =
    """WITH rev AS (
      |  SELECT n.n_name, c.c_custkey,
      |         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
      |           AS BIGINT) AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT n_name, cents,
      |    CAST(SUM(cents) OVER (PARTITION BY n_name
      |      ORDER BY cents DESC, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(SUM(cents) OVER (PARTITION BY n_name) AS BIGINT) AS total
      |  FROM rev)
      |SELECT n_name, COUNT(*) AS n_customers,
      |       CAST(SUM(CAST((cum - cents) * 5 < total * 4 AS BIGINT))
      |         AS BIGINT) AS n_top80,
      |       MAX(total) AS total_cents
      |FROM r GROUP BY 1""".stripMargin

  /** q_backlog — open-order BACKLOG time series (the ops dashboard
    * "how deep is the unfulfilled queue" read): per day in a constant
    * 30-day window, the orders opened that day that are still open in
    * the snapshot, and the running backlog accumulated since corpus
    * start. The status filter pushes to the scan; daily counts are one
    * map-side-combinable groupBy bounded by \|days\| (~2.4k at any
    * corpus size — a calendar, not a corpus, cardinality), so the
    * single-partition cumulative window runs over a bounded frame, and
    * the 30-day slice lands after the cumsum (it needs all history —
    * the filter is on output rows, not scanned rows).
    */
  def qBacklog(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 * 86400")
        .as("day_s"))
      .groupBy("day_s").agg(count(lit(1)).as("n_opened"))
    val w = Window.orderBy("day_s")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("backlog", sum("n_opened").over(w))
      .filter(col("day_s") >= lit(867715200L) && // 1997-07-01 UTC
        col("day_s") < lit(870307200L))          // 1997-07-31 UTC
      .select("day_s", "n_opened", "backlog")
  }

  val backlogSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 * 86400 AS day_s,
      |         COUNT(*) AS n_opened
      |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
      |c AS (
      |  SELECT day_s, n_opened,
      |         CAST(SUM(n_opened) OVER (ORDER BY day_s
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS backlog
      |  FROM daily)
      |SELECT day_s, n_opened, backlog FROM c
      |WHERE day_s >= 867715200 AND day_s < 870307200""".stripMargin

  /** q_ship_lag — order→ship fulfillment-lag histogram (the SLA view a
    * fulfillment review reads): per (order priority, week-of-lag
    * bucket), line count plus the exact ×100 mean lag in days. The
    * synthetic data has NEGATIVE lags (29k lines at sf0.01 ship before
    * their order date), so every division is SYMMETRIC-TRUNCATING via
    * the CASE sign guard ON BOTH ENGINES — measured this round:
    * DuckDB `//` truncates on INTEGER operands ((-8)//3 = -2, floor
    * would be -3; the floors-vs-truncates rule in the verify skill
    * holds for DOUBLE operands), so neither engine's bare division is
    * trusted with a negative numerator. The orderkey equi-join is the
    * canonical co-partitioned
    * fact-fact shuffle (both sides hash on the same key — the layout
    * bucketing serves for free at 1000 executors); output bounded by
    * priorities × lag-weeks, all integers.
    */
  def qShipLag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ord_us")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("CASE WHEN ship_us >= ord_us" +
          " THEN (ship_us - ord_us) div 86400000000" +
          " ELSE -((ord_us - ship_us) div 86400000000) END")
          .as("lag_days"))
      .groupBy(col("o_orderpriority"),
        expr("CASE WHEN lag_days >= 0 THEN lag_days div 7" +
          " ELSE -((-lag_days) div 7) END").as("lag_week"))
      .agg(count(lit(1)).as("n_lines"),
        expr("CASE WHEN sum(lag_days) >= 0" +
          " THEN sum(lag_days) * 100 div count(1)" +
          " ELSE -((-sum(lag_days)) * 100 div count(1)) END")
          .as("avg_lag_days_x100"),
        max("lag_days").as("max_lag_days"))

  val shipLagSql: String =
    """WITH j0 AS (
      |  SELECT o.o_orderpriority, epoch_us(l.l_shipdate) AS su,
      |         epoch_us(o.o_orderdate) AS ou
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |j AS (
      |  SELECT o_orderpriority,
      |         CASE WHEN su >= ou THEN (su - ou) // 86400000000
      |              ELSE -((ou - su) // 86400000000) END AS lag_days
      |  FROM j0)
      |SELECT o_orderpriority,
      |       CASE WHEN lag_days >= 0 THEN lag_days // 7
      |            ELSE -((-lag_days) // 7) END AS lag_week,
      |       COUNT(*) AS n_lines,
      |       CASE WHEN SUM(lag_days) >= 0
      |            THEN CAST(SUM(lag_days) AS BIGINT) * 100 // COUNT(*)
      |            ELSE -(CAST(-SUM(lag_days) AS BIGINT) * 100 // COUNT(*))
      |       END AS avg_lag_days_x100,
      |       MAX(lag_days) AS max_lag_days
      |FROM j GROUP BY 1, 2""".stripMargin
}
