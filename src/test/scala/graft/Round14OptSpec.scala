package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r14 OPTIMIZATION equivalence pins: each rewrite this round claims
  * bit-identical results; these tests re-express the PRE-r14 plan
  * shape inline and assert frame equality on the fixture, so a future
  * drift in the optimized form fails loudly (the oracle gate would
  * also catch it — this localizes the blame).
  */
class Round14OptSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q_quantile_over_time: ONE array-percentile aggregate == the " +
      "three separate percentile aggregates (r14)") {
    val got = operators.MetricsEtl.qQuantileOverTime(spark, dir)
    val old = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L)
          .as("w_start"),
        col("value"))
      .groupBy("name", "user_id", "w_start")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
    assert(got.columns.toSeq ===
      Seq("name", "user_id", "w_start", "p50", "p90", "p99", "n"))
    assert(rows(got) === rows(old))
  }

  test("q_percentiles: array-percentile == separate aggregates (r14)") {
    val got = operators.Olap.qPercentiles(spark, dir)
    val old = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
    assert(got.columns.toSeq === Seq("l_returnflag", "p50", "p95", "p99", "n"))
    assert(rows(got) === rows(old))
  }

  test("q_native_hist: aggregate-first nested-ceiling derivation == " +
      "the r8 explode-before-aggregate form (r14)") {
    val got = operators.NativeHistogram.qNativeHist(spark, dir)
    // the pre-r14 plan: per-sample idx at all three schemas, explode,
    // then one big groupBy — re-expressed inline
    val i = Tables.events(spark, dir).select(
        col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L)
          .as("w_start"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("name"), col("user_id"), col("w_start"),
        signum(col("cents")).cast("long").as("sgn"),
        abs(col("cents")).as("pos"))
      .withColumn("idx0", when(col("pos") <= 1L, 0L)
        .otherwise(length(expr("conv(pos - 1, 10, 2)")).cast("long")))
      .withColumn("idx1", when(col("pos") <= 1L, 0L)
        .otherwise(length(expr("conv(pos * pos - 1, 10, 2)")).cast("long")))
      .withColumn("idxm1", expr("(idx0 + 1) div 2"))
    val old = i.select(col("name"), col("user_id"), col("w_start"),
        col("sgn"),
        explode(array(
          struct(lit(-1L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idxm1"))
              .as("bucket_idx")),
          struct(lit(0L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idx0"))
              .as("bucket_idx")),
          struct(lit(1L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idx1"))
              .as("bucket_idx")))).as("sb"))
      .select(col("name"), col("user_id"), col("w_start"),
        col("sb.bucket_schema").as("bucket_schema"), col("sgn"),
        col("sb.bucket_idx").as("bucket_idx"))
      .groupBy("name", "user_id", "w_start", "bucket_schema", "sgn",
        "bucket_idx")
      .agg(count(lit(1)).as("cnt"))
    assert(rows(got) === rows(old))
  }

  test("q_native_wide: aggregate-first at idx8 == the r9 " +
      "explode-before-aggregate form, FULL rows incl. bucket_idx " +
      "(r15, ADVICE_r14 — the count-conservation check could not see " +
      "an off-by-one shifting rows between buckets)") {
    val got = operators.NativeHistogram.qNativeWide(spark, dir)
    // the pre-r14 plan, with the index INDEPENDENTLY re-derived: the
    // boundary-table device is bypassed entirely — ⌈2⁸·log₂ pos⌉ =
    // bitLength(pos^256 − 1) exactly (BigInt, the schema-+1 identity
    // generalized), so a drift in idx8Expr/wideBounds fails here too
    val idx8F = udf((pos: Long) =>
      if (pos <= 1L) 0L else (BigInt(pos).pow(256) - 1).bitLength.toLong)
    val base = Tables.events(spark, dir).select(
        col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L)
          .as("w_start"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("name"), col("user_id"), col("w_start"),
        signum(col("cents")).cast("long").as("sgn"),
        abs(col("cents")).as("pos"))
      .withColumn("idx8", idx8F(col("pos")))
    val old = base.select(col("name"), col("user_id"), col("w_start"),
        col("sgn"),
        explode(array(Seq(-4, -2, 2, 4, 8).map { s =>
          val d = 1L << (8 - s)
          struct(lit(s.toLong).as("bucket_schema"),
            when(col("sgn") === 0L, 0L)
              .otherwise(expr(s"(idx8 + ${d - 1}) div $d"))
              .as("bucket_idx"))
        }: _*)).as("sb"))
      .select(col("name"), col("user_id"), col("w_start"),
        col("sb.bucket_schema").as("bucket_schema"), col("sgn"),
        col("sb.bucket_idx").as("bucket_idx"))
      .groupBy("name", "user_id", "w_start", "bucket_schema", "sgn",
        "bucket_idx")
      .agg(count(lit(1)).as("cnt"))
    assert(rows(got) === rows(old))
  }
}
