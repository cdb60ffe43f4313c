package graft

import graft.operators.MetricsEtl
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PromQL golden-vector conformance (VERDICT_r04 item 7).
  *
  * The oracle gate proves Spark↔DuckDB agreement; this suite proves
  * PROMETHEUS agreement: 151 edge-case fixtures (23 families) whose expected outputs
  * come from `tools/promql_ref.py` — an independent Python transcription
  * of Prometheus's PUBLIC algorithms (promql/functions.go
  * extrapolatedRate with the counter-reset / zero-cap /
  * avg-spacing-threshold extrapolation; promql/quantile.go
  * bucketQuantile over the observed-bucket schema). The fixtures replay
  * through the REAL operators (qRateExtrapolated / qIncrease /
  * qHistogramQuantile / qHoltWinters) on events-shaped parquet, so the
  * whole production path — parquet scan, µs timestamps, cents
  * quantization, window assignment, the full extrapolation expression —
  * is what's conformance-tested, not a unit-sized extract.
  *
  * Edge cases covered: counter resets mid-window / at the first delta /
  * AT THE 1h WINDOW EDGE, reset-to-zero, extrapolation with samples
  * clustered at either window edge, the zero-cap (durationToZero)
  * branch both engaged and not, flat and decreasing counters,
  * sub-second sample spacing, quantiles in the first / middle / +Inf
  * bucket, rank exactly on a bucket boundary, empty middle buckets,
  * and the α=β=0.5 Holt-Winters recurrence on five shapes.
  *
  * Scope notes (documented divergences, both sides computed over the
  * SAME convention): graft evaluates rate over the fixed grid window
  * [W, W+300) rather than PromQL's (T−300, T] — samples sit strictly
  * inside the window so the convention cannot matter; qIncrease applies
  * the reset rule without boundary extrapolation (its documented
  * scope); qHoltWinters smooths integer cents with exact offset-shift
  * halving, and the Python twin replays that exact arithmetic.
  */
class PromqlConformanceSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures: Map[String, Seq[Row]] = {
    val path = getClass.getResource("/promql_fixtures.json").getPath
    val df = spark.read.option("multiLine", "true").json(path)
    // one row; each op column is an array of case structs
    val row = df.collect().head
    df.schema.fieldNames.map { op =>
      op -> row.getAs[scala.collection.Seq[Row]](op).toSeq
    }.toMap
  }

  /** Build an events-shaped parquet dir from (name, tSeconds, value). */
  private def eventsDir(rows: Seq[(String, Double, Double)]): String = {
    val dir = tmpDir("promql_fixture")
    rows.zipWithIndex.map { case ((name, t, v), i) =>
      (i.toLong, name, 0L, (t * 1e6).round, v, "{}")
    }.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def collectByName(df: DataFrame, valueCol: String)
      : Map[String, Double] =
    df.collect().map(r =>
      r.getAs[String]("name") -> r.getAs[Double](valueCol)).toMap

  test("rate: 14 extrapolatedRate edge cases match promql/functions.go") {
    val cases = fixtures("rate")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = collectByName(
      MetricsEtl.qRateExtrapolated(spark, eventsDir(rows)), "rate_ext")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_rate")
      assert(got.contains(name), s"$name produced no rate row")
      assert(math.abs(got(name) - want) < 1.01e-6,
        s"$name: rate ${got(name)} != prometheus $want")
    }
    assert(got.size == cases.size)
  }

  test("increase: reset rule incl. reset at the 1h window edge") {
    val cases = fixtures("increase")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qIncrease(spark, eventsDir(rows))
      .collect()
      .groupBy(_.getAs[String]("name"))
      .map { case (n, rs) =>
        n -> rs.map(r => (r.getAs[Long]("w_start"),
          r.getAs[Double]("increase"))).sortBy(_._1).toSeq
      }
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](
        "expected").map(p => (p(0).toLong, p(1))).toSeq
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
  }

  test("histogram_quantile: bucketQuantile over the observed schema") {
    val W = 1704067200L
    // bucket representative values: le 1/2/5/10/+Inf
    val reps = Seq(0.5, 1.5, 3.0, 7.0, 20.0)
    val cases = fixtures("histogram_quantile")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      val counts = c.getAs[scala.collection.Seq[Long]]("counts")
      counts.zip(reps).zipWithIndex.flatMap { case ((n, rep), b) =>
        (0L until n).map(i => (name, (W + b * 600 + i).toDouble, rep))
      }
    }
    val got = collectByName(
      MetricsEtl.qHistogramQuantile(spark, eventsDir(rows)), "q90")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_q90")
      assert(got.contains(name), s"$name produced no q90 row")
      assert(math.abs(got(name) - want) < 1.01e-6,
        s"$name: q90 ${got(name)} != prometheus $want")
    }
  }

  test("irate: last-two-samples rate with the reset rule (6 cases)") {
    val cases = fixtures("irate")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = collectByName(
      MetricsEtl.qIrate(spark, eventsDir(rows)), "irate")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_irate")
      assert(got.contains(name), s"$name produced no irate row")
      assert(math.abs(got(name) - want) < 1.01e-6,
        s"$name: irate ${got(name)} != prometheus $want")
    }
  }

  test("changes: successive-unequal counting matches funcChanges (7 cases)") {
    val cases = fixtures("changes")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qChanges(spark, eventsDir(rows)).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Long]("changes"), r.getAs[Long]("n_points"))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      assert(got(name) == ((c.getAs[Long]("expected_changes"),
        c.getAs[Long]("expected_points"))),
        s"$name: ${got(name)}")
    }
    assert(got.size == cases.size)
  }

  test("idelta: last-minus-previous with the two-sample guard (7 cases)") {
    val cases = fixtures("idelta")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qIdelta(spark, eventsDir(rows)).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Long]("idelta_cents"), r.getAs[Long]("gap_us"))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      if (c.isNullAt(c.fieldIndex("expected_idelta_cents"))) {
        assert(!got.contains(name),
          s"$name: under-two-sample window must emit NO row")
      } else {
        assert(got(name) == ((c.getAs[Long]("expected_idelta_cents"),
          c.getAs[Long]("expected_gap_us"))),
          s"$name: ${got(name)}")
      }
    }
  }

  test("resets: negative-delta counting, window-local (4 cases)") {
    val cases = fixtures("resets")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qResets(spark, eventsDir(rows)).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Long]("resets"), r.getAs[Long]("n_points"))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      assert(got(name) == ((c.getAs[Long]("expected_resets"),
        c.getAs[Long]("expected_n"))),
        s"$name: ${got(name)}")
    }
  }

  test("delta: last-first gauge change, no reset correction (3 cases)") {
    val cases = fixtures("delta")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = collectByName(
      MetricsEtl.qDelta(spark, eventsDir(rows)), "delta")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      assert(got.get(name).contains(c.getAs[Double]("expected_delta")),
        s"$name: ${got.get(name)}")
    }
  }

  test("deriv: integer least squares == Prometheus linearRegression") {
    // the twin computes promql/functions.go's covariance-form float
    // regression in value/second; the operator computes exact-integer
    // normal equations in cents/millisecond — rounded agreement proves
    // the reformulation is the same line
    val cases = fixtures("deriv")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = collectByName(
      MetricsEtl.qDeriv(spark, eventsDir(rows)), "slope")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_slope")
      assert(got.contains(name), s"$name produced no slope row")
      assert(math.abs(got(name) - want) < 1.01e-6,
        s"$name: slope ${got(name)} != prometheus $want")
    }
    assert(got.size == cases.size)
  }

  test("predict_linear: extrapolation 300s past the window end") {
    val cases = fixtures("predict_linear")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = collectByName(
      MetricsEtl.qPredictLinear(spark, eventsDir(rows)), "predicted")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_predicted")
      assert(got.contains(name), s"$name produced no prediction row")
      assert(math.abs(got(name) - want) < 1.01e-4,
        s"$name: predicted ${got(name)} != prometheus $want")
    }
    assert(got.size == cases.size)
  }

  test("histogram_fraction: [3,8] mass interpolation incl. empty buckets") {
    val W = 1704067200L
    val reps = Seq(0.5, 1.5, 3.0, 7.0, 20.0)
    val cases = fixtures("histogram_fraction")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      val counts = c.getAs[scala.collection.Seq[Long]]("counts")
      counts.zip(reps).zipWithIndex.flatMap { case ((n, rep), b) =>
        (0L until n).map(i => (name, (W + b * 600 + i).toDouble, rep))
      }
    }
    val got = MetricsEtl.qHistogramFraction(spark, eventsDir(rows))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("h_count"), r.getAs[Double]("h_avg"),
          r.getAs[Double]("frac_3_8")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (n, avg, frac) = got(name)
      assert(n == c.getAs[Long]("expected_count"), s"$name count $n")
      assert(math.abs(avg - c.getAs[Double]("expected_avg")) < 1.01e-6,
        s"$name: avg $avg")
      assert(math.abs(frac - c.getAs[Double]("expected_frac")) < 1.01e-6,
        s"$name: frac $frac != prometheus-style interpolation")
    }
  }

  /** Materialize per-case value lists (one window each) as events. */
  private def valueRows(cases: Seq[Row]): Seq[(String, Double, Double)] = {
    val W = 1704067200L
    cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[Double]]("values").zipWithIndex
        .map { case (v, i) => (name, (W + 60L * (i + 1)).toDouble, v) }
    }
  }

  test("quantile_over_time: promql quantile() rank interpolation") {
    // single-sample, even/odd counts, duplicate values, and a rank
    // landing exactly on an index — promql/quantile.go's quantile()
    // over raw samples vs Spark `percentile` (same q*(n-1) rank rule)
    val cases = fixtures("quantile_over_time")
    val got = MetricsEtl.qQuantileOverTime(spark, eventsDir(valueRows(cases)))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Double]("p99"), r.getAs[Long]("n")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (p50, p90, p99, n) = got(name)
      assert(n == c.getAs[Long]("expected_n"), s"$name n=$n")
      assert(math.abs(p50 - c.getAs[Double]("expected_p50")) < 1.01e-4,
        s"$name: p50 $p50")
      assert(math.abs(p90 - c.getAs[Double]("expected_p90")) < 1.01e-4,
        s"$name: p90 $p90")
      assert(math.abs(p99 - c.getAs[Double]("expected_p99")) < 1.01e-4,
        s"$name: p99 $p99")
    }
    assert(got.size == cases.size)
  }

  test("mad_over_time: median absolute deviation, promql quantile rule") {
    val cases = fixtures("mad_over_time")
    val got = MetricsEtl.qMadOverTime(spark, eventsDir(valueRows(cases)))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Double]("mad"), r.getAs[Double]("median_v")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (mad, med) = got(name)
      assert(math.abs(mad - c.getAs[Double]("expected_mad")) < 1.01e-4,
        s"$name: mad $mad")
      assert(math.abs(med - c.getAs[Double]("expected_median")) < 1.01e-4,
        s"$name: median $med")
    }
    assert(got.size == cases.size)
  }

  test("stdvar_over_time: float population variance == integer form") {
    val cases = fixtures("stdvar_over_time")
    val got = MetricsEtl.qStdvarOverTime(spark, eventsDir(valueRows(cases)))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Double]("stdvar_v"), r.getAs[Double]("stddev_v")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (sv, sd) = got(name)
      assert(math.abs(sv - c.getAs[Double]("expected_stdvar")) < 1.01e-6,
        s"$name: stdvar $sv")
      assert(math.abs(sd - c.getAs[Double]("expected_stddev")) < 1.01e-6,
        s"$name: stddev $sd")
    }
    assert(got.size == cases.size)
  }

  test("holt_winters: exact-cents recurrence twin on five shapes") {
    val W = 1704067200L
    val cases = fixtures("holt_winters")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[Double]]("values").zipWithIndex
        .map { case (v, i) => (name, (W + 60L * (i + 1)).toDouble, v) }
    }
    val got = collectByName(
      MetricsEtl.qHoltWinters(spark, eventsDir(rows)), "smoothed")
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[Double]("expected_smoothed")
      assert(got.get(name).contains(want),
        s"$name: smoothed ${got.get(name)} != $want")
    }
  }

  // ---- aggregation-operator family (VERDICT_r06 item 8): the
  // cross-SERIES aggregators vs tools/promql_ref.py transcriptions of
  // promql/engine.go aggregation(). Fixture samples are
  // [series_key, sample_idx, value] triples inside one 1h window. ----

  private val W = 1704067200L

  /** Events rows with an EXPLICIT user id (the cross-series fixtures
    * need one series per user): (name, user, tSeconds, value). */
  private def eventsDirU(rows: Seq[(String, Long, Double, Double)]): String = {
    val dir = tmpDir("promql_fixture_u")
    rows.zipWithIndex.map { case ((name, user, t, v), i) =>
      (i.toLong, name, user, (t * 1e6).round, v, "{}")
    }.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Per-case (series_key, sampleIdx, value) triples from `samples`. */
  private def sampleTriples(c: Row): scala.collection.Seq[(Long, Long, Double)] =
    c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
      .map(s => (s(0).toLong, s(1).toLong, s(2)))

  test("topk/bottomk: k-heap selection with exact ties at and below rank k") {
    val cases = fixtures("topk_bottomk")
    // one name per case; series key → user_id; sample idx → seconds
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      sampleTriples(c).map { case (u, i, v) =>
        (name, u, (W + 60L * (i + 1)).toDouble, v)
      }
    }
    val dir = eventsDirU(rows)
    def ranked(df: DataFrame): Map[String, Seq[(Long, Double)]] =
      df.collect().groupBy(_.getAs[String]("name"))
        .map { case (n, rs) =>
          n -> rs.sortBy(_.getAs[Number]("rk").longValue)
            .map(r => (r.getAs[Long]("user_id"),
              r.getAs[Double]("series_sum"))).toSeq
        }
    val gotTop = ranked(MetricsEtl.qPromqlTopk(spark, dir))
    val gotBot = ranked(MetricsEtl.qBottomk(spark, dir))
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      def want(field: String): Seq[(Long, Double)] =
        c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](field)
          .map(p => (p(0).toLong, p(1))).toSeq
      assert(gotTop.get(name).contains(want("expected_topk")),
        s"$name: topk ${gotTop.get(name)} != ${want("expected_topk")}")
      assert(gotBot.get(name).contains(want("expected_bottomk")),
        s"$name: bottomk ${gotBot.get(name)} != ${want("expected_bottomk")}")
    }
    assert(gotTop.size == cases.size && gotBot.size == cases.size)
  }

  test("quantile aggregator: rank interpolation across series") {
    val cases = fixtures("quantile_agg")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      sampleTriples(c).map { case (u, _, v) =>
        (name, u, (W + 60L * (u + 1)).toDouble, v)
      }
    }
    // qQuantileByLabel groups by (name, k, w_start) — props are "{}",
    // so k is NULL and each case's samples form exactly one group
    val got = MetricsEtl.qQuantileByLabel(spark, eventsDirU(rows))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Long]("n")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (p50, p90, n) = got(name)
      assert(n == c.getAs[Long]("expected_n"), s"$name n=$n")
      assert(math.abs(p50 - c.getAs[Double]("expected_p50")) < 1.01e-4,
        s"$name: p50 $p50")
      assert(math.abs(p90 - c.getAs[Double]("expected_p90")) < 1.01e-4,
        s"$name: p90 $p90")
    }
    assert(got.size == cases.size)
  }

  test("stddev/stdvar aggregator: population moments across series") {
    val cases = fixtures("stddev_agg")
    // qStddevByLabel groups by (user_id, w_start) ACROSS names — so the
    // case key becomes the user id and each series key becomes a name
    val rows = cases.zipWithIndex.flatMap { case (c, ci) =>
      sampleTriples(c).map { case (s, i, v) =>
        (s"s$s", ci.toLong, (W + 60L * (i + 1) + s).toDouble, v)
      }
    }
    val got = MetricsEtl.qStddevByLabel(spark, eventsDirU(rows))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_series"), r.getAs[Double]("stdvar_v"),
          r.getAs[Double]("stddev_v")))).toMap
    cases.zipWithIndex.foreach { case (c, ci) =>
      val name = c.getAs[String]("name")
      val (n, sv, sd) = got(ci.toLong)
      assert(n == c.getAs[Long]("expected_n"), s"$name n=$n")
      assert(math.abs(sv - c.getAs[Double]("expected_stdvar")) < 2e-6,
        s"$name: stdvar $sv != ${c.getAs[Double]("expected_stdvar")}")
      assert(math.abs(sd - c.getAs[Double]("expected_stddev")) < 2e-6,
        s"$name: stddev $sd != ${c.getAs[Double]("expected_stddev")}")
    }
    assert(got.size == cases.size)
  }

  test("over_time: min/max/avg/sum/count window aggregations") {
    val cases = fixtures("over_time")
    val got = MetricsEtl.qOverTime(spark, eventsDir(valueRows(cases)))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Double]("min_v"), r.getAs[Double]("max_v"),
          r.getAs[Double]("sum_v"), r.getAs[Long]("avg_x10000"),
          r.getAs[Long]("count_v")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val (mn, mx, sm, avg, n) = got(name)
      assert(mn == c.getAs[Double]("expected_min"), s"$name min $mn")
      assert(mx == c.getAs[Double]("expected_max"), s"$name max $mx")
      assert(math.abs(sm - c.getAs[Double]("expected_sum")) < 1.01e-2,
        s"$name sum $sm")
      assert(avg == c.getAs[Long]("expected_avg_x10000"), s"$name avg $avg")
      assert(n == c.getAs[Long]("expected_count"), s"$name n $n")
    }
    assert(got.size == cases.size)
  }

  test("ts_of: latest-tie extrema timestamps match funcTsOf*OverTime") {
    val cases = fixtures("ts_of")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qTsOfExtrema(spark, eventsDir(rows))
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("ts_of_max_us"), r.getAs[Long]("ts_of_min_us"),
          r.getAs[Long]("ts_of_last_us")))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = (c.getAs[Long]("expected_ts_of_max_us"),
        c.getAs[Long]("expected_ts_of_min_us"),
        c.getAs[Long]("expected_ts_of_last_us"))
      assert(got(name) == want, s"$name: ${got(name)} != $want")
    }
    assert(got.size == cases.size)
  }

  test("round: funcRound ties-up rule at three granularities (9 cases)") {
    val cases = fixtures("round")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
        .map(s => (name, s(0), s(1)))
    }
    val got = MetricsEtl.qPromqlRound(spark, eventsDir(rows)).collect()
      .map(r => r.getAs[String]("name") ->
        Seq(r.getAs[Long]("round_c1"), r.getAs[Long]("round_c50"),
          r.getAs[Long]("round_c100"))).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[Double]]("expected")
        .map(_.toLong).toSeq
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
    assert(got.size == cases.size)
  }

  test("count_values: per-value occurrence counting incl. cent rounding") {
    val cases = fixtures("count_values")
    val rows = cases.flatMap { c =>
      val name = c.getAs[String]("name")
      sampleTriples(c).map { case (u, i, v) =>
        (name, u, (W + 60L * (i + 1)).toDouble, v)
      }
    }
    val got = MetricsEtl.qCountValues(spark, eventsDirU(rows))
      .collect()
      .groupBy(_.getAs[String]("name"))
      .map { case (n, rs) =>
        n -> rs.map(r => (r.getAs[Long]("value_cents"),
          r.getAs[Long]("n"))).sortBy(_._1).toSeq
      }
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](
        "expected").map(p => (p(0).toLong, p(1).toLong)).toSeq
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
    assert(got.size == cases.size)
  }

  // ---- native-histogram family (VERDICT_r07 item 4): sparse
  // exponential buckets, transcribed independently in promql_ref.py
  // (nh_index / nh_quantile / nh_fraction) ----

  private def nhCaseRows(c: Row): Seq[(String, Double, Double)] = {
    val name = c.getAs[String]("name")
    c.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("samples")
      .map(s => (name, s(0), s(1))).toSeq
  }

  test("native histogram: bucket indexes at schemas -1/0/+1 (9 shapes)") {
    val cases = fixtures("native_histogram")
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeHist(spark, dir).collect()
      .groupBy(_.getAs[String]("name"))
      .map { case (n, rs) => n -> rs.map(r =>
        (r.getAs[Long]("bucket_schema"), r.getAs[Long]("sgn"),
          r.getAs[Long]("bucket_idx"), r.getAs[Long]("cnt"))).toSet
      }
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](
        "expected_buckets").map(b => (b(0), b(1), b(2), b(3))).toSet
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
    assert(got.size == cases.size)
  }

  test("native histogram: quantile value-order crossing + v3 exponential interpolation") {
    val cases = fixtures("native_histogram")
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeQuantile(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("phi_x100")) ->
        r.getAs[Double]("q_value")).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      for ((phi, field) <- Seq(50L -> "expected_q50", 90L -> "expected_q90")) {
        val want = c.getAs[Double](field)
        val g = got((name, phi))
        assert(math.abs(g - want) < 1.01e-6,
          s"$name phi=$phi: $g != prometheus-model $want")
      }
    }
  }

  test("native histogram WIDE schemas -4/-2/+2/+4/+8: boundary-table " +
      "index math == exact bignum ceil(2^s*log2 v) (6 shapes, r9)") {
    val cases = fixtures("nh_wide")
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeWide(spark, dir).collect()
      .groupBy(_.getAs[String]("name"))
      .map { case (n, rs) => n -> rs.map(r =>
        (r.getAs[Long]("bucket_schema"), r.getAs[Long]("sgn"),
          r.getAs[Long]("bucket_idx"), r.getAs[Long]("cnt"))).toSet
      }
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](
        "expected_buckets").map(b => (b(0), b(1), b(2), b(3))).toSet
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
    assert(got.size == cases.size)
  }

  test("NHCB custom-bucket layout: bound-exclusive indexing incl. " +
      "negatives, overflow and on-bound values (6 shapes, r9)") {
    val cases = fixtures("nhcb")
    // the operator's bounds constant and the fixtures' must be the
    // same list, or the comparison proves nothing
    cases.foreach { c =>
      assert(c.getAs[scala.collection.Seq[Long]]("bounds").toSeq ==
        operators.NativeHistogram.CustomBounds)
    }
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeCustom(spark, dir).collect()
      .groupBy(_.getAs[String]("name"))
      .map { case (n, rs) => n -> rs.map(r =>
        (r.getAs[Long]("bucket_idx"), r.getAs[Long]("le_cents"),
          r.getAs[Long]("cnt"))).toSet
      }
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      val want = c.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](
        "expected_buckets").map(b => (b(0), b(1), b(2))).toSet
      assert(got.get(name).contains(want),
        s"$name: ${got.get(name)} != $want")
    }
  }

  test("NHCB quantile: classic linear bucketQuantile over the custom " +
      "layout (lowest-from-0 and overflow-returns-last-bound rules, r9)") {
    val cases = fixtures("nhcb")
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeCustomQ(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("phi_x100")) ->
        r.getAs[Double]("q_value")).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      for ((phi, field) <- Seq(50L -> "expected_q50", 90L -> "expected_q90")) {
        val want = c.getAs[Double](field)
        val g = got((name, phi))
        assert(math.abs(g - want) < 1.01e-6,
          s"$name phi=$phi: $g != prometheus-model $want")
      }
    }
  }

  test("native histogram: fraction full/straddling-bucket rule at both bounds") {
    val cases = fixtures("native_histogram")
    val dir = eventsDir(cases.flatMap(nhCaseRows))
    val got = operators.NativeHistogram.qNativeFraction(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("bound_x100")) ->
        r.getAs[Double]("frac_le")).toMap
    cases.foreach { c =>
      val name = c.getAs[String]("name")
      for ((b, field) <- Seq(500L -> "expected_frac_500",
          5000L -> "expected_frac_5000")) {
        val want = c.getAs[Double](field)
        val g = got((name, b))
        assert(math.abs(g - want) < 1.01e-6,
          s"$name bound=$b: $g != prometheus-model $want")
      }
    }
  }
}
