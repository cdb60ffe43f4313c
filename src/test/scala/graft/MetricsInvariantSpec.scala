package graft

import graft.operators.{MetricsEtl, Olap}
import org.apache.spark.sql.functions._

/** Semantic invariants of the metrics-ETL and OLAP queries at sf0.001 —
  * conservation laws and bounds the cross-engine oracle cannot check. */
class MetricsInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val nEvents = Tables.events(spark, dir).count()

  test("window batches conserve rows; windows tile without overlap") {
    val b = MetricsEtl.qWindowBatches(spark, dir)
    assert(b.agg(sum("batch_rows")).head().getLong(0) == nEvents)
    val bad = b.filter(col("window_end") - col("window_start") =!= 300)
    assert(bad.count() == 0)
    assert(b.groupBy("window_start").count().filter(col("count") > 1)
      .count() == 0, "window starts must be unique")
  }

  test("etl state: progress within (start, start+size], ledger conserves rows") {
    val st = MetricsEtl.qEtlState(spark, dir)
    val bad = st.filter(col("timestamp_progress") <= col("timestamp_start") ||
      col("timestamp_progress") > col("timestamp_start") + 300)
    assert(bad.count() == 0)
    assert(st.agg(sum("batch_rows")).head().getLong(0) == nEvents)
  }

  test("skipped accounting conserves: rows + skipped = events per series") {
    val s = MetricsEtl.qMetricsSkipped(spark, dir)
    val total = s.agg(sum("rows_count"), sum("skipped_count")).head()
    assert(total.getLong(0) + total.getLong(1) == nEvents)
  }

  test("dedup_final keeps at most one row per (user, type), none invented") {
    val d = MetricsEtl.qDedupFinal(spark, dir)
    assert(d.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
    assert(d.count() <= nEvents)
  }

  test("histogram quantile within bucket range; one row per group") {
    val q = MetricsEtl.qHistogramQuantile(spark, dir)
    assert(q.filter(col("q90") < 0 || col("q90") > 10).count() == 0)
    assert(q.groupBy("name", "w_start").count()
      .filter(col("count") > 1).count() == 0,
      "quantile selection must pick exactly one bucket per group")
  }

  test("promql topk ranks dense 1..3 within (name, window)") {
    val t = MetricsEtl.qPromqlTopk(spark, dir).collect()
      .groupBy(r => (r.getAs[String]("name"), r.getAs[Long]("w_start")))
    t.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rs.length), "ranks must be dense from 1")
    }
  }

  test("rollup: grand total row matches sum of leaf rows") {
    val r = Olap.qRollup(spark, dir)
    val grand = r.filter(col("gid") === 3).head()
    val leaves = r.filter(col("gid") === 0)
      .agg(sum("revenue"), sum("n")).head()
    assert(math.abs(grand.getAs[Double]("revenue") - leaves.getDouble(0)) < 0.05)
    assert(grand.getAs[Long]("n") == leaves.getLong(1))
  }

  test("sessionize: every event lands in exactly one session") {
    val s = Olap.qSessionize(spark, dir)
    assert(s.agg(sum("n_events")).head().getLong(0) == nEvents)
    assert(s.filter(col("t_end") < col("t_start")).count() == 0)
  }

  test("semi and anti join partition customers against the urgent predicate") {
    val nCust = Tables.customer(spark, dir).count()
    val semi = Olap.qSemiJoin(spark, dir).count()
    val anti = Olap.qAntiJoin(spark, dir)
      .agg(sum("n_custs_no_urgent")).head().getLong(0)
    assert(semi + anti == nCust,
      "EXISTS and NOT EXISTS must partition the customer set")
  }

  // ---- round-3 additions: new PromQL family + sketches + IVF ----

  test("resets conserve points and are bounded by n_points - 1") {
    val r = MetricsEtl.qResets(spark, dir)
    assert(r.agg(sum("n_points")).head().getLong(0) == nEvents,
      "every event must land in exactly one series-window")
    assert(r.filter(col("resets") < 0 ||
      col("resets") >= col("n_points")).count() == 0)
  }

  test("rate family agrees on which windows are rateable") {
    // q_rate and q_rate_extrapolated share grouping + n>=2 + span>0
    // filters → identical key sets; irate additionally needs its last
    // two samples at distinct timestamps → subset
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no >=2-sample window
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("name", "user_id", "w_start").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rate = keys(MetricsEtl.qRate(spark, sf01))
    val ext = keys(MetricsEtl.qRateExtrapolated(spark, sf01))
    val irate = keys(MetricsEtl.qIrate(spark, sf01))
    assert(rate.nonEmpty, "sf0.01 must produce rateable windows")
    assert(ext == rate)
    assert(irate.subsetOf(rate))
  }

  test("delta exists exactly for multi-sample 1h windows") {
    val deltaKeys = MetricsEtl.qDelta(spark, dir)
      .select("name", "user_id", "w_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val multi = MetricsEtl.qOverTime(spark, dir)
      .filter(col("count_v") >= 2)
      .select("name", "user_id", "w_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(deltaKeys == multi)
  }

  test("changes bounded by n_points - 1; stddev^2 consistent with stdvar") {
    val c = MetricsEtl.qChanges(spark, dir)
    assert(c.agg(sum("n_points")).head().getLong(0) == nEvents)
    assert(c.filter(col("changes") < 0 ||
      col("changes") >= col("n_points")).count() == 0)
    val sv = MetricsEtl.qStdvarOverTime(spark, dir).collect()
    sv.foreach { r =>
      val stdvar = r.getAs[Double]("stdvar_v")
      val stddev = r.getAs[Double]("stddev_v")
      assert(stdvar >= 0 && stddev >= 0)
      assert(math.abs(stddev * stddev - stdvar) < 1e-4,
        s"stddev^2 must track stdvar: $stddev $stdvar")
    }
  }

  test("mad is non-negative and bounded by the window's value spread") {
    val m = MetricsEtl.qMadOverTime(spark, dir)
    assert(m.filter(col("mad") < 0).count() == 0)
    val spread = MetricsEtl.qOverTime(spark, dir)
      .select(col("name").as("on"), col("user_id").as("ou"),
        col("w_start").as("ow"), (col("max_v") - col("min_v")).as("spread"))
    val bad = m.join(spread, col("name") === col("on") &&
        col("user_id") === col("ou") && col("w_start") === col("ow"))
      .filter(col("mad") > col("spread") + 0.0001)
    assert(bad.count() == 0, "MAD can never exceed max - min")
  }

  test("offset compare: delta is exactly curr - prev") {
    val o = MetricsEtl.qOffsetCompare(spark, "/root/testdata/sf0.01")
    val bad = o.filter(
      abs(col("delta_v") - (col("curr_v") - col("prev_v"))) > 0.001)
    assert(bad.count() == 0)
  }

  test("quantile by label: p50 <= p90, one row per group") {
    val q = MetricsEtl.qQuantileByLabel(spark, dir)
    assert(q.filter(col("p50") > col("p90")).count() == 0)
    assert(q.groupBy("name", "k", "w_start").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("approx percentiles sit inside the 5% validation band") {
    val p = Olap.qPercentilesApprox(spark, dir).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok") &&
        r.getAs[Boolean]("p99_ok"))
    }
  }

  test("asof join: matched click is at or before the purchase; one row per purchase") {
    val a = Olap.qAsofJoin(spark, dir)
    assert(a.filter(col("click_ts_us") > col("ts_us")).count() == 0,
      "asof must never look forward")
    assert(a.filter(col("click_ts_us").isNotNull && col("gap_s") < 0)
      .count() == 0)
    assert(a.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() == purchases, "left semantics: every purchase surfaces")
  }

  test("range join: every match really sits inside its interval") {
    val r = Olap.qRangeJoin(spark, dir)
    assert(r.filter(col("p_ts") < col("t_start") ||
      col("p_ts") > col("t_end")).count() == 0)
    // and pair uniqueness (the bucketed join must not duplicate)
    assert(r.groupBy("session_id", "user_id", "p_event").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("big orders: aggregate-first threshold holds on every row") {
    val b = Olap.qBigOrders(spark, dir)
    assert(b.filter(col("sum_qty") <= 250.0).count() == 0)
    assert(b.groupBy("o_orderkey").count().filter(col("count") > 1)
      .count() == 0, "one row per qualifying order")
  }

  test("multi-probe LSH: dense ranks, deduped pairs, cosine in [-1,1]") {
    val a = graft.operators.Similarity.qAnnLshBands(spark, dir)
    assert(a.filter(col("cosine") < -1.000001 || col("cosine") > 1.000001)
      .count() == 0)
    // a pair found by both bands must appear once
    assert(a.groupBy("vec_id", "neighbor_id").count()
      .filter(col("count") > 1).count() == 0)
    val byVec = a.collect().groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("IVF ANN: dense ranks, valid cells, cosine in [-1,1]") {
    val a = graft.operators.Similarity.qAnnIvf(spark, dir)
    assert(a.filter(col("cosine") < -1.000001 || col("cosine") > 1.000001)
      .count() == 0)
    assert(a.filter(col("cell") < 0 || col("cell") >= 16).count() == 0)
    val byVec = a.collect().groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.length))
    }
  }
}
