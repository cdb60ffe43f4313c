package graft

import graft.operators.{Dedup, MaterializeOnce, MetricsEtl}
import org.apache.spark.sql.functions._

/** Round-11 guards from ADVICE_r10: the simhash cap memo's lifecycle
  * (re-derives when the signature frame is rebuilt, retains nothing)
  * and q_scrape_jitter's loud int64-headroom guard (the closed form
  * wraps silently in Spark where DuckDB raises — the overflow regime
  * must fail, not hash-diverge).
  */
class Round11OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simhashCap memo is keyed to the frame INSTANCE: repeated calls " +
      "hit the memo; an invalidated (rebuilt) signature frame " +
      "re-derives the ladder, same cap (ADVICE_r10)") {
    val cap0 = Dedup.simhashCap(spark, dir)
    val d0 = Dedup.simhashCapDerivations.get()
    assert(Dedup.simhashCap(spark, dir) == cap0)
    assert(Dedup.simhashCapDerivations.get() == d0,
      "a second call on the same frame instance must hit the memo")
    MaterializeOnce.invalidate() // models in-place fixture regeneration
    assert(Dedup.simhashCap(spark, dir) == cap0,
      "an unchanged corpus re-derives the same cap")
    assert(Dedup.simhashCapDerivations.get() == d0 + 1,
      "a rebuilt signature frame is a NEW instance and must re-derive " +
        "the ladder sums — the stale-memo class ADVICE_r10 flagged")
  }

  test("q_scrape_jitter overflow guard: a series past the n·Σgap² " +
      "int64 headroom fails LOUDLY instead of wrapping (ADVICE_r10)") {
    import spark.implicits._
    // three samples with 2e9-s gaps: every INTERMEDIATE stays inside
    // int64 (gap² = 4e18, Σgap² = 8e18 — so ANSI mode has nothing to
    // raise on during aggregation), but Σgap = 4e9 > ⌊√Long.Max⌋ =
    // 3037000499, so (Σgap)² in the closed form is exactly the regime
    // the guard exists to catch BEFORE the var expression evaluates
    val g = 2000000000L * 1000000L // 2e9 s in µs
    val bad = Seq(
      ("m", 1L, 0L, 10L),
      ("m", 1L, g, 11L),
      ("m", 1L, 2L * g, 12L))
      .toDF("name", "user_id", "ts_us", "event_id")
    val e = intercept[Exception] {
      MetricsEtl.scrapeJitterFrom(bad).collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("q_scrape_jitter overflow"),
      s"expected the headroom assert, got: ${e.getMessage}")
    // and a within-headroom series passes through with the exact
    // population variance: gaps (1, 3) → var = (2·10 − 16) / 4 = 1
    val ok = Seq(
      ("m", 1L, 0L, 1L),
      ("m", 1L, 1000000L, 2L),
      ("m", 1L, 4000000L, 3L))
      .toDF("name", "user_id", "ts_us", "event_id")
    val r = MetricsEtl.scrapeJitterFrom(ok).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 2L && r(0).getLong(3) == 2L &&
      r(0).getLong(4) == 3L && r(0).getLong(5) == 1L,
      s"exact jitter row diverged: ${r(0)}")
  }

  test("q_probe_served == q_ivf_probe_curve at fixture SF (the serve " +
      "path swaps the machinery — persisted posting lists via " +
      "AnnIndex.query — not the math; the in-session cap is a no-op " +
      "here so the curves must coincide), and recall is monotone " +
      "in nprobe") {
    val served = graft.operators.Similarity.qProbeServed(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val insess = graft.operators.Similarity.qIvfProbeCurve(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(served.toSeq == insess.toSeq,
      s"served curve diverged: $served vs $insess")
    assert(served.map(_._1).toSeq == Seq(1, 2, 4))
    assert(served.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
      "recall@3 must be monotone in nprobe")
  }

  test("q_quality_calibration == a JVM decile replay over collected " +
      "scores and clusters") {
    val scores = graft.operators.TextAnalysis.qQuality(spark, dir)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(6) * 1000000d))).sortBy(t => (t._2, t._1))
    val cl = graft.operators.Dedup.clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = scores.length
    // ntile(10): first (n mod 10) tiles get ceil(n/10)
    val base = n / 10; val extra = n % 10
    val expect = scores.zipWithIndex.map { case ((id, s), i) =>
      val cut = extra * (base + 1)
      val d = if (i < cut) i / (base + 1) + 1
              else (i - cut) / base + extra + 1
      (d, id, s)
    }.groupBy(_._1).map { case (d, xs) =>
      val ids = xs.map(_._2)
      val nc = ids.count(cl.contains)
      val nl = ids.count(id => cl.get(id).exists(_ != id))
      (d, xs.length.toLong, nc.toLong, nl.toLong,
        nl.toLong * 1000000L / xs.length,
        xs.map(_._3).min, xs.map(_._3).max)
    }.toSet
    val got = graft.operators.Dedup.qQualityCalibration(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect, s"extra=${got -- expect} missing=${expect -- got}")
  }

  test("simhash JVM kernel == the relational bit-vote plan row-exact " +
      "(r11: the kernel is the registered build — the 60× explode " +
      "spilled past disk at sf100 — and the oracle recomputes the " +
      "relational form, so this equality IS the parity bridge)") {
    val kern = graft.operators.Dedup.simhashKernelPlan(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val rel = graft.operators.Dedup.simhashPlan(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(kern.size == rel.size && kern.nonEmpty)
    assert(kern == rel, {
      val bad = kern.collect { case (k, v) if rel.get(k) != Some(v) =>
        s"$k: $v vs ${rel.get(k)}" }.take(3)
      s"kernel diverged from relational plan: $bad"
    })
  }

  test("preflight TOTAL-saturation clause (r11 — the sf100 probe's " +
      "finding): join_rows collapsed to 0 by the stop cap must still " +
      "route to LSH when the cap dropped the pairing signal") {
    import graft.operators.Dedup.PreflightDecision
    // the sf100 regime: every shingle over the cap — exact is cheap
    // but blind
    assert(PreflightDecision(0L, 114L, 999999L, 200000000L).routeToLsh)
    // the sf10 regime: join-size clause
    assert(PreflightDecision(11409168136L, 1142L, 0L, 200000000L).routeToLsh)
    // a healthy corpus routes on neither clause
    assert(!PreflightDecision(100000L, 800000L, 1000L, 200000000L).routeToLsh)
    val pf = graft.operators.Dedup.preflight(spark, dir)
    assert(!pf.routeToLsh && pf.droppedPpm == 0L,
      s"fixture must stay on the exact path: $pf")
  }

  test("q_native_sum == a JVM bucket-merge replay, and == the " +
      "per-series q_native_hist rows at schema 0 re-aggregated " +
      "(the algebraic merge property)") {
    val raw = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 1000000 div 3600 * 3600").as("w"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def idx0(pos: Long): Long =
      if (pos <= 1L) 0L else 64L - java.lang.Long.numberOfLeadingZeros(pos - 1)
    val expect = raw.groupBy { case (n, u, w, c) =>
      val sgn = java.lang.Long.signum(c).toLong
      (n, w, sgn, if (sgn == 0) 0L else idx0(math.abs(c)))
    }.map { case ((n, w, sgn, bi), xs) =>
      (n, w, sgn, bi, xs.length.toLong,
        xs.map(_._2).distinct.length.toLong)
    }.toSet
    val got = graft.operators.NativeHistogram.qNativeSum(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
    // algebraic merge: re-aggregating the per-series schema-0 rows of
    // q_native_hist must give the same merged histogram
    val hist = graft.operators.NativeHistogram.qNativeHist(spark, dir)
      .filter(col("bucket_schema") === 0L).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val merged = hist.groupBy { case (n, w, sgn, bi, _) => (n, w, sgn, bi) }
      .map { case ((n, w, sgn, bi), xs) =>
        (n, w, sgn, bi, xs.map(_._5).sum, xs.length.toLong) }.toSet
    assert(merged == got, "bucket counts must merge algebraically")
  }

  test("q_hubness + q_mutual_knn == JVM replays over the collected " +
      "IVF top-3 edge list") {
    val edges = graft.operators.Similarity.qAnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nVec = Tables.embeddings(spark, dir).count()
    // hubness
    val indeg = edges.groupBy(_._3).map { case (b, xs) =>
      b -> xs.length.toLong }
    val allDeg = (0L until nVec).map(v => indeg.getOrElse(v, 0L))
    def lg(x: Long): Long =
      if (x == 0) -1L else 63L - java.lang.Long.numberOfLeadingZeros(x)
    val expectHub = allDeg.groupBy(lg).map { case (b, xs) =>
      (b, xs.length.toLong, xs.sum, xs.max) }.toSet
    val gotHub = graft.operators.Similarity.qHubness(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotHub == expectHub, s"hubness: $gotHub vs $expectHub")
    // mutual kNN
    val edgeSet = edges.map(e => (e._1, e._3)).toSet
    val byCell = edges.groupBy(_._2)
    val expectMut = byCell.map { case (cell, xs) =>
      val mutual = xs.count(e => e._1 < e._3 &&
        edgeSet.contains((e._3, e._1)))
      (cell, xs.length.toLong, mutual.toLong,
        mutual.toLong * 2L * 1000000L / xs.length)
    }.toSet
    val gotMut = graft.operators.Similarity.qMutualKnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotMut == expectMut, s"mutual: $gotMut vs $expectMut")
  }

  test("q_scrape_jitter guard is transparent on real data: no series " +
      "dropped vs the guardless aggregate") {
    val guarded = MetricsEtl.qScrapeJitter(spark, dir).count()
    val series = Tables.events(spark, dir)
      .groupBy("event_type", "user_id").count()
      .filter(col("count") >= 2).count()
    assert(guarded == series,
      "every series with ≥2 samples must survive the guard")
  }
}
