package graft

import graft.operators.{Dedup, MetricsEtl, Olap, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the r10 batch (tiered rollups,
  * scrape jitter, staleness, Q6 forecast revenue, Pareto
  * concentration, duplication score, affix groups, length outliers,
  * IVF imbalance), same convention as Round6-9g: from-scratch
  * re-derivations on the raw parquet, collected at sf0.001 —
  * different loop structure, same integers.
  */
class Round10OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val events: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("q_rollup_tiers: the 1h tier computed FROM 5m blocks equals the " +
      "1h tier computed directly from raw samples (the compaction " +
      "invariant), and == the registered query") {
    // direct-from-raw 1h tier (count/sum/min/max are algebraic, so
    // tiering must be lossless for them)
    val direct = events.groupBy { case (n, _, ts, _) =>
      (n, ts / 1000000L / 3600L * 3600L)
    }.map { case ((n, w), xs) =>
      val blocks = xs.map { case (_, u, ts, _) =>
        (u, ts / 1000000L / 300L * 300L) }.distinct.size.toLong
      val series = xs.map(_._2).distinct.size.toLong
      val cs = xs.map(_._4)
      (n, w, blocks, series, xs.size.toLong, cs.sum, cs.min, cs.max)
    }.toSet
    val got = MetricsEtl.qRollupTiers(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == direct, s"tier mismatch: ${got.diff(direct).take(3)}")
  }

  test("q_scrape_jitter == a JVM gap-statistics replay") {
    val expect = events.groupBy(e => (e._1, e._2)).flatMap {
      case ((n, u), xs) =>
        // the gap sequence reads only the sorted ts multiset — tie
        // order between same-µs samples cannot change any diff
        val sorted = xs.sortBy(_._3)
        val gaps = sorted.map(_._3).sliding(2).collect {
          case Seq(a, b) => (b - a) / 1000000L
        }.toSeq
        if (gaps.isEmpty) None
        else {
          val ng = gaps.size.toLong
          val s1 = gaps.sum
          val s2 = gaps.map(g => g * g).sum
          Some((n, u, ng, s1 / ng, gaps.max,
            (ng * s2 - s1 * s1) / (ng * ng)))
        }
    }.toSet
    val got = MetricsEtl.qScrapeJitter(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
  }

  test("q_staleness == a JVM last-sample replay") {
    val now = events.map(_._3 / 1000000L).max
    val expect = events.groupBy(e => (e._1, e._2)).map {
      case ((n, u), xs) =>
        val last = xs.map(_._3 / 1000000L).max
        (n, u, last, xs.size.toLong, now - last,
          if (now - last > 86400L) 1L else 0L)
    }.toSet
    val got = MetricsEtl.qStaleness(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
  }

  test("q_forecast_revenue == a JVM filter-and-sum replay") {
    val li = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val picked = li.filter { r =>
      val pct = math.round(r.getDouble(3) * 100)
      r.getLong(0) >= lo && r.getLong(0) < hi &&
        pct >= 5 && pct <= 7 && r.getDouble(1) < 24
    }
    val rev = picked.map(r => math.round(r.getDouble(2) * 100) *
      math.round(r.getDouble(3) * 100)).sum
    val row = Olap.qForecastRevenue(spark, dir).head()
    assert(row.getLong(0) == rev && row.getLong(1) == picked.length.toLong)
  }

  test("q_pareto: n_top80 is the MINIMAL prefix reaching 80% (JVM " +
      "cumulative replay)") {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rev.groupBy(_._1).map { case (nation, xs) =>
      val per = xs.groupBy(_._2).map { case (c, ys) => (c, ys.map(_._3).sum) }
        .toSeq.sortBy { case (c, v) => (-v, c) }
      val total = per.map(_._2).sum
      // minimal k with cum(k) * 5 >= total * 4
      var cum = 0L
      var k = 0L
      var found = 0L
      per.foreach { case (_, v) =>
        cum += v; k += 1
        if (found == 0L && cum * 5 >= total * 4) found = k
      }
      (nation, per.size.toLong, found, total)
    }.toSet
    val got = Olap.qPareto(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q_dup_ngram_frac == a JVM document-frequency replay") {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).toSeq.sliding(5)
          .filter(_.size == 5).map(_.mkString(" ")).toSet))
      .filter(_._2.nonEmpty)
    val df = grams.flatMap { case (id, gs) => gs.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val expect = grams.map { case (id, gs) =>
      val shared = gs.count(g => df(g) > 1).toLong
      (id, gs.size.toLong, shared, shared * 1000000L / gs.size)
    }.toSet
    val got = Dedup.qDupNgramFrac(spark, dir).collect().map(r =>
      // n_grams is the Int-typed size() column
      (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q_affix_dup == a JVM affix-grouping replay") {
    val ws = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter(_._2.size >= 8)
    def groups(kind: String, key: Seq[String] => Seq[String]) =
      ws.groupBy(d => key(d._2).mkString(" ")).values
        .filter(_.size >= 2).map { members =>
          val ids = members.map(_._1).sorted
          (kind, ids.min, ids.size.toLong, ids.mkString(","))
        }
    val expect = (groups("prefix", _.take(8)) ++
      groups("suffix", _.takeRight(8))).toSet
    val got = Dedup.qAffixDup(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "fixture must contain affix duplicates")
  }

  test("simhash adaptive cap: fixture SFs select the legacy 10k head; " +
      "a forced budget steps the ladder down and the capped pair set " +
      "is a value-identical subset") {
    assert(Dedup.simhashCap(spark, dir) == 10000L,
      "fixture saturation must not move the cap (zero oracle churn)")
    assert(Dedup.simhashCap(spark, dir, budget = 0L) == 3L,
      "an unfittable budget floors at the ladder tail (r11: the tail " +
        "extends to 3 — the sf100 probe found even cap=100 spilling " +
        "past disk at total band saturation)")
    val full = Dedup.qSimhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val capped = Dedup.simhashPairsCapped(spark, dir, budget = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    // at sf0.001 no band bucket reaches even the floor cap (50 docs),
    // so the floored run must REPRODUCE the full set — the law under
    // saturation is pinned by the sf10 ladder measurement in SURVEY
    assert(capped.nonEmpty && capped.size <= full.size)
    capped.foreach { case (k, (nb, ham, dup)) =>
      val (fnb, fham, fdup) = full(k)
      // hamming + verdict are signature facts — identical; the
      // shared-band count can only shrink (a band dropped by the cap)
      assert(ham == fham && dup == fdup && nb <= fnb,
        s"capped pair $k diverged: ($nb,$ham,$dup) vs ($fnb,$fham,$fdup)")
    }
  }

  test("every registered query whose source consumes the exact-Jaccard " +
      "ngramPairs frame is pre-flight-routed (ExactJoinFamily " +
      "completeness — the r10 probe's only error was an omission here)") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Dedup.scala")),
      "UTF-8")
    // split the object into `def qXxx` blocks; a block that calls
    // ngramPairs( anchors on the exact pair frame
    val defs = "def (q[A-Z][A-Za-z0-9]*)".r
    val starts = defs.findAllMatchIn(src).map(m => (m.group(1), m.start)).toSeq
    val consumers = starts.zipAll(starts.drop(1).map(_._2), ("", 0), src.length)
      .collect { case ((name, s), e) if name.nonEmpty &&
        src.substring(s, e).contains("ngramPairs(spark") => name }
    val asQuery = consumers.map(n =>
      "q" + n.drop(1).replaceAll("([A-Z])", "_$1").toLowerCase)
      .filter(SparkEntry.queries.contains)
    assert(asQuery.nonEmpty, "the grep must find the known consumers")
    val missing = asQuery.filterNot(Dedup.ExactJoinFamily)
    assert(missing.isEmpty,
      s"exact-pair consumers missing from ExactJoinFamily: $missing")
  }

  test("q_ivf_imbalance == the aggregate of the oracle-verified " +
      "q_ivf_cells rows") {
    val cells = Similarity.qIvfCells(spark, dir).collect()
      .map(_.getLong(1))
    val row = Similarity.qIvfImbalance(spark, dir).head()
    assert(row.getLong(0) == cells.length.toLong)
    assert(row.getLong(1) == cells.sum)
    assert(row.getLong(2) == cells.max && row.getLong(3) == cells.min)
    assert(row.getLong(4) == cells.max * cells.length * 100 / cells.sum)
  }

  test("q_stale_markers == a JVM gap replay (one marker per " +
      "over-horizon gap + every series' final sample)") {
    val expect = events.groupBy(e => (e._1, e._2)).flatMap {
      case ((n, u), xs) =>
        val ts = xs.map(_._3).sorted
        val gaps = ts.sliding(2).collect {
          case Seq(a, b) if b - a > 3600L * 1000000L => a
        }.toSeq
        (gaps :+ ts.last).map(t =>
          (n, u, t / 1000000L, t / 1000000L + 3600L))
    }.toSet
    val got = MetricsEtl.qStaleMarkers(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q_backlog: the July-1997 slice of a JVM cumulative replay") {
    val days = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(_.getLong(0) / 86400000000L * 86400L)
    val daily = days.groupBy(identity).map { case (d, xs) =>
      (d, xs.length.toLong) }.toSeq.sortBy(_._1)
    val cum = daily.scanLeft(0L)(_ + _._2).tail
    val expect = daily.zip(cum).collect {
      case ((d, n), c) if d >= 867715200L && d < 870307200L => (d, n, c)
    }.toSet
    val got = Olap.qBacklog(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "the grid month must contain open orders")
  }

  test("q_ship_lag == a JVM replay (negative lags truncate " +
      "SYMMETRICALLY on both engines — the CASE sign guard)") {
    // JVM / truncates toward zero — exactly the guarded semantics
    def floorDiv(a: Long, b: Long) = a / b
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val lags = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .collect().map { r =>
        val (pri, ord) = orders(r.getLong(0))
        (pri, floorDiv(r.getLong(1) - ord, 86400000000L))
      }
    assert(lags.exists(_._2 < 0),
      "fixture must exercise the negative-lag floor branch")
    val expect = lags.groupBy { case (p, d) => (p, floorDiv(d, 7L)) }
      .map { case ((p, wk), xs) =>
        val n = xs.size.toLong
        val s = xs.map(_._2).sum
        val avg = if (s >= 0) s * 100 / n else -((-s) * 100 / n)
        (p, wk, n, avg, xs.map(_._2).max)
      }.toSet
    val got = Olap.qShipLag(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("q_length_outliers: every flagged doc is beyond 3 MAD of its " +
      "source median, and no unflagged doc is (JVM replay)") {
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("len"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2).toLong)).toSeq
    def medianOf(xs: Seq[Long]): Double = {
      val s = xs.sorted.map(_.toDouble)
      val idx = (s.size - 1) * 0.5
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val flagged = lens.groupBy(_._2).flatMap { case (src, xs) =>
      val med = medianOf(xs.map(_._3))
      val mad = medianOf(xs.map(x => math.abs(x._3 - med))
        .map(d => math.round(d * 2)) // exact halves: keep as 2x longs
        .map(_.toLong)).toDouble / 2.0
      xs.filter(x => math.abs(x._3 - med) > 3 * mad).map(x => (x._1, src))
    }.toSet
    val got = TextAnalysis.qLengthOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == flagged)
    assert(got.nonEmpty, "fixture must contain length outliers")
  }
}
