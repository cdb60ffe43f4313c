package graft

import graft.operators.{MetricsEtl, Olap, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the r9e panel-operator batch
  * (anomaly/seasonal/movers series QA, WAU/funnel-time event panels,
  * boilerplate/gate-Venn document QA), same convention as Round6-9:
  * from-scratch re-derivations on the raw parquet, collected at
  * sf0.001 — different loop structure, same integers.
  */
class Round9eOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventRows: Seq[(String, Long, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("q_anomaly_zscore == a per-series sliding-window replay") {
    val expected = eventRows.groupBy(e => (e._1, e._2)).flatMap {
      case (_, es) =>
        val s = es.sortBy(e => (e._4, e._3))
        s.indices.flatMap { i =>
          val win = s.slice(math.max(0, i - 6), i).map(_._5)
          val n = win.size.toLong
          if (n < 5) None
          else {
            val s1 = win.sum
            val s2 = win.map(c => c * c).sum
            val den = n * s2 - s1 * s1
            val c = s(i)._5
            val num = (c * n - s1) * (c * n - s1)
            if (den > 0 && num > den * 4)
              Some((s(i)._1, s(i)._2, s(i)._4, c, num * 100 / den))
            else None
          }
        }
    }.toSet
    val got = MetricsEtl.qAnomalyZscore(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the fixture must actually exercise the flag path
    assert(got.nonEmpty, "no anomalies flagged at sf0.001")
  }

  test("q_seasonal_baseline == a grouped-map replay with the value-bounded ratio") {
    val rows = eventRows.map { case (name, _, _, tsUs, cents) =>
      (name, tsUs / 86400000000L, (tsUs / 3600000000L) % 24, cents)
    }
    val lastDay = rows.map(_._2).max
    val expected = rows.groupBy(r => (r._1, r._3)).flatMap {
      case ((name, hod), rs) =>
        val base = rs.filter(_._2 < lastDay)
        val last = rs.filter(_._2 == lastDay)
        if (base.isEmpty || last.isEmpty) None
        else {
          val bAvg = base.map(_._4).sum * 1000000L / base.size
          val lAvg = last.map(_._4).sum * 1000000L / last.size
          Some((name, hod, base.size.toLong, last.size.toLong, bAvg, lAvg,
            lAvg * 1000000L / math.max(bAvg, 1L)))
        }
    }.toSet
    val got = MetricsEtl.qSeasonalBaseline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_topk_movers == a sorted-replay top-5 with the deterministic tiebreak") {
    val eval = 1705320000L * 1000000L
    val day = 86400L * 1000000L
    val cut = eval - day
    val inWin = eventRows.filter(e => e._4 >= eval - 2 * day && e._4 < eval)
    val agg = inWin.groupBy(e => (e._1, e._2)).map { case ((n, u), es) =>
      val curr = es.filter(_._4 >= cut).map(_._5).sum
      val prev = es.filter(_._4 < cut).map(_._5).sum
      (n, u, curr, prev, curr - prev)
    }.toSeq
    val expected = agg.sortBy(t => (-math.abs(t._5), t._1, t._2)).take(5).toSet
    val got = MetricsEtl.qTopkMovers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.size == 5, s"expected a full top-5, got ${got.size}")
  }

  test("q_wau_rolling == a day-set replay (window clipped at the data's edge)") {
    val ud = eventRows.map(e => (e._2, e._4 / 86400000000L)).distinct
    val maxDay = ud.map(_._2).max
    val wau = ud.flatMap { case (u, d) => (d to d + 6).map(t => (t, u)) }
      .filter(_._1 <= maxDay).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dau = ud.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = wau.map { case (d, w) =>
      val a = dau.getOrElse(d, 0L)
      (d * 86400L, w, a, a * 1000000L / w)
    }.toSet
    val got = Olap.qWauRolling(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // a rolling window must exceed its daily slice somewhere
    assert(expected.exists { case (_, w, a, _) => w > a })
  }

  test("q_funnel_time == a per-user anchor replay") {
    val byUser = eventRows.filter(e => e._1 == "view" || e._1 == "purchase")
      .groupBy(_._2)
    val expected = byUser.flatMap { case (_, es) =>
      val tView = es.filter(_._1 == "view").map(_._4).minOption
      tView.flatMap { v =>
        es.filter(e => e._1 == "purchase" && e._4 > v).map(_._4).minOption
          .map(p => (p - v) / 3600000000L)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Olap.qFunnelTime(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.sum > 0)
  }

  test("q_boilerplate == a per-source chunk-df replay") {
    import graft.functions.Portable.hash60Jvm
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val k = 32
    val chunks = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).grouped(k).map(g => (id, src, hash60Jvm(g.mkString(" "))))
    }
    val dfDocs = chunks.groupBy(c => (c._2, c._3)).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val perDoc = chunks.groupBy(c => (c._2, c._1)).map { case ((src, id), cs) =>
      (src, id, cs.size.toLong,
        cs.count(c => dfDocs((c._2, c._3)) >= 2).toLong)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      val chunksN = ds.map(_._3).sum
      val boiler = ds.map(_._4).sum
      (src, ds.size.toLong, ds.count(_._4 > 0).toLong, chunksN, boiler,
        boiler * 1000000L / math.max(chunksN, 1L))
    }.toSet
    val got = TextAnalysis.qBoilerplate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the within-source df signal must fire somewhere at sf0.001
    assert(expected.exists(_._5 > 0), "no boilerplate chunks found")
  }

  test("q_gate_venn masks partition the corpus and sum to q_filter") {
    val filter = TextAnalysis.qFilter(spark, dir).collect()
    val expected = filter.groupBy { r =>
      (if (r.getAs[Boolean]("lang_ok")) 8L else 0L) +
        (if (r.getAs[Boolean]("len_ok")) 4L else 0L) +
        (if (r.getAs[Boolean]("quality_ok")) 2L else 0L) +
        (if (r.getAs[Boolean]("canonical")) 1L else 0L)
    }.map { case (mask, rs) =>
      (mask, rs.size.toLong, rs.map(_.getAs[Int]("n_words").toLong).sum)
    }.toSet
    val got = TextAnalysis.qGateVenn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    val gotFull = TextAnalysis.qGateVenn(spark, dir).collect()
    assert(gotFull.map(_.getAs[Long]("n_docs")).sum == filter.length.toLong)
    // share ppm re-derives from the counts
    val tot = filter.length.toLong
    gotFull.foreach { r =>
      assert(r.getAs[Long]("doc_share_ppm") ==
        r.getAs[Long]("n_docs") * 1000000L / tot)
    }
  }
}
