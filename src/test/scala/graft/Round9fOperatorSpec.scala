package graft

import graft.functions.Portable
import graft.operators.{Dedup, Olap, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the r9f batch (customer-lifecycle
  * panel: cohort LTV / RFM / order gaps; basket-pair mining; MATTR
  * lexical diversity; Bloom decontamination pre-filter), same
  * convention as Round6-9e: from-scratch re-derivations on the raw
  * parquet, collected at sf0.001 — different loop structure, same
  * integers.
  */
class Round9fOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (custkey, localdate, orderkey, cents) straight off the parquet. */
  private def orderRows: Seq[(Long, java.time.LocalDate, Long, Long)] =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), anyToLocalDate(r.get(1)),
        r.getLong(2), r.getLong(3))).toSeq

  /** o_orderdate arrives NTZ (LocalDateTime) or LTZ (Timestamp)
    * depending on whether Tables.events toggled NTZ inference earlier
    * in the shared session — same wall date under UTC either way. */
  private def anyToLocalDate(v: Any): java.time.LocalDate = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
    case d: java.time.LocalDateTime => d.toLocalDate
  }

  private def quarterIdx(d: java.time.LocalDate): Long =
    d.getYear.toLong * 4 + (d.getMonthValue - 1) / 3

  test("q_cohort_ltv == a grouped replay with offset-0 cohort sizes") {
    val rows = orderRows.map { case (c, d, _, cents) =>
      (c, quarterIdx(d), cents)
    }
    val cohortOf = rows.groupBy(_._1).map { case (c, rs) =>
      c -> rs.map(_._2).min
    }
    val cells = rows.groupBy(r => (cohortOf(r._1), r._2 - cohortOf(r._1)))
      .map { case ((cq, off), rs) =>
        (cq, off, rs.map(_._3).sum, rs.map(_._1).distinct.size.toLong)
      }.toSeq
    val expected = cells.groupBy(_._1).flatMap { case (cq, cs) =>
      val sorted = cs.sortBy(_._2)
      val size = cs.find(_._2 == 0L).get._4
      sorted.scanLeft(0L)((acc, c) => acc + c._3).tail.zip(sorted).map {
        case (cum, (_, off, rev, active)) =>
          (cq, off, rev, active, cum, size, cum / size)
      }
    }.toSet
    val got = Olap.qCohortLtv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_rfm == a threshold replay over per-customer aggregates") {
    val anchor = orderRows.map(_._2).max
    val perCust = orderRows.groupBy(_._1).map { case (_, rs) =>
      val rec = java.time.temporal.ChronoUnit.DAYS
        .between(rs.map(_._2).max, anchor)
      val freq = rs.size.toLong
      val mon = rs.map(_._4).sum
      val r = if (rec <= 90) 5L else if (rec <= 180) 4L
        else if (rec <= 365) 3L else if (rec <= 730) 2L else 1L
      val f = if (freq >= 16) 5L else if (freq >= 12) 4L
        else if (freq >= 8) 3L else if (freq >= 4) 2L else 1L
      val m = if (mon >= 350000000L) 5L else if (mon >= 250000000L) 4L
        else if (mon >= 150000000L) 3L else if (mon >= 50000000L) 2L
        else 1L
      (r, f, m, mon)
    }
    val expected = perCust.groupBy(t => (t._1, t._2, t._3)).map {
      case ((r, f, m), cs) =>
        val seg = cs.map(_._4).sum
        (r, f, m, cs.size.toLong, seg, seg / cs.size)
    }.toSet
    val got = Olap.qRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the fixture must spread across more than one segment
    assert(got.size > 1)
  }

  test("q_order_gap == a per-customer sorted-diff replay") {
    val expected = orderRows.groupBy(_._1).toSeq.flatMap { case (c, rs) =>
      val s = rs.sortBy(r => (r._2.toEpochDay, r._3))
      s.sliding(2).collect { case Seq(a, b) =>
        (c, java.time.temporal.ChronoUnit.DAYS
          .between(a._2, b._2) / 7)
      }
    }.groupBy(_._2).map { case (bucket, gs) =>
      (bucket, gs.size.toLong, gs.map(_._1).distinct.size.toLong)
    }.toSet
    val got = Olap.qOrderGap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_basket_pairs == an order-grouped pair replay with exact lift") {
    val n = Tables.orders(spark, dir).count()
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val freq = items.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val pairCnt = items.groupBy(_._1).toSeq.flatMap { case (_, is) =>
      val ps = is.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 2L)
    val expected = pairCnt.toSeq
      .sortBy { case ((p1, p2), c) => (-c, p1, p2) }.take(50)
      .map { case ((p1, p2), c) =>
        (p1, p2, c, freq(p1), freq(p2), c * n * 1000L / (freq(p1) * freq(p2)))
      }.toSet
    val got = Olap.qBasketPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  private def docTexts: Seq[(Long, String, String)] =
    Tables.documents(spark, dir).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  test("q_mattr == a sliding-window replay over the split words") {
    val expected = docTexts.flatMap { case (id, src, text) =>
      val ws = text.split(" ", -1)
      val nWin = ws.length / 20
      if (nWin < 1) None
      else {
        val sd = (0 until nWin)
          .map(i => ws.slice(i * 20, i * 20 + 20).distinct.length.toLong)
          .sum
        Some((id, src, nWin.toLong, sd * 1000000L / (nWin * 20L)))
      }
    }.toSet
    val got = TextAnalysis.qMattr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // windows genuinely vary: not every doc at the same diversity
    assert(got.map(_._4).size > 1)
  }

  test("q_pack_sweep == a per-shard offset-binning replay at all three contexts") {
    val k = 32 // chunkTokens
    val chunks = docTexts.flatMap { case (id, _, text) =>
      val ws = text.split(" ", -1)
      val n = ws.length
      (0 until (n + k - 1) / k).map { c =>
        (id, c.toLong, math.min((c + 1) * k, n) - c * k)
      }
    }
    val byShard = chunks.groupBy { case (id, _, _) => ((id % 32) + 32) % 32 }
    val expected = Seq(1024L, 4096L, 16384L).map { ctx =>
      val perShard = byShard.values.map { cs =>
        val sorted = cs.sortBy(c => (c._1, c._2))
        val cums = sorted.scanLeft(0L)((acc, c) => acc + c._3).tail
        val bins = cums.zip(sorted).map { case (cum, c) =>
          (cum - c._3) / ctx
        }.max + 1
        (bins, sorted.map(_._3.toLong).sum)
      }
      val nBins = perShard.map(_._1).sum
      val total = perShard.map(_._2).sum
      (ctx, nBins, total, (nBins * ctx - total) * 1000000L / (nBins * ctx))
    }.toSet
    val got = TextAnalysis.qPackSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(got.size == 3, "one row per swept context size")
  }

  test("q_weighted_sample == a sorted-priority replay (10 lowest per source)") {
    val metas = Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expected = metas.map { case (id, src, nc) =>
      (id, src, nc, Portable.hash60Jvm(s"ws:$id") / math.max(nc, 1L))
    }.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (d._4, d._1)).take(10).zipWithIndex.map {
        case ((id, src, nc, pri), i) => (id, src, nc, pri, i + 1)
      }
    }.toSet
    val got = TextAnalysis.qWeightedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_bloom_contam == a bit-set replay on the JVM hash twin") {
    val m = 262144L
    val grams = docTexts.map { case (id, _, text) =>
      val ws = text.split(" ", -1)
      id -> ws.sliding(5).filter(_.length == 5).map(_.mkString(" "))
        .map(Portable.hash60Jvm).toSet
    }
    val bench = grams.filter(_._1 < 25L).flatMap(_._2).toSet
    def pos(g: Long): Seq[Long] =
      (0 until 3).map(k => Portable.hash60Jvm(s"bf$k:$g") % m)
    val bits = bench.flatMap(pos)
    val expected = grams.filter(_._1 >= 25L).flatMap { case (id, gs) =>
      val hit = gs.filter(g => pos(g).forall(bits.contains))
      if (hit.isEmpty) None
      else {
        val exact = hit.count(bench.contains).toLong
        Some((id, hit.size.toLong, exact, exact == 0L))
      }
    }.toSet
    val got = Dedup.qBloomContam(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
