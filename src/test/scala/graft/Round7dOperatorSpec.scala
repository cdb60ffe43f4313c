package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{Dedup, MetricsEtl, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the closing round-7 operator batch
  * (gorilla bits / filter sweep / token-length hist / hapax share /
  * source overlap / split leakage / kmeans shift). Same convention as
  * Round7b/7c: from-scratch re-derivations on the raw parquet — the
  * two graph-derived checks (source overlap, split leakage) take the
  * ORACLE-VERIFIED batch pair list as input and re-derive only their
  * own aggregation, which is the part they add.
  */
class Round7dOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, String)] =
    Tables.documents(spark, dir).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def pairList: Seq[(Long, Long)] =
    Dedup.qDedupNgram(spark, dir).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_gorilla_bits == JVM codec-cost twin") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = ev.groupBy(e => (e._1, e._2)).collect {
      case ((name, user), rs) if rs.length >= 3 =>
        val sorted = rs.sortBy(e => (e._4 / 1000000L, e._3))
        val tss = sorted.map(_._4 / 1000000L)
        val vs = sorted.map(_._5)
        val dts = tss.indices.tail.map(i => tss(i) - tss(i - 1))
        val dods = dts.indices.tail.map(i => dts(i) - dts(i - 1))
        val dvs = vs.indices.tail.map(i => math.abs(vs(i) - vs(i - 1)))
        def tsBits(dod: Long): Long =
          if (dod == 0) 1 else if (dod >= -63 && dod <= 64) 9
          else if (dod >= -255 && dod <= 256) 12
          else if (dod >= -2047 && dod <= 2048) 16 else 36
        def valBits(dv: Long): Long =
          if (dv == 0) 1 else 13 + (64 - java.lang.Long.numberOfLeadingZeros(dv))
        val tb = dods.map(tsBits).sum
        val vb = dvs.map(valBits).sum
        (name, user) -> ((sorted.length.toLong,
          dods.count(_ == 0L).toLong, dvs.count(_ == 0L).toLong,
          tb, vb, ((tb + vb) * 100) / (sorted.length - 2)))
    }.toMap
    val got = MetricsEtl.qGorillaBits(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got == expected)
  }

  test("q_filter_sweep == JVM threshold loss table") {
    val lens = docs.map(_._2.split(" ", -1).length.toLong)
    val totDocs = lens.size.toLong
    val totToks = lens.sum
    val expected = Seq(10L, 20L, 40L, 60L, 80L).map { t =>
      val kept = lens.filter(_ >= t)
      t -> ((kept.size.toLong, kept.sum,
        kept.size * 1000000L / totDocs, kept.sum * 1000000L / totToks))
    }.toMap
    val got = TextAnalysis.qFilterSweep(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("q_token_len_hist == JVM histogram") {
    val expected = docs.flatMap(_._2.split(" ", -1))
      .groupBy(_.length.toLong).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.qTokenLenHist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q_hapax_share == JVM rare-token twin") {
    val tf = docs.flatMap(_._2.split(" ", -1)).map(hash60Jvm)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = docs.map { case (id, text, _) =>
      val ths = text.split(" ", -1).map(hash60Jvm)
      val n = ths.length.toLong
      val hap = ths.count(tf(_) == 1L).toLong
      val rare = ths.count(tf(_) <= 2L).toLong
      id -> ((n, hap, rare, hap * 1000000L / n, rare * 1000000L / n))
    }.toMap
    val got = TextAnalysis.qHapaxShare(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("q_source_overlap == JVM aggregation over the verified pair list") {
    val src = docs.map(d => d._1 -> d._3).toMap
    val tagged = pairList.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa, a, b)
    }
    val expected = tagged.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> ((ts.size.toLong,
        ts.flatMap(t => Seq(t._3, t._4)).distinct.size.toLong))
    }
    val got = Dedup.qSourceOverlap(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got == expected)
  }

  test("q_split_leakage == JVM split + crossing audit") {
    val split = docs.map { case (id, text, _) =>
      val h = math.floorMod(hash60Jvm("split:" + text), 100L)
      id -> (if (h < 80) "train" else if (h < 90) "val" else "test")
    }.toMap
    val sizes = split.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = pairList
      .map { case (a, b) =>
        val (sa, sb) = (split(a), split(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).map { case ((sa, sb), ps) =>
        (sa, sb) -> ((ps.size.toLong, sizes(sa), sizes(sb),
          if (sa != sb) 1L else 0L))
      }
    val got = Dedup.qSplitLeakage(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("q_overlap_rows == JVM re-delivery accounting") {
    val ts = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us")).collect().map(_.getLong(0))
    val memb = ts.flatMap { us =>
      val s = us / 1000000L
      val w0 = math.floorDiv(s, 300L) * 300L
      if (s >= w0 + 240L) Seq((w0, 0L), (w0 + 300L, 1L)) else Seq((w0, 0L))
    }
    val expected = memb.groupBy(_._1).map { case (w, ms) =>
      val re = ms.count(_._2 == 1L).toLong
      val nw = ms.length - re
      w -> ((nw, re, nw + re, re * 1000000L / (nw + re)))
    }
    val got = MetricsEtl.qOverlapRows(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("q_pq_recall == JVM ADC + exact-L2 twin (the zero is TRUE)") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map { r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)
          .map(f => math.round(f.toDouble * 1000)).toSeq
      }.toSeq.sortBy(_._1)
    val byId = vecs.toMap
    // exact-L2 truth top-3 per query
    val truth = vecs.filter(_._1 < 50).map { case (qid, qv) =>
      val order = vecs.filter(_._1 != qid).map { case (nid, nv) =>
        (nid, qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (nid, d2) => (d2, nid) }.take(3).map(_._1)
      qid -> order.toSet
    }.toMap
    val possible = truth.values.map(_.size).sum.toLong
    // the operator's ADC picks
    val picks = Similarity.qIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hits = picks.count { case (q, n) =>
      truth.get(q).exists(_.contains(n))
    }.toLong
    val got = Similarity.qPqRecall(spark, dir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((hits, possible, hits * 1000000L / possible)))
  }

  test("q_band_recall == JVM recall/precision over the two pair lists") {
    val exact = pairList.toSet
    val band = Dedup.qMinhashLsh(spark, dir).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (exact intersect band).size.toLong
    val got = Dedup.qBandRecall(spark, dir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((exact.size.toLong, band.size.toLong, hits)))
    if (exact.nonEmpty)
      assert(got.getLong(3) == hits * 1000000L / exact.size)
  }

  test("q_burstiness == JVM Fano twin") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(e => (e._1, e._2)).flatMap {
      case ((name, u), rs) =>
        val mins = rs.map(_._3 / 60000000L)
        val span = mins.max - mins.min + 1
        if (span < 2) None
        else {
          val byMin = mins.groupBy(identity).view.mapValues(_.size.toLong)
          val n = rs.length.toLong
          val s2 = byMin.values.map(c => c * c).sum
          val m = n / span
          val varSum = s2 - 2 * m * n + span * m * m
          Some((name, u) -> ((span, byMin.size.toLong, n,
            varSum * 100 / math.max(n, 1L))))
        }
    }.toMap
    val got = MetricsEtl.qBurstiness(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("q_kmeans_shift == JVM assignment + floor-mean shift") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map { r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)
          .map(f => math.round(f.toDouble * 1000)).toSeq
      }.toSeq.sortBy(_._1)
    val cents = vecs.filter(_._1 < 16)
    val asg = vecs.map { case (id, q) =>
      val best = cents.map { case (cell, qc) =>
        val dot = q.zip(qc).map { case (a, b) => a * b }.sum
        val na = q.map(x => x * x).sum
        val nc = qc.map(x => x * x).sum
        (cell, dot.toDouble / math.sqrt((na * nc).toDouble))
      }.minBy { case (cell, c) => (-c, cell) }
      (best._1, q)
    }
    val d = vecs.head._2.size
    val expected = asg.groupBy(_._1).map { case (cell, members) =>
      val n = members.size.toLong
      val seed = cents.find(_._1 == cell).get._2
      val diffs = (0 until d).map { i =>
        val s = members.map(_._2(i)).sum
        val c100 = (s + 1000L * n) * 100L / n - 100000L
        c100 - seed(i) * 100L
      }
      cell -> ((n, diffs.map(x => x * x).sum, diffs.map(math.abs).max))
    }
    val got = Similarity.qKmeansShift(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got == expected)
  }
}
