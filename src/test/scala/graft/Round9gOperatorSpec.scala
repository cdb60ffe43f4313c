package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{Dedup, MetricsEtl, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the r9g batch (KN-smoothed bigram
  * LM, KS length-drift, KMV mergeable cardinality sketches, Theil–Sen
  * robust trend), same convention as Round6-9: from-scratch
  * re-derivations on the raw parquet, collected at sf0.001 — different
  * loop structure, same integers.
  */
class Round9gOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docWords: Seq[(Long, String, Seq[String], Long)] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSeq, r.getLong(3))).toSeq

  test("q_kn_bigram == a JVM Kneser-Ney replay") {
    val perDoc = docWords.collect {
      case (id, _, ws, _) if ws.size >= 2 =>
        (id, ws.sliding(2).map(p => (p(0), p(1))).toSeq)
    }
    val cbg = perDoc.flatMap(_._2).groupBy(identity).map {
      case (k, v) => k -> v.size.toLong
    }
    val c1 = cbg.groupBy(_._1._1).map { case (a, m) =>
      a -> (m.values.sum, m.size.toLong)
    }
    val cont = cbg.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val tTypes = cbg.size.toLong
    def pPpm(bg: (String, String)): Long = {
      val c = cbg(bg); val (cs, n1) = c1(bg._1); val nc = cont(bg._2)
      math.max(c * 100 - 75, 0L) * 1000000L / (cs * 100) +
        (75 * n1 * (nc * 1000000L / tTypes)) / (cs * 100)
    }
    val expected = perDoc.map { case (id, bgs) =>
      val logs = bgs.map(bg => 63L - java.lang.Long.numberOfLeadingZeros(
        math.max(pPpm(bg), 1L)))
      (id, bgs.size.toLong, logs.sum * 100 / bgs.size)
    }.toSet
    val got = TextAnalysis.qKnBigram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_ks_drift == a JVM two-sample ECDF replay") {
    val rows = docWords.map(d => (d._2, d._4))
    val values = rows.map(_._2).distinct.sorted
    val tot = rows.size.toLong
    val bySrcVal = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byVal = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val totS = rs.size.toLong
      var cumS = 0L; var cumR = 0L
      val ds = values.map { v =>
        cumS += bySrcVal.getOrElse((src, v), 0L)
        cumR += byVal(v) - bySrcVal.getOrElse((src, v), 0L)
        (v, math.abs(cumS * 1000000L / totS -
          cumR * 1000000L / math.max(tot - totS, 1L)))
      }
      val maxD = ds.map(_._2).max
      (src, totS, maxD, ds.filter(_._2 == maxD).map(_._1).min)
    }.toSet
    val got = TextAnalysis.qKsDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_kmv_union == a JVM bottom-k sketch replay") {
    val watch = Seq("src0", "src1", "src2", "src3", "src4")
    val bySrc: Map[String, Set[Long]] = docWords
      .filter(d => watch.contains(d._2)).collect {
        case (_, src, ws, _) if ws.size >= 5 =>
          src -> ws.sliding(5).map(g => hash60Jvm(g.mkString(" "))).toSet
      }.groupBy(_._1).map { case (s, gs) =>
        s -> gs.map(_._2).reduce(_ ++ _)
      }
    def est(hs: Set[Long]): Long = {
      val h64 = hs.toSeq.sorted.apply(63)
      63L * 1099511627776L / math.max(h64 / 1048576L, 1L)
    }
    val expected = (for {
      a <- watch; b <- watch if a < b
      ha = bySrc(a); hb = bySrc(b)
      if ha.size >= 64 && hb.size >= 64 && (ha ++ hb).size >= 64
    } yield {
      val ea = est(ha); val eb = est(hb); val eu = est(ha ++ hb)
      (a, b, ea, eb, eu, math.max(ea + eb - eu, 0L))
    }).toSet
    val got = Dedup.qKmvUnion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the sketch must be in the KMV error envelope on the fixture:
    // |est - true| within ~4/sqrt(64) of true for every watched source
    bySrc.foreach { case (_, hs) =>
      val e = est(hs); val t = hs.size.toLong
      assert(math.abs(e - t) <= t / 2, s"KMV est $e vs true $t out of band")
    }
  }

  test("q_compaction_plan == a JVM sequential-binpack replay") {
    val target = 2000L
    val expected = docWords.map(d => ((d._2, d._1 % 16), d._4))
      .groupBy(_._1).map { case (k, vs) => (k._1, k._2, vs.map(_._2).sum) }
      .groupBy(_._1).flatMap { case (_, files) =>
        var cum = 0L
        files.toSeq.sortBy(_._2).map { case (src, shard, bytes) =>
          val before = cum; cum += bytes
          (src, shard, bytes, before, before / target)
        }
      }.toSet
    val got = TextAnalysis.qCompactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the fixture must produce a multi-file group AND a group boundary
    assert(expected.exists(_._5 > 0), "no group boundary exercised")
  }

  test("q_skew_stats == a JVM frequency-histogram replay") {
    def hist(label: String, keys: Seq[Long]) =
      keys.groupBy(identity).values.map(_.size.toLong).toSeq
        .groupBy(c => 63L - java.lang.Long.numberOfLeadingZeros(c))
        .map { case (b, cs) => (label, b, cs.size.toLong, cs.sum) }
    val lk = Tables.lineitem(spark, dir).select("l_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val ek = Tables.events(spark, dir).select("user_id")
      .collect().map(_.getLong(0)).toSeq
    val expected =
      (hist("lineitem.l_orderkey", lk) ++ hist("events.user_id", ek)).toSet
    val got = graft.operators.Olap.qSkewStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_theil_sen == a JVM median-of-pairwise-slopes replay") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val expected = rows.groupBy(e => (e._1, e._2, e._4 / 3600000000L * 3600))
      .flatMap { case ((name, uid, wStart), es) =>
        val pts = es.groupBy(_._4 / 60000000L % 60).map { case (m, ms) =>
          (m, ms.maxBy(e => (e._4, e._3))._5)
        }.toSeq.sortBy(_._1)
        val slopes = (for {
          i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
        } yield (pts(j)._2 - pts(i)._2) * 1000000L /
          (pts(j)._1 - pts(i)._1)).sorted
        if (slopes.isEmpty) None
        else Some((name, uid, wStart, slopes.size.toLong,
          slopes((slopes.size + 1) / 2 - 1)))
      }.toSet
    val got = MetricsEtl.qTheilSen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
