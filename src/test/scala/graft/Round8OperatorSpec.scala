package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{NativeHistogram, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the round-8 operator batch, same
  * convention as Round6/7*: from-scratch re-derivations on the raw
  * parquet (collected at sf0.001). The two fusion-style checks
  * (q_rank_fusion) take the ORACLE-VERIFIED ANN result frames as input
  * and re-derive only the fusion, which is the part they add; the
  * native-histogram ALGORITHM is separately conformance-twinned in
  * promql_ref.py — the twins here cover the real-fixture path (window
  * assignment, sign split, span counting).
  */
class Round8OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventCents: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private def idx0(pos: Long): Long =
    if (pos <= 1) 0L else 64L - java.lang.Long.numberOfLeadingZeros(pos - 1)

  test("q_native_hist == JVM bucket-index twin on the real fixture") {
    val expected = eventCents.flatMap { case (name, user, tsUs, cents) =>
      val w = tsUs / 1000000L / 3600L * 3600L
      val sgn = java.lang.Long.signum(cents).toLong
      val pos = math.abs(cents)
      val i0 = idx0(pos)
      Seq((-1L, if (sgn == 0) 0L else (i0 + 1) / 2),
        (0L, if (sgn == 0) 0L else i0),
        (1L, if (sgn == 0) 0L
             else if (pos <= 1) 0L
             else 64L - java.lang.Long.numberOfLeadingZeros(pos * pos - 1)))
        .map { case (sch, idx) => (name, user, w, sch, sgn, idx) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = NativeHistogram.qNativeHist(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) -> r.getLong(6)
    }.toMap
    assert(got == expected)
  }

  test("q_native_stats == JVM layout twin (sums, tallies, span runs)") {
    val expected = eventCents.groupBy(e => (e._1, e._2, e._3 / 1000000L / 3600L * 3600L))
      .map { case ((name, user, w), rs) =>
        val cents = rs.map(_._4)
        val posIdx = cents.filter(_ > 0).map(c => idx0(c)).distinct.sorted
        val spans = if (posIdx.isEmpty) 0L
          else 1L + posIdx.sliding(2).count {
            case Seq(a, b) => b > a + 1; case _ => false }
        (name, user, w) -> ((cents.size.toLong, cents.sum,
          cents.count(_ == 0L).toLong, cents.count(_ < 0L).toLong,
          posIdx.size.toLong,
          if (posIdx.isEmpty) -1L else posIdx.min,
          if (posIdx.isEmpty) -1L else posIdx.max, spans))
      }
    val got = NativeHistogram.qNativeStats(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
    }.toMap
    assert(got == expected)
  }

  test("q_native_delta == JVM sparse-subtraction twin (one-sided buckets, gap windows)") {
    val buckets = eventCents.groupBy { case (name, user, tsUs, cents) =>
      val sgn = java.lang.Long.signum(cents).toLong
      (name, user, tsUs / 1000000L / 3600L * 3600L, sgn,
        if (sgn == 0) 0L else idx0(math.abs(cents)))
    }.map { case (k, v) => k -> v.size.toLong }
    val windows = buckets.keys.map(k => ((k._1, k._2), k._3)).toSeq
      .groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).toSet }
    val expected = (for {
      ((name, user, w, sgn, idx), _) <-
        buckets.map(identity) ++ buckets.map { case (k, c) =>
          ((k._1, k._2, k._3 + 3600L, k._4, k._5), c) } // next-window keys
      if windows((name, user)).contains(w) &&
        windows((name, user)).contains(w - 3600L)
      nextC = buckets.getOrElse((name, user, w, sgn, idx), 0L)
      prevC = buckets.getOrElse((name, user, w - 3600L, sgn, idx), 0L)
      if nextC - prevC != 0
    } yield (name, user, w, sgn, idx, nextC - prevC)).toSet
    val got = operators.NativeHistogram.qNativeDelta(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("q_rank_fusion == JVM RRF twin over the two ANN lists") {
    def list(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("vec_id", "neighbor_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    val scored = (list(Similarity.qAnnLsh(spark, dir)) ++
      list(Similarity.qAnnIvf(spark, dir)))
      .map { case (v, n, rn) => ((v, n), 238266L / (60L + rn)) }
    val fused = scored.groupBy(_._1).map { case ((v, n), ss) =>
      (v, n, ss.map(_._2).sum, ss.size.toLong) }.toSeq
    val expected = fused.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
        .map { case ((v, n, s, nl), i) => (v, n, s, nl, i + 1L) }
    }.toSet
    val got = Similarity.qRankFusion(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4).toLong)).toSet
    assert(got == expected)
  }

  test("q_hard_negatives == JVM brute-force cross-label twin") {
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding").collect().map { r =>
        val q = r.getAs[scala.collection.Seq[Float]](2)
          .map(x => math.round(x.toDouble * 1000)).toArray
        (r.getLong(0), r.getInt(1).toLong, q,
          q.map(x => x * x).sum)
      }
    val queries = vecs.filter(_._1 < 50)
    val expected = queries.flatMap { case (v, ql, qa, na) =>
      vecs.filter(_._2 != ql).map { case (n, nl, qb, nb) =>
        val dot = qa.indices.map(i => qa(i) * qb(i)).sum
        val cos = dot.toDouble / math.sqrt((na * nb).toDouble)
        (v, ql, n, nl, cos)
      }.sortBy(t => (-t._5, t._3)).take(3).zipWithIndex.map {
        case ((vv, ql2, n, nl, cos), i) =>
          (vv, ql2, n, nl,
            BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, i + 1L)
      }
    }.toSet
    val got = Similarity.qHardNegatives(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5).toLong)).toSet
    assert(got == expected)
  }

  test("q_pair_join_cost == JVM shingle-frequency twin") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = scala.collection.mutable.Map[Long, Long]()
    var totalRows = 0L
    docs.foreach { case (_, text) =>
      val ws = text.split(" ", -1)
      if (ws.length >= 3) {
        val shs = (0 until ws.length - 2)
          .map(i => hash60Jvm(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")).distinct
        totalRows += shs.size
        shs.foreach(h => df(h) = df.getOrElse(h, 0L) + 1L)
      }
    }
    val joinRows = df.values.filter(_ <= 1000).map(d => d * (d - 1) / 2).sum
    val stop = df.values.count(_ > 1000).toLong
    val droppedRows = df.values.filter(_ > 1000).sum
    val expected = (totalRows, df.size.toLong, stop, joinRows,
      df.size.toLong * 1000000L / totalRows,
      droppedRows * 1000000L / totalRows)
    val r = operators.Dedup.qPairJoinCost(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == expected)
  }

  /** JVM band-candidate pairs via the spec-proven DedupStream kernel
    * (same constants/formulas as the batch banding). */
  private def jvmBandPairs: Set[(Long, Long)] = {
    val byBucket = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().flatMap(r =>
        graft.streaming.DedupStream.bandHashesJvm(r.getLong(0), r.getString(1)))
      .groupBy(t => (t._2, t._3))
    byBucket.values.flatMap { members =>
      val ids = members.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    }.toSet
  }

  test("q_dedup_clusters_lsh == JVM union-find over JVM band pairs") {
    val pairs = jvmBandPairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2))
    val byCluster = nodes.groupBy(find)
    val expected = byCluster.flatMap { case (label, members) =>
      members.map(m => (m, label, members.size.toLong)) }.toSet
    val got = operators.Dedup.qDedupClustersLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q_lsh_verify == JVM exact intersection/containment twin on JVM candidates") {
    val shingles = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        r.getLong(0) -> (0 until math.max(0, ws.length - 2))
          .map(i => hash60Jvm(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")).toSet
      }.toMap
    // stop-shingle drop (df > 1000): a no-op at this SF, mirrored anyway
    val df = shingles.values.flatten.groupBy(identity)
      .map { case (h, v) => h -> v.size }
    val keep = (h: Long) => df(h) <= 1000
    val expected = jvmBandPairs.map { case (a, b) =>
      val sa = shingles(a).filter(keep)
      val sb = shingles(b).filter(keep)
      val na = shingles(a).size.toLong
      val nb = shingles(b).size.toLong
      val inter = sa.count(sb.contains).toLong
      val union = na + nb - inter
      val j = BigDecimal(inter.toDouble / union)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, inter, na, nb, union, j, inter * 1000000L / na,
        inter * 1000000L / nb, if (j >= 0.2) 1L else 0L)
    }
    val got = operators.Dedup.qLshVerify(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getLong(7), r.getLong(8),
        r.getLong(9))).toSet
    assert(got == expected)
  }

  test("q_tokenizer_fertility == JVM piece-count twin") {
    val docs = Tables.documents(spark, dir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, rs) =>
      val words = rs.map(_._2.split(" ", -1).length.toLong).sum
      val pieces = rs.map(_._2.split(" ", -1)
        .map(w => (w.length + 3L) / 4L).sum).sum
      lang -> ((rs.size.toLong, words, pieces, pieces * 1000000L / words))
    }
    val got = TextAnalysis.qTokenizerFertility(spark, dir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("q_vocab_coverage == JVM top-K twin") {
    val toks = Tables.documents(spark, dir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).map(hash60Jvm)
    val tf = toks.groupBy(identity).map { case (h, v) => (h, v.size.toLong) }
    val ranked = tf.toSeq.sortBy(t => (-t._2, t._1))
    val total = ranked.map(_._2).sum
    val expected = Seq(100, 1000).map { k =>
      val covered = ranked.take(k).map(_._2).sum
      (k.toLong, covered, total, ranked.size.toLong,
        covered * 1000000L / total)
    }.toSet
    val got = TextAnalysis.qVocabCoverage(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }
}
