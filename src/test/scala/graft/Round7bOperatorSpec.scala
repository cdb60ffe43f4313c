package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{MetricsEtl, Similarity, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Independent cross-checks for the late-round-7 operators (the
  * Round6/Round7OperatorSpec pattern): each result is re-derived from
  * the raw parquet by a from-scratch JVM computation sharing NO
  * formulation with the Spark plan or the DuckDB oracle SQL — plus the
  * CDC shift-robustness PROPERTY that motivates content-defined
  * chunking in the first place.
  */
class Round7bOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, String)] =
    Tables.documents(spark, dir).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def lg2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("q_histogram_stddev == JVM midpoint-variance twin") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byWin = ev.groupBy { case (n, ts, _) =>
      (n, math.floorDiv(ts, 1000000L * 3600L) * 3600L)
    }
    val expected = byWin.map { case ((name, w), rows) =>
      val le = rows.map { case (_, _, v) =>
        if (v <= 1) 1L else if (v <= 2) 2L else if (v <= 5) 5L
        else if (v <= 10) 10L else -1L
      }
      val cnt = le.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val order = cnt.keys.toSeq.sortBy(l => if (l == -1L) Long.MaxValue else l)
      val mid2 = order.zipWithIndex.map { case (l, i) =>
        val lower = if (i == 0) 0L else order(i - 1)
        l -> (if (l == -1L) lower * 2 else lower + l)
      }.toMap
      val n = le.size.toLong
      val s1 = cnt.map { case (l, c) => mid2(l) * c }.sum
      val s2 = cnt.map { case (l, c) => mid2(l) * mid2(l) * c }.sum
      val num = n * s2 - s1 * s1
      val stdvar = (num * 100) / (4 * n * n)
      val stddev = math.round(math.sqrt(num.toDouble / (4 * n * n).toDouble) * 1000)
      (name, w) -> ((n, stdvar, stddev))
    }
    val got = MetricsEtl.qHistogramStddev(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) => assert(got(k) == v, s"window $k") }
  }

  test("q_token_drift == JVM total-variation twin") {
    val toks = docs.flatMap { case (_, text, src) =>
      text.split(" ", -1).toSeq.map(t => (src, t))
    }
    val srcCnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val corpus = toks.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val totC = toks.size.toLong
    val srcTot = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = srcTot.map { case (src, tot) =>
      val tv = corpus.map { case (tok, cc) =>
        val cs = srcCnt.getOrElse((src, tok), 0L)
        math.abs(cs * 1000000L / tot - cc * 1000000L / totC)
      }.sum / 2
      val types = corpus.keys.count(t => srcCnt.contains((src, t))).toLong
      src -> ((tot, types, tv))
    }
    val got = TextAnalysis.qTokenDrift(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got == expected)
  }

  test("q_colloc_pmi == JVM collocation twin") {
    val allBg = docs.flatMap { case (_, text, _) =>
      val w = text.split(" ", -1).toSeq
      if (w.size < 2) Seq.empty else w.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val pairCnt = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = docs.flatMap(_._2.split(" ", -1)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nPairs = allBg.size.toLong
    val expected = pairCnt.toSeq.filter(_._2 >= 3)
      .map { case ((wa, wb), c) =>
        (wa, wb, c, lg2(nPairs) + lg2(c) - lg2(uni(wa)) - lg2(uni(wb)))
      }
      .sortBy { case (wa, wb, c, _) => (-c, wa, wb) }
      .take(20)
    val got = TextAnalysis.qCollocPmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("q_cdc_chunks == JVM chunker twin") {
    val chunks = docs.flatMap { case (id, text, _) =>
      val ws = text.split(" ", -1).toSeq
      val hs = ws.map(hash60Jvm)
      var idx = 0L
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var cur = scala.collection.mutable.ArrayBuffer[(Int, Long)]() // (pos, thm)
      ws.indices.foreach { i =>
        cur += ((i, hs(i) % 1000000007L))
        if (hs(i) % 16L == 0L) {
          val p0 = cur.head._1.toLong
          val sig = cur.map { case (p, t) => t * (p + 1) }.sum -
            p0 * cur.map(_._2).sum
          out += ((id, idx, cur.size.toLong, sig))
          idx += 1; cur = scala.collection.mutable.ArrayBuffer()
        }
      }
      if (cur.nonEmpty) {
        val p0 = cur.head._1.toLong
        val sig = cur.map { case (p, t) => t * (p + 1) }.sum -
          p0 * cur.map(_._2).sum
        out += ((id, idx, cur.size.toLong, sig))
      }
      out.toSeq
    }
    val cf = chunks.groupBy(_._4).view
      .mapValues(cs => (cs.size.toLong, cs.map(_._1).min)).toMap
    val expected = chunks.groupBy(_._1).map { case (id, cs) =>
      val total = cs.map(_._3).sum
      val dup = cs.filter(c => cf(c._4)._1 > 1 && cf(c._4)._2 != id)
        .map(_._3).sum
      id -> ((cs.size.toLong, total, total * 100 / cs.size,
        dup * 1000000 / total))
    }
    val got = TextAnalysis.qCdcChunks(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("CDC shift-robustness: a shared passage chunks identically at any offset") {
    import spark.implicits._
    // pick words by their boundary property from the actual hash
    val words = (0 until 300).map(i => s"tok$i")
    val boundary = words.filter(w => hash60Jvm(w) % 16L == 0L)
    val plain = words.filterNot(w => hash60Jvm(w) % 16L == 0L)
    assert(boundary.size >= 2 && plain.size >= 30)
    // passage: plain words with two interior boundaries → at least one
    // boundary-to-boundary chunk lies fully inside the passage
    val passage = (plain.take(5) :+ boundary(0)) ++
      (plain.slice(5, 12) :+ boundary(1)) ++ plain.slice(12, 17)
    val doc1 = (Seq(plain(20)) ++ passage).mkString(" ")
    val doc2 = (plain.slice(21, 29) ++ passage).mkString(" ") // offset by 8
    val frame = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val sigs = TextAnalysis.cdcChunks(frame)
      .select("doc_id", "sig").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val s1 = sigs.filter(_._1 == 1L).map(_._2).toSet
    val s2 = sigs.filter(_._1 == 2L).map(_._2).toSet
    // the interior chunk re-synchronizes despite the different prefix
    assert((s1 intersect s2).nonEmpty,
      "content-defined boundaries must align shared passages across offsets")
    // the FIXED-width chunker cannot: chunk hashes are offset-dependent
    val fixedShared = {
      def fixedHashes(doc: String): Set[Long] =
        doc.split(" ").grouped(8).map(g => hash60Jvm(g.mkString(" "))).toSet
      fixedHashes(doc1) intersect fixedHashes(doc2)
    }
    assert(fixedShared.isEmpty,
      "8-token fixed chunks of these two docs should share nothing")
  }

  test("q_sq8_error == JVM scalar-quantization twin") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map { r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)
          .map(f => math.round(f.toDouble * 1000)).toSeq
      }
    val d = vecs.head._2.size
    val mn = (0 until d).map(i => vecs.map(_._2(i)).min)
    val mx = (0 until d).map(i => vecs.map(_._2(i)).max)
    val expected = vecs.map { case (id, q) =>
      val codes = (0 until d).map { i =>
        if (mx(i) > mn(i)) ((q(i) - mn(i)) * 255) / (mx(i) - mn(i)) else 0L
      }
      val errs = (0 until d).map { i =>
        math.abs((q(i) - mn(i)) * 255 - codes(i) * (mx(i) - mn(i)))
      }
      id -> ((errs.sum, errs.max, codes.sum))
    }.toMap
    val got = Similarity.qSq8Error(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got == expected)
    // quantization bound: per-element residual < its dim's range (×255
    // fixed point), so max_err can never exceed the largest range
    val maxRange = (0 until d).map(i => mx(i) - mn(i)).max
    got.values.foreach { case (_, maxErr, _) => assert(maxErr < maxRange) }
  }

  test("q_mrl_recall == JVM prefix-topk twin") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map { r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)
          .map(f => math.round(f.toDouble * 1000)).toSeq
      }.sortBy(_._1)
    def top3(p: Int): Map[Long, Seq[Long]] =
      vecs.filter(_._1 < 50).map { case (qid, qv) =>
        val qp = qv.take(p)
        val scored = vecs.filter(_._1 != qid).map { case (nid, nv) =>
          val np = nv.take(p)
          val dot = qp.zip(np).map { case (a, b) => a * b }.sum
          val na = qp.map(x => x * x).sum
          val nb = np.map(x => x * x).sum
          (nid, dot.toDouble / math.sqrt((na * nb).toDouble))
        }
        qid -> scored.sortBy { case (nid, c) => (-c, nid) }.take(3).map(_._1).toSeq
      }.toMap
    val d = vecs.head._2.size
    val truth = top3(d)
    val possible = truth.values.map(_.size).sum.toLong
    val expected = Seq(16, 32).map { p =>
      val hits = top3(p).map { case (qid, ns) =>
        ns.count(truth(qid).contains).toLong
      }.sum
      (p.toLong, hits, possible, hits * 1000000L / possible)
    }.toSet
    val got = Similarity.qMrlRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == expected)
  }
}
