package graft

import graft.operators.{MetricsEtl, Olap, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the late-round-9 operator batch,
  * same convention as Round6 through 9: from-scratch re-derivations on
  * the raw parquet (collected at sf0.001), no Spark expressions in the
  * twin path. Token-level twins work on token STRINGS (the engine keys
  * on hash60 — comparing per-source/per-doc AGGREGATES makes the twin
  * independent of the hashing device entirely).
  */
class Round9bOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val EvalTsUs = 1705320000L * 1000000L
  private val PinTsUs = EvalTsUs - 21600L * 1000000L

  /** (name, user, ts_us, event_id, cents) rows off the raw fixture. */
  private def ev: Seq[(String, Long, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq

  /** (doc_id, source, tokens) off the raw fixture. */
  private def docs: Seq[(Long, String, Seq[String])] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1),
          r.getString(2).split(" ", -1).toSeq)).toSeq

  test("q_downsample == JVM per-window rollup") {
    val expected = ev.groupBy { case (n, u, ts, _, _) =>
      (n, u, ts / 1000000L / 300L * 300L)
    }.map { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      k -> (rows.size.toLong, rows.map(_._5).sum, rows.map(_._5).min,
        rows.map(_._5).max, sorted.head._5, sorted.last._5)
    }
    val got = MetricsEtl.qDownsample(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))
    }.toMap
    assert(got == expected)
  }

  test("q_at_modifier == JVM pinned-vs-now instant evaluation") {
    def arm(evalTs: Long): Map[(String, Long), Long] =
      ev.filter(r => r._3 > evalTs - 86400000000L && r._3 <= evalTs)
        .groupBy(r => (r._1, r._2))
        .view.mapValues(_.maxBy(r => (r._3, r._4))._5).toMap
    val pin = arm(PinTsUs)
    val now = arm(EvalTsUs)
    val expected = (pin.keySet ++ now.keySet).map { k =>
      val p = pin.get(k); val n = now.get(k)
      k -> (if (p.isDefined) 1 else 0, if (n.isDefined) 1 else 0,
        p.getOrElse(0L), n.getOrElse(0L),
        n.getOrElse(0L) - p.getOrElse(0L))
    }.toMap
    val got = MetricsEtl.qAtModifier(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
    assert(got == expected)
  }

  test("q_slo_burn == JVM budget arithmetic, page needs BOTH windows") {
    val d1 = 86400000000L
    val slice = ev.filter(r => r._3 > EvalTsUs - 3 * d1 && r._3 <= EvalTsUs)
    val expected = slice.groupBy(_._2 % 4).map { case (c, rows) =>
      val n1 = rows.count(_._3 > EvalTsUs - d1).toLong
      val e1 = rows.count(r => r._3 > EvalTsUs - d1 && r._1 == "error").toLong
      val n3 = rows.size.toLong
      val e3 = rows.count(_._1 == "error").toLong
      val b1 = e1 * 1000000L / math.max(n1, 1L) / 10L
      val b3 = e3 * 1000000L / math.max(n3, 1L) / 10L
      c -> (n1, e1, n3, e3, b1, b3,
        if (b1 >= 2000L && b3 >= 1000L) 1 else 0)
    }
    val got = MetricsEtl.qSloBurn(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))
    }.toMap
    assert(got == expected)
  }

  test("q_gap_fill == JVM neighbor fill + interpolation") {
    val step = 300L * 1000000L
    val hour = 3600L * 1000000L
    val gridStart = EvalTsUs - hour
    val watch = Set("click", "purchase", "view", "signup", "error")
    val samples = ev.filter(r => r._3 > gridStart - hour &&
      r._3 <= EvalTsUs + hour && watch(r._1) && r._2 < 100)
    val expected = samples.groupBy(r => (r._1, r._2)).flatMap {
      case ((name, user), rows) =>
        (0 to 12).map { i =>
          val t = gridStart + i * step
          val prev = rows.filter(_._3 <= t) match {
            case Seq() => None
            case xs => Some(xs.maxBy(r => (r._3, r._4)))
          }
          val next = rows.filter(_._3 > t) match {
            case Seq() => None
            case xs => Some(xs.minBy(r => (r._3, r._4)))
          }
          val filled = prev.exists(p => t - p._3 <= 600L * 1000000L)
          val interp = (prev, next) match {
            case (Some(p), Some(n)) =>
              val x = p._5 + (n._5 - p._5) *
                ((t - p._3).toDouble / (n._3 - p._3))
              java.math.BigDecimal.valueOf(x)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
            case _ => 0.0
          }
          (t / 1000000L, name, user) ->
            (if (filled) 1 else 0,
              if (filled) prev.get._5 else 0L,
              if (prev.isDefined && next.isDefined) 1 else 0, interp)
        }
    }
    val got = MetricsEtl.qGapFill(spark, dir).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getInt(3), r.getLong(4), r.getInt(5), r.getDouble(6))
    }.toMap
    assert(got == expected)
  }

  test("q_seq_match == JVM sequence scan per user") {
    val expected = ev.filter(r => r._1 == "signup" || r._1 == "purchase")
      .groupBy(_._2).map { case (user, rows0) =>
        val rows = rows0.sortBy(r => (r._3, r._4))
        val nS = rows.count(_._1 == "signup").toLong
        val nP = rows.count(_._1 == "purchase").toLong
        val adj = rows.sliding(2).count {
          case Seq(a, b) => a._1 == "signup" && b._1 == "purchase"
          case _ => false
        }.toLong
        var lastSignup: Option[Long] = None
        var matched = 0
        var minGap = Long.MaxValue
        rows.foreach { r =>
          if (r._1 == "purchase" && lastSignup.isDefined) {
            matched = 1
            minGap = math.min(minGap, r._3 - lastSignup.get)
          }
          if (r._1 == "signup") lastSignup = Some(r._3)
        }
        user -> (nS, nP, adj, matched,
          if (minGap == Long.MaxValue) 0L else minGap)
      }
    val got = Olap.qSeqMatch(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))
    }.toMap
    assert(got == expected)
  }

  test("q_source_chi2 == JVM rational chi-square on ppm distributions") {
    val ds = docs
    val srcCnt = ds.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val corpus = srcCnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val srcTot = srcCnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val totC = corpus.values.sum
    val expected = srcTot.map { case (src, totS) =>
      val terms = corpus.map { case (tok, cC) =>
        val cS = srcCnt.getOrElse((src, tok), 0L)
        val ppmS = cS * 1000000L / totS
        val ppmC = cC * 1000000L / totC
        (ppmS - ppmC) * (ppmS - ppmC) / math.max(ppmC, 1L)
      }
      src -> (totS, terms.sum, terms.max)
    }
    val got = TextAnalysis.qSourceChi2(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))
    }.toMap
    assert(got == expected)
  }

  test("q_distinct_ngrams == JVM diversity counts") {
    val ds = docs
    val expected = ds.groupBy(_._2).map { case (src, rows) =>
      val unis = rows.flatMap(_._3)
      val bis = rows.flatMap(d => d._3.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")))
      val (n1, d1) = (unis.size.toLong, unis.distinct.size.toLong)
      val (n2, d2) = (bis.size.toLong, bis.distinct.size.toLong)
      src -> (n1, d1, d1 * 1000000L / math.max(n1, 1L),
        n2, d2, d2 * 1000000L / math.max(n2, 1L))
    }
    val got = TextAnalysis.qDistinctNgrams(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
    assert(got == expected)
  }

  test("q_bm25 == JVM Okapi scoring with quantized-weight sums") {
    val terms = Seq("data", "query", "stream")
    val ds = docs
    val dl = ds.map(d => d._1 -> d._3.size.toLong).toMap
    val nDocs = dl.size.toLong
    val sumDl = dl.values.sum
    val tf = ds.flatMap(d => d._3.filter(terms.contains)
      .groupBy(identity).map { case (t, xs) => (d._1, t, xs.size.toLong) })
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.groupBy(_._1).map { case (doc, rows) =>
      val ws = rows.map { case (_, t, f) =>
        val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val dlNorm = dl(doc).toDouble * nDocs / sumDl
        val w = idf * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dlNorm))) * 1000
        java.math.BigDecimal.valueOf(w)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
      doc -> (rows.size.toLong, ws.sum)
    }
    val got = TextAnalysis.qBm25(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))
    }.toMap
    assert(got == expected)
  }

  test("q_power_iter == JVM one-step power iteration") {
    val vecs = Tables.embeddings(spark, dir).select("embedding")
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding")
        .map(f => BigDecimal(f.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val d = vecs.head.length
    val v0 = Array.tabulate(d)(j => ((j * 37) % 7 - 3).toLong)
    val dts = vecs.map(q =>
      q.indices.map(j => q(j) * v0(j)).sum)
    val w = Array.fill(d)(0L)
    vecs.zip(dts).foreach { case (q, dt) =>
      q.indices.foreach(j => w(j) += q(j) * dt)
    }
    val rqNum = dts.map(t => t * t).sum
    val got = graft.operators.Similarity.qPowerIter(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expected = (1 to d).map(dim =>
      dim -> (w(dim - 1), vecs.length.toLong, rqNum)).toMap
    assert(got == expected)
    // the start vector must not be orthogonal to the data (a zero
    // iterate would make the step vacuous)
    assert(w.exists(_ != 0L))
  }

  test("q_token_entropy == JVM floor-log2 entropy on token strings") {
    def fl2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = docs.filter(_._3.nonEmpty).map { case (id, _, toks) =>
      val counts = toks.groupBy(identity).map(_._2.size.toLong).toSeq
      val n = counts.sum
      val sumClog = counts.map(c => c * fl2(c)).sum
      id -> (n, counts.size.toLong, (n * fl2(n) - sumClog) * 100L / n)
    }.toMap
    val got = TextAnalysis.qTokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    // sanity: the fixture's 31-word vocab caps per-doc entropy well
    // below fl2(n) — a repetitive doc must score lower than a diverse
    // one of the same length (monotonicity spot check)
    assert(got.values.exists(_._3 > 0L))
  }
}
