package graft

import graft.operators.{MetricsEtl, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the fourth round-7 operator batch
  * (cell purity / per-lang quality quartiles / info() / dim variance):
  * from-scratch re-derivations on the raw parquet, no shared
  * formulation with the Spark plans or the DuckDB oracles.
  */
class Round7cOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecs: Seq[(Long, Seq[Long], Int)] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding", "label")
      .collect().map { r =>
        (r.getLong(0),
          r.getAs[scala.collection.Seq[Float]](1)
            .map(f => math.round(f.toDouble * 1000)).toSeq,
          r.getInt(2))
      }.toSeq.sortBy(_._1)

  /** JVM IVF assignment: argmax cosine to the first-K centroids with
    * the (ccos desc, cell asc) tie rule. K matches the operator's
    * sqrt-n sizing — 16 at fixture SFs. */
  private def assignment: Map[Long, Long] = {
    val cents = vecs.filter(_._1 < 16).map(v => (v._1, v._2))
    vecs.map { case (id, q, _) =>
      val best = cents.map { case (cell, qc) =>
        val dot = q.zip(qc).map { case (a, b) => a * b }.sum
        val na = q.map(x => x * x).sum
        val nc = qc.map(x => x * x).sum
        (cell, dot.toDouble / math.sqrt((na * nc).toDouble))
      }.minBy { case (cell, c) => (-c, cell) }
      id -> best._1
    }.toMap
  }

  test("q_cell_purity == JVM assignment + majority vote") {
    val asg = assignment
    val labels = vecs.map(v => v._1 -> v._3.toLong).toMap
    val expected = asg.groupBy(_._2).map { case (cell, members) =>
      val ls = members.keys.toSeq.map(labels)
      val byLabel = ls.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (topLabel, topCount) =
        byLabel.toSeq.minBy { case (l, c) => (-c, l) }
      cell -> ((ls.size.toLong, byLabel.size.toLong, topLabel, topCount,
        topCount * 1000000L / ls.size))
    }
    val got = Similarity.qCellPurity(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("q_dim_variance == JVM per-dim moments") {
    val d = vecs.head._2.size
    val n = vecs.size.toLong
    val perDim = (0 until d).map { i =>
      val xs = vecs.map(_._2(i))
      val s1 = xs.sum
      val m = (s1 + n * 100000L) / n - 100000L
      val varSum = xs.map(x => (x - m) * (x - m)).sum
      (i.toLong, n, m, varSum)
    }
    val tot = perDim.map(_._4).sum
    val expected = perDim.map { case (i, nn, m, v) =>
      i -> ((nn, m, v, v * 1000000L / tot))
    }.toMap
    val got = Similarity.qDimVariance(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("q_quality_by_lang == JVM quartiles of the composite score") {
    val stop = Set("the", "a", "an", "of", "and", "to", "in", "is", "it",
      "that", "for")
    val scored = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang").collect().map { r =>
        val text = r.getString(1)
        val ws = text.split(" ", -1)
        // Spark round(x, d) rounds the SHORTEST decimal repr HALF_UP —
        // BigDecimal.valueOf (Double.toString) replicates that; a raw
        // BigDecimal(double) would round the exact binary expansion
        val r4 = (x: Double) => BigDecimal.valueOf(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val stopRatio = r4(ws.count(stop).toDouble / ws.length)
        // `punct` mirrors the operator's column: chars REMAINING after
        // stripping non-alphanumerics (its ratio feeds 1-x in the score)
        val punct = text.length - text.replaceAll("[A-Za-z0-9 ]", "").length
        val punctRatio = r4(punct.toDouble / text.length)
        val score = BigDecimal.valueOf(math.min(ws.length / 50.0, 1.0) * 0.5
          + stopRatio * 0.3 + (1.0 - punctRatio) * 0.2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getString(2), math.round(score * 1000000.0))
      }
    def quartile(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.size - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      val g = pos - pos.toInt
      BigDecimal.valueOf(lo + g * (hi - lo))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = scored.groupBy(_._1).map { case (lang, rs) =>
      val xs = rs.map(_._2).toSeq
      lang -> ((xs.size.toLong, quartile(xs, 0.25), quartile(xs, 0.5),
        quartile(xs, 0.75)))
    }
    val got = TextAnalysis.qQualityByLang(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    }.toMap
    assert(got == expected)
  }

  test("q_info_func == JVM modal-type + tercile enrichment") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // info side: modal type (count desc, name asc) + activity terciles
    val byUser = ev.groupBy(_._1)
    val info0 = byUser.map { case (u, rs) =>
      val byType = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val primary = byType.toSeq.minBy { case (t, c) => (-c, t) }._1
      (u, primary, rs.size.toLong)
    }.toSeq
    val ordered = info0.sortBy { case (u, _, n) => (-n, u) }
    val n = ordered.size
    val base = n / 3; val extra = n % 3
    // ntile(3): the first (n mod 3) buckets carry one extra member
    val b1 = base + (if (extra >= 1) 1 else 0)
    val b2 = b1 + base + (if (extra >= 2) 1 else 0)
    val tiers = ordered.zipWithIndex.map { case ((u, p, _), i) =>
      val t = if (i < b1) 1 else if (i < b2) 2 else 3
      u -> ((s"t$t", p))
    }.toMap
    // instant vector at EvalTs: latest sample per (name, user) in 24h
    val evalTs = 1705320000L * 1000000L
    val iv = ev.filter(e => e._4 > evalTs - 86400000000L && e._4 <= evalTs)
      .groupBy(e => (e._2, e._1))
      .map { case ((name, u), rs) =>
        val latest = rs.maxBy(e => (e._4, e._3))
        (name, u, latest._5)
      }
    val expected = iv.map { case (name, u, cents) =>
      val (tier, primary) = tiers.getOrElse(u, (("unknown", "unknown")))
      (name, u, cents, tier, primary)
    }.toSet
    val got = MetricsEtl.qInfoFunc(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))
    }.toSet
    assert(got == expected)
  }
}
