package graft

import graft.operators.{MetricsEtl, Olap, Similarity}
import org.apache.spark.sql.functions._

/** Independent cross-checks for the round-6 operators, beyond the
  * DuckDB oracle (which shares the relational formulation): the time
  * family against java.time, the kNN vote against the q_ann_lsh
  * neighbor lists it must agree with, the class-centroid cosine
  * against a from-scratch JVM twin on the raw parquet floats, and the
  * ADC distance against a JVM PQ encode/reconstruct twin.
  */
class Round6OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_time_funcs agrees with java.time UTC field extraction") {
    val rows = MetricsEtl.qTimeFuncs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tsUs = r.getAs[Long]("ts_us")
      val t = java.time.Instant.ofEpochSecond(tsUs / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
      assert(r.getAs[Long]("minute_utc") == t.getMinute.toLong)
      assert(r.getAs[Long]("hour_utc") == t.getHour.toLong)
      // PromQL day_of_week: 0 = Sunday; java DayOfWeek: 1 = Monday..7 = Sunday
      assert(r.getAs[Long]("day_of_week") ==
        (t.getDayOfWeek.getValue % 7).toLong)
      assert(r.getAs[Long]("day_of_month") == t.getDayOfMonth.toLong)
      assert(r.getAs[Long]("day_of_year") == t.getDayOfYear.toLong)
      assert(r.getAs[Long]("month_utc") == t.getMonthValue.toLong)
      assert(r.getAs[Long]("year_utc") == t.getYear.toLong)
      assert(r.getAs[Long]("days_in_month") ==
        t.toLocalDate.lengthOfMonth.toLong)
    }
  }

  test("q_knn_classify is the majority vote over q_ann_ivf's neighbor lists") {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q_ann_ivf emits exactly the 3 nearest in-cell neighbors per
    // vector (r9 rebase: the data-adapted √n-celled candidate
    // structure replaced the fixed-plane LSH buckets) — the vote input
    val neigh = Similarity.qAnnIvf(spark, dir)
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = Similarity.qKnnClassify(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("predicted"), r.getAs[Long]("votes"),
          r.getAs[Boolean]("mismatch")))).toMap
    assert(got.keySet == neigh.keySet,
      "every vector with neighbors must get a prediction")
    neigh.foreach { case (v, ns) =>
      val votes = ns.map(labels).groupBy(identity).view.mapValues(_.size)
      val (predicted, n) = votes.toSeq.minBy { case (l, c) => (-c, l) }
      val (gp, gn, gm) = got(v)
      assert(gp == predicted && gn == n.toLong && gm == (predicted != labels(v)),
        s"vec $v: got ($gp,$gn,$gm) want ($predicted,$n)")
    }
  }

  test("q_label_centroid agrees with a from-scratch JVM twin") {
    val raw = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Float]](2).map(x =>
          BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    // per-label floor-mean (the offset-shift device), ×100 scale
    val cents = raw.groupBy(_._2).view.mapValues { vs =>
      val d = vs.head._3.length
      Array.tabulate(d) { i =>
        val s = vs.map(v => v._3(i) + 1000L).sum
        s * 100L / vs.size - 100000L
      }
    }.toMap
    val got = Similarity.qLabelCentroid(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("centroid_cos"), r.getAs[Boolean]("suspect")))).toMap
    raw.foreach { case (id, label, q) =>
      val c = cents(label)
      val dot = q.zip(c).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble / math.sqrt(
        q.map(x => x * x).sum.toDouble * c.map(x => x * x).sum.toDouble)
      val (gc, gs) = got(id)
      assert(math.abs(gc - math.rint(cos * 1e6) / 1e6) < 1e-9,
        s"vec $id: cos $gc want $cos")
      assert(gs == (cos < 0.5))
    }
  }

  test("q_ivf_pq ADC equals the JVM PQ encode/reconstruct distance") {
    // JVM twin: encode every vector with the same plan-time codebook,
    // then ADC(query, v) must equal the exact squared distance between
    // the query subvectors and v's RECONSTRUCTED centroids
    import graft.functions.Portable.hash60Jvm
    val raw = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(x =>
          BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val d = raw.head._2.length
    val (pqM, pqK) = (4, 4)
    val sub = d / pqM
    val cents = Array.tabulate(pqM, pqK)((m, k) =>
      Array.tabulate(sub)(i => hash60Jvm(s"pq:$m:$k:$i") % 2001 - 1000))
    def subvec(q: Array[Long], m: Int): Array[Long] =
      q.slice(m * sub, (m + 1) * sub)
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codes = raw.map { case (id, q) =>
      id -> Array.tabulate(pqM)(m =>
        (0 until pqK).minBy(k => (sqd(subvec(q, m), cents(m)(k)), k)))
    }.toMap
    val vecs = raw.toMap
    val got = Similarity.qIvfPq(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, nid, adc) = (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc"))
      val q = vecs(qid)
      val want = (0 until pqM).map(m =>
        sqd(subvec(q, m), cents(m)(codes(nid)(m)))).sum
      assert(adc == want, s"query $qid neighbor $nid: adc $adc want $want")
    }
    // and the emitted top-3 must be the true ADC minima over the corpus
    val byQuery = got.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, rows) =>
      val q = vecs(qid)
      def adcTo(id: Long): Long = (0 until pqM).map(m =>
        sqd(subvec(q, m), cents(m)(codes(id)(m)))).sum
      val want = raw.map(_._1).filter(_ != qid)
        .map(id => (adcTo(id), id)).sortBy(identity).take(3).map(_._2).toSeq
      val gotIds = rows.sortBy(_.getAs[Int]("rn")).map(
        _.getAs[Long]("neighbor_id")).toSeq
      assert(gotIds == want, s"query $qid: top-3 $gotIds want $want")
    }
  }

  test("q_last_over_time matches a JVM brute-force over the raw events") {
    val raw = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = raw.groupBy { case (n, u, t, _) =>
      (n, u, t / 3600000000L * 3600L)
    }.view.mapValues { rs =>
      val last = rs.maxBy(_._3)
      (last._3, last._4, rs.size.toLong)
    }.toMap
    val got = MetricsEtl.qLastOverTime(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("w_start")) ->
        ((r.getAs[Long]("ts_last_us"), r.getAs[Long]("last_cents"),
          r.getAs[Long]("n_samples")))).toMap
    assert(got == want, s"${got.size} got vs ${want.size} want groups")
  }

  test("q_ngram_novelty matches a JVM first-occurrence twin on strings") {
    // the twin attributes first occurrence on the SHINGLE STRINGS (no
    // hash60), so hash-level and relational formulation are both
    // independently cross-checked
    val docs = Tables.documents(spark, dir)
      .select("text", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perSource: Map[String, Set[String]] = docs
      .groupBy(_._2).view.mapValues(_.flatMap { case (text, _) =>
        val ws = text.split(" ")
        ws.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet).toMap
    val firstOf: Map[String, String] = perSource.toSeq
      .flatMap { case (src, shs) => shs.map(_ -> src) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = graft.operators.Dedup.qNgramNovelty(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_x10000")))).toMap
    assert(got.keySet == perSource.keySet)
    perSource.foreach { case (src, shs) =>
      val novel = shs.count(firstOf(_) == src).toLong
      val (gn, gv, gx) = got(src)
      assert(gn == shs.size.toLong && gv == novel
          && gx == novel * 10000L / shs.size,
        s"$src: got ($gn,$gv,$gx) want (${shs.size},$novel)")
    }
    // global invariant: every distinct shingle is novel exactly once
    assert(got.values.map(_._2).sum == firstOf.size.toLong)
    // the lexicographically-first source is 100% novel by construction
    val firstSrc = perSource.keySet.min
    assert(got(firstSrc)._3 == 10000L, s"$firstSrc must be all-novel")
  }
}
