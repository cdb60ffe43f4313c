package graft

import graft.operators.{MetricsEtl, Olap}
import org.apache.spark.sql.Row

/** Independent cross-checks for the round-7 operators (the
  * Round6OperatorSpec pattern): each result is re-derived from the raw
  * parquet by a from-scratch JVM computation that shares NO formulation
  * with either the Spark plan or the DuckDB oracle SQL.
  */
class Round7OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Array[Row] =
    Tables.table(spark, dir, name).collect()

  test("q_supp_part_cnt == brute-force distinct-supplier count (Q16)") {
    val badSupp = rows("supplier")
      .filter(_.getAs[Double]("s_acctbal") < 0)
      .map(_.getAs[Long]("s_suppkey")).toSet
    val parts = rows("part").map { r =>
      r.getAs[Long]("p_partkey") ->
        ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[Int]("p_size")))
    }.toMap
    val sizes = Set(3, 9, 14, 19, 23, 36, 45, 49)
    val expected = rows("lineitem")
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .distinct
      .filterNot { case (_, s) => badSupp(s) }
      .flatMap { case (p, s) => parts.get(p).map(_ -> s) }
      .filter { case ((b, t, sz), _) =>
        b != "Brand#13" && !t.startsWith("MEDIUM") && sizes(sz) }
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).distinct.length.toLong }
    val got = Olap.qSuppPartCnt(spark, dir).collect().map { r =>
      (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Long]("p_size").toInt) -> r.getAs[Long]("supplier_cnt")
    }.toMap
    assert(got == expected)
  }

  test("q_excess_supplier == brute-force qualifying-supplier set (Q20)") {
    val promo = rows("part").filter(_.getAs[String]("p_type") == "PROMO")
      .map(_.getAs[Long]("p_partkey")).toSet
    def shipYear(r: Row): Int = r.getAs[Any]("l_shipdate") match {
      case t: java.sql.Timestamp =>
        t.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      case d: java.time.LocalDateTime => d.getYear
    }
    val qualifying = rows("lineitem")
      .filter(r => promo(r.getAs[Long]("l_partkey")) && shipYear(r) == 1996)
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .collect { case ((_, s), ls)
          if Math.round(ls.map(_.getAs[Double]("l_quantity")).sum) > 50 => s }
      .toSet
    val got = Olap.qExcessSupplier(spark, dir).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(got == qualifying)
    assert(got.nonEmpty, "fixture must exercise the non-empty branch")
  }

  test("q_promql_round: integer form == float floor(v/to + 0.5)*to") {
    val got = MetricsEtl.qPromqlRound(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val c = r.getAs[Long]("cents")
      for ((t, col) <- Seq(1L -> "round_c1", 50L -> "round_c50",
          100L -> "round_c100")) {
        val want = (math.floor(c.toDouble / t + 0.5) * t).toLong
        assert(r.getAs[Long](col) == want,
          s"cents=$c to=$t: ${r.getAs[Long](col)} != $want")
      }
    }
  }

  test("q_sort_by_label ranks == label-lexicographic order of the vector") {
    val got = MetricsEtl.qSortByLabel(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank_asc"))
    val sorted = got.sortBy(r =>
      (r.getAs[String]("name"), r.getAs[Long]("user_id")))
    assert(got.toSeq == sorted.toSeq, "rank_asc must equal label order")
    val n = got.length.toLong
    got.foreach(r => assert(
      r.getAs[Long]("rank_desc") == n - r.getAs[Long]("rank_asc") + 1))
  }

  test("q_group_agg == presence map of the instant vector") {
    val iv = MetricsEtl.qInstantVector(spark, dir).collect()
      .groupBy(_.getAs[String]("name"))
    val got = MetricsEtl.qGroupAgg(spark, dir).collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("group_value"), r.getAs[Long]("n_series")))).toMap
    assert(got.keySet == iv.keySet)
    got.foreach { case (name, (gv, n)) =>
      assert(gv == 1L)
      assert(n == iv(name).length.toLong)
    }
  }

  // ——— late-round-7 additions ———

  private def docTokens: Map[Long, Array[String]] =
    rows("documents").map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap

  test("q_bigram_lp == from-scratch JVM bigram LM") {
    val toks = docTokens
    val freq = toks.values.flatMap(_.sliding(2).filter(_.length == 2)
      .map(_.mkString(" "))).groupBy(identity).map { case (k, v) => k -> v.size }
    def log2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = toks.collect { case (id, ws) if ws.length >= 2 =>
      val lps = ws.sliding(2).map(b => log2(freq(b.mkString(" ")).toLong)).toSeq
      id -> ((lps.length.toLong, lps.sum * 100L / lps.length))
    }
    val got = operators.TextAnalysis.qBigramLp(spark, dir).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("lp2_x100")))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_vocab_growth == from-scratch prefix type/token counts") {
    val toks = docTokens
    val expected = Seq(50L, 200L, 450L).map { p =>
      val in = toks.filter(_._1 < p).values
      p -> ((in.map(_.length.toLong).sum, in.flatten.toSet.size.toLong))
    }.toMap
    val got = operators.TextAnalysis.qVocabGrowth(spark, dir).collect().map(r =>
      r.getAs[Long]("prefix_docs") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab")))).toMap
    assert(got == expected)
    // the curve must be nondecreasing in both coordinates
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted)
  }

  test("q_jaccard_curve == from-scratch JVM minhash banding") {
    import graft.functions.Portable.hash60Jvm
    val P = 2147483647L
    val mhA = (0 until 16).map(i => hash60Jvm(s"mh_a:$i") % (P - 1) + 1)
    val mhB = (0 until 16).map(i => hash60Jvm(s"mh_b:$i") % P)
    val sigs: Map[Long, IndexedSeq[Long]] = docTokens.collect {
      case (id, ws) if ws.length >= 3 =>
        val shs = ws.sliding(3).map(w => hash60Jvm(w.mkString(" ")))
          .toSeq.distinct.map(_ % 1073741824L)
        id -> (0 until 16).map(i =>
          shs.map(h => (h * mhA(i) + mhB(i)) % P).min)
    }
    val byBucket = sigs.toSeq.flatMap { case (id, s) =>
      (0 until 4).map(b => (b.toLong,
        hash60Jvm((0 until 4).map(j => s(b * 4 + j)).mkString(","))) -> id)
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val cand = byBucket.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))).toSet
    val matches = cand.toSeq.map { case (a, b) =>
      (0 until 16).count(i => sigs(a)(i) == sigs(b)(i)) }
    val expected = (matches.length.toLong,
      matches.count(_ >= 8).toLong, matches.count(_ >= 12).toLong,
      matches.count(_ >= 16).toLong)
    val r = operators.Dedup.qJaccardCurve(spark, dir).collect().head
    val got = (r.getAs[Long]("n_cand_pairs"), r.getAs[Long]("n_ge_8_of_16"),
      r.getAs[Long]("n_ge_12_of_16"), r.getAs[Long]("n_ge_16_of_16"))
    assert(got == expected)
    assert(got._1 > 0, "planted near-dups must produce candidates")
  }

  test("q_limitk flags == from-scratch selection over the instant vector") {
    import graft.functions.Portable.hash60Jvm
    val iv = MetricsEtl.qInstantVector(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("cents")))
    val firstK = iv.groupBy(_._1).view.mapValues(
      _.map(_._2).sorted.take(2).toSet).toMap
    val got = MetricsEtl.qLimitk(spark, dir).collect()
    assert(got.map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
      r.getAs[Long]("cents"))).toSet == iv.toSet,
      "q_limitk must carry the exact instant vector")
    got.foreach { r =>
      val (name, uid) = (r.getAs[String]("name"), r.getAs[Long]("user_id"))
      assert((r.getAs[Int]("in_limitk") == 1) == firstK(name)(uid))
      assert((r.getAs[Int]("in_ratio") == 1) ==
        (hash60Jvm(s"$name:$uid") % 100 < 50))
    }
    assert(got.exists(_.getAs[Int]("in_limitk") == 0),
      "some series must fall outside the k-limit")
  }

  test("q_pipeline_funnel == funnel recomputed from the component queries") {
    val flt = operators.TextAnalysis.qFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("lang_ok") && r.getAs[Boolean]("len_ok") &&
          r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("canonical")))).toMap
    val chars = rows("documents").map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val ndKeep = operators.Dedup.qDedupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
      .groupBy(_._2).values.flatMap { members =>
        val keep = members.map(_._1).maxBy(d => (chars(d), -d))
        members.map { case (d, _) => d -> (d == keep) }
      }.toMap
    val flagged = operators.Dedup.qDecontaminate(spark, dir).collect()
      .filter(_.getAs[Boolean]("flagged"))
      .map(_.getAs[Long]("doc_id")).toSet
    val toks = docTokens.view.mapValues(_.length.toLong).toMap
    val stages = toks.keys.toSeq.sorted.map { d =>
      val (qOk, exactKeep) = flt(d)
      val s3 = qOk && exactKeep
      val s4 = s3 && ndKeep.getOrElse(d, true)
      val s5 = s4 && d >= 25 && !flagged(d)
      (qOk, s3, s4, s5, if (s5) toks(d) else 0L)
    }
    val r = operators.Dedup.qPipelineFunnel(spark, dir).collect().head
    assert(r.getAs[Long]("n_total") == toks.size.toLong)
    assert(r.getAs[Long]("n_quality") == stages.count(_._1).toLong)
    assert(r.getAs[Long]("n_exact") == stages.count(_._2).toLong)
    assert(r.getAs[Long]("n_neardup") == stages.count(_._3).toLong)
    assert(r.getAs[Long]("n_clean") == stages.count(_._4).toLong)
    assert(r.getAs[Long]("tokens_out") == stages.map(_._5).sum)
    // funnel must be monotone nonincreasing
    val f = Seq(r.getAs[Long]("n_total"), r.getAs[Long]("n_quality"),
      r.getAs[Long]("n_exact"), r.getAs[Long]("n_neardup"),
      r.getAs[Long]("n_clean"))
    assert(f == f.sorted.reverse, s"funnel not monotone: $f")
  }

  test("q_embed_norm_hist == from-scratch digit histogram") {
    val nrms = rows("embeddings").map { r =>
      val q = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(x => Math.round(x.toDouble * 1000))
      q.map(v => v * v).sum
    }
    val expected = nrms.groupBy(_.toString.length).map { case (d, vs) =>
      d -> ((vs.length.toLong, vs.min, vs.max)) }
    val got = operators.Similarity.qEmbedNormHist(spark, dir).collect().map(r =>
      r.getAs[Int]("nrm_digits") -> ((r.getAs[Long]("n_vectors"),
        r.getAs[Long]("min_nrm"), r.getAs[Long]("max_nrm")))).toMap
    assert(got == expected)
  }
}
