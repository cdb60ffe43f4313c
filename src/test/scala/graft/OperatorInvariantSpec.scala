package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic invariants of the LLM-pipeline operators, checked at
  * sf0.001 — properties the DuckDB oracle cannot express (it only
  * proves Spark==DuckDB, not that both are sane): conservation laws,
  * range bounds, ordering contracts, cross-operator consistency.
  */
class OperatorInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_exact: groups partition the corpus; keeper is group minimum") {
    val docs = Tables.documents(spark, dir).count()
    val g = Dedup.qDedupExact(spark, dir)
    assert(g.agg(sum("n_docs")).head().getLong(0) == docs)
    assert(g.filter(col("keep_doc_id") < 0).count() == 0)
  }

  test("dedup_ngram: pair ordering, set algebra, threshold bounds") {
    val pairs = Dedup.qDedupNgram(spark, dir).collect()
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (i, u) = (r.getAs[Long]("inter_count"), r.getAs[Long]("union_count"))
      val j = r.getAs[Double]("jaccard")
      assert(a < b, "pairs must be canonically ordered")
      assert(i >= 1 && i <= u, "intersection within union")
      assert(j >= 0.2 && j <= 1.0, s"jaccard $j out of threshold range")
    }
  }

  test("minhash candidates agree with exact jaccard on planted dups") {
    val exact = Dedup.qDedupNgram(spark, dir).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.qMinhashLsh(spark, dir).collect()
    cand.foreach { r =>
      val n = r.getAs[Long]("n_shared_bands")
      assert(n >= 1 && n <= 4)
    }
    val candPairs = cand.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // every 4-band (near-identical) candidate is a real >=0.2 near-dup
    val strong = cand.filter(_.getAs[Long]("n_shared_bands") == 4)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strong.subsetOf(exact))
    // and the two detectors overlap on this corpus (planted dups exist)
    assert(exact.isEmpty == candPairs.isEmpty)
  }

  test("simhash: 60-bit range and band recomposition") {
    Dedup.qSimhash(spark, dir).collect().foreach { r =>
      val h = r.getAs[Long]("simhash")
      assert(h >= 0 && h < (1L << 60))
      val recomposed = (0 to 3).map(i =>
        r.getAs[Long](s"band$i") << (15 * i)).reduce(_ | _)
      assert(recomposed == h, "bands must recompose to the signature")
    }
  }

  test("cosine top-k: bounds, dense ranks, no self-pairs, descending") {
    val rows = Similarity.qEmbedCosineTopk(spark, dir).collect()
      .groupBy(_.getAs[Long]("vec_id"))
    rows.foreach { case (vid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to sorted.length))
      assert(sorted.forall(r => r.getAs[Long]("neighbor_id") != vid))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y },
        "cosines must be non-increasing in rank")
    }
  }

  test("ann/dedup_embed: bucket-local pairs, threshold respected") {
    Similarity.qAnnLsh(spark, dir).collect().foreach { r =>
      assert(r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3)
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 64)
    }
    Similarity.qDedupEmbed(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }

  test("chunks conserve tokens; pack bins are sane") {
    val chunkSums = TextAnalysis.qChunks(spark, dir)
      .groupBy("doc_id").agg(sum("n_tokens").as("total"))
    val tokens = TextAnalysis.qTokens(spark, dir)
      .select(col("doc_id"), col("n_ws_tokens"))
    val joined = chunkSums.join(tokens, "doc_id")
      .filter(col("total") =!= col("n_ws_tokens"))
    assert(joined.count() == 0, "chunk token counts must sum to doc tokens")
    TextAnalysis.qPack(spark, dir).collect().foreach { r =>
      assert(r.getAs[Int]("shard") >= 0 && r.getAs[Int]("shard") < 32)
      assert(r.getAs[Long]("bin_id") >= 0)
    }
  }

  test("repetition: fractions bounded; word fraction agrees with q_tokens") {
    val rep = TextAnalysis.qRepetition(spark, dir).collect()
    rep.foreach { r =>
      Seq("dup_word_x10k", "dup_2gram_x10k", "dup_3gram_x10k").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 10000, s"$c=$v out of [0,10000]")
      }
    }
    // cross-operator: dup_word_x10k must equal the same truncating
    // formula over q_tokens' (n_ws_tokens, n_distinct_tokens)
    val mismatch = TextAnalysis.qRepetition(spark, dir)
      .select("doc_id", "dup_word_x10k")
      .join(TextAnalysis.qTokens(spark, dir), "doc_id")
      .filter(expr(
        "dup_word_x10k != (CAST(n_ws_tokens - n_distinct_tokens AS BIGINT) * 10000) div CAST(n_ws_tokens AS BIGINT)"))
    assert(mismatch.count() == 0, "q_repetition disagrees with q_tokens")
  }

  test("shard_order: a bijective, deterministic corpus permutation") {
    val docs = Tables.documents(spark, dir).count()
    val so = TextAnalysis.qShardOrder(spark, dir)
    assert(so.count() == docs, "every doc gets exactly one slot")
    assert(so.select("doc_id").distinct().count() == docs)
    // per shard, positions are exactly 1..count (no gaps, no dups)
    val bad = so.groupBy("shard").agg(
      count(lit(1)).as("n"), max("pos").as("mx"),
      countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.count() == 0, "positions must be a 1..n sequence per shard")
    so.collect().foreach { r =>
      val s = r.getAs[Int]("shard"); assert(s >= 0 && s < 16)
    }
    // deterministic: a second independent evaluation is bit-identical
    val again = TextAnalysis.qShardOrder(spark, dir)
    assert(so.exceptAll(again).count() == 0 &&
      again.exceptAll(so).count() == 0, "order must be reproducible")
  }

  test("quality/lang scores within declared ranges") {
    TextAnalysis.qQuality(spark, dir).collect().foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of [0,1]")
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0.0 && sr <= 1.0)
    }
    TextAnalysis.qLangId(spark, dir).collect().foreach { r =>
      assert(Set("en", "unk").contains(r.getAs[String]("lang_pred")))
    }
  }

  test("retention: offset-0 row is the full cohort; activity conserved") {
    val r = Olap.qRetention(spark, dir).collect()
    val week0 = r.filter(_.getAs[Long]("offset") == 0L)
    assert(week0.nonEmpty)
    week0.foreach { row =>
      assert(row.getAs[Long]("n_active") == row.getAs[Long]("cohort_size"),
        "every user is active in their own first week")
      assert(row.getAs[Long]("retained_ppm") == 1000000L)
    }
    r.foreach { row =>
      assert(row.getAs[Long]("n_active") <= row.getAs[Long]("cohort_size"))
      assert(row.getAs[Long]("offset") >= 0L)
    }
  }

  test("funnel: stage counts are monotone per day") {
    Olap.qFunnel(spark, dir).collect().foreach { row =>
      val (s, v, c, p) = (row.getAs[Long]("n_sessions"),
        row.getAs[Long]("n_view"), row.getAs[Long]("n_view_click"),
        row.getAs[Long]("n_click_purchase"))
      assert(p <= c && c <= v && v <= s,
        s"funnel must narrow: $s >= $v >= $c >= $p")
    }
  }

  test("minhash_est_err: estimates in range, exact side above threshold") {
    val rows = Dedup.qMinhashEstErr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_x10k")
      val exact = r.getAs[Long]("exact_x10k")
      assert(est >= 0L && est <= 10000L && est % 625L == 0L,
        s"estimate must be matches·625 in [0, 10⁴]: $est")
      assert(exact >= 2000L, "pairs come from the 0.2-thresholded list")
      assert(r.getAs[Long]("abs_err_x10k") == math.abs(est - exact))
    }
  }

  test("cluster_canonical: canonical is the longest member, chars add up") {
    val members = Dedup.qDedupClusters(spark, dir).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    val canon = Dedup.qClusterCanonical(spark, dir).collect()
    assert(canon.nonEmpty && canon.length == members.size)
    val docChars = graft.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val cdoc = r.getAs[Long]("canonical_doc")
      val ids = members(cid).map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(cdoc), "canonical must be a member")
      assert(r.getAs[Long]("n_members") == ids.size.toLong)
      val maxChars = ids.map(docChars).max
      assert(r.getAs[Long]("canonical_chars") == maxChars,
        "canonical must carry the cluster's max length")
      assert(r.getAs[Long]("dropped_chars") ==
        ids.toSeq.map(docChars).sum - maxChars)
    }
  }

  test("cross_dedup: flags consistent, covers exactly the new shard") {
    val rows = Dedup.qCrossDedup(spark, dir).collect()
    val newShard = graft.Tables.documents(spark, dir)
      .filter(col("source") === "src0").count()
    assert(rows.length.toLong == newShard, "one row per new-shard doc")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_base_matches")
      val dup = r.getAs[Int]("is_dup")
      assert((n > 0) == (dup == 1), s"flag/count mismatch: $n vs $dup")
    }
  }

  test("ann_recall: hits bounded by truth; the banding dial buys recall") {
    val rows = Similarity.qAnnRecall(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits_lsh") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("hits_bands") <= r.getAs[Long]("n_exact"))
    }
    // band 0 is an independent plane set (not a superset), so per-row
    // dominance does not hold — but the MEAN must: two probes see at
    // least what the average single probe sees
    val meanLsh = rows.map(_.getAs[Long]("recall_lsh_ppm")).sum / rows.length
    val meanBands =
      rows.map(_.getAs[Long]("recall_bands_ppm")).sum / rows.length
    assert(meanBands >= meanLsh,
      s"banding must not lose recall on average: $meanBands < $meanLsh")
  }

  test("label_cardinality: the user key counts every event exactly once") {
    val total = Tables.events(spark, dir).count()
    val r = MetricsEtl.qLabelCardinality(spark, dir).collect()
      .map(x => x.getAs[String]("k") -> x).toMap
    assert(r("user").getAs[Long]("n_occurrences") == total)
    r.values.foreach { row =>
      assert(row.getAs[Long]("top_n") <= row.getAs[Long]("n_occurrences"))
      assert(row.getAs[Long]("top_share_ppm") <= 1000000L)
    }
  }

  test("vector setops: and/unless partition the err side; or covers both") {
    MetricsEtl.qVectorSetops(spark, dir).collect().foreach { row =>
      val inErr = row.getAs[Int]("in_err") == 1
      val inView = row.getAs[Int]("in_view") == 1
      val andC = row.getAs[Long]("and_cents")
      val unlessC = row.getAs[Long]("unless_cents")
      val orC = row.getAs[Long]("or_cents")
      assert(inErr || inView, "a row must come from at least one side")
      // exactly one of and/unless carries the err value when err present
      if (inErr) assert((andC == -1L) != (unlessC == -1L))
      else assert(andC == -1L && unlessC == -1L)
      assert(orC != -1L, "or always has a value from some side")
    }
  }

  test("range_eval: every sample lands in exactly range/step eval steps") {
    val totalSamples = Tables.events(spark, dir).count()
    val summed = MetricsEtl.qRangeEval(spark, dir)
      .agg(sum("n_samples")).head().getLong(0)
    assert(summed == totalSamples * 3,
      s"30m/10m lookback must triple-count: $summed != 3×$totalSamples")
  }

  test("bitext_mine: one best match per source vector, strictly cross-label") {
    val rows = Similarity.qBitextMine(spark, dir).collect()
    assert(rows.nonEmpty)
    val perSrc = rows.groupBy(_.getAs[Long]("src_id"))
    perSrc.values.foreach(g => assert(g.length == 1, "top-1 per src"))
    rows.foreach { r =>
      assert(r.getAs[Int]("src_label") != r.getAs[Int]("tgt_label"))
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.3 && c <= 1.0 + 1e-9)
    }
  }

  test("patch_grid and av_sync: integer plan ranges hold") {
    Multimodal.qPatchGrid(spark, dir).collect().foreach { r =>
      def n(c: String): Long = r.getAs[Number](c).longValue()
      val (w, h) = (n("width"), n("height"))
      val np = n("n_patches")
      assert(np == (w / 16) * (h / 16))
      assert(n("kept_tokens") <= 1024L)
      assert((n("truncated") == 1L) == (np + 1 > 1024))
    }
    Multimodal.qAvSync(spark, dir).collect().foreach { r =>
      val nStft = r.getAs[Long]("n_stft")
      val idx = r.getAs[Long]("stft_idx")
      if (nStft > 0) assert(idx >= 0 && idx < nStft, s"stft idx $idx of $nStft")
      else assert(idx == -1L)
      assert(r.getAs[Long]("vframe") < r.getAs[Long]("n_vframes"))
    }
  }

  test("dup_span: island runs equal brute-force longest common word span") {
    // brute-force longest common substring (in WORDS) per doc pair,
    // JVM-side, on the real corpus — the diagonal/island trick must
    // agree exactly wherever it reports a pair
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def lcsWords(a: Seq[String], b: Seq[String]): Int = {
      // O(|a|·|b|) DP over suffix match lengths
      var best = 0
      val prev = Array.fill(b.length + 1)(0)
      for (i <- 1 to a.length) {
        var diagVal = 0 // prev[j-1] before overwrite = dp(i-1, j-1)
        for (j <- 1 to b.length) {
          val tmp = prev(j)
          prev(j) = if (a(i - 1) == b(j - 1)) diagVal + 1 else 0
          if (prev(j) > best) best = prev(j)
          diagVal = tmp
        }
      }
      best
    }
    val reported = Dedup.qDupSpan(spark, dir).collect()
    assert(reported.nonEmpty, "corpus plants duplicated spans — must find some")
    reported.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val span = r.getAs[Long]("span_words")
      val truth = lcsWords(docs(a), docs(b))
      assert(a < b, "canonical pair order")
      // span_words = longest aligned 3-shingle run + 2 == the true
      // longest common word span (shingles are within-doc positions,
      // so a k-word common substring is exactly k-2 consecutive
      // diagonal hits)
      assert(span == truth,
        s"pair ($a,$b): reported span $span != brute-force $truth")
    }
    // completeness: every pair whose true span clears the 7-word
    // threshold is reported (stop-shingle guard is a no-op at this SF)
    val reportedPairs = reported.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ids = docs.keys.toSeq.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.size) {
      val t = lcsWords(docs(ids(i)), docs(ids(j)))
      if (t >= 7)
        assert(reportedPairs.contains((ids(i), ids(j))),
          s"missed pair (${ids(i)},${ids(j)}) with true span $t")
    }
  }
}
