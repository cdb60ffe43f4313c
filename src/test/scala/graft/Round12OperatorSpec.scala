package graft

import graft.operators.{Dedup, MaterializeOnce}
import org.apache.spark.sql.functions._

/** Round-12 guards, from VERDICT_r11 item 2 (budget the LSH VERIFY
  * stage) and the ADVICE_r11 memo-lifecycle rules applied to the new
  * band-cap ladder: the candidate volume of the whole
  * candidate-then-verify family is now a plan-time decision —
  * q_verify_cost is the recorded table, Dedup.bandCap the selection,
  * and the shared band-pair frame the enforcement point.
  */
class Round12OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_verify_cost is the EXACT ladder table: every rung's candidate " +
      "count and hot-bucket count equal a JVM recomputation from the " +
      "band histogram, and `chosen` marks exactly Dedup.bandCap's rung") {
    // independent JVM twin: collect the band histogram (vocab-sized at
    // this SF) and fold the ladder by hand
    val hist = Dedup.bandedSig(
        Dedup.minhashSigWithSource(spark, dir).drop("source"))
      .groupBy("band_id", "band_hash").agg(count(lit(1)).as("df"))
      .collect().map(_.getLong(2))
    val expect = Dedup.bandCapLadder.map { c =>
      val kept = hist.filter(_ <= c).map(d => d * (d - 1) / 2).sum
      val hot = hist.count(_ > c).toLong
      c -> (kept, hot)
    }.toMap
    val got = Dedup.qVerifyCost(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    assert(got.keySet == Dedup.bandCapLadder.toSet)
    val cap = Dedup.bandCap(spark, dir)
    got.foreach { case (c, (cand, hot, fits, chosen)) =>
      assert((cand, hot) == expect(c), s"ladder rung $c diverged")
      assert((fits == 1) == (cand <= Dedup.LshCandBudget))
      assert((chosen == 1) == (c == cap),
        s"chosen flag must mark bandCap's selection ($cap) at rung $c")
    }
    // fixture law: the ladder HEAD is selected at every fixture SF —
    // the adaptivity changed no fixture answer (zero oracle churn)
    assert(cap == Dedup.BandBucketCap,
      s"fixture must select the ladder head, got $cap")
  }

  test("a zero candidate budget forces the ladder TAIL and the capped " +
      "band-pair plan drops hot buckets whole — pairs ⊆ the default " +
      "frame's (the spec-forced route on a small fixture)") {
    assert(Dedup.bandCap(spark, dir, budget = 0L) ==
      Dedup.bandCapLadder.last)
    val tight = Dedup.bandPairsPlanCapped(spark, dir, budget = 0L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = Dedup.qMinhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(dflt),
      "tightening the cap must only DROP candidates, never invent them")
    // and the tight frame honors its budget exactly: Σ C(df,2) over
    // admitted buckets at the tail rung bounds the emitted pair count
    val tailKept = Dedup.qVerifyCost(spark, dir)
      .filter(col("cap") === Dedup.bandCapLadder.last)
      .head().getLong(1)
    assert(tight.size <= tailKept,
      "emitted pairs cannot exceed the rung's exact candidate count")
  }

  test("bandCap memo lifecycle (the ADVICE_r10/r11 class): same frame " +
      "instance hits the memo; an invalidated signature frame " +
      "re-derives, same cap on an unchanged corpus") {
    val cap0 = Dedup.bandCap(spark, dir)
    val d0 = Dedup.bandCapDerivations.get()
    assert(Dedup.bandCap(spark, dir) == cap0)
    assert(Dedup.bandCapDerivations.get() == d0,
      "a second call on the same frame instance must hit the memo")
    MaterializeOnce.invalidate()
    assert(Dedup.bandCap(spark, dir) == cap0,
      "an unchanged corpus re-derives the same cap")
    assert(Dedup.bandCapDerivations.get() == d0 + 1,
      "a rebuilt signature frame is a NEW instance and must re-derive")
  }

  test("q_nhcb_rate_q == a JVM recomputation of quantile∘increase from " +
      "the NHCB bucket frame (reset rule + clamp + linear interpolation)") {
    val nc = graft.operators.NativeHistogram.qNativeCustom(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.map { case (_, v) => v }.toSeq).toMap
    val winSec = 3600L
    val bounds = Seq(500L, 2000L, 8000L, 20000L)
    val expect = scala.collection.mutable.Map[
      (String, Long, Long, Long), (Long, Double)]()
    for (((name, uid, w), next) <- nc;
         prev <- nc.get((name, uid, w - winSec))) {
      val totN = next.map(_._3).sum
      val totP = prev.map(_._3).sum
      val reset = if (totN < totP) 1L else 0L
      val pm = prev.map(b => (b._1, b._2) -> b._3).toMap
      val inc = next.map { case (idx, le, cn) =>
        val i = if (reset == 1L) cn
                else math.max(cn - pm.getOrElse((idx, le), 0L), 0L)
        (idx, le, i)
      }.filter(_._3 > 0L).sortBy(_._1)
      val tot = inc.map(_._3).sum
      if (tot > 0L) for (phi <- Seq(50L, 90L)) {
        val rk = tot.toDouble * phi / 100.0
        var cum = 0L
        val hit = inc.find { case (_, _, i) => cum += i; cum >= rk }.get
        val (idx, le, i) = hit
        val qv =
          if (le == -1L) bounds.last.toDouble
          else {
            val lo = if (idx == 0L) 0L else bounds(idx.toInt - 1)
            lo.toDouble + (le - lo).toDouble * ((rk - (cum - i).toDouble) / i.toDouble)
          }
        expect((name, uid, w, phi)) =
          (reset, BigDecimal(qv / 100.0)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = graft.operators.NativeHistogram.qNhcbRateQ(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(got.nonEmpty && got.keySet == expect.keySet,
      s"key sets diverge: missing=${(expect.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expect.keySet).take(3)}")
    got.foreach { case (k, (reset, qv)) =>
      val (er, eq) = expect(k)
      assert(reset == er, s"reset flag diverged at $k")
      assert(math.abs(qv - eq) < 1e-9, s"q_value diverged at $k: $qv vs $eq")
    }
  }

  test("q_contam_delta == a JVM rollup of the cross-neardup pairs by " +
      "base source (rides the probe output, no new scan)") {
    val pairs = Dedup.qCrossNeardup(spark, dir)
      .filter(col("is_neardup") === 1)
      .select("doc_id", "base_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.groupBy(p => srcOf(p._2)).map { case (s, ps) =>
      s -> (ps.map(_._2).distinct.length.toLong,
        ps.map(_._1).distinct.length.toLong, ps.length.toLong)
    }
    val got = Dedup.qContamDelta(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect && got.nonEmpty,
      s"contamination delta diverged: $got vs $expect")
  }

  test("q_host_dedup == a JVM rollup over (host, fp) with the share " +
      "window and the 10% governance cap") {
    import graft.functions.Portable.hash60Jvm
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val rows = docs.map { case (_, text, source) =>
      val host = text.split(" ", -1)(0) + "." + source + ".example"
      val fp = hash60Jvm(
        text.toLowerCase.replaceAll("[ \t\n\r\f]+", " ").trim)
      (host, fp)
    }
    val total = rows.length.toLong
    val expect = rows.groupBy(_._1).map { case (h, rs) =>
      val n = rs.length.toLong
      val d = rs.map(_._2).distinct.length.toLong
      val share = n * 1000000L / total
      h -> (n, d, n - d, (n - d) * 1000000L / n, share,
        if (share > Dedup.HostSharePpmCap) 1 else 0)
    }
    val got = Dedup.qHostDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(got == expect && got.nonEmpty,
      s"host rollup diverged (sample got=${got.take(2)} " +
        s"expect=${expect.take(2)})")
  }

  test("q_shard_balance == a JVM rollup of the q_shard_order " +
      "assignment, and the ppm deviations sum to ~0 per measure") {
    import graft.functions.Portable.hash60Jvm
    val docs = Tables.documents(spark, dir)
      .select("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byShard = docs.groupBy { case (t, _) =>
      hash60Jvm("epoch0:" + t) % 16 }
    val totDocs = docs.length.toLong
    val totChars = docs.map(_._2).sum
    val expect = byShard.map { case (sh, ds) =>
      val n = ds.length.toLong
      val c = ds.map(_._2).sum
      sh -> (n, c, n * 16L * 1000000L / totDocs - 1000000L,
        c * 16L * 1000000L / totChars - 1000000L)
    }
    val got = graft.operators.TextAnalysis.qShardBalance(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect && got.size == 16,
      s"shard balance diverged: ${got.toSeq.sortBy(_._1).take(3)} vs " +
        s"${expect.toSeq.sortBy(_._1).take(3)}")
    // consistency with the shard ORDER operator: same assignment rule
    val orderShards = graft.operators.TextAnalysis.qShardOrder(spark, dir)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(orderShards == got.view.mapValues(_._1).toMap,
      "balance must audit exactly q_shard_order's assignment")
  }

  test("q_trade_volume == a JVM recomputation of the Q7 bloc rollup") {
    val nations = Set("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    val nName = Tables.nation(spark, dir).collect()
      .map(r => r.getAs[Number]("n_nationkey").longValue() ->
        r.getAs[String]("n_name")).toMap
    val suppN = Tables.supplier(spark, dir).collect()
      .map(r => r.getAs[Number]("s_suppkey").longValue() ->
        nName(r.getAs[Number]("s_nationkey").longValue())).toMap
    val custN = Tables.customer(spark, dir).collect()
      .map(r => r.getAs[Number]("c_custkey").longValue() ->
        nName(r.getAs[Number]("c_nationkey").longValue())).toMap
    val orderCust = Tables.orders(spark, dir).collect()
      .map(r => r.getAs[Number]("o_orderkey").longValue() ->
        r.getAs[Number]("o_custkey").longValue()).toMap
    val expect = scala.collection.mutable.Map[
      (String, String, Long), (Long, Long)]()
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount").collect().foreach { r =>
      val ship = r.getAs[java.sql.Timestamp]("l_shipdate").toLocalDateTime
      if (ship.getYear == 1996 || ship.getYear == 1997) {
        val sn = suppN(r.getAs[Number]("l_suppkey").longValue())
        val cn = custN(orderCust(r.getAs[Number]("l_orderkey").longValue()))
        if (nations(sn) && nations(cn) && sn != cn) {
          val rev = math.round(r.getAs[Double]("l_extendedprice") * 100) *
            (100L - math.round(r.getAs[Double]("l_discount") * 100))
          val k = (sn, cn, ship.getYear.toLong)
          val (a, b) = expect.getOrElse(k, (0L, 0L))
          expect(k) = (a + rev, b + 1L)
        }
      }
    }
    val got = graft.operators.Olap.qTradeVolume(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == expect.toMap && got.nonEmpty,
      s"Q7 rollup diverged: $got vs $expect")
  }

  test("annPlanes sizes the sign-LSH bucket space with the corpus " +
      "(r12 — the r7 constant-K law): fixture SFs select the floor 6 " +
      "(zero oracle churn); a 200k-vector corpus selects 13") {
    // every fixture SF must keep the legacy 6-plane space — that is
    // what guarantees the adaptive rework changed no oracle answer
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
      assert(graft.operators.Similarity.annPlanes(spark, d) == 6,
        s"fixture $d must select the plane floor")
    // a probe-scale corpus grows the space: P = bit_length(ceil(n/32)-1)
    import spark.implicits._
    val big = tmpDir("ann_planes_big")
    spark.range(200000).select(col("id").as("vec_id"),
        typedLit(Seq(1.0f, 2.0f)).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    assert(graft.operators.Similarity.annPlanes(spark, big) == 13,
      "200k vectors → ceil(200k/32)=6250 → bit_length(6249)=13 planes")
  }

  test("preflight memo is a materialized frame now (ADVICE_r11): the " +
      "verdict survives repeated calls and re-derives after " +
      "invalidation — no (session, dir)-keyed strong map remains") {
    val pf0 = Dedup.preflight(spark, dir)
    assert(Dedup.preflight(spark, dir) == pf0,
      "repeated preflight calls must serve the same verdict")
    MaterializeOnce.invalidate() // models in-place fixture regeneration
    assert(Dedup.preflight(spark, dir) == pf0,
      "an unchanged corpus re-derives the same verdict")
    // the memo must live in the MaterializeOnce registry, not a
    // private strong map — grep-level proof in source
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Dedup.scala")),
      "UTF-8")
    assert(!src.contains("preflightCache"),
      "the strong (SparkSession, dir)-keyed preflight cache must be gone")
  }
}
