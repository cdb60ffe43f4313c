package graft

import graft.operators.{Dedup, NativeHistogram, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the round-9 operator batch, same
  * convention as Round6 through 8: from-scratch re-derivations on the raw
  * parquet (collected at sf0.001). The wide-schema index math is
  * checked against EXACT BigInt v^(2^s) arithmetic — the computation
  * the engine's int64 boundary-table device exists to avoid — so the
  * twin is independent in the strongest sense; q_edit_verify replays
  * its own Wagner–Fischer DP; the migrate/custom agreement pins the
  * decumulation identity on the real fixture.
  */
class Round9OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventCents: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  /** EXACT ⌈2^s·log₂ pos⌉ via BigInt — materializes pos^(2^s). */
  private def exactIdx(pos: Long, schema: Int): Long =
    if (pos <= 1) 0L
    else if (schema <= 0) {
      val i0 = 64L - java.lang.Long.numberOfLeadingZeros(pos - 1)
      val d = 1L << (-schema)
      (i0 + d - 1) / d
    } else
      BigInt(pos).pow(1 << schema).-(1).bitLength.toLong

  test("q_native_wide == exact BigInt ceil(2^s log2 v) on the real fixture") {
    val expected = eventCents.flatMap { case (name, user, tsUs, cents) =>
      val w = tsUs / 1000000L / 3600L * 3600L
      val sgn = java.lang.Long.signum(cents).toLong
      val pos = math.abs(cents)
      NativeHistogram.WideSchemas.map { s =>
        ((name, user, w, s.toLong, sgn,
          if (sgn == 0) 0L else exactIdx(pos, s)), 1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = NativeHistogram.qNativeWide(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) -> r.getLong(6)
    }.toMap
    assert(got == expected,
      s"diff: ${(expected.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("wide boundary tables are exact: B^(2^s) <= 2^(40*2^s+j) < (B+1)^(2^s)") {
    for (s <- Seq(2, 4, 8)) {
      val bs = NativeHistogram.wideBounds(s)
      val twoS = 1 << s
      assert(bs.size == twoS - 1)
      bs.zipWithIndex.foreach { case (b, i) =>
        val j = i + 1
        val target = BigInt(2).pow(40 * twoS + j)
        assert(BigInt(b).pow(twoS) <= target &&
          BigInt(b + 1).pow(twoS) > target,
          s"schema $s boundary $j is not the exact floor: $b")
      }
      // strictly increasing across the octave
      assert(bs == bs.sorted && bs.distinct == bs)
    }
  }

  test("q_nhcb_migrate decumulation == q_native_custom on populated buckets") {
    val custom = NativeHistogram.qNativeCustom(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(5))
    }.toMap
    val migrate = NativeHistogram.qNhcbMigrate(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(6))
    }.toMap
    // every populated custom bucket appears in the migrated layout with
    // the same bound and count; migrated-only rows are exactly the
    // zero-count dense padding
    custom.foreach { case (k, (le, cnt)) =>
      assert(migrate.get(k).contains((le, cnt)),
        s"$k: custom ($le, $cnt) vs migrate ${migrate.get(k)}")
    }
    migrate.foreach { case (k, (_, cnt)) =>
      if (!custom.contains(k))
        assert(cnt == 0L, s"migrate-only bucket $k must be zero-count")
    }
    // and the dense layout really is dense: |bounds|+1 rows per window
    val perWindow = NativeHistogram.qNhcbMigrate(spark, dir)
      .groupBy("name", "user_id", "w_start").count().collect()
    assert(perWindow.nonEmpty &&
      perWindow.forall(_.getLong(3) == NativeHistogram.CustomBounds.size + 1))
  }

  test("q_native_rate == JVM adjacent-window scalar twin (reset rule)") {
    val perW = eventCents.groupBy { case (n, u, tsUs, _) =>
      (n, u, tsUs / 1000000L / 3600L * 3600L)
    }.view.mapValues { rows =>
      (rows.size.toLong, rows.map(_._4).sum)
    }.toMap
    val expected = perW.flatMap { case ((n, u, w), (cnt, sm)) =>
      perW.get((n, u, w - 3600L)).map { case (pc, ps) =>
        val reset = if (cnt < pc) 1L else 0L
        val dc = if (reset == 1L) cnt else cnt - pc
        val ds = if (reset == 1L) sm else sm - ps
        def div(x: Long, d: Long): Long =
          if (x >= 0) x * 1000000L / d else -((-x) * 1000000L / d)
        (n, u, w, reset, div(dc, 3600L), div(ds, 360000L))
      }
    }.toSet
    val got = NativeHistogram.qNativeRate(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected,
      s"diff: ${(expected -- got).take(3)} vs ${(got -- expected).take(3)}")
  }

  test("q_edit_verify == JVM Wagner-Fischer on the banded candidates") {
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length).toLong
    }
    val texts = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Dedup.qEditVerify(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6))).toSet
    assert(got.nonEmpty, "the planted fixture must yield candidates")
    got.foreach { case (a, b, dist, ppm, isDup) =>
      val (ta, tb) = (texts(a), texts(b))
      val want = lev(ta, tb)
      assert(dist == want, s"($a,$b): engine $dist != JVM $want")
      val wantPpm = want * 1000000L / math.max(math.max(ta.length, tb.length), 1)
      assert(ppm == wantPpm && isDup == (if (wantPpm <= 200000L) 1L else 0L))
    }
    // the planted near-dup pairs must actually verify as edit-dups
    assert(got.exists(_._5 == 1L), "planted dups should pass the 20% rule")
  }

  test("q_mix_temperature == JVM weight twin; weights order as the theory says") {
    val toks = Tables.documents(spark, dir).select("source", "text")
      // split with limit -1: Spark's split KEEPS trailing empty tokens,
      // Java's default drops them — match the engine
      .collect().map(r =>
        (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val bySrc = toks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totT = bySrc.values.sum
    val isq = bySrc.view.mapValues(n => math.sqrt(n.toDouble).floor.toLong).toMap
    val totI = isq.values.sum
    val n = bySrc.size.toLong
    val got = TextAnalysis.qMixTemperature(spark, dir).collect().map(r =>
      r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == bySrc.keySet)
    got.foreach { case (s, (nt, is, w1, wh, w0)) =>
      assert(nt == bySrc(s) && is == isq(s))
      assert(w1 == nt * 1000000L / totT && wh == is * 1000000L / totI &&
        w0 == 1000000L / n)
    }
    // temperature flattens: the largest source's share must not grow
    // as alpha drops, the smallest source's must not shrink
    val largest = bySrc.maxBy(_._2)._1
    val smallest = bySrc.minBy(_._2)._1
    val (_, _, l1, lh, l0) = got(largest)
    val (_, _, s1, sh, s0) = got(smallest)
    assert(l1 >= lh && lh >= l0 - 1, s"largest: $l1 >= $lh >= ~$l0")
    assert(s1 <= sh + 1 && sh <= s0 + 1, s"smallest: $s1 <= $sh <= ~$s0")
  }

  test("q_contam_embed == JVM argmax twin over the benchmark slice") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map { r =>
        val q = r.getAs[scala.collection.Seq[Float]](1)
          .map(x => math.round(x.toDouble * 1000)).toArray
        (r.getLong(0), q, q.map(x => x * x).sum)
      }
    val bench = vecs.filter(_._1 < 50)
    val expected = vecs.filter(_._1 >= 50).map { case (id, q, nrm) =>
      val best = bench.map { case (bid, qb, nb) =>
        (bid, q.indices.map(i => q(i) * qb(i)).sum.toDouble
          / math.sqrt((nrm * nb).toDouble))
      }.minBy { case (bid, c) => (-c, bid) }
      val c6 = BigDecimal(best._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, best._1, c6, if (c6 >= 0.95) 1L else 0L)
    }.toSet
    val got = Similarity.qContamEmbed(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expected,
      s"diff: ${(expected -- got).take(3)} vs ${(got -- expected).take(3)}")
  }
}
