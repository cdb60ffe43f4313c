package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{Dedup, MetricsEtl, Similarity}

/** Independent JVM cross-checks for the fourth round-9 operator batch
  * (q_alert_for / q_simhash_pairs / q_bbit_minhash / q_mmr), same
  * convention as Round6 through 9c: each result is re-derived from the
  * raw parquet by a from-scratch JVM computation sharing no formulation
  * with the Spark plan or the oracle SQL. The MMR twin replays the
  * greedy selection imperatively (a loop over picked-so-far), so an
  * error in the unrolled join formulation would fail here.
  */
class Round9dOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def roundL(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ---- q_alert_for ------------------------------------------------------

  test("q_alert_for == imperative rule-evaluator replay") {
    val evs = Tables.events(spark, dir)
      .selectExpr("event_type", "user_id", "event_id", "unix_micros(ts)",
        "CAST(round(value * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // instant vector at each eval step: last sample (by ts, event_id)
    // among those whose floored step is within the 3-step lookback
    val instant = evs
      .flatMap { case (n, u, ev, ts, c) =>
        val s0 = Math.floorDiv(ts, 600000000L)
        (s0 to s0 + 2).map(s => ((n, u, s), (ts, ev, c)))
      }
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).maxBy(t => (t._1, t._2))._3 }
    // per series: consecutive-true runs over the step grid
    val expected = instant.toSeq
      .filter(_._2 > 5000L)
      .groupBy { case ((n, u, _), _) => (n, u) }
      .flatMap { case ((n, u), xs) =>
        val steps = xs.map { case ((_, _, s), c) => (s, c) }.sortBy(_._1)
        var runStart = Long.MinValue
        var prev = Long.MinValue
        var held = 0
        steps.map { case (s, c) =>
          if (s == prev + 1) held += 1
          else { held = 1; runStart = s }
          prev = s
          val state = if (held >= 2) "firing" else "pending"
          (n, u, s * 600L, c, state, runStart * 600L)
        }
      }.toSet
    val got = MetricsEtl.qAlertFor(spark, dir).collect().map { r =>
      (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("eval_ts_s"), r.getAs[Long]("value_cents"),
        r.getAs[String]("state"), r.getAs[Long]("active_since_s"))
    }.toSet
    assert(got == expected)
    assert(expected.exists(_._5 == "firing"), "fixture must fire some alert")
    assert(expected.exists(_._5 == "pending"), "fixture must leave some pending")
  }

  // ---- q_simhash_pairs --------------------------------------------------

  test("q_simhash_pairs == from-scratch simhash + band buckets + Hamming") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val simOf: Map[Long, Long] = docs.map { case (id, ws) =>
      val cnt = ws.groupBy(identity).map { case (t, xs) => t -> xs.length }
      val bitSums = Array.fill(60)(0L)
      cnt.foreach { case (t, c) =>
        val h = hash60Jvm(t)
        (0 until 60).foreach { b =>
          bitSums(b) += (if (((h >> b) & 1L) == 1L) c else -c)
        }
      }
      id -> (0 until 60).map(b =>
        if (bitSums(b) > 0) 1L << b else 0L).sum
    }.toMap
    val bands = simOf.toSeq.flatMap { case (id, s) =>
      (0 until 4).map(b => (b.toLong, (s >> (15 * b)) & 32767L) -> id)
    }
    val expected = bands.groupBy(_._1).values
      .flatMap { ids0 =>
        val ids = ids0.map(_._2).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }
      .groupBy(identity)
      .map { case ((a, b), xs) =>
        val ham = java.lang.Long.bitCount(simOf(a) ^ simOf(b)).toLong
        (a, b, xs.size.toLong, ham, if (ham <= 7) 1 else 0)
      }.toSet
    val got = Dedup.qSimhashPairs(spark, dir).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared_bands"), r.getAs[Long]("hamming"),
        r.getAs[Int]("is_dup"))
    }.toSet
    assert(got == expected)
    assert(expected.exists(_._5 == 1), "planted near-dups must verify as dups")
    assert(expected.exists(_._5 == 0),
      "band buckets must also surface non-dup candidates at this SF")
  }

  // ---- q_bbit_minhash ---------------------------------------------------

  test("q_bbit_minhash == from-scratch 1-bit signature estimate") {
    val P = 2147483647L
    val mhA = (0 until 16).map(i => hash60Jvm(s"mh_a:$i") % (P - 1) + 1)
    val mhB = (0 until 16).map(i => hash60Jvm(s"mh_b:$i") % P)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    val shOf: Map[Long, Set[Long]] = docs.collect {
      case (id, ws) if ws.length >= 3 =>
        id -> ws.sliding(3).map(w => hash60Jvm(w.mkString(" "))).toSet
    }.toMap
    val sigOf = shOf.map { case (id, shs) =>
      val h30 = shs.map(_ % 1073741824L)
      id -> (0 until 16).map(i => h30.map(h => (h * mhA(i) + mhB(i)) % P).min)
    }
    val ids = shOf.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = ids(i); b = ids(j)
      inter = (shOf(a) & shOf(b)).size
      uni = (shOf(a) | shOf(b)).size
      jac = BigDecimal(inter.toDouble / uni)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.2
    } yield {
      val full = (0 until 16).count(k => sigOf(a)(k) == sigOf(b)(k)).toLong
      val bit = (0 until 16).count(k =>
        sigOf(a)(k) % 2 == sigOf(b)(k) % 2).toLong
      val exact = roundL(jac * 10000)
      val estFull = full * 625L
      val estBbit = math.max(0L, (bit * 2 - 16) * 625L)
      (a, b, exact, estFull, bit, estBbit,
        math.abs(estFull - exact), math.abs(estBbit - exact))
    }).toSet
    val got = Dedup.qBbitMinhash(spark, dir).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("exact_x10k"), r.getAs[Long]("est_full_x10k"),
        r.getAs[Long]("bit_agree"), r.getAs[Long]("est_bbit_x10k"),
        r.getAs[Long]("err_full_x10k"), r.getAs[Long]("err_bbit_x10k"))
    }.toSet
    assert(got == expected)
    assert(expected.nonEmpty, "threshold pairs must exist at this SF")
  }

  // ---- q_mmr ------------------------------------------------------------

  test("q_mmr == imperative greedy MMR over the brute-force top-5") {
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect().map { r =>
        val q = r.getAs[scala.collection.Seq[Float]](1)
          .map(x => math.round(x.toDouble * 1000)).toArray
        r.getLong(0) -> (q, q.map(x => x * x).sum)
      }.toMap
    def cosRaw(a: Long, b: Long): Double = {
      val (qa, na) = vecs(a); val (qb, nb) = vecs(b)
      qa.indices.map(i => qa(i) * qb(i)).sum.toDouble /
        math.sqrt((na * nb).toDouble)
    }
    def cosM(a: Long, b: Long): Long = roundL(round6(cosRaw(a, b)) * 1000000)
    val expected = vecs.keys.filter(_ < 50).flatMap { v =>
      // rank by the RAW cosine (the engine's window order), THEN
      // integer-scale the round-6 value for scoring
      val top5 = vecs.keys.filter(_ != v).toSeq
        .map(n => n -> cosRaw(v, n))
        .sortBy { case (n, c) => (-c, n) }.take(5)
        .map { case (n, c) => n -> roundL(round6(c) * 1000000) }
      val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      picked += ((top5.head._1, top5.head._2, top5.head._2 * 7))
      (2 to 3).foreach { pick =>
        val best = top5
          .filterNot(c => picked.exists(_._1 == c._1))
          .map { case (n, rel) =>
            val maxSim = picked.map(p => cosM(n, p._1)).max
            (n, rel, rel * 7 - maxSim * 3)
          }
          .maxBy { case (n, _, mmr) => (mmr, -n) }
        picked += best
      }
      picked.zipWithIndex.map { case ((n, rel, mmr), i) =>
        (v, i + 1, n, rel, mmr)
      }
    }.toSet
    val got = Similarity.qMmr(spark, dir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("pick"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rel_x1m"),
        r.getAs[Long]("mmr_x1m"))
    }.toSet
    assert(got == expected)
    // diversity must actually bite somewhere: some query's pick-2 is
    // NOT its relevance-rank-2 neighbor
    val relRank2 = vecs.keys.filter(_ < 50).map { v =>
      v -> vecs.keys.filter(_ != v).toSeq.map(n => n -> cosRaw(v, n))
        .sortBy { case (n, c) => (-c, n) }.apply(1)._1
    }.toMap
    assert(expected.exists { case (v, pick, n, _, _) =>
      pick == 2 && relRank2(v) != n
    }, "MMR must reorder at least one query vs pure relevance")
  }
}
