package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for the round-9 closing operator batch
  * (q_cms_topk / q_ndcg / q_ann_filtered), same convention as Round6
  * through 9b: from-scratch re-derivations on the raw parquet collected
  * at sf0.001, no Spark expressions in the twin path. The NDCG twin
  * recomputes the discount weights from the formula itself
  * (round(10⁶/log₂(i+1))) rather than reading the engine's constants,
  * so a typo in the plan-time table would fail here.
  */
class Round9cOperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (vec_id, label, quantized, norm) off the raw fixture — the same
    * ×1000 integer quantization the engine plans. */
  private def vecs: Array[(Long, Long, Array[Long], Long)] =
    Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding").collect().map { r =>
        val q = r.getAs[scala.collection.Seq[Float]](2)
          .map(x => math.round(x.toDouble * 1000)).toArray
        (r.getLong(0), r.getInt(1).toLong, q, q.map(x => x * x).sum)
      }

  private def cos(qa: Array[Long], na: Long, qb: Array[Long], nb: Long)
      : Double =
    qa.indices.map(i => qa(i) * qb(i)).sum.toDouble /
      math.sqrt((na * nb).toDouble)

  /** Brute-force (query → ranked neighbor list) for the vec_id<50 query
    * set: (neighbor_id, cos) sorted by (cos desc, neighbor_id). */
  private def rankedLists(corpus: Array[(Long, Long, Array[Long], Long)])
      : Map[Long, Seq[(Long, Double)]] =
    vecs.filter(_._1 < 50).map { case (v, _, qa, na) =>
      v -> corpus.filter(_._1 != v).map { case (n, _, qb, nb) =>
        (n, cos(qa, na, qb, nb))
      }.sortBy(t => (-t._2, t._1)).toSeq
    }.toMap

  test("q_cms_topk == JVM sketch twin (and the estimate is one-sided)") {
    val toks = Tables.documents(spark, dir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val exact = toks.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    // 3×64 sketch: bucket(t, j) = hash60(t ∥ "#j") mod 64
    val sketch = scala.collection.mutable.Map[(Int, Long), Long]()
    exact.foreach { case (t, c) =>
      (0 until 3).foreach { j =>
        val b = hash60Jvm(t + "#" + j) % 64
        sketch((j, b)) = sketch.getOrElse((j, b), 0L) + c
      }
    }
    val est = exact.map { case (t, c) =>
      (t, (0 until 3).map(j => sketch((j, hash60Jvm(t + "#" + j) % 64))).min, c)
    }.toSeq
    val expected = est.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
      .map { case ((t, e, c), i) => (t, i + 1L, e, c, e - c) }.toSet
    val got = TextAnalysis.qCmsTopk(spark, dir).collect().map(r =>
      (r.getString(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // CMS error is ONE-SIDED: every estimate ≥ its exact count
    assert(got.forall { case (_, _, e, c, over) => e >= c && over == e - c })
  }

  test("q_ndcg == JVM twin with weights re-derived from the formula") {
    val w = (1 to 5).map(i => math.round(1e6 / (math.log(i + 1) / math.log(2))))
    val idcg = w.scanLeft(0L)(_ + _)
    val labels = vecs.map(v => v._1 -> v._2).toMap
    val expected = rankedLists(vecs).map { case (v, ranked) =>
      val rels = ranked.take(5).zipWithIndex.map { case ((n, _), i) =>
        (i + 1, if (labels(n) == labels(v)) 1L else 0L)
      }
      val nRel = rels.map(_._2).sum
      val dcg = rels.map { case (rn, rel) => rel * w(rn - 1) }.sum
      val firstRel = rels.find(_._2 == 1L).map(_._1)
      (v, nRel, dcg, idcg(nRel.toInt),
        if (idcg(nRel.toInt) == 0) 0L else dcg * 1000000L / idcg(nRel.toInt),
        firstRel.map(1000000L / _).getOrElse(0L))
    }.toSet
    val got = Similarity.qNdcg(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("q_ann_filtered == JVM pre-filter twin; starvation flag matches") {
    val even = vecs.filter(v => v._2 % 2 == 0)
    val top5 = rankedLists(vecs).map { case (v, ranked) =>
      v -> ranked.take(5).map(_._1).toSet
    }
    val expected = rankedLists(even).flatMap { case (v, ranked) =>
      ranked.take(3).zipWithIndex.map { case ((n, c), i) =>
        (v, n,
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          i + 1L, if (top5(v).contains(n)) 1L else 0L)
      }
    }.toSet
    val got = Similarity.qAnnFiltered(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong,
        r.getLong(4))).toSet
    assert(got == expected)
  }
}
