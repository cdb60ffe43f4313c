package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-14 operator twins: the re-rank cost table and the dedup
  * precision audit (VERDICT_r13 item 6), each recomposed independently
  * in the JVM from already-spec'd building blocks. */
class Round14OperatorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_rerank_cost == the JVM twin over the served ANN frame + " +
      "whitespace token counts (r14)") {
    // Spark split(text, ' ') keeps trailing empties (limit −1) — the
    // JVM twin must match that convention exactly
    val toks = Tables.documents(spark, dir).select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .toMap
    val served = Similarity.qAnnIvf(spark, dir)
      .select("vec_id", "neighbor_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(served.nonEmpty)
    val expect = served
      .map { case (v, nb, rn) => (rn.toLong, toks(v) + toks(nb) + 3L) }
      .groupBy(_._1).map { case (rn, xs) =>
        val seqs = xs.map(_._2)
        rn -> (seqs.size.toLong, seqs.sum, seqs.map(s => s * s).sum,
          seqs.max)
      }
    val got = Similarity.qRerankCost(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == expect,
      "re-rank cost table diverged from the JVM twin")
  }

  test("q_dedup_precision == the JVM twin: hash-ordered sample of the " +
      "LSH candidates, exact J from q_lsh_verify, estimate from the " +
      "signature frame (r14)") {
    val cand = SparkEntry.queries("q_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val samp = cand.sortBy { case (a, b) =>
      (graft.functions.Portable.hash60Jvm(s"${a}_$b"), a, b) }
      .take(Dedup.PrecisionSampleK)
    assert(samp.nonEmpty)
    val jacc = SparkEntry.queries("q_lsh_verify")(spark, dir)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sigs = Dedup.minhashSigPlan(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (0 until 16).map(i => r.getLong(i + 1)).toVector).toMap
    val expect = samp.map { case (a, b) =>
      val m = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      (m, jacc((a, b)))
    }.groupBy(_._1).map { case (m, xs) =>
      val js = xs.map(_._2)
      val nTrue = js.count(_ >= 0.2).toLong
      m -> (m * 625L, js.size.toLong, nTrue,
        nTrue * 1000000L / js.size,
        js.map(j => math.round(j * 10000)).sum)
    }
    val got = Dedup.qDedupPrecision(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect,
      "precision audit diverged from the JVM twin")
  }
}
