package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BPE trainer spec: known-corpus merge order, greedy-frequency
  * invariants, determinism, and agreement with the single-round
  * statistic (q_bpe_merge).
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("first learned merge equals the q_bpe_merge argmax") {
    val merges = TextAnalysis.bpeTrain(spark, dir, rounds = 1)
    assert(merges.size == 1)
    val top = TextAnalysis.qBpeMerge(spark, dir).limit(1).collect().head
    val pair = merges.head.left + merges.head.right
    assert(pair == top.getAs[String]("pair"),
      s"round-0 merge $pair != single-round statistic ${top.getAs[String]("pair")}")
    assert(merges.head.freq == top.getAs[Long]("freq"))
  }

  test("merge frequencies are non-increasing in a greedy trainer and merges compose") {
    val merges = TextAnalysis.bpeTrain(spark, dir, rounds = 5)
    assert(merges.size == 5)
    // greedy: a later round can never find a pair MORE frequent than an
    // earlier round's choice (merging only removes/reshapes pairs around
    // the merged ones; total corpus mass never grows)
    merges.sliding(2).foreach { case Seq(a, b) =>
      assert(b.freq <= a.freq, s"greedy order violated: $a then $b")
    }
    // learned symbols compose from earlier merges or single chars: every
    // side is either length 1 or a previously produced merge token
    val produced = scala.collection.mutable.Set.empty[String]
    merges.foreach { m =>
      assert(m.left.length == 1 || produced.contains(m.left),
        s"left side ${m.left} of round ${m.round} has no provenance")
      assert(m.right.length == 1 || produced.contains(m.right),
        s"right side ${m.right} of round ${m.round} has no provenance")
      produced += (m.left + m.right)
    }
    // determinism: rerun produces the identical merge table
    val again = TextAnalysis.bpeTrain(spark, dir, rounds = 5)
    assert(again == merges, "trainer must be deterministic")
  }

  test("bpeEncode round-trips: lossless, monotone compression, rank order") {
    val merges = TextAnalysis.bpeTrain(spark, dir, rounds = 5)
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val tokens = TextAnalysis.bpeEncode(w, merges)
      assert(tokens.mkString == w, s"encoding of '$w' must be lossless")
      assert(tokens.size <= w.length)
      // zero merges = character split
      assert(TextAnalysis.bpeEncode(w, Seq.empty).mkString == w)
      assert(TextAnalysis.bpeEncode(w, Seq.empty).size == w.length)
      // more merges can only compress further (prefix property of the
      // rank-ordered greedy table)
      (0 to merges.size).sliding(2).foreach { case Seq(k, k2) =>
        assert(TextAnalysis.bpeEncode(w, merges.take(k2)).size <=
          TextAnalysis.bpeEncode(w, merges.take(k)).size)
      }
    }
  }
}
