package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Convergence shapes for the shared connected-components fixpoint
  * (Dedup.connectedComponents): the VERDICT_r04 chain-pathology fix.
  * Plain 1-hop min-label propagation needs diameter-many rounds, so the
  * old 20-round cap would THROW on a chain-shaped duplicate graph
  * (serial crawl dumps where doc i pairs only with doc i+1). The
  * pointer-doubling shortcut that engages from round 5 must converge
  * such graphs in ~4 + log₂(diameter) rounds, while clique-shaped
  * graphs (the common near-dup case) keep converging in the cheap
  * early rounds.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain of diameter 600 (30x the old cap) converges to min label") {
    val chain = (0L until 600L).map(i => (i, i + 1))
    val labels = labelsOf(chain)
    assert(labels.size == 601)
    assert(labels.values.forall(_ == 0L),
      s"non-min labels: ${labels.filter(_._2 != 0L).take(5)}")
  }

  test("mixed shapes: chain + clique + pair resolve independently") {
    val chain = (1000L until 1100L).map(i => (i, i + 1))
    val clique = for {
      a <- 0L until 10L; b <- (a + 1) until 10L
    } yield (a, b)
    val pair = Seq((5000L, 4999L))
    val labels = labelsOf(chain ++ clique ++ pair)
    assert((1000L to 1100L).forall(labels(_) == 1000L))
    assert((0L until 10L).forall(labels(_) == 0L))
    assert(labels(4999L) == 4999L && labels(5000L) == 4999L)
  }

  test("binary-tree component (log-depth, high fanout) gets one label") {
    // nodes 1..255, edges parent(i)=i/2 — diameter ~14, fanout mixed
    val tree = (2L until 256L).map(i => (i / 2, i))
    val labels = labelsOf(tree)
    assert(labels.size == 255)
    assert(labels.values.forall(_ == 1L))
  }

  test("edge direction does not matter (reversed chain)") {
    val reversed = (0L until 80L).map(i => (i + 1, i)) // b < a on every row
    val labels = labelsOf(reversed)
    assert(labels.values.forall(_ == 0L))
  }
}
