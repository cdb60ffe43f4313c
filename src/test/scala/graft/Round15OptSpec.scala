package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r15 OPTIMIZATION equivalence pins (the Round14OptSpec discipline):
  * each rewrite claims bit-identical results; these tests re-express
  * the PRE-r15 plan shape inline and assert frame equality on the
  * fixture, so a drift in the optimized form fails loudly and the
  * blame is local (the oracle gate would also catch it).
  */
class Round15OptSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("AnnIndex.queryTiers == a per-tier AnnIndex.query call, " +
      "row-exact at every tier (r15 — q_probe_served's one-scan form)") {
    val root = graft.index.AnnIndex.ensure(spark, dir)
    val queries = Tables.fanOut(Tables.embeddings(spark, dir))
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val tiers = Seq(1, 2, 4)
    val got = rows(graft.index.AnnIndex
      .queryTiers(spark, root, queries, tiers, k = 5))
    val old = tiers.map { np =>
      graft.index.AnnIndex.query(spark, root, queries, nprobe = np, k = 5)
        .select(col("query_id"), lit(np).as("np"), col("cell"),
          col("neighbor_id"), col("cosine"), col("rn"))
    }.reduce(_ unionByName _)
    assert(got === rows(old))
  }

  test("q_dup_span: pinned against an inline re-expression (r15 — the " +
      "materialize-once variant was measured SLOWER and reverted; this " +
      "pin guards whatever form ships)") {
    val got = operators.Dedup.qDupSpan(spark, dir)
    // the reference plan, re-expressed inline: raw positioned shingles
    // with the corpus-wide df window and stop cap applied per consumer
    val wdoc = Window.partitionBy("doc_id").orderBy("pos")
    val sp = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .withColumn("w2", lead("word", 1).over(wdoc))
      .withColumn("w3", lead("word", 2).over(wdoc))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), col("pos"),
        graft.functions.Portable.hash60(
          concat_ws(" ", col("word"), col("w2"), col("w3"))).as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("df") <= 1000).drop("df")
    val pairs = sp.as("a").join(sp.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("diag"), col("a.pos").as("pos_a"))
    val wDiag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    val old = pairs
      .withColumn("island", col("pos_a") - row_number().over(wDiag))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("doc_a", "doc_b")
      .agg(max("run_len").as("max_run"), sum("run_len").as("n_shared"))
      .filter(col("max_run") >= 5)
      .select(col("doc_a"), col("doc_b"), col("max_run"),
        (col("max_run") + 2).as("span_words"), col("n_shared"))
    assert(rows(got) === rows(old))
  }

  test("q_contam_delta rides q_cross_neardup's materialized probe " +
      "frame — values identical to a fresh BandIndex probe (r15)") {
    val got = rows(operators.Dedup.qCrossNeardup(spark, dir))
    val fresh = rows(graft.index.BandIndex.probe(spark, dir,
      graft.index.BandIndex.ensure(spark, dir)))
    assert(got === fresh)
  }
}
