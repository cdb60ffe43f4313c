package graft

import graft.operators.{Dedup, DocPipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end spec for the composed training-set writer: accounting
  * identities, membership correctness against the operators it
  * composes, per-shard position contract, and bit-identical rerun
  * determinism (the resume-safety property).
  */
class DocPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pipeline writes exactly the rule-kept, near-dedup-winning docs") {
    val out = tmpDir("docpipe")
    val s = DocPipeline.run(spark, dir, out, shards = 8)

    // accounting identities
    assert(s.nDocs == Tables.documents(spark, dir).count())
    assert(s.nRuleDropped + s.nDsirDropped + s.nNearDupDropped + s.nWritten
      == s.nDocs)
    // this corpus is digit-free, so redaction must be a observed no-op
    assert(s.nRedacted == 0)

    // membership: keep ∧ dsir-keep ∧ not-near-dup-loser, independently
    val keepIds = TextAnalysis.qFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
      .join(TextAnalysis.qDsir(spark, dir)
        .filter(col("importance") > 0).select("doc_id"), "doc_id")
    val losers = Dedup.connectedComponents(
      Dedup.qDedupNgram(spark, dir).select("doc_a", "doc_b"))
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"))
    val expected = keepIds.join(losers, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val written = spark.read.parquet(out)
    val got = written.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"written set diverges: " +
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")

    // per shard, pos is exactly 1..n (the trainer's read contract)
    val bad = written.groupBy("shard").agg(
      count(lit(1)).as("n"), max("pos").as("mx"),
      countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.count() == 0, "positions must be gapless per shard")

    // rerun determinism: same corpus + salt → identical rows
    val out2 = tmpDir("docpipe2")
    DocPipeline.run(spark, dir, out2, shards = 8)
    val again = spark.read.parquet(out2)
    assert(written.exceptAll(again).count() == 0 &&
      again.exceptAll(written).count() == 0,
      "rerun must be bit-identical")
  }
}
