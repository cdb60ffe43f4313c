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

  test("pre-flight routes the near-dup stage to LSH at saturation " +
      "(VERDICT_r08 item 4) — and the routed run matches on this fixture") {
    // the healthy default: this corpus's join cost sits far under the
    // budget, so the pipeline takes (and reports) the exact path
    val outExact = tmpDir("docpipe_exact")
    val sExact = DocPipeline.run(spark, dir, outExact, shards = 8)
    assert(sExact.nearDupRoute == "exact")
    val pf = Dedup.preflight(spark, dir)
    assert(!pf.routeToLsh && pf.joinRows > 0,
      s"fixture should be healthy: $pf")

    // force saturation (budget 0 — every corpus routes): the pipeline
    // must take the LSH cluster feed and say so
    val outLsh = tmpDir("docpipe_lsh")
    val sLsh = DocPipeline.run(spark, dir, outLsh, shards = 8,
      maxJoinRows = 0L)
    assert(sLsh.nearDupRoute == "lsh")
    // on the planted fixture the banded clusters equal the exact ones
    // (the q_dedup_clusters_lsh recall claim), so the routed run's
    // output is bit-identical — the route changes the COST, not the
    // answer, exactly what makes it safe to wire into a harness
    val a = spark.read.parquet(outExact)
    val b = spark.read.parquet(outLsh)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "routed run must match the exact run on the planted fixture")
  }

  test("ingestShard (r11): one decision per shard doc, verdicts equal " +
      "the exact + persisted-band sources, re-delivery is idempotent " +
      "and reuses the base index") {
    val root = tmpDir("docpipe_shard_idx")
    val (dec, s) = DocPipeline.ingestShard(spark, dir, root)
    val rows = dec.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(s.nShardDocs == rows.size.toLong && s.nShardDocs > 0)
    assert(s.nKept == rows.values.count(_._3 == 1).toLong)
    // verdict sources: exact from qCrossDedup, near from the probe
    val exact = Dedup.qCrossDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val near = graft.index.BandIndex.probe(spark, dir, root)
      .filter(org.apache.spark.sql.functions.col("is_neardup") === 1)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { case (id, (e, n, k)) =>
      assert(e == exact(id), s"exact verdict diverged for $id")
      assert((n == 1) == near.contains(id), s"near verdict diverged for $id")
      assert((k == 1) == (e == 0 && n == 0))
    }
    // re-delivery: same decisions, zero extra index builds
    val before = graft.index.BandIndex.builds.get()
    val (dec2, s2) = DocPipeline.ingestShard(spark, dir, root)
    assert(graft.index.BandIndex.builds.get() == before,
      "re-delivery must not rebuild the base buckets")
    assert(s2 == s.copy(indexRoot = s2.indexRoot))
    assert(dec2.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap == rows,
      "re-delivered decisions must be identical (idempotent ingest)")
  }

  test("ingestShard honors a NON-default shardSource (r12, ADVICE_r11: " +
      "the exact rule used to hardcode src0 while the probe judged the " +
      "caller's shard)") {
    val root = tmpDir("docpipe_shard_src1")
    val (dec, s) = DocPipeline.ingestShard(spark, dir, root,
      shardSource = "src1")
    val shardIds = Tables.documents(spark, dir)
      .filter(col("source") === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val decided = dec.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(decided == shardIds && shardIds.nonEmpty,
      "every decision must judge a src1 doc — exactly the ingested shard")
    // exact verdicts come from the src1-parameterized rule
    val exact = Dedup.crossDedupFor(spark, dir, "src1").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    dec.collect().foreach { r =>
      assert(r.getInt(1) == exact(r.getLong(0)),
        s"exact verdict diverged for ${r.getLong(0)}")
    }
    assert(s.nShardDocs == shardIds.size.toLong)
  }
}
