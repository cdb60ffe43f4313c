package graft

import org.apache.spark.sql.functions._

/** Round-13 operator twins + the ADVICE_r12 regression pins. */
class Round13OperatorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("kernel assignment == the flat-argmax JVM brute twin at " +
      "K = 100, tiebreaks included (r13 — the sf100 embed-probe n·K " +
      "row-explosion fix keeps EXACT flat semantics)") {
    import spark.implicits._
    import graft.operators.Similarity
    val d = tmpDir("asgkernel_corpus")
    val dim = 4
    val n = 500
    val rnd = new scala.util.Random(42)
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextInt(2001) / 1000.0f - 1.0f)))
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // a K=100 book (beyond any fixture K): quantized first-100 vectors
    val q = vecs.map { case (id, e) =>
      (id, e.map(x => math.round(x * 1000).toLong)) }
    val book = q.take(100).map { case (id, qv) =>
      (id, qv, math.max(1L, qv.map(x => x * x).sum)) }
    val cents = book.toDF("cell", "qc", "nc")
    val got = Similarity.assignedToBook(spark, d, cents)
      .select("vec_id", "cell", "ccos").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def cos(a: Seq[Long], na: Long, b: Seq[Long], nb: Long): Double =
      a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        math.sqrt((na * nb).toDouble)
    val expect = q.map { case (id, qv) =>
      val na = qv.map(x => x * x).sum
      val best = book.map { case (c, qc, nc) =>
        (cos(qv, na, qc, nc), -c, c) }.max
      id -> (best._3, best._1)
    }.toMap
    assert(got == expect,
      "kernel assignment diverged from the flat brute twin")
    graft.operators.MaterializeOnce.invalidate()
  }

  test("bands-search kernel == the relational bucket self-join " +
      "row-exact (r13 — per-bucket local top-3 provably preserves " +
      "the global top-3)") {
    import graft.operators.Similarity
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val kernel = Similarity.qAnnLshBandsPlan(spark, d).collect()
        .map(r => (r.getLong(0), r.getInt(3)) ->
          (r.getLong(1), r.getDouble(2))).toMap
      val rel = Similarity.annLshBandsRelationalTwin(spark, d).collect()
        .map(r => (r.getLong(0), r.getInt(3)) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(kernel.nonEmpty && kernel == rel,
        s"bands kernel diverged from the relational twin at $d")
    }
  }

  test("bucket-local union-find == the generic CC loop row-exact on " +
      "the embed pair graph (r13 — components are bucket-disjoint by " +
      "construction, so clustering needs no iteration)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.expressions.Window
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val kernel = graft.operators.Similarity
        .qDedupEmbedClusters(spark, d).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      val generic = graft.operators.Dedup.connectedComponents(
        graft.operators.Similarity.embedPairsPlan(spark, d)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("label")))
        .collect()
        .map(r => r.getAs[Long]("node") ->
          (r.getAs[Long]("label"), r.getAs[Long]("cluster_size"),
            r.getAs[Long]("node") == r.getAs[Long]("label"))).toMap
      assert(kernel.nonEmpty && kernel == generic,
        s"kernel clustering diverged from the CC loop at $d")
    }
  }

  test("vecCount memo is WEAK (ADVICE_r12): a corpus regenerated in " +
      "place with a different vector count re-derives the plane count " +
      "after invalidation — no (session, dir) strong map remains") {
    import spark.implicits._
    val d = tmpDir("vec_memo")
    def gen(n: Long): Unit =
      spark.range(n).select(col("id").as("vec_id"),
          typedLit(Seq(1.0f, 2.0f)).as("embedding"), lit(0).as("label"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    gen(200000)
    assert(graft.operators.Similarity.annPlanes(spark, d) == 13)
    // regenerate IN PLACE with a fixture-scale count; the memo must
    // follow the materialized-frame lifecycle, not pin the old count
    gen(100)
    graft.operators.MaterializeOnce.invalidate()
    assert(graft.operators.Similarity.annPlanes(spark, d) == 6,
      "a stale plane count would silently diverge from the oracle's " +
        "scalar-subquery recount")
    // source-level proof: no strong ConcurrentHashMap keyed by
    // (SparkSession, String) remains around vecCount
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/operators/Similarity.scala")))
    val cnt = src.substring(src.indexOf("private val countCache"),
      src.indexOf("def vecCount") + 600)
    assert(cnt.contains("WeakHashMap"),
      "countCache must stay weakly keyed by the frame instance")
  }
}
