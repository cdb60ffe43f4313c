package graft

import org.apache.spark.sql.functions._

/** Round-13 operator twins + the ADVICE_r12 regression pins. */
class Round13OperatorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

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
