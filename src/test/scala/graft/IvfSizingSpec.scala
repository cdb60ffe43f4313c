package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Adaptive IVF cell sizing (r7, from the sf1.0 probe): with K a
  * constant the in-cell exact search is (n/K)² per cell — measured
  * 12.7× for 10× data before the fix. The effective cell count is now
  * max(16, ⌊√(n/8)⌋): 16 at every fixture SF (oracle rows unchanged —
  * the driver gate pins that), growing with √n beyond so the
  * all-corpus search follows the n^1.5 IVF law. This spec pins BOTH
  * regimes end-to-end through q_ivf_cells (whose row count IS the
  * effective K).
  */
class IvfSizingSpec extends SparkSpec {

  test("fixture SFs stay at K=16 (oracle-parity regime)") {
    // sf0.001 has ~20 vectors; sqrt(20/8) << 16 → the floor wins
    val k = Similarity.qIvfCells(spark, "/root/testdata/sf0.001")
      .select(countDistinct("cell")).head().getLong(0)
    assert(k == 16L, s"expected 16 cells, got $k")
  }

  test("beyond fixture scale K grows as floor(sqrt(n/8))") {
    import spark.implicits._
    // 3200 vectors → K = max(16, floor(sqrt(400))) = 20
    val dir = tmpDir("ivf-sizing")
    val d = 8
    (0 until 3200).map { i =>
      (i.toLong, Array.tabulate(d)(j => ((i * 31 + j * 7) % 100) / 100.0f),
        i % 10)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = Similarity.qIvfCells(spark, dir)
      .select(countDistinct("cell")).head().getLong(0)
    assert(k == 20L, s"expected 20 cells at n=3200, got $k")
  }
}
