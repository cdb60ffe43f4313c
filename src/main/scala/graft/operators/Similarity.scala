package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.C):
  * brute-force cosine top-k as the correctness baseline, sign-LSH
  * bucketed ANN as the scale path.
  *
  * Engine-parity design: embeddings are float32; float summation order
  * differs between engines, so cosine is computed over QUANTIZED integer
  * vectors (`round(x*1000)` per element → BIGINT). Dot products and
  * norms are then exact integer arithmetic — order-independent and
  * bit-identical in Spark and DuckDB — and only the final
  * `dot/sqrt(na*nb)` touches floating point, with identical operands on
  * both sides. That makes top-k ordering and the rounded cosine
  * hash-stable, i.e. fully oracle-verifiable.
  */
object Similarity {

  /** Quantized embeddings with integer squared-norm. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))

  private val quantizedSql: String =
    """q0 AS (SELECT vec_id,
      |        list_transform(embedding,
      |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |       FROM embeddings),
      |qn AS (SELECT vec_id, q,
      |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
      |       FROM q0)""".stripMargin

  /** Exact cosine between two quantized vectors (integer dot / sqrt of
    * integer norm product — double math only at the very end). */
  private def cosine(qa: Column, qb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      .cast("double") / sqrt((na * nb).cast("double"))

  /** q_embed_cosine_topk — brute-force cosine top-5 for a deterministic
    * query set (every 10th vec_id) against the full corpus. This is the
    * CORRECTNESS baseline: the query set is bounded (|Q| ≪ n) so the
    * join is |Q|·n, not n² — at scale you broadcast the query set and
    * stream the corpus past it in one pass; for full all-pairs top-k use
    * q_ann_lsh. Ties broken by neighbor_id for determinism.
    */
  def qEmbedCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val a = v.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(a).crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qa"), col("qb"), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  val embedCosineTopkSql: String =
    s"""WITH $quantizedSql,
       |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |       CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |         i -> a.q[i] * b.q[i])) AS DOUBLE)
       |         / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |      FROM qn a, qn b
       |      WHERE a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id)
       |SELECT vec_id, neighbor_id, round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p QUALIFY rn <= 5""".stripMargin

  /** q_ann_lsh — sign-LSH approximate nearest neighbors: 4 deterministic
    * pseudo-random hyperplanes (weights = hash60("p:i") mod 2001 − 1000),
    * sign bits → 16 buckets, exact cosine top-3 WITHIN bucket. This is
    * the scale path for all-pairs similarity: the only join is an
    * equality join on `bucket` (hash-partitioned); per-bucket work is
    * (n/2^planes)² — planes tune the recall/cost tradeoff, and at 100 TB
    * you add bands (multiple independent plane sets) for recall, exactly
    * like MinHash banding.
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    // per (vec, plane): dot with the plane's weight vector → sign bit
    val planeW = transform(sequence(lit(0), lit(63)),
      i => hash60(concat(col("p").cast("string"), lit(":"), i.cast("string")))
        % 2001 - 1000)
    val bucketed = v
      .withColumn("p", explode(sequence(lit(0), lit(3))))
      .withColumn("dotp",
        aggregate(zip_with(col("q"), planeW, (x, w) => x * w),
          lit(0L), (acc, x) => acc + x))
      .withColumn("bitv",
        when(col("dotp") >= 0, lit(1L)).otherwise(lit(0L)))
      .groupBy("vec_id")
      .agg(sum(expr("shiftleft(bitv, CAST(p AS INT))")).as("bucket"))
    val withB = v.join(bucketed, "vec_id")
    val a = withB.select(col("vec_id"), col("bucket"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = withB.select(col("vec_id").as("neighbor_id"),
      col("bucket").as("bucket_b"), col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b, col("bucket") === col("bucket_b") &&
        col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qa"), col("qb"), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("bucket"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  val annLshSql: String = {
    val wExpr = hash60Sql("CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH $quantizedSql,
       |bp AS (SELECT vec_id, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn, (SELECT unnest(generate_series(0, 3)) AS p) planes),
       |bk AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id),
       |vb AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |p2 AS (SELECT a.vec_id AS vec_id, a.bucket AS bucket,
       |        b.vec_id AS neighbor_id,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |       FROM vb a JOIN vb b
       |         ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT vec_id, bucket, neighbor_id, round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p2 QUALIFY rn <= 3""".stripMargin
  }
}
