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
  *
  * Hot-path design: per-pair math uses `zip_with`/`aggregate` lambdas.
  * Measured against a fully unrolled d-term `GetArrayItem` expression
  * tree on the 2.5M-pair loop at sf0.1, the lambda form is FASTER
  * (1.1 s vs 1.9–3.4 s) and far more stable: the unrolled tree
  * generates huge classes whose Janino+JIT compilation dominates and
  * destabilizes one-shot runs. LSH plane weights are plan-time literal
  * arrays (see [[Similarity#planeWeights]]) — the naive per-element
  * `hash60` evaluation costs more than the dot products themselves.
  * The embedding dimension is probed once at plan time (a one-row job)
  * to size the weight literals.
  */
object Similarity {

  /** Embedding dimension, probed ONCE per (session, dir) from the first
    * row and memoized — a data constant, so repeated plan builds must
    * not re-run the one-row job. (Plain computeIfAbsent is safe here:
    * the probe never nests back into this map.) */
  private val dimCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Integer]()
  private def dim(spark: SparkSession, dir: String): Int =
    dimCache.computeIfAbsent((spark, dir), _ =>
      Tables.embeddings(spark, dir)
        .select(size(col("embedding")).as("d")).head().getInt(0)).intValue()

  import graft.functions.LongVectorDot.vecDot

  /** MATERIALIZE-ONCE shared frames (VERDICT_r06 item 5): the quantized
    * corpus, the per-variant LSH bucket assignments and the three ANN
    * result frames q_ann_recall composes are each computed once per
    * (session, dir) and shared — before this, ~10 Similarity queries
    * re-quantized the corpus per call and q_ann_recall re-derived both
    * LSH variants AND the brute-force ground truth standalone. Safe to
    * nest (buckets build on quantized) since MaterializeOnce never runs
    * a build under its map lock. */
  private def materializeOnce(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame =
    MaterializeOnce(spark, dir, "sim:" + tag)(build)

  /** Test hook: drop all materialized frames (forces recomputation). */
  private[graft] def invalidateMaterialized(): Unit = MaterializeOnce.invalidate()

  /** Test hook: drop the memoized data-constant probes (dim, count,
    * fingerprint) — models a FRESH session over a corpus directory that
    * was regenerated in place (specs only; a real deployment's new
    * session starts with these empty). */
  private[graft] def invalidateProbes(): Unit = {
    dimCache.clear(); countCache.clear(); fpCache.clear()
  }

  /** Quantized embeddings with integer squared-norm — one narrow row
    * per corpus vector, materialized once per (session, dir). */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "quantized")(quantizedPlan(spark, dir))

  private[graft] def quantizedPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.embeddings(spark, dir)).select(
      col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm", vecDot(col("q"), col("q")))

  private val quantizedSql: String =
    """q0 AS (SELECT vec_id,
      |        list_transform(embedding,
      |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |       FROM embeddings),
      |qn AS (SELECT vec_id, q,
      |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
      |       FROM q0)""".stripMargin

  /** Integer dot product of two quantized vectors — the native codegen'd
    * [[graft.functions.LongVectorDot]] expression: a primitive long loop
    * inside whole-stage codegen, vs the interpreted
    * `aggregate(zip_with(...))` composition it replaces. */
  private def dot(qa: Column, qb: Column): Column = vecDot(qa, qb)

  /** Exact cosine from integer dot and norms (double math only at the
    * very end, identical operands in both engines). */
  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt((na * nb).cast("double"))

  /** Fixed size of the brute-force query set. A CONSTANT, not a corpus
    * fraction: `vec_id < QuerySetSize` selects at most this many vectors
    * no matter how large the corpus grows, so the broadcast side is O(K)
    * bytes and the pair count is K·n — linear in the corpus. (The round-2
    * form, `vec_id % 10 == 0`, kept 1/10 of the corpus: an O(n) broadcast
    * and O(n²/10) pairs — a scale-killer at 100×.) */
  private val QuerySetSize = 50

  /** q_contam_embed — EMBEDDING-SPACE decontamination (r9): for every
    * corpus vector, the nearest vector of the BENCHMARK set (the
    * [[QuerySetSize]]-bounded held-out slice, vec_id < 50 — a
    * plan-time constant set, never a corpus fraction) and a ≥ 0.95
    * cosine contamination verdict — the semantic complement of the
    * n-gram q_bench_leakage: paraphrased benchmark rows share no
    * 13-grams but sit next to the benchmark in embedding space.
    * Broadcast-K argmax over one corpus scan (the IVF assignment
    * shape); verdict compares the 6-decimal-rounded cosine so both
    * engines threshold the identical double. */
  def qContamEmbed(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val bench = v.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("bench_id"), col("q").as("qb"),
        col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("bench_id"))
    v.filter(col("vec_id") >= QuerySetSize)
      .crossJoin(broadcast(bench))
      .withColumn("cos",
        cosine(dot(col("q"), col("qb")), col("nrm"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("bench_cosine", round(col("cos"), 6))
      .select(col("vec_id"), col("bench_id"), col("bench_cosine"),
        (col("bench_cosine") >= 0.95).cast("long").as("is_contam"))
  }

  val contamEmbedSql: String =
    s"""WITH $quantizedSql,
       |bench AS (SELECT vec_id AS bench_id, q AS qb, nrm AS nb FROM qn
       |          WHERE vec_id < $QuerySetSize),
       |p AS (SELECT qn.vec_id, bench.bench_id,
       |        CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |          i -> qn.q[i] * bench.qb[i])) AS DOUBLE)
       |          / sqrt(CAST(qn.nrm * bench.nb AS DOUBLE)) AS cos
       |      FROM qn, bench WHERE qn.vec_id >= $QuerySetSize),
       |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos DESC, bench_id) AS rn
       |      FROM p)
       |SELECT vec_id, bench_id, round(cos, 6) AS bench_cosine,
       |       CAST(CASE WHEN round(cos, 6) >= 0.95 THEN 1 ELSE 0 END
       |         AS BIGINT) AS is_contam
       |FROM r WHERE rn = 1""".stripMargin

  /** q_embed_cosine_topk — brute-force cosine top-5 for a deterministic
    * FIXED-SIZE query set (vec_id < [[QuerySetSize]]) against the full
    * corpus. This is the CORRECTNESS baseline: |Q| is a plan-time
    * constant so the join is K·n, not n² — the query side is a
    * constant-size broadcast and the corpus streams past it in one scan;
    * for corpus-wide all-pairs top-k use q_ann_lsh. Ties broken by
    * neighbor_id for determinism.
    */
  def qEmbedCosineTopk(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "embed_topk")(qEmbedCosineTopkPlan(spark, dir))

  /** The raw brute-force plan ([[PlanAuditSpec]] audits this — the
    * registered query returns the materialized frame, whose executed
    * plan is just an RDD scan). Result is |Q|·5-bounded, so caching it
    * is free; q_ann_recall reuses it as ground truth. */
  private[graft] def qEmbedCosineTopkPlan(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val a = v.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(a).crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
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
       |      WHERE a.vec_id < $QuerySetSize AND a.vec_id <> b.vec_id)
       |SELECT vec_id, neighbor_id, round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p QUALIFY rn <= 5""".stripMargin

  /** FLOOR of the LSH hyperplane count → 2^planes buckets; the
    * effective count is [[annPlanes]], which grows with log₂(n) so the
    * bucket space tracks the corpus (the ivfK device). */
  private val NPlanes = 6

  /** Target per-bucket population for the adaptive plane count. */
  private val TargetBucketVecs = 32L

  /** Adaptive hyperplane count (r12 — the r7 constant-K law landing on
    * the sign-LSH space): the smallest P with 2^P ≥ ⌈n/32⌉, floored at
    * [[NPlanes]], so expected bucket population stays ≤ ~32 and the
    * in-bucket self-join totals ~16·n pairs — LINEAR — instead of the
    * n²/2^6 a constant plane count degenerates to (measured: the
    * ann_lsh_bands frame build was 701 s at sf10 — 200k vectors over a
    * fixed 64-bucket space ≈ 600M join rows; a second decade would be
    * 100× that). Integer-exact in BOTH engines — P = max(6,
    * bit_length(⌈n/32⌉ − 1)), the NativeHistogram idx0 bit-length
    * device, no floating log — and the oracle computes the same P with
    * a scalar-subquery bound on its plane generate_series
    * ([[annPlanesSql]]). Every fixture SF selects 6 (zero oracle
    * churn); sf10 selects 13 (8,192 buckets). Per-pair collision
    * probability falls as P grows — the documented sign-LSH recall
    * tradeoff; [[NBands]] is the recall dial and q_ann_recall measures
    * it. */
  private[graft] def annPlanes(spark: SparkSession, dir: String): Int = {
    val m = (vecCount(spark, dir) + TargetBucketVecs - 1) / TargetBucketVecs
    math.max(NPlanes,
      if (m <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L))
  }

  /** The oracle's scalar twin of [[annPlanes]] — embeds as the upper
    * bound of the plane generate_series. */
  private val annPlanesSql: String =
    s"(SELECT GREATEST($NPlanes, CASE WHEN m <= 1 THEN 0 " +
      "ELSE length(bin(m - 1)) END) " +
      s"FROM (SELECT (COUNT(*) + ${TargetBucketVecs - 1}) // " +
      s"$TargetBucketVecs AS m FROM embeddings))"

  /** Plane weights as PLAN-TIME constants: w(p)(i) = hash60("p:i") mod
    * 2001 − 1000, computed on the JVM once and embedded as literals in
    * the codegen'd plan. (Evaluating the md5 per (vector, plane, dim)
    * element at runtime — the naive form — costs more than the dot
    * products themselves.) The oracle recomputes the same values from
    * the same formula in SQL. */
  private def planeWeights(d: Int, planes: Int): Array[Array[Long]] =
    Array.tabulate(planes, d)((p, i) => hash60Jvm(s"$p:$i") % 2001 - 1000)

  /** Hot-bucket guard for the LSH self-joins: cap bucket membership
    * before pairing (quadratic otherwise if one bucket degenerates —
    * e.g. many zero-ish vectors land in bucket 0). Mirrored in the
    * oracle SQL; no-op at test SF where buckets hold ~n/64 vectors. */
  private val maxBucket = 10000
  private def capBuckets(v: DataFrame): DataFrame =
    v.withColumn("bsz", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("bsz") <= maxBucket).drop("bsz")

  /** q_ann_lsh — sign-LSH approximate nearest neighbors: 6 deterministic
    * pseudo-random hyperplanes, sign bits → 64 buckets, exact cosine
    * top-3 WITHIN bucket. This is the scale path for all-pairs
    * similarity: the bucket is computed IN-ROW (no join, no explode —
    * one codegen'd projection over the scan), and the only join is an
    * equality join on `bucket` (hash-partitioned) with capped bucket
    * membership; per-bucket work is (n/2^planes)². At 100 TB you add
    * bands (multiple independent plane sets) for recall, exactly like
    * MinHash banding.
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "ann_lsh")(qAnnLshPlan(spark, dir))

  /** The capped single-plane-set bucket assignment (vec_id, bucket, q,
    * nrm) — ONE in-row projection + membership cap shared by
    * [[qAnnLshPlan]] and [[embedPairsPlan]] (identical bucket formula),
    * materialized once per (session, dir). Corpus-row-bounded. */
  private def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "lsh_buckets") {
      val d = dim(spark, dir)
      val planes = annPlanes(spark, dir)
      val pw = planeWeights(d, planes)
      val planeDot = (p: Int) =>
        dot(col("q"), typedLit(pw(p).toSeq))
      val bucket = (0 until planes)
        .map(p => when(planeDot(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce(_ + _)
      capBuckets(quantized(spark, dir).withColumn("bucket", bucket))
    }

  private[graft] def qAnnLshPlan(spark: SparkSession, dir: String): DataFrame = {
    val v = lshBuckets(spark, dir)
    val a = v.select(col("vec_id"), col("bucket"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("neighbor_id"),
      col("bucket").as("bucket_b"), col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b, col("bucket") === col("bucket_b") &&
        col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("bucket"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  /** Number of independent LSH plane sets (bands) in the multi-probe
    * variant. Recall grows like 1−(1−p)^B for a pair with per-band
    * collision probability p; cost grows linearly in B. */
  private val NBands = 2

  /** Per-band plane weights — independent pseudo-random sets, seeded
    * like [[planeWeights]] but namespaced by band. */
  private def bandPlaneWeights(band: Int, d: Int,
      planes: Int): Array[Array[Long]] =
    Array.tabulate(planes, d)((p, i) =>
      hash60Jvm(s"b$band:$p:$i") % 2001 - 1000)

  /** q_ann_lsh_bands — multi-probe sign-LSH ANN: [[NBands]] INDEPENDENT
    * hyperplane sets, each hashing every vector to its own bucket
    * space; candidates = union of same-(band,bucket) pairs, deduped,
    * exact cosine top-3 over the union. This is the recall dial
    * q_ann_lsh documents, implemented: pairs split by one band's
    * hyperplanes get a second chance in the other band — MinHash-style
    * banding for the embedding space. All buckets are computed IN-ROW
    * (2·NPlanes codegen'd integer dots per vector, zero joins), the
    * pair join stays equality-keyed on (band, bucket), and the pair
    * dedup is a groupBy on 8-byte ids — every stage linear-shuffled,
    * nothing all-pairs.
    */
  def qAnnLshBands(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "ann_lsh_bands")(qAnnLshBandsPlan(spark, dir))

  /** The capped per-band bucket assignment (vec_id, band, bucket, q,
    * nrm) — NBands rows per vector, materialized once per
    * (session, dir). */
  private def bandBuckets(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "band_buckets") {
      val d = dim(spark, dir)
      val planes = annPlanes(spark, dir)
      val bucketExprs = (0 until NBands).map { band =>
        val pw = bandPlaneWeights(band, d, planes)
        (0 until planes)
          .map(p => when(dot(col("q"), typedLit(pw(p).toSeq)) >= 0,
            lit(1L << p)).otherwise(lit(0L)))
          .reduce(_ + _)
      }
      val vb = quantized(spark, dir)
        .withColumn("bks", array(bucketExprs: _*))
        .select(col("vec_id"), col("q"), col("nrm"),
          posexplode(col("bks")).as(Seq("band", "bucket")))
      vb.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
        .filter(col("bsz") <= maxBucket).drop("bsz")
    }

  /** The bands search plan: a per-(band, bucket) JVM kernel emitting
    * each member's LOCAL top-3 (r13 — the last heavy constant of the
    * sf100 embed probe): the relational bucket self-join materialized
    * every candidate ROW carrying both 64-long arrays (~120M × ~1 KB
    * at 2M vectors — 697 s, linear per decade but the dominant build
    * of the whole family). The kernel deserializes each bucket's
    * members once inside `flatMapGroups`, runs the same pairwise
    * integer-dot/IEEE-cosine loop, and emits ≤ 3 narrow candidate
    * rows per member — per-bucket top-3 provably PRESERVES the global
    * top-3 (any neighbor beaten by 3 same-bucket candidates is beaten
    * by 3 global candidates; duplicates across bands carry identical
    * cos), so the relational tail (dedup max + global top-3 window) is
    * unchanged and the output is row-exact == the relational form
    * (spec'd in `Round13OperatorSpec` against
    * [[annLshBandsRelationalTwin]]). Per-task state is one bucket's
    * members — bounded by the bandBuckets hot-bucket cap, the same
    * bound the join form had. Measured: 697 → 29 s at 2M vectors. */
  private[graft] def qAnnLshBandsPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val d0 = dim(spark, dir)
    val planes = annPlanes(spark, dir)
    // plane weights as a plain JVM array closed over by the kernel —
    // the relational bandBuckets form evaluated 2·planes vecDot
    // expressions per row, and EACH reference to the cached `q` column
    // re-copies the array out of the columnar cache (32 copies × 512 B
    // per row = the 581 s stage the stage-log attributed at 2M
    // vectors); here the vector deserializes once and both bands'
    // sign bits come from one tight loop
    val pw: Array[Array[Array[Long]]] = Array.tabulate(NBands)(band =>
      bandPlaneWeights(band, d0, planes))
    val cap = maxBucket
    bandBuckets0(spark, dir, pw, planes)
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, it) =>
        // the hot-bucket cap, group-side: an over-cap bucket drops
        // WHOLE — exactly the relational window-count filter. Bounded
        // buffering (ADVICE_r13): at most cap+1 members are ever held;
        // once exceeded the rest of the iterator drains WITHOUT being
        // stored (a saturated bucket — r10 measured 18% of the corpus
        // in one band value — must not buffer the whole group as
        // per-task state the way it.toArray did).
        val buf = new scala.collection.mutable.ArrayBuffer[
          (Long, Array[Long], Long)]()
        var over = false
        while (it.hasNext) {
          val (_, _, id, q, nrm) = it.next()
          if (!over) {
            buf += ((id, q.toArray, nrm))
            if (buf.length > cap) { over = true; buf.clear() }
          }
        }
        val m = if (over) Array.empty[(Long, Array[Long], Long)]
                else buf.toArray
        val n = m.length
        // per member: the 3 best (cos desc, neighbor asc) candidates
        val topC = Array.fill(n)(new Array[Double](3))
        val topN = Array.fill(n)(new Array[Long](3))
        val cnt = new Array[Int](n)
        def offer(i: Int, cos: Double, nb: Long): Unit = {
          val c = topC(i); val ids = topN(i)
          var k = cnt(i)
          if (k < 3) { c(k) = cos; ids(k) = nb; cnt(i) = k + 1; k += 1 }
          else if (cos > c(2) || (cos == c(2) && nb < ids(2))) {
            c(2) = cos; ids(2) = nb
          } else return
          // bubble the inserted tail entry into (cos desc, id asc) order
          var j = math.min(k, 3) - 1
          while (j > 0 && (c(j) > c(j - 1) ||
              (c(j) == c(j - 1) && ids(j) < ids(j - 1)))) {
            val tc = c(j); c(j) = c(j - 1); c(j - 1) = tc
            val tn = ids(j); ids(j) = ids(j - 1); ids(j - 1) = tn
            j -= 1
          }
        }
        var i = 0
        while (i < n) {
          val (ida, qa, na) = m(i)
          var j = i + 1
          while (j < n) {
            val (idb, qb, nb) = m(j)
            var dot = 0L
            var t = 0
            while (t < qa.length) { dot += qa(t) * qb(t); t += 1 }
            val cos = dot.toDouble / math.sqrt((na * nb).toDouble)
            offer(i, cos, idb)
            offer(j, cos, ida)
            j += 1
          }
          i += 1
        }
        (0 until n).iterator.flatMap { i =>
          (0 until cnt(i)).iterator.map(k => (m(i)._1, topN(i)(k), topC(i)(k)))
        }
      }
      .toDF("vec_id", "neighbor_id", "cos")
      // a pair found by both bands appears twice with an identical cos;
      // max() is just dedup (8-byte keys shuffle, vectors do not)
      .groupBy("vec_id", "neighbor_id").agg(max("cos").as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  /** (band, bucket, vec_id, q, nrm) via the JVM kernel — each corpus
    * vector deserializes once and both bands' sign bits come from one
    * tight loop over the closed-over plane weights; the bit rule is
    * the relational [[bandBuckets]] expression verbatim (dot ≥ 0 sets
    * bit p). UNCAPPED — the cap applies group-side in the consumer. */
  private def bandBuckets0(spark: SparkSession, dir: String,
      pw: Array[Array[Array[Long]]], planes: Int)
      : org.apache.spark.sql.Dataset[(Int, Long, Long, Seq[Long], Long)] = {
    import spark.implicits._
    quantized(spark, dir)
      .select(col("vec_id").cast("long"), col("q"), col("nrm").cast("long"))
      .as[(Long, Seq[Long], Long)]
      .mapPartitions { it =>
        it.flatMap { case (id, qSeq, nrm) =>
          val q = qSeq.toArray
          pw.indices.iterator.map { band =>
            var bucket = 0L
            var p = 0
            while (p < planes) {
              val wp = pw(band)(p)
              var dot = 0L
              var t = 0
              while (t < q.length) { dot += q(t) * wp(t); t += 1 }
              if (dot >= 0) bucket |= 1L << p
              p += 1
            }
            (band, bucket, id, qSeq, nrm)
          }
        }
      }
  }

  /** The r12 relational form, kept as the kernel's row-exact spec twin
    * (the simhash-kernel precedent). */
  private[graft] def annLshBandsRelationalTwin(spark: SparkSession,
      dir: String): DataFrame = {
    val vc = bandBuckets(spark, dir)
    val a = vc.select(col("vec_id"), col("band"), col("bucket"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = vc.select(col("vec_id").as("neighbor_id"),
      col("band").as("band_b"), col("bucket").as("bucket_b"),
      col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b, col("band") === col("band_b") &&
        col("bucket") === col("bucket_b") &&
        col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .groupBy("vec_id", "neighbor_id").agg(max("cos").as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  val annLshBandsSql: String = {
    val wExpr = hash60Sql(
      "'b' || CAST(b AS VARCHAR) || ':' || CAST(p AS VARCHAR)" +
        " || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH $quantizedSql,
       |bp AS (SELECT vec_id, b, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn,
       |         (SELECT unnest(generate_series(0, ${NBands - 1})) AS b) bands,
       |         (SELECT unnest(generate_series(0, $annPlanesSql - 1)) AS p) planes),
       |bk AS (SELECT vec_id, b AS band,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id, b),
       |vb0 AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.band, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |vb AS (SELECT * FROM vb0
       |       QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 10000),
       |p2 AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |        max(CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE))) AS cos
       |       FROM vb a JOIN vb b
       |         ON a.band = b.band AND a.bucket = b.bucket
       |        AND a.vec_id <> b.vec_id
       |       GROUP BY 1, 2)
       |SELECT vec_id, neighbor_id, round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p2 QUALIFY rn <= 3""".stripMargin
  }

  /** Minimum number of IVF coarse cells; the effective count is
    * [[ivfK]], which grows with √n — the classic IVF tradeoff
    * (assignment cost n·K vs per-cell search (n/K)²). */
  private val IvfCells = 16

  /** Corpus vector count, memoized WEAKLY by the materialized
    * quantized-frame INSTANCE (the bandCapCache lifecycle pattern,
    * ADVICE_r12): the count is a fact of that materialization, so
    * `invalidate()`/`release()` make the entry collectable and a
    * corpus regenerated in place re-derives — a strong (session, dir)
    * key would serve the stale count (and a stale [[annPlanes]] plan
    * shape) forever while the oracle's scalar subquery recounts.
    * The quantized frame is one row per corpus vector (no filter), so
    * counting it == counting embeddings, off the cached RDD. */
  private val countCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, java.lang.Long]())
  private def vecCount(spark: SparkSession, dir: String): Long = {
    val q = quantized(spark, dir)
    val cached = countCache.get(q)
    if (cached != null) cached.longValue()
    else { val n = q.count(); countCache.put(q, n); n }
  }

  /** Effective IVF cell count: max([[IvfCells]], ⌊√(n/8)⌋) — the
    * production √n sizing, as a plan-time constant probed from the
    * corpus. At the fixture SFs this stays 16 (oracle rows unchanged);
    * beyond, per-cell population stays ~√(8n) so the all-corpus in-cell
    * search totals n^1.5 — the IVF law — instead of the n²/K a constant
    * K degenerates to (measured: the r7 10× probe put constant-K
    * q_ann_ivf at 12.7× for 10× data). floor(sqrt(n/8.0)) is identical
    * IEEE double math in both engines (n exact, /8.0 a power-of-two
    * division, sqrt correctly rounded), so the oracle's scalar-subquery
    * twin computes the same K. */
  private def ivfK(spark: SparkSession, dir: String): Int =
    math.max(IvfCells,
      math.floor(math.sqrt(vecCount(spark, dir) / 8.0)).toInt)

  /** Oracle twin of [[ivfK]] as a scalar subquery over `qn`. */
  private val ivfKSql: String =
    s"(SELECT GREATEST($IvfCells, CAST(floor(sqrt(COUNT(*) / 8.0)) AS BIGINT)) FROM qn)"

  /** The SHARED oracle CTE chain for the IVF assignment (r13):
    * `cents` (the naive-seed book) → the flat argmax — [[
    * assignedToBook]]'s exact rule, (ccos desc, cell asc) — → `asg1` =
    * (vec_id, cell, q, nrm, ccos), one row per corpus vector.
    * Factored out of the seven per-query inline copies; assumes `qn`
    * is in scope. */
  private lazy val ivfAsgCtes: String = {
    val ccos = """CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |             i -> qn.q[i] * cents.qc[i])) AS DOUBLE)
       |             / sqrt(CAST(qn.nrm * cents.nc AS DOUBLE))"""
    s"""cents AS (SELECT vec_id AS cell, q AS qc, nrm AS nc FROM qn
       |          WHERE vec_id < $ivfKSql),
       |asg0 AS (SELECT qn.vec_id, cents.cell, qn.q, qn.nrm, $ccos AS ccos,
       |          row_number() OVER (PARTITION BY qn.vec_id
       |            ORDER BY $ccos DESC, cents.cell) AS crn
       |         FROM qn, cents),
       |asg1 AS (SELECT vec_id, cell, q, nrm, ccos FROM asg0
       |         WHERE crn = 1)""".stripMargin
  }

  /** Target SUB-CELL population for the in-cell SEARCH join — the
    * serve-side constant `c` that turns the search linear (VERDICT_r09
    * item 1). With √n-law cells the expected population is √(8n), so
    * Σ|cell|² totals n^1.5 — the suite's last measured superlinear term
    * (q_ann_ivf 522×, q_knn_classify 465× for 100× data at the r9 sf10
    * probe). [[ivfSubBitsFor]] splits each cell with just enough
    * data-blind sign-LSH bits that expected (cell, sub) population
    * stays ≤ this constant, making in-cell work ≈ n·c — LINEAR — while
    * the cell geometry (assignment, balance diagnostics, semdedup's
    * within-cell semantics) is untouched. Recall trade: τ-neighbors
    * split across sub-cells are unseen, the same dial as every banded
    * LSH stage here (add probe bands to buy recall back); at fixture
    * SFs (n ≤ 2000 → √(8n) ≤ 127 < 256) ZERO bits engage and results
    * are bit-identical to the unsplit search. */
  private val SubCellTarget = 256

  /** Sub-cell bit count for an n-vector corpus: the smallest b with
    * √(8n)/2^b ≤ [[SubCellTarget]], integer-exact on both engines —
    * m = ceil(sqrt(8.0·n)) is identical IEEE math (8n exact below 2⁵⁰,
    * sqrt correctly rounded, exact on perfect squares), the ceil-div u
    * and the ceil-log₂ are pure integer ops (JVM bit-length == SQL
    * ceil(log2) for u ≥ 2 because log2 is exact on powers of two). */
  private[graft] def ivfSubBitsFor(n: Long): Int = {
    val m = math.ceil(math.sqrt(8.0 * n)).toLong
    val u = (m + SubCellTarget - 1) / SubCellTarget
    if (u <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(u - 1)
  }

  private def ivfSubBits(spark: SparkSession, dir: String): Int =
    ivfSubBitsFor(vecCount(spark, dir))

  /** The (cell, sub) SEARCH key as one in-row projection over `q`:
    * `bits` sign-LSH hyperplanes (plan-time literal weights, namespaced
    * `ivfsub:` so they are independent of the q_ann_lsh planes), packed
    * into a long exactly like [[lshBuckets]]. `bits = 0` → constant 0
    * (every cell is one sub-cell — the fixture-scale identity). */
  private[graft] def ivfSubCol(d: Int, bits: Int): Column =
    if (bits == 0) lit(0L)
    else (0 until bits).map { p =>
      val w = typedLit(Array.tabulate(d)(i =>
        hash60Jvm(s"ivfsub:$p:$i") % 2001 - 1000).toSeq)
      when(vecDot(col("q"), w) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Oracle twins of the sub-cell machinery, shared by every in-cell
    * search SQL: `sb` computes the bit count from the corpus (the
    * [[ivfSubBitsFor]] formula), `sp` the per-vector sub key (empty at
    * 0 bits — consumers LEFT JOIN and coalesce to 0). */
  private val ivfSubSqlCtes: String = {
    val w = hash60Sql(
      "'ivfsub:' || CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""sb AS (SELECT CASE WHEN u <= 1 THEN CAST(0 AS BIGINT)
       |               ELSE CAST(ceil(log2(u)) AS BIGINT) END AS bits
       |       FROM (SELECT (CAST(ceil(sqrt(8.0 * COUNT(*))) AS BIGINT)
       |                     + ${SubCellTarget - 1}) // $SubCellTarget AS u
       |             FROM qn) uu),
       |sp AS (SELECT vec_id,
       |        SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p
       |            ELSE CAST(0 AS BIGINT) END) AS sub
       |       FROM (SELECT qn.vec_id, pl.p,
       |              CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |                i -> qn.q[i] * ($w % 2001 - 1000))) AS BIGINT) AS dotp
       |             FROM qn, (SELECT unnest(generate_series(0,
       |               CAST((SELECT bits FROM sb) AS INT) - 1)) AS p) pl) dp
       |       GROUP BY vec_id)""".stripMargin
  }

  /** q_ann_ivf — IVF-style approximate nearest neighbors, the OTHER
    * classic ANN scale path next to sign-LSH (q_ann_lsh):
    *
    *  1. coarse centroids: the first [[IvfCells]] vectors (deterministic
    *     seed choice — production would k-means them; the *structure*
    *     of the plan is identical) — a constant-size broadcast side
    *  2. assignment: every vector joins the K centroids (broadcast
    *     nested loop over a K-row side — n·K integer dot products in
    *     one codegen'd pass, no shuffle of the corpus), keeping the
    *     argmax-cosine cell with centroid-id tiebreak
    *  3. search: equality self-join on (cell, sub) (the only corpus
    *     shuffle, hash-partitioned on int keys), exact cosine top-3,
    *     with the SAME hot-bucket cap as the LSH variants. `sub` is the
    *     r10 linearizer (VERDICT_r09 item 1): under the √n cell law the
    *     per-cell population is √(8n), so the unsplit Σ|cell|² search
    *     totals n^1.5 — measured 522× for 100× data at the r9 sf10
    *     probe; [[ivfSubBitsFor]] splits each cell with just enough
    *     data-blind sign bits that expected (cell, sub) population
    *     stays ≤ [[SubCellTarget]], making search work n·c — linear.
    *     Zero bits engage at fixture SFs (results bit-identical); the
    *     cap remains the hot-key backstop
    *
    * vs q_ann_lsh: IVF adapts to the data distribution (cells follow
    * centroid geometry; LSH buckets are data-blind hyperplanes) at the
    * cost of the assignment pass. Same recall dial: probe the top-P
    * nearest cells instead of 1 (P=1 here, documented). Production
    * additionally sizes K ~ √n (the classic IVF tradeoff); the cap is
    * the backstop for the hot cell that k-means re-tuning hasn't
    * caught yet. The nprobe dial itself is measured by
    * [[qIvfProbeCurve]].
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    // the RESULT frame is materialized (r9): three consumers — this
    // query, q_rank_fusion's IVF arm, q_knn_classify's candidate lists
    // — each previously re-ran the in-cell search (14-19 s apiece at
    // sf10); the frame is ≤3 rows per corpus vector
    materializeOnce(spark, dir, "ann_ivf")(
      ivfSearch(ivfAssigned(spark, dir), dim(spark, dir),
        ivfSubBits(spark, dir)))

  /** The full un-materialized plan (assignment inline) — what
    * [[graft.PlanDump]] and the plan audits make claims about. */
  private[graft] def qAnnIvfPlan(spark: SparkSession, dir: String): DataFrame =
    ivfSearch(ivfAssignedPlan(spark, dir), dim(spark, dir),
      ivfSubBits(spark, dir))

  /** The UNCAPPED corpus cell assignment (vec_id, cell, q, nrm, ccos —
    * the cosine to the OWN winning centroid, already computed by the
    * argmax and kept for [[qSemdedup]]'s keep rule) — the n·K
    * broadcast-nested-loop argmax pass, materialized once per
    * (session, dir) and SHARED by [[qAnnIvf]], [[qIvfCells]],
    * [[qIvfProbeCurve]] and [[qSemdedup]] (each previously re-ran the
    * full assignment; one narrow row per corpus vector). The hot-cell
    * cap is applied by the SEARCH consumers, not here: the cells
    * diagnostic must see the uncapped population it reports on. */
  private def ivfAssigned(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "ivf_assigned")(ivfAssignedPlan(spark, dir))

  private[graft] def ivfAssignedPlan(spark: SparkSession, dir: String): DataFrame =
    assignedToBook(spark, dir, ivfCentroidsPlan(spark, dir))

  /** The assignment argmax against an ARBITRARY coarse book (cell, qc,
    * nc) — the [[ivfAssignedPlan]] body generalized so
    * [[graft.index.AnnIndex]] can assign against a k-means-TRAINED book
    * (or one read back from parquet) with the exact same tiebreak
    * (ccos desc, cell asc) as the in-session naive-seed path.
    *
    * A TYPED JVM KERNEL, not a relational explode (r13 — THE sf100
    * embed-probe finding): the relational form materializes n·K
    * candidate rows, each carrying two 64-long arrays — under the √n
    * cell law that is n^1.5 ROWS of traffic, and the 2M-vector build
    * measured 618 s (row_number window over the explode; a map-side
    * max(struct) aggregate still paid 249 s of row copies). Every
    * alternative that shrinks the candidate set (two-level/IMI
    * grouping) changes the assignment DISTRIBUTION — measured: group
    * reps capture whole clusters, the winning group's cells run hot,
    * and the downstream in-cell search pays 370 s — so the right fix
    * keeps the EXACT flat argmax and removes the row explosion
    * instead: one mapPartitions pass over the quantized frame with
    * the K-row book as a task-local array (the [[graft.streaming
    * .DedupStream]] JVM-kernel device; the book is driver-collected —
    * K·d longs, the same data the relational plan broadcast). The
    * kernel mirrors the relational math bit-for-bit: integer dot,
    * `dot.toDouble / sqrt((na*nb).toDouble)`, ties to the smallest
    * cell via ascending scan + strictly-greater compare
    * (java.lang.Double.compare — NaN-largest, Spark's own double
    * ordering). Measured: the full ann_ivf frame (assignment +
    * sub-celled search) 618 → 64.3 s at 2M vectors, 9.1 s at 200k —
    * 7.1×/decade, SUBLINEAR (the honest n^1.5 compute remains, but at
    * the SIMD-class constant FAISS pays — 64·n·K multiply-adds, no
    * rows — so the row-bound terms dominate it for decades). Spec'd ==
    * a JVM brute twin at K > fixture scale and oracle-green at every
    * fixture SF (`Round13OperatorSpec`, the family's 21 oracle rows). */
  private[graft] def assignedToBook(spark: SparkSession, dir: String,
      cents: DataFrame): DataFrame = {
    import spark.implicits._
    val book: Array[(Long, Array[Long], Long)] = cents
      .select(col("cell").cast("long"), col("qc"), col("nc").cast("long"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Long]](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val bookB = spark.sparkContext.broadcast(book)
    quantized(spark, dir)
      .select(col("vec_id").cast("long"), col("q"), col("nrm").cast("long"))
      .as[(Long, Seq[Long], Long)]
      .mapPartitions { it =>
        val b = bookB.value
        it.map { case (vecId, qSeq, nrm) =>
          val q = qSeq.toArray
          var bestCell = -1L
          var bestCos = Double.NegativeInfinity
          var i = 0
          while (i < b.length) {
            val (cell, qc, nc) = b(i)
            var dot = 0L
            var j = 0
            while (j < q.length) { dot += q(j) * qc(j); j += 1 }
            val cos = dot.toDouble / math.sqrt((nrm * nc).toDouble)
            if (java.lang.Double.compare(cos, bestCos) > 0) {
              bestCos = cos; bestCell = cell
            }
            i += 1
          }
          (vecId, bestCell, qSeq, nrm, bestCos)
        }
      }
      .toDF("vec_id", "cell", "q", "nrm", "ccos")
  }

  /** Cheap corpus CONTENT fingerprint (ADVICE_r08): bit-xor of
    * xxhash64(vec_id, q) over the shared quantized frame — order-free,
    * so it is stable under any partitioning, and it changes when any
    * vector's id or content changes (the in-place-regenerated-corpus
    * case row-count validation cannot see). Memoized per (session, dir)
    * like [[dim]]; the first call rides the already-materialized
    * quantized frame, so no extra corpus scan is paid at serve time. */
  private val fpCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.lang.Long]()
  private[graft] def corpusFingerprint(spark: SparkSession, dir: String): Long =
    fpCache.computeIfAbsent((spark, dir), _ =>
      quantized(spark, dir)
        .select(coalesce(expr("bit_xor(xxhash64(vec_id, q))"), lit(0L)).as("fp"))
        .head().getLong(0)).longValue()

  /** The coarse-centroid frame (cell, qc, nc) exactly as the assignment
    * pass sees it — the first index artifact [[graft.index.AnnIndex]]
    * persists (build/serve split, VERDICT_r07 item 2). */
  private[graft] def ivfCentroidsPlan(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir).filter(col("vec_id") < ivfK(spark, dir))
      .select(col("vec_id").as("cell"), col("q").as("qc"), col("nrm").as("nc"))

  /** Index-build accessors for [[graft.index.AnnIndex]]: the shared
    * quantized corpus frame and the index geometry (K, M, PQ-K, dim,
    * corpus size) the meta artifact records. */
  private[graft] def quantizedFrame(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
  private[graft] def indexGeometry(spark: SparkSession, dir: String)
      : (Int, Int, Int, Int, Long) =
    (ivfK(spark, dir), PqM, PqK, dim(spark, dir), vecCount(spark, dir))

  /** Hot-cell cap + in-cell exact top-3 over an assignment frame — the
    * SERVE half of the IVF index: [[qAnnIvf]] runs it over the
    * in-session assignment, [[graft.index.AnnIndex.annSearch]] over the
    * parquet-served one (identical results, spec'd in IndexServeSpec).
    *
    * SUB-CELLED (VERDICT_r09 item 1): when `subBits > 0` the join key
    * is (cell, sub) — [[ivfSubCol]]'s data-blind sign split sized by
    * [[ivfSubBitsFor]] so expected population per key stays ≤
    * [[SubCellTarget]] and total in-cell work is n·c, LINEAR in the
    * corpus (the unsplit Σ|cell|² is n^1.5 under the √n cell law — the
    * r9 sf10 probe's 522× finding). The membership cap guards the
    * (cell, sub) unit for the same reason it guarded cells. At
    * `subBits = 0` (all fixture SFs) the plan and results are
    * bit-identical to the unsplit search. */
  private[graft] def ivfSearch(assignedRaw: DataFrame, d: Int,
      subBits: Int): DataFrame = {
    // at 0 bits the key column is omitted entirely — the fixture-scale
    // plan is BYTE-IDENTICAL to the unsplit search (zero plan churn for
    // the audited shapes); the sub machinery engages only at scale
    val subbed = subBits > 0
    val keyed =
      if (!subbed) assignedRaw
      else assignedRaw.withColumn("sub", ivfSubCol(d, subBits))
    val capKey = if (subbed) Seq(col("cell"), col("sub")) else Seq(col("cell"))
    val assigned = keyed
      .withColumn("csz", count(lit(1)).over(Window.partitionBy(capKey: _*)))
      .filter(col("csz") <= maxBucket).drop("csz")
    val aCols = Seq(col("vec_id"), col("cell")) ++
      (if (subbed) Seq(col("sub")) else Nil) ++
      Seq(col("q").as("qa"), col("nrm").as("na"))
    val bCols = Seq(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b")) ++
      (if (subbed) Seq(col("sub").as("sub_b")) else Nil) ++
      Seq(col("q").as("qb"), col("nrm").as("nb"))
    val a = assigned.select(aCols: _*)
    val b = assigned.select(bCols: _*)
    val joinCond = col("cell") === col("cell_b") &&
      col("vec_id") =!= col("neighbor_id")
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b,
        if (subbed) col("sub") === col("sub_b") && joinCond else joinCond)
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("cell"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  lazy val annIvfSql: String =
    s"""WITH $quantizedSql,
       |$ivfSubSqlCtes,
       |$ivfAsgCtes,
       |cellv AS (SELECT asg1.vec_id, asg1.cell, asg1.q, asg1.nrm,
       |           COALESCE(sp.sub, 0) AS sub
       |          FROM asg1 LEFT JOIN sp ON asg1.vec_id = sp.vec_id
       |          QUALIFY COUNT(*) OVER (PARTITION BY cell, sub) <= $maxBucket),
       |p2 AS (SELECT a.vec_id AS vec_id, a.cell AS cell,
       |        b.vec_id AS neighbor_id,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |       FROM cellv a JOIN cellv b
       |         ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id <> b.vec_id)
       |SELECT vec_id, cell, neighbor_id, round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p2 QUALIFY rn <= 3""".stripMargin

  /** q_ivf_cells — IVF index-health diagnostic: per-cell population and
    * exact mean squared norm (integer sums, truncating ×100 scaled
    * division). Cell BALANCE is the operational metric of an IVF index
    * (one hot cell = one slow probe); this is the query an operator
    * runs before trusting q_ann_ivf's latency. Same assignment pass as
    * the index itself, then one tiny groupBy on the cell id.
    */
  /** q_ann_served — the IVF search SERVED from the persisted index
    * ([[graft.index.AnnIndex]], VERDICT_r07 item 2): `ensure` builds
    * the parquet artifacts once per corpus snapshot (validating an
    * existing index by version/corpus/row count), then the search plan
    * reads the posting-list parquet directly — no n·K assignment
    * argmax, no broadcast-nested-loop, just scan → cap → cell join.
    * Result contract: value-identical to [[qAnnIvf]] (same cap, same
    * tie order, same rounded cosine), so the oracle IS q_ann_ivf's —
    * which is exactly what makes the build/serve split safe to deploy.
    */
  def qAnnServed(spark: SparkSession, dir: String): DataFrame =
    graft.index.AnnIndex.annSearch(spark,
      graft.index.AnnIndex.ensure(spark, dir))

  /** The serve contract: identical rows to q_ann_ivf. */
  val annServedSql: String = annIvfSql

  /** q_rerank_cost — the cross-encoder RE-RANK cost table over the
    * served ANN results (r14, VERDICT_r13 item 6): a retrieval stack
    * that re-scores its ANN candidates with a cross-encoder pays per
    * (query, candidate) pair a sequence of `tok_q + tok_d + 3` tokens
    * (CLS/SEP/SEP) and attention cost ∝ seq² — the budgeting numbers a
    * deployment needs BEFORE turning re-ranking on. Rides the shared
    * materialized `ann_ivf` frame (≤3 rows per corpus vector — the
    * candidate set is rank-bounded by construction, so the cost table
    * is one linear pass at any corpus size) joined with the documents
    * token counts on the vec_id==doc_id embedding contract; grouped by
    * candidate rank so the marginal cost of serving k=1 vs k=3 reads
    * directly off the table. All integers; seq² ≤ ~10⁶ per pair keeps
    * the sum inside int64 past 10¹² pairs. */
  def qRerankCost(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), lit(" "))).cast("long").as("tok"))
    qAnnIvf(spark, dir)
      .select(col("vec_id"), col("neighbor_id"),
        col("rn").cast("long").as("rn"))
      .join(toks.select(col("doc_id").as("vec_id"),
        col("tok").as("tok_q")), "vec_id")
      .join(toks.select(col("doc_id").as("neighbor_id"),
        col("tok").as("tok_d")), "neighbor_id")
      .withColumn("seq", col("tok_q") + col("tok_d") + lit(3L))
      .groupBy("rn")
      .agg(count(lit(1)).as("n_pairs"),
        sum("seq").as("sum_seq_tokens"),
        sum(col("seq") * col("seq")).as("sum_attn_cost"),
        max("seq").as("max_seq"))
  }

  lazy val rerankCostSql: String =
    s"""WITH ivf AS (SELECT vec_id, neighbor_id, rn FROM ($annIvfSql)),
       |t AS (SELECT doc_id,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |      FROM documents),
       |p AS (SELECT ivf.rn, tq.tok + td.tok + 3 AS seq
       |      FROM ivf
       |      JOIN t tq ON tq.doc_id = ivf.vec_id
       |      JOIN t td ON td.doc_id = ivf.neighbor_id)
       |SELECT rn, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       CAST(SUM(seq) AS BIGINT) AS sum_seq_tokens,
       |       CAST(SUM(seq * seq) AS BIGINT) AS sum_attn_cost,
       |       CAST(MAX(seq) AS BIGINT) AS max_seq
       |FROM p GROUP BY rn""".stripMargin

  def qIvfCells(spark: SparkSession, dir: String): DataFrame =
    // rides the SHARED materialized assignment (uncapped by design —
    // the balance diagnostic must see the hot cell it exists to catch)
    ivfAssigned(spark, dir)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        expr("(sum(nrm) * 100) div count(1)").as("avg_nrm_x100"))

  lazy val ivfCellsSql: String =
    s"""WITH $quantizedSql,
       |$ivfAsgCtes
       |SELECT cell, COUNT(*) AS n_vectors,
       |       CAST(SUM(nrm) AS BIGINT) * 100 // COUNT(*) AS avg_nrm_x100
       |FROM asg1 GROUP BY cell""".stripMargin

  /** q_kmeans_shift — Lloyd CONVERGENCE read: per cell, the squared
    * distance between the refined centroid ([[qKmeansStep]]) and its
    * seed, plus the largest single-component move. THE stopping
    * criterion of iterative k-means — an index build loops
    * assignment→refine until this table's shifts flatten, so the
    * operator IS the loop-control read. All integers: centroids are
    * ×100-milli exact, seeds lift to the same scale, shift = Σ(Δ)².
    * K·d-bounded join of two K·d frames (both derive from the shared
    * quantized/assignment passes); K rows out.
    */
  def qKmeansShift(spark: SparkSession, dir: String): DataFrame = {
    val seeds = quantized(spark, dir)
      .filter(col("vec_id") < ivfK(spark, dir))
      .select(col("vec_id").as("cell"), posexplode(col("q")).as(Seq("pos", "qs")))
      .select(col("cell"), (col("pos") + 1).cast("int").as("dim"), col("qs"))
    qKmeansStep(spark, dir).join(seeds, Seq("cell", "dim"))
      .withColumn("d", col("centroid_x100") - col("qs") * 100L)
      .groupBy("cell")
      .agg(max("n_vectors").as("n_vectors"),
        sum(col("d") * col("d")).as("shift_sq_x10000"),
        max(abs(col("d"))).as("max_comp_x100"))
  }

  /** lazy: composes [[kmeansStepSql]], defined later in the file. */
  lazy val kmeansShiftSql: String =
    s"""WITH ks AS (SELECT * FROM ($kmeansStepSql)),
       |sd0 AS (SELECT cell, unnest(generate_series(1, len(q))) AS dim, q
       |        FROM (WITH $quantizedSql
       |              SELECT vec_id AS cell, q FROM qn
       |              WHERE vec_id < $ivfKSql)),
       |sd AS (SELECT cell, dim, q[dim] AS qs FROM sd0),
       |j AS (SELECT ks.cell, ks.n_vectors,
       |             ks.centroid_x100 - sd.qs * 100 AS d
       |      FROM ks JOIN sd ON ks.cell = sd.cell AND ks.dim = sd.dim)
       |SELECT cell, CAST(MAX(n_vectors) AS BIGINT) AS n_vectors,
       |       CAST(SUM(d * d) AS BIGINT) AS shift_sq_x10000,
       |       CAST(MAX(abs(d)) AS BIGINT) AS max_comp_x100
       |FROM j GROUP BY cell""".stripMargin

  /** q_cell_purity — label PURITY per IVF cell: for each cell, the
    * member count, distinct-label count, majority label and its ppm
    * share. The clustering-quality read between Lloyd rounds and the
    * diversity check SemDeDup-style pipelines run before trusting
    * within-cell dedup decisions (a 99%-pure cell is a topic; a
    * 50/50 cell is a boundary artifact whose "near-dups" may be
    * cross-topic false positives). Rides the SHARED materialized
    * assignment; the label join keys on 8-byte vec ids; the per-label
    * aggregate and both windows land on the same cell key, K-bounded
    * output at any corpus size.
    */
  def qCellPurity(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("lv"), col("label").cast("long").as("label"))
    val perLabel = ivfAssigned(spark, dir).select("vec_id", "cell")
      .join(labels, col("vec_id") === col("lv"))
      .groupBy("cell", "label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("cell").orderBy(col("c").desc, col("label"))
    perLabel
      .withColumn("rn", row_number().over(w))
      .withColumn("n_vectors", sum("c").over(Window.partitionBy("cell")))
      .withColumn("n_labels", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("rn") === 1)
      .select(col("cell"), col("n_vectors"), col("n_labels"),
        col("label").as("top_label"), col("c").as("top_count"),
        expr("c * 1000000 div n_vectors").as("purity_ppm"))
  }

  lazy val cellPuritySql: String =
    s"""WITH $quantizedSql,
       |$ivfAsgCtes,
       |al AS (SELECT a.cell, CAST(e.label AS BIGINT) AS label
       |       FROM asg1 a JOIN embeddings e ON e.vec_id = a.vec_id),
       |pl AS (SELECT cell, label, COUNT(*) AS c FROM al GROUP BY 1, 2),
       |r AS (SELECT *,
       |        row_number() OVER (PARTITION BY cell
       |          ORDER BY c DESC, label) AS rn,
       |        CAST(SUM(c) OVER (PARTITION BY cell) AS BIGINT) AS n_vectors,
       |        CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS n_labels
       |      FROM pl)
       |SELECT cell, n_vectors, n_labels, label AS top_label,
       |       c AS top_count, c * 1000000 // n_vectors AS purity_ppm
       |FROM r WHERE rn = 1""".stripMargin

  /** nprobe tiers for [[qIvfProbeCurve]] — plan-time constants. */
  private val ProbeTiers = Seq(1, 2, 4)

  /** q_ivf_probe_curve — the IVF RECALL-vs-COST dial, measured: for the
    * fixed query set, recall@3 against exact brute-force ground truth
    * when the search probes the 1 / 2 / 4 nearest cells. This is THE
    * production IVF tradeoff (every deployed IVF index ships an nprobe
    * knob; the answer to "is one probe enough?" is this table, re-run
    * as the corpus drifts). Shape: the query side ranks the K broadcast
    * centroids per query (|Q|·K, constant), candidates come from the
    * SHARED materialized assignment via a cell-equality join (each
    * corpus vector lives in exactly ONE cell, so tiers need no pair
    * dedup — a wider probe only adds cells), the 3-tier explode
    * multiplies the |Q|-bounded candidate frame (never the corpus),
    * and ground truth is the materialized brute-force top-3. Output:
    * |tiers| rows at any corpus size.
    */
  def qIvfProbeCurve(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val cents = v.filter(col("vec_id") < ivfK(spark, dir))
      .select(col("vec_id").as("cell"), col("q").as("qc"), col("nrm").as("nc"))
    val probeW = Window.partitionBy("qid")
      .orderBy(col("ccos").desc, col("cell"))
    val probes = v.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm").as("na"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(dot(col("qa"), col("qc")), col("na"), col("nc")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= ProbeTiers.max)
      .select(col("qid"), col("qa"), col("na"), col("cell"), col("probe_rank"))
    // search side: capped like every in-cell search (qAnnIvf's rule)
    val b = ivfAssigned(spark, dir)
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("csz") <= maxBucket).drop("csz")
      .select(col("vec_id").as("neighbor_id"), col("cell").as("cell_b"),
        col("q").as("qb"), col("nrm").as("nb"))
    val cand = probes.join(b, col("cell") === col("cell_b") &&
        col("qid") =!= col("neighbor_id"))
      .withColumn("cos", cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .select(col("qid"), col("probe_rank"), col("neighbor_id"), col("cos"))
    val w = Window.partitionBy("qid", "nprobe")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val found = cand
      .select(col("qid"), col("probe_rank"), col("neighbor_id"), col("cos"),
        explode(typedLit(ProbeTiers)).as("nprobe"))
      .filter(col("probe_rank") <= col("nprobe"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nprobe"), col("neighbor_id"))
    val gt = qEmbedCosineTopk(spark, dir).filter(col("rn") <= 3)
      .select(col("vec_id").as("g_qid"), col("neighbor_id").as("g_nid"))
    val hits = found.join(gt, col("qid") === col("g_qid") &&
        col("neighbor_id") === col("g_nid"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hits"))
    found.groupBy("nprobe").agg(count(lit(1)).as("n_found"))
      .join(hits, Seq("nprobe"), "left_outer")
      .select(col("nprobe"), col("n_found"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_ppm",
        expr(s"hits * 1000000 div ${QuerySetSize * 3}"))
  }

  val ivfProbeCurveSql: String = {
    val ccos = """CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |             i -> qn.q[i] * cents.qc[i])) AS DOUBLE)
       |             / sqrt(CAST(qn.nrm * cents.nc AS DOUBLE))"""
    s"""WITH $quantizedSql,
       |$ivfAsgCtes,
       |cellv AS (SELECT vec_id, cell, q, nrm FROM asg1
       |          QUALIFY COUNT(*) OVER (PARTITION BY cell) <= $maxBucket),
       |pr AS (SELECT qn.vec_id AS qid, qn.q AS qa, qn.nrm AS na, cents.cell,
       |         row_number() OVER (PARTITION BY qn.vec_id
       |           ORDER BY $ccos DESC,
       |           cents.cell) AS probe_rank
       |        FROM qn, cents WHERE qn.vec_id < $QuerySetSize
       |        QUALIFY probe_rank <= ${ProbeTiers.max}),
       |cand AS (SELECT pr.qid, pr.probe_rank, b.vec_id AS neighbor_id,
       |          CAST(list_sum(list_transform(generate_series(1, len(pr.qa)),
       |            i -> pr.qa[i] * b.q[i])) AS DOUBLE)
       |            / sqrt(CAST(pr.na * b.nrm AS DOUBLE)) AS cos
       |         FROM pr JOIN cellv b
       |           ON pr.cell = b.cell AND pr.qid <> b.vec_id),
       |t AS (SELECT cand.*, tiers.np FROM cand,
       |        (SELECT unnest(${ProbeTiers.mkString("[", ", ", "]")}) AS np) tiers
       |      WHERE probe_rank <= np),
       |top3 AS (SELECT qid, np, neighbor_id FROM (
       |           SELECT *, row_number() OVER (PARTITION BY qid, np
       |             ORDER BY cos DESC, neighbor_id) AS rn FROM t)
       |         WHERE rn <= 3),
       |gt AS (SELECT vec_id AS g_qid, neighbor_id AS g_nid
       |       FROM ($embedCosineTopkSql) WHERE rn <= 3),
       |h AS (SELECT np, COUNT(*) AS hits FROM top3 JOIN gt
       |        ON qid = g_qid AND neighbor_id = g_nid GROUP BY np),
       |n AS (SELECT np, COUNT(*) AS n_found FROM top3 GROUP BY np)
       |SELECT CAST(n.np AS INT) AS nprobe, n.n_found,
       |       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(coalesce(h.hits, 0) AS BIGINT) * 1000000
       |         // ${QuerySetSize * 3} AS recall_ppm
       |FROM n LEFT JOIN h ON n.np = h.np""".stripMargin
  }

  /** q_probe_served — the nprobe recall/cost dial measured on the
    * PERSISTED index (VERDICT_r10 item 7): [[qIvfProbeCurve]] answers
    * the same question against the in-session assignment, but a
    * deployed service runs [[graft.index.AnnIndex.query]] against the
    * parquet artifacts — THIS query measures the knob on the artifact
    * actually served. The query set (`vec_id < QuerySetSize`, the
    * family's constant held-out slice) is submitted as EXTERNAL
    * queries at nprobe ∈ {1, 2, 4}; per query, k = 5 is requested and
    * the query's own posting row dropped, which yields exactly the
    * top-3 non-self rows of the served total order (dropping at most
    * ONE element from a top-5 prefix cannot disturb the first three of
    * the rest — no re-ranking, the served `rn` is reused). Recall is
    * against the same brute-force ground truth as the in-session
    * curve. One |Q|·K argmax + the probed posting lists per tier —
    * |Q|-bounded, never a corpus self-join; the serve path's posting
    * list is deliberately UNCAPPED (a service answers from whatever
    * the index holds), so the oracle models the uncapped cells too.
    */
  def qProbeServed(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.index.AnnIndex.ensure(spark, dir)
    val queries = Tables.fanOut(Tables.embeddings(spark, dir))
      .filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // ONE posting scan + ONE broadcast centroid argmax for all three
    // tiers (r15, guide §2.4 — was three AnnIndex.query calls, each
    // re-scanning the posting parquet): queryTiers is row-exact per
    // tier vs query (Round15OptSpec), so the served totals are
    // unchanged by construction.
    val found = graft.index.AnnIndex
      .queryTiers(spark, root, queries, tiers = Seq(1, 2, 4), k = 5)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rn2", row_number().over(
        Window.partitionBy("query_id", "np").orderBy("rn")))
      .filter(col("rn2") <= 3)
      .select(col("query_id").as("qid"), col("np").as("nprobe"),
        col("neighbor_id"))
    val gt = qEmbedCosineTopk(spark, dir).filter(col("rn") <= 3)
      .select(col("vec_id").as("g_qid"), col("neighbor_id").as("g_nid"))
    val hits = found.join(gt, col("qid") === col("g_qid") &&
        col("neighbor_id") === col("g_nid"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hits"))
    found.groupBy("nprobe").agg(count(lit(1)).as("n_found"))
      .join(hits, Seq("nprobe"), "left_outer")
      .select(col("nprobe"), col("n_found"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_ppm",
        expr(s"hits * 1000000 div ${QuerySetSize * 3}"))
  }

  val probeServedSql: String = {
    val ccos = """CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |             i -> qn.q[i] * cents.qc[i])) AS DOUBLE)
       |             / sqrt(CAST(qn.nrm * cents.nc AS DOUBLE))"""
    s"""WITH $quantizedSql,
       |$ivfAsgCtes,
       |posting AS (SELECT vec_id, cell, q, nrm FROM asg1),
       |pr AS (SELECT qn.vec_id AS qid, qn.q AS qa, qn.nrm AS na, cents.cell,
       |         row_number() OVER (PARTITION BY qn.vec_id
       |           ORDER BY $ccos DESC,
       |           cents.cell) AS probe_rank
       |        FROM qn, cents WHERE qn.vec_id < $QuerySetSize
       |        QUALIFY probe_rank <= 4),
       |cand AS (SELECT pr.qid, pr.probe_rank, b.vec_id AS neighbor_id,
       |          CAST(list_sum(list_transform(generate_series(1, len(pr.qa)),
       |            i -> pr.qa[i] * b.q[i])) AS DOUBLE)
       |            / sqrt(CAST(pr.na * b.nrm AS DOUBLE)) AS cos
       |         FROM pr JOIN posting b
       |           ON pr.cell = b.cell AND pr.qid <> b.vec_id),
       |t AS (SELECT cand.*, tiers.np FROM cand,
       |        (SELECT unnest([1, 2, 4]) AS np) tiers
       |      WHERE probe_rank <= np),
       |top3 AS (SELECT qid, np, neighbor_id FROM (
       |           SELECT *, row_number() OVER (PARTITION BY qid, np
       |             ORDER BY cos DESC, neighbor_id) AS rn FROM t)
       |         WHERE rn <= 3),
       |gt AS (SELECT vec_id AS g_qid, neighbor_id AS g_nid
       |       FROM ($embedCosineTopkSql) WHERE rn <= 3),
       |h AS (SELECT np, COUNT(*) AS hits FROM top3 JOIN gt
       |        ON qid = g_qid AND neighbor_id = g_nid GROUP BY np),
       |n AS (SELECT np, COUNT(*) AS n_found FROM top3 GROUP BY np)
       |SELECT CAST(n.np AS INT) AS nprobe, n.n_found,
       |       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(coalesce(h.hits, 0) AS BIGINT) * 1000000
       |         // ${QuerySetSize * 3} AS recall_ppm
       |FROM n LEFT JOIN h ON n.np = h.np""".stripMargin
  }

  /** q_kmeans_step — one Lloyd iteration of IVF centroid refinement:
    * assign every vector to its nearest centroid (the q_ann_ivf
    * assignment pass), then recompute each cell's centroid as the
    * element-wise mean of its members. This is the index-BUILD step the
    * IVF family needs (run it until assignments stabilize; q_ivf_cells
    * is the balance check between rounds). Output is one row per
    * (cell, dimension): member count and floor(100·mean(component)).
    *
    * Engine parity: components are quantized ints in [-1000, 1000], but
    * truncating division differs between engines on NEGATIVE sums — so
    * the mean is computed over (qv + 1000) ≥ 0 and the constant offset
    * (an integer, so it passes through floor unchanged) is subtracted
    * after: exact floor(100·mean) in both engines, no float math.
    *
    * Scale shape: assignment is the broadcast-K pattern (n·K codegen'd
    * integer dots, no corpus shuffle); the explode multiplies rows ×d
    * but carries only (cell, dim, component) ints, and the groupBy is
    * map-side combinable down to K·d rows. One shuffle of K·d·P partial
    * sums — independent of corpus size.
    */
  def qKmeansStep(spark: SparkSession, dir: String): DataFrame =
    // rides the SHARED materialized assignment; the element-wise sums
    // run on the native vec_sum AGGREGATE (graft.functions.LongVectorSum)
    // — vectors stay in-row, so the exchange moves K·d-long partial
    // buffers instead of n·d exploded rows (the posexplode form this
    // replaces shuffled 64× the rows). Identical integers: per dim,
    // (Σq + 1000n)·100 div n − 100000 == the old sum(qv+1000) form.
    ivfAssigned(spark, dir)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), graft.functions.LongVectorSum.vecSum(col("q")).as("qsum"))
      .select(col("cell"), col("n"), posexplode(
        expr("transform(qsum, s -> ((s + 1000 * n) * 100) div n - 100000)"))
        .as(Seq("pos", "centroid_x100")))
      .select(col("cell"), (col("pos") + 1).cast("int").as("dim"),
        col("n").as("n_vectors"), col("centroid_x100"))

  lazy val kmeansStepSql: String =
    s"""WITH $quantizedSql,
       |$ivfAsgCtes,
       |a1 AS (SELECT cell, q FROM asg1),
       |e AS (SELECT cell, unnest(generate_series(1, len(q))) AS dim, q
       |      FROM a1)
       |SELECT cell, CAST(dim AS INT) AS dim, COUNT(*) AS n_vectors,
       |       CAST(SUM(q[dim] + 1000) AS BIGINT) * 100 // COUNT(*)
       |         - 100000 AS centroid_x100
       |FROM e GROUP BY cell, dim""".stripMargin

  /** q_dedup_embed — embedding-cosine near-duplicate pairs: vectors in
    * the same sign-LSH bucket with cosine ≥ 0.4, each unordered pair
    * once (a < b). Same candidate mechanism as q_ann_lsh — bucket
    * equality join, no all-pairs — but the output is the dedup
    * decision (pair + similarity), i.e. the "embedding-cosine near-dup"
    * stage of a training-data pipeline. Approximation note: pairs
    * split across buckets are unseen, exactly the recall/cost dial every
    * production near-dup system exposes (add plane-set bands to raise
    * recall).
    */
  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame =
    embedPairs(spark, dir)

  /** The thresholded cosine near-dup pair list, materialized once per
    * (session, dir) — ONE bucket self-join serves [[qDedupEmbed]] and
    * the [[qDedupEmbedClusters]] fixpoint (each previously re-ran the
    * pairing standalone). Pair-count-bounded: well under one row per
    * corpus vector in a deduplicated corpus. */
  private def embedPairs(spark: SparkSession, dir: String): DataFrame =
    MaterializeOnce(spark, dir, "sim:embed_pairs")(embedPairsPlan(spark, dir))

  private[graft] def embedPairsPlan(spark: SparkSession, dir: String): DataFrame = {
    // same bucket formula as q_ann_lsh → share its materialized frame
    val v = lshBuckets(spark, dir)
    val a = v.select(col("vec_id").as("vec_a"), col("bucket"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"),
      col("bucket").as("bucket_b"), col("q").as("qb"), col("nrm").as("nb"))
    a.join(b, col("bucket") === col("bucket_b") &&
        col("vec_a") < col("vec_b"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("bucket"),
        round(col("cos"), 6).as("cosine"))
  }

  val dedupEmbedSql: String = {
    val wExpr = hash60Sql("CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH $quantizedSql,
       |bp AS (SELECT vec_id, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn, (SELECT unnest(generate_series(0, $annPlanesSql - 1)) AS p) planes),
       |bk AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id),
       |vb0 AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |vb AS (SELECT * FROM vb0
       |       QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
       |p2 AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |       FROM vb a JOIN vb b
       |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, bucket, round(cos, 6) AS cosine
       |FROM p2 WHERE cos >= 0.4""".stripMargin
  }

  /** q_dedup_embed_clusters — the DECISION stage of embedding dedup:
    * q_dedup_embed's pairs under-merge transitive near-dups (A≈B, B≈C
    * but A,C in the same cluster), so the keep list must come from
    * connected components. Output is each clustered vector's cluster
    * id (the component's minimum vec_id), cluster size, and whether it
    * is the canonical keeper. Vectors with no near-dup pair are
    * trivially kept and not emitted. Oracle computes the same fixpoint
    * via a recursive CTE — different algorithm, one answer.
    *
    * BUCKET-LOCAL union-find, not the iterative CC loop (r13 — an
    * sf100 embed-probe finding): every pair shares its endpoints' ONE
    * sign-LSH bucket (a vector has exactly one bucket and pairs form
    * only on bucket equality), so the pair graph is a disjoint union
    * of per-bucket subgraphs BY CONSTRUCTION and clustering needs no
    * global iteration at all — one shuffle of the pair frame on
    * bucket, then a per-bucket JVM union-find (path-halving, min-id
    * roots) inside `flatMapGroups`. The generic
    * [[Dedup.connectedComponents]] loop (still the right tool for the
    * n-gram/banded graphs, whose components span keys) paid 25
    * propagation rounds here — ~100 s of pure round overhead at 2M
    * vectors for components the bucket key already isolates; the
    * kernel runs in one pass, measured ~155 → ~20 s. Per-task state is
    * bounded by the pair frame's own hot-bucket cap (the frame IS the
    * budget); same fixpoint, spec'd == the generic loop row-exact in
    * `Round13OperatorSpec`. */
  def qDedupEmbedClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = embedPairs(spark, dir)
      .select(col("bucket"), col("vec_a"), col("vec_b"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          while (parent.get(x) != x) {
            val g = parent.get(parent.get(x))
            parent.put(x, g); x = g
          }
          x
        }
        it.foreach { case (_, a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          // union by MIN id, so every root is its component's minimum
          // and the label IS the fixpoint the iterative loop reaches
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        import scala.jdk.CollectionConverters._
        parent.keySet().asScala.iterator.map(n => (n, find(n)))
      }
      .toDF("vec_id", "cluster_id")
    labels
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        (col("vec_id") === col("cluster_id")).as("keep"))
  }

  val dedupEmbedClustersSql: String = {
    val wExpr = hash60Sql("CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH RECURSIVE $quantizedSql,
       |bp AS (SELECT vec_id, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn, (SELECT unnest(generate_series(0, $annPlanesSql - 1)) AS p) planes),
       |bk AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id),
       |vb0 AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |vb AS (SELECT * FROM vb0
       |       QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
       |pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |       FROM vb a JOIN vb b
       |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |       WHERE CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) >= 0.4),
       |edges AS (SELECT doc_a, doc_b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |walk AS (
       |  SELECT doc_a AS node, doc_b AS reach FROM edges
       |  UNION
       |  SELECT w.node, e.doc_b FROM walk w JOIN edges e ON w.reach = e.doc_a),
       |cl AS (SELECT node, least(node, MIN(reach)) AS cluster_id
       |       FROM walk GROUP BY node)
       |SELECT node AS vec_id, cluster_id,
       |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |       node = cluster_id AS keep
       |FROM cl""".stripMargin
  }

  /** SemDeDup within-cell cosine threshold. The paper sweeps 1−ε; the
    * fixture embeddings are near-orthogonal, so the operative value
    * matches the embedding near-dup stage's 0.4 — the knob, not the
    * mechanism, is what a deployment re-tunes. */
  private val SemThreshold = 0.4

  /** q_semdedup — SEMANTIC deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv 2303.09540): prune semantically-redundant examples INSIDE
    * k-means cells rather than across the whole corpus — the trick that
    * makes embedding dedup tractable at web scale (within-cell pairing
    * is (n/K)·maxCell work, never n²). This is the third dedup decision
    * tier next to exact (q_dedup_exact) and lexical near-dup
    * (q_dedup_clusters): it fires on paraphrases and re-renderings that
    * share no shingles.
    *
    * Shape: rides the SHARED materialized IVF assignment (which carries
    * each vector's cosine to its own centroid from the argmax pass —
    * zero extra corpus work), applies the standard hot-cell cap, pairs
    * within cells by equality join, thresholds at [[SemThreshold]], and
    * applies the paper's keep rule GREEDILY: among τ-neighbors the
    * vector FARTHEST from its centroid survives (low centroid-cosine =
    * most atypical = most informative to keep; ties break on vec_id).
    * A vector is dropped iff some within-cell τ-neighbor precedes it in
    * (ccos asc, vec_id asc) order — one bounded aggregate over the pair
    * list plus an 8-byte-key left join back to the corpus frame; the
    * chain case (a≈b, b≈c, a̸≈c) keeps exactly the group minimum, same
    * as a component-level keep-one. Output: per vector its cell,
    * centroid affinity, τ-neighbor count, and the keep verdict.
    */
  def qSemdedup(spark: SparkSession, dir: String): DataFrame = {
    val capped = ivfAssigned(spark, dir)
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("csz") <= maxBucket).drop("csz")
    val a = capped.select(col("vec_id"), col("cell"),
      col("q").as("qa"), col("nrm").as("na"), col("ccos").as("ca"))
    val b = capped.select(col("vec_id").as("nid"), col("cell").as("cell_b"),
      col("q").as("qb"), col("nrm").as("nb"), col("ccos").as("cb"))
    val dups = a.join(b, col("cell") === col("cell_b") &&
        col("vec_id") =!= col("nid"))
      .withColumn("cos", cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cos") >= SemThreshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dups"),
        max(when(col("cb") < col("ca") ||
            (col("cb") === col("ca") && col("nid") < col("vec_id")),
          1).otherwise(0)).as("drp"))
    capped.select(col("vec_id"), col("cell"),
        round(col("ccos"), 6).as("centroid_cos"))
      .join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("centroid_cos"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("drp"), lit(0)) === 0).as("keep"))
  }

  val semdedupSql: String = {
    val ccos = """CAST(list_sum(list_transform(generate_series(1, len(qn.q)),
       |             i -> qn.q[i] * cents.qc[i])) AS DOUBLE)
       |             / sqrt(CAST(qn.nrm * cents.nc AS DOUBLE))"""
    s"""WITH $quantizedSql,
       |$ivfAsgCtes,
       |cellv AS (SELECT vec_id, cell, q, nrm, ccos FROM asg1
       |          QUALIFY COUNT(*) OVER (PARTITION BY cell) <= $maxBucket),
       |d AS (SELECT a.vec_id, COUNT(*) AS n_dups,
       |        MAX(CASE WHEN b.ccos < a.ccos
       |                  OR (b.ccos = a.ccos AND b.vec_id < a.vec_id)
       |            THEN 1 ELSE 0 END) AS drp
       |      FROM cellv a JOIN cellv b
       |        ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |      WHERE CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) >= $SemThreshold
       |      GROUP BY 1)
       |SELECT c.vec_id, c.cell, round(c.ccos, 6) AS centroid_cos,
       |       CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
       |       coalesce(d.drp, 0) = 0 AS keep
       |FROM cellv c LEFT JOIN d ON c.vec_id = d.vec_id""".stripMargin
  }

  /** Quantized embeddings WITH the class label (the supervised twin of
    * [[quantized]]): drives the label-quality operators below. */
  private def labeled(spark: SparkSession, dir: String): DataFrame =
    materializeOnce(spark, dir, "labeled")(labeledPlan(spark, dir))

  private[graft] def labeledPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.embeddings(spark, dir)).select(
      col("vec_id"), col("label").cast("long").as("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm", vecDot(col("q"), col("q")))

  private val labeledSql: String =
    """l0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
      |        list_transform(embedding,
      |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |       FROM embeddings),
      |lq AS (SELECT vec_id, label, q,
      |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
      |       FROM l0)""".stripMargin

  /** q_knn_classify — kNN label-noise detection (the Confident-Learning
    * / cleanlab-style screen a labeled training set runs before use):
    * each vector's label is re-predicted by majority vote of its 3
    * nearest within-LSH-bucket neighbors (deterministic vote tie-break:
    * count desc, label asc), and `mismatch` flags disagreement with the
    * declared label — the review queue for relabeling. Scale shape
    * (r10 rebase, VERDICT_r09 item 1): the neighbor lists come from the
    * PERSISTED index's serve path ([[graft.index.AnnIndex.annSearch]]
    * over `ensure`'s parquet posting lists — value-identical to
    * q_ann_ivf by the spec'd serve contract), so the plan this query
    * executes contains NO n·K assignment argmax (no
    * broadcast-nested-loop — pinned in PlanAuditSpec) and its in-cell
    * join runs at the sub-celled LINEAR cost; the vote is one
    * map-side-combinable aggregation + a 3-row-per-vector rank over the
    * ≤3-rows-per-vector lists. Vectors alone in their (cell, sub) have
    * no neighbors and drop out (documented — nprobe/banding is the
    * recall dial).
    */
  def qKnnClassify(spark: SparkSession, dir: String): DataFrame = {
    val lbl = labeled(spark, dir).select(col("vec_id"), col("label"))
    val top3 = graft.index.AnnIndex
      .annSearch(spark, graft.index.AnnIndex.ensure(spark, dir))
      .select(col("vec_id"), col("neighbor_id"))
      .join(lbl, "vec_id")
      .join(lbl.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
    val wVote = Window.partitionBy("vec_id")
      .orderBy(col("votes").desc, col("n_label").asc)
    top3.groupBy("vec_id", "label", "n_label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrn", row_number().over(wVote))
      .filter(col("vrn") === 1)
      .select(col("vec_id"), col("label"), col("n_label").as("predicted"),
        col("votes"), (col("n_label") =!= col("label")).as("mismatch"))
  }

  lazy val knnClassifySql: String =
    s"""WITH ivf AS (SELECT vec_id, neighbor_id FROM ($annIvfSql)),
       |lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |        FROM embeddings),
       |t3 AS (SELECT ivf.vec_id, la.label, lb.label AS n_label
       |       FROM ivf
       |       JOIN lbl la ON la.vec_id = ivf.vec_id
       |       JOIN lbl lb ON lb.vec_id = ivf.neighbor_id),
       |v AS (SELECT vec_id, label, n_label, COUNT(*) AS votes
       |      FROM t3 GROUP BY 1, 2, 3)
       |SELECT vec_id, label, n_label AS predicted,
       |       CAST(votes AS BIGINT) AS votes,
       |       n_label <> label AS mismatch
       |FROM v QUALIFY row_number() OVER (PARTITION BY vec_id
       |  ORDER BY votes DESC, n_label) = 1""".stripMargin

  /** q_label_centroid — within-class coherence screen (the other half
    * of label QA next to [[qKnnClassify]]): each class's centroid is
    * the per-dimension integer floor-mean of its members (the
    * q_kmeans_step offset-shift device — exact and engine-identical on
    * nonnegative operands), and every vector scores the cosine to its
    * OWN class centroid; `suspect` flags cosine < 0.5 — vectors that
    * do not resemble their class, the candidate mislabels/outliers.
    * Scale shape: the centroid build is one posexplode→groupBy on
    * (label, dim) — a |labels|·d-bounded aggregate with map-side
    * combine — reassembled and BROADCAST back; the scoring pass is a
    * codegen'd projection over the corpus. No corpus self-join at all.
    */
  def qLabelCentroid(spark: SparkSession, dir: String): DataFrame = {
    val v = labeled(spark, dir)
    // native vec_sum aggregate: |labels| in-row vector buffers through
    // the exchange instead of n·d exploded rows (see qKmeansStep)
    val cent = v
      .groupBy(col("label").as("c_label"))
      .agg(count(lit(1)).as("n"),
        graft.functions.LongVectorSum.vecSum(col("q")).as("qsum"))
      .select(col("c_label"),
        expr("transform(qsum, s -> ((s + 1000 * n) * 100) div n - 100000)")
          .as("qc"))
      .withColumn("nc", vecDot(col("qc"), col("qc")))
    v.join(broadcast(cent), col("label") === col("c_label"))
      .withColumn("cos", cosine(dot(col("q"), col("qc")), col("nrm"), col("nc")))
      .select(col("vec_id"), col("label"),
        round(col("cos"), 6).as("centroid_cos"),
        (col("cos") < 0.5).as("suspect"))
  }

  val labelCentroidSql: String =
    s"""WITH $labeledSql,
       |e AS (SELECT label AS c_label,
       |             unnest(generate_series(1, len(q))) AS dim, q
       |      FROM lq),
       |cd AS (SELECT c_label, dim,
       |        CAST(SUM(q[dim] + 1000) AS BIGINT) * 100 // COUNT(*)
       |          - 100000 AS c
       |       FROM e GROUP BY 1, 2),
       |ca AS (SELECT c_label, list(c ORDER BY dim) AS qc FROM cd GROUP BY 1),
       |cn AS (SELECT c_label, qc,
       |        CAST(list_sum(list_transform(qc, x -> x * x)) AS BIGINT) AS nc
       |       FROM ca),
       |j AS (SELECT vec_id, label,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * qc[i])) AS DOUBLE)
       |          / sqrt(CAST(nrm * nc AS DOUBLE)) AS cos
       |      FROM lq JOIN cn ON label = c_label)
       |SELECT vec_id, label, round(cos, 6) AS centroid_cos,
       |       cos < 0.5 AS suspect
       |FROM j""".stripMargin

  val annLshSql: String = {
    val wExpr = hash60Sql("CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH $quantizedSql,
       |bp AS (SELECT vec_id, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn, (SELECT unnest(generate_series(0, $annPlanesSql - 1)) AS p) planes),
       |bk AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id),
       |vb0 AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |vb AS (SELECT * FROM vb0
       |       QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
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

  /** Product-quantization geometry: M subspaces × K centroids each.
    * Codes are M·log₂K bits (here 8) — the index footprint that lets a
    * 100 TB embedding corpus live in RAM as 1 byte/vector + a small
    * codebook. Centroids are plan-time deterministic constants (same
    * hash60Jvm device as the LSH planes); a data-adaptive codebook
    * would come from q_kmeans_step per subspace. */
  private val PqM = 4
  private val PqK = 4
  private def pqCentroids(sub: Int): Array[Array[Array[Long]]] =
    Array.tabulate(PqM, PqK)((m, k) =>
      Array.tabulate(sub)(i => hash60Jvm(s"pq:$m:$k:$i") % 2001 - 1000))

  /** q_pq_code — product-quantization encoding (Jégou et al., PQ for
    * nearest neighbor search): split each quantized vector into M=4
    * subvectors, assign each to its nearest of K=4 subspace centroids by
    * EXACT integer squared distance (‖q‖² − 2·q·c + ‖c‖², the norms and
    * dots all integer; q·c on the native codegen'd vec_dot), and pack
    * the M choices into one code byte, carrying the total quantization
    * error. Ties take the FIRST minimal centroid (array_position ==
    * list_position: first occurrence) — deterministic in both engines.
    * Pure projection: no shuffle, no join, scan-speed at any corpus
    * size; the codebook is O(M·K·d) literals in the plan.
    */
  def qPqCode(spark: SparkSession, dir: String): DataFrame = {
    val sub = dim(spark, dir) / PqM
    val withDs = pqSubspaceDs(
      quantized(spark, dir).select(col("vec_id"), col("q")),
      pqCentroids(sub), sub)
    val qerr = (0 until PqM).map(m => array_min(col(s"ds$m"))).reduce(_ + _)
    withDs.select(col("vec_id"), pqPackedCode.as("code"),
      qerr.cast("long").as("qerr"))
  }

  /** Per-subspace squared-distance arrays (vec_id, ds0..ds{M−1}) over a
    * (vec_id, q) frame for a given codebook — the shared PQ kernel:
    * the in-session encoder ([[qPqCode]], [[qIvfPq]]) and the SERVED
    * LUT builder ([[graft.index.AnnIndex]], which feeds a codebook read
    * back from parquet) both compose it. */
  private[graft] def pqSubspaceDs(base: DataFrame,
      cents: Array[Array[Array[Long]]], sub: Int): DataFrame = {
    val s1 = base.select(col("vec_id") +: (0 until PqM).map(m =>
      slice(col("q"), m * sub + 1, sub).as(s"q$m")): _*)
    s1.select(col("vec_id") +: (0 until PqM).map { m =>
      array((0 until PqK).map { k =>
        val c = cents(m)(k)
        val cNorm = c.map(x => x * x).sum
        vecDot(col(s"q$m"), col(s"q$m")) -
          lit(2L) * vecDot(col(s"q$m"), typedLit(c.toSeq)) + lit(cNorm)
      }: _*).as(s"ds$m")
    }: _*)
  }

  /** Packed M-digit base-K code over a ds frame (first-minimum ties). */
  private def pqPackedCode: Column = (0 until PqM).map(m =>
    (array_position(col(s"ds$m"), array_min(col(s"ds$m"))) - 1L) *
      lit(math.pow(PqK, m).toLong)).reduce(_ + _).cast("long")

  /** Packed codes (vec_id, code) for a (vec_id, q) frame against an
    * arbitrary codebook — the encode half, shared by the in-session
    * queries and [[graft.index.AnnIndex.append]]'s incremental batch
    * encode (same first-minimum tie rule everywhere). */
  private[graft] def pqEncode(base: DataFrame,
      cents: Array[Array[Array[Long]]], sub: Int): DataFrame =
    pqSubspaceDs(base, cents, sub).select(col("vec_id"), pqPackedCode.as("code"))

  /** The PQ codebook as a FRAME (m, k, centroid) — the persistable
    * index artifact; M·K rows. */
  private[graft] def pqCodebookFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sub = dim(spark, dir) / PqM
    val cents = pqCentroids(sub)
    (for (m <- 0 until PqM; k <- 0 until PqK)
      yield (m, k, cents(m)(k).toSeq)).toDF("m", "k", "centroid")
  }

  /** ADC-query LUT frame (query_id, lut0..lut{M−1}) for the constant
    * query set, against an arbitrary codebook. */
  private[graft] def pqLuts(spark: SparkSession, dir: String,
      cents: Array[Array[Array[Long]]]): DataFrame = {
    val sub = dim(spark, dir) / PqM
    pqSubspaceDs(quantized(spark, dir).filter(col("vec_id") < PqNQ)
      .select(col("vec_id"), col("q")), cents, sub)
      .select(col("vec_id").as("query_id") +:
        (0 until PqM).map(m => col(s"ds$m").as(s"lut$m")): _*)
  }

  /** ADC top-3 scan: codes (vec_id, code) against broadcast LUTs —
    * the serve half of IVF-PQ (a candidate costs M table lookups). */
  private[graft] def adcTopK(codes: DataFrame, luts: DataFrame): DataFrame = {
    val adc = (0 until PqM).map(m =>
      element_at(col(s"lut$m"),
        (expr(s"code div ${math.pow(PqK, m).toLong} % $PqK") + 1L)
          .cast("int"))).reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").asc, col("vec_id").asc)
    codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc.cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc"), col("rn"))
  }

  /** Shared oracle CTE chain ending in `dd` = (vec_id, ds0..ds{M−1})
    * — the per-subspace squared-distance arrays to every PQ centroid —
    * consumed by both [[pqCodeSql]] and [[ivfPqSql]]. */
  private def pqDdCtes(sub: Int): String = {
    val cents = pqCentroids(sub)
    def centList(m: Int, k: Int): String =
      cents(m)(k).mkString("[", ", ", "]")
    def centNorm(m: Int, k: Int): Long =
      cents(m)(k).map(x => x * x).sum
    val dotCols = (for (m <- 0 until PqM; k <- 0 until PqK) yield
      s"""CAST(list_sum(list_transform(generate_series(1, $sub),
         |  i -> q[CAST(${m * sub} + i AS INT)] * (${centList(m, k)})[CAST(i AS INT)]))
         |  AS BIGINT) AS d$m$k""".stripMargin).mkString(",\n")
    val nrmCols = (0 until PqM).map(m =>
      s"""CAST(list_sum(list_transform(generate_series(1, $sub),
         |  i -> q[CAST(${m * sub} + i AS INT)] * q[CAST(${m * sub} + i AS INT)]))
         |  AS BIGINT) AS n$m""".stripMargin).mkString(",\n")
    val dsCols = (0 until PqM).map(m =>
      "[" + (0 until PqK).map(k =>
        s"n$m - 2*d$m$k + ${centNorm(m, k)}").mkString(", ") + s"] AS ds$m")
      .mkString(",\n")
    s"""qq AS (SELECT vec_id,
       |        list_transform(embedding,
       |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |       FROM embeddings),
       |mm AS (SELECT vec_id,
       |$nrmCols,
       |$dotCols
       |FROM qq),
       |dd AS (SELECT vec_id,
       |$dsCols
       |FROM mm)""".stripMargin
  }

  /** Packed-code / total-error SQL over `dd`'s ds arrays. */
  private val pqCodeExpr: String = (0 until PqM).map(m =>
    s"(list_position(ds$m, list_min(ds$m)) - 1) * ${math.pow(PqK, m).toLong}")
    .mkString(" + ")
  private val pqErrExpr: String =
    (0 until PqM).map(m => s"list_min(ds$m)").mkString(" + ")

  val pqCodeSql: String =
    // sub = 16: embeddings are 64-dim (asserted in spec); 64 / PqM
    s"""WITH ${pqDdCtes(16)}
       |SELECT vec_id, CAST($pqCodeExpr AS BIGINT) AS code,
       |       CAST($pqErrExpr AS BIGINT) AS qerr
       |FROM dd""".stripMargin

  /** Fixed ADC query set size — a plan-time CONSTANT (same rule as the
    * brute-force query set): the broadcast is O(NQ) at any corpus
    * size. */
  private val PqNQ = 8

  /** q_ivf_pq — the PRODUCTION ANN shape (Jégou et al.'s ADC search,
    * the scan IVF-PQ indexes run inside each probed cell): corpus
    * vectors are represented ONLY by their packed PQ code; each query
    * precomputes a per-subspace lookup table of squared distances to
    * every centroid (M·K entries), and a candidate's approximate
    * distance is M table lookups on its code — no embedding arithmetic
    * per pair. Top-3 per query by exact (adc, vec_id) order via the
    * rank-filter idiom (WindowGroupLimit / TopKPerKey — per-partition
    * heap, no corpus sort). Scale shape: the LUT side is NQ rows
    * broadcast; the corpus side carries an 8-byte id + 1-byte code —
    * the 100 TB embedding corpus scans as ~9 bytes/vector. All
    * distances exact integers (the quantized-vector norms/dots), so
    * ranking is bit-stable across engines.
    */
  def qIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val sub = dim(spark, dir) / PqM
    val cents = pqCentroids(sub)
    val withDs = pqSubspaceDs(
      quantized(spark, dir).select(col("vec_id"), col("q")), cents, sub)
    val codes = withDs.select(col("vec_id"), pqPackedCode.as("code"))
    adcTopK(codes, pqLuts(spark, dir, cents))
  }

  val ivfPqSql: String = {
    val lutTerms = (0 until PqM).map { m =>
      val p = math.pow(PqK, m).toLong
      s"q.lut$m[CAST(c.code // $p % $PqK + 1 AS INT)]"
    }.mkString(" + ")
    val lutCols = (0 until PqM).map(m => s"ds$m AS lut$m").mkString(", ")
    s"""WITH ${pqDdCtes(16)},
       |cc AS (SELECT vec_id, CAST($pqCodeExpr AS BIGINT) AS code FROM dd),
       |qs AS (SELECT vec_id AS query_id, $lutCols FROM dd
       |       WHERE vec_id < $PqNQ),
       |pairs AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |                 CAST($lutTerms AS BIGINT) AS adc
       |          FROM cc c, qs q WHERE c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, adc,
       |       row_number() OVER (PARTITION BY query_id
       |         ORDER BY adc, neighbor_id) AS rn
       |FROM pairs QUALIFY rn <= 3""".stripMargin
  }

  /** q_embed_outliers — embedding sanity screening (the guard before
    * any ANN index build: near-zero or exploded vectors poison every
    * cosine): per vector, the exact integer squared norm against the
    * corpus MEDIAN norm — flagged low (4·norm < median) or high
    * (norm > 4·median). The median is a 1-row exact-percentile
    * aggregate broadcast back over the corpus (same shape as
    * q_top_share's global total). SCALE CAVEAT: Spark's exact
    * `percentile` buffers all norm values in aggregation state — O(n)
    * driver-side memory at 100 TB. The scale-safe substitutes are
    * `approx_percentile` (breaks bit-exact oracle parity, fine in
    * production) or a bounded histogram over integer norms (norms here
    * are small integers, so a count-per-norm groupBy + running-sum
    * median is exact AND bounded); the exact aggregate is kept only
    * for the hash-compared oracle path. The comparison multiplies the
    * INTEGER norm (the median, an interpolated half-integer, is the
    * identical double in both engines; integer·4 stays exact) so the
    * flags cannot flake at a boundary. One corpus scan, zero joins on
    * the corpus side.
    */
  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir).select(col("vec_id"), col("nrm"))
    val med = v.agg(expr("percentile(nrm, 0.5)").as("med_nrm"))
    v.crossJoin(broadcast(med))
      .select(col("vec_id"), col("nrm"),
        (col("nrm") * 4L < col("med_nrm")).cast("int").as("flag_low"),
        (col("nrm") > col("med_nrm") * 4d).cast("int").as("flag_high"))
  }

  val embedOutliersSql: String =
    s"""WITH $quantizedSql,
       |m AS (SELECT quantile_cont(nrm, 0.5) AS med_nrm FROM qn)
       |SELECT vec_id, nrm,
       |       CAST(nrm * 4 < med_nrm AS INT) AS flag_low,
       |       CAST(nrm > med_nrm * 4 AS INT) AS flag_high
       |FROM qn, m""".stripMargin

  /** q_embed_norm_hist — embedding-norm magnitude histogram, the
    * EMBEDDING-PIPELINE health check run before any similarity work:
    * collapsed (near-zero) vectors silently poison cosine math (they
    * land in LSH bucket 0 and match everything weakly), and
    * magnitude-inflated ones dominate un-normalized dot products. Buckets
    * are DECIMAL DIGIT COUNTS of the integer squared norm — a log10
    * histogram computed engine-exactly as string length of a
    * nonnegative BIGINT, no libm. One codegen'd projection over the
    * shared quantized frame + a ≤20-bucket aggregate (a BIGINT has at
    * most 19 digits): corpus-linear scan, constant-size output,
    * map-side combinable.
    */
  def qEmbedNormHist(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
      .groupBy(length(col("nrm").cast("string")).as("nrm_digits"))
      .agg(count(lit(1)).as("n_vectors"),
        min("nrm").as("min_nrm"), max("nrm").as("max_nrm"))

  val embedNormHistSql: String =
    s"""WITH $quantizedSql
       |SELECT CAST(length(CAST(nrm AS VARCHAR)) AS INT) AS nrm_digits,
       |       COUNT(*) AS n_vectors,
       |       MIN(nrm) AS min_nrm, MAX(nrm) AS max_nrm
       |FROM qn
       |GROUP BY 1""".stripMargin

  /** q_bitext_mine — parallel-corpus mining (LASER/CCMatrix shape): for
    * each vector, its best CROSS-LABEL match (label ≈ language) above a
    * cosine floor, candidates restricted to the same sign-LSH bucket.
    * The same in-row bucketing as [[qAnnLsh]] — the only join is bucket
    * equality with the hot-bucket cap, pair work (n/2^planes)² per
    * bucket, and the top-1-per-query rank runs on the already-joined
    * frame. The mined (src, tgt, score) triples are exactly what a
    * translation-pair training set ingests.
    */
  def qBitextMine(spark: SparkSession, dir: String): DataFrame = {
    val d = dim(spark, dir)
    val planes = annPlanes(spark, dir)
    val pw = planeWeights(d, planes)
    val planeDot = (p: Int) => dot(col("q"), typedLit(pw(p).toSeq))
    val bucket = (0 until planes)
      .map(p => when(planeDot(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    val v = capBuckets(
      Tables.fanOut(Tables.embeddings(spark, dir)).select(
        col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("q"))
        .withColumn("nrm", vecDot(col("q"), col("q")))
        .withColumn("bucket", bucket))
    val a = v.select(col("vec_id").as("src_id"), col("label").as("src_label"),
      col("bucket"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("tgt_id"), col("label").as("tgt_label"),
      col("bucket").as("bucket_b"), col("q").as("qb"), col("nrm").as("nb"))
    val rk = Window.partitionBy("src_id")
      .orderBy(col("cos").desc, col("tgt_id"))
    a.join(b, col("bucket") === col("bucket_b") &&
        col("src_label") =!= col("tgt_label"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cos") >= 0.3)
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(col("src_id"), col("src_label"), col("tgt_id"),
        col("tgt_label"), round(col("cos"), 6).as("cosine"))
  }

  val bitextMineSql: String = {
    val wExpr = hash60Sql("CAST(p AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")
    s"""WITH q0 AS (SELECT vec_id, label,
       |        list_transform(embedding,
       |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |       FROM embeddings),
       |qn AS (SELECT vec_id, label, q,
       |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
       |       FROM q0),
       |bp AS (SELECT vec_id, p,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          i -> q[i] * ($wExpr % 2001 - 1000))) AS BIGINT) AS dotp
       |       FROM qn, (SELECT unnest(generate_series(0, $annPlanesSql - 1)) AS p) planes),
       |bk AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN dotp >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bp GROUP BY vec_id),
       |vb0 AS (SELECT qn.vec_id, qn.label, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN bk ON qn.vec_id = bk.vec_id),
       |vb AS (SELECT * FROM vb0
       |       QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= $maxBucket),
       |p2 AS (SELECT a.vec_id AS src_id, a.label AS src_label,
       |        b.vec_id AS tgt_id, b.label AS tgt_label,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |       FROM vb a JOIN vb b
       |         ON a.bucket = b.bucket AND a.label <> b.label)
       |SELECT src_id, src_label, tgt_id, tgt_label,
       |       round(cos, 6) AS cosine
       |FROM p2
       |WHERE cos >= 0.3
       |QUALIFY row_number() OVER (PARTITION BY src_id
       |          ORDER BY cos DESC, tgt_id) = 1""".stripMargin
  }

  /** q_ann_recall — the ANN acceptance test, AS AN OPERATOR: recall@3
    * of both LSH variants against exact brute-force ground truth over
    * the fixed query set. Every ANN deployment runs exactly this before
    * trusting an index configuration (and after every re-tune of
    * planes/bands/cells); keeping it as a first-class query means the
    * recall/cost dial is measured by the engine itself, not a notebook.
    * Composition, not re-implementation: ground truth = q_embed_cosine
    * _topk cut to rank ≤ 3; candidates = q_ann_lsh / q_ann_lsh_bands
    * filtered to the query set; hits are LEFT SEMI joins on the
    * (query, neighbor) pair, counted per query — all frames bounded by
    * |queries|·3, so the diagnostic costs the two index probes plus the
    * constant-size ground truth, never a second corpus pass. Expected
    * shape: hits_bands ≥ hits_lsh per query (band 0 of the 2-band
    * variant is an independent plane set, not a superset — the
    * invariant spec checks the MEAN, not per-row dominance).
    */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = qEmbedCosineTopk(spark, dir).filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"))
    val lsh = qAnnLsh(spark, dir)
      .filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("l_vec"), col("neighbor_id").as("l_n"))
    val bands = qAnnLshBands(spark, dir)
      .filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("b_vec"), col("neighbor_id").as("b_n"))
    val hitsLsh = exact.join(lsh,
        col("vec_id") === col("l_vec") && col("neighbor_id") === col("l_n"),
        "left_semi")
      .groupBy("vec_id").agg(count(lit(1)).as("hits_lsh"))
    val hitsBands = exact.join(bands,
        col("vec_id") === col("b_vec") && col("neighbor_id") === col("b_n"),
        "left_semi")
      .groupBy("vec_id").agg(count(lit(1)).as("hits_bands"))
    exact.groupBy("vec_id").agg(count(lit(1)).as("n_exact"))
      .join(hitsLsh, Seq("vec_id"), "left_outer")
      .join(hitsBands, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("n_exact"),
        coalesce(col("hits_lsh"), lit(0L)).as("hits_lsh"),
        coalesce(col("hits_bands"), lit(0L)).as("hits_bands"))
      .withColumn("recall_lsh_ppm",
        expr("hits_lsh * 1000000 div n_exact"))
      .withColumn("recall_bands_ppm",
        expr("hits_bands * 1000000 div n_exact"))
  }

  val annRecallSql: String =
    s"""WITH ex AS (SELECT vec_id, neighbor_id
       |           FROM ($embedCosineTopkSql) WHERE rn <= 3),
       |l AS (SELECT vec_id, neighbor_id FROM ($annLshSql)
       |      WHERE vec_id < $QuerySetSize),
       |bn AS (SELECT vec_id, neighbor_id FROM ($annLshBandsSql)
       |       WHERE vec_id < $QuerySetSize),
       |hl AS (SELECT ex.vec_id, COUNT(*) AS hits_lsh
       |       FROM ex JOIN l ON ex.vec_id = l.vec_id
       |         AND ex.neighbor_id = l.neighbor_id
       |       GROUP BY 1),
       |hb AS (SELECT ex.vec_id, COUNT(*) AS hits_bands
       |       FROM ex JOIN bn ON ex.vec_id = bn.vec_id
       |         AND ex.neighbor_id = bn.neighbor_id
       |       GROUP BY 1),
       |n AS (SELECT vec_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
       |SELECT n.vec_id, n.n_exact,
       |       coalesce(hl.hits_lsh, 0) AS hits_lsh,
       |       coalesce(hb.hits_bands, 0) AS hits_bands,
       |       coalesce(hl.hits_lsh, 0) * 1000000 // n.n_exact
       |         AS recall_lsh_ppm,
       |       coalesce(hb.hits_bands, 0) * 1000000 // n.n_exact
       |         AS recall_bands_ppm
       |FROM n LEFT JOIN hl ON n.vec_id = hl.vec_id
       |       LEFT JOIN hb ON n.vec_id = hb.vec_id""".stripMargin

  /** q_pq_recall — the ACCEPTANCE test for the production ANN scan:
    * recall@3 of the IVF-PQ ADC results ([[qIvfPq]]) against exact
    * ground truth IN THE SCAN'S OWN METRIC (integer L2 over the
    * full-precision vectors — grading ADC against cosine truth would
    * conflate metric choice with quantization loss, and the acceptance
    * question is the latter). q_ann_recall grades the LSH variants;
    * this grades the path a deployment ships (~9 B/vector ADC) — the
    * number that decides whether the PQ codebook trains further or
    * ships. At fixture scale the verdict is a TRUE ZERO: the demo
    * M=4×K=4 plan-time codebook (256 codes for 500+ random vectors —
    * chosen to exercise the plan SHAPE, q_ivf_pq's contract) measures
    * a median true-L2 rank of ~172/500 for its picks, and this
    * operator is exactly the check that catches it (cross-checked by a
    * from-scratch JVM twin in Round7dOperatorSpec). Truth is the same
    * K·n constant-broadcast pass as q_embed_cosine_topk; everything
    * after is |Q|·3-bounded.
    */
  def qPqRecall(spark: SparkSession, dir: String): DataFrame = {
    // ground truth in the SCAN'S OWN metric — exact integer L2 over the
    // full-precision quantized vectors (ADC approximates L2; grading it
    // against cosine truth would conflate metric choice with
    // quantization loss, and the acceptance question is the latter)
    val v = quantized(spark, dir)
    val a = v.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("d2").asc, col("neighbor_id"))
    val truth = broadcast(a).crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("d2",
        col("na") - lit(2L) * dot(col("qa"), col("qb")) + col("nb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"))
    val pq = qIvfPq(spark, dir)
      .select(col("query_id").as("vec_id"), col("neighbor_id"))
    val hits = truth.join(pq, Seq("vec_id", "neighbor_id"))
      .agg(count(lit(1)).as("hits"))
    val poss = truth.agg(count(lit(1)).as("possible"))
    hits.crossJoin(broadcast(poss))
      .select(col("hits"), col("possible"),
        expr("hits * 1000000 div possible").as("recall_ppm"))
  }

  lazy val pqRecallSql: String =
    s"""WITH $quantizedSql,
       |t0 AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |        a.nrm - 2 * CAST(list_sum(list_transform(
       |          generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS BIGINT) + b.nrm AS d2
       |       FROM qn a, qn b
       |       WHERE a.vec_id < $QuerySetSize AND a.vec_id <> b.vec_id),
       |t AS (SELECT vec_id, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY d2 ASC, neighbor_id) AS rn
       |  FROM t0) WHERE rn <= 3),
       |p AS (SELECT query_id AS vec_id, neighbor_id FROM ($ivfPqSql)),
       |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits
       |      FROM t JOIN p USING (vec_id, neighbor_id)),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS possible FROM t)
       |SELECT h.hits, n.possible, h.hits * 1000000 // n.possible
       |         AS recall_ppm
       |FROM h CROSS JOIN n""".stripMargin

  /** q_sq8_error — SCALAR 8-bit quantization (the SQ8 index format:
    * per-DIMENSION min/max from the corpus, each component mapped to a
    * 0..255 code) + reconstruction-error accounting. The memory story
    * between float32 and PQ: d bytes/vector with no codebook training,
    * and the error table below is the acceptance check run before an
    * index ships. ALL-INTEGER: on the milli-quantized corpus, code =
    * ((x−mn)·255) div (mx−mn) and the reconstruction residual is kept
    * in ×255·(mx−mn) fixed point — `abs((x−mn)·255 − code·(mx−mn))` —
    * so every output is an exact integer in both engines. Scale shape:
    * one corpus posexplode (n·d narrow rows), the per-dim min/max
    * frame is d-ROWS (broadcast back), zero corpus self-joins, n-row
    * output.
    */
  def qSq8Error(spark: SparkSession, dir: String): DataFrame = {
    val x = quantized(spark, dir)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("d", "x")))
    val dims = x.groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
    x.join(broadcast(dims), "d")
      .withColumn("code", when(col("mx") > col("mn"),
        expr("((x - mn) * 255) div (mx - mn)")).otherwise(0L))
      .withColumn("err", abs((col("x") - col("mn")) * 255L
        - col("code") * (col("mx") - col("mn"))))
      .groupBy("vec_id")
      .agg(sum("err").as("abs_err_x255"),
        max("err").as("max_err_x255"),
        sum("code").as("code_sum"))
  }

  val sq8ErrorSql: String =
    s"""WITH $quantizedSql,
       |e AS (SELECT vec_id, unnest(generate_series(1, len(q))) AS i, q
       |      FROM qn),
       |x AS (SELECT vec_id, i AS d, q[i] AS x FROM e),
       |dm AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY d),
       |c AS (SELECT vec_id, x.x, dm.mn, dm.mx,
       |             CASE WHEN dm.mx > dm.mn
       |                  THEN ((x.x - dm.mn) * 255) // (dm.mx - dm.mn)
       |                  ELSE 0 END AS code
       |      FROM x JOIN dm ON x.d = dm.d)
       |SELECT vec_id,
       |       CAST(SUM(abs((x - mn) * 255 - code * (mx - mn))) AS BIGINT)
       |         AS abs_err_x255,
       |       CAST(MAX(abs((x - mn) * 255 - code * (mx - mn))) AS BIGINT)
       |         AS max_err_x255,
       |       CAST(SUM(code) AS BIGINT) AS code_sum
       |FROM c GROUP BY vec_id""".stripMargin

  /** q_dim_variance — embedding ANISOTROPY table: per-dimension mean
    * and variance share of the corpus. The index-health read before any
    * cosine/LSH work — a dimension hoarding most of the variance means
    * the embedding collapsed (rogue feature, bad normalization) and
    * dominates every dot product; dead dimensions waste index bytes.
    * ALL-INTEGER: per-dim n/Σx/Σx² are exact, the mean is an
    * offset-shifted truncating division (nonnegative through the
    * shift, so Spark `div` == DuckDB `//`), and the variance is the
    * exact identity Σ(x−m)² = Σx² − 2mΣx + nm² about that integer mean
    * — no n·Σx² product, so the arithmetic stays in int64 at any
    * corpus size. One corpus posexplode, d-row aggregate, 1-row total
    * broadcast back; d-row output.
    */
  def qDimVariance(spark: SparkSession, dir: String): DataFrame = {
    val x = quantized(spark, dir)
      .select(posexplode(col("q")).as(Seq("d", "x")))
    val per = x.groupBy("d")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .withColumn("m", expr("(s1 + n * 100000) div n - 100000"))
      .withColumn("var_sum",
        col("s2") - lit(2L) * col("m") * col("s1")
          + col("n") * col("m") * col("m"))
    val tot = per.agg(sum("var_sum").as("tot_var"))
    per.crossJoin(broadcast(tot))
      .select(col("d").cast("long").as("d"), col("n"),
        col("m").as("mean_milli"), col("var_sum"),
        // greatest(...,1): an all-constant corpus has tot_var = 0 —
        // Spark would yield NULL but the DuckDB oracle errors on // 0;
        // every per-dim var_sum is 0 too, so the shares come out 0
        // identically in both engines (ADVICE_r07)
        expr("var_sum * 1000000 div greatest(tot_var, 1L)").as("share_ppm"))
  }

  val dimVarianceSql: String =
    s"""WITH $quantizedSql,
       |e AS (SELECT vec_id, unnest(generate_series(1, len(q))) AS i, q
       |      FROM qn),
       |x AS (SELECT i - 1 AS d, q[i] AS x FROM e),
       |p AS (SELECT d, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
       |             CAST(SUM(x * x) AS BIGINT) AS s2
       |      FROM x GROUP BY d),
       |mm AS (SELECT *, (s1 + n * 100000) // n - 100000 AS m FROM p),
       |v AS (SELECT d, n, m AS mean_milli,
       |             s2 - 2 * m * s1 + n * m * m AS var_sum
       |      FROM mm),
       |t AS (SELECT CAST(SUM(var_sum) AS BIGINT) AS tot_var FROM v)
       |SELECT CAST(d AS BIGINT) AS d, n, mean_milli, var_sum,
       |       var_sum * 1000000 // GREATEST(tot_var, 1) AS share_ppm
       |FROM v CROSS JOIN t""".stripMargin

  /** q_power_iter — ONE power-iteration step toward the corpus's top
    * principal direction: w = A·v₀ where A = Σᵢ qᵢqᵢᵀ, computed WITHOUT
    * ever forming A as w = Σᵢ (qᵢ·v₀)·qᵢ — one corpus pass, exact
    * integers end to end. This is the estimation step behind the
    * "all-but-the-top" embedding post-process (Mu & Viswanath 2018:
    * remove the top PC that [[qDimVariance]] shows hoarding variance)
    * and the spectral sanity check an index build wants next to the
    * per-dim variance table (a dominant Rayleigh quotient = anisotropy
    * that hurts cosine retrieval).
    *
    * The start vector is GENERATED FROM THE INDEX in-row
    * (v₀[j] = (j·37) mod 7 − 3, a deterministic mixed pattern with no
    * dimension-count assumption and no broadcast) so both engines build
    * the identical v₀ with zero data movement. Emitted per dimension:
    * the unnormalized iterate component w (normalize off-engine — a
    * norm needs sqrt, and the DIRECTION is what the post-process
    * consumes), plus the Rayleigh-quotient numerator Σ(qᵢ·v₀)² and n
    * riding every row (v₀ᵀv₀ is a plan-side constant the consumer
    * already knows).
    *
    * Scale shape: the per-vector dot runs as the native codegen'd
    * [[graft.functions.LongVectorDot]] loop, the d-vector sum as the
    * native vec_sum aggregate — the ONLY exchange moves one d-long
    * partial buffer per partition (the q_kmeans_step argument), and the
    * output is d rows at any corpus size. Overflow headroom: |q·v₀| ≤
    * 3000·d ≈ 2·10⁵ at d=64, so Σ dt·q stays < 10¹⁵ and Σ dt² < 10¹⁸
    * even at 5M vectors — inside int64.
    */
  def qPowerIter(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
      .withColumn("v0",
        expr("transform(q, (x, j) -> CAST((j * 37) % 7 - 3 AS BIGINT))"))
      .withColumn("dt", dot(col("q"), col("v0")))
      .agg(
        graft.functions.LongVectorSum.vecSum(
          expr("transform(q, x -> x * dt)")).as("wsum"),
        sum(expr("dt * dt")).as("rq_num"),
        count(lit(1)).as("n_vectors"))
      .select(col("n_vectors"), col("rq_num"),
        posexplode(col("wsum")).as(Seq("pos", "w")))
      .select((col("pos") + 1).cast("int").as("dim"), col("w"),
        col("n_vectors"), col("rq_num"))

  val powerIterSql: String =
    s"""WITH $quantizedSql,
       |d AS (SELECT vec_id, q,
       |        CAST(list_sum(list_transform(generate_series(1, len(q)),
       |          j -> q[j] * (((j - 1) * 37) % 7 - 3))) AS BIGINT) AS dt
       |      FROM qn),
       |e AS (SELECT unnest(generate_series(1, len(q))) AS dim, q, dt
       |      FROM d)
       |SELECT CAST(dim AS INT) AS dim,
       |       CAST(SUM(q[dim] * dt) AS BIGINT) AS w,
       |       COUNT(*) AS n_vectors,
       |       CAST(SUM(dt * dt) AS BIGINT) AS rq_num
       |FROM e GROUP BY dim""".stripMargin

  /** Matryoshka truncation tiers for [[qMrlRecall]] — plan-time
    * constants (the MRL contract: an index can serve the first 16 or 32
    * of 64 dims and keep most of the ranking). */
  private val MrlPrefixes = Seq(16L, 32L)

  /** q_mrl_recall — MATRYOSHKA retrieval-quality check (Kusupati et
    * al. 2022): recall@3 of PREFIX-dimension cosine search (first
    * 16/32 of the embedding) against full-dimension exact ground
    * truth, over the constant query set. The table a deployment reads
    * before switching its ANN index to truncated vectors — a 4×
    * memory/bandwidth cut if recall holds. Same K·n brute-force shape
    * as q_embed_cosine_topk (the |Q|×|tiers| side broadcasts, the
    * corpus streams past ONCE), prefix dots/norms are exact integer
    * arithmetic via `slice`, ground truth is the shared materialized
    * top-k frame, and every post-pair frame is |Q|·3-bounded.
    */
  def qMrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val truth = qEmbedCosineTopk(spark, dir).filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"))
    val tiers = spark.range(1)
      .select(explode(typedLit(MrlPrefixes)).as("prefix_dim"))
    val a = v.filter(col("vec_id") < QuerySetSize)
      .crossJoin(broadcast(tiers))
      .select(col("vec_id"), col("prefix_dim"),
        slice(col("q"), lit(1), col("prefix_dim").cast("int")).as("qa"))
      .withColumn("na", dot(col("qa"), col("qa")))
    val b = v.select(col("vec_id").as("neighbor_id"), col("q").as("qb"))
    val w = Window.partitionBy("prefix_dim", "vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val pk = broadcast(a).crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("qbp",
        slice(col("qb"), lit(1), col("prefix_dim").cast("int")))
      .withColumn("nb", dot(col("qbp"), col("qbp")))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qbp")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("prefix_dim"), col("vec_id"), col("neighbor_id"))
    val poss = truth.agg(count(lit(1)).as("possible"))
    pk.join(truth.withColumn("hit", lit(1L)),
        Seq("vec_id", "neighbor_id"), "left")
      .groupBy("prefix_dim")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .crossJoin(broadcast(poss))
      .select(col("prefix_dim"), col("hits"), col("possible"),
        expr("hits * 1000000 div possible").as("recall_ppm"))
  }

  val mrlRecallSql: String = {
    val prefList = MrlPrefixes.mkString("[", ", ", "]")
    def pdot(a: String, b: String) =
      s"CAST(list_sum(list_transform(generate_series(1, t.prefix_dim)," +
        s" i -> $a.q[i] * $b.q[i])) AS BIGINT)"
    s"""WITH $quantizedSql,
       |tr0 AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |          i -> a.q[i] * b.q[i])) AS DOUBLE)
       |          / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |        FROM qn a, qn b
       |        WHERE a.vec_id < $QuerySetSize AND a.vec_id <> b.vec_id),
       |truth AS (SELECT vec_id, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM tr0) WHERE rn <= 3),
       |tiers AS (SELECT CAST(unnest($prefList) AS BIGINT) AS prefix_dim),
       |pr0 AS (SELECT t.prefix_dim, a.vec_id, b.vec_id AS neighbor_id,
       |        CAST(${pdot("a", "b")} AS DOUBLE)
       |          / sqrt(CAST(${pdot("a", "a")} * ${pdot("b", "b")}
       |                      AS DOUBLE)) AS cos
       |        FROM tiers t, qn a, qn b
       |        WHERE a.vec_id < $QuerySetSize AND a.vec_id <> b.vec_id),
       |pk AS (SELECT prefix_dim, vec_id, neighbor_id FROM (
       |  SELECT prefix_dim, vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY prefix_dim, vec_id
       |           ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM pr0) WHERE rn <= 3),
       |poss AS (SELECT CAST(COUNT(*) AS BIGINT) AS possible FROM truth)
       |SELECT p.prefix_dim,
       |       CAST(COUNT(tr.vec_id) AS BIGINT) AS hits,
       |       MAX(poss.possible) AS possible,
       |       CAST(COUNT(tr.vec_id) AS BIGINT) * 1000000
       |         // MAX(poss.possible) AS recall_ppm
       |FROM pk p
       |LEFT JOIN truth tr ON p.vec_id = tr.vec_id
       |  AND p.neighbor_id = tr.neighbor_id
       |CROSS JOIN poss
       |GROUP BY p.prefix_dim""".stripMargin
  }

  /** Exact integer RRF weights: 238266 = 61·62·63 (pairwise coprime →
    * their lcm), so 238266/(60+rn) is an EXACT integer for every rank
    * the two top-3 lists can emit — fused scores compare as integers,
    * never as float sums of 1/(60+r). */
  private val RrfLcm = 238266L

  /** q_rank_fusion — reciprocal-rank fusion (Cormack et al.'s RRF, the
    * standard hybrid-retrieval combiner) of the two independent ANN
    * candidate lists: sign-LSH (data-blind hyperplanes) and IVF
    * (data-adaptive cells). score(q,n) = Σ_lists 1/(60+rank),
    * integer-scaled by [[RrfLcm]]; top-3 fused per query with
    * (score, neighbor) tie order. The production rationale: the two
    * index families fail DIFFERENTLY (a pair split by hyperplanes can
    * share an IVF cell and vice versa), so the fusion recovers recall
    * neither list has alone — `n_lists` shows which fused rows came
    * from both. Rides the two MATERIALIZED result frames (no index
    * recompute); everything after is |results|-bounded: one union, one
    * 8-byte-key groupBy, one per-query top-3 window.
    */
  def qRankFusion(spark: SparkSession, dir: String): DataFrame = {
    def scored(df: DataFrame) = df.select(col("vec_id"), col("neighbor_id"),
      expr(s"$RrfLcm div (60 + rn)").as("s"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("rrf_x").desc, col("neighbor_id"))
    scored(qAnnLsh(spark, dir)).union(scored(qAnnIvf(spark, dir)))
      .groupBy("vec_id", "neighbor_id")
      .agg(sum("s").as("rrf_x"), count(lit(1)).as("n_lists"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rrf_x"),
        col("n_lists"), col("rn"))
  }

  val rankFusionSql: String =
    s"""WITH lsh AS (SELECT vec_id, neighbor_id, rn FROM ($annLshSql)),
       |ivf AS (SELECT vec_id, neighbor_id, rn FROM ($annIvfSql)),
       |u AS (SELECT vec_id, neighbor_id, $RrfLcm // (60 + rn) AS s FROM lsh
       |      UNION ALL
       |      SELECT vec_id, neighbor_id, $RrfLcm // (60 + rn) AS s FROM ivf),
       |g AS (SELECT vec_id, neighbor_id, CAST(SUM(s) AS BIGINT) AS rrf_x,
       |             CAST(COUNT(*) AS BIGINT) AS n_lists
       |      FROM u GROUP BY vec_id, neighbor_id)
       |SELECT vec_id, neighbor_id, rrf_x, n_lists,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY rrf_x DESC, neighbor_id) AS rn
       |FROM g QUALIFY rn <= 3""".stripMargin

  /** q_hard_negatives — contrastive-training hard-negative mining: for
    * each query vector, the top-3 highest-cosine neighbors with a
    * DIFFERENT class label — the negatives that sit closest to the
    * decision boundary, which is what contrastive losses (InfoNCE,
    * triplet) want in the batch. Same K·n broadcast shape as the
    * brute-force baseline (|Q| constant, corpus streams past once);
    * labels ride the same single scan as the vectors — no corpus-side
    * join anywhere. Exact integer dots; rounded cosine.
    */
  def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.fanOut(Tables.embeddings(spark, dir)).select(
      col("vec_id"), col("label").cast("long").as("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm", vecDot(col("q"), col("q")))
    val a = base.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id"), col("label").as("query_label"),
        col("q").as("qa"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("neighbor_id"),
      col("label").as("neg_label"), col("q").as("qb"), col("nrm").as("nb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(a).crossJoin(b)
      .filter(col("query_label") =!= col("neg_label"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("query_label"), col("neighbor_id"),
        col("neg_label"), round(col("cos"), 6).as("cosine"), col("rn"))
  }

  val hardNegativesSql: String =
    s"""WITH ql AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |        list_transform(embedding,
       |          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |       FROM embeddings),
       |qnl AS (SELECT vec_id, label, q,
       |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
       |        FROM ql),
       |p AS (SELECT a.vec_id AS vec_id, a.label AS query_label,
       |       b.vec_id AS neighbor_id, b.label AS neg_label,
       |       CAST(list_sum(list_transform(generate_series(1, len(a.q)),
       |         i -> a.q[i] * b.q[i])) AS DOUBLE)
       |         / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cos
       |      FROM qnl a, qnl b
       |      WHERE a.vec_id < $QuerySetSize AND a.label <> b.label)
       |SELECT vec_id, query_label, neighbor_id, neg_label,
       |       round(cos, 6) AS cosine,
       |       row_number() OVER (PARTITION BY vec_id
       |         ORDER BY cos DESC, neighbor_id) AS rn
       |FROM p QUALIFY rn <= 3""".stripMargin

  /** NDCG discount weights as PLAN-TIME integer constants:
    * w(i) = round(10⁶ / log₂(i+1)) for ranks 1..5, computed ONCE on the
    * JVM and interpolated as the SAME literals into both the Spark plan
    * and the oracle SQL — the established device for libm-dependent
    * constants (plane weights, trig tables): neither engine evaluates
    * log₂ at query time, so there is no cross-libm ulp to diverge on. */
  private val ndcgW: IndexedSeq[Long] =
    (1 to 5).map(i => math.round(1e6 / (math.log(i + 1) / math.log(2))))
  /** Ideal-DCG prefix sums: idcgPrefix(r) = Σ w(1..r) — the best
    * achievable DCG when exactly r of the top-5 are relevant. */
  private val ndcgIdcgPrefix: IndexedSeq[Long] = ndcgW.scanLeft(0L)(_ + _)

  /** q_ndcg — retrieval-quality scorecard (NDCG@5 + MRR) for the
    * brute-force neighbor lists, using the embedding LABEL as graded
    * relevance (neighbor relevant ⇔ it shares the query's label): the
    * eval harness every retrieval stack runs after an index or
    * embedding change, next to [[qAnnRecall]]'s overlap-recall (recall
    * says "did the ANN find the true neighbors"; NDCG says "are the
    * true neighbors any good for the task the labels encode").
    * Per query: n_rel, integer DCG = Σ rel·w(rank), ideal DCG from the
    * prefix table, ndcg_ppm = DCG·10⁶ div max(IDCG,1) (0 when nothing
    * relevant — guarded like q_dim_variance), and mrr_ppm = 10⁶ div
    * first-relevant-rank (0 when none). All int64; the discount weights
    * are plan-time constants (see [[ndcgW]]).
    *
    * Scale shape: rides the materialized |Q|·5-row [[qEmbedCosineTopk]]
    * frame — the scorecard itself never rescans the corpus; the two
    * label lookups broadcast the 250-row list against the narrow
    * (vec_id, label) projection, so each is one column-pruned scan of
    * the label column and the output is |Q| rows at any corpus size. */
  def qNdcg(spark: SparkSession, dir: String): DataFrame = {
    val topk = qEmbedCosineTopk(spark, dir)
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val wCase = (1 to 5)
      .map(i => s"WHEN rn = $i THEN ${ndcgW(i - 1)}L")
      .mkString("CASE ", " ", " ELSE 0L END")
    val idcgCase = (0 to 5)
      .map(r => s"WHEN n_rel = $r THEN ${ndcgIdcgPrefix(r)}L")
      .mkString("CASE ", " ", " ELSE 0L END")
    broadcast(topk)
      .join(labels.select(col("vec_id"), col("label").as("q_label")), "vec_id")
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
      .withColumn("rel", (col("q_label") === col("n_label")).cast("long"))
      .withColumn("w", expr(wCase))
      .groupBy("vec_id")
      .agg(sum("rel").as("n_rel"),
        sum(expr("rel * w")).as("dcg"),
        min(when(col("rel") === 1, col("rn"))).as("first_rel"))
      .withColumn("idcg", expr(idcgCase))
      .select(col("vec_id"), col("n_rel"), col("dcg"), col("idcg"),
        expr("dcg * 1000000 div greatest(idcg, 1)").as("ndcg_ppm"),
        coalesce(expr("1000000 div first_rel"), lit(0L)).as("mrr_ppm"))
  }

  val ndcgSql: String = {
    val wCase = (1 to 5)
      .map(i => s"WHEN rn = $i THEN ${ndcgW(i - 1)}")
      .mkString("CASE ", " ", " ELSE 0 END")
    val idcgCase = (0 to 5)
      .map(r => s"WHEN n_rel = $r THEN ${ndcgIdcgPrefix(r)}")
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH topk AS (SELECT * FROM ($embedCosineTopkSql)),
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |        FROM embeddings),
       |r AS (SELECT t.vec_id, t.rn,
       |        CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
       |      FROM topk t
       |      JOIN lab ql ON t.vec_id = ql.vec_id
       |      JOIN lab nl ON t.neighbor_id = nl.vec_id),
       |p AS (SELECT vec_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
       |        CAST(SUM(rel * ($wCase)) AS BIGINT) AS dcg,
       |        MIN(CASE WHEN rel = 1 THEN rn END) AS first_rel
       |      FROM r GROUP BY vec_id)
       |SELECT vec_id, n_rel, dcg,
       |       CAST($idcgCase AS BIGINT) AS idcg,
       |       dcg * 1000000 // greatest(CAST($idcgCase AS BIGINT), 1)
       |         AS ndcg_ppm,
       |       CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS mrr_ppm
       |FROM p""".stripMargin
  }

  /** The label set the filtered search admits — a plan-time CONSTANT
    * predicate (an `In` filter, so it pushes to the parquet scan), the
    * way a production filtered-vector-search restricts by tenant /
    * language / freshness metadata. */
  private val FilteredLabels: Seq[Int] = Seq(0, 2, 4, 6, 8)

  /** q_ann_filtered — METADATA-FILTERED vector search: exact top-3
    * cosine for the [[QuerySetSize]]-bounded query set over the corpus
    * slice whose label passes a constant `IN` predicate — the
    * "filtered ANN" serving shape (tenant/lang/date filters) every
    * production vector store needs. This is the PRE-FILTER strategy:
    * the label predicate is an `In` pushed INTO the parquet scan
    * (plan-audited), so only passing rows are quantized and scored —
    * versus post-filtering an unfiltered ANN list, which silently
    * starves queries whose true neighbors fail the filter. The
    * `in_unfiltered_top5` flag measures exactly that starvation: how
    * many filtered-true results the post-filter route would have found
    * (join against the materialized [[qEmbedCosineTopk]] list).
    *
    * Scale shape: broadcast-|Q| × filtered-corpus — one scan with the
    * filter at the reader, K·n' pairs (n' = passing rows); the
    * starvation join is |Q|·3 × |Q|·5 row frames, corpus-free. */
  def qAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val a = v.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id"), col("q").as("qa"), col("nrm").as("na"))
    val b = Tables.fanOut(Tables.embeddings(spark, dir))
      .filter(col("label").isin(FilteredLabels: _*))
      .select(col("vec_id").as("neighbor_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("qb"))
      .withColumn("nb", vecDot(col("qb"), col("qb")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val filtered = broadcast(a).crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val top5 = qEmbedCosineTopk(spark, dir)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("t5"))
    filtered.join(top5, Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"),
        coalesce(col("t5"), lit(0L)).as("in_unfiltered_top5"))
  }

  val annFilteredSql: String = {
    val labs = FilteredLabels.mkString(", ")
    s"""WITH $quantizedSql,
       |b AS (SELECT qn.vec_id AS neighbor_id, qn.q AS qb, qn.nrm AS nb
       |      FROM qn JOIN embeddings e ON qn.vec_id = e.vec_id
       |      WHERE e.label IN ($labs)),
       |a AS (SELECT vec_id, q AS qa, nrm AS na FROM qn
       |      WHERE vec_id < $QuerySetSize),
       |p AS (SELECT a.vec_id, b.neighbor_id,
       |        CAST(list_sum(list_transform(generate_series(1, len(a.qa)),
       |          i -> a.qa[i] * b.qb[i])) AS DOUBLE)
       |          / sqrt(CAST(a.na * b.nb AS DOUBLE)) AS cos
       |      FROM a, b WHERE a.vec_id <> b.neighbor_id),
       |r AS (SELECT vec_id, neighbor_id, cos,
       |        row_number() OVER (PARTITION BY vec_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM p),
       |t5 AS (SELECT vec_id, neighbor_id FROM ($embedCosineTopkSql))
       |SELECT r.vec_id, r.neighbor_id, round(r.cos, 6) AS cosine, r.rn,
       |       CAST(CASE WHEN t5.vec_id IS NOT NULL THEN 1 ELSE 0 END
       |         AS BIGINT) AS in_unfiltered_top5
       |FROM r LEFT JOIN t5 ON r.vec_id = t5.vec_id
       |                   AND r.neighbor_id = t5.neighbor_id
       |WHERE r.rn <= 3""".stripMargin
  }

  /** q_mmr — MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell &
    * Goldstein), the diversity pass a retrieval stack runs between ANN
    * and the consumer: from each query's top-5 candidate list, greedily
    * pick 3 results maximizing λ·rel(d) − (1−λ)·max_{s∈picked}
    * sim(d, s) with λ = 0.7 — the first pick is pure relevance, later
    * picks trade relevance against redundancy with what's already
    * picked (two near-identical top candidates never BOTH survive).
    * ALL-INTEGER scoring: relevance and candidate-pair cosines are the
    * round-6 values ×10⁶, the MMR objective is 7·rel − 3·max_sim in
    * those units (λ exact as 7/10) — argmax compares int64s, never
    * float sums, so the greedy trajectory is engine-exact. Ties break
    * by neighbor_id.
    *
    * Scale shape: rides the MATERIALIZED |Q|·5 [[qEmbedCosineTopk]]
    * frame; the candidate vectors come from ONE corpus scan filtered by
    * a broadcast candidate-id list (≤ 5·|Q| ids), pairwise sims are
    * |Q|·20 rows, and the K=3 greedy unrolls to three joins over those
    * constant-size frames — corpus-free after the one filtered scan.
    */
  def qMmr(spark: SparkSession, dir: String): DataFrame = {
    val cand = qEmbedCosineTopk(spark, dir)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cosine") * 1000000).cast("long").as("rel_x1m"),
        col("rn"))
    val ids = cand.select(col("neighbor_id").as("cid")).distinct()
    val cv = quantized(spark, dir)
      .join(broadcast(ids), col("vec_id") === col("cid"))
      .select(col("cid"), col("q"), col("nrm"))
    val cvA = cv.select(col("cid").as("a_id"), col("q").as("qa"),
      col("nrm").as("na"))
    val cvB = cv.select(col("cid").as("b_id"), col("q").as("qb"),
      col("nrm").as("nb"))
    val sims = cand.select(col("vec_id"), col("neighbor_id").as("a_id"))
      .join(cand.select(col("vec_id").as("v2"), col("neighbor_id").as("b_id")),
        col("vec_id") === col("v2") && col("a_id") =!= col("b_id"))
      .join(broadcast(cvA), "a_id").join(broadcast(cvB), "b_id")
      .select(col("vec_id"), col("a_id"), col("b_id"),
        round(round(cosine(dot(col("qa"), col("qb")), col("na"), col("nb")),
          6) * 1000000).cast("long").as("sim_x1m"))
    val s1 = cand.filter(col("rn") === 1)
      .select(col("vec_id"), col("neighbor_id").as("s1_id"),
        col("rel_x1m").as("s1_rel"))
    // every rn>1 candidate with its similarity to the first pick
    val r1 = cand.filter(col("rn") > 1).as("c")
      .join(s1.as("f"), col("c.vec_id") === col("f.vec_id"))
      .join(sims.as("s"),
        col("s.vec_id") === col("c.vec_id") &&
          col("s.a_id") === col("c.neighbor_id") &&
          col("s.b_id") === col("f.s1_id"))
      .select(col("c.vec_id").as("vec_id"), col("c.neighbor_id").as("neighbor_id"),
        col("c.rel_x1m").as("rel_x1m"), col("s.sim_x1m").as("sim1"))
    val w2 = Window.partitionBy("vec_id")
      .orderBy(col("mmr").desc, col("neighbor_id"))
    val sel2 = r1
      .withColumn("mmr", col("rel_x1m") * 7 - col("sim1") * 3)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("neighbor_id"), col("rel_x1m"), col("mmr"))
    val r2 = r1.as("r")
      .join(sel2.select(col("vec_id").as("v3"), col("neighbor_id").as("s2_id")),
        col("r.vec_id") === col("v3") && col("r.neighbor_id") =!= col("s2_id"))
      .join(sims.as("t"),
        col("t.vec_id") === col("r.vec_id") &&
          col("t.a_id") === col("r.neighbor_id") &&
          col("t.b_id") === col("s2_id"))
      .select(col("r.vec_id").as("vec_id"), col("r.neighbor_id").as("neighbor_id"),
        col("r.rel_x1m").as("rel_x1m"),
        greatest(col("r.sim1"), col("t.sim_x1m")).as("simmax"))
    val sel3 = r2
      .withColumn("mmr", col("rel_x1m") * 7 - col("simmax") * 3)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("neighbor_id"), col("rel_x1m"), col("mmr"))
    s1.select(col("vec_id"), lit(1).as("pick"), col("s1_id").as("neighbor_id"),
        col("s1_rel").as("rel_x1m"), (col("s1_rel") * 7).as("mmr_x1m"))
      .unionAll(sel2.select(col("vec_id"), lit(2).as("pick"),
        col("neighbor_id"), col("rel_x1m"), col("mmr").as("mmr_x1m")))
      .unionAll(sel3.select(col("vec_id"), lit(3).as("pick"),
        col("neighbor_id"), col("rel_x1m"), col("mmr").as("mmr_x1m")))
  }

  val mmrSql: String =
    s"""WITH $quantizedSql,
       |cand AS (SELECT vec_id, neighbor_id,
       |          CAST(round(cosine * 1000000) AS BIGINT) AS rel_x1m, rn
       |         FROM ($embedCosineTopkSql)),
       |sims AS (
       |  SELECT c1.vec_id, c1.neighbor_id AS a_id, c2.neighbor_id AS b_id,
       |         CAST(round(round(
       |           CAST(list_sum(list_transform(generate_series(1, len(va.q)),
       |             i -> va.q[i] * vb.q[i])) AS DOUBLE)
       |             / sqrt(CAST(va.nrm * vb.nrm AS DOUBLE)), 6) * 1000000)
       |           AS BIGINT) AS sim_x1m
       |  FROM cand c1
       |  JOIN cand c2 ON c1.vec_id = c2.vec_id
       |              AND c1.neighbor_id <> c2.neighbor_id
       |  JOIN qn va ON va.vec_id = c1.neighbor_id
       |  JOIN qn vb ON vb.vec_id = c2.neighbor_id),
       |f1 AS (SELECT vec_id, neighbor_id AS s1_id, rel_x1m AS s1_rel
       |       FROM cand WHERE rn = 1),
       |r1 AS (
       |  SELECT c.vec_id, c.neighbor_id, c.rel_x1m, s.sim_x1m AS sim1
       |  FROM cand c
       |  JOIN f1 ON c.vec_id = f1.vec_id AND c.rn > 1
       |  JOIN sims s ON s.vec_id = c.vec_id AND s.a_id = c.neighbor_id
       |             AND s.b_id = f1.s1_id),
       |sel2 AS (
       |  SELECT vec_id, neighbor_id, rel_x1m, mmr FROM (
       |    SELECT r1.*, rel_x1m * 7 - sim1 * 3 AS mmr,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY rel_x1m * 7 - sim1 * 3 DESC, neighbor_id) AS rk
       |    FROM r1) WHERE rk = 1),
       |r2 AS (
       |  SELECT r1.vec_id, r1.neighbor_id, r1.rel_x1m,
       |         greatest(r1.sim1, t.sim_x1m) AS simmax
       |  FROM r1
       |  JOIN sel2 ON r1.vec_id = sel2.vec_id
       |           AND r1.neighbor_id <> sel2.neighbor_id
       |  JOIN sims t ON t.vec_id = r1.vec_id AND t.a_id = r1.neighbor_id
       |             AND t.b_id = sel2.neighbor_id),
       |sel3 AS (
       |  SELECT vec_id, neighbor_id, rel_x1m, mmr FROM (
       |    SELECT r2.*, rel_x1m * 7 - simmax * 3 AS mmr,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY rel_x1m * 7 - simmax * 3 DESC, neighbor_id) AS rk
       |    FROM r2) WHERE rk = 1)
       |SELECT vec_id, 1 AS pick, s1_id AS neighbor_id, s1_rel AS rel_x1m,
       |       s1_rel * 7 AS mmr_x1m
       |FROM f1
       |UNION ALL
       |SELECT vec_id, 2 AS pick, neighbor_id, rel_x1m, mmr AS mmr_x1m
       |FROM sel2
       |UNION ALL
       |SELECT vec_id, 3 AS pick, neighbor_id, rel_x1m, mmr AS mmr_x1m
       |FROM sel3""".stripMargin

  /** q_ivf_imbalance — the ONE-ROW index-health verdict an operator
    * reads before trusting any IVF latency number: cell count, corpus
    * size, hottest/coldest cell population, and the load-imbalance
    * factor max/mean as a ×100 truncating integer (max·K·100 div n —
    * the factor by which the worst probe exceeds the average, i.e.
    * exactly the skew that turns one shuffle partition into the
    * straggler at 1000 executors). Pure composition: one tiny
    * aggregate OVER [[qIvfCells]]' K-row output (which itself rides
    * the shared materialized assignment frame) — the corpus is not
    * rescanned. The oracle nests q_ivf_cells' full SQL as a derived
    * table (the pipelineFunnel composition device).
    */
  def qIvfImbalance(spark: SparkSession, dir: String): DataFrame =
    qIvfCells(spark, dir).agg(
      count(lit(1)).as("n_cells"),
      sum("n_vectors").as("n_vectors"),
      max("n_vectors").as("max_cell"),
      min("n_vectors").as("min_cell"),
      expr("(max(n_vectors) * count(1) * 100) div sum(n_vectors)")
        .as("imbalance_x100"))

  lazy val ivfImbalanceSql: String =
    s"""SELECT COUNT(*) AS n_cells,
       |       CAST(SUM(n_vectors) AS BIGINT) AS n_vectors,
       |       MAX(n_vectors) AS max_cell, MIN(n_vectors) AS min_cell,
       |       MAX(n_vectors) * COUNT(*) * 100
       |         // CAST(SUM(n_vectors) AS BIGINT) AS imbalance_x100
       |FROM ($ivfCellsSql)""".stripMargin

  /** q_hubness — the kNN-graph HUB diagnostic (r11): the in-degree
    * distribution of the corpus-wide in-cell top-3 graph
    * ([[qAnnIvf]]'s materialized result frame, 5th consumer). Hubs —
    * vectors that appear in disproportionately many neighbor lists —
    * are the classic high-dimensional ANN pathology (Radovanović et
    * al.): a hubby embedding space degrades retrieval diversity and
    * poisons kNN label propagation, and ANTI-hubs (in-degree 0) are
    * the vectors no query ever reaches. One groupBy of the ≤3n result
    * frame + a left join onto the quantized id set to count anti-hubs;
    * output = one row per log₂ in-degree bucket (−1 = anti-hub) at any
    * corpus size. */
  def qHubness(spark: SparkSession, dir: String): DataFrame = {
    val indeg = qAnnIvf(spark, dir)
      .groupBy(col("neighbor_id")).agg(count(lit(1)).as("indeg"))
    quantized(spark, dir).select(col("vec_id"))
      .join(indeg, col("vec_id") === col("neighbor_id"), "left_outer")
      .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
      .withColumn("log2_indeg", when(col("indeg") === 0L, -1L)
        .otherwise((length(expr("conv(indeg, 10, 2)")) - 1).cast("long")))
      .groupBy("log2_indeg")
      .agg(count(lit(1)).as("n_vectors"),
        sum("indeg").as("n_edges_in"),
        max("indeg").as("max_indeg"))
  }

  lazy val hubnessSql: String =
    s"""WITH $quantizedSql,
       |r AS (SELECT * FROM ($annIvfSql)),
       |ind AS (SELECT neighbor_id, COUNT(*) AS indeg FROM r
       |        GROUP BY neighbor_id),
       |d AS (SELECT COALESCE(ind.indeg, 0) AS indeg
       |      FROM qn LEFT JOIN ind ON qn.vec_id = ind.neighbor_id)
       |SELECT CASE WHEN indeg = 0 THEN CAST(-1 AS BIGINT)
       |            ELSE CAST(length(bin(indeg)) - 1 AS BIGINT)
       |       END AS log2_indeg,
       |       COUNT(*) AS n_vectors,
       |       CAST(SUM(indeg) AS BIGINT) AS n_edges_in,
       |       CAST(MAX(indeg) AS BIGINT) AS max_indeg
       |FROM d GROUP BY 1""".stripMargin

  /** q_mutual_knn — RECIPROCAL nearest neighbors per cell (r11): the
    * fraction of top-3 edges that are mutual (a ∈ top3(b) AND
    * b ∈ top3(a)) — the standard high-precision near-dup candidate
    * signal (mutual-kNN pairs are far likelier to be true duplicates
    * than one-directional hits) and the reciprocity health metric of
    * the ANN graph. Rides the same materialized result frame; the
    * mutuality test is ONE equality self-join on the swapped
    * (vec_id, neighbor_id) pair — hash join on 16-byte keys, input =
    * the ≤3n edge list, never the corpus. Output = K cell rows. */
  def qMutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val r = qAnnIvf(spark, dir)
      .select(col("vec_id").as("a"), col("neighbor_id").as("b"),
        col("cell"))
    val mutual = r.as("x")
      .join(r.select(col("a").as("ya"), col("b").as("yb")).as("y"),
        col("x.a") === col("yb") && col("x.b") === col("ya"))
      .filter(col("x.a") < col("x.b"))
      .groupBy(col("x.cell").as("m_cell"))
      .agg(count(lit(1)).as("n_mutual"))
    r.groupBy("cell").agg(count(lit(1)).as("n_edges"))
      .join(mutual, col("cell") === col("m_cell"), "left_outer")
      .select(col("cell"), col("n_edges"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
      .withColumn("mutual_ppm",
        expr("n_mutual * 2 * 1000000 div n_edges"))
  }

  lazy val mutualKnnSql: String =
    s"""WITH r AS (SELECT vec_id AS a, neighbor_id AS b, cell
       |           FROM ($annIvfSql)),
       |m AS (SELECT x.cell, COUNT(*) AS n_mutual
       |      FROM r x JOIN r y ON x.a = y.b AND x.b = y.a
       |      WHERE x.a < x.b GROUP BY x.cell),
       |e AS (SELECT cell, COUNT(*) AS n_edges FROM r GROUP BY cell)
       |SELECT e.cell, e.n_edges, COALESCE(m.n_mutual, 0) AS n_mutual,
       |       COALESCE(m.n_mutual, 0) * 2 * 1000000 // e.n_edges
       |         AS mutual_ppm
       |FROM e LEFT JOIN m ON e.cell = m.cell""".stripMargin
}
