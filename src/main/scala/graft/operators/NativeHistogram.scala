package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus NATIVE (sparse exponential-bucket) histograms — the
  * PromQL 3.x direction the classic `le`-bucket family
  * (q_histogram_quantile/_avg/_stddev/_fraction) predates. Model,
  * re-expressed from the PUBLIC design (Prometheus sparse
  * high-resolution histograms / OpenTelemetry exponential histograms;
  * same math as prometheus/prometheus model/histogram + promql
  * quantile code):
  *
  *   - at schema s, positive bucket i covers (base^(i−1), base^i] with
  *     base = 2^(2^−s) — so index(v) = ⌈2^s · log₂ v⌉
  *   - negative observations mirror into negative buckets with the
  *     same index math over |v|; v = 0 lands in the ZERO bucket
  *     (zero-threshold 0 here: values are exact integer cents)
  *   - a series carries (count, sum, zero_count, buckets as SPANS of
  *     contiguous indexes) — the layout [[qNativeStats]] reports on
  *
  * ENGINE-EXACT throughout, in the engine's libm-free style: cents are
  * integers, so ⌈log₂ v⌉ is integer BIT LENGTH (`conv`/`bin` string
  * length — the q_colloc_pmi device, no floating log), schema −1 is
  * ⌈idx₀/2⌉ by integer halving, schema +1 is bit_length(v²−1) (v²
  * exact in int64), and bucket BOUNDS are powers of two carried as
  * HALFCENT integers (`1 << idx` — never `pow(2.0, i)`, which Java
  * only guarantees to 1 ulp). The WIDE schemas (+2..+8, where v^(2^s)
  * leaves int64) stay exact through the sub-octave BOUNDARY TABLE
  * device ([[qNativeWide]]): ⌈2^s·log₂ v⌉ = e·2^s + (position of the
  * octave-normalized mantissa among the 2^s exact integer boundaries
  * ⌊2^(j/2^s)·2^40⌋, computed once at plan time with BigInt
  * verification) — an integer comparison against a floored irrational
  * bound is EXACT for every v < 2^41, so no precision caveat exists.
  * Only the final quantile/fraction interpolation touches doubles,
  * with identical operands and association in both engines (the
  * q_rate argument): since Prometheus 3.0 (PR #14677) that
  * interpolation is EXPONENTIAL within a native bucket — lo·2^frac —
  * which this engine implements (the fixtures' independent Python
  * twin computes the same rule with bignum index math), and the
  * straddling-bucket term is a SINGLE double term so no
  * order-dependent double summation exists anywhere.
  *
  * Scale shape: everything is one events scan into a per-(series,
  * window, index) count frame — sparse native histograms are TINY
  * relative to samples (that is their point), so every post-bucket
  * frame is bounded by series × windows × ~64 indexes. The schema-0
  * bucket frame is materialized once and shared by the
  * quantile/stats/fraction consumers (shared-frame rule).
  *
  * Conformance: the index math and the quantile/fraction interpolation
  * are golden-vectored against an independent Python transcription in
  * `tools/promql_ref.py` (families in PromqlConformanceSpec), like the
  * classic-histogram and rate families.
  */
object NativeHistogram {

  /** 1h evaluation windows, like the other over-time families. */
  private val WindowSec = 3600L

  /** (name, user_id, w_start, sgn, pos) — one row per sample, with the
    * sign split and |cents| ready for index math. */
  private def samples(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / WindowSec) * WindowSec)
        .as("w_start"),
      round(col("value") * 100).cast("long").as("cents"))
      .select(col("name"), col("user_id"), col("w_start"),
        signum(col("cents")).cast("long").as("sgn"),
        abs(col("cents")).as("pos"))

  private val samplesSql: String =
    s"""sm AS (SELECT event_type AS name, user_id,
       |        CAST(floor(epoch_us(ts)/1000000/$WindowSec)*$WindowSec AS BIGINT) AS w_start,
       |        CAST(sign(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sgn,
       |        abs(CAST(round(value*100) AS BIGINT)) AS pos
       |       FROM events)""".stripMargin

  /** ⌈log₂ pos⌉ as integer bit length (schema 0); 0 for pos ≤ 1. */
  private def idx0Col = when(col("pos") <= 1L, 0L)
    .otherwise(length(expr("conv(pos - 1, 10, 2)")).cast("long"))

  /** The SHARED schema-0 bucket-count frame (name, user_id, w_start,
    * sgn, bucket_idx, cnt) — three consumers (quantile / stats /
    * fraction), materialized once per (session, dir). */
  private def buckets0(spark: SparkSession, dir: String): DataFrame =
    MaterializeOnce(spark, dir, "nh:buckets0")(buckets0Plan(spark, dir))

  private[graft] def buckets0Plan(spark: SparkSession, dir: String): DataFrame =
    samples(spark, dir)
      .withColumn("bucket_idx",
        when(col("sgn") === 0L, 0L).otherwise(idx0Col))
      .groupBy("name", "user_id", "w_start", "sgn", "bucket_idx")
      .agg(count(lit(1)).as("cnt"))

  private val buckets0Sql: String =
    s"""$samplesSql,
       |bk AS (SELECT name, user_id, w_start, sgn,
       |        CAST(CASE WHEN sgn = 0 OR pos <= 1 THEN 0
       |                  ELSE length(bin(pos - 1)) END AS BIGINT) AS bucket_idx,
       |        CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM sm GROUP BY name, user_id, w_start, sgn, bucket_idx)""".stripMargin

  /** q_native_hist — the sparse-bucket BUILD at three schemas
    * (−1, 0, +1): per (series, 1h window, schema, sign), the populated
    * bucket indexes and their counts — the ingest transform a native-
    * histogram TSDB runs per scrape. Index math per the object doc:
    * schema 0 = bit_length(|cents|−1), schema +1 = bit_length(cents²−1)
    * (base √2 — twice the resolution), schema −1 = ⌈idx₀/2⌉ (base 4).
    * All pure integers; the output is series × windows × schemas ×
    * populated-index bounded — sparse by construction. */
  def qNativeHist(spark: SparkSession, dir: String): DataFrame = {
    // Aggregate-FIRST (r14, guide §2.3 "aggregate before you shuffle"):
    // the corpus is grouped ONCE at the finest schema (+1); schemas 0
    // and −1 derive from the SPARSE schema-1 bucket frame by the
    // nested-ceiling identity ⌈⌈2y⌉/2⌉ = ⌈y⌉ (idx₀ = ⌈idx₁/2⌉,
    // idx₋₁ = ⌈idx₀/2⌉ — exactly the idx0Col/idxm1 formulas). The
    // r8 form exploded ×3 BEFORE aggregating, shuffling three corpus
    // copies for identical counts; now only bucket rows re-aggregate.
    val g1 = samples(spark, dir)
      .withColumn("idx1", when(col("pos") <= 1L, 0L)
        .otherwise(length(expr("conv(pos * pos - 1, 10, 2)")).cast("long")))
      .groupBy("name", "user_id", "w_start", "sgn", "idx1")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("idx0", expr("(idx1 + 1) div 2"))
      .withColumn("idxm1", expr("(idx0 + 1) div 2"))
    g1.select(col("name"), col("user_id"), col("w_start"), col("sgn"),
        col("cnt"),
        explode(array(
          struct(lit(-1L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idxm1")).as("bucket_idx")),
          struct(lit(0L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idx0")).as("bucket_idx")),
          struct(lit(1L).as("bucket_schema"),
            when(col("sgn") === 0L, 0L).otherwise(col("idx1")).as("bucket_idx"))))
          .as("sb"))
      .select(col("name"), col("user_id"), col("w_start"),
        col("sb.bucket_schema").as("bucket_schema"), col("sgn"),
        col("sb.bucket_idx").as("bucket_idx"), col("cnt"))
      .groupBy("name", "user_id", "w_start", "bucket_schema", "sgn",
        "bucket_idx")
      .agg(sum("cnt").as("cnt"))
  }

  val nativeHistSql: String =
    s"""WITH $samplesSql,
       |i AS (SELECT *,
       |        CASE WHEN pos <= 1 THEN 0 ELSE length(bin(pos - 1)) END AS idx0,
       |        CASE WHEN pos <= 1 THEN 0
       |             ELSE length(bin(pos * pos - 1)) END AS idx1
       |      FROM sm),
       |u AS (
       |  SELECT name, user_id, w_start, sgn, CAST(-1 AS BIGINT) AS bucket_schema,
       |         CAST(CASE WHEN sgn = 0 THEN 0 ELSE (idx0 + 1) // 2 END AS BIGINT) AS bucket_idx
       |  FROM i
       |  UNION ALL
       |  SELECT name, user_id, w_start, sgn, CAST(0 AS BIGINT),
       |         CAST(CASE WHEN sgn = 0 THEN 0 ELSE idx0 END AS BIGINT)
       |  FROM i
       |  UNION ALL
       |  SELECT name, user_id, w_start, sgn, CAST(1 AS BIGINT),
       |         CAST(CASE WHEN sgn = 0 THEN 0 ELSE idx1 END AS BIGINT)
       |  FROM i)
       |SELECT name, user_id, w_start, bucket_schema, sgn, bucket_idx,
       |       CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM u
       |GROUP BY name, user_id, w_start, bucket_schema, sgn, bucket_idx""".stripMargin

  // ---- WIDE schemas −4..8 (VERDICT_r08 item 2) ----------------------

  /** The schemas [[qNativeWide]] builds, complementing [[qNativeHist]]'s
    * −1/0/+1: together they span the full Prometheus scrape-config
    * range −4..8 (−3 is ⌈idx₀/8⌉ by the same rule as −2/−4; +3..+7
    * follow the same boundary-table device as +2/+4/+8 — the five
    * chosen schemas exercise every code path). */
  private[graft] val WideSchemas = Seq(-4, -2, 2, 4, 8)

  /** Fixed-point scale of the octave-normalized mantissa: f = v/2^e ∈
    * [1,2) is carried as f·2^40 — EXACT (a pure left shift) for every
    * v < 2^41, i.e. cents up to ~10¹⁰ value units. */
  private val MantissaBits = 40
  private val MantissaOne = 1L << MantissaBits

  /** The exact sub-octave boundary table for schema s > 0:
    * B_{s,j} = ⌊2^(j/2^s) · 2^40⌋ for j = 1..2^s−1, computed once at
    * plan time from a double estimate FIXED UP with BigInt powers
    * (B^(2^s) ≤ 2^(40·2^s + j) < (B+1)^(2^s)) — so the table is exact
    * by construction, not 1-ulp-trusted. Correctness of the lookup:
    * the smallest j with v ≤ 2^e·2^(j/2^s) compares the integer f·2^40
    * against the irrational boundary, and an integer is ≤ an
    * irrational iff it is ≤ its floor — the floored table loses
    * nothing. */
  private val wideBoundsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[Long]]()
  private[graft] def wideBounds(s: Int): Seq[Long] =
    wideBoundsCache.computeIfAbsent(s, _ => {
      require(s > 0 && s <= 8)
      val twoS = 1 << s
      (1 until twoS).map { j =>
        val target = BigInt(2).pow(MantissaBits * twoS + j)
        var b = BigInt(math.pow(2.0, MantissaBits + j.toDouble / twoS).toLong)
        while (b.pow(twoS) > target) b -= 1
        while ((b + 1).pow(twoS) <= target) b += 1
        b.toLong
      }
    })

  /** #{j : B_j < fs} over the SORTED schema-8 boundary table as an
    * UNROLLED BINARY SEARCH — 8 comparisons per row on the taken path
    * (codegen-friendly CASE chain, lazily evaluated either way)
    * instead of an interpreted 255-element array filter, which
    * measured as the whole suite's most expensive projection. Pure
    * literal/CASE text, identical in both dialects. */
  private def lowerBoundExpr(bs: IndexedSeq[Long]): String = {
    // leaves are branch-free comparison SUMS (16 tight int ops beat 16
    // more branches, and keep the generated method JIT-sized)
    def leaf(lo: Int, hi: Int): String =
      (lo until hi).map(i => s"(CASE WHEN ${bs(i)} < fs THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    def cnt(lo: Int, hi: Int): String =
      if (hi - lo <= 16) leaf(lo, hi)
      else {
        val mid = (lo + hi) / 2
        s"(CASE WHEN ${bs(mid)} < fs THEN ${mid - lo + 1} + ${cnt(mid + 1, hi)}" +
          s" ELSE ${cnt(lo, mid)} END)"
      }
    cnt(0, bs.size)
  }

  /** ⌈2⁸·log₂ pos⌉ over columns `pos`, `e` (bit_length(pos)−1) and
    * `fs` (the 2^40-scaled mantissa): octave·256 + the binary-searched
    * sub-octave position, with the power-of-two case (fs = 2^40
    * exactly) landing on the octave start. Every OTHER schema derives
    * from this single index by the nested-ceiling identity
    * ⌈2^s·log₂ v⌉ = ⌈idx₈ / 2^(8−s)⌉ (exact for integer divisors), so
    * the whole five-schema build pays ONE table lookup per row. */
  private def idx8Expr: String =
    s"(CASE WHEN pos <= 1 THEN 0 ELSE e * 256 + " +
      s"(CASE WHEN fs = $MantissaOne THEN 0 ELSE 1 + " +
      s"${lowerBoundExpr(wideBounds(8).toIndexedSeq)} END) END)"

  /** bucket index at schema `s` from the `idx8` column (nested-ceiling
    * division; operands nonnegative, so div and // agree). */
  private def wideIdxFrom8(s: Int, spark: Boolean): String = {
    val d = 1 << (8 - s)
    val dv = if (spark) "div" else "//"
    if (s == 8) "idx8" else s"((idx8 + ${d - 1}) $dv $d)"
  }

  /** q_native_wide — the sparse-bucket build at the WIDE schemas
    * {−4, −2, +2, +4, +8}, closing the gap to the Prometheus
    * scrape-config default range −4..8 that [[qNativeHist]]'s
    * −1/0/+1 left open: at schema s, bucket i covers
    * (2^((i−1)/2^s), 2^(i/2^s)] — base 2^(1/256) at s = 8, i.e. 256
    * buckets per octave — and v^(2^s) is far beyond int64, so the
    * index math runs on the exact boundary-table device (object doc):
    * one octave split (bit length + shift, both engines), ONE
    * unrolled-binary-search table lookup per row (8 comparisons on the
    * taken path — the interpreted 255-entry array filter this replaces
    * was the suite's most expensive projection), and every other
    * schema's index derived by nested-ceiling division from idx₈.
    * Same output shape as q_native_hist; sparse by construction. */
  def qNativeWide(spark: SparkSession, dir: String): DataFrame = {
    // Aggregate-FIRST (r14, guide §2.3) — the qNativeHist device at the
    // wide schemas: ONE corpus aggregation at idx₈ (the index every
    // other schema already derived from via nested-ceiling division),
    // then the ×5 schema explode runs over the SPARSE schema-8 bucket
    // frame. The r9 form exploded ×5 pre-aggregation — five corpus
    // copies through the shuffle for identical counts.
    val g8 = samples(spark, dir)
      .withColumn("e",
        (length(expr("conv(pos, 10, 2)")) - 1).cast("long"))
      .withColumn("fs", expr(
        s"CASE WHEN e <= $MantissaBits THEN shiftleft(pos, CAST($MantissaBits - e AS INT)) " +
          s"ELSE shiftright(pos, CAST(e - $MantissaBits AS INT)) END"))
      .withColumn("idx8", expr(idx8Expr))
      .groupBy("name", "user_id", "w_start", "sgn", "idx8")
      .agg(count(lit(1)).as("cnt"))
    g8.select(col("name"), col("user_id"), col("w_start"), col("sgn"),
        col("cnt"),
        explode(array(WideSchemas.map { s =>
          struct(lit(s.toLong).as("bucket_schema"),
            when(col("sgn") === 0L, 0L)
              .otherwise(expr(wideIdxFrom8(s, spark = true)).cast("long"))
              .as("bucket_idx"))
        }: _*)).as("sb"))
      .select(col("name"), col("user_id"), col("w_start"),
        col("sb.bucket_schema").as("bucket_schema"), col("sgn"),
        col("sb.bucket_idx").as("bucket_idx"), col("cnt"))
      .groupBy("name", "user_id", "w_start", "bucket_schema", "sgn",
        "bucket_idx")
      .agg(sum("cnt").as("cnt"))
  }

  val nativeWideSql: String = {
    val selects = WideSchemas.map { s =>
      s"""  SELECT name, user_id, w_start, sgn,
         |         CAST($s AS BIGINT) AS bucket_schema,
         |         CAST(CASE WHEN sgn = 0 THEN 0
         |              ELSE ${wideIdxFrom8(s, spark = false)} END AS BIGINT) AS bucket_idx
         |  FROM wi""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH $samplesSql,
       |wb AS (SELECT *, CAST(length(bin(pos)) - 1 AS BIGINT) AS e FROM sm),
       |wf AS (SELECT *, CASE WHEN e <= $MantissaBits
       |         THEN pos << CAST($MantissaBits - e AS INT)
       |         ELSE pos >> CAST(e - $MantissaBits AS INT) END AS fs
       |       FROM wb),
       |wi AS (SELECT *, $idx8Expr AS idx8 FROM wf),
       |u AS (
       |$selects)
       |SELECT name, user_id, w_start, bucket_schema, sgn, bucket_idx,
       |       CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM u
       |GROUP BY name, user_id, w_start, bucket_schema, sgn, bucket_idx""".stripMargin
  }

  // ---- NHCB: custom-bucket (migration) histograms (VERDICT_r08 item 2) ----

  /** The custom bucket UPPER bounds (cents) of the NHCB layout — the
    * classic-histogram migration shape Prometheus carries in the
    * native wire format as "schema −53": explicit ascending bounds,
    * bucket 0 = (−∞, b₀], bucket i = (b_{i−1}, b_i], one overflow
    * bucket above the last bound. Chosen to split the fixture value
    * distribution (~5/20/80/200 units); a deployment supplies its own. */
  private[graft] val CustomBounds = Seq(500L, 2000L, 8000L, 20000L)

  /** q_native_custom — the NHCB bucket BUILD per (series, 1h window):
    * populated custom-bucket indexes, each bucket's upper bound (−1 =
    * the +∞ overflow bucket) and count. Index = #bounds strictly below
    * the SIGNED cents (pure integer array filter — one per row, bounds
    * are a plan-time constant list), so negative observations land in
    * bucket 0 exactly as a migrated classic histogram would put them.
    * Sparse output: only populated buckets emit. */
  def qNativeCustom(spark: SparkSession, dir: String): DataFrame =
    nhcb(spark, dir)

  /** The NHCB bucket frame materialized once per (session, dir) —
    * the shared-frame rule (r12): three consumers now ([[qNativeCustom]],
    * [[qNativeCustomQ]], and [[qNhcbRateQ]] — whose window-pair shape
    * alone references the frame three times), and the frame is series ×
    * windows × ≤5 buckets, so the checkpoint is tiny while the samples
    * scan it saves is the corpus. */
  private def nhcb(spark: SparkSession, dir: String): DataFrame =
    MaterializeOnce(spark, dir, "nh:nhcb")(nhcbPlan(spark, dir))

  private[graft] def nhcbPlan(spark: SparkSession, dir: String): DataFrame = {
    val bs = CustomBounds.mkString(", ")
    samples(spark, dir)
      .withColumn("cents", col("sgn") * col("pos"))
      .withColumn("bucket_idx",
        expr(s"size(filter(array($bs), b -> b < cents))").cast("long"))
      .withColumn("le_cents",
        when(col("bucket_idx") < CustomBounds.size,
          expr(s"element_at(array($bs), CAST(bucket_idx + 1 AS INT))"))
          .otherwise(lit(-1L)))
      .groupBy("name", "user_id", "w_start", "bucket_idx", "le_cents")
      .agg(count(lit(1)).as("cnt"))
  }

  val nativeCustomSql: String = {
    val bs = CustomBounds.mkString(", ")
    s"""WITH $samplesSql,
       |cb AS (SELECT name, user_id, w_start,
       |        CAST(len(list_filter([$bs], b -> b < sgn * pos)) AS BIGINT)
       |          AS bucket_idx
       |       FROM sm)
       |SELECT name, user_id, w_start, bucket_idx,
       |       CAST(CASE WHEN bucket_idx < ${CustomBounds.size}
       |            THEN ([$bs])[CAST(bucket_idx + 1 AS INT)]
       |            ELSE -1 END AS BIGINT) AS le_cents,
       |       CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM cb GROUP BY name, user_id, w_start, bucket_idx""".stripMargin
  }

  /** q_native_custom_q — `histogram_quantile(φ, nhcb)` for
    * φ ∈ {0.5, 0.9}: NHCB quantiles interpolate LINEARLY like the
    * classic histograms they migrate (the v3 exponential rule applies
    * only to exponential-bucket layouts — custom bounds carry no
    * base), with the classic conventions: the lowest bucket
    * interpolates from lower bound 0, and a rank landing in the +∞
    * overflow bucket returns the highest finite bound. Cumulative
    * crossing over the ≤ |bounds|+1 per-window bucket rows — the
    * [[qNativeQuantile]] shape on the custom layout. */
  def qNativeCustomQ(spark: SparkSession, dir: String): DataFrame = {
    val grp = Seq("name", "user_id", "w_start")
    val bk = qNativeCustom(spark, dir)
      .withColumn("tot",
        sum("cnt").over(Window.partitionBy(grp.map(col): _*)))
      .withColumn("cum", sum("cnt").over(Window.partitionBy(grp.map(col): _*)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val phis = spark.range(1).select(
      explode(typedLit(Seq(50L, 90L))).as("phi_x100"))
    val lastFinite = CustomBounds.last
    val boundsArr = CustomBounds.mkString(", ")
    bk.crossJoin(broadcast(phis))
      .withColumn("rk",
        (col("tot") * col("phi_x100")).cast("double") / 100.0)
      .filter(col("cum") >= col("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy((grp :+ "phi_x100").map(col): _*)
          .orderBy("bucket_idx")))
      .filter(col("rn") === 1)
      .withColumn("lo", when(col("bucket_idx") === 0L, 0L)
        .otherwise(expr(s"element_at(array($boundsArr), CAST(bucket_idx AS INT))")))
      .select(col("name"), col("user_id"), col("w_start"), col("phi_x100"),
        round(
          when(col("le_cents") === -1L, lit(lastFinite.toDouble))
            .otherwise(col("lo").cast("double")
              + (col("le_cents") - col("lo")).cast("double")
                * ((col("rk") - (col("cum") - col("cnt")).cast("double"))
                  / col("cnt").cast("double"))) / 100.0, 6).as("q_value"))
  }

  val nativeCustomQSql: String = {
    val boundsArr = CustomBounds.mkString(", ")
    s"""WITH nc AS (SELECT * FROM ($nativeCustomSql)),
       |o AS (SELECT *,
       |        CAST(SUM(cnt) OVER (PARTITION BY name, user_id, w_start) AS BIGINT) AS tot,
       |        CAST(SUM(cnt) OVER (PARTITION BY name, user_id, w_start
       |          ORDER BY bucket_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |      FROM nc),
       |ph AS (SELECT unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT)]) AS phi_x100),
       |r AS (SELECT o.*, ph.phi_x100,
       |        CAST(o.tot * ph.phi_x100 AS DOUBLE) / 100.0 AS rk
       |      FROM o CROSS JOIN ph),
       |sel AS (SELECT *, row_number() OVER (PARTITION BY name, user_id,
       |          w_start, phi_x100 ORDER BY bucket_idx) AS rn
       |        FROM r WHERE cum >= rk),
       |lo AS (SELECT *, CASE WHEN bucket_idx = 0 THEN 0
       |         ELSE ([$boundsArr])[CAST(bucket_idx AS INT)] END AS lo
       |       FROM sel WHERE rn = 1)
       |SELECT name, user_id, w_start, phi_x100,
       |       round(CASE WHEN le_cents = -1 THEN CAST(${CustomBounds.last} AS DOUBLE)
       |             ELSE CAST(lo AS DOUBLE)
       |                  + CAST(le_cents - lo AS DOUBLE)
       |                    * ((rk - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
       |             END / 100.0, 6) AS q_value
       |FROM lo""".stripMargin
  }

  /** q_nhcb_rate_q — `histogram_quantile(φ, rate(nhcb[1h]))`, the
    * STACKED form a Prometheus 3.x latency dashboard actually evaluates
    * (r12, VERDICT_r11 item 6 — [[qNativeRate]] and [[qNativeCustomQ]]
    * existed separately; the composition did not): per (series,
    * adjacent-window pair), the bucket-wise INCREASE under the
    * histogram reset rule — a TOTAL-count decrease means the whole
    * histogram reset ([[qNativeRate]]'s rule), so the increase IS the
    * next window's counts; otherwise per-bucket next − prev clamped at
    * 0 (counter semantics: an individual bucket cannot shrink without
    * a reset) — then the NHCB LINEAR-interpolation quantile over the
    * increase buckets. The 1/WindowSec rate factor CANCELS in the
    * quantile (rank scales with the total exactly as the buckets do),
    * so quantile∘rate ≡ quantile∘increase — computed that way, all
    * integers until the one interpolation term. Window pairs where
    * both windows exist only (the [[qNativeDelta]] gap rule); pairs
    * whose total increase is zero emit nothing (no rank exists).
    * Output ∝ series × windows × 2 φ values. */
  def qNhcbRateQ(spark: SparkSession, dir: String): DataFrame = {
    val bk = qNativeCustom(spark, dir)
    val grp = Seq("name", "user_id", "w_start")
    // r15 (guide §2.3/§2.4 — the q_native_delta devices on the NHCB
    // frame, which at sparse cadence is samples-scale): (1) the
    // window-pair/reset frame comes from ONE lag pass over the
    // per-window totals instead of a shifted self-join (a pair exists
    // iff the series' previous total sits exactly one window back);
    // (2) the bucket-wise FULL-OUTER shifted self-join becomes one
    // map-side-combinable union-aggregate (+cnt into its own window's
    // next column, +cnt into the next window's prev column — an
    // absent side is an exact 0, which is what the old coalesce did).
    // The pairs join stays: it carries reset AND gates both-windows-
    // exist, exactly as before. Round15OptSpec pins row-exactness.
    val tot = bk.groupBy(grp.map(col): _*).agg(sum("cnt").as("tot_next"))
    val wSeries = Window.partitionBy("name", "user_id").orderBy("w_start")
    val pairs = tot
      .withColumn("prev_w", lag("w_start", 1).over(wSeries))
      .withColumn("tot_prev", lag("tot_next", 1).over(wSeries))
      .filter(col("prev_w") === col("w_start") - WindowSec)
      .withColumn("reset", (col("tot_next") < col("tot_prev")).cast("long"))
      .select(col("name"), col("user_id"), col("w_start"), col("reset"))
    val inc = bk.select(col("name"), col("user_id"), col("w_start"),
        col("bucket_idx"), col("le_cents"),
        col("cnt").as("nc"), lit(0L).as("pc"))
      .unionByName(bk.select(col("name"), col("user_id"),
        (col("w_start") + WindowSec).as("w_start"), col("bucket_idx"),
        col("le_cents"), lit(0L).as("nc"), col("cnt").as("pc")))
      .groupBy("name", "user_id", "w_start", "bucket_idx", "le_cents")
      .agg(sum("nc").as("next_cnt"), sum("pc").as("prev_cnt"))
      .join(pairs, grp) // inner: both windows exist, carries the reset flag
      .withColumn("inc",
        when(col("reset") === 1L, col("next_cnt"))
          .otherwise(greatest(col("next_cnt") - col("prev_cnt"), lit(0L))))
      .filter(col("inc") > 0L)
    val q = inc
      .withColumn("tot",
        sum("inc").over(Window.partitionBy(grp.map(col): _*)))
      .withColumn("cum", sum("inc").over(Window.partitionBy(grp.map(col): _*)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val phis = spark.range(1).select(
      explode(typedLit(Seq(50L, 90L))).as("phi_x100"))
    val lastFinite = CustomBounds.last
    val boundsArr = CustomBounds.mkString(", ")
    q.crossJoin(broadcast(phis))
      .withColumn("rk",
        (col("tot") * col("phi_x100")).cast("double") / 100.0)
      .filter(col("cum") >= col("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy((grp :+ "phi_x100").map(col): _*)
          .orderBy("bucket_idx")))
      .filter(col("rn") === 1)
      .withColumn("lo", when(col("bucket_idx") === 0L, 0L)
        .otherwise(expr(s"element_at(array($boundsArr), CAST(bucket_idx AS INT))")))
      .select(col("name"), col("user_id"), col("w_start"), col("phi_x100"),
        col("reset"),
        round(
          when(col("le_cents") === -1L, lit(lastFinite.toDouble))
            .otherwise(col("lo").cast("double")
              + (col("le_cents") - col("lo")).cast("double")
                * ((col("rk") - (col("cum") - col("inc")).cast("double"))
                  / col("inc").cast("double"))) / 100.0, 6).as("q_value"))
  }

  lazy val nhcbRateQSql: String = {
    val boundsArr = CustomBounds.mkString(", ")
    s"""WITH nc AS (SELECT * FROM ($nativeCustomSql)),
       |tw AS (SELECT name, user_id, w_start,
       |         CAST(SUM(cnt) AS BIGINT) AS tot_next
       |       FROM nc GROUP BY 1, 2, 3),
       |tp AS (SELECT name, user_id, w_start + $WindowSec AS w_start,
       |         tot_next AS tot_prev
       |       FROM tw),
       |pairs AS (SELECT tw.name, tw.user_id, tw.w_start,
       |            CAST(CASE WHEN tw.tot_next < tp.tot_prev
       |                 THEN 1 ELSE 0 END AS BIGINT) AS reset
       |          FROM tw JOIN tp ON tw.name = tp.name
       |            AND tw.user_id = tp.user_id AND tw.w_start = tp.w_start),
       |pv AS (SELECT name, user_id, w_start + $WindowSec AS w_start,
       |         bucket_idx, le_cents, cnt AS prev_cnt
       |       FROM nc),
       |nx AS (SELECT name, user_id, w_start, bucket_idx, le_cents,
       |         cnt AS next_cnt
       |       FROM nc),
       |fo AS (SELECT COALESCE(nx.name, pv.name) AS name,
       |         COALESCE(nx.user_id, pv.user_id) AS user_id,
       |         COALESCE(nx.w_start, pv.w_start) AS w_start,
       |         COALESCE(nx.bucket_idx, pv.bucket_idx) AS bucket_idx,
       |         COALESCE(nx.le_cents, pv.le_cents) AS le_cents,
       |         COALESCE(nx.next_cnt, 0) AS next_cnt,
       |         COALESCE(pv.prev_cnt, 0) AS prev_cnt
       |       FROM nx FULL OUTER JOIN pv
       |         ON nx.name = pv.name AND nx.user_id = pv.user_id
       |         AND nx.w_start = pv.w_start AND nx.bucket_idx = pv.bucket_idx
       |         AND nx.le_cents = pv.le_cents),
       |inc AS (SELECT fo.name, fo.user_id, fo.w_start, fo.bucket_idx,
       |          fo.le_cents, p.reset,
       |          CAST(CASE WHEN p.reset = 1 THEN fo.next_cnt
       |               ELSE GREATEST(fo.next_cnt - fo.prev_cnt, 0)
       |               END AS BIGINT) AS inc
       |        FROM fo JOIN pairs p ON fo.name = p.name
       |          AND fo.user_id = p.user_id AND fo.w_start = p.w_start),
       |o AS (SELECT *,
       |        CAST(SUM(inc) OVER (PARTITION BY name, user_id, w_start)
       |          AS BIGINT) AS tot,
       |        CAST(SUM(inc) OVER (PARTITION BY name, user_id, w_start
       |          ORDER BY bucket_idx ROWS UNBOUNDED PRECEDING)
       |          AS BIGINT) AS cum
       |      FROM inc WHERE inc > 0),
       |ph AS (SELECT unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT)]) AS phi_x100),
       |r AS (SELECT o.*, ph.phi_x100,
       |        CAST(o.tot * ph.phi_x100 AS DOUBLE) / 100.0 AS rk
       |      FROM o CROSS JOIN ph),
       |sel AS (SELECT *, row_number() OVER (PARTITION BY name, user_id,
       |          w_start, phi_x100 ORDER BY bucket_idx) AS rn
       |        FROM r WHERE cum >= rk),
       |lo AS (SELECT *, CASE WHEN bucket_idx = 0 THEN 0
       |         ELSE ([$boundsArr])[CAST(bucket_idx AS INT)] END AS lo
       |       FROM sel WHERE rn = 1)
       |SELECT name, user_id, w_start, phi_x100, reset,
       |       round(CASE WHEN le_cents = -1 THEN CAST(${CustomBounds.last} AS DOUBLE)
       |             ELSE CAST(lo AS DOUBLE)
       |                  + CAST(le_cents - lo AS DOUBLE)
       |                    * ((rk - CAST(cum - inc AS DOUBLE)) / CAST(inc AS DOUBLE))
       |             END / 100.0, 6) AS q_value
       |FROM lo""".stripMargin
  }

  /** q_native_rate — `rate(native_histogram[1h])`'s SCALARS: per
    * series and adjacent 1h-window pair, the per-second count and sum
    * rates with the counter reset rule (a COUNT decrease means the
    * histogram reset — both scalars restart from the next window's
    * values, exactly Prometheus's histogram reset semantics where the
    * whole histogram resets together). The bucket-wise half of
    * histogram rate is [[qNativeDelta]]; this is the scalar half a
    * recording rule actually stores. Shifted-key equality self-join on
    * a per-window aggregate (series × windows rows — tiny), ×10⁶
    * fixed-point integer division with the CASE-guarded negative
    * branch (sum CAN be negative via negative observations). */
  def qNativeRate(spark: SparkSession, dir: String): DataFrame = {
    val perW = samples(spark, dir)
      .groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("h_count"),
        sum(col("sgn") * col("pos")).as("h_sum_x100"))
    // r15 (guide §2.4 "remove shuffles outright"): the shifted-key
    // equality SELF-JOIN shuffled and sorted the per-window frame
    // TWICE (SortMergeJoin of two lineages of the same aggregate); a
    // window pair (w−3600, w) exists iff the series' PREVIOUS row in
    // w_start order sits exactly one window back — so one LAG over one
    // exchange produces the identical pair set (Round15OptSpec pins
    // row-exactness; the frame is series×windows ≈ samples at sparse
    // cadence, which is why the second sort was the sf100 term).
    val wSeries = Window.partitionBy("name", "user_id").orderBy("w_start")
    perW
      .withColumn("prev_w", lag("w_start", 1).over(wSeries))
      .withColumn("prev_count", lag("h_count", 1).over(wSeries))
      .withColumn("prev_sum", lag("h_sum_x100", 1).over(wSeries))
      .filter(col("prev_w") === col("w_start") - WindowSec)
      .withColumn("reset", (col("h_count") < col("prev_count")).cast("long"))
      .withColumn("dc", when(col("reset") === 1L, col("h_count"))
        .otherwise(col("h_count") - col("prev_count")))
      .withColumn("ds", when(col("reset") === 1L, col("h_sum_x100"))
        .otherwise(col("h_sum_x100") - col("prev_sum")))
      .select(col("name"), col("user_id"), col("w_start"), col("reset"),
        expr(s"CASE WHEN dc >= 0 THEN dc * 1000000 div $WindowSec " +
          s"ELSE -((-dc) * 1000000 div $WindowSec) END").as("count_rate_x1e6"),
        expr(s"CASE WHEN ds >= 0 THEN ds * 1000000 div ${WindowSec * 100} " +
          s"ELSE -((-ds) * 1000000 div ${WindowSec * 100}) END")
          .as("sum_rate_x1e6"))
  }

  val nativeRateSql: String =
    s"""WITH $samplesSql,
       |pw AS (SELECT name, user_id, w_start,
       |        CAST(COUNT(*) AS BIGINT) AS h_count,
       |        CAST(SUM(sgn * pos) AS BIGINT) AS h_sum_x100
       |       FROM sm GROUP BY name, user_id, w_start),
       |pv AS (SELECT name, user_id, w_start + $WindowSec AS w_start,
       |        h_count AS prev_count, h_sum_x100 AS prev_sum
       |       FROM pw),
       |j AS (SELECT pw.name, pw.user_id, pw.w_start,
       |        CAST(CASE WHEN pw.h_count < pv.prev_count THEN 1 ELSE 0 END AS BIGINT) AS reset,
       |        CASE WHEN pw.h_count < pv.prev_count THEN pw.h_count
       |             ELSE pw.h_count - pv.prev_count END AS dc,
       |        CASE WHEN pw.h_count < pv.prev_count THEN pw.h_sum_x100
       |             ELSE pw.h_sum_x100 - pv.prev_sum END AS ds
       |      FROM pw JOIN pv ON pw.name = pv.name
       |        AND pw.user_id = pv.user_id AND pw.w_start = pv.w_start)
       |SELECT name, user_id, w_start, reset,
       |       CAST(CASE WHEN dc >= 0 THEN dc * 1000000 // $WindowSec
       |            ELSE -((-dc) * 1000000 // $WindowSec) END AS BIGINT)
       |         AS count_rate_x1e6,
       |       CAST(CASE WHEN ds >= 0 THEN ds * 1000000 // ${WindowSec * 100}
       |            ELSE -((-ds) * 1000000 // ${WindowSec * 100}) END AS BIGINT)
       |         AS sum_rate_x1e6
       |FROM j""".stripMargin

  /** q_nhcb_migrate — the classic→NHCB MIGRATION transform itself:
    * from the CUMULATIVE classic `le` series (what a classic histogram
    * exposes at [[CustomBounds]] + +Inf — rebuilt here from raw
    * samples, all bounds present per window like a real scrape), the
    * incremental NHCB bucket counts by adjacent-bound decumulation
    * (cum − lag(cum)). The output is the full dense layout (zero-count
    * buckets included — the wire shape a migrated scrape carries,
    * unlike [[qNativeCustom]]'s sparse build, which it must and does
    * agree with on populated buckets — `Round9OperatorSpec` pins
    * that). Window-function lag over a series × windows × |bounds|+1
    * frame. */
  def qNhcbMigrate(spark: SparkSession, dir: String): DataFrame = {
    val bs = CustomBounds.mkString(", ")
    val le = samples(spark, dir)
      .withColumn("cents", col("sgn") * col("pos"))
      .crossJoin(broadcast(spark.range(CustomBounds.size + 1)
        .select(col("id").as("bucket_idx"))))
      .withColumn("le_cents",
        when(col("bucket_idx") < CustomBounds.size,
          expr(s"element_at(array($bs), CAST(bucket_idx + 1 AS INT))"))
          .otherwise(lit(-1L)))
      .groupBy("name", "user_id", "w_start", "bucket_idx", "le_cents")
      .agg(sum(when(col("le_cents") === -1L ||
        col("cents") <= col("le_cents"), 1L).otherwise(0L)).as("cum"))
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("bucket_idx")
    le.withColumn("cnt",
        col("cum") - coalesce(lag("cum", 1).over(w), lit(0L)))
      .select(col("name"), col("user_id"), col("w_start"),
        col("bucket_idx"), col("le_cents"), col("cum"), col("cnt"))
  }

  val nhcbMigrateSql: String = {
    val bs = CustomBounds.mkString(", ")
    s"""WITH $samplesSql,
       |bx AS (SELECT unnest(generate_series(0, ${CustomBounds.size})) AS bucket_idx),
       |le AS (SELECT sm.name, sm.user_id, sm.w_start, bx.bucket_idx,
       |        CAST(CASE WHEN bx.bucket_idx < ${CustomBounds.size}
       |             THEN ([$bs])[CAST(bx.bucket_idx + 1 AS INT)]
       |             ELSE -1 END AS BIGINT) AS le_cents,
       |        CAST(SUM(CASE WHEN bx.bucket_idx = ${CustomBounds.size}
       |                  OR sm.sgn * sm.pos <= ([$bs])[CAST(bx.bucket_idx + 1 AS INT)]
       |                 THEN 1 ELSE 0 END) AS BIGINT) AS cum
       |       FROM sm CROSS JOIN bx
       |       GROUP BY sm.name, sm.user_id, sm.w_start, bx.bucket_idx)
       |SELECT name, user_id, w_start, CAST(bucket_idx AS BIGINT) AS bucket_idx,
       |       le_cents, cum,
       |       CAST(cum - COALESCE(lag(cum) OVER (PARTITION BY name, user_id,
       |         w_start ORDER BY bucket_idx), 0) AS BIGINT) AS cnt
       |FROM le""".stripMargin
  }

  /** q_native_quantile — `histogram_quantile(φ, native)` for
    * φ ∈ {0.5, 0.9}, transcribed from the public algorithm: order
    * buckets by VALUE (negative indexes descending → zero bucket →
    * positive ascending; ord = sgn·(idx+1) realizes exactly that),
    * find the bucket where the cumulative count crosses rank = φ·n,
    * and interpolate EXPONENTIALLY within its bounds — the Prometheus
    * 3.0 rule (PR #14677) for exponential-bucket layouts: a positive
    * bucket yields lo·2^frac, a negative one mirrors as −up·2^(−frac)
    * (continuous at both ends since up = 2·lo), the zero bucket
    * returns 0. Bounds live as halfcent integers (1 << idx,
    * 1 << (idx+1)); rank, frac and the one 2^frac term are the only
    * doubles, operand-identical across engines.
    */
  def qNativeQuantile(spark: SparkSession, dir: String): DataFrame = {
    val grp = Seq("name", "user_id", "w_start")
    val bk = buckets0(spark, dir)
      .withColumn("ord", col("sgn") * (col("bucket_idx") + 1L))
      .withColumn("tot",
        sum("cnt").over(Window.partitionBy(grp.map(col): _*)))
      .withColumn("cum", sum("cnt").over(Window.partitionBy(grp.map(col): _*)
        .orderBy("ord").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val phis = spark.range(1).select(
      explode(typedLit(Seq(50L, 90L))).as("phi_x100"))
    val ranked = bk.crossJoin(broadcast(phis))
      .withColumn("rk",
        (col("tot") * col("phi_x100")).cast("double") / 100.0)
      .filter(col("cum") >= col("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy((grp :+ "phi_x100").map(col): _*).orderBy("ord")))
      .filter(col("rn") === 1)
    val frac = (col("rk") - (col("cum") - col("cnt")).cast("double")) /
      col("cnt").cast("double")
    ranked.select(col("name"), col("user_id"), col("w_start"),
      col("phi_x100"),
      round(
        when(col("sgn") === 0L, lit(0.0)).otherwise(
          when(col("sgn") === 1L,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_idx AS INT))")
              .cast("double") * pow(lit(2.0), frac))
            .otherwise(
              -expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_idx + 1 AS INT))")
                .cast("double") * pow(lit(2.0), -frac)))
          / 200.0, 6).as("q_value"))
  }

  val nativeQuantileSql: String =
    s"""WITH $buckets0Sql,
       |o AS (SELECT *, sgn * (bucket_idx + 1) AS ord,
       |        CAST(SUM(cnt) OVER (PARTITION BY name, user_id, w_start) AS BIGINT) AS tot,
       |        CAST(SUM(cnt) OVER (PARTITION BY name, user_id, w_start
       |          ORDER BY sgn * (bucket_idx + 1)
       |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |      FROM bk),
       |ph AS (SELECT unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT)]) AS phi_x100),
       |r AS (SELECT o.*, ph.phi_x100,
       |        CAST(o.tot * ph.phi_x100 AS DOUBLE) / 100.0 AS rk
       |      FROM o CROSS JOIN ph),
       |sel AS (SELECT *, row_number() OVER (PARTITION BY name, user_id,
       |          w_start, phi_x100 ORDER BY ord) AS rn
       |        FROM r WHERE cum >= rk)
       |SELECT name, user_id, w_start, phi_x100,
       |       round(CASE WHEN sgn = 0 THEN 0.0
       |         WHEN sgn = 1 THEN
       |           CAST(1::BIGINT << CAST(bucket_idx AS INT) AS DOUBLE)
       |             * pow(2.0, ((rk - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)))
       |         ELSE
       |           -CAST(1::BIGINT << CAST(bucket_idx + 1 AS INT) AS DOUBLE)
       |             * pow(2.0, -((rk - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)))
       |         END / 200.0, 6) AS q_value
       |FROM sel WHERE rn = 1""".stripMargin

  /** q_native_stats — the native-histogram SERIES LAYOUT per (series,
    * window): observation count, exact sum (×100 cents), zero and
    * negative tallies, and — the native-specific part — the
    * positive-bucket index layout the wire format's SPAN encoding
    * depends on: populated-bucket count, index min/max, and the number
    * of contiguous index RUNS (each run = one span record). A gappy
    * layout (many spans) is what makes a native histogram expensive to
    * encode — this is the operator an ingest pipeline watches. Span
    * counting is the idx − row_number() run-grouping identity on the
    * shared bucket frame; series-windows with no positive buckets
    * report 0 buckets/spans and −1 index bounds. */
  def qNativeStats(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / WindowSec) * WindowSec)
        .as("w_start"),
      round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("h_count"), sum("cents").as("h_sum_x100"),
        sum(when(col("cents") === 0L, 1L).otherwise(0L)).as("zero_count"),
        sum(when(col("cents") < 0L, 1L).otherwise(0L)).as("neg_count"))
    val posIdx = buckets0(spark, dir).filter(col("sgn") === 1L)
      .select(col("name"), col("user_id"), col("w_start"), col("bucket_idx"))
    val runW = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("bucket_idx")
    val spans = posIdx
      .withColumn("run", col("bucket_idx") - row_number().over(runW))
      .groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("n_buckets"),
        min("bucket_idx").as("idx_min"), max("bucket_idx").as("idx_max"),
        countDistinct("run").as("n_spans"))
    base.join(spans, Seq("name", "user_id", "w_start"), "left")
      .select(col("name"), col("user_id"), col("w_start"), col("h_count"),
        col("h_sum_x100"), col("zero_count"), col("neg_count"),
        coalesce(col("n_buckets"), lit(0L)).as("n_buckets"),
        coalesce(col("idx_min"), lit(-1L)).as("idx_min"),
        coalesce(col("idx_max"), lit(-1L)).as("idx_max"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** q_native_sum — `sum(native_histogram)` across series (the
    * Prometheus 3.x aggregation a recording rule runs over a native-
    * histogram metric): sparse histograms of the SAME schema merge by
    * adding bucket counts per index — the algebraic property the
    * streaming histogram_quantile twin already exploits, here as the
    * batch cross-series aggregator. Per (name, window, sign, bucket):
    * the merged count and how many series populated that bucket.
    * Rides the shared [[buckets0]] frame (4th consumer); the merge is
    * ONE map-side-combinable groupBy of a series×buckets-bounded
    * frame — at 100 TB the samples were already collapsed to sparse
    * buckets by the shared build, so the cross-series fold never
    * touches raw samples. */
  def qNativeSum(spark: SparkSession, dir: String): DataFrame =
    buckets0(spark, dir)
      .groupBy("name", "w_start", "sgn", "bucket_idx")
      .agg(sum("cnt").as("cnt"), count(lit(1)).as("n_series"))

  val nativeSumSql: String =
    s"""WITH $buckets0Sql
       |SELECT name, w_start, sgn, bucket_idx,
       |       CAST(SUM(cnt) AS BIGINT) AS cnt,
       |       COUNT(*) AS n_series
       |FROM bk GROUP BY 1, 2, 3, 4""".stripMargin

  val nativeStatsSql: String =
    s"""WITH $buckets0Sql,
       |base AS (SELECT name, user_id, w_start,
       |          CAST(COUNT(*) AS BIGINT) AS h_count,
       |          CAST(SUM(CASE WHEN sgn >= 0 THEN pos ELSE -pos END) AS BIGINT) AS h_sum_x100,
       |          CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_count,
       |          CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_count
       |         FROM sm GROUP BY name, user_id, w_start),
       |pi AS (SELECT name, user_id, w_start, bucket_idx,
       |         bucket_idx - row_number() OVER (PARTITION BY name, user_id,
       |           w_start ORDER BY bucket_idx) AS run
       |       FROM bk WHERE sgn = 1),
       |sp AS (SELECT name, user_id, w_start,
       |         CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |         CAST(MIN(bucket_idx) AS BIGINT) AS idx_min,
       |         CAST(MAX(bucket_idx) AS BIGINT) AS idx_max,
       |         CAST(COUNT(DISTINCT run) AS BIGINT) AS n_spans
       |       FROM pi GROUP BY name, user_id, w_start)
       |SELECT b.name, b.user_id, b.w_start, b.h_count, b.h_sum_x100,
       |       b.zero_count, b.neg_count,
       |       COALESCE(sp.n_buckets, 0) AS n_buckets,
       |       COALESCE(sp.idx_min, -1) AS idx_min,
       |       COALESCE(sp.idx_max, -1) AS idx_max,
       |       COALESCE(sp.n_spans, 0) AS n_spans
       |FROM base b LEFT JOIN sp
       |  ON b.name = sp.name AND b.user_id = sp.user_id
       |  AND b.w_start = sp.w_start""".stripMargin

  /** q_native_delta — sparse HISTOGRAM SUBTRACTION between adjacent
    * windows: per series, for every consecutive 1h-window pair, the
    * bucket-wise count change (next − prev) over the schema-0 sparse
    * buckets, with a bucket ABSENT on one side counting 0 — the
    * primitive `rate(native_histogram[..])` is built from (a native
    * histogram is subtracted bucket-wise; buckets appear and disappear
    * between scrapes, which is exactly what the sparse representation
    * must handle and dense `le`-arrays never face). Shifted-key
    * equality self-join on the SHARED bucket frame (the
    * q_offset_compare idiom: next.w_start = prev.w_start + 3600), full
    * outer so one-sided buckets surface, zero-delta rows dropped
    * (sparse in, sparse out). Both sides read the one materialized
    * frame; everything is |buckets|-bounded.
    */
  def qNativeDelta(spark: SparkSession, dir: String): DataFrame = {
    val bk = buckets0(spark, dir)
    // r15 (guide §2.3 "aggregate before you shuffle" / §2.4): the
    // FULL-OUTER shifted self-join sorted the samples-scale bucket
    // frame twice, and the two "both windows exist" gates were two
    // more distinct+semi-join passes — five exchanges total. The
    // full-outer subtraction is an AGGREGATION in disguise: each
    // bucket row contributes +cnt to its own window and −cnt to the
    // window one step ahead; one map-side-combinable hash aggregate
    // over the 2× union produces the identical sparse delta set (a
    // bucket absent on one side simply contributes one term). The gate
    // folds to ONE window-lag pass over the distinct (series, window)
    // frame: both windows exist iff the series' previous distinct
    // window is exactly one step back. Round15OptSpec pins the rewrite
    // row-exact against the join form; the oracle is unchanged.
    val delta = bk.select(col("name"), col("user_id"), col("w_start"),
        col("sgn"), col("bucket_idx"), col("cnt").as("d"))
      .unionByName(bk.select(col("name"), col("user_id"),
        (col("w_start") + WindowSec).as("w_start"), col("sgn"),
        col("bucket_idx"), (-col("cnt")).as("d")))
      .groupBy("name", "user_id", "w_start", "sgn", "bucket_idx")
      .agg(sum("d").as("delta_cnt"))
      .filter(col("delta_cnt") =!= 0L)
    val wnd = bk.select("name", "user_id", "w_start").distinct()
    val wSeries = Window.partitionBy("name", "user_id").orderBy("w_start")
    val both = wnd
      .withColumn("prev_w", lag("w_start", 1).over(wSeries))
      .filter(col("prev_w") === col("w_start") - WindowSec)
      .select("name", "user_id", "w_start")
    delta.join(both, Seq("name", "user_id", "w_start"), "left_semi")
      .select(col("name"), col("user_id"), col("w_start"), col("sgn"),
        col("bucket_idx"), col("delta_cnt"))
  }

  val nativeDeltaSql: String =
    s"""WITH $buckets0Sql,
       |pv AS (SELECT name, user_id, w_start + $WindowSec AS w_start, sgn,
       |              bucket_idx, cnt AS prev_cnt
       |       FROM bk),
       |nx AS (SELECT name, user_id, w_start, sgn, bucket_idx,
       |              cnt AS next_cnt
       |       FROM bk),
       |j AS (SELECT COALESCE(nx.name, pv.name) AS name,
       |             COALESCE(nx.user_id, pv.user_id) AS user_id,
       |             COALESCE(nx.w_start, pv.w_start) AS w_start,
       |             COALESCE(nx.sgn, pv.sgn) AS sgn,
       |             COALESCE(nx.bucket_idx, pv.bucket_idx) AS bucket_idx,
       |             COALESCE(nx.next_cnt, 0) - COALESCE(pv.prev_cnt, 0)
       |               AS delta_cnt
       |      FROM nx FULL OUTER JOIN pv
       |        ON nx.name = pv.name AND nx.user_id = pv.user_id
       |        AND nx.w_start = pv.w_start AND nx.sgn = pv.sgn
       |        AND nx.bucket_idx = pv.bucket_idx)
       |SELECT j.name, j.user_id, j.w_start, j.sgn, j.bucket_idx,
       |       CAST(j.delta_cnt AS BIGINT) AS delta_cnt
       |FROM j
       |WHERE j.delta_cnt <> 0
       |  AND EXISTS (SELECT 1 FROM nx WHERE nx.name = j.name
       |              AND nx.user_id = j.user_id AND nx.w_start = j.w_start)
       |  AND EXISTS (SELECT 1 FROM pv WHERE pv.name = j.name
       |              AND pv.user_id = j.user_id AND pv.w_start = j.w_start)""".stripMargin

  /** q_native_fraction — `histogram_fraction(-Inf, x, native)`: the
    * estimated fraction of observations ≤ x, for x ∈ {5.00, 50.00}
    * (500/5000 cents — plan-time constants). Negative and zero buckets
    * contribute fully (x > 0); a positive bucket contributes fully
    * below x, nothing above, and the ONE straddling bucket
    * interpolates EXPONENTIALLY — the Prometheus 3.0 rule (PR #14677):
    * its contribution is cnt·log₂(x/lo) (the log-space position of x
    * in a bucket whose log-width is exactly 1) — kept as a single
    * double term added to an exact integer sum, so no order-dependent
    * double accumulation exists. */
  def qNativeFraction(spark: SparkSession, dir: String): DataFrame = {
    val grp = Seq("name", "user_id", "w_start")
    val bounds = spark.range(1).select(
      explode(typedLit(Seq(500L, 5000L))).as("bound_x100"))
    val lower = expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_idx AS INT))")
    val upper = expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_idx + 1 AS INT))")
    val boundHc = col("bound_x100") * 2L
    val full = col("sgn") < 1L || (upper <= boundHc)
    val straddle = col("sgn") === 1L && (lower < boundHc) && (upper > boundHc)
    buckets0(spark, dir).crossJoin(broadcast(bounds))
      .groupBy((grp :+ "bound_x100").map(col): _*)
      .agg(sum("cnt").as("tot"),
        sum(when(full, col("cnt")).otherwise(0L)).as("full_cnt"),
        sum(when(straddle,
          col("cnt").cast("double")
            * log2(boundHc.cast("double") / lower.cast("double")))
          .otherwise(lit(0.0)))
          .as("partial"))
      .select(col("name"), col("user_id"), col("w_start"), col("bound_x100"),
        round((col("full_cnt").cast("double") + col("partial"))
          / col("tot").cast("double"), 6).as("frac_le"))
  }

  val nativeFractionSql: String =
    s"""WITH $buckets0Sql,
       |bd AS (SELECT unnest([CAST(500 AS BIGINT), CAST(5000 AS BIGINT)]) AS bound_x100),
       |j AS (SELECT bk.*, bd.bound_x100,
       |        1::BIGINT << CAST(bucket_idx AS INT) AS lo_hc,
       |        1::BIGINT << CAST(bucket_idx + 1 AS INT) AS up_hc,
       |        bd.bound_x100 * 2 AS bound_hc
       |      FROM bk CROSS JOIN bd)
       |SELECT name, user_id, w_start, bound_x100,
       |       round((CAST(SUM(CASE WHEN sgn < 1 OR up_hc <= bound_hc
       |                            THEN cnt ELSE 0 END) AS DOUBLE)
       |              + SUM(CASE WHEN sgn = 1 AND lo_hc < bound_hc
       |                          AND up_hc > bound_hc
       |                         THEN CAST(cnt AS DOUBLE)
       |                              * log2(CAST(bound_hc AS DOUBLE)
       |                                     / CAST(lo_hc AS DOUBLE))
       |                         ELSE 0.0 END))
       |             / CAST(SUM(cnt) AS DOUBLE), 6) AS frac_le
       |FROM j GROUP BY name, user_id, w_start, bound_x100""".stripMargin
}
