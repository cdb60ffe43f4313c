package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The reference ETL surface re-expressed Spark-first (SURVEY.md §2.A).
  *
  * The reference (etl_job.py) turns a Prometheus query_range matrix into
  * ClickHouse rows `(timestamp µs, name, sorted labels.key[]/.value[],
  * Float64 value)`, assigns content-hash ids, batches by time window, and
  * tracks job state. Here the `events` table plays the metric stream
  * (`event_type` → __name__, `{k: props.k, user: user_id}` → labels) and
  * every stage is a declarative DataFrame plan: filters/projections push
  * to the parquet scan, per-series ops partition by series key, window
  * batching is a groupBy on a derived window id (map-side combinable) —
  * no driver-side loops, no UDFs.
  */
object MetricsEtl {

  /** Metrics view: events → ClickHouse metrics schema (etl_job.py:545-738).
    * Labels are DYNAMIC, like the reference (etl_job.py:619-625): the full
    * label map = parsed `props` JSON ∪ {user → user_id}, keys sorted, and
    * parallel key/value arrays derived from the sorted keys. Timestamps as
    * epoch µs (BIGINT) so Spark and the DuckDB oracle compare exactly.
    */
  def metrics(spark: SparkSession, dir: String): DataFrame =
    MaterializeOnce(spark, dir, "etl:metrics")(metricsPlan(spark, dir))

  /** The raw parse plan behind [[metrics]] — the JSON parse + label-map
    * HOFs are the dominant per-row cost, and SEVEN queries consume the
    * result, so the frame is materialized once per (session, dir) like
    * the Dedup/Similarity shared frames (corpus-row-bounded: one narrow
    * row per event). Audits plan against this builder. */
  private[graft] def metricsPlan(spark: SparkSession, dir: String): DataFrame = {
    // drop a pre-existing 'user' key before adding ours: map_concat
    // THROWS on duplicate keys under the default mapKeyDedupPolicy, and
    // the explicit label must win over a same-named props label
    val labels = map_concat(
      map_filter(from_json(col("props"), MapType(StringType, StringType)),
        (k, _) => k =!= "user"),
      map(lit("user"), col("user_id").cast("string")))
    Tables.events(spark, dir)
      .withColumn("labels", labels)
      .select(
        unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"),
        array_sort(map_keys(col("labels"))).as("label_keys"),
        transform(array_sort(map_keys(col("labels"))),
          k => element_at(col("labels"), k)).as("label_values"),
        col("value"),
        col("event_id"))
  }

  /** DuckDB twins of the dynamic label arrays, for oracle SQL authoring
    * (mirrors the Spark side's reserved-key filtering). */
  private val keysSql =
    "list_sort(list_append(list_filter(json_keys(props), k -> k <> 'user'), 'user'))"
  private val valuesSql =
    s"""list_transform($keysSql, k -> CASE WHEN k = 'user'
       |  THEN CAST(user_id AS VARCHAR)
       |  ELSE json_extract_string(props, '$$.' || k) END)""".stripMargin

  /** q_metrics_ingest — the R1 transform itself. Labels surface as joined
    * strings (not arrays) so the driver's pandas-based compare can sort
    * and hash the rows; the internal `metrics` view keeps real arrays.
    */
  def qMetricsIngest(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir).select(
      col("ts_us"), col("name"),
      array_join(col("label_keys"), ",").as("label_keys_str"),
      array_join(col("label_values"), ",").as("label_values_str"),
      col("value"))

  val metricsIngestSql: String =
    s"""SELECT epoch_us(ts) AS ts_us, event_type AS name,
       |       array_to_string($keysSql, ',') AS label_keys_str,
       |       array_to_string($valuesSql, ',') AS label_values_str,
       |       value
       |FROM events""".stripMargin

  /** Canonical row content string for hashing — mirrors the column list of
    * the reference's `cityHash64(timestamp, name, labels.key, labels.value,
    * value)` MATERIALIZED id. Value rendered via integer cents
    * ([[graft.functions.Portable.centsStr]]) so the string is bit-identical
    * across engines (no printf half-way rounding divergence).
    */
  private def contentString(valueCol: Column): Column =
    concat_ws("\u0001",
      col("ts_us").cast("string"),
      col("name"),
      array_join(col("label_keys"), ","),
      array_join(col("label_values"), ","),
      centsStr(valueCol))

  /** q_metrics_id — content-hash row identity (R5). */
  def qMetricsId(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir)
      .withColumn("id", hash60(contentString(col("value"))))
      .select("id", "ts_us", "name", "value")

  val metricsIdSql: String = {
    val content =
      "concat_ws(chr(1), CAST(epoch_us(ts) AS VARCHAR), event_type, " +
        s"array_to_string($keysSql, ','), " +
        s"array_to_string($valuesSql, ','), " +
        s"${centsStrSql("value")})"
    s"""SELECT ${hash60Sql(content)} AS id, epoch_us(ts) AS ts_us,
       |       event_type AS name, value
       |FROM events""".stripMargin
  }

  /** q_metrics_id_city — R5 row identity, BIT-EXACT vs ClickHouse: the
    * reference's dedup id is `id UInt64 MATERIALIZED cityHash64(timestamp,
    * name, labels.key, labels.value, value)` (reference README.md:119-134),
    * computed server-side by ClickHouse. [[qMetricsId]]'s portable hash60
    * reproduces the dedup SEMANTICS with different id values; this twin
    * reproduces the VALUES, so rows graft writes can be cross-checked
    * byte-for-byte against an existing deployment's materialized ids.
    * Uses the native [[graft.functions.CityHash64Expr]] (CityHash v1.0.2 —
    * the revision ClickHouse vendors — plus ClickHouse's FunctionAnyHash
    * multi-arg/array/POD conventions; golden-vectored in CityHash64Spec
    * against an independent Python twin, tools/cityhash_ref.py).
    *
    * DuckDB has no cityHash64, so the oracle ([[metricsIdCitySql]]) joins
    * a PRECOMPUTED lookup (tools/fixtures/cityhash_ids.parquet) generated
    * by the independent Python twin tools/cityhash_ref.py over the same
    * events — expected values from an implementation this code shares
    * nothing with (regenerate with tools/gen_cityhash_lookup.py when
    * testdata changes). The id is surfaced as an UNSIGNED decimal STRING
    * (`conv(hex(x),16,10)`): ClickHouse renders UInt64, so a signed
    * Long.toString would print half the ids negative and break textual
    * cross-checks against a deployment's materialized ids (r5 advice);
    * string also keeps pandas from rounding a UInt64-as-float64 id.
    */
  def qMetricsIdCity(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir)
      .withColumn("city_id", graft.functions.CityHash64Expr.cityHash64(
        col("ts_us"), col("name"), col("label_keys"), col("label_values"),
        col("value")))
      .select(conv(hex(col("city_id")), 16, 10).as("city_id"),
        col("ts_us"), col("name"), col("value"))

  /** Oracle for [[qMetricsIdCity]]: join the independently-precomputed
    * id lookup on (event_id, epoch µs) — verified unique across the SF
    * union — so the driver's compare covers the hash VALUES, not just
    * row counts. The inner join also asserts coverage: a missing lookup
    * row shrinks the oracle side and fails the row-count compare.
    */
  val metricsIdCitySql: String =
    """SELECT l.city_id, epoch_us(e.ts) AS ts_us,
      |       e.event_type AS name, e.value
      |FROM events e
      |JOIN read_parquet('/root/repo/tools/fixtures/cityhash_ids.parquet') l
      |  ON e.event_id = l.event_id AND epoch_us(e.ts) = l.ts_us""".stripMargin

  /** q_metrics_skipped — R2 value-parse classification. Prometheus may
    * return values as strings ("NaN", "Inf", "-Inf", numeric, or garbage);
    * the reference parses numerics + specials and counts the rest as
    * skipped (etl_job.py:650-717). We derive a deterministic string-typed
    * value stream from events (some rows made unparseable / special), run
    * the try-parse classification, and report per-series parsed/skipped
    * counts — the reference's (rows_count, skipped_count) pair per series.
    */
  def qMetricsSkipped(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir).select(
      col("event_type").as("name"),
      when(col("event_id") % 97 === 0, lit("garbage"))
        .when(col("event_id") % 89 === 0, lit("NaN"))
        .when(col("event_id") % 83 === 0, lit("Inf"))
        .when(col("event_id") % 79 === 0, lit("-Inf"))
        .when(col("event_id") % 73 === 0, lit("1e-3"))
        .when(col("event_id") % 71 === 0, lit(".5"))
        .when(col("event_id") % 67 === 0, lit("+2"))
        .otherwise(format_string("%.2f", col("value"))).as("raw_value"))
    // try-parse with Python-float() breadth (etl_job.py:650-717): numeric
    // strings incl. scientific / bare-dot / signed forms, NaN/Inf
    // preserved, everything else skipped+counted. try_cast matches
    // Python's float() on all these token classes in both engines.
    val parsed = raw.withColumn("ok",
      expr("try_cast(raw_value AS DOUBLE)").isNotNull)
    parsed.groupBy("name").agg(
      sum(when(col("ok"), 1L).otherwise(0L)).as("rows_count"),
      sum(when(!col("ok"), 1L).otherwise(0L)).as("skipped_count"))
  }

  val metricsSkippedSql: String =
    """WITH raw AS (
      |  SELECT event_type AS name,
      |         CASE WHEN event_id % 97 = 0 THEN 'garbage'
      |              WHEN event_id % 89 = 0 THEN 'NaN'
      |              WHEN event_id % 83 = 0 THEN 'Inf'
      |              WHEN event_id % 79 = 0 THEN '-Inf'
      |              WHEN event_id % 73 = 0 THEN '1e-3'
      |              WHEN event_id % 71 = 0 THEN '.5'
      |              WHEN event_id % 67 = 0 THEN '+2'
      |              ELSE printf('%.2f', value) END AS raw_value
      |  FROM events)
      |SELECT name,
      |       CAST(SUM(CASE WHEN try_cast(raw_value AS DOUBLE) IS NOT NULL
      |                THEN 1 ELSE 0 END) AS BIGINT) AS rows_count,
      |       CAST(SUM(CASE WHEN try_cast(raw_value AS DOUBLE) IS NOT NULL
      |                THEN 0 ELSE 1 END) AS BIGINT) AS skipped_count
      |FROM raw GROUP BY name""".stripMargin

  /** q_tsv_format — R3: TabSeparated line rendering (escape + ClickHouse
    * array literals), the reference's output format (etl_job.py:719-738).
    */
  def qTsvFormat(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir).select(
      col("ts_us"),
      concat_ws("\t",
        microsSecondsStr(col("ts_us")),
        tsvEscape(col("name")),
        chArray(col("label_keys")),
        chArray(col("label_values")),
        centsStr(col("value"))).as("tsv_line"))

  val tsvFormatSql: String =
    s"""SELECT epoch_us(ts) AS ts_us,
       |       concat_ws(chr(9),
       |         ${microsSecondsStrSql("epoch_us(ts)")},
       |         ${tsvEscapeSql("event_type")},
       |         ${chArraySql(keysSql)},
       |         ${chArraySql(valuesSql)},
       |         ${centsStrSql("value")}) AS tsv_line
       |FROM events""".stripMargin

  /** q_window_batches — R6/R7: assign rows to 300s ETL batch windows and
    * compute per-window batch stats (batch_rows, batch_skipped_count,
    * bounds). One groupBy on the derived window id → map-side partial
    * aggregation; at 100 TB this is the natural daily-partition rollup.
    */
  def qWindowBatches(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 300L
    val e = Tables.events(spark, dir).select(
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("window_start"),
      when(col("event_id") % 97 === 0, 1L).otherwise(0L).as("skipped"))
    e.groupBy("window_start").agg(
      count(lit(1)).as("batch_rows"),
      sum("skipped").as("batch_skipped_count"))
      .withColumn("window_end", col("window_start") + winSize)
      .select("window_start", "window_end", "batch_rows", "batch_skipped_count")
  }

  val windowBatchesSql: String =
    """SELECT CAST(floor(epoch_us(ts) / 1000000 / 300) * 300 AS BIGINT) AS window_start,
      |       CAST(floor(epoch_us(ts) / 1000000 / 300) * 300 + 300 AS BIGINT) AS window_end,
      |       COUNT(*) AS batch_rows,
      |       CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS batch_skipped_count
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q_overlap_rows — R6/R9 overlap RE-DELIVERY accounting: the
    * reference re-fetches each batch window with a leading overlap
    * (`window_start = progress − overlap`, etl_job.py:357-393), so the
    * last `overlap` seconds of every window are DELIVERED TWICE and
    * collapse only through the content-hash id + ReplacingMergeTree
    * (R5/R9). This operator quantifies that idempotency traffic per
    * batch: new rows, re-delivered rows, fetched total and the
    * re-delivery ppm — the table that justifies (or re-tunes) the
    * overlap setting. No self-join: each event fans out IN-ROW to ≤2
    * (window, kind) memberships (its own window as `new`, the NEXT
    * window as `re-delivered` iff it sits in the tail band), one
    * map-side-combinable aggregate, |windows|-bounded output.
    */
  def qOverlapRows(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 300L
    val ov = 60L
    val e = Tables.events(spark, dir).select(
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize)
        .as("w0"),
      expr("unix_micros(ts) div 1000000").as("ts_s"))
    val memb = e.select(explode(when(
      col("ts_s") >= col("w0") + (winSize - ov),
      array(struct(col("w0").as("w"), lit(0L).as("redeliv")),
        struct((col("w0") + winSize).as("w"), lit(1L).as("redeliv"))))
      .otherwise(array(struct(col("w0").as("w"), lit(0L).as("redeliv")))))
      .as("m"))
      .select(col("m.w").as("window_start"), col("m.redeliv"))
    memb.groupBy("window_start")
      .agg(sum(lit(1L) - col("redeliv")).as("new_rows"),
        sum("redeliv").as("redelivered_rows"))
      .select(col("window_start"), col("new_rows"), col("redelivered_rows"),
        (col("new_rows") + col("redelivered_rows")).as("fetched_rows"),
        expr("redelivered_rows * 1000000 div (new_rows + redelivered_rows)")
          .as("redeliv_ppm"))
  }

  val overlapRowsSql: String =
    """WITH r AS (
      |  SELECT CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w0,
      |         epoch_us(ts) // 1000000 AS ts_s
      |  FROM events),
      |m AS (SELECT w0 AS window_start, 0 AS redeliv FROM r
      |      UNION ALL
      |      SELECT w0 + 300, 1 FROM r WHERE ts_s >= w0 + 240)
      |SELECT window_start,
      |       CAST(SUM(1 - redeliv) AS BIGINT) AS new_rows,
      |       CAST(SUM(redeliv) AS BIGINT) AS redelivered_rows,
      |       COUNT(*) AS fetched_rows,
      |       CAST(SUM(redeliv) AS BIGINT) * 1000000 // COUNT(*)
      |         AS redeliv_ppm
      |FROM m GROUP BY window_start""".stripMargin

  /** q_etl_state — R6/R7: the job-state ledger the reference keeps in its
    * ClickHouse `etl` table, simulated over the event stream. Each batch
    * window produces one state record; `timestamp_progress` advances to
    * `min(window_end, now)` where `now` = the stream's max timestamp
    * (etl_job.py:148-177), and `actual_window = min(window_end, now) −
    * window_start`. Valid-completed filtering (end > start, progress not
    * null) mirrors clickhouse_client.get_state().
    */
  def qEtlState(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 300L
    val e = Tables.events(spark, dir)
      .select((floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize)
        .as("window_start"),
        floor(unix_micros(col("ts")) / 1000000L).cast("long").as("ts_s"))
    val now = e.agg(max("ts_s").as("now"))
    val st = e.groupBy("window_start")
      .agg(count(lit(1)).as("batch_rows"))
      .crossJoin(broadcast(now))
    st.select(
      col("window_start").as("timestamp_start"),
      least(col("window_start") + winSize, col("now")).as("timestamp_progress"),
      (least(col("window_start") + winSize, col("now")) - col("window_start"))
        .as("batch_window_seconds"),
      col("batch_rows"))
      .filter(col("timestamp_progress") > col("timestamp_start"))
  }

  val etlStateSql: String =
    """WITH e AS (
      |  SELECT CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS window_start,
      |         CAST(floor(epoch_us(ts)/1000000) AS BIGINT) AS ts_s
      |  FROM events),
      |now_t AS (SELECT max(ts_s) AS now FROM e)
      |SELECT window_start AS timestamp_start,
      |       least(window_start + 300, now) AS timestamp_progress,
      |       least(window_start + 300, now) - window_start AS batch_window_seconds,
      |       COUNT(*) AS batch_rows
      |FROM e, now_t
      |GROUP BY window_start, now
      |HAVING least(window_start + 300, now) > window_start""".stripMargin

  /** q_dedup_final — R9: ReplacingMergeTree FINAL semantics. The reference
    * relies on ClickHouse keep-latest-per-ORDER-BY-key to absorb idempotent
    * replays; here: latest event per (user_id, event_type), event_id as
    * the deterministic version tiebreak. Single shuffle on the logical key.
    */
  def qDedupFinal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("event_id"))
  }

  val dedupFinalSql: String =
    """SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, event_id
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** q_selector — R1: PromQL-style instant selector
    * `{__name__=~"(purchase|signup|click)", k=~"^1.*"}` over the metrics
    * view. Note on pushdown: `rlike` / `get_json_object` predicates are
    * evaluated post-scan (parquet pushes only simple comparisons /
    * IN / startsWith); what DOES reach the scan here is column pruning.
    * A production selector on equality matchers would use `isin`, which
    * parquet can push — PromQL regex matchers inherently cannot be.
    *
    * The JSON label is extracted ONCE, in a projection below the filter.
    * Subtlety: simply filtering on the aliased column is NOT enough —
    * PushPredicateThroughNonJoin substitutes the alias and pushes the
    * predicate below the Project, recreating a plan that parses every
    * `props` document twice (once in the Filter, once in the Project;
    * no CSE runs across that boundary — measured 0.85 s → 4.90 s at
    * sf0.1 in round 2). The `_barrier` conjunct (a nondeterministic
    * always-true term, placed FIRST: pushdown only splits off a
    * DETERMINISTIC PREFIX of conjuncts) pins the filter ABOVE the
    * extraction — and because the filter references `_barrier`, column
    * pruning can't remove it and re-enable the pushdown. The name-regex
    * filter stays below to shrink the rows that get parsed. Verified in
    * the optimized plan: exactly one get_json_object call.
    */
  def qSelector(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").rlike("^(purchase|signup|click)$"))
      .select(unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"),
        col("user_id"),
        get_json_object(col("props"), "$.k").as("k"),
        col("value"),
        monotonically_increasing_id().as("_barrier"))
      .filter(col("_barrier") >= 0 && col("k").rlike("^1"))
      .drop("_barrier")

  val selectorSql: String =
    """SELECT epoch_us(ts) AS ts_us, event_type AS name, user_id,
      |       CAST(json_extract_string(props,'$.k') AS VARCHAR) AS k, value
      |FROM events
      |WHERE regexp_matches(event_type, '^(purchase|signup|click)$')
      |  AND regexp_matches(CAST(json_extract_string(props,'$.k') AS VARCHAR), '^1')""".stripMargin

  /** q_rate — PromQL rate() with counter-reset correction: per series
    * per 5m window, sum of reset-corrected successive deltas divided by
    * the observed time span. A negative delta means the counter
    * restarted from 0, so that step contributes the NEW value (PromQL's
    * rule), not zero and not the raw negative. Windows with <2 points
    * yield no rate. (PromQL's boundary extrapolation is deliberately
    * omitted here so this core stays oracle-exact on the simple
    * deltas/span definition; the full extrapolated form is
    * [[qRateExtrapolated]].)
    */
  def qRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_s", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w_start"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      // integer cents: delta sums stay exact (order-independent) so the
      // final division is bit-identical across engines
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .withColumn("corrected",
        when(col("delta") < 0, col("cents")).otherwise(col("delta")))
      .groupBy("name", "user_id", "w_start")
      .agg(sum("corrected").as("inc_cents"),
        min("ts_s").as("t_first"), max("ts_s").as("t_last"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("t_last") > col("t_first"))
      .select(col("name"), col("user_id"), col("w_start"),
        round(col("inc_cents").cast("double") / 100d
          / (col("t_last") - col("t_first")), 6).as("rate"))
  }

  val rateSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         epoch_us(ts)/1000000.0 AS ts_s,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *, cents - lag(cents) OVER (PARTITION BY name, user_id, w_start
      |           ORDER BY ts_s, event_id) AS delta
      |  FROM s),
      |c AS (
      |  SELECT *, CASE WHEN delta < 0 THEN cents ELSE delta END AS corrected
      |  FROM d)
      |SELECT name, user_id, w_start,
      |       round(CAST(SUM(corrected) AS BIGINT) / 100.0
      |             / (max(ts_s) - min(ts_s)), 6) AS rate
      |FROM c GROUP BY name, user_id, w_start
      |HAVING COUNT(*) >= 2 AND max(ts_s) > min(ts_s)""".stripMargin

  /** q_rate_extrapolated — PromQL rate() WITH boundary extrapolation:
    * the full algorithm from Prometheus's `extrapolatedRate`
    * (promql/functions.go), which qRate deliberately omits. Per series
    * per aligned 5m range [w_start, w_start+300):
    *
    *   increase   = Σ reset-corrected deltas (as qRate)
    *   sampled    = t_last − t_first
    *   avgDur     = sampled / (n−1)
    *   durStart   = t_first − range_start, capped (counters) at
    *                durationToZero = sampled · firstValue/increase —
    *                never extrapolate a counter below zero
    *   durEnd     = range_end − t_last
    *   each boundary contributes min(itself, …) if within 1.1·avgDur of
    *   a sample, else avgDur/2 (Prometheus's heuristic verbatim)
    *   rate       = increase · ((extrapolated/sampled) / 300)
    *
    * Engine parity: deltas/sums are exact integer cents; the
    * extrapolation factor is double math with IDENTICAL operands and
    * IDENTICAL association on both sides (the oracle SQL mirrors every
    * parenthesis), so the final rounded doubles agree bit-for-bit —
    * same argument as qRate's final division.
    */
  def qRateExtrapolated(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_s", "event_id")
    val grouped = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w_start"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .withColumn("corrected",
        when(col("delta") < 0, col("cents")).otherwise(col("delta")))
      .withColumn("rn", row_number().over(w))
      .groupBy("name", "user_id", "w_start")
      .agg(sum("corrected").as("inc_cents"),
        min("ts_s").as("t_first"), max("ts_s").as("t_last"),
        max(when(col("rn") === 1, col("cents"))).as("first_cents"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("t_last") > col("t_first"))
    val sampled = col("t_last") - col("t_first")
    val avgDur = sampled / (col("n") - 1).cast("double")
    val durStartRaw = col("t_first") - col("w_start").cast("double")
    val durEnd = (col("w_start") + 300L).cast("double") - col("t_last")
    val durZero = sampled *
      (col("first_cents").cast("double") / col("inc_cents").cast("double"))
    val durStart = when(col("inc_cents") > 0 && col("first_cents") >= 0,
      least(durStartRaw, durZero)).otherwise(durStartRaw)
    val thresh = avgDur * 1.1
    val extrap = sampled +
      when(durStart < thresh, durStart).otherwise(avgDur / 2d) +
      when(durEnd < thresh, durEnd).otherwise(avgDur / 2d)
    grouped.select(col("name"), col("user_id"), col("w_start"),
      round((col("inc_cents").cast("double") / 100d) *
        ((extrap / sampled) / 300d), 6).as("rate_ext"))
  }

  val rateExtrapolatedSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         epoch_us(ts)/1000000.0 AS ts_s,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *,
      |         cents - lag(cents) OVER w AS delta,
      |         row_number() OVER w AS rn
      |  FROM s
      |  WINDOW w AS (PARTITION BY name, user_id, w_start ORDER BY ts_s, event_id)),
      |g AS (
      |  SELECT name, user_id, w_start,
      |         CAST(SUM(CASE WHEN delta < 0 THEN cents ELSE delta END) AS BIGINT) AS inc_cents,
      |         min(ts_s) AS t_first, max(ts_s) AS t_last,
      |         max(CASE WHEN rn = 1 THEN cents END) AS first_cents,
      |         COUNT(*) AS n
      |  FROM d GROUP BY 1, 2, 3
      |  HAVING COUNT(*) >= 2 AND max(ts_s) > min(ts_s)),
      |x AS (
      |  SELECT *,
      |         t_last - t_first AS sampled,
      |         (t_last - t_first) / CAST(n - 1 AS DOUBLE) AS avg_dur,
      |         t_first - CAST(w_start AS DOUBLE) AS dur_start_raw,
      |         CAST(w_start + 300 AS DOUBLE) - t_last AS dur_end
      |  FROM g),
      |y AS (
      |  SELECT *,
      |         CASE WHEN inc_cents > 0 AND first_cents >= 0
      |              THEN least(dur_start_raw,
      |                         sampled * (CAST(first_cents AS DOUBLE) / CAST(inc_cents AS DOUBLE)))
      |              ELSE dur_start_raw END AS dur_start,
      |         avg_dur * 1.1 AS thresh
      |  FROM x)
      |SELECT name, user_id, w_start,
      |       round((CAST(inc_cents AS DOUBLE) / 100.0) *
      |             (((sampled
      |                + CASE WHEN dur_start < thresh THEN dur_start ELSE avg_dur / 2.0 END
      |                + CASE WHEN dur_end < thresh THEN dur_end ELSE avg_dur / 2.0 END)
      |               / sampled) / 300.0), 6) AS rate_ext
      |FROM y""".stripMargin

  /** q_resets — PromQL resets(): number of counter resets (negative
    * successive deltas) per series per 1h window, plus the points
    * inspected. Deltas are WINDOW-LOCAL (the lag partitions on the
    * window too), matching PromQL's range semantics where only samples
    * inside the range contribute — so `resets ≤ n_points − 1` holds by
    * construction (invariant-spec'd). Pure integer counting — exact in
    * any engine.
    */
  def qResets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_us", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("w_start",
        (floor(col("ts_us") / 1000000L / 3600L) * 3600L).cast("long"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .groupBy("name", "user_id", "w_start")
      .agg(sum(when(col("delta") < 0, 1L).otherwise(0L)).as("resets"),
        count(lit(1)).as("n_points"))
  }

  val resetsSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *, cents - lag(cents)
      |           OVER (PARTITION BY name, user_id, w_start
      |                 ORDER BY ts_us, event_id) AS delta
      |  FROM s)
      |SELECT name, user_id, w_start,
      |       CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS resets,
      |       COUNT(*) AS n_points
      |FROM d GROUP BY 1, 2, 3""".stripMargin

  /** q_irate — PromQL irate(): instantaneous rate from the LAST TWO
    * samples of each series in each 5m window, with the counter-reset
    * rule (last < prev → last is the increase). Only two points per
    * group survive the rank filter, so the aggregation state is O(1)
    * per series-window regardless of sample density — the property that
    * makes irate cheap at scale. Exact cents; final division on
    * identical doubles.
    */
  def qIrate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy(col("ts_s").desc, col("event_id").desc)
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w_start"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("name", "user_id", "w_start")
      .agg(max(when(col("rn") === 1, col("cents"))).as("last_c"),
        max(when(col("rn") === 2, col("cents"))).as("prev_c"),
        max(when(col("rn") === 1, col("ts_s"))).as("last_t"),
        max(when(col("rn") === 2, col("ts_s"))).as("prev_t"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2 && col("last_t") > col("prev_t"))
      .select(col("name"), col("user_id"), col("w_start"),
        round(
          when(col("last_c") < col("prev_c"), col("last_c"))
            .otherwise(col("last_c") - col("prev_c")).cast("double") / 100d
            / (col("last_t") - col("prev_t")), 6).as("irate"))
  }

  val irateSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         epoch_us(ts)/1000000.0 AS ts_s,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY event_type, user_id,
      |             CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT)
      |           ORDER BY epoch_us(ts)/1000000.0 DESC, event_id DESC) AS rn
      |  FROM events),
      |g AS (
      |  SELECT name, user_id, w_start,
      |         max(CASE WHEN rn = 1 THEN cents END) AS last_c,
      |         max(CASE WHEN rn = 2 THEN cents END) AS prev_c,
      |         max(CASE WHEN rn = 1 THEN ts_s END) AS last_t,
      |         max(CASE WHEN rn = 2 THEN ts_s END) AS prev_t,
      |         COUNT(*) AS n
      |  FROM s WHERE rn <= 2 GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start,
      |       round(CAST(CASE WHEN last_c < prev_c THEN last_c
      |                       ELSE last_c - prev_c END AS DOUBLE) / 100.0
      |             / (last_t - prev_t), 6) AS irate
      |FROM g WHERE n = 2 AND last_t > prev_t""".stripMargin

  /** q_delta — PromQL delta() core for gauges: last − first value per
    * series per 1h window, NO reset correction (gauges go down
    * legitimately). Boundary extrapolation deliberately omitted as in
    * [[qRate]] — [[qRateExtrapolated]] demonstrates the full algorithm
    * once; exact integer cents make the subtraction boundary-proof.
    */
  def qDelta(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    // ONE map-side-combinable aggregation, ZERO sorts: the first/last
    // sample per series-window is min_by/max_by(cents, ts_us) — this
    // replaces the former two opposite-direction row_number windows
    // (= two full corpus sort passes on the same partition key, the r5
    // bench's 5 s outlier). The ordering key is the LONG ts_us alone,
    // keeping every aggregation buffer primitive so the plan stays a
    // HashAggregate (a struct ordering key would demote it to
    // SortAggregate and reintroduce the sort). ts_us is a total order
    // within a series: a Prometheus TSDB series cannot carry two samples
    // at one timestamp, and the synthetic events agree (zero duplicate
    // (event_type, user_id, ts) triples at every SF — checked in DuckDB).
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(max_by(col("cents"), col("ts_us")).as("last_c"),
        min_by(col("cents"), col("ts_us")).as("first_c"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2) // delta needs at least two samples
      .select(col("name"), col("user_id"), col("w_start"),
        round((col("last_c") - col("first_c")).cast("double") / 100d, 2)
          .as("delta"))
  }

  val deltaSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT name, user_id, w_start,
      |       round(CAST(arg_max(cents, ts_us) - arg_min(cents, ts_us)
      |             AS DOUBLE) / 100.0, 2) AS delta
      |FROM s
      |GROUP BY 1, 2, 3
      |HAVING COUNT(*) >= 2""".stripMargin

  /** q_quantile_by_label — PromQL aggregation `quantile(φ, m) by (k)`:
    * exact interpolated p50/p90 of the metric value across all series
    * sharing a label value, per 1h window. Same `percentile` ≡
    * `quantile_cont` interpolation parity as q_percentiles; group
    * cardinality = labels × windows (bounded), so the exact aggregate's
    * per-group buffer is safe here — corpus-cardinality grouping would
    * switch to the approx_percentile path (q_percentiles_approx).
    */
  def qQuantileByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        get_json_object(col("props"), "$.k").as("k"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L).as("w_start"),
        col("value"))
      .groupBy("name", "k", "w_start")
      // ONE percentile aggregate for both φ (r14, guide §5): separate
      // percentile(…, φ) aggregates each buffer and sort the group's
      // full value multiset — the array form pays one buffer + one
      // sort, and the per-φ interpolation code path is identical
      .agg(
        expr("percentile(value, array(0.5D, 0.9D))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("name"), col("k"), col("w_start"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p90"),
        col("n"))

  val quantileByLabelSql: String =
    """SELECT event_type AS name,
      |       CAST(json_extract_string(props,'$.k') AS VARCHAR) AS k,
      |       CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |       round(quantile_cont(value, 0.5), 4) AS p50,
      |       round(quantile_cont(value, 0.9), 4) AS p90,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** q_quantile_over_time — PromQL `quantile_over_time(φ, v[1h])`:
    * exact interpolated quantiles WITHIN each series' window (across
    * time), the temporal complement of [[qQuantileByLabel]]'s
    * cross-series quantile. Same engine-parity argument: Spark
    * `percentile` and DuckDB `quantile_cont` share the rank = φ·(n−1)
    * linear-interpolation definition, so the doubles agree bit-for-bit.
    * Exact quantiles buffer the window's values — bounded by samples
    * per series-hour (scrape cadence), NOT corpus size, so unlike
    * q_percentiles this is safe at 100 TB without the sketch twin.
    */
  def qQuantileOverTime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L).as("w_start"),
        col("value"))
      .groupBy("name", "user_id", "w_start")
      // ONE array-percentile aggregate (r14): the three separate
      // percentile aggregates each buffered the window's values and
      // sorted them — 3× the aggregation memory and 3 sorts per group
      // for identical interpolation (group cardinality here is series
      // × hours, the corpus-shaped axis of the sf100 events probe)
      .agg(
        expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("name"), col("user_id"), col("w_start"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p90"),
        round(col("ps").getItem(2), 4).as("p99"),
        col("n"))

  val quantileOverTimeSql: String =
    """SELECT event_type AS name, user_id,
      |       CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |       round(quantile_cont(value, 0.5), 4) AS p50,
      |       round(quantile_cont(value, 0.9), 4) AS p90,
      |       round(quantile_cont(value, 0.99), 4) AS p99,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Watch-list bound for q_absent_over_time: a CONSTANT (the alerting
    * config is a fixed series list, never "the whole fleet"), so the
    * output is ≤ watchlist·windows at any corpus size — the same
    * constant-not-fraction rule as the similarity query sets. */
  private val AbsentWatchUsers = 50L

  /** q_absent_over_time — PromQL `absent_over_time(v[1h])` over a
    * watch-list: which (watched series, window) slots have NO samples —
    * the scrape-gap / dead-target alerting primitive. Plan shape is the
    * interesting part: both grid dimensions are BOUNDED aggregated
    * frames (watch-list series, distinct hours ≈ retention/3600), so
    * the cross-join is dims×dims — constant-size at any corpus size —
    * and the raw data participates only through two map-side-combined
    * distincts and a left-anti join on 16-byte keys. The corpus is
    * never cross-joined with anything.
    */
  def qAbsentOverTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id") < AbsentWatchUsers)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 3600L) * 3600L).as("w_start"))
    val series = ev.select("name", "user_id").distinct()
    val windows = ev.select("w_start").distinct()
    series.crossJoin(windows)
      .join(ev.distinct(), Seq("name", "user_id", "w_start"), "left_anti")
  }

  val absentOverTimeSql: String =
    s"""WITH ev AS (SELECT event_type AS name, user_id,
       |             CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start
       |            FROM events WHERE user_id < $AbsentWatchUsers),
       |s AS (SELECT DISTINCT name, user_id FROM ev),
       |w AS (SELECT DISTINCT w_start FROM ev),
       |o AS (SELECT DISTINCT name, user_id, w_start FROM ev)
       |SELECT s.name, s.user_id, w.w_start
       |FROM s CROSS JOIN w
       |WHERE NOT EXISTS (SELECT 1 FROM o
       |  WHERE o.name = s.name AND o.user_id = s.user_id
       |    AND o.w_start = w.w_start)""".stripMargin

  /** q_increase — PromQL increase() with counter-reset handling: per
    * series, sum of reset-corrected successive deltas within each 1h
    * window. A negative delta = counter restart from 0 → that step
    * contributes the NEW value (PromQL's exact rule).
    */
  def qIncrease(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id").orderBy("ts_s", "event_id")
    val winSize = 3600L
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .filter(col("delta").isNotNull)
      .withColumn("corrected",
        when(col("delta") < 0, col("cents")).otherwise(col("delta")))
      .withColumn("w_start", (floor(col("ts_s") / winSize) * winSize).cast("long"))
      .groupBy("name", "user_id", "w_start")
      // exact integer sum → /100 has exactly 2 decimals, no rounding
      // boundary exists
      .agg(round(sum("corrected").cast("double") / 100d, 2).as("increase"))
  }

  val increaseSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts)/1000000.0 AS ts_s,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         CAST(round(value*100) AS BIGINT)
      |           - lag(CAST(round(value*100) AS BIGINT))
      |             OVER (PARTITION BY event_type, user_id
      |                   ORDER BY epoch_us(ts)/1000000.0, event_id) AS delta
      |  FROM events)
      |SELECT name, user_id,
      |       CAST(floor(ts_s/3600)*3600 AS BIGINT) AS w_start,
      |       round(CAST(SUM(CASE WHEN delta < 0 THEN cents ELSE delta END) AS BIGINT) / 100.0, 2) AS increase
      |FROM s WHERE delta IS NOT NULL
      |GROUP BY name, user_id, CAST(floor(ts_s/3600)*3600 AS BIGINT)""".stripMargin

  /** q_sum_rate — the canonical RECORDING-RULE composite
    * `sum by (name) (rate(m[5m]))`, the single most-executed query
    * shape on any Prometheus deployment (every dashboard panel and
    * alert threshold is some variant). Two stacked aggregations, ONE
    * plan: per-series reset-corrected increases (the lag window on the
    * series key), then the cross-series sum per (name, window) — both
    * map-side combinable, and the second groupBy reuses nothing wider
    * than |names|·|windows| rows. EXACTNESS is why the composition sums
    * INCREASES (integer cents) and divides ONCE at the end: summing
    * per-series double rates would be summation-order-dependent and
    * could never hash-match (the identity sum(rate) = sum(increase)/Δ
    * holds exactly for the fixed-grid windows). rate ×1e6 as integer:
    * cents/100/300s·1e6 = inc_cents·1e6 div 30000 — cents·1e6 stays
    * far under 2^63 at any real window volume.
    */
  def qSumRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_us", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("w_start",
        (floor(col("ts_us") / 1000000L / 300L) * 300L).cast("long"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .filter(col("delta").isNotNull)
      .withColumn("corrected",
        when(col("delta") < 0, col("cents")).otherwise(col("delta")))
      .groupBy("name", "user_id", "w_start")
      .agg(sum("corrected").as("inc_cents"))
      .groupBy("name", "w_start")
      .agg(sum("inc_cents").as("sum_inc_cents"),
        count(lit(1)).as("n_series"))
      .select(col("name"), col("w_start"), col("n_series"),
        expr("CASE WHEN sum_inc_cents >= 0 " +
          "THEN sum_inc_cents * 1000000 div 30000 " +
          "ELSE -((-sum_inc_cents) * 1000000 div 30000) END")
          .as("rate_x1e6"))
  }

  val sumRateSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts) AS ts_us,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *, cents - lag(cents)
      |           OVER (PARTITION BY name, user_id, w_start
      |                 ORDER BY ts_us, event_id) AS delta
      |  FROM s),
      |per_series AS (
      |  SELECT name, user_id, w_start,
      |         CAST(SUM(CASE WHEN delta < 0 THEN cents ELSE delta END)
      |           AS BIGINT) AS inc_cents
      |  FROM d WHERE delta IS NOT NULL
      |  GROUP BY 1, 2, 3)
      |SELECT name, w_start, COUNT(*) AS n_series,
      |       CASE WHEN CAST(SUM(inc_cents) AS BIGINT) >= 0
      |            THEN CAST(SUM(inc_cents) AS BIGINT) * 1000000 // 30000
      |            ELSE -((-CAST(SUM(inc_cents) AS BIGINT)) * 1000000 // 30000)
      |            END AS rate_x1e6
      |FROM per_series GROUP BY 1, 2""".stripMargin

  /** q_over_time — avg/min/max/sum/count_over_time per series per 1h
    * window (PromQL *_over_time family) — one shuffle, map-side combine.
    */
  def qOverTime(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
      col("value"),
      round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      // min/max of raw 2-dec values are single elements — no sum, safe;
      // sum via exact cents; avg as exact ×10⁴ integer (its decimal
      // expansion is unbounded, so no rounded-double form is boundary-
      // safe — same treatment as q1/q_agg_by_label)
      .agg(
        expr("(sum(cents) * 100) div count(1)").as("avg_x10000"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"),
        round(sum("cents").cast("double") / 100d, 2).as("sum_v"),
        count(lit(1)).as("count_v"))
  }

  val overTimeSql: String =
    """SELECT event_type AS name, user_id,
      |       CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) * 100 // COUNT(*) AS avg_x10000,
      |       round(min(value), 4) AS min_v,
      |       round(max(value), 4) AS max_v,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_v,
      |       COUNT(*) AS count_v
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** q_last_over_time — PromQL `last_over_time(v[1h])` (and, by row
    * presence, `present_over_time`): the latest sample and its
    * timestamp per series-window — the argMax downsampling shape every
    * metrics→ClickHouse rollup runs (ClickHouse `argMax(value, ts)` /
    * the reference's ReplacingMergeTree latest-wins read path). ONE
    * map-side-combinable HashAggregate, ZERO sorts — `max_by` on the
    * long ts_us key exactly as [[qDelta]] (ts_us totally orders a
    * series; duplicate-free at every SF, checked in DuckDB). Output is
    * all-integer (cents + µs), |series×windows|-bounded.
    */
  def qLastOverTime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      expr("unix_micros(ts) div 3600000000 * 3600").as("w_start"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(max("ts_us").as("ts_last_us"),
        max_by(col("cents"), col("ts_us")).as("last_cents"),
        count(lit(1)).as("n_samples"))

  val lastOverTimeSql: String =
    """WITH p AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 3600000000 * 3600 AS w_start,
      |         epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT name, user_id, w_start,
      |       CAST(MAX(ts_us) AS BIGINT) AS ts_last_us,
      |       CAST(max_by(cents, ts_us) AS BIGINT) AS last_cents,
      |       COUNT(*) AS n_samples
      |FROM p GROUP BY 1, 2, 3""".stripMargin

  /** q_ts_of_extrema — PromQL's experimental `ts_of_max_over_time` /
    * `ts_of_min_over_time` / `ts_of_last_over_time` (Prometheus 3.x
    * promql/functions.go funcTsOfMaxOverTime: iterate in time order,
    * `v >= max` keeps the LATEST maximal sample — value ties resolve to
    * the latest timestamp, symmetrically for min): WHEN the extreme
    * happened rather than what it was — the alerting/debugging
    * companion to min/max_over_time (align a spike's timestamp across
    * series; "did all shards spike together?"). Shape: one window pass
    * marks each sample against its window max/min (exact integer
    * cents), then the aggregate takes the latest qualifying timestamp —
    * the groupBy lands on the window's own (name, user_id, w_start)
    * hash partitioning, so the corpus shuffles ONCE; all-integer µs
    * output, |series×windows|-bounded.
    */
  def qTsOfExtrema(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      expr("unix_micros(ts) div 3600000000 * 3600").as("w_start"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("mxc", max("cents").over(w))
      .withColumn("mnc", min("cents").over(w))
      .groupBy("name", "user_id", "w_start")
      .agg(
        max(when(col("cents") === col("mxc"), col("ts_us"))).as("ts_of_max_us"),
        max(when(col("cents") === col("mnc"), col("ts_us"))).as("ts_of_min_us"),
        max("ts_us").as("ts_of_last_us"))
  }

  val tsOfExtremaSql: String =
    """WITH p AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 3600000000 * 3600 AS w_start,
      |         epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (SELECT *,
      |        MAX(cents) OVER (PARTITION BY name, user_id, w_start) AS mxc,
      |        MIN(cents) OVER (PARTITION BY name, user_id, w_start) AS mnc
      |      FROM p)
      |SELECT name, user_id, w_start,
      |       CAST(MAX(CASE WHEN cents = mxc THEN ts_us END) AS BIGINT) AS ts_of_max_us,
      |       CAST(MAX(CASE WHEN cents = mnc THEN ts_us END) AS BIGINT) AS ts_of_min_us,
      |       CAST(MAX(ts_us) AS BIGINT) AS ts_of_last_us
      |FROM g GROUP BY 1, 2, 3""".stripMargin

  /** q_agg_by_label — PromQL aggregation operator `sum/avg/count by (k)`:
    * collapse the series dimension onto one label. One map-side-combinable
    * shuffle on (name, k) — the label cardinality, not the series count,
    * bounds the result at any scale.
    */
  def qAggByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        get_json_object(col("props"), "$.k").as("k"),
        // integer cents: double SUMs are summation-order-dependent and
        // Spark's partial aggregation order ≠ DuckDB's sequential order —
        // observed 1-ulp divergence at the round(.,4) boundary. Integer
        // sums are exact, and the final /100 division is bit-identical.
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "k")
      .agg(
        // sum_v: exact (≤2 decimal digits, no rounding boundary exists);
        // avg: a rational like 93459/2400 = 38.94125 sits EXACTLY on the
        // round(.,4) half-boundary where the engines disagree → emit the
        // average as an exact integer scaled ×10⁴ (truncating division,
        // identical in both engines) instead of a rounded double.
        round(sum("cents").cast("double") / 100d, 2).as("sum_v"),
        expr("(sum(cents) * 100) div count(1)").as("avg_x10000"),
        count(lit(1)).as("n"))

  val aggByLabelSql: String =
    """SELECT event_type AS name,
      |       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_v,
      |       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) * 100 // COUNT(*) AS avg_x10000,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q_predict_linear — PromQL `predict_linear(v[1h], 300)`: linear
    * extrapolation 5 min past each 1h window from the same exact-integer
    * least squares as [[qDeriv]] (Σx/Σy/Σxy/Σx² are exact; slope,
    * intercept and the prediction are double math with identical
    * operands and association in both engines). Windows need ≥2 points
    * and nonzero x-variance.
    */
  def qPredictLinear(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val base = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("x", ((col("ts_us") - (col("ts_us") % 1000L)) / 1000L)
        .cast("long") - col("w_start") * 1000L)
      .withColumn("y", round(col("value") * 100).cast("long"))
    val xp = (winSize + 300L) * 1000L // predict at window end + 5 min, ms
    val g = base.groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2 && col("n") * col("sxx") =!= col("sx") * col("sx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val intercept =
      (col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double")
    g.select(col("name"), col("user_id"), col("w_start"),
      round((intercept + slope * lit(xp.toDouble)) / 100d, 4).as("predicted"))
  }

  val predictLinearSql: String =
    """WITH p AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         epoch_us(ts) // 1000 - CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) * 1000 AS x,
      |         CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |s AS (
      |  SELECT name, user_id, w_start, COUNT(*) AS n,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM p GROUP BY 1, 2, 3
      |  HAVING COUNT(*) >= 2 AND COUNT(*)*CAST(SUM(x*x) AS BIGINT) <> CAST(SUM(x) AS BIGINT)*CAST(SUM(x) AS BIGINT)),
      |c AS (
      |  SELECT name, user_id, w_start,
      |         CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
      |         sx, sy, n
      |  FROM s)
      |SELECT name, user_id, w_start,
      |       round(((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
      |              + slope * 3900000.0) / 100.0, 4) AS predicted
      |FROM c""".stripMargin

  /** q_count_values — PromQL `count_values("v", m)`: sample count per
    * distinct value per metric per 1h window (integer cents key — the
    * value IS the group key, so exactness is structural). One map-side-
    * combinable shuffle; output bounded by value cardinality.
    */
  def qCountValues(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .groupBy("name", "w_start", "value_cents")
      .agg(count(lit(1)).as("n"))
  }

  val countValuesSql: String =
    """SELECT event_type AS name,
      |       CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |       CAST(round(value*100) AS BIGINT) AS value_cents,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** q_bottomk — PromQL `bottomk(3, sum by (name, user))` per 1h window:
    * the topk mirror with ascending rank, exact integer-cents sums,
    * riding the same bounded-heap TopKPerKey operator.
    */
  def qBottomk(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val agg = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(round(sum("cents").cast("double") / 100d, 2).as("series_sum"))
    graft.plans.TopKPerKey.topK(agg,
      keyNames = Seq("name", "w_start"),
      orderSpec = Seq(("series_sum", true), ("user_id", true)),
      k = 3, rankName = "rk")
  }

  val bottomkSql: String =
    """WITH a AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS series_sum
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start, series_sum,
      |       row_number() OVER (PARTITION BY name, w_start
      |         ORDER BY series_sum ASC, user_id) AS rk
      |FROM a QUALIFY rk <= 3""".stripMargin

  /** q_changes — PromQL `changes()`: number of times the series VALUE
    * changed (successive delta ≠ 0) per series per 1h window —
    * window-local deltas like [[qResets]], pure integer counting.
    */
  def qChanges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_us", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("w_start",
        (floor(col("ts_us") / 1000000L / 3600L) * 3600L).cast("long"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .groupBy("name", "user_id", "w_start")
      .agg(sum(when(col("delta") =!= 0L, 1L).otherwise(0L)).as("changes"),
        count(lit(1)).as("n_points"))
  }

  val changesSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *, cents - lag(cents)
      |           OVER (PARTITION BY name, user_id, w_start
      |                 ORDER BY ts_us, event_id) AS delta
      |  FROM s)
      |SELECT name, user_id, w_start,
      |       CAST(SUM(CASE WHEN delta <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS changes,
      |       COUNT(*) AS n_points
      |FROM d GROUP BY 1, 2, 3""".stripMargin

  /** q_mad_over_time — PromQL `mad_over_time` (median absolute
    * deviation): per series per 1h window, `median(|x − median(x)|)`.
    * Two exact-interpolation `percentile` passes with the per-group
    * median joined back onto the samples (aggregate-then-broadcast —
    * the medians frame is one row per series-window, tiny next to the
    * samples). Doubles appear only in the interpolation/abs, with
    * identical operands both sides (q_percentiles parity rule).
    */
  def qMadOverTime(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val base = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
      col("value"))
    val med = base.groupBy("name", "user_id", "w_start")
      .agg(expr("percentile(value, 0.5)").as("med"))
      .withColumnRenamed("name", "mn")
      .withColumnRenamed("user_id", "mu")
      .withColumnRenamed("w_start", "mw")
    base.join(med, col("name") === col("mn") && col("user_id") === col("mu")
        && col("w_start") === col("mw"))
      .groupBy("name", "user_id", "w_start")
      .agg(
        round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"),
        round(max("med"), 4).as("median_v"),
        count(lit(1)).as("n"))
  }

  val madOverTimeSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         value
      |  FROM events),
      |m AS (
      |  SELECT name, user_id, w_start, quantile_cont(value, 0.5) AS med
      |  FROM b GROUP BY 1, 2, 3)
      |SELECT b.name, b.user_id, b.w_start,
      |       round(quantile_cont(abs(b.value - m.med), 0.5), 4) AS mad,
      |       round(max(m.med), 4) AS median_v,
      |       COUNT(*) AS n
      |FROM b JOIN m ON b.name = m.name AND b.user_id = m.user_id
      |              AND b.w_start = m.w_start
      |GROUP BY 1, 2, 3""".stripMargin

  /** q_stdvar_over_time — PromQL `stdvar_over_time` / `stddev_over_time`
    * per series per 1h window. Naive variance is float-order-dependent
    * (Welford or Σ(x−μ)² both accumulate doubles) and can never be
    * hash-compared across engines; here the closed form runs on EXACT
    * integers — n, Σx, Σx² in cents — so `n·Σx² − (Σx)²` is exact in
    * both engines and only the final division/sqrt touch doubles, with
    * identical operands. Population variance, like PromQL.
    */
  def qStdvarOverTime(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("name"), col("user_id"), col("w_start"), col("n"),
        round((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n") * col("n")).cast("double") / 10000d, 6).as("stdvar_v"),
        round(sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n") * col("n")).cast("double")) / 100d, 6).as("stddev_v"))
  }

  val stdvarOverTimeSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS c
      |  FROM events),
      |g AS (
      |  SELECT name, user_id, w_start, COUNT(*) AS n,
      |         CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c*c) AS BIGINT) AS s2
      |  FROM s GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start, n,
      |       round(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE) / 10000.0, 6) AS stdvar_v,
      |       round(sqrt(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE)) / 100.0, 6) AS stddev_v
      |FROM g""".stripMargin

  /** q_offset_compare — PromQL `offset` arithmetic (`sum(m) - sum(m
    * offset 1d)`): each series-window's sum against the SAME series 24h
    * earlier. The offset is a shifted-key EQUALITY self-join over the
    * already-aggregated frame (aggregate first — the join touches
    * window counts, not raw samples; Catalyst computes the aggregation
    * once and reuses the exchange for both sides). Inner-join semantics:
    * windows lacking a 24h-earlier twin drop, like PromQL vector
    * matching.
    */
  def qOffsetCompare(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val agg = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(sum("cents").as("cents"))
    val prev = agg.select(col("name").as("pn"), col("user_id").as("pu"),
      (col("w_start") + 86400L).as("pw"), col("cents").as("prev_cents"))
    agg.join(prev, col("name") === col("pn") && col("user_id") === col("pu")
        && col("w_start") === col("pw"))
      .select(col("name"), col("user_id"), col("w_start"),
        round(col("cents").cast("double") / 100d, 2).as("curr_v"),
        round(col("prev_cents").cast("double") / 100d, 2).as("prev_v"),
        round((col("cents") - col("prev_cents")).cast("double") / 100d, 2)
          .as("delta_v"))
  }

  val offsetCompareSql: String =
    """WITH a AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT c.name, c.user_id, c.w_start,
      |       round(CAST(c.cents AS DOUBLE) / 100.0, 2) AS curr_v,
      |       round(CAST(p.cents AS DOUBLE) / 100.0, 2) AS prev_v,
      |       round(CAST(c.cents - p.cents AS DOUBLE) / 100.0, 2) AS delta_v
      |FROM a c JOIN a p
      |  ON c.name = p.name AND c.user_id = p.user_id
      | AND c.w_start = p.w_start + 86400""".stripMargin

  /** q_promql_topk — PromQL `topk(3, sum by (name, user))` per 1h window:
    * top series per metric per window. Aggregation first (map-side
    * combine), then a window rank over the ALREADY-aggregated frame —
    * rank state is per (name, window), bounded by series count.
    */
  def qPromqlTopk(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val agg = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        // exact integer cents (round-3 hardening: this was the last
        // double SUM in a hash-compared output — order-dependent in
        // principle even though it never bit the test SFs)
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w_start")
      .agg(round(sum("cents").cast("double") / 100d, 2).as("series_sum"))
    // rank on the custom bounded-heap TopKPerKey operator (no per-group
    // sort; see graft.plans.TopKPerKey) — result-identical to
    // row_number().over(...) <= 3, proven in TopKPerKeySpec
    graft.plans.TopKPerKey.topK(agg,
      keyNames = Seq("name", "w_start"),
      orderSpec = Seq(("series_sum", false), ("user_id", true)),
      k = 3, rankName = "rk")
  }

  val promqlTopkSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS series_sum
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start, series_sum,
      |       row_number() OVER (PARTITION BY name, w_start
      |         ORDER BY series_sum DESC, user_id) AS rk
      |FROM s QUALIFY rk <= 3""".stripMargin

  /** q_histogram_quantile — PromQL `histogram_quantile(0.9, ...)` over
    * synthesized le-buckets {1,2,5,10,+Inf} per (name, 1h window):
    * cumulative-bucket linear interpolation, exactly PromQL's rule —
    * find the first bucket whose cumulative count reaches rank
    * q·total, interpolate within it; the +Inf bucket returns the highest
    * finite bound. Bucketing + count is one shuffle; the quantile pick is
    * a window pass over ≤5 rows per group.
    */
  def qHistogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val le = when(col("value") <= 1, 1d).when(col("value") <= 2, 2d)
      .when(col("value") <= 5, 5d).when(col("value") <= 10, 10d)
      .otherwise(Double.PositiveInfinity)
    val buckets = Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        le.as("le"))
      .groupBy("name", "w_start", "le").agg(count(lit(1)).as("cnt"))
    val byLe = Window.partitionBy("name", "w_start").orderBy("le")
    val cum = buckets
      .withColumn("cum", sum("cnt").over(byLe.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum("cnt").over(Window.partitionBy("name", "w_start")))
      .withColumn("lower", coalesce(lag("le", 1).over(byLe), lit(0d)))
      .withColumn("rank", col("total") * 0.9)
    cum
      .filter(col("cum") >= col("rank") && (col("cum") - col("cnt")) < col("rank"))
      .select(col("name"), col("w_start"),
        round(when(col("le") === Double.PositiveInfinity, col("lower"))
          .otherwise(col("lower") + (col("le") - col("lower"))
            * (col("rank") - (col("cum") - col("cnt"))) / col("cnt")), 6)
          .as("q90"))
  }

  val histogramQuantileSql: String =
    """WITH b AS (
      |  SELECT event_type AS name,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CASE WHEN value <= 1 THEN 1.0 WHEN value <= 2 THEN 2.0
      |              WHEN value <= 5 THEN 5.0 WHEN value <= 10 THEN 10.0
      |              ELSE CAST('infinity' AS DOUBLE) END AS le
      |  FROM events),
      |c AS (SELECT name, w_start, le, COUNT(*) AS cnt
      |      FROM b GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT *,
      |    CAST(SUM(cnt) OVER (PARTITION BY name, w_start ORDER BY le
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY name, w_start) AS BIGINT) AS total,
      |    coalesce(lag(le) OVER (PARTITION BY name, w_start ORDER BY le), 0.0) AS lower
      |  FROM c)
      |SELECT name, w_start,
      |       round(CASE WHEN isinf(le) THEN lower
      |                  ELSE lower + (le - lower)
      |                       * (total * 0.9 - (cum - cnt)) / cnt END, 6) AS q90
      |FROM m
      |WHERE cum >= total * 0.9 AND (cum - cnt) < total * 0.9""".stripMargin

  /** q_label_values — the Prometheus `/api/v1/label/<k>/values` API
    * surface (every metadata dropdown in Grafana hits it): all
    * (label key, value) pairs present in the corpus with their sample
    * count and the number of distinct metric names carrying them. One
    * arrays_zip explode of the ALREADY-SORTED label arrays (the R1
    * invariant), then one map-side-combinable groupBy on the pair —
    * output bounded by real label cardinality, never corpus size; at
    * 100 TB this is the query whose result a deployment caches for its
    * UI, and it costs one scan + one bounded aggregation.
    */
  def qLabelValues(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir)
      .select(col("name"),
        explode(arrays_zip(col("label_keys"), col("label_values")))
          .as("kv"))
      .select(col("name"), col("kv.label_keys").as("k"),
        col("kv.label_values").as("v"))
      .groupBy("k", "v")
      .agg(count(lit(1)).as("n_samples"),
        countDistinct("name").as("n_names"))

  val labelValuesSql: String =
    s"""WITH m AS (SELECT event_type AS name,
       |            $keysSql AS ks, $valuesSql AS vs
       |           FROM events),
       |kv AS (SELECT name, unnest(ks) AS k, unnest(vs) AS v FROM m)
       |SELECT k, v, COUNT(*) AS n_samples,
       |       CAST(COUNT(DISTINCT name) AS BIGINT) AS n_names
       |FROM kv GROUP BY 1, 2""".stripMargin

  /** q_histogram_avg — the bucket-midpoint MEAN estimator over the same
    * classic le-histogram as [[qHistogramQuantile]] (the
    * `histogram_sum/histogram_count` companion, for deployments whose
    * exporters publish only buckets): per (name, window),
    * avg ≈ Σ midpoint(bucket)·count / total, the +Inf bucket collapsed
    * to its lower bound (the same highest-finite convention
    * histogram_quantile uses). EXACT integers: the finite bounds are
    * small integers, so midpoint×2 = lower+le stays integral — the
    * output is the ×100-scaled integer mean with ONE division
    * (Σ(lower+le)·cnt·100) div (2·total). Same single-shuffle
    * aggregation as the quantile (bounded by names×windows×5 buckets);
    * n_obs carried for the count half of the estimator pair.
    */
  def qHistogramAvg(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val le = when(col("value") <= 1, 1L).when(col("value") <= 2, 2L)
      .when(col("value") <= 5, 5L).when(col("value") <= 10, 10L)
      .otherwise(-1L) // -1 encodes +Inf: bucket collapses to its lower
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize)
          .as("w_start"),
        le.as("le"))
      .groupBy("name", "w_start", "le").agg(count(lit(1)).as("cnt"))
      .withColumn("lower",
        coalesce(lag("le", 1).over(
          Window.partitionBy("name", "w_start")
            .orderBy(when(col("le") === -1L, Long.MaxValue)
              .otherwise(col("le")))), lit(0L)))
      .withColumn("mid2", when(col("le") === -1L, col("lower") * 2L)
        .otherwise(col("lower") + col("le")))
      .groupBy("name", "w_start")
      .agg(sum(col("mid2") * col("cnt")).as("sum_mid2"),
        sum("cnt").as("n_obs"))
      .select(col("name"), col("w_start"), col("n_obs"),
        expr("(sum_mid2 * 100) div (2 * n_obs)").as("avg_x100"))
  }

  val histogramAvgSql: String =
    """WITH b AS (
      |  SELECT event_type AS name,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CASE WHEN value <= 1 THEN 1 WHEN value <= 2 THEN 2
      |              WHEN value <= 5 THEN 5 WHEN value <= 10 THEN 10
      |              ELSE -1 END AS le
      |  FROM events),
      |c AS (SELECT name, w_start, le, COUNT(*) AS cnt
      |      FROM b GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT *, coalesce(lag(le) OVER (PARTITION BY name, w_start
      |    ORDER BY CASE WHEN le = -1 THEN 9223372036854775807
      |                  ELSE le END), 0) AS lower
      |  FROM c),
      |x AS (SELECT name, w_start,
      |             CASE WHEN le = -1 THEN lower * 2 ELSE lower + le END
      |               AS mid2, cnt
      |      FROM m)
      |SELECT name, w_start, CAST(SUM(cnt) AS BIGINT) AS n_obs,
      |       (CAST(SUM(mid2 * cnt) AS BIGINT) * 100)
      |         // (2 * CAST(SUM(cnt) AS BIGINT)) AS avg_x100
      |FROM x GROUP BY 1, 2""".stripMargin

  /** q_histogram_stddev — the SPREAD companion to [[qHistogramAvg]]
    * (Prometheus ships `histogram_stddev`/`histogram_stdvar` for native
    * histograms; this is the same estimator on classic le-buckets):
    * every observation in a bucket is assumed at the bucket MIDPOINT,
    * variance is computed across those midpoints. Re-expressed exactly
    * like the avg estimator — midpoint×2 = lower+le keeps everything
    * integral (+Inf collapses to its lower bound), so n, Σm and Σm² are
    * exact integers in both engines and the population variance uses
    * the closed form (n·Σm²−(Σm)²)/n². `stdvar_x100` is an exact
    * truncating-division integer; `stddev_x1000` follows q_math_funcs'
    * libm rule — single exactly-rounded division + IEEE sqrt on
    * identical integer operands, ×1000 rounding. Same plan shape as
    * the avg: one (name,window,le) shuffle, a bucket-count-bounded
    * window for the lower bounds, one (name,window)-bounded aggregate.
    */
  def qHistogramStddev(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val le = when(col("value") <= 1, 1L).when(col("value") <= 2, 2L)
      .when(col("value") <= 5, 5L).when(col("value") <= 10, 10L)
      .otherwise(-1L)
    val agg = Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize)
          .as("w_start"),
        le.as("le"))
      .groupBy("name", "w_start", "le").agg(count(lit(1)).as("cnt"))
      .withColumn("lower",
        coalesce(lag("le", 1).over(
          Window.partitionBy("name", "w_start")
            .orderBy(when(col("le") === -1L, Long.MaxValue)
              .otherwise(col("le")))), lit(0L)))
      .withColumn("mid2", when(col("le") === -1L, col("lower") * 2L)
        .otherwise(col("lower") + col("le")))
      .groupBy("name", "w_start")
      .agg(sum(col("mid2") * col("cnt")).as("s1"),
        sum(col("mid2") * col("mid2") * col("cnt")).as("s2"),
        sum("cnt").as("n_obs"))
    val num = col("n_obs") * col("s2") - col("s1") * col("s1")
    val den = lit(4L) * col("n_obs") * col("n_obs")
    agg.select(col("name"), col("w_start"), col("n_obs"),
      expr("((n_obs * s2 - s1 * s1) * 100) div (4 * n_obs * n_obs)")
        .as("stdvar_x100"),
      round(sqrt(num.cast("double") / den.cast("double")) * 1000d)
        .cast("long").as("stddev_x1000"))
  }

  val histogramStddevSql: String =
    """WITH b AS (
      |  SELECT event_type AS name,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         CASE WHEN value <= 1 THEN 1 WHEN value <= 2 THEN 2
      |              WHEN value <= 5 THEN 5 WHEN value <= 10 THEN 10
      |              ELSE -1 END AS le
      |  FROM events),
      |c AS (SELECT name, w_start, le, COUNT(*) AS cnt
      |      FROM b GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT *, coalesce(lag(le) OVER (PARTITION BY name, w_start
      |    ORDER BY CASE WHEN le = -1 THEN 9223372036854775807
      |                  ELSE le END), 0) AS lower
      |  FROM c),
      |x AS (SELECT name, w_start,
      |             CASE WHEN le = -1 THEN lower * 2 ELSE lower + le END
      |               AS mid2, cnt
      |      FROM m),
      |s AS (SELECT name, w_start,
      |             CAST(SUM(mid2 * cnt) AS BIGINT) AS s1,
      |             CAST(SUM(mid2 * mid2 * cnt) AS BIGINT) AS s2,
      |             CAST(SUM(cnt) AS BIGINT) AS n_obs
      |      FROM x GROUP BY 1, 2)
      |SELECT name, w_start, n_obs,
      |       ((n_obs * s2 - s1 * s1) * 100) // (4 * n_obs * n_obs)
      |         AS stdvar_x100,
      |       CAST(round(sqrt(CAST(n_obs * s2 - s1 * s1 AS DOUBLE)
      |           / CAST(4 * n_obs * n_obs AS DOUBLE)) * 1000) AS BIGINT)
      |         AS stddev_x1000
      |FROM s""".stripMargin

  /** q_deriv — PromQL `deriv()`: per-series per-1h-window least-squares
    * slope. NOT regr_slope: its incremental float accumulation is
    * summation-order-dependent and breaks cross-engine hashing. Instead
    * the classic closed form over INTEGER sums — x = ms offset into the
    * window, y = integer cents — so Σx, Σy, Σxy, Σx² are exact in both
    * engines and the single double division at the end is bit-identical.
    * Units: cents per millisecond; windows need ≥2 points and nonzero
    * x-variance, like PromQL.
    */
  def qDeriv(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val base = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      // cast back to long: Spark's `/` returns double, and double sums
      // would break the exact-integer invariant past 2^53 at scale
      .withColumn("x", ((col("ts_us") - (col("ts_us") % 1000L)) / 1000L)
        .cast("long") - col("w_start") * 1000L)
      .withColumn("y", round(col("value") * 100).cast("long"))
    base.groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2 && col("n") * col("sxx") =!= col("sx") * col("sx"))
      .select(col("name"), col("user_id"), col("w_start"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"))
  }

  val derivSql: String =
    """WITH p AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         epoch_us(ts) // 1000 - CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) * 1000 AS x,
      |         CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |s AS (
      |  SELECT name, user_id, w_start, COUNT(*) AS n,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM p GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start,
      |       round(CAST(n*sxy - sx*sy AS DOUBLE)
      |             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope
      |FROM s WHERE n >= 2 AND n*sxx <> sx*sx""".stripMargin

  /** q_label_join — PromQL `label_join`/`label_replace` family: derive a
    * new label from existing ones and re-emit the SORTED label arrays
    * (the sort invariant R1 must survive label surgery). Pure projection,
    * no shuffle.
    */
  def qLabelJoin(spark: SparkSession, dir: String): DataFrame = {
    // reserved keys filtered out of props first: map_concat throws on
    // duplicates, and the derived labels must win over same-named ones.
    // coalesce on the joined-from label: Spark's concat_ws SKIPS nulls
    // where DuckDB's || propagates them — make absence explicit ('')
    // identically in both engines.
    val m = map_concat(
      map_filter(from_json(col("props"), MapType(StringType, StringType)),
        (k, _) => k =!= "user" && k =!= "uk"),
      map(lit("user"), col("user_id").cast("string")))
    val m2 = map_concat(m, map(lit("uk"),
      concat(col("user_id").cast("string"), lit("-"),
        coalesce(get_json_object(col("props"), "$.k"), lit("")))))
    Tables.events(spark, dir)
      .withColumn("m2", m2)
      .select(
        unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"),
        array_join(array_sort(map_keys(col("m2"))), ",").as("label_keys_str"),
        array_join(transform(array_sort(map_keys(col("m2"))),
          k => element_at(col("m2"), k)), ",").as("label_values_str"))
  }

  val labelJoinSql: String = {
    val keys2 =
      "list_sort(list_append(list_append(" +
        "list_filter(json_keys(props), k -> k <> 'user' AND k <> 'uk'), " +
        "'user'), 'uk'))"
    val values2 =
      s"""list_transform($keys2, k -> CASE
         |  WHEN k = 'user' THEN CAST(user_id AS VARCHAR)
         |  WHEN k = 'uk' THEN CAST(user_id AS VARCHAR) || '-' || coalesce(CAST(json_extract_string(props, '$$.k') AS VARCHAR), '')
         |  ELSE json_extract_string(props, '$$.' || k) END)""".stripMargin
    s"""SELECT epoch_us(ts) AS ts_us, event_type AS name,
       |       array_to_string($keys2, ',') AS label_keys_str,
       |       array_to_string($values2, ',') AS label_values_str
       |FROM events""".stripMargin
  }

  /** q_daily_partition — R10: the reference's metrics table partitions by
    * toYYYYMMDD(timestamp); compute partition id + per-partition stats
    * (what a 100 TB lake's partition manifest looks like).
    */
  def qDailyPartition(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyyMMdd").cast("int").as("partition_id"))
      .agg(count(lit(1)).as("rows"),
        round(sum(round(col("value") * 100).cast("long"))
          .cast("double") / 100d, 2).as("sum_value"),
        countDistinct("event_type").as("n_series_names"))

  val dailyPartitionSql: String =
    """SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS partition_id,
      |       COUNT(*) AS rows,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value,
      |       COUNT(DISTINCT event_type) AS n_series_names
      |FROM events GROUP BY 1""".stripMargin

  /** Anchored pattern for q_label_replace — PromQL label_replace
    * semantics require the regex to match the WHOLE source label
    * (promql/functions.go funcLabelReplace: `^(?:" + regex + ")$`). */
  private val labelReplacePat = "^(pu|si)(.+)$"

  /** q_label_replace — PromQL `label_replace(v, dst, repl, src, regex)`:
    * derive a new label from an existing one via regex captures; series
    * whose source label does NOT match keep their existing dst value
    * (here: absent → ''), they are never dropped. Rendered as the
    * series-level mapping plus point counts — one codegen'd projection
    * and a bounded groupBy (output cardinality = #distinct names).
    * Both engines' regex dialects agree on this pattern subset; the
    * match test and the captures use the SAME anchored pattern, matching
    * Prometheus's whole-string anchoring.
    */
  def qLabelReplace(spark: SparkSession, dir: String): DataFrame = {
    val fam = when(col("event_type").rlike(labelReplacePat),
      concat(lit("grp_"),
        regexp_extract(col("event_type"), labelReplacePat, 1), lit("_"),
        regexp_extract(col("event_type"), labelReplacePat, 2)))
      .otherwise(lit(""))
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), fam.as("family"))
      .groupBy("name", "family").agg(count(lit(1)).as("n_points"))
  }

  val labelReplaceSql: String =
    s"""SELECT event_type AS name,
       |       CASE WHEN regexp_matches(event_type, '$labelReplacePat')
       |            THEN 'grp_' || regexp_extract(event_type, '$labelReplacePat', 1)
       |                 || '_' || regexp_extract(event_type, '$labelReplacePat', 2)
       |            ELSE '' END AS family,
       |       COUNT(*) AS n_points
       |FROM events GROUP BY 1, 2""".stripMargin

  /** q_clamp — the PromQL scalar-math family applied per point:
    * clamp(v,min,max) / clamp_min / clamp_max / abs / sgn, in integer
    * cents so every output is exact. sgn is spelled as a CASE (Spark's
    * `signum` returns DOUBLE, DuckDB's `sign` engine-typed — the CASE
    * is identical integer logic in both). Pure projection: scan-speed
    * at any corpus size, no shuffle at all.
    */
  def qClamp(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("event_id"), col("cents"),
        greatest(least(col("cents"), lit(8000L)), lit(2000L)).as("clamped"),
        greatest(col("cents"), lit(2000L)).as("clamp_min"),
        least(col("cents"), lit(8000L)).as("clamp_max"),
        abs(col("cents")).as("abs_cents"),
        when(col("cents") > 0, 1).when(col("cents") < 0, -1)
          .otherwise(0).cast("int").as("sgn"))

  val clampSql: String =
    """WITH c AS (SELECT event_id,
      |            CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      |SELECT event_id, cents,
      |       greatest(least(cents, 8000), 2000) AS clamped,
      |       greatest(cents, 2000) AS clamp_min,
      |       least(cents, 8000) AS clamp_max,
      |       abs(cents) AS abs_cents,
      |       CAST(CASE WHEN cents > 0 THEN 1 WHEN cents < 0 THEN -1
      |                 ELSE 0 END AS INT) AS sgn
      |FROM c""".stripMargin

  /** q_vector_match — PromQL binary operation between two instant vectors
    * with explicit vector matching, `sum by (user) (error) / on(user)
    * sum by (user) (view)` per 1h window. Both sides aggregate FIRST
    * (map-side combinable sum on (user, window)), then the one-to-one
    * match is an equi-join on the SAME key both shuffles already landed
    * on — no extra exchange for the join. Unmatched entries drop, as in
    * PromQL. The ratio is an exact parts-per-million integer (nonneg
    * truncating division — the division-parity rule).
    */
  def qVectorMatch(spark: SparkSession, dir: String): DataFrame = {
    def side(metric: String, out: String): DataFrame =
      Tables.events(spark, dir)
        .filter(col("event_type") === metric)
        .select(col("user_id").cast("string").as("user"),
          expr("unix_micros(ts) div 3600000000").as("wnd"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("user", "wnd")
        .agg(sum("cents").as(out))
    side("error", "err_cents")
      .join(side("view", "view_cents"), Seq("user", "wnd"))
      .select(col("user"), (col("wnd") * 3600000000L).as("w_start_us"),
        round(col("err_cents").cast("double") / 100d, 2).as("err_sum"),
        round(col("view_cents").cast("double") / 100d, 2).as("view_sum"),
        expr("err_cents * 1000000 div view_cents").as("ratio_ppm"))
  }

  val vectorMatchSql: String =
    """WITH e AS (
      |  SELECT CAST(user_id AS VARCHAR) AS "user",
      |         epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS err_cents
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      |v AS (
      |  SELECT CAST(user_id AS VARCHAR) AS "user",
      |         epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS view_cents
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT e."user", e.wnd * 3600000000 AS w_start_us,
      |       round(CAST(err_cents AS DOUBLE) / 100, 2) AS err_sum,
      |       round(CAST(view_cents AS DOUBLE) / 100, 2) AS view_sum,
      |       err_cents * 1000000 // view_cents AS ratio_ppm
      |FROM e JOIN v ON e."user" = v."user" AND e.wnd = v.wnd""".stripMargin

  /** q_compare_bool — PromQL comparison operators in BOTH semantics:
    * filter form (`v > 100` keeps the sample, others drop) and `bool`
    * form (`v > bool 100` → 0/1 per point). Per series (name) per 1h
    * window: points total, points above (bool sum), the kept-sample sum
    * (filter form), and the above-fraction in exact ppm. One scan, one
    * bounded-key shuffle; the comparisons are integer-cents exact.
    */
  def qCompareBool(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        expr("unix_micros(ts) div 3600000000 * 3600000000").as("w_start_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("above", when(col("cents") > 10000L, 1L).otherwise(0L))
      .groupBy("name", "w_start_us")
      .agg(count(lit(1)).as("n_points"),
        sum(col("above")).as("n_above"),
        round(sum(when(col("above") === 1L, col("cents")).otherwise(0L))
          .cast("double") / 100d, 2).as("kept_sum"),
        expr("sum(above) * 1000000 div count(1)").as("above_ppm"))

  val compareBoolSql: String =
    """WITH p AS (
      |  SELECT event_type AS name,
      |         epoch_us(ts) // 3600000000 * 3600000000 AS w_start_us,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         CASE WHEN CAST(round(value*100) AS BIGINT) > 10000
      |              THEN 1 ELSE 0 END AS above
      |  FROM events)
      |SELECT name, w_start_us, COUNT(*) AS n_points,
      |       CAST(SUM(above) AS BIGINT) AS n_above,
      |       round(CAST(SUM(CASE WHEN above = 1 THEN cents ELSE 0 END) AS DOUBLE) / 100, 2)
      |         AS kept_sum,
      |       CAST(SUM(above) AS BIGINT) * 1000000 // COUNT(*) AS above_ppm
      |FROM p GROUP BY 1, 2""".stripMargin

  /** q_agg_without — PromQL `sum without(k) (m)`: aggregation over the
    * label-set COMPLEMENT. The dropped label is removed from the sorted
    * key/value arrays by paired surgery (filter keys, re-derive values
    * from the surviving keys — the R1 sorted invariant is preserved by
    * construction), then the group key is (name, surviving labels).
    * Unlike `by(user)`, this keeps EVERY remaining label dimension —
    * the grouping key is the dynamic array itself, stringified for the
    * driver compare. One shuffle on the (bounded-cardinality) label sig.
    */
  def qAggWithout(spark: SparkSession, dir: String): DataFrame = {
    // ride the materialized [[metrics]] frame instead of re-parsing the
    // props JSON: dropping label "k" = filtering the parallel sorted
    // key/value arrays at the positions where the key is "k"
    val kvWo = filter(arrays_zip(col("label_keys"), col("label_values")),
      s => s.getField("label_keys") =!= "k")
    metrics(spark, dir)
      .select(col("name"),
        array_join(transform(kvWo, s => s.getField("label_keys")), ",")
          .as("label_keys_str"),
        array_join(transform(kvWo, s => s.getField("label_values")), ",")
          .as("label_values_str"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "label_keys_str", "label_values_str")
      .agg(round(sum("cents").cast("double") / 100d, 2).as("sum_v"),
        count(lit(1)).as("n"))
  }

  val aggWithoutSql: String = {
    val keysWo = s"list_filter($keysSql, k -> k <> 'k')"
    val valsWo =
      s"""list_transform($keysWo, k -> CASE WHEN k = 'user'
         |  THEN CAST(user_id AS VARCHAR)
         |  ELSE json_extract_string(props, '$$.' || k) END)""".stripMargin
    s"""SELECT event_type AS name,
       |       array_to_string($keysWo, ',') AS label_keys_str,
       |       array_to_string($valsWo, ',') AS label_values_str,
       |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_v,
       |       COUNT(*) AS n
       |FROM events GROUP BY 1, 2, 3""".stripMargin
  }

  /** q_time_group — the PromQL time-function family (`hour()`,
    * `day_of_week()`) as grouping dimensions: per metric per hour-of-day
    * per day-of-week (0=Sunday, Prometheus convention) sample counts and
    * exact sums. Pure projection into a bounded 5×24×7 group space —
    * map-side combine does nearly all the work at any corpus size.
    */
  def qTimeGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        hour(col("ts")).cast("long").as("hour_of_day"),
        (dayofweek(col("ts")) - 1).cast("long").as("day_of_week"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "hour_of_day", "day_of_week")
      .agg(count(lit(1)).as("n"),
        round(sum("cents").cast("double") / 100d, 2).as("sum_v"))

  val timeGroupSql: String =
    """SELECT event_type AS name,
      |       CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
      |       CAST(date_part('dow', ts) AS BIGINT) AS day_of_week,
      |       COUNT(*) AS n,
      |       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_v
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** q_holt_winters — PromQL `double_exponential_smoothing(v[1h], sf, tb)`
    * (Prometheus functions.go funcDoubleExponentialSmoothing): level +
    * trend smoothing over each series-window, Prometheus's exact update
    * order (trend from the previous TWO levels, then the new level; the
    * first iteration keeps the initial trend b = x₁−x₀).
    *
    * Engine-exact math: sf = tb = 1/2 (dyadic), every halving is
    * floor(x/2) computed as `(x + 2·OFF) div 2 − OFF` with OFF = 2⁴⁰ —
    * the offset keeps the dividend positive, where truncating and floor
    * division coincide, so Spark `div`, DuckDB `//` and two's-complement
    * shifts all agree (the division-parity rule; trend terms CAN go
    * negative). The fold is a per-row `aggregate` HOF over the window's
    * sorted points — state is O(1) and bounded by scrape cadence, not
    * corpus; the oracle replays the identical recurrence as a recursive
    * CTE (different algorithm shape, same fixpoint).
    */
  def qHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    val OFF = 1L << 40
    def halve(c: Column): Column = shiftright(c + lit(2 * OFF), 1) - lit(OFF)
    val g = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents")).as("pt"))
      .groupBy("name", "user_id", "w_start")
      .agg(sort_array(collect_list(col("pt"))).as("pts"))
      .filter(size(col("pts")) >= 2)
    val x0 = element_at(col("pts"), 1).getField("cents")
    val x1 = element_at(col("pts"), 2).getField("cents")
    val smoothed = aggregate(
      slice(col("pts"), lit(2), size(col("pts")) - 1),
      struct(lit(0L).as("s0"), x0.as("s1"), (x1 - x0).as("b"),
        lit(1).as("first")),
      (acc, pt) => {
        val bn = when(acc.getField("first") === 1, acc.getField("b"))
          .otherwise(halve(acc.getField("s1") - acc.getField("s0") + acc.getField("b")))
        val sn = halve(pt.getField("cents") + acc.getField("s1") + bn)
        struct(acc.getField("s1").as("s0"), sn.as("s1"), bn.as("b"),
          lit(0).as("first"))
      },
      acc => acc.getField("s1"))
    g.select(col("name"), col("user_id"), col("w_start"),
      size(col("pts")).cast("long").as("n_points"),
      round(smoothed.cast("double") / 100d, 2).as("smoothed"))
  }

  val holtWintersSql: String =
    """WITH RECURSIVE
      |b0 AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |         epoch_us(ts) AS ts_us, event_id,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |p AS (
      |  SELECT name, user_id, w_start, cents,
      |         row_number() OVER (PARTITION BY name, user_id, w_start
      |                            ORDER BY ts_us, event_id, cents) AS rn
      |  FROM b0),
      |sz AS (SELECT name, user_id, w_start, COUNT(*) AS n
      |       FROM p GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
      |rec AS (
      |  SELECT p0.name, p0.user_id, p0.w_start, 1 AS i,
      |         CAST(0 AS BIGINT) AS s0, p0.cents AS s1,
      |         p1.cents - p0.cents AS b
      |  FROM p p0 JOIN p p1 ON p1.name = p0.name AND p1.user_id = p0.user_id
      |       AND p1.w_start = p0.w_start AND p1.rn = 2
      |  WHERE p0.rn = 1
      |  UNION ALL
      |  SELECT r.name, r.user_id, r.w_start, r.i + 1, r.s1,
      |         ((px.cents + r.s1 +
      |           (CASE WHEN r.i = 1 THEN r.b
      |                 ELSE ((r.s1 - r.s0 + r.b + 2199023255552) // 2) - 1099511627776 END)
      |           + 2199023255552) // 2) - 1099511627776,
      |         CASE WHEN r.i = 1 THEN r.b
      |              ELSE ((r.s1 - r.s0 + r.b + 2199023255552) // 2) - 1099511627776 END
      |  FROM rec r JOIN p px ON px.name = r.name AND px.user_id = r.user_id
      |       AND px.w_start = r.w_start AND px.rn = r.i + 1)
      |SELECT r.name, r.user_id, r.w_start, sz.n AS n_points,
      |       round(CAST(r.s1 AS DOUBLE) / 100, 2) AS smoothed
      |FROM rec r JOIN sz ON sz.name = r.name AND sz.user_id = r.user_id
      |     AND sz.w_start = r.w_start
      |WHERE r.i = sz.n""".stripMargin

  /** Fixed evaluation timestamp for [[qInstantVector]] — 2024-01-15
    * 12:00:00 UTC, mid-corpus; the `@` modifier makes this a plan-time
    * constant. */
  private val EvalTsUs = 1705320000L * 1000000L

  /** q_instant_vector — PromQL's CORE evaluation rule, not yet a named
    * operator elsewhere in §2.A: an instant vector at a fixed timestamp
    * (`metric @ 1705320000`) selects, per series, the LATEST sample in
    * the lookback window (T−Δ, T]. Δ=24h here (the synthetic corpus's
    * scrape cadence is ~hours; Prometheus's default 5m is the same plan
    * with a different literal). The time-range filter is a plan-time
    * constant so it PUSHES TO THE PARQUET SCAN — an instant evaluation
    * reads only the lookback slice of a 100 TB corpus, which is the
    * whole point of the rule. One rank window per series on the sliced
    * frame; age_us emitted for staleness accounting.
    */
  def qInstantVector(spark: SparkSession, dir: String): DataFrame =
    instantVec(spark, dir)
      .select(col("name"), col("user_id"), col("ts_us"), col("cents"),
        (lit(EvalTsUs) - col("ts_us")).as("age_us"))

  /** The instant vector at [[EvalTsUs]] — (name, user_id, ts_us, cents),
    * one row per live series — SHARED by the PromQL function family
    * below (`sort`, `timestamp()`, `scalar()`, `absent()`, math funcs).
    * |series|-bounded: every consumer's cost is governed by the live
    * series count, not the corpus, and the constant lookback filter
    * pushes to the parquet scan. */
  private def instantVec(spark: SparkSession, dir: String): DataFrame =
    MaterializeOnce(spark, dir, "etl:instant_vec")(
      instantVecPlan(spark, dir))

  /** The raw instant-vector plan — r14: MATERIALIZED once per
    * (session, dir) behind [[instantVec]] (guide §2.4): 13 registered
    * consumers each re-paid the lookback slice scan + the per-series
    * rank window per execution for a |series|-bounded result. The one
    * consumer with an audited scan-pushdown claim ([[qAbsent]] — its
    * watch-list disjunction must reach PushedFilters) stays on this
    * raw plan; plan audits target it directly (the *Plan convention). */
  private[graft] def instantVecPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.eventsSlice(spark, dir, EvalTsUs - 86400000000L, EvalTsUs)
      .select(col("event_type").as("name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("name", "user_id", "ts_us", "cents")
  }

  /** Oracle twin of [[instantVec]]: CTE chain ending in `iv`. */
  private val instantVecCte: String =
    s"""WITH s AS (
       |  SELECT event_type AS name, user_id, event_id,
       |         epoch_us(ts) AS ts_us,
       |         CAST(round(value*100) AS BIGINT) AS cents
       |  FROM events
       |  WHERE epoch_us(ts) > $EvalTsUs - 86400000000 AND epoch_us(ts) <= $EvalTsUs),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY name, user_id
       |           ORDER BY ts_us DESC, event_id DESC) AS rn
       |  FROM s),
       |iv AS (SELECT name, user_id, ts_us, cents FROM r WHERE rn = 1)""".stripMargin

  /** q_info_func — PromQL 3.x EXPERIMENTAL `info()`: enrich every
    * instant-vector element with the DATA labels of its matching info
    * metric (the OTel `target_info` pattern — identifying label here is
    * `user_id`, the copied data labels are `tier` and `primary_type`).
    * Unlike `group_left` (q_group_left, which the user must hand-wire
    * per label), info() copies the info series' whole label set; the
    * info metric itself is derived |users|-bounded state: per user, the
    * modal event type (deterministic tie-break) and an activity-rank
    * tercile tier. Scale shape: the info frame aggregates once and
    * BROADCASTS into the shared lookback-sliced instant vector; its
    * global tercile window sorts only |users| rows; elements without an
    * info series keep their sample with 'unknown' labels (identity
    * passthrough, like the function's no-match rule).
    */
  def qInfoFunc(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy("user_id")
      .orderBy(col("c").desc, col("event_type"))
    val info0 = perType
      .withColumn("rn", row_number().over(wTop))
      .withColumn("n_events", sum("c").over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1)
      .select(col("user_id").as("iu"),
        col("event_type").as("primary_type"), col("n_events"))
    val wT = Window.orderBy(col("n_events").desc, col("iu"))
    val info = info0
      .withColumn("tier", concat(lit("t"), ntile(3).over(wT).cast("string")))
      .select(col("iu"), col("primary_type"), col("tier"))
    instantVec(spark, dir)
      .join(broadcast(info), col("user_id") === col("iu"), "left")
      .select(col("name"), col("user_id"), col("cents"),
        coalesce(col("tier"), lit("unknown")).as("tier"),
        coalesce(col("primary_type"), lit("unknown")).as("primary_type"))
  }

  val infoFuncSql: String =
    s"""$instantVecCte,
       |pt AS (SELECT user_id, event_type, COUNT(*) AS c
       |       FROM events GROUP BY 1, 2),
       |tp AS (SELECT *,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY c DESC, event_type) AS rn,
       |         CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT)
       |           AS n_events
       |       FROM pt),
       |i0 AS (SELECT user_id AS iu, event_type AS primary_type, n_events
       |       FROM tp WHERE rn = 1),
       |inf AS (SELECT iu, primary_type,
       |          't' || CAST(ntile(3) OVER (ORDER BY n_events DESC, iu)
       |                      AS VARCHAR) AS tier
       |        FROM i0)
       |SELECT iv.name, iv.user_id, iv.cents,
       |       coalesce(inf.tier, 'unknown') AS tier,
       |       coalesce(inf.primary_type, 'unknown') AS primary_type
       |FROM iv LEFT JOIN inf ON iv.user_id = inf.iu""".stripMargin

  val instantVectorSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, ts_us, cents, $EvalTsUs - ts_us AS age_us
       |FROM iv""".stripMargin

  /** q_limitk — the PromQL EXPERIMENTAL sampling aggregators `limitk`
    * and `limit_ratio`, deterministically re-expressed (Prometheus's
    * `limitk` returns an arbitrary k series per group; a distributed
    * re-expression must pick a reproducible k, so ours is the first k
    * by series key — same contract, stable under retries, which is what
    * an ETL actually wants). `limit_ratio` IS deterministic upstream —
    * Prometheus keeps series whose label-hash falls below the ratio —
    * mirrored here as hash60(series) mod 100 < 50. Both flags are
    * emitted per live series over the shared instant vector, so the
    * cost is one |series|-bounded window + one codegen'd hash
    * projection; the sampled sub-vector at 100 TB is the same frame
    * with a pushed filter on the flag.
    */
  def qLimitk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name").orderBy("user_id")
    instantVec(spark, dir)
      .withColumn("in_limitk",
        (row_number().over(w) <= 2).cast("int"))
      .withColumn("in_ratio",
        (hash60(concat(col("name"), lit(":"), col("user_id").cast("string")))
          % 100 < 50).cast("int"))
      .select("name", "user_id", "cents", "in_limitk", "in_ratio")
  }

  val limitkSql: String = {
    val h = hash60Sql("name || ':' || CAST(user_id AS VARCHAR)")
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |       CAST(row_number() OVER (PARTITION BY name ORDER BY user_id) <= 2
       |            AS INT) AS in_limitk,
       |       CAST($h % 100 < 50 AS INT) AS in_ratio
       |FROM iv""".stripMargin
  }

  /** q_scrape_health — scrape-interval health per series (the target
    * health view behind Prometheus's `up`/`scrape_duration` panels):
    * inter-sample gap statistics — count, mean (exact ×1000 integer),
    * max, and the count of gaps over 2× the series' own mean (missed
    * scrapes). Gaps come from one lag window on the series key; the
    * 2×-mean test cross-multiplies integers: gap > 2·mean = 2·Σgap/n
    * ⟺ gap·n > 2·Σgap (all integer products), so no float threshold.
    * Output is |series|-bounded.
    */
  def qScrapeHealth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id").orderBy("ts_us", "event_id")
    val series = Window.partitionBy("name", "user_id")
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .filter(col("gap_us").isNotNull)
      // per-series totals ride a second window on the SAME series key
      // the lag shuffle produced — the "missed" test is then integer
      // cross-multiplication (gap > 2·mean ⟺ gap·n > 2·Σgap), no floats
      .withColumn("n_all", count(lit(1)).over(series))
      .withColumn("sum_all", sum("gap_us").over(series))
      .groupBy("name", "user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap_us").as("sum_gap_us"),
        max("gap_us").as("max_gap_us"),
        sum(when(col("gap_us") * col("n_all") > col("sum_all") * 2L, 1L)
          .otherwise(0L)).as("n_missed"))
      .withColumn("mean_gap_us", expr("sum_gap_us div n_gaps"))
  }

  val scrapeHealthSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id, epoch_us(ts) AS ts_us,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type,
      |           user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events),
      |t AS (SELECT *, COUNT(*) OVER (PARTITION BY name, user_id) AS n_all,
      |             CAST(SUM(gap_us) OVER (PARTITION BY name, user_id) AS BIGINT)
      |               AS sum_all
      |      FROM s WHERE gap_us IS NOT NULL)
      |SELECT name, user_id, COUNT(*) AS n_gaps,
      |       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
      |       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
      |       CAST(SUM(CASE WHEN gap_us * n_all > sum_all * 2 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_missed,
      |       CAST(SUM(gap_us) AS BIGINT) // COUNT(*) AS mean_gap_us
      |FROM t GROUP BY 1, 2""".stripMargin

  /** q_range_eval — the PromQL RANGE-QUERY evaluation model, completing
    * the family ([[qInstantVector]] = instant, [[qSubqueryRate]] =
    * subquery): `sum_over_time(m[30m])` evaluated at every 10m STEP, so
    * each sample contributes to the ⌈range/step⌉ = 3 OVERLAPPING
    * evaluation steps that can see it. Re-expressed as a constant-width
    * explode (each sample → its 3 member steps — work ∝ n·(range/step),
    * a plan-time constant) followed by ONE map-side-combinable groupBy;
    * no self-join, no window function, no per-step re-scan. Steps with
    * no samples produce no row, exactly like PromQL staleness.
    * STEP-FLOOR APPROXIMATION: sample time is floored to its step
    * before membership, so a sample at step s maps to eval steps
    * {s, s+1, s+2}. True PromQL (T−30m, T] membership gives
    * {s+1, s+2, s+3} for a mid-step sample and agrees only for samples
    * exactly on step boundaries. Both engines share the floor (the
    * oracle uses the same `// step` bucketing), so parity holds; an
    * exact-timestamp variant would explode
    * `sequence(ceil(ts/step), ceil(ts/step)+2)` instead.
    */
  def qRangeEval(spark: SparkSession, dir: String): DataFrame = {
    val stepS = 600L
    val rangeSteps = 3 // 30m lookback / 10m step
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        expr(s"unix_micros(ts) div ${stepS * 1000000L}").as("sample_step"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("name"), col("user_id"), col("cents"),
        explode(sequence(col("sample_step"),
          col("sample_step") + (rangeSteps - 1))).as("eval_step"))
      .groupBy("name", "user_id", "eval_step")
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n_samples"))
      .select(col("name"), col("user_id"),
        (col("eval_step") * stepS).as("eval_ts_s"),
        col("sum_cents"), col("n_samples"))
  }

  val rangeEvalSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 600000000 AS sample_step,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |e AS (
      |  SELECT name, user_id, cents,
      |         unnest(generate_series(sample_step, sample_step + 2)) AS eval_step
      |  FROM s)
      |SELECT name, user_id, eval_step * 600 AS eval_ts_s,
      |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |       COUNT(*) AS n_samples
      |FROM e GROUP BY 1, 2, eval_step""".stripMargin

  /** q_label_cardinality — the TSDB cardinality monitor (Prometheus's
    * `/api/v1/status/tsdb` highest-cardinality dashboard): per label
    * KEY, the distinct-value count, total occurrences, and the modal
    * value with its share — the early-warning for label explosions that
    * kill real TSDBs. The label map explodes to (key, value) PAIRS —
    * 8-byte-hash-sized rows, not series — and both aggregations land on
    * the same key-prefixed shuffle. Output bounded by |label keys|.
    */
  def qLabelCardinality(spark: SparkSession, dir: String): DataFrame = {
    val kv = metrics(spark, dir)
      .select(explode(arrays_zip(col("label_keys"), col("label_values")))
        .as("kv"))
      .select(col("kv.label_keys").as("k"), col("kv.label_values").as("v"))
    val perValue = kv.groupBy("k", "v").agg(count(lit(1)).as("n"))
    val wk = Window.partitionBy("k").orderBy(col("n").desc, col("v"))
    perValue
      .withColumn("rn", row_number().over(wk))
      .groupBy("k")
      .agg(count(lit(1)).as("n_values"), sum("n").as("n_occurrences"),
        max(when(col("rn") === 1, col("v"))).as("top_value"),
        max(when(col("rn") === 1, col("n"))).as("top_n"))
      .withColumn("top_share_ppm",
        expr("top_n * 1000000 div n_occurrences"))
  }

  val labelCardinalitySql: String =
    s"""WITH kv AS (
       |  SELECT unnest($keysSql) AS k, unnest($valuesSql) AS v
       |  FROM events),
       |pv AS (SELECT k, v, COUNT(*) AS n FROM kv GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY k
       |        ORDER BY n DESC, v) AS rn FROM pv)
       |SELECT k, COUNT(*) AS n_values,
       |       CAST(SUM(n) AS BIGINT) AS n_occurrences,
       |       max(CASE WHEN rn = 1 THEN v END) AS top_value,
       |       max(CASE WHEN rn = 1 THEN n END) AS top_n,
       |       max(CASE WHEN rn = 1 THEN n END) * 1000000
       |         // CAST(SUM(n) AS BIGINT) AS top_share_ppm
       |FROM r GROUP BY k""".stripMargin

  /** q_series_churn — series lifecycle monitoring: per day, how many
    * series (name × user) are NEW (absent the previous day) and how
    * many DISAPPEARED — the churn signal behind TSDB head-block bloat
    * and scrape-target drift. Presence collapses to one row per
    * (series, day) FIRST (map-side), then churn is a shifted-key
    * full-outer self-join on the aggregated frame — the q_offset_compare
    * mechanism applied to existence instead of sums. Output bounded by
    * |days|.
    */
  def qSeriesChurn(spark: SparkSession, dir: String): DataFrame = {
    val present = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val today = present.select(col("name"), col("user_id"), col("day"))
    val yesterday = present.select(col("name").as("name_y"),
      col("user_id").as("user_y"), (col("day") + 1).as("day_y"))
    today.join(yesterday,
        col("name") === col("name_y") && col("user_id") === col("user_y") &&
          col("day") === col("day_y"), "full_outer")
      .select(coalesce(col("day"), col("day_y")).as("day"),
        when(col("name_y").isNull, 1L).otherwise(0L).as("is_new"),
        when(col("name").isNull, 1L).otherwise(0L).as("is_gone"),
        when(col("name").isNotNull && col("name_y").isNotNull, 1L)
          .otherwise(0L).as("is_stable"))
      .groupBy("day")
      .agg(sum("is_new").as("n_new"), sum("is_gone").as("n_gone"),
        sum("is_stable").as("n_stable"))
  }

  val seriesChurnSql: String =
    """WITH p AS (
      |  SELECT DISTINCT event_type AS name, user_id,
      |         epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |j AS (
      |  SELECT coalesce(t.day, y.day + 1) AS day,
      |         CASE WHEN y.name IS NULL THEN 1 ELSE 0 END AS is_new,
      |         CASE WHEN t.name IS NULL THEN 1 ELSE 0 END AS is_gone,
      |         CASE WHEN t.name IS NOT NULL AND y.name IS NOT NULL
      |              THEN 1 ELSE 0 END AS is_stable
      |  FROM p t FULL JOIN p y
      |    ON t.name = y.name AND t.user_id = y.user_id
      |   AND t.day = y.day + 1)
      |SELECT day, CAST(SUM(is_new) AS BIGINT) AS n_new,
      |       CAST(SUM(is_gone) AS BIGINT) AS n_gone,
      |       CAST(SUM(is_stable) AS BIGINT) AS n_stable
      |FROM j GROUP BY day""".stripMargin

  /** q_stddev_by_label — PromQL `stddev/stdvar by (user)` ACROSS series:
    * the spread of per-series sums within each (user, 1h window) group.
    * Two stacked aggregations — per-series sums, then the cross-series
    * moments — with the ENGINE-EXACT closed form on integer n/Σx/Σx²
    * ([[qStdvarOverTime]]'s rule: incremental float variance is
    * summation-order-dependent and can never hash-match). The outer
    * group key is a prefix of the inner one, so the second exchange
    * moves only the aggregated series frame.
    */
  def qStddevByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        col("user_id"),
        expr("unix_micros(ts) div 3600000000 * 3600").as("w_start"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("user_id", "w_start", "name")
      .agg(sum("c").as("sc"))
      .groupBy("user_id", "w_start")
      .agg(count(lit(1)).as("n_series"), sum("sc").as("s1"),
        sum(col("sc") * col("sc")).as("s2"))
      .filter(col("n_series") >= 2)
      .select(col("user_id"), col("w_start"), col("n_series"),
        round((col("n_series") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_series") * col("n_series")).cast("double") / 10000d, 6)
          .as("stdvar_v"),
        round(sqrt((col("n_series") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_series") * col("n_series")).cast("double")) / 100d, 6)
          .as("stddev_v"))

  val stddevByLabelSql: String =
    """WITH s AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 * 3600 AS w_start,
      |         event_type AS name,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sc
      |  FROM events GROUP BY 1, 2, 3),
      |g AS (
      |  SELECT user_id, w_start, COUNT(*) AS n_series,
      |         CAST(SUM(sc) AS BIGINT) AS s1,
      |         CAST(SUM(sc*sc) AS BIGINT) AS s2
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, w_start, n_series,
      |       round(CAST(n_series*s2 - s1*s1 AS DOUBLE)
      |             / CAST(n_series*n_series AS DOUBLE) / 10000.0, 6) AS stdvar_v,
      |       round(sqrt(CAST(n_series*s2 - s1*s1 AS DOUBLE)
      |             / CAST(n_series*n_series AS DOUBLE)) / 100.0, 6) AS stddev_v
      |FROM g WHERE n_series >= 2""".stripMargin

  /** q_vector_setops — PromQL logical/set binary operators between two
    * instant vectors: `err and view`, `err unless view`, `err or view`
    * on matching label sets (user) per 1h window. Both sides aggregate
    * FIRST (map-side combinable), then ONE full-outer equi-join on the
    * key both shuffles already landed on computes all three operators at
    * once — presence flags decide membership exactly as PromQL's
    * matching does. Absent-side values surface as the -1 sentinel so
    * every output column stays non-null BIGINT (driver-hashable).
    */
  def qVectorSetops(spark: SparkSession, dir: String): DataFrame = {
    def side(metric: String, out: String): DataFrame =
      Tables.events(spark, dir)
        .filter(col("event_type") === metric)
        .select(col("user_id").cast("string").as("user"),
          expr("unix_micros(ts) div 3600000000").as("wnd"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("user", "wnd")
        .agg(sum("cents").as(out))
    side("error", "err_cents")
      .join(side("view", "view_cents"), Seq("user", "wnd"), "full_outer")
      .select(col("user"), (col("wnd") * 3600000000L).as("w_start_us"),
        col("err_cents").isNotNull.cast("int").as("in_err"),
        col("view_cents").isNotNull.cast("int").as("in_view"),
        coalesce(when(col("view_cents").isNotNull, col("err_cents")), lit(-1L))
          .as("and_cents"),
        coalesce(when(col("view_cents").isNull, col("err_cents")), lit(-1L))
          .as("unless_cents"),
        coalesce(col("err_cents"), col("view_cents")).as("or_cents"))
  }

  val vectorSetopsSql: String =
    """WITH e AS (
      |  SELECT CAST(user_id AS VARCHAR) AS "user",
      |         epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS err_cents
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      |v AS (
      |  SELECT CAST(user_id AS VARCHAR) AS "user",
      |         epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS view_cents
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT "user", wnd * 3600000000 AS w_start_us,
      |       CAST(err_cents IS NOT NULL AS INT) AS in_err,
      |       CAST(view_cents IS NOT NULL AS INT) AS in_view,
      |       coalesce(CASE WHEN view_cents IS NOT NULL THEN err_cents END, -1)
      |         AS and_cents,
      |       coalesce(CASE WHEN view_cents IS NULL THEN err_cents END, -1)
      |         AS unless_cents,
      |       coalesce(err_cents, view_cents) AS or_cents
      |FROM e FULL JOIN v USING ("user", wnd)""".stripMargin

  /** q_group_left — PromQL many-to-one vector matching:
    * `sum by(name,user)(m) / on(user) group_left(tier)
    *  sum by(user)(view)` per 1h window. The "one" side is the per-user
    * view total plus a DERIVED label (`tier`) that group_left carries
    * onto every matched many-side series — the canonical info-metric
    * enrichment. Both sides aggregate first; the many-to-one join is an
    * equi-join on the aggregation key (no extra exchange on the many
    * side), and at 100 TB the one side is |users|-sized → AQE broadcasts
    * it. Share is exact ppm via nonneg truncating division (all event
    * values are positive; enforced by the WHERE guard anyway).
    */
  def qGroupLeft(spark: SparkSession, dir: String): DataFrame = {
    val many = Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("wnd"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "wnd")
      .agg(sum("cents").as("m_cents"))
    val one = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("wnd"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "wnd")
      .agg(sum("cents").as("view_cents"), count(lit(1)).as("n_view"))
      .withColumn("tier",
        when(col("n_view") >= 3, lit("heavy")).otherwise(lit("light")))
    many.join(one, Seq("user_id", "wnd"))
      .filter(col("m_cents") > 0 && col("view_cents") > 0)
      .select(col("name"), col("user_id"),
        (col("wnd") * 3600000000L).as("w_start_us"),
        col("m_cents"), col("view_cents"), col("tier"),
        expr("m_cents * 1000000 div view_cents").as("share_ppm"))
  }

  val groupLeftSql: String =
    """WITH m AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM events GROUP BY 1, 2, 3),
      |o AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS wnd,
      |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS view_cents,
      |         COUNT(*) AS n_view
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT m.name, m.user_id, m.wnd * 3600000000 AS w_start_us,
      |       m.m_cents, o.view_cents,
      |       CASE WHEN o.n_view >= 3 THEN 'heavy' ELSE 'light' END AS tier,
      |       m.m_cents * 1000000 // o.view_cents AS share_ppm
      |FROM m JOIN o ON m.user_id = o.user_id AND m.wnd = o.wnd
      |WHERE m.m_cents > 0 AND o.view_cents > 0""".stripMargin

  /** q_idelta — PromQL `idelta()`: difference of the LAST TWO samples per
    * series per 5m window (gauge semantics — no reset rule, unlike
    * [[qIrate]]). Pure integers end to end: cents delta and µs gap, so no
    * float division at all. The rank filter keeps O(1) state per
    * series-window at any sample density.
    */
  def qIdelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      expr("unix_micros(ts) div 300000000 * 300000000").as("w_start"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("name", "user_id", "w_start")
      .agg(max(when(col("rn") === 1, col("cents"))).as("last_c"),
        max(when(col("rn") === 2, col("cents"))).as("prev_c"),
        max(when(col("rn") === 1, col("ts_us"))).as("last_us"),
        max(when(col("rn") === 2, col("ts_us"))).as("prev_us"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2 && col("last_us") > col("prev_us"))
      .select(col("name"), col("user_id"), col("w_start"),
        (col("last_c") - col("prev_c")).as("idelta_cents"),
        (col("last_us") - col("prev_us")).as("gap_us"))
  }

  val ideltaSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts) // 300000000 * 300000000 AS w_start,
      |         epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY event_type, user_id,
      |             epoch_us(ts) // 300000000
      |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events),
      |g AS (
      |  SELECT name, user_id, w_start,
      |         max(CASE WHEN rn = 1 THEN cents END) AS last_c,
      |         max(CASE WHEN rn = 2 THEN cents END) AS prev_c,
      |         max(CASE WHEN rn = 1 THEN ts_us END) AS last_us,
      |         max(CASE WHEN rn = 2 THEN ts_us END) AS prev_us,
      |         COUNT(*) AS n
      |  FROM s WHERE rn <= 2 GROUP BY 1, 2, 3)
      |SELECT name, user_id, w_start,
      |       last_c - prev_c AS idelta_cents,
      |       last_us - prev_us AS gap_us
      |FROM g WHERE n = 2 AND last_us > prev_us""".stripMargin

  /** q_subquery_rate — PromQL SUBQUERY: `max_over_time(rate(m[5m])[1h:5m])`
    * — the inner function evaluates at each 5m step, the outer range
    * function folds those results over the 1h window. Re-expressed as two
    * stacked aggregations: the [[qRate]] core per (series, 5m window),
    * then max/min/count over the 12 sub-windows inside each hour. The
    * corpus shuffles ONCE (the 5m window pass); the outer fold's
    * exchange moves only the per-5m aggregated frame — |series × 5m
    * windows| rows, not corpus rows — with partial aggregation on top
    * (PlanAuditSpec pins both exchanges). max/min pick one of two
    * bit-identical rounded doubles → engine-exact.
    */
  def qSubqueryRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w5")
      .orderBy("ts_s", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w5"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .withColumn("corrected",
        when(col("delta") < 0, col("cents")).otherwise(col("delta")))
      .groupBy("name", "user_id", "w5")
      .agg(sum("corrected").as("inc_cents"),
        min("ts_s").as("t_first"), max("ts_s").as("t_last"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("t_last") > col("t_first"))
      .select(col("name"), col("user_id"), col("w5"),
        round(col("inc_cents").cast("double") / 100d
          / (col("t_last") - col("t_first")), 6).as("rate5"))
      .groupBy(col("name"), col("user_id"),
        expr("w5 div 3600 * 3600").as("w_start"))
      .agg(max("rate5").as("max_rate"), min("rate5").as("min_rate"),
        count(lit(1)).as("n_sub"))
  }

  val subqueryRateSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w5,
      |         epoch_us(ts)/1000000.0 AS ts_s,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT *, cents - lag(cents) OVER (PARTITION BY name, user_id, w5
      |           ORDER BY ts_s, event_id) AS delta
      |  FROM s),
      |c AS (
      |  SELECT *, CASE WHEN delta < 0 THEN cents ELSE delta END AS corrected
      |  FROM d),
      |r AS (
      |  SELECT name, user_id, w5,
      |         round(CAST(SUM(corrected) AS BIGINT) / 100.0
      |               / (max(ts_s) - min(ts_s)), 6) AS rate5
      |  FROM c GROUP BY name, user_id, w5
      |  HAVING COUNT(*) >= 2 AND max(ts_s) > min(ts_s))
      |SELECT name, user_id, w5 // 3600 * 3600 AS w_start,
      |       max(rate5) AS max_rate, min(rate5) AS min_rate,
      |       COUNT(*) AS n_sub
      |FROM r GROUP BY 1, 2, 3""".stripMargin

  /** q_histogram_fraction — the rest of the PromQL histogram family next
    * to [[qHistogramQuantile]]: `histogram_count`, `histogram_sum`,
    * `histogram_avg`, and `histogram_fraction(3, 8, ...)` from classic
    * le-buckets {1,2,5,10,+Inf}. Bucket cumulative counts are CONDITIONAL
    * integer sums in ONE groupBy (no per-bucket rows, no window pass —
    * cheaper than the quantile's explicit bucket relation), and the
    * fraction linearly interpolates inside the boundary buckets exactly
    * as Prometheus does. Counts/cents are exact integers; the two
    * interpolation divisions are written with identical association in
    * both engines.
    */
  def qHistogramFraction(spark: SparkSession, dir: String): DataFrame = {
    def leCnt(boundCents: Long): Column =
      sum(when(col("cents") <= boundCents, 1L).otherwise(0L))
    Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        expr("unix_micros(ts) div 3600000000 * 3600").as("w_start"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "w_start")
      .agg(count(lit(1)).as("h_count"),
        sum("cents").as("h_sum_cents"),
        leCnt(200L).as("le2"), leCnt(500L).as("le5"), leCnt(1000L).as("le10"))
      .select(col("name"), col("w_start"), col("h_count"), col("h_sum_cents"),
        round(col("h_sum_cents").cast("double") / 100d / col("h_count"), 6)
          .as("h_avg"),
        round(
          ((col("le5") + (col("le10") - col("le5")).cast("double") * 300d / 500d)
            - (col("le2") + (col("le5") - col("le2")).cast("double") * 100d / 300d))
            / col("h_count"), 6).as("frac_3_8"))
  }

  val histogramFractionSql: String =
    """WITH b AS (
      |  SELECT event_type AS name,
      |         epoch_us(ts) // 3600000000 * 3600 AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT name, w_start, COUNT(*) AS h_count,
      |         CAST(SUM(cents) AS BIGINT) AS h_sum_cents,
      |         CAST(SUM(CASE WHEN cents <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS le2,
      |         CAST(SUM(CASE WHEN cents <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS le5,
      |         CAST(SUM(CASE WHEN cents <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS le10
      |  FROM b GROUP BY 1, 2)
      |SELECT name, w_start, h_count, h_sum_cents,
      |       round(CAST(h_sum_cents AS DOUBLE) / 100.0 / h_count, 6) AS h_avg,
      |       round(((le5 + CAST(le10 - le5 AS DOUBLE) * 300.0 / 500.0)
      |              - (le2 + CAST(le5 - le2 AS DOUBLE) * 100.0 / 300.0))
      |             / h_count, 6) AS frac_3_8
      |FROM g""".stripMargin

  /** q_promql_sort — PromQL `sort()` / `sort_desc()` over the instant
    * vector at T (reference consumers order Grafana tables this way).
    * Value-ordered ranks with a deterministic (cents, name, user_id)
    * tie-break; the desc rank is DERIVED from the asc rank against the
    * exact-reverse tie-break, so ONE global sort serves both directions.
    * The sorted frame is the |series|-bounded instant vector, never the
    * corpus — a bounded final stage at any data size.
    */
  def qPromqlSort(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("cents").asc, col("name").asc, col("user_id").asc)
    instantVec(spark, dir)
      .select(col("name"), col("user_id"), col("cents"))
      .withColumn("rank_asc", row_number().over(w).cast("long"))
      .withColumn("rank_desc",
        count(lit(1)).over(Window.partitionBy()) - col("rank_asc") + 1L)
  }

  val promqlSortSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |       row_number() OVER (ORDER BY cents, name, user_id) AS rank_asc,
       |       COUNT(*) OVER ()
       |         - row_number() OVER (ORDER BY cents, name, user_id) + 1 AS rank_desc
       |FROM iv""".stripMargin

  /** q_timestamp — PromQL `timestamp(v)`: the value of each instant-
    * vector element becomes its own sample timestamp. Emitted as exact
    * integer milliseconds (PromQL's float seconds carry ms precision);
    * pure projection on the shared [[instantVec]] slice.
    */
  def qTimestamp(spark: SparkSession, dir: String): DataFrame =
    instantVec(spark, dir)
      .select(col("name"), col("user_id"),
        expr("ts_us div 1000").as("ts_ms"), col("cents"))

  val timestampSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, ts_us // 1000 AS ts_ms, cents FROM iv""".stripMargin

  /** q_scalar — PromQL `scalar(v)` and `vector(s)`: scalar() yields the
    * single element's value when |v| = 1 and NaN otherwise (NaN surfaces
    * as NULL cents here); vector(s) lifts a literal into a labelless
    * 1-element vector. Three cases in one 3-row output: scalar over an
    * always-1-element aggregate, scalar over a multi-series selector
    * (→ NULL), and a vector literal. One bounded aggregation of the
    * shared instant vector — the corpus participates only through the
    * pushed lookback scan.
    */
  def qScalar(spark: SparkSession, dir: String): DataFrame = {
    val a = instantVec(spark, dir).filter(col("name") === "click")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"), min("cents").as("m"))
    a.select(explode(array(
        struct(lit("scalar_sum").as("kind"), col("s").as("cents")),
        struct(lit("scalar_raw").as("kind"),
          when(col("n") === 1L, col("m")).otherwise(lit(null).cast("long"))
            .as("cents")),
        struct(lit("vector_lit").as("kind"), lit(4200L).as("cents"))))
        .as("r"))
      .select(col("r.kind").as("kind"), col("r.cents").as("cents"))
  }

  val scalarSql: String =
    s"""$instantVecCte,
       |a AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s,
       |             MIN(cents) AS m
       |      FROM iv WHERE name = 'click')
       |SELECT 'scalar_sum' AS kind, s AS cents FROM a
       |UNION ALL
       |SELECT 'scalar_raw' AS kind,
       |       CASE WHEN n = 1 THEN m ELSE NULL END AS cents FROM a
       |UNION ALL
       |SELECT 'vector_lit' AS kind, CAST(4200 AS BIGINT) AS cents FROM a""".stripMargin

  /** Instant-absent watch-list: fixed alerting selectors, including two
    * that never match — the subjects PromQL `absent()` exists for. A
    * plan-time CONSTANT (same rule as [[AbsentWatchUsers]]). */
  private val AbsentWatch: Seq[(String, Long)] =
    Seq(("click", 11L), ("error", 3L), ("nosuch_metric", 1L),
      ("purchase", 9999999L))

  /** q_absent — instant-form PromQL `absent(v)` at T over the watch-list
    * (completes the `absent_over_time` machinery at [[qAbsentOverTime]]
    * with the single-instant rule): is_absent = 1 when the selector has
    * no live sample in the lookback. The watched-selector disjunction is
    * a plan-time constant pushed BELOW the rank window to the scan — at
    * 100 TB this reads only the watched series' lookback slice, then
    * joins two ≤|watch|-row frames.
    */
  def qAbsent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sel = AbsentWatch.map { case (n, u) =>
      col("name") === n && col("user_id") === u }.reduce(_ || _)
    val present = instantVecPlan(spark, dir).filter(sel)
      .select(col("name"), col("user_id"), lit(1L).as("present"))
    AbsentWatch.toDF("name", "user_id")
      .join(present, Seq("name", "user_id"), "left_outer")
      .select(col("name"), col("user_id"),
        when(col("present").isNull, 1L).otherwise(0L).as("is_absent"))
  }

  val absentSql: String = {
    val values = AbsentWatch
      .map { case (n, u) => s"('$n', CAST($u AS BIGINT))" }.mkString(", ")
    val sel = AbsentWatch
      .map { case (n, u) => s"(name = '$n' AND user_id = $u)" }
      .mkString(" OR ")
    s"""$instantVecCte,
       |watch(name, user_id) AS (VALUES $values)
       |SELECT w.name, w.user_id,
       |       CAST(CASE WHEN p.name IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |         AS is_absent
       |FROM watch w LEFT JOIN (SELECT name, user_id FROM iv
       |                        WHERE $sel) p
       |  ON p.name = w.name AND p.user_id = w.user_id""".stripMargin
  }

  /** q_math_funcs — the PromQL scalar math family (`ln`, `log2`,
    * `sqrt`, `exp`, `abs`, `sgn`, `ceil`, `floor`) over the instant
    * vector. libm members are graded ERROR-BOUND: outputs are rounded
    * to integer ×1000 — ln/log2/exp values are irrational, so a ≤2-ulp
    * cross-engine libm difference cannot move the rounded integer
    * (IEEE sqrt is correctly rounded and exact in both engines); the
    * abs/sgn/ceil/floor members are integer-exact (boundary values hit
    * exactly-representable doubles on both sides). Pure projection —
    * codegen'd, no shuffle beyond the shared instant-vector rank.
    */
  def qMathFuncs(spark: SparkSession, dir: String): DataFrame = {
    val c = greatest(col("cents"), lit(1L))
    instantVec(spark, dir).select(col("name"), col("user_id"), col("cents"),
      round(log(c) * 1000d).cast("long").as("ln_x1000"),
      round(log2(c) * 1000d).cast("long").as("log2_x1000"),
      round(sqrt(c) * 1000d).cast("long").as("sqrt_x1000"),
      round(exp(col("cents").cast("double") / 10000d) * 1000d).cast("long")
        .as("exp_x1000"),
      abs(col("cents") - 5000L).as("abs_c"),
      when(col("cents") > 5000L, 1L).when(col("cents") < 5000L, -1L)
        .otherwise(0L).as("sgn_c"),
      ceil((col("cents") - 5000L).cast("double") / 100d).cast("long")
        .as("ceil_c"),
      floor((col("cents") - 5000L).cast("double") / 100d).cast("long")
        .as("floor_c"))
  }

  val mathFuncsSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |  CAST(round(ln(greatest(cents, 1)) * 1000) AS BIGINT) AS ln_x1000,
       |  CAST(round(log2(greatest(cents, 1)) * 1000) AS BIGINT) AS log2_x1000,
       |  CAST(round(sqrt(greatest(cents, 1)) * 1000) AS BIGINT) AS sqrt_x1000,
       |  CAST(round(exp(CAST(cents AS DOUBLE) / 10000) * 1000) AS BIGINT)
       |    AS exp_x1000,
       |  abs(cents - 5000) AS abs_c,
       |  CAST(CASE WHEN cents > 5000 THEN 1 WHEN cents < 5000 THEN -1
       |            ELSE 0 END AS BIGINT) AS sgn_c,
       |  CAST(ceil(CAST(cents - 5000 AS DOUBLE) / 100) AS BIGINT) AS ceil_c,
       |  CAST(floor(CAST(cents - 5000 AS DOUBLE) / 100) AS BIGINT) AS floor_c
       |FROM iv""".stripMargin

  /** q_time_funcs — the PromQL time family (`minute` `hour`
    * `day_of_week` `day_of_month` `day_of_year` `month` `year`
    * `days_in_month`) applied to each instant-vector element's own
    * sample timestamp (the `f(timestamp(v))` recording-rule idiom).
    * All UTC, like Prometheus — both session builders pin
    * spark.sql.session.timeZone=UTC and the oracle's make_timestamp is
    * timezone-naive, so the field extractions agree exactly.
    * day_of_week is PromQL's 0=Sunday..6 (Spark's dayofweek is
    * 1-based, shifted here). Integer-exact, codegen'd projection on the
    * shared [[instantVec]] — corpus cost is the pushed lookback scan.
    */
  def qTimeFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ts = timestamp_seconds(expr("ts_us div 1000000"))
    instantVec(spark, dir).select(col("name"), col("user_id"), col("ts_us"),
      minute(ts).cast("long").as("minute_utc"),
      hour(ts).cast("long").as("hour_utc"),
      (dayofweek(ts) - 1).cast("long").as("day_of_week"),
      dayofmonth(ts).cast("long").as("day_of_month"),
      dayofyear(ts).cast("long").as("day_of_year"),
      month(ts).cast("long").as("month_utc"),
      year(ts).cast("long").as("year_utc"),
      dayofmonth(last_day(ts)).cast("long").as("days_in_month"))
  }

  /** q_burstiness — per-series FANO FACTOR (variance/mean of
    * per-minute arrival counts): the burst-vs-steady classifier behind
    * alert tuning and scrape-capacity planning — a Poisson-ish steady
    * series sits near 1, batch-flushed or thundering-herd series far
    * above. ENGINE-EXACT: minute-bucket counts are integers, the
    * variance numerator uses the same Σ(x−m)² identity about the
    * truncated integer mean as q_dim_variance (int64-safe — no n·Σx²
    * product), and the Fano ratio emits as one exact truncating ×100
    * integer. Minutes observed = the series' own [first, last] minute
    * span (empty minutes count as zero arrivals — they carry the
    * signal). One (series, minute) aggregation, then a |series|-bounded
    * fold; series needing ≥2 observed minutes.
    */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val perMin = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        expr("unix_micros(ts) div 60000000").as("minute"))
      .groupBy("name", "user_id", "minute").agg(count(lit(1)).as("c"))
    val st = perMin.groupBy("name", "user_id")
      .agg(min("minute").as("mn"), max("minute").as("mx"),
        count(lit(1)).as("active_minutes"),
        sum("c").as("n_events"), sum(col("c") * col("c")).as("s2"))
      .withColumn("minutes", col("mx") - col("mn") + 1L)
      .filter(col("minutes") >= 2L)
    // moments over ALL minutes in the span: empty minutes are zeros, so
    // Σx = n_events and Σx² = s2 unchanged; mean m = truncated n/minutes
    st.withColumn("m", expr("n_events div minutes"))
      .withColumn("var_sum", col("s2") - lit(2L) * col("m") * col("n_events")
        + col("minutes") * col("m") * col("m"))
      .select(col("name"), col("user_id"), col("minutes"),
        col("active_minutes"), col("n_events"),
        expr("(var_sum * 100) div greatest(n_events, 1)").as("fano_x100"))
  }

  val burstinessSql: String =
    """WITH pm AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 60000000 AS minute, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |st AS (
      |  SELECT name, user_id, MIN(minute) AS mn, MAX(minute) AS mx,
      |         COUNT(*) AS active_minutes,
      |         CAST(SUM(c) AS BIGINT) AS n_events,
      |         CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM pm GROUP BY 1, 2),
      |sp AS (
      |  SELECT *, mx - mn + 1 AS minutes FROM st WHERE mx - mn + 1 >= 2),
      |mo AS (
      |  SELECT *, n_events // minutes AS m FROM sp),
      |v AS (
      |  SELECT name, user_id, minutes, active_minutes, n_events,
      |         s2 - 2 * m * n_events + minutes * m * m AS var_sum
      |  FROM mo)
      |SELECT name, user_id, minutes, active_minutes, n_events,
      |       (var_sum * 100) // greatest(n_events, 1) AS fano_x100
      |FROM v""".stripMargin

  /** q_gorilla_bits — TSDB COMPRESSION-COST estimate per series
    * (Gorilla / Prometheus-TSDB chunk planning): how many bits/sample
    * would the standard time-series codec spend on this series? The
    * capacity-planning read behind retention and chunk sizing.
    * Timestamp cost uses Gorilla's exact delta-of-delta buckets on
    * SECOND deltas (dod=0 → 1 bit; ±63 → 9; ±255 → 12; ±2047 → 16;
    * else 36); value cost uses a simplified, fully-integer model —
    * repeat → 1 bit, else 13 + bitlen(|Δcents|) (delta magnitude as
    * the proxy for XOR significant bits: exact XOR sign handling
    * diverges between engines' binary renderings of negatives, and the
    * planning signal is identical). First-sample/second-sample header
    * costs are the codec's fixed overhead and excluded. One series
    * shuffle shared by both lag windows and the aggregate;
    * |series|-bounded output, all integers.
    */
  def qGorillaBits(spark: SparkSession, dir: String): DataFrame = {
    // order by the SECOND-granularity key the codec sees (ts_s), with
    // the unique event_id completing the total order — ordering by raw
    // µs would legally diverge from the oracle whenever two samples
    // share a second (same cross-engine tie trap as the lineitem
    // windows)
    val w = Window.partitionBy("name", "user_id")
      .orderBy(col("ts_s").asc, col("event_id").asc)
    val base = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("ts_s", expr("ts_us div 1000000"))
      .withColumn("dt", col("ts_s") - lag("ts_s", 1).over(w))
      .withColumn("dod", col("dt") - lag("dt", 1).over(w))
      .withColumn("dv", abs(col("cents") - lag("cents", 1).over(w)))
    val tsBits = when(col("dod").isNull, 0L)
      .when(col("dod") === 0L, 1L)
      .when(col("dod").between(-63L, 64L), 9L)
      .when(col("dod").between(-255L, 256L), 12L)
      .when(col("dod").between(-2047L, 2048L), 16L)
      .otherwise(36L)
    val valBits = when(col("dv").isNull, 0L)
      .when(col("dv") === 0L, 1L)
      .otherwise(lit(13L) + length(expr("conv(dv, 10, 2)")).cast("long"))
    base
      .withColumn("ts_bits", tsBits)
      .withColumn("val_bits", valBits)
      .groupBy("name", "user_id")
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("dod") === 0L, 1L).otherwise(0L)).as("dod_zero"),
        sum(when(col("dv") === 0L, 1L).otherwise(0L)).as("repeats"),
        sum("ts_bits").as("ts_bits"),
        sum("val_bits").as("val_bits"))
      .filter(col("n_samples") >= 3)
      .select(col("name"), col("user_id"), col("n_samples"),
        col("dod_zero"), col("repeats"), col("ts_bits"), col("val_bits"),
        expr("((ts_bits + val_bits) * 100) div (n_samples - 2)")
          .as("bits_per_sample_x100"))
  }

  val gorillaBitsSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts) // 1000000 AS ts_s,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |l AS (
      |  SELECT *,
      |         ts_s - lag(ts_s) OVER (PARTITION BY name, user_id
      |                                ORDER BY ts_s, event_id) AS dt,
      |         abs(cents - lag(cents) OVER (PARTITION BY name, user_id
      |                                      ORDER BY ts_s, event_id)) AS dv
      |  FROM b),
      |d AS (
      |  SELECT *, dt - lag(dt) OVER (PARTITION BY name, user_id
      |                               ORDER BY ts_s, event_id) AS dod
      |  FROM l),
      |c AS (
      |  SELECT name, user_id,
      |         CASE WHEN dod IS NULL THEN 0
      |              WHEN dod = 0 THEN 1
      |              WHEN dod BETWEEN -63 AND 64 THEN 9
      |              WHEN dod BETWEEN -255 AND 256 THEN 12
      |              WHEN dod BETWEEN -2047 AND 2048 THEN 16
      |              ELSE 36 END AS ts_bits,
      |         CASE WHEN dv IS NULL THEN 0
      |              WHEN dv = 0 THEN 1
      |              ELSE 13 + length(bin(dv)) END AS val_bits,
      |         dod, dv
      |  FROM d)
      |SELECT name, user_id, COUNT(*) AS n_samples,
      |       CAST(SUM(CASE WHEN dod = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS dod_zero,
      |       CAST(SUM(CASE WHEN dv = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS repeats,
      |       CAST(SUM(ts_bits) AS BIGINT) AS ts_bits,
      |       CAST(SUM(val_bits) AS BIGINT) AS val_bits,
      |       (CAST(SUM(ts_bits) AS BIGINT) + CAST(SUM(val_bits) AS BIGINT))
      |         * 100 // (COUNT(*) - 2) AS bits_per_sample_x100
      |FROM c GROUP BY name, user_id
      |HAVING COUNT(*) >= 3""".stripMargin

  /** q_autocorr — lag-1 autocorrelation per series (the seasonality /
    * stuck-gauge detector behind anomaly dashboards: corr ≈ 1 means a
    * smooth series, ≈ 0 white noise, < 0 oscillation). Pearson r over
    * (xₜ, xₜ₋₁) pairs computed ENGINE-EXACTLY: every sum in
    * r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is integer-cents
    * arithmetic (order-independent), floating point only at the final
    * √ and division with identical operands on both sides; emitted as
    * round(r·10⁶). Zero-variance series (the stuck gauge itself) emit
    * NULL via the nullif'd denominator. One corpus shuffle on the
    * series key, lag + aggregation on the same partitioning;
    * |series|-bounded output. Long-overflow bounds: the variance
    * PRODUCT is computed in double (each factor < 2^53 stays exactly
    * representable — the long product would overflow at ~1e22); the
    * per-term bound n·Σx² then needs n < ~10⁶ samples/series at
    * 2-decimal cents — beyond that, bucket the window (q_changes'
    * w_start device) or widen to decimal.
    */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id")
      .orderBy("ts_us", "event_id")
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("x"))
      .withColumn("y", lag("x", 1).over(w))
      .filter(col("y").isNotNull)
      .groupBy("name", "user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("name"), col("user_id"), col("n_pairs"),
        round(
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            // each variance term is < 2^53 (exactly representable), so
            // casting BEFORE the product keeps both engines identical
            // while the long×long product would overflow (~1e22)
            sqrt(nullif(
              (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy"))
                  .cast("double"), lit(0.0))) * 1000000d)
          .cast("long").as("corr_x1e6"))
  }

  val autocorrSql: String =
    """WITH p AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(round(value*100) AS BIGINT) AS x,
      |         lag(CAST(round(value*100) AS BIGINT)) OVER
      |           (PARTITION BY event_type, user_id
      |            ORDER BY epoch_us(ts), event_id) AS y
      |  FROM events),
      |a AS (
      |  SELECT name, user_id, COUNT(*) AS n_pairs,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(x*y) AS BIGINT) AS sxy,
      |         CAST(SUM(x*x) AS BIGINT) AS sxx,
      |         CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM p WHERE y IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT name, user_id, n_pairs,
      |       CAST(round(CAST(n_pairs*sxy - sx*sy AS DOUBLE)
      |         / sqrt(nullif(CAST(n_pairs*sxx - sx*sx AS DOUBLE)
      |                 * CAST(n_pairs*syy - sy*sy AS DOUBLE), 0.0))
      |         * 1000000) AS BIGINT) AS corr_x1e6
      |FROM a""".stripMargin

  val timeFuncsSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, ts_us,
       |  CAST(date_part('minute', t) AS BIGINT) AS minute_utc,
       |  CAST(date_part('hour', t) AS BIGINT) AS hour_utc,
       |  CAST(date_part('dow', t) AS BIGINT) AS day_of_week,
       |  CAST(date_part('day', t) AS BIGINT) AS day_of_month,
       |  CAST(date_part('doy', t) AS BIGINT) AS day_of_year,
       |  CAST(date_part('month', t) AS BIGINT) AS month_utc,
       |  CAST(date_part('year', t) AS BIGINT) AS year_utc,
       |  CAST(date_part('day', last_day(t)) AS BIGINT) AS days_in_month
       |FROM (SELECT *, make_timestamp((ts_us // 1000000) * 1000000) AS t
       |      FROM iv)""".stripMargin

  /** q_trig_funcs — the PromQL trig family (`sin` `cos` `atan`) plus
    * the unit helpers (`deg` `rad` `pi`), closing the public PromQL
    * function table (ref README: the query surface the ETL feeds;
    * functions are Prometheus's own). Each sample's value (cents/10⁴)
    * is treated as radians. libm treatment is q_math_funcs' rule:
    * Java's StrictMath-adjacent sin/cos/atan and DuckDB's libm agree
    * within 1 ulp, so outputs are rounded ×1000 — far past the
    * divergence. deg/rad/pi are exact formula arithmetic on identical
    * operands. Codegen'd projection on the shared [[instantVec]];
    * corpus cost is the pushed lookback scan.
    */
  def qTrigFuncs(spark: SparkSession, dir: String): DataFrame = {
    val theta = col("cents").cast("double") / 10000d
    instantVec(spark, dir).select(col("name"), col("user_id"), col("cents"),
      round(sin(theta) * 1000d).cast("long").as("sin_x1000"),
      round(cos(theta) * 1000d).cast("long").as("cos_x1000"),
      round(atan(theta) * 1000d).cast("long").as("atan_x1000"),
      round(degrees(theta) * 1000d).cast("long").as("deg_x1000"),
      round(radians(col("cents").cast("double") / 100d) * 1000d)
        .cast("long").as("rad_x1000"),
      round(lit(math.Pi) * 1000d).cast("long").as("pi_x1000"))
  }

  val trigFuncsSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |  CAST(round(sin(CAST(cents AS DOUBLE) / 10000) * 1000) AS BIGINT) AS sin_x1000,
       |  CAST(round(cos(CAST(cents AS DOUBLE) / 10000) * 1000) AS BIGINT) AS cos_x1000,
       |  CAST(round(atan(CAST(cents AS DOUBLE) / 10000) * 1000) AS BIGINT) AS atan_x1000,
       |  CAST(round(degrees(CAST(cents AS DOUBLE) / 10000) * 1000) AS BIGINT) AS deg_x1000,
       |  CAST(round(radians(CAST(cents AS DOUBLE) / 100) * 1000) AS BIGINT) AS rad_x1000,
       |  CAST(round(pi() * 1000) AS BIGINT) AS pi_x1000
       |FROM iv""".stripMargin

  /** q_trig_funcs2 — the REST of Prometheus's trig table (`tan` `asin`
    * `acos` `atan2` `sinh` `cosh` `tanh` `asinh` `acosh` `atanh`) plus
    * `log10`, completing the public PromQL function surface together
    * with [[qTrigFuncs]] and [[qMathFuncs]]. Domain handling: asin/acos
    * take tanh(θ) (always in (−1,1), and NOT an inverse identity —
    * asin(sin θ)=θ lands EXACTLY on the ×1000 rounding grid, a
    * half-boundary both engines round differently; tanh's irrational
    * values never do); acosh takes 1+θ (≥1); atanh takes θ/10 (<0.5). DuckDB has no hyperbolic builtins, so the oracle uses
    * the exact exponential/log identities (sinh=(eˣ−e⁻ˣ)/2, asinh =
    * ln(x+√(x²+1)), …) — a different float path than Java's
    * StrictMath-adjacent builtins, but within a few ulp, which the
    * ×1000 rounding absorbs (q_math_funcs' rule; amplification at the
    * asin/atanh domain edges stays ≤1e-8 at this value range).
    */
  def qTrigFuncs2(spark: SparkSession, dir: String): DataFrame = {
    val theta = col("cents").cast("double") / 10000d
    instantVec(spark, dir).select(col("name"), col("user_id"), col("cents"),
      round(tan(theta) * 1000d).cast("long").as("tan_x1000"),
      round(asin(tanh(theta)) * 1000d).cast("long").as("asin_x1000"),
      round(acos(tanh(theta)) * 1000d).cast("long").as("acos_x1000"),
      round(atan2(col("cents").cast("double"), lit(5000d)) * 1000d)
        .cast("long").as("atan2_x1000"),
      round(sinh(theta) * 1000d).cast("long").as("sinh_x1000"),
      round(cosh(theta) * 1000d).cast("long").as("cosh_x1000"),
      round(tanh(theta) * 1000d).cast("long").as("tanh_x1000"),
      round(asinh(theta) * 1000d).cast("long").as("asinh_x1000"),
      round(acosh(theta + 1d) * 1000d).cast("long").as("acosh_x1000"),
      round(atanh(theta / 10d) * 1000d).cast("long").as("atanh_x1000"),
      round(log10(greatest(col("cents"), lit(1L))) * 1000d)
        .cast("long").as("log10_x1000"))
  }

  val trigFuncs2Sql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |  CAST(round(tan(t) * 1000) AS BIGINT) AS tan_x1000,
       |  CAST(round(asin(th) * 1000) AS BIGINT) AS asin_x1000,
       |  CAST(round(acos(th) * 1000) AS BIGINT) AS acos_x1000,
       |  CAST(round(atan2(CAST(cents AS DOUBLE), 5000.0) * 1000) AS BIGINT) AS atan2_x1000,
       |  CAST(round((exp(t) - exp(-t)) / 2 * 1000) AS BIGINT) AS sinh_x1000,
       |  CAST(round((exp(t) + exp(-t)) / 2 * 1000) AS BIGINT) AS cosh_x1000,
       |  CAST(round((exp(t) - exp(-t)) / (exp(t) + exp(-t)) * 1000) AS BIGINT) AS tanh_x1000,
       |  CAST(round(ln(t + sqrt(t*t + 1)) * 1000) AS BIGINT) AS asinh_x1000,
       |  CAST(round(ln((t+1) + sqrt((t+1)*(t+1) - 1)) * 1000) AS BIGINT) AS acosh_x1000,
       |  CAST(round(0.5 * ln((1 + t/10) / (1 - t/10)) * 1000) AS BIGINT) AS atanh_x1000,
       |  CAST(round(log10(greatest(cents, 1)) * 1000) AS BIGINT) AS log10_x1000
       |FROM (SELECT *, CAST(cents AS DOUBLE) / 10000 AS t,
       |             (exp(CAST(cents AS DOUBLE) / 10000) - exp(-(CAST(cents AS DOUBLE) / 10000)))
       |             / (exp(CAST(cents AS DOUBLE) / 10000) + exp(-(CAST(cents AS DOUBLE) / 10000))) AS th
       |      FROM iv)""".stripMargin

  /** q_promql_round — PromQL `round(v, to)`: each sample value rounded
    * to the nearest multiple of `to`, ties away from zero upward
    * (Prometheus: floor(v/to + 0.5)·to). Three `to` granularities
    * (0.01, 0.5, 1.0 value units) in one pass. ALL-INTEGER: with
    * nonneg cents and to-in-cents T, floor(v/T + 0.5)·T =
    * ((2·cents + T) div (2·T))·T — exact in both engines, no float
    * rounding boundary exists. Projection on the shared
    * [[instantVec]].
    */
  def qPromqlRound(spark: SparkSession, dir: String): DataFrame = {
    def roundTo(t: Long) =
      expr(s"((2 * cents + $t) div (2 * $t)) * $t")
    instantVec(spark, dir).select(col("name"), col("user_id"), col("cents"),
      roundTo(1L).as("round_c1"),
      roundTo(50L).as("round_c50"),
      roundTo(100L).as("round_c100"))
  }

  val promqlRoundSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |  (2 * cents + 1) // 2 * 1 AS round_c1,
       |  (2 * cents + 50) // 100 * 50 AS round_c50,
       |  (2 * cents + 100) // 200 * 100 AS round_c100
       |FROM iv""".stripMargin

  /** q_sort_by_label — PromQL `sort_by_label(v, "name", "user_id")` /
    * `sort_by_label_desc`: the instant vector ranked by LABEL values
    * (vs [[qPromqlSort]]'s value order). Same one-global-sort device:
    * the desc rank is derived from the asc rank, and the sorted frame
    * is the |series|-bounded vector, never the corpus.
    */
  def qSortByLabel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("name").asc, col("user_id").asc)
    instantVec(spark, dir)
      .select(col("name"), col("user_id"), col("cents"))
      .withColumn("rank_asc", row_number().over(w).cast("long"))
      .withColumn("rank_desc",
        count(lit(1)).over(Window.partitionBy()) - col("rank_asc") + 1L)
  }

  val sortByLabelSql: String =
    s"""$instantVecCte
       |SELECT name, user_id, cents,
       |       row_number() OVER (ORDER BY name, user_id) AS rank_asc,
       |       COUNT(*) OVER ()
       |         - row_number() OVER (ORDER BY name, user_id) + 1 AS rank_desc
       |FROM iv""".stripMargin

  /** q_group_agg — the PromQL `group` aggregator: `group by (name) (v)`
    * emits value 1 for every group with at least one element — the
    * "which label combinations exist" primitive behind membership
    * panels (count would over-inform; group is the boolean). n_series
    * rides along for free off the same map-side-combinable shuffle;
    * output is label-cardinality-bounded.
    */
  def qGroupAgg(spark: SparkSession, dir: String): DataFrame =
    instantVec(spark, dir)
      .groupBy("name")
      .agg(lit(1L).as("group_value"), count(lit(1)).as("n_series"))
      .select(col("name"), col("group_value"), col("n_series"))

  val groupAggSql: String =
    s"""$instantVecCte
       |SELECT name, CAST(1 AS BIGINT) AS group_value, COUNT(*) AS n_series
       |FROM iv GROUP BY name""".stripMargin

  /** q_downsample — the long-term-retention ROLLUP block (what Thanos
    * compact / Mimir's downsampler write for >2w-old data, and what a
    * Prometheus→ClickHouse ETL materializes so 100 TB of raw samples can
    * age out): per series per aligned 5m window, the five aggregates
    * every rollup consumer needs — count/sum/min/max plus FIRST and
    * LAST sample values (rate() over rollups reads first/last; avg =
    * sum/count). All exact integer cents. Scale shape: the
    * first/last window and the groupBy share the same (series, window)
    * partitioning, so Catalyst plans ONE exchange — a single shuffle of
    * narrow rows per corpus pass, map-side-combinable in the agg; the
    * window order (ts_us, event_id) is TOTAL (event_id unique), so
    * first/last are deterministic in both engines.
    */
  def qDownsample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id", "w_start")
      .orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w_start"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("first_c", first("cents").over(w))
      .withColumn("last_c", last("cents").over(w))
      .groupBy("name", "user_id", "w_start")
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_cents"),
        min("cents").as("min_cents"),
        max("cents").as("max_cents"),
        max("first_c").as("first_cents"),
        max("last_c").as("last_cents"))
  }

  val downsampleSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts) AS ts_us,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |f AS (
      |  SELECT *,
      |         first_value(cents) OVER wd AS first_c,
      |         last_value(cents) OVER wd AS last_c
      |  FROM s
      |  WINDOW wd AS (PARTITION BY name, user_id, w_start
      |                ORDER BY ts_us, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING
      |                         AND UNBOUNDED FOLLOWING))
      |SELECT name, user_id, w_start, COUNT(*) AS n,
      |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |       MIN(cents) AS min_cents, MAX(cents) AS max_cents,
      |       MAX(first_c) AS first_cents, MAX(last_c) AS last_cents
      |FROM f GROUP BY name, user_id, w_start""".stripMargin

  /** Pin timestamp for [[qAtModifier]] — 6h before [[EvalTsUs]], a
    * plan-time constant like the eval timestamp itself. */
  private val PinTsUs = EvalTsUs - 21600L * 1000000L

  /** q_at_modifier — PromQL's `@` timestamp pinning: `m @ <t>` evaluates
    * the selector at a FIXED timestamp regardless of the query's eval
    * time (the device behind "compare now against exactly 6h ago"
    * dashboards, sharper than `offset` because the pin survives range
    * re-evaluation). Both arms are instant-vector evaluations (last
    * sample within the 24h lookback, ties broken by event_id like
    * [[instantVec]]) full-outer-joined on the series key: series born
    * since the pin carry has_pin=0, series dead since carry has_now=0,
    * drift is the exact cents delta. Scale: each arm's constant
    * lookback filter pushes to the parquet scan and collapses to
    * |series| rows before the join — the join is series-sized, never
    * corpus-sized.
    */
  def qAtModifier(spark: SparkSession, dir: String): DataFrame = {
    def arm(evalTs: Long, valName: String): DataFrame = {
      val w = Window.partitionBy("name", "user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.eventsSlice(spark, dir, evalTs - 86400000000L, evalTs)
        .select(col("event_type").as("name"), col("user_id"),
          col("event_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("name"), col("user_id"), col("cents").as(valName))
    }
    arm(PinTsUs, "pin_c").join(arm(EvalTsUs, "now_c"),
        Seq("name", "user_id"), "full_outer")
      .select(col("name"), col("user_id"),
        col("pin_c").isNotNull.cast("int").as("has_pin"),
        col("now_c").isNotNull.cast("int").as("has_now"),
        coalesce(col("pin_c"), lit(0L)).as("pin_cents"),
        coalesce(col("now_c"), lit(0L)).as("now_cents"),
        (coalesce(col("now_c"), lit(0L)) - coalesce(col("pin_c"), lit(0L)))
          .as("drift_cents"))
  }

  val atModifierSql: String = {
    def armCte(evalTs: Long): String =
      s"""SELECT name, user_id, cents FROM (
         |  SELECT event_type AS name, user_id, event_id,
         |         CAST(round(value*100) AS BIGINT) AS cents,
         |         row_number() OVER (PARTITION BY event_type, user_id
         |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
         |  FROM events
         |  WHERE epoch_us(ts) > $evalTs - 86400000000
         |    AND epoch_us(ts) <= $evalTs) WHERE rn = 1""".stripMargin
    s"""WITH pin AS (${armCte(PinTsUs)}),
       |now_ AS (${armCte(EvalTsUs)})
       |SELECT coalesce(pin.name, now_.name) AS name,
       |       coalesce(pin.user_id, now_.user_id) AS user_id,
       |       CAST(pin.cents IS NOT NULL AS INT) AS has_pin,
       |       CAST(now_.cents IS NOT NULL AS INT) AS has_now,
       |       coalesce(pin.cents, 0) AS pin_cents,
       |       coalesce(now_.cents, 0) AS now_cents,
       |       coalesce(now_.cents, 0) - coalesce(pin.cents, 0) AS drift_cents
       |FROM pin FULL OUTER JOIN now_
       |  ON pin.name = now_.name AND pin.user_id = now_.user_id""".stripMargin
  }

  /** q_slo_burn — multiwindow error-budget BURN RATE (the SRE-workbook
    * alerting shape that replaced threshold alerts): per user cohort,
    * the error-event ratio over the trailing 1d and 3d windows ending at
    * the eval timestamp, expressed as a burn multiple of a 99%-SLO
    * budget (burn 1.0 = consuming exactly budget; the page rule demands
    * BOTH windows hot so a short spike alone cannot page). ALL-INTEGER:
    * ratios are truncating ppm, burn ×1000 = ppm div 10 (budget =
    * 10⁴ ppm), guards keep degenerate cohorts engine-identical. Scale:
    * one 3d-sliced scan (filter pushed to parquet) collapsing to
    * |cohorts| rows via conditional aggregation — no second pass for
    * the shorter window.
    */
  def qSloBurn(spark: SparkSession, dir: String): DataFrame = {
    val d1 = 86400000000L
    Tables.eventsSlice(spark, dir, EvalTsUs - 3 * d1, EvalTsUs)
      .select((col("user_id") % 4).as("cohort"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .groupBy("cohort")
      .agg(
        sum(when(col("ts_us") > EvalTsUs - d1, 1L).otherwise(0L)).as("n_1d"),
        sum(when(col("ts_us") > EvalTsUs - d1 &&
          col("event_type") === "error", 1L).otherwise(0L)).as("err_1d"),
        count(lit(1)).as("n_3d"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("err_3d"))
      .withColumn("burn_1d_x1000",
        expr("(err_1d * 1000000 div greatest(n_1d, 1)) div 10"))
      .withColumn("burn_3d_x1000",
        expr("(err_3d * 1000000 div greatest(n_3d, 1)) div 10"))
      .withColumn("page",
        (col("burn_1d_x1000") >= 2000 && col("burn_3d_x1000") >= 1000)
          .cast("int"))
  }

  val sloBurnSql: String =
    s"""WITH s AS (
       |  SELECT user_id % 4 AS cohort, event_type, epoch_us(ts) AS ts_us
       |  FROM events
       |  WHERE epoch_us(ts) > $EvalTsUs - 3 * 86400000000
       |    AND epoch_us(ts) <= $EvalTsUs),
       |a AS (
       |  SELECT cohort,
       |    CAST(SUM(CASE WHEN ts_us > $EvalTsUs - 86400000000
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
       |    CAST(SUM(CASE WHEN ts_us > $EvalTsUs - 86400000000
       |                   AND event_type = 'error'
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS err_1d,
       |    COUNT(*) AS n_3d,
       |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |         AS BIGINT) AS err_3d
       |  FROM s GROUP BY cohort)
       |SELECT cohort, n_1d, err_1d, n_3d, err_3d,
       |       (err_1d * 1000000 // greatest(n_1d, 1)) // 10
       |         AS burn_1d_x1000,
       |       (err_3d * 1000000 // greatest(n_3d, 1)) // 10
       |         AS burn_3d_x1000,
       |       CAST((err_1d * 1000000 // greatest(n_1d, 1)) // 10 >= 2000
       |        AND (err_3d * 1000000 // greatest(n_3d, 1)) // 10 >= 1000
       |            AS INT) AS page
       |FROM a""".stripMargin

  /** q_alert_for — Prometheus ALERTING-RULE evaluation with a `for:`
    * duration, the last missing piece of the rule-engine surface (the
    * recording-rule side is q_sum_rate / streamingSumRate): the rule
    * `m > 50 FOR 20m` evaluated at every 10m step over the full range,
    * emitting the ALERTS-series view — one row per (series, eval step)
    * where the condition holds, labeled `pending` until the condition
    * has held for ≥ 2 CONSECUTIVE evaluations and `firing` after, plus
    * `active_since_s` (Prometheus's `activeAt`: the first eval of the
    * current uninterrupted true-run). A missed eval (staleness gap in
    * the 30m lookback) RESETS the run, exactly like a real rule
    * evaluator; inactive steps emit nothing, like the ALERTS metric.
    *
    * Shape: the q_range_eval constant-width explode (each sample → its
    * 3 step-floored lookback members) gives the instant vector at every
    * step as rn=1 of a (series, step)-partitioned order — no grid join,
    * no per-step re-scan; the for-duration is then gaps-and-islands on
    * the TRUE evals (island = step − row_number over the series — two
    * window passes on one series-keyed shuffle). Work ∝ 3n rows end to
    * end; nothing is corpus-bounded but the output, which is the alert
    * stream itself.
    */
  def qAlertFor(spark: SparkSession, dir: String): DataFrame = {
    val stepS = 600L
    val lookSteps = 3 // 30m instant-vector lookback, step-floored
    val forSteps = 2 // for: 20m at 10m resolution
    val thCents = 5000L // rule: m > 50
    val evals = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("sample_step", expr(s"ts_us div ${stepS * 1000000L}"))
      .select(col("name"), col("user_id"), col("ts_us"), col("event_id"),
        col("cents"),
        explode(sequence(col("sample_step"),
          col("sample_step") + (lookSteps - 1))).as("eval_step"))
    val wLast = Window.partitionBy("name", "user_id", "eval_step")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val instant = evals
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("name"), col("user_id"), col("eval_step"), col("cents"))
    val wSeries = Window.partitionBy("name", "user_id").orderBy("eval_step")
    val runs = instant.filter(col("cents") > thCents)
      .withColumn("island", col("eval_step") - row_number().over(wSeries))
    val wIsland =
      Window.partitionBy("name", "user_id", "island").orderBy("eval_step")
    val wIslandAll = Window.partitionBy("name", "user_id", "island")
    runs
      .withColumn("held", row_number().over(wIsland))
      .withColumn("active_since_s",
        min("eval_step").over(wIslandAll) * stepS)
      .select(col("name"), col("user_id"),
        (col("eval_step") * stepS).as("eval_ts_s"),
        col("cents").as("value_cents"),
        when(col("held") >= forSteps, lit("firing"))
          .otherwise(lit("pending")).as("state"),
        col("active_since_s"))
  }

  val alertForSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         epoch_us(ts) // 600000000 AS sample_step
      |  FROM events),
      |e AS (
      |  SELECT name, user_id, ts_us, event_id, cents,
      |         unnest(generate_series(sample_step, sample_step + 2))
      |           AS eval_step
      |  FROM s),
      |iv AS (
      |  SELECT name, user_id, eval_step, cents FROM (
      |    SELECT *, row_number() OVER (PARTITION BY name, user_id, eval_step
      |               ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
      |  WHERE rn = 1),
      |tr AS (
      |  SELECT *, eval_step - row_number() OVER (PARTITION BY name, user_id
      |             ORDER BY eval_step) AS island
      |  FROM iv WHERE cents > 5000)
      |SELECT name, user_id, eval_step * 600 AS eval_ts_s,
      |       cents AS value_cents,
      |       CASE WHEN row_number() OVER (PARTITION BY name, user_id, island
      |              ORDER BY eval_step) >= 2
      |            THEN 'firing' ELSE 'pending' END AS state,
      |       min(eval_step) OVER (PARTITION BY name, user_id, island) * 600
      |         AS active_since_s
      |FROM tr""".stripMargin

  /** q_gap_fill — aligned-grid gap filling over a watch-listed series
    * set (ClickHouse `WITH FILL` / TimescaleDB `time_bucket_gapfill`,
    * and the resampling step before any classic time-series model):
    * a 13-point 5m grid over the hour before [[EvalTsUs]], each point
    * carrying (a) the staleness-aware forward fill — last sample within
    * 10m, Prometheus's lookback rule — and (b) the linear interpolation
    * between the surrounding samples. ONE window pass, no join: samples
    * and grid points union into one frame per series and neighbors come
    * from ignore-nulls last/first over the (ts, is_grid, event_id)
    * total order (a sample AT a grid timestamp sorts before it, so the
    * lookback is inclusive). Grid dims are CONSTANTS (a 5-name
    * watch-list × a constant user-id cap × 13 steps — the
    * q_absent_over_time rule: never grid over data-derived dims); the
    * context slice pushes to
    * the parquet scan. Interpolation is double math with identical
    * operands and association both engines, rounded at 6 (the q_rate
    * device); span ≥ 1 µs by the sort order, so no division guard is
    * needed.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val step = 300L * 1000000L
    val hour = 3600L * 1000000L
    val gridStart = EvalTsUs - hour
    val samples = Tables.eventsSlice(spark, dir, gridStart - hour,
        EvalTsUs + hour)
      .filter(col("event_type").isin("click", "purchase", "view",
          "signup", "error") && col("user_id") < 100)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), lit(0).as("is_grid"),
        col("event_id").as("ev"),
        round(col("value") * 100).cast("long").as("cents"))
    val grid = samples.select("name", "user_id").distinct()
      .select(col("name"), col("user_id"),
        explode(sequence(lit(gridStart), lit(EvalTsUs), lit(step)))
          .as("ts_us"),
        lit(1).as("is_grid"), lit(0L).as("ev"),
        lit(null).cast("long").as("cents"))
    val ord = Window.partitionBy("name", "user_id")
      .orderBy("ts_us", "is_grid", "ev")
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    samples.unionByName(grid)
      .withColumn("prev_c", last("cents", ignoreNulls = true).over(wPrev))
      .withColumn("prev_t", last(when(col("is_grid") === 0, col("ts_us")),
        ignoreNulls = true).over(wPrev))
      .withColumn("next_c", first("cents", ignoreNulls = true).over(wNext))
      .withColumn("next_t", first(when(col("is_grid") === 0, col("ts_us")),
        ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .withColumn("filled",
        (col("prev_t").isNotNull &&
          col("ts_us") - col("prev_t") <= 600L * 1000000L).cast("int"))
      .withColumn("ffill_cents",
        when(col("filled") === 1, col("prev_c")).otherwise(lit(0L)))
      .withColumn("has_interp",
        (col("prev_t").isNotNull && col("next_t").isNotNull).cast("int"))
      .withColumn("interp_val",
        when(col("has_interp") === 1,
          round(col("prev_c") + (col("next_c") - col("prev_c")) *
            ((col("ts_us") - col("prev_t")).cast("double") /
              (col("next_t") - col("prev_t"))), 6))
          .otherwise(lit(0.0d)))
      .select(expr("ts_us div 1000000").as("ts_s"), col("name"),
        col("user_id"), col("filled"), col("ffill_cents"),
        col("has_interp"), col("interp_val"))
  }

  val gapFillSql: String = {
    val step = 300L * 1000000L
    val hour = 3600L * 1000000L
    val gridStart = EvalTsUs - hour
    s"""WITH sm AS (
       |  SELECT event_type AS name, user_id, epoch_us(ts) AS ts_us,
       |         0 AS is_grid, event_id AS ev,
       |         CAST(round(value*100) AS BIGINT) AS cents
       |  FROM events
       |  WHERE epoch_us(ts) > ${gridStart - hour}
       |    AND epoch_us(ts) <= ${EvalTsUs + hour}
       |    AND event_type IN ('click', 'purchase', 'view', 'signup',
       |                       'error')
       |    AND user_id < 100),
       |sr AS (SELECT DISTINCT name, user_id FROM sm),
       |g AS (
       |  SELECT sr.name, sr.user_id, gs.ts_us, 1 AS is_grid,
       |         CAST(0 AS BIGINT) AS ev, CAST(NULL AS BIGINT) AS cents
       |  FROM sr, (SELECT unnest(generate_series($gridStart, $EvalTsUs,
       |                                          $step)) AS ts_us) gs),
       |u AS (SELECT * FROM sm UNION ALL SELECT * FROM g),
       |f AS (
       |  SELECT *,
       |    last_value(cents IGNORE NULLS) OVER wp AS prev_c,
       |    last_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS)
       |      OVER wp AS prev_t,
       |    first_value(cents IGNORE NULLS) OVER wn AS next_c,
       |    first_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS)
       |      OVER wn AS next_t
       |  FROM u
       |  WINDOW wp AS (PARTITION BY name, user_id
       |                ORDER BY ts_us, is_grid, ev
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wn AS (PARTITION BY name, user_id
       |                ORDER BY ts_us, is_grid, ev
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT ts_us // 1000000 AS ts_s, name, user_id,
       |       CAST(prev_t IS NOT NULL
       |            AND ts_us - prev_t <= 600000000 AS INT) AS filled,
       |       CASE WHEN prev_t IS NOT NULL AND ts_us - prev_t <= 600000000
       |            THEN prev_c ELSE 0 END AS ffill_cents,
       |       CAST(prev_t IS NOT NULL AND next_t IS NOT NULL AS INT)
       |         AS has_interp,
       |       CASE WHEN prev_t IS NOT NULL AND next_t IS NOT NULL
       |            THEN round(prev_c + (next_c - prev_c) *
       |                   (CAST(ts_us - prev_t AS DOUBLE)
       |                      / (next_t - prev_t)), 6)
       |            ELSE 0.0 END AS interp_val
       |FROM f WHERE is_grid = 1""".stripMargin
  }

  /** q_anomaly_zscore — rolling z-score anomaly detection per series
    * (the simplest real alerting baseline after static thresholds: is
    * this sample > 2σ from its own trailing window?). The window is the
    * 6 PRECEDING samples (never the current one — an anomaly must not
    * shift its own baseline), ordered (ts, event_id) on one series
    * shuffle. The flag is an ALL-INTEGER inequality: with μ = s1/n and
    * σ² = (n·s2 − s1²)/n², the test z² > 4 rewrites to
    * (c·n − s1)² > 4·(n·s2 − s1²) — no division, no sqrt, no
    * cross-engine float hazard; the emitted magnitude is the exact
    * integer (c·n − s1)²·100 div (n·s2 − s1²) (z² ×100). Windows with
    * fewer than 5 priors or zero variance never flag (a constant
    * series' first deviation is a schema change, not a z-score — the
    * σ=0 case has no finite z). Output is the anomaly stream itself —
    * data-sized only in the rows it flags, like q_alert_for.
    */
  def qAnomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id")
      .orderBy("ts_us", "event_id").rowsBetween(-6, -1)
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum("cents").over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("cents") * col("cents")).over(w),
        lit(0L)))
      .withColumn("num", (col("cents") * col("n") - col("s1"))
        * (col("cents") * col("n") - col("s1")))
      .withColumn("den", col("n") * col("s2") - col("s1") * col("s1"))
      .filter(col("n") >= 5 && col("den") > 0 && col("num") > col("den") * 4)
      .select(col("name"), col("user_id"), col("ts_us"), col("cents"),
        expr("num * 100 div den").as("z2_x100"))
  }

  val anomalyZscoreSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT name, user_id, ts_us, cents,
      |         COUNT(*) OVER w AS n,
      |         CAST(coalesce(SUM(cents) OVER w, 0) AS BIGINT) AS s1,
      |         CAST(coalesce(SUM(cents*cents) OVER w, 0) AS BIGINT) AS s2
      |  FROM s
      |  WINDOW w AS (PARTITION BY name, user_id ORDER BY ts_us, event_id
      |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT *, (cents*n - s1)*(cents*n - s1) AS num,
      |         n*s2 - s1*s1 AS den
      |  FROM r)
      |SELECT name, user_id, ts_us, cents, num * 100 // den AS z2_x100
      |FROM z WHERE n >= 5 AND den > 0 AND num > den * 4""".stripMargin

  /** q_seasonal_baseline — hour-of-day seasonal profile vs the most
    * recent day (the "is today weird for this hour?" dashboard):
    * baseline = per (metric, hour-of-day) mean over every day BEFORE
    * the last, compared with the last day's same-hour mean. The last
    * day is a scalar aggregate (one number crossing the plan, not a
    * data-derived set), the two sides are conditional sums on ONE
    * map-side-combinable groupBy over one scan, and the comparison is
    * all-integer: means as cents·10⁶ div n, ratio as ppm with the
    * established greatest(·,1) degenerate guard. Output is
    * names × 24 — constant-bounded.
    */
  def qSeasonalBaseline(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        round(col("value") * 100).cast("long").as("cents"))
    val lastDay = e.agg(max("day")).head().getLong(0)
    e.groupBy("name", "hod")
      .agg(
        sum(when(col("day") < lastDay, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("day") < lastDay, col("cents")).otherwise(0L)).as("c_base"),
        sum(when(col("day") === lastDay, 1L).otherwise(0L)).as("n_last"),
        sum(when(col("day") === lastDay, col("cents")).otherwise(0L)).as("c_last"))
      .filter(col("n_base") > 0 && col("n_last") > 0)
      .select(col("name"), col("hod"), col("n_base"), col("n_last"),
        expr("c_base * 1000000 div n_base").as("base_avg_x1e6"),
        expr("c_last * 1000000 div n_last").as("last_avg_x1e6"))
      // ratio from the VALUE-bounded averages, not the count-bounded
      // sums: c_last·n_base·10⁶ overflows int64 once both counts pass
      // ~10⁶·10⁴ (a real month of data); avg_x1e6 ≤ 10¹⁰ regardless of
      // corpus size, so avg·10⁶ never does
      .withColumn("ratio_ppm",
        expr("last_avg_x1e6 * 1000000 div greatest(base_avg_x1e6, 1)"))
  }

  val seasonalBaselineSql: String =
    """WITH s AS (
      |  SELECT event_type AS name,
      |         epoch_us(ts) // 86400000000 AS day,
      |         (epoch_us(ts) // 3600000000) % 24 AS hod,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |m AS (SELECT max(day) AS last_day FROM s),
      |g AS (
      |  SELECT name, hod,
      |         CAST(SUM(CASE WHEN day < (SELECT last_day FROM m)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |         CAST(SUM(CASE WHEN day < (SELECT last_day FROM m)
      |                       THEN cents ELSE 0 END) AS BIGINT) AS c_base,
      |         CAST(SUM(CASE WHEN day = (SELECT last_day FROM m)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
      |         CAST(SUM(CASE WHEN day = (SELECT last_day FROM m)
      |                       THEN cents ELSE 0 END) AS BIGINT) AS c_last
      |  FROM s GROUP BY 1, 2),
      |a AS (
      |  SELECT name, hod, n_base, n_last,
      |         c_base * 1000000 // n_base AS base_avg_x1e6,
      |         c_last * 1000000 // n_last AS last_avg_x1e6
      |  FROM g WHERE n_base > 0 AND n_last > 0)
      |SELECT name, hod, n_base, n_last, base_avg_x1e6, last_avg_x1e6,
      |       last_avg_x1e6 * 1000000 // greatest(base_avg_x1e6, 1)
      |         AS ratio_ppm
      |FROM a""".stripMargin

  /** q_topk_movers — the "biggest movers" triage panel: the 5 series
    * whose 24h volume changed most (|Δ|) between the day before
    * [[EvalTsUs]] and the day before that. Both windows come off ONE
    * sliced scan (the 48h predicate pushes to parquet row groups via
    * [[Tables.eventsSlice]]) as conditional sums on one series-keyed
    * groupBy; the global top-5 is orderBy+limit — Spark's
    * TakeOrderedAndProject, a per-partition bounded heap + driver
    * merge of 5-row partials, never a global sort. Ties break
    * (|Δ| desc, name, user_id) so the cut is deterministic. A series
    * active in only one window shows 0 in the other — absence IS the
    * move, so no join and no null handling.
    */
  def qTopkMovers(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400L * 1000000L
    val cut = EvalTsUs - day
    Tables.eventsSlice(spark, dir, EvalTsUs - 2 * day - 1, EvalTsUs - 1)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id")
      .agg(sum(when(col("ts_us") >= cut, col("cents")).otherwise(0L))
          .as("curr_cents"),
        sum(when(col("ts_us") < cut, col("cents")).otherwise(0L))
          .as("prev_cents"))
      .withColumn("delta_cents", col("curr_cents") - col("prev_cents"))
      .orderBy(abs(col("delta_cents")).desc, col("name"), col("user_id"))
      .limit(5)
  }

  val topkMoversSql: String = {
    val day = 86400L * 1000000L
    val cut = EvalTsUs - day
    s"""WITH s AS (
       |  SELECT event_type AS name, user_id, epoch_us(ts) AS ts_us,
       |         CAST(round(value*100) AS BIGINT) AS cents
       |  FROM events
       |  WHERE epoch_us(ts) > ${EvalTsUs - 2 * day - 1}
       |    AND epoch_us(ts) <= ${EvalTsUs - 1}),
       |g AS (
       |  SELECT name, user_id,
       |         CAST(SUM(CASE WHEN ts_us >= $cut THEN cents ELSE 0 END)
       |              AS BIGINT) AS curr_cents,
       |         CAST(SUM(CASE WHEN ts_us < $cut THEN cents ELSE 0 END)
       |              AS BIGINT) AS prev_cents
       |  FROM s GROUP BY 1, 2)
       |SELECT name, user_id, curr_cents, prev_cents,
       |       curr_cents - prev_cents AS delta_cents
       |FROM g
       |ORDER BY abs(curr_cents - prev_cents) DESC, name, user_id
       |LIMIT 5""".stripMargin
  }

  /** q_theil_sen — ROBUST per-series trend: the Theil–Sen estimator
    * (median of pairwise slopes) over each (name, series, hour) window,
    * the outlier-immune companion to [[qDeriv]]'s least-squares slope —
    * one corrupted sample (a scrape glitch, a counter blip that
    * survived reset handling) drags OLS arbitrarily but moves the
    * pairwise-slope median by at most one rank. The pairwise stage is
    * the textbook O(m²) — made scale-safe by the DOWNSAMPLE-FIRST
    * device: samples collapse to the per-minute LAST value before
    * pairing, so m ≤ 60 per (series, hour) BY CONSTRUCTION (a constant
    * of the time grid, not of corpus size; ≤ 1 770 pairs per group no
    * matter how hot the series). Slopes are exact integer ppm-per-
    * minute with the CASE sign guard (truncation toward zero on both
    * engines — Spark `div` truncates, DuckDB `//` floors, so the
    * negative branch computes on magnitudes and negates). The median is
    * the lower median by row_number — ties in slope value pick the same
    * VALUE regardless of tie order, and only group keys + the value are
    * emitted, so the output is deterministic.
    */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
      .withColumn("w_start", expr("ts_us div 3600000000 * 3600"))
      .withColumn("m", expr("ts_us div 60000000 % 60"))
      .withColumn("y", round(col("value") * 100).cast("long"))
    val wLast = Window.partitionBy("name", "user_id", "w_start", "m")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val pts = base.withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("name"), col("user_id"), col("w_start"), col("m"), col("y"))
    val slopes = pts.join(
        pts.select(col("name").as("n2"), col("user_id").as("u2"),
          col("w_start").as("ws2"), col("m").as("m2"), col("y").as("y2")),
        col("name") === col("n2") && col("user_id") === col("u2") &&
          col("w_start") === col("ws2") && col("m") < col("m2"))
      .select(col("name"), col("user_id"), col("w_start"),
        expr("CASE WHEN y2 >= y THEN (y2 - y) * 1000000 div (m2 - m)" +
          " ELSE -((y - y2) * 1000000 div (m2 - m)) END").as("s_ppm"))
    val wMed = Window.partitionBy("name", "user_id", "w_start").orderBy("s_ppm")
    val wGrp = Window.partitionBy("name", "user_id", "w_start")
    slopes
      .withColumn("rn", row_number().over(wMed))
      .withColumn("nc", count(lit(1)).over(wGrp))
      .filter(col("rn") === expr("(nc + 1) div 2"))
      .select(col("name"), col("user_id"), col("w_start"),
        col("nc").as("n_pairs"), col("s_ppm").as("ts_slope_ppm"))
  }

  val theilSenSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id, epoch_us(ts) AS ts_us, event_id,
      |         epoch_us(ts) // 3600000000 * 3600 AS w_start,
      |         (epoch_us(ts) // 60000000) % 60 AS m,
      |         CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |pts AS (
      |  SELECT name, user_id, w_start, m, y FROM (
      |    SELECT *, row_number() OVER (PARTITION BY name, user_id, w_start, m
      |      ORDER BY ts_us DESC, event_id DESC) AS rn FROM b)
      |  WHERE rn = 1),
      |sl AS (
      |  SELECT a.name, a.user_id, a.w_start,
      |         CASE WHEN c.y >= a.y THEN (c.y - a.y) * 1000000 // (c.m - a.m)
      |              ELSE -((a.y - c.y) * 1000000 // (c.m - a.m)) END AS s_ppm
      |  FROM pts a JOIN pts c ON a.name = c.name AND a.user_id = c.user_id
      |    AND a.w_start = c.w_start AND a.m < c.m),
      |r AS (
      |  SELECT name, user_id, w_start, s_ppm,
      |         row_number() OVER (PARTITION BY name, user_id, w_start
      |           ORDER BY s_ppm) AS rn,
      |         COUNT(*) OVER (PARTITION BY name, user_id, w_start) AS nc
      |  FROM sl)
      |SELECT name, user_id, w_start, nc AS n_pairs, s_ppm AS ts_slope_ppm
      |FROM r WHERE rn = (nc + 1) // 2""".stripMargin

  /** q_rollup_tiers — TIERED long-term retention (the Thanos/Cortex
    * compactor shape): raw samples roll into 5m blocks (count/sum/min/
    * max in exact cents), and the 1h tier is computed FROM THE 5m
    * BLOCKS, never from raw — the invariant a downsampling store lives
    * on, because at 100 TB the 1h compaction job only ever reads the
    * (already tiny) 5m tier. Both aggregations are algebraic
    * (map-side-combinable), the second runs on rows already bounded by
    * series×windows; output is the 1h tier keyed by metric name with
    * the series and block counts a retention monitor alerts on.
    */
  def qRollupTiers(spark: SparkSession, dir: String): DataFrame = {
    val t5 = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        (floor(unix_micros(col("ts")) / 1000000L / 300L) * 300L).as("w5m"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("name", "user_id", "w5m")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        min("cents").as("mn"), max("cents").as("mx"))
    t5.withColumn("w1h", expr("w5m div 3600 * 3600"))
      .groupBy("name", "w1h")
      .agg(count(lit(1)).as("n_blocks"),
        countDistinct("user_id").as("n_series"),
        sum("n").as("n_samples"), sum("s").as("sum_cents"),
        min("mn").as("min_cents"), max("mx").as("max_cents"))
  }

  val rollupTiersSql: String =
    """WITH t5 AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 1000000 // 300 * 300 AS w5m,
      |         COUNT(*) AS n,
      |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
      |         MIN(CAST(round(value * 100) AS BIGINT)) AS mn,
      |         MAX(CAST(round(value * 100) AS BIGINT)) AS mx
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT name, w5m // 3600 * 3600 AS w1h,
      |       COUNT(*) AS n_blocks,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_series,
      |       CAST(SUM(n) AS BIGINT) AS n_samples,
      |       CAST(SUM(s) AS BIGINT) AS sum_cents,
      |       MIN(mn) AS min_cents, MAX(mx) AS max_cents
      |FROM t5 GROUP BY 1, 2""".stripMargin

  /** q_scrape_jitter — scrape-interval health per series: the gap
    * sequence between consecutive samples (seconds, total-ordered by
    * (µs, event_id) like every series window here), summarized as
    * count / truncating mean / max plus the EXACT integer population
    * variance via the n·Σx²−(Σx)² closed form (the q_stdvar device —
    * float Welford could never hash-compare). Gaps are integer
    * SECONDS, not ms, so the worst-case n·Σx² at sf10 stays orders of
    * magnitude inside Long — and that headroom is GUARDED, not just
    * asserted in prose (ADVICE_r10): under non-ANSI configs Spark's
    * long arithmetic wraps silently where DuckDB's HUGEINT→BIGINT cast
    * raises (a quiet hash divergence), and even under the ANSI default
    * the raw ARITHMETIC_OVERFLOW names no culprit. A per-series
    * `assert_true` on the aggregated frame (series cardinality —
    * negligible cost) makes the overflow regime fail LOUDLY and NAMED
    * before the closed form evaluates: n·Σx² needs Σx² ≤ Long.Max/n
    * and (Σx)² needs Σx ≤ ⌊√Long.Max⌋ = 3037000499. One window pass + one
    * algebraic groupBy, output bounded by series cardinality — this is
    * the query an SRE reads to find the scrape target whose intervals
    * wander.
    */
  def qScrapeJitter(spark: SparkSession, dir: String): DataFrame =
    scrapeJitterFrom(
      Tables.events(spark, dir)
        .select(col("event_type").as("name"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id")))

  /** The jitter kernel over a (name, user_id, ts_us, event_id) frame —
    * split out so the overflow guard is spec-drivable with a synthetic
    * series the fixtures can't contain. */
  private[graft] def scrapeJitterFrom(base: DataFrame): DataFrame = {
    val w = Window.partitionBy("name", "user_id")
      .orderBy("ts_us", "event_id")
    base
      .withColumn("prev", lag("ts_us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("name"), col("user_id"),
        expr("(ts_us - prev) div 1000000").as("gap_s"))
      .groupBy("name", "user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap_s").as("s1"), sum(expr("gap_s * gap_s")).as("s2"),
        max("gap_s").as("max_gap_s"))
      .withColumn("_hdrm", assert_true(
        expr(s"s2 <= ${Long.MaxValue}L div n_gaps AND s1 <= 3037000499L"),
        concat(lit("q_scrape_jitter overflow: series (name="), col("name"),
          lit(", user_id="), col("user_id"),
          lit(") exceeds the n·Σgap² / (Σgap)² int64 headroom — widen " +
            "the closed form before trusting var_s2"))))
      .filter(col("_hdrm").isNull)
      .select(col("name"), col("user_id"), col("n_gaps"),
        expr("s1 div n_gaps").as("avg_gap_s"), col("max_gap_s"),
        expr("(n_gaps * s2 - s1 * s1) div (n_gaps * n_gaps)")
          .as("var_s2"))
  }

  val scrapeJitterSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id, epoch_us(ts) AS ts_us, event_id
      |  FROM events),
      |g AS (
      |  SELECT name, user_id,
      |         (ts_us - lag(ts_us) OVER (PARTITION BY name, user_id
      |            ORDER BY ts_us, event_id)) // 1000000 AS gap_s
      |  FROM b QUALIFY gap_s IS NOT NULL)
      |SELECT name, user_id, COUNT(*) AS n_gaps,
      |       CAST(SUM(gap_s) AS BIGINT) // COUNT(*) AS avg_gap_s,
      |       MAX(gap_s) AS max_gap_s,
      |       (COUNT(*) * CAST(SUM(gap_s * gap_s) AS BIGINT)
      |         - CAST(SUM(gap_s) AS BIGINT) * CAST(SUM(gap_s) AS BIGINT))
      |         // (COUNT(*) * COUNT(*)) AS var_s2
      |FROM g GROUP BY 1, 2""".stripMargin

  /** q_staleness — the series-staleness inventory (Prometheus marks a
    * series stale 5m after its last sample; a long-retention store
    * asks the same question against the corpus watermark): per series,
    * its last sample time, age vs the corpus max, and the stale flag
    * at the 1-day horizon. One algebraic groupBy for the per-series
    * max + ONE global scalar entering as a broadcast 1-row frame (the
    * q_top_share device — never a window-over-everything, which would
    * shuffle the corpus to one partition). Output = series cardinality.
    */
  def qStaleness(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        expr("unix_micros(ts) div 1000000").as("ts_s"))
    val now = base.agg(max("ts_s").as("now_s"))
    base.groupBy("name", "user_id")
      .agg(max("ts_s").as("last_ts_s"), count(lit(1)).as("n_samples"))
      .crossJoin(broadcast(now))
      .select(col("name"), col("user_id"), col("last_ts_s"),
        col("n_samples"),
        (col("now_s") - col("last_ts_s")).as("age_s"),
        (col("now_s") - col("last_ts_s") > 86400L).cast("long")
          .as("stale"))
  }

  val stalenessSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id,
      |         epoch_us(ts) // 1000000 AS ts_s
      |  FROM events),
      |now_s AS (SELECT MAX(ts_s) AS now_s FROM b)
      |SELECT name, user_id, MAX(ts_s) AS last_ts_s, COUNT(*) AS n_samples,
      |       now_s - MAX(ts_s) AS age_s,
      |       CAST(now_s - MAX(ts_s) > 86400 AS BIGINT) AS stale
      |FROM b, now_s GROUP BY name, user_id, now_s""".stripMargin

  /** q_stale_markers — Prometheus STALENESS-MARKER synthesis (the TSDB
    * writes an explicit stale NaN 5m after a series stops being
    * scraped; a long-retention store replays the same rule over
    * history so range queries stop extrapolating dead series): one
    * marker per gap longer than the staleness horizon (1h here,
    * scaled to the fixture's scrape cadence) at `last + horizon`,
    * plus the final marker every series eventually earns after its
    * last sample. ONE lead() window pass on the series shuffle — a
    * gap row IS `lead(ts) − ts > horizon`, the final row IS
    * `lead(ts) IS NULL` — no join, no grid, output ∝ actual gaps.
    * The STREAMING twin ([[graft.streaming.MetricsStream
    * .streamingStaleMarkers]]) emits the identical rows live off
    * per-series timeout state; parity spec'd in `StreamStaleSpec`.
    */
  def qStaleMarkers(spark: SparkSession, dir: String): DataFrame = {
    val staleUs = 3600L * 1000000L
    val w = Window.partitionBy("name", "user_id").orderBy("ts_us")
    Tables.events(spark, dir)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("nxt", lead("ts_us", 1).over(w))
      .filter(col("nxt").isNull || col("nxt") - col("ts_us") > staleUs)
      .select(col("name"), col("user_id"),
        expr("ts_us div 1000000").as("last_ts_s"),
        expr("ts_us div 1000000 + 3600").as("marker_ts_s"))
  }

  val staleMarkersSql: String =
    """WITH b AS (
      |  SELECT event_type AS name, user_id, epoch_us(ts) AS ts_us
      |  FROM events),
      |g AS (
      |  SELECT name, user_id, ts_us,
      |         lead(ts_us) OVER (PARTITION BY name, user_id
      |           ORDER BY ts_us) AS nxt
      |  FROM b)
      |SELECT name, user_id, ts_us // 1000000 AS last_ts_s,
      |       ts_us // 1000000 + 3600 AS marker_ts_s
      |FROM g
      |WHERE nxt IS NULL OR nxt - ts_us > CAST(3600 AS BIGINT) * 1000000""".stripMargin
}
