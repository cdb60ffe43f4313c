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
  def metrics(spark: SparkSession, dir: String): DataFrame = {
    val labels = map_concat(
      from_json(col("props"), MapType(StringType, StringType)),
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

  /** DuckDB twins of the dynamic label arrays, for oracle SQL authoring. */
  private val keysSql =
    "list_sort(list_append(json_keys(props), 'user'))"
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
    */
  def qSelector(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").rlike("^(purchase|signup|click)$"))
      .filter(get_json_object(col("props"), "$.k").rlike("^1"))
      .select(unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"),
        col("user_id"),
        get_json_object(col("props"), "$.k").as("k"),
        col("value"))

  val selectorSql: String =
    """SELECT epoch_us(ts) AS ts_us, event_type AS name, user_id,
      |       CAST(json_extract_string(props,'$.k') AS VARCHAR) AS k, value
      |FROM events
      |WHERE regexp_matches(event_type, '^(purchase|signup|click)$')
      |  AND regexp_matches(CAST(json_extract_string(props,'$.k') AS VARCHAR), '^1')""".stripMargin

  /** Per-series 5-minute range buckets with first/last/min/max/sum/count —
    * the shared shape under rate/increase/..._over_time. Series key =
    * (name, user), window = 300s tumbling. groupBy(window) keeps partial
    * aggregation map-side; at scale this partitions by (series, window)
    * exactly like the daily-partitioned metrics lake (R10).
    */
  private def series5m(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 300L
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"),
      col("value"))
  }

  /** q_rate — PromQL rate(): (last − first) / (t_last − t_first) per
    * series per 5m window; windows with <2 points yield no rate (PromQL
    * semantics: rate needs ≥2 samples).
    */
  def qRate(spark: SparkSession, dir: String): DataFrame =
    series5m(spark, dir)
      .groupBy("name", "user_id", "w_start")
      .agg(
        min_by(col("value"), col("ts_s")).as("first_v"),
        max_by(col("value"), col("ts_s")).as("last_v"),
        min("ts_s").as("t_first"), max("ts_s").as("t_last"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("t_last") > col("t_first"))
      .select(col("name"), col("user_id"), col("w_start"),
        round((col("last_v") - col("first_v")) / (col("t_last") - col("t_first")), 6)
          .as("rate"))

  val rateSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id,
      |         CAST(floor(epoch_us(ts)/1000000/300)*300 AS BIGINT) AS w_start,
      |         epoch_us(ts)/1000000.0 AS ts_s, value
      |  FROM events)
      |SELECT name, user_id, w_start,
      |       round((max_by(value, ts_s) - min_by(value, ts_s))
      |             / (max(ts_s) - min(ts_s)), 6) AS rate
      |FROM s GROUP BY name, user_id, w_start
      |HAVING COUNT(*) >= 2 AND max(ts_s) > min(ts_s)""".stripMargin

  /** q_increase — PromQL increase() with counter-reset handling: per
    * series, sum of clamped-to-≥0 successive deltas within each 1h window
    * (a reset makes the raw delta negative; PromQL treats it as restart
    * from 0, i.e. contributes the new value — we use the simpler clamp
    * variant: max(delta, 0)).
    */
  def qIncrease(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("name", "user_id").orderBy("ts_s", "event_id")
    val winSize = 3600L
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"), col("event_id"),
      (unix_micros(col("ts")) / 1000000d).as("ts_s"), col("value"))
      .withColumn("delta", col("value") - lag("value", 1).over(w))
      .filter(col("delta").isNotNull)
      .withColumn("w_start", (floor(col("ts_s") / winSize) * winSize).cast("long"))
      .groupBy("name", "user_id", "w_start")
      .agg(round(sum(greatest(col("delta"), lit(0d))), 6).as("increase"))
  }

  val increaseSql: String =
    """WITH s AS (
      |  SELECT event_type AS name, user_id, event_id,
      |         epoch_us(ts)/1000000.0 AS ts_s, value,
      |         value - lag(value) OVER (PARTITION BY event_type, user_id
      |                                  ORDER BY epoch_us(ts)/1000000.0, event_id) AS delta
      |  FROM events)
      |SELECT name, user_id,
      |       CAST(floor(ts_s/3600)*3600 AS BIGINT) AS w_start,
      |       round(SUM(greatest(delta, 0)), 6) AS increase
      |FROM s WHERE delta IS NOT NULL
      |GROUP BY name, user_id, CAST(floor(ts_s/3600)*3600 AS BIGINT)""".stripMargin

  /** q_over_time — avg/min/max/sum/count_over_time per series per 1h
    * window (PromQL *_over_time family) — one shuffle, map-side combine.
    */
  def qOverTime(spark: SparkSession, dir: String): DataFrame = {
    val winSize = 3600L
    Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      (floor(unix_micros(col("ts")) / 1000000L / winSize) * winSize).as("w_start"),
      col("value"))
      .groupBy("name", "user_id", "w_start")
      .agg(
        round(avg("value"), 4).as("avg_v"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"),
        round(sum("value"), 4).as("sum_v"),
        count(lit(1)).as("count_v"))
  }

  val overTimeSql: String =
    """SELECT event_type AS name, user_id,
      |       CAST(floor(epoch_us(ts)/1000000/3600)*3600 AS BIGINT) AS w_start,
      |       round(avg(value), 4) AS avg_v, round(min(value), 4) AS min_v,
      |       round(max(value), 4) AS max_v, round(sum(value), 4) AS sum_v,
      |       COUNT(*) AS count_v
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** q_daily_partition — R10: the reference's metrics table partitions by
    * toYYYYMMDD(timestamp); compute partition id + per-partition stats
    * (what a 100 TB lake's partition manifest looks like).
    */
  def qDailyPartition(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyyMMdd").cast("int").as("partition_id"))
      .agg(count(lit(1)).as("rows"),
        round(sum("value"), 2).as("sum_value"),
        countDistinct("event_type").as("n_series_names"))

  val dailyPartitionSql: String =
    """SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS partition_id,
      |       COUNT(*) AS rows, round(sum(value), 2) AS sum_value,
      |       COUNT(DISTINCT event_type) AS n_series_names
      |FROM events GROUP BY 1""".stripMargin
}
