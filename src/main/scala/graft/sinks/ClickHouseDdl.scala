package graft.sinks

/** ClickHouse DDL bootstrap — the exact table definitions the reference
  * README ships (reference README.md:119-145 metrics table,
  * README.md:162-178 ETL state table, README.md:107 database). The
  * reference expects an operator to hand-create these before the first
  * run; graft emits them from code so a new deployment is one
  * `ensureTables()` call — the first thing a migrating user does.
  *
  * `metricsTableDdl("default.metrics")` and
  * `etlStateTableDdl("default.etl")` with `ifNotExists = false`
  * reproduce the README blocks STRING-EXACT (asserted by DdlSpec), so
  * the bootstrap provably creates the same schema an existing
  * deployment runs — ReplacingMergeTree dedup (R9), daily partitioning
  * (R10), the MATERIALIZED cityHash64 id (R5, bit-matched by
  * graft.functions.CityHash64), and the sorted-labels ORDER BY.
  *
  * Table names are validated with the same rule as the insert path
  * (ClickHouseHttpClient.validateTableName) before splicing.
  */
object ClickHouseDdl {

  private def createClause(table: String, ifNotExists: Boolean): String = {
    ClickHouseHttpClient.validateTableName(table, "ddl table")
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine$table"
  }

  /** Metrics table (reference README.md:119-145). */
  def metricsTableDdl(table: String = "default.metrics",
      ifNotExists: Boolean = false): String =
    s"""${createClause(table, ifNotExists)} (
       |    id UInt64 MATERIALIZED cityHash64(
       |        timestamp,
       |        name,
       |        labels.key,
       |        labels.value,
       |        value
       |    ),
       |    timestamp DateTime64(6, 'UTC'),
       |    name String CODEC(ZSTD(3)),
       |    labels Nested(
       |        key String,
       |        value String
       |    ) CODEC(ZSTD(3)),
       |    value Float64
       |) ENGINE = ReplacingMergeTree()
       |PARTITION BY toYYYYMMDD(timestamp)
       |ORDER BY (
       |    timestamp,
       |    name,
       |    arraySort(
       |        arrayMap((k, v) -> tuple(k, v), labels.key, labels.value)
       |    )
       |);""".stripMargin

  /** ETL job-state table (reference README.md:162-178). Second-level
    * DateTime resolution, like the reference (state timestamps round to
    * seconds — README's note under the block).
    */
  def etlStateTableDdl(table: String = "default.etl",
      ifNotExists: Boolean = false): String =
    s"""${createClause(table, ifNotExists)} (
       |    id UInt64 MATERIALIZED cityHash64(
       |        timestamp_start,
       |        coalesce(timestamp_end, toDateTime(0)),
       |        coalesce(timestamp_progress, toDateTime(0)),
       |        coalesce(batch_window_seconds, 0),
       |        coalesce(batch_rows, 0),
       |        coalesce(batch_skipped_count, 0)
       |    ),
       |    timestamp_start DateTime,
       |    timestamp_end Nullable(DateTime),
       |    timestamp_progress Nullable(DateTime),
       |    batch_window_seconds Nullable(Int64) CODEC(ZSTD(3)),
       |    batch_rows Nullable(Int64) CODEC(ZSTD(3)),
       |    batch_skipped_count Nullable(Int64) CODEC(ZSTD(3))
       |) ENGINE = ReplacingMergeTree()
       |ORDER BY (timestamp_start);""".stripMargin

  /** Optional custom database (reference README.md:107). */
  def databaseDdl(db: String): String = {
    ClickHouseHttpClient.validateTableName(db, "ddl database")
    require(!db.contains("."), s"database name cannot be qualified: $db")
    s"CREATE DATABASE IF NOT EXISTS $db;"
  }

  /** The bootstrap statement sequence for a deployment: both tables,
    * idempotent (IF NOT EXISTS), plus the database when the table names
    * are qualified with a non-default one.
    */
  def bootstrapStatements(metricsTable: String,
      etlTable: String): Seq[String] = {
    val dbs = Seq(metricsTable, etlTable)
      .filter(_.contains("."))
      .map(_.split("\\.", 2).head)
      .distinct
      .filterNot(_ == "default")
    dbs.map(databaseDdl) ++ Seq(
      metricsTableDdl(metricsTable, ifNotExists = true),
      etlStateTableDdl(etlTable, ifNotExists = true))
  }
}
