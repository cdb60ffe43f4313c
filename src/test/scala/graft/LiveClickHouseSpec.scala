package graft

import graft.config.ClickHouseSettings
import graft.operators.MetricsEtl
import graft.sinks.{ClickHouseHttpClient, TsvSink}
import org.apache.spark.sql.functions._

/** GATED live-ClickHouse integration (VERDICT_r07 item 6) — the one
  * reference behavior previously taken on faith: the compose'd job
  * really does `ensureTables` → TabSeparated bulk insert → idempotent
  * FINAL readback against a real server
  * (`/root/reference/docker-compose.yml`'s run loop). The whole suite
  * CANCELS cleanly unless `CLICKHOUSE_URL` names a reachable server:
  *
  *   docker compose up -d clickhouse     # (docker-compose.yml)
  *   CLICKHOUSE_URL=http://localhost:8123 sbt "testOnly graft.LiveClickHouseSpec"
  *
  * What a pass proves end-to-end, against the server and not a stub:
  *   - the README-exact DDL bootstraps (and re-bootstraps) cleanly
  *   - the R3/R4 TSV rendering is accepted by FORMAT TabSeparated and
  *     round-trips values
  *   - the MATERIALIZED cityHash64 id the SERVER computes equals the
  *     engine's native CityHash64 expression bit-for-bit (groupBitXor
  *     over all rows — any single differing id flips the checksum)
  *   - re-inserting the same files changes nothing under FINAL (the
  *     R5/R9 idempotent-reload story on a real ReplacingMergeTree)
  */
class LiveClickHouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val metricsTable = "default.graft_it_metrics"
  private val etlTable = "default.graft_it_etl"

  private def liveClient: Option[ClickHouseHttpClient] =
    sys.env.get("CLICKHOUSE_URL").map { url =>
      new ClickHouseHttpClient(ClickHouseSettings(url = url,
        user = sys.env.get("CLICKHOUSE_USER"),
        password = sys.env.get("CLICKHOUSE_PASSWORD"),
        tableMetrics = metricsTable, tableEtl = etlTable))
    }.filter(_.ping())

  test("ensureTables -> TSV insert -> FINAL readback parity against a live server") {
    val client = liveClient.getOrElse(cancel(
      "CLICKHOUSE_URL unset or unreachable — `docker compose up -d " +
        "clickhouse` then re-run with CLICKHOUSE_URL=http://localhost:8123"))

    // clean slate, then bootstrap TWICE (IF NOT EXISTS must be true to
    // its name on a real server)
    client.execute(s"DROP TABLE IF EXISTS $metricsTable")
    client.execute(s"DROP TABLE IF EXISTS $etlTable")
    client.ensureTables()
    client.ensureTables()

    // the engine-side truth: the metrics view, its native cityHash64
    // ids, and the FINAL-collapse expectation (distinct ORDER BY keys)
    val m = MetricsEtl.metrics(spark, sf)
    val n = m.count()
    val distinctKeys = m.select(col("ts_us"), col("name"),
      col("label_keys"), col("label_values")).distinct().count()
    val xorSpark = m.select(graft.functions.CityHash64Expr.cityHash64(
        col("ts_us"), col("name"), col("label_keys"), col("label_values"),
        col("value")).as("id"))
      .agg(expr("bit_xor(id)")).head().getLong(0)

    // render + bulk-load, exactly the production path
    val tsvDir = tmpDir("live_ch_tsv")
    TsvSink.write(m, tsvDir)
    val files = client.loadDir(tsvDir)
    assert(files > 0, "TsvSink produced no part files")

    def q1(sql: String): String = client.query(sql).trim
    assert(q1(s"SELECT count() FROM $metricsTable").toLong == n,
      "raw row count after first load")
    assert(q1(s"SELECT count() FROM $metricsTable FINAL").toLong == distinctKeys,
      "FINAL collapses to one row per ORDER BY key")
    // the server's MATERIALIZED id vs the engine's native expression:
    // one checksum over every row — bit-exactness, not sampling
    assert(q1(s"SELECT groupBitXor(id) FROM $metricsTable FINAL") ==
      java.lang.Long.toUnsignedString(xorSpark),
      "server-materialized cityHash64 ids != engine's native expression")
    // value round-trip through R4 rendering: exact sum of cents
    val centsSpark = m.agg(sum(round(col("value") * 100).cast("long")))
      .head().getLong(0)
    assert(q1(s"SELECT sum(toInt64(round(value * 100))) FROM $metricsTable FINAL")
      .toLong == centsSpark, "Float64 values did not round-trip the TSV")

    // idempotent reload (R5/R9): the overlap re-delivers everything;
    // FINAL must not change
    client.loadDir(tsvDir)
    assert(q1(s"SELECT count() FROM $metricsTable FINAL").toLong == distinctKeys,
      "re-delivered rows must collapse under FINAL")

    client.execute(s"DROP TABLE IF EXISTS $metricsTable")
    client.execute(s"DROP TABLE IF EXISTS $etlTable")
  }
}
