package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.config.ClickHouseSettings
import graft.logging.StructuredLogger
import graft.sinks.{ClickHouseDdl, ClickHouseHttpClient, ClickHouseHttpException}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** DDL bootstrap parity: the emitted CREATE TABLE statements must be
  * STRING-EXACT vs the reference README's blocks (README.md:119-145 and
  * :162-178) — a migrating user's existing tables were created from
  * that text, so any drift (codec, ORDER BY, MATERIALIZED id) would
  * silently fork the deployment's schema. ensureTables is driven
  * against a stub ClickHouse HTTP server.
  */
class DdlSpec extends AnyFunSuite {

  // the reference README's metrics table, verbatim (README.md:119-145)
  private val refMetrics =
    """CREATE TABLE default.metrics (
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

  // the reference README's ETL state table, verbatim (README.md:162-178)
  private val refEtl =
    """CREATE TABLE default.etl (
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

  test("metrics table DDL is string-exact vs the reference README") {
    assert(ClickHouseDdl.metricsTableDdl() == refMetrics)
  }

  test("etl state table DDL is string-exact vs the reference README") {
    assert(ClickHouseDdl.etlStateTableDdl() == refEtl)
  }

  test("IF NOT EXISTS variant changes only the create clause") {
    val ine = ClickHouseDdl.metricsTableDdl(ifNotExists = true)
    assert(ine ==
      refMetrics.replace("CREATE TABLE default.metrics",
        "CREATE TABLE IF NOT EXISTS default.metrics"))
  }

  test("custom table names splice after validation; bad names throw") {
    assert(ClickHouseDdl.metricsTableDdl("metrics.m")
      .startsWith("CREATE TABLE metrics.m ("))
    intercept[IllegalArgumentException] {
      ClickHouseDdl.metricsTableDdl("bad;drop")
    }
    intercept[IllegalArgumentException] { ClickHouseDdl.databaseDdl("a.b") }
  }

  test("bootstrapStatements: database first for non-default qualifiers") {
    val stmts = ClickHouseDdl.bootstrapStatements("mx.metrics", "mx.etl")
    assert(stmts.length == 3)
    assert(stmts.head == "CREATE DATABASE IF NOT EXISTS mx;")
    assert(stmts(1).startsWith("CREATE TABLE IF NOT EXISTS mx.metrics ("))
    assert(stmts(2).startsWith("CREATE TABLE IF NOT EXISTS mx.etl ("))
    // default database needs no CREATE DATABASE
    val defaults = ClickHouseDdl.bootstrapStatements("default.metrics",
      "default.etl")
    assert(defaults.length == 2)
    assert(defaults.forall(_.startsWith("CREATE TABLE IF NOT EXISTS ")))
  }

  // ---- ensureTables against a stub ClickHouse HTTP endpoint ----

  private def quietLogger = new StructuredLogger("test", "CRITICAL",
    new PrintStream(new ByteArrayOutputStream()),
    new PrintStream(new ByteArrayOutputStream()))

  private def withServer(status: Int)
      (test: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new ConcurrentLinkedQueue[String]()
    server.createContext("/", (ex: HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", bodies)
    finally server.stop(0)
  }

  test("ensureTables POSTs each bootstrap statement as the body") {
    withServer(200) { (base, bodies) =>
      val client = new ClickHouseHttpClient(
        ClickHouseSettings(url = base, tableMetrics = "mx.metrics",
          tableEtl = "mx.etl"), quietLogger)
      val stmts = client.ensureTables()
      assert(stmts.length == 3)
      val seen = Iterator.continually(bodies.poll()).takeWhile(_ != null).toSeq
      assert(seen == stmts, "bodies must arrive in statement order")
      assert(seen.head == "CREATE DATABASE IF NOT EXISTS mx;")
    }
  }

  test("ensureTables surfaces HTTP errors with status + preview") {
    withServer(500) { (base, _) =>
      val client = new ClickHouseHttpClient(
        ClickHouseSettings(url = base), quietLogger)
      val e = intercept[ClickHouseHttpException] { client.ensureTables() }
      assert(e.statusCode == 500)
    }
  }
}
