package graft

import java.nio.file.{Files, Paths}

import graft.config.EnvConfig
import org.scalatest.funsuite.AnyFunSuite

/** Ops packaging parity (VERDICT_r06 item 6): the reference ships
  * `Dockerfile` + `docker-compose.yml` + `Makefile` + `env.example` as
  * its deploy story; this spec asserts the Spark re-expressions parse
  * and wire correctly — the build sandbox has zero egress, so
  * `docker compose up` itself is a documented dry-run and the WIRING is
  * what's testable: every env key in env.example is accepted by
  * EnvConfig (and its commented defaults match the code's), the compose
  * file connects the graft service to the clickhouse/prometheus
  * services by hostname with the schema bootstrap enabled, the
  * Dockerfile submits the exact jar `sbt package` produces with
  * `graft.EtlMain` as the class, and the Makefile re-expresses the
  * reference targets.
  */
class OpsPackagingSpec extends AnyFunSuite {

  private def read(name: String): String =
    new String(Files.readAllBytes(Paths.get(name)), "UTF-8")

  /** KEY=VALUE assignments in env.example, active AND commented-out
    * (`# KEY=VALUE  # trailing comment`). */
  private def envAssignments(text: String): Map[String, String] =
    text.linesIterator.flatMap { line =>
      "^#?\\s*([A-Z][A-Z0-9_]*)=(\\S*)".r.findFirstMatchIn(line)
        .map(m => m.group(1) -> m.group(2))
    }.toMap

  test("env.example: every key parses through EnvConfig with the documented defaults") {
    val env = envAssignments(read("env.example"))
    assert(env.contains("PROMETHEUS_URL") && env.contains("CLICKHOUSE_URL"))
    // load with ALL keys set to their documented values — any key the
    // code does not accept (or any non-parsing default) throws here
    val app = EnvConfig.load(env)
    assert(app.prometheus.url == "http://localhost:9090")
    assert(app.prometheus.timeoutSeconds == 10)
    assert(app.prometheus.queryStepSeconds == 15)
    assert(app.clickhouse.url == "http://localhost:8123")
    assert(app.clickhouse.connectTimeoutSeconds == 10)
    assert(app.clickhouse.sendReceiveTimeoutSeconds == 300)
    assert(app.clickhouse.tableMetrics == "default.metrics")
    assert(app.clickhouse.tableEtl == "default.etl")
    assert(!app.clickhouse.ensureTables)
    assert(app.etl.batchWindowSizeSeconds == 300)
    assert(app.etl.batchWindowOverlapSeconds == 0)
    assert(app.etl.minWindowStartTimestamp == 0)
    assert(app.etl.tempDir == "/tmp")
    assert(app.etl.logLevel == "INFO")
    // minimal form: only the two required URLs — defaults still load
    val minimal = EnvConfig.load(Map(
      "PROMETHEUS_URL" -> "http://p:9090", "CLICKHOUSE_URL" -> "http://c:8123"))
    assert(minimal.etl.batchWindowSizeSeconds == 300)
  }

  test("docker-compose: services + graft wiring + own-bootstrap replacement") {
    val yml = read("docker-compose.yml")
    for (svc <- Seq("clickhouse:", "prometheus:", "node_exporter:", "graft:"))
      assert(yml.contains(s"  $svc"), s"missing service $svc")
    // the ETL reaches its dependencies by compose service hostname
    assert(yml.contains("PROMETHEUS_URL: http://prometheus:9090"))
    assert(yml.contains("CLICKHOUSE_URL: http://clickhouse:8123"))
    // the reference's clickhouse_init container is replaced by graft's
    // own spec'd DDL bootstrap — must be switched ON in compose
    assert(yml.contains("CLICKHOUSE_ENSURE_TABLES: \"true\""))
    assert(!yml.contains("  clickhouse_init:"),
      "the init container is re-expressed by ensureTables, not copied")
    // same ClickHouse image line as the reference deploy
    assert(yml.contains("altinity/clickhouse-server"))
    // every long-running service has a healthcheck gating depends_on
    assert("healthcheck:".r.findAllIn(yml).size >= 3)
    assert(yml.contains("condition: service_healthy"))
  }

  test("Dockerfile: spark-submit entrypoint on the exact sbt-package jar") {
    val df = read("Dockerfile")
    val buildSbt = read("build.sbt")
    val version = "version := \"([^\"]+)\"".r
      .findFirstMatchIn(buildSbt).get.group(1)
    val name = "name := \"([^\"]+)\"".r
      .findFirstMatchIn(buildSbt).get.group(1)
    val jar = s"${name}_2.13-$version.jar"
    assert(df.contains(jar),
      s"Dockerfile must copy the jar sbt package produces ($jar)")
    assert(df.contains("\"graft.EtlMain\""))
    assert(df.contains("spark-submit"))
    assert(df.contains("spark.sql.session.timeZone=UTC"))
  }

  test("Makefile: reference targets re-expressed for sbt/spark-submit") {
    val mk = read("Makefile")
    for (target <- Seq("help:", "compile:", "test:", "verify:", "bench:",
        "all:", "run:", "package:", "clean:", "docker-build:",
        "docker-run:", "docker:"))
      assert(mk.contains(s"\n$target") || mk.startsWith(target),
        s"missing target $target")
    assert(mk.contains("graft.EtlMain"), "run target must drive the entrypoint")
    assert(mk.contains("tools/check.py"), "verify must include the oracle compare")
    assert(mk.contains("env.example"), "docker-run keeps the env-file pattern")
  }
}
