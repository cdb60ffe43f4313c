package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite

/** EnvConfig loader vs reference config.py semantics: prefixes,
  * case-insensitivity, env_ignore_empty, password normalization
  * (config.py:59,124), required fields, bounds, bool breadth. */
class ConfigSpec extends AnyFunSuite {

  private val minimal = Map(
    "PROMETHEUS_URL" -> "http://prom:9090",
    "CLICKHOUSE_URL" -> "http://ch:8123")

  test("defaults match the reference field defaults") {
    val c = EnvConfig.load(minimal)
    assert(c.prometheus.url == "http://prom:9090")
    assert(c.prometheus.user.isEmpty && c.prometheus.password.isEmpty)
    assert(!c.prometheus.insecure)
    assert(c.prometheus.timeoutSeconds == 10)
    assert(c.prometheus.queryStepSeconds == 15)
    assert(c.clickhouse.connectTimeoutSeconds == 10)
    assert(c.clickhouse.sendReceiveTimeoutSeconds == 300)
    assert(c.clickhouse.tableMetrics == "default.metrics")
    assert(c.clickhouse.tableEtl == "default.etl")
    assert(c.etl.batchWindowSizeSeconds == 300)
    assert(c.etl.batchWindowOverlapSeconds == 0)
    assert(c.etl.logLevel == "INFO")
    assert(c.etl.tempDir == "/tmp")
    assert(c.etl.minWindowStartTimestamp == 0)
  }

  test("missing required url fails loudly") {
    val e = intercept[EnvConfig.ConfigError] {
      EnvConfig.prometheus(Map.empty)
    }
    assert(e.getMessage.contains("PROMETHEUS_URL"))
    intercept[EnvConfig.ConfigError] { EnvConfig.clickhouse(Map.empty) }
  }

  test("case-insensitive lookup (case_sensitive=False)") {
    val c = EnvConfig.prometheus(Map(
      "prometheus_url" -> "http://p", "Prometheus_Timeout" -> "42"))
    assert(c.url == "http://p")
    assert(c.timeoutSeconds == 42)
  }

  test("empty values are ignored (env_ignore_empty=True)") {
    val c = EnvConfig.prometheus(minimal +
      ("PROMETHEUS_TIMEOUT" -> "") + ("PROMETHEUS_USER" -> ""))
    assert(c.timeoutSeconds == 10)
    assert(c.user.isEmpty)
    // and password stays None because user is unset
    assert(c.password.isEmpty)
  }

  test("password normalization: user set, password unset -> Some(\"\")") {
    // the config.py:59,124 rule: empty password string in env is dropped
    // by env_ignore_empty, but basic auth with a user REQUIRES a
    // password value, so None normalizes to ""
    val p = EnvConfig.prometheus(minimal +
      ("PROMETHEUS_USER" -> "alice") + ("PROMETHEUS_PASSWORD" -> ""))
    assert(p.user.contains("alice"))
    assert(p.password.contains(""))
    val ch = EnvConfig.clickhouse(minimal + ("CLICKHOUSE_USER" -> "bob"))
    assert(ch.password.contains(""))
    // but a real password passes through
    val p2 = EnvConfig.prometheus(minimal +
      ("PROMETHEUS_USER" -> "alice") + ("PROMETHEUS_PASSWORD" -> "s3cret"))
    assert(p2.password.contains("s3cret"))
    // and no user -> no normalization
    assert(EnvConfig.prometheus(minimal).password.isEmpty)
  }

  test("bool parsing at pydantic breadth") {
    for (v <- Seq("true", "1", "yes", "on", "TRUE", "Yes"))
      assert(EnvConfig.prometheus(minimal + ("PROMETHEUS_INSECURE" -> v)).insecure,
        s"'$v' should parse true")
    for (v <- Seq("false", "0", "no", "off", "False"))
      assert(!EnvConfig.prometheus(minimal + ("PROMETHEUS_INSECURE" -> v)).insecure,
        s"'$v' should parse false")
    intercept[EnvConfig.ConfigError] {
      EnvConfig.prometheus(minimal + ("PROMETHEUS_INSECURE" -> "maybe"))
    }
  }

  test("int parsing errors and bounds (gt/ge constraints)") {
    intercept[EnvConfig.ConfigError] {
      EnvConfig.prometheus(minimal + ("PROMETHEUS_TIMEOUT" -> "ten"))
    }
    intercept[EnvConfig.ConfigError] {
      EnvConfig.etl(Map("BATCH_WINDOW_SIZE_SECONDS" -> "0"))
    }
    intercept[EnvConfig.ConfigError] {
      EnvConfig.etl(Map("BATCH_WINDOW_OVERLAP_SECONDS" -> "-1"))
    }
    intercept[EnvConfig.ConfigError] {
      EnvConfig.etl(Map("MIN_WINDOW_START_TIMESTAMP" -> "-5"))
    }
    // boundary values that ARE allowed
    assert(EnvConfig.etl(Map("BATCH_WINDOW_SIZE_SECONDS" -> "1"))
      .batchWindowSizeSeconds == 1)
    assert(EnvConfig.etl(Map("BATCH_WINDOW_OVERLAP_SECONDS" -> "0"))
      .batchWindowOverlapSeconds == 0)
  }

  test("EtlSettings projects onto the R6 state-machine config") {
    val s = EnvConfig.etl(Map(
      "BATCH_WINDOW_SIZE_SECONDS" -> "600",
      "BATCH_WINDOW_OVERLAP_SECONDS" -> "30",
      "MIN_WINDOW_START_TIMESTAMP" -> "1000"))
    val c = s.toEtlConfig
    assert(c.batchWindowSeconds == 600)
    assert(c.batchWindowOverlapSeconds == 30)
    assert(c.minWindowStartTimestamp == 1000)
  }

  test("full load reads all three sections") {
    val c = EnvConfig.load(minimal ++ Map(
      "CLICKHOUSE_TABLE_METRICS" -> "db.m",
      "LOG_LEVEL" -> "DEBUG"))
    assert(c.clickhouse.tableMetrics == "db.m")
    assert(c.etl.logLevel == "DEBUG")
  }
}
