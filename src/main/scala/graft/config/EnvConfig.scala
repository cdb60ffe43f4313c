package graft.config

import graft.streaming.EtlConfig

/** Prometheus connection settings — reference config.py:19-76
  * (`PROMETHEUS_`-prefixed environment variables). */
case class PrometheusSettings(
    url: String,
    user: Option[String] = None,
    password: Option[String] = None,
    insecure: Boolean = false,
    timeoutSeconds: Int = 10,
    queryStepSeconds: Int = 15)

/** ClickHouse connection settings — reference config.py:79-141
  * (`CLICKHOUSE_`-prefixed environment variables). */
case class ClickHouseSettings(
    url: String,
    user: Option[String] = None,
    password: Option[String] = None,
    connectTimeoutSeconds: Int = 10,
    sendReceiveTimeoutSeconds: Int = 300,
    insecure: Boolean = false,
    tableMetrics: String = "default.metrics",
    tableEtl: String = "default.etl",
    // graft extension beyond the reference's knob set: opt-in one-call
    // schema bootstrap (the reference README has the operator hand-run
    // its CREATE TABLE blocks; ClickHouseDdl emits the same text)
    ensureTables: Boolean = false)

/** ETL behavior settings — reference config.py:144-192 (unprefixed
  * env vars). [[toEtlConfig]] projects the R6 knobs onto the state
  * machine's config. */
case class EtlSettings(
    batchWindowSizeSeconds: Long = 300,
    batchWindowOverlapSeconds: Long = 0,
    logLevel: String = "INFO",
    tempDir: String = "/tmp",
    minWindowStartTimestamp: Long = 0) {
  def toEtlConfig: EtlConfig = EtlConfig(
    batchWindowSeconds = batchWindowSizeSeconds,
    batchWindowOverlapSeconds = batchWindowOverlapSeconds,
    minWindowStartTimestamp = minWindowStartTimestamp)
}

/** Full application configuration — reference config.py:195-242. */
case class AppConfig(
    prometheus: PrometheusSettings,
    clickhouse: ClickHouseSettings,
    etl: EtlSettings)

/** Environment-variable configuration loader, semantics matched to the
  * reference's pydantic BaseSettings models (config.py:19-242):
  *
  *  - prefix + case-insensitive lookup (`env_prefix`, `case_sensitive=False`)
  *  - empty-string values treated as unset (`env_ignore_empty=True`)
  *  - password normalization (config.py:59,124): user set but password
  *    unset → password becomes `Some("")` — HTTP Basic Auth with an
  *    empty password is DIFFERENT from no auth at all
  *  - required `url` fields → [[ConfigError]] when missing
  *  - bounds: window size > 0, overlap ≥ 0, min start ≥ 0 (the pydantic
  *    gt/ge field constraints)
  *  - bool parsing at pydantic breadth: true/false, 1/0, yes/no, on/off,
  *    case-insensitive
  *
  * Pure function of a `Map[String, String]` so specs can drive it
  * without mutating the process environment; [[loadFromEnv]] binds it
  * to `sys.env`.
  */
object EnvConfig {

  final class ConfigError(msg: String) extends IllegalArgumentException(msg)

  /** Case-insensitive, empty-ignoring lookup of `prefix + key`. */
  private def get(env: Map[String, String], prefix: String, key: String)
      : Option[String] = {
    val want = (prefix + key).toLowerCase
    env.collectFirst {
      case (k, v) if k.toLowerCase == want && v.nonEmpty => v
    }
  }

  private def require(env: Map[String, String], prefix: String, key: String)
      : String =
    get(env, prefix, key).getOrElse(
      throw new ConfigError(s"missing required environment variable ${prefix + key}"))

  private def parseInt(name: String, v: String): Long =
    try v.trim.toLong
    catch {
      case _: NumberFormatException =>
        throw new ConfigError(s"$name must be an integer, got '$v'")
    }

  private def parseBool(name: String, v: String): Boolean =
    v.trim.toLowerCase match {
      case "true" | "1" | "yes" | "on" => true
      case "false" | "0" | "no" | "off" => false
      case other =>
        throw new ConfigError(s"$name must be a boolean, got '$other'")
    }

  private def intOr(env: Map[String, String], prefix: String, key: String,
                    default: Long): Long =
    get(env, prefix, key).map(parseInt(prefix + key, _)).getOrElse(default)

  private def boolOr(env: Map[String, String], prefix: String, key: String,
                     default: Boolean): Boolean =
    get(env, prefix, key).map(parseBool(prefix + key, _)).getOrElse(default)

  /** config.py:58-76 — user set, password unset → Some(""). */
  private def normalizePassword(user: Option[String],
                                password: Option[String]): Option[String] =
    if (user.isDefined && password.isEmpty) Some("") else password

  def prometheus(env: Map[String, String]): PrometheusSettings = {
    val p = "PROMETHEUS_"
    val user = get(env, p, "USER")
    PrometheusSettings(
      url = require(env, p, "URL"),
      user = user,
      password = normalizePassword(user, get(env, p, "PASSWORD")),
      insecure = boolOr(env, p, "INSECURE", default = false),
      timeoutSeconds = intOr(env, p, "TIMEOUT", 10).toInt,
      queryStepSeconds = intOr(env, p, "QUERY_STEP_SECONDS", 15).toInt)
  }

  def clickhouse(env: Map[String, String]): ClickHouseSettings = {
    val p = "CLICKHOUSE_"
    val user = get(env, p, "USER")
    ClickHouseSettings(
      url = require(env, p, "URL"),
      user = user,
      password = normalizePassword(user, get(env, p, "PASSWORD")),
      connectTimeoutSeconds = intOr(env, p, "CONNECT_TIMEOUT", 10).toInt,
      sendReceiveTimeoutSeconds = intOr(env, p, "SEND_RECEIVE_TIMEOUT", 300).toInt,
      insecure = boolOr(env, p, "INSECURE", default = false),
      tableMetrics = get(env, p, "TABLE_METRICS").getOrElse("default.metrics"),
      tableEtl = get(env, p, "TABLE_ETL").getOrElse("default.etl"),
      ensureTables = boolOr(env, p, "ENSURE_TABLES", default = false))
  }

  def etl(env: Map[String, String]): EtlSettings = {
    val size = intOr(env, "", "BATCH_WINDOW_SIZE_SECONDS", 300)
    if (size <= 0)
      throw new ConfigError(s"BATCH_WINDOW_SIZE_SECONDS must be > 0, got $size")
    val overlap = intOr(env, "", "BATCH_WINDOW_OVERLAP_SECONDS", 0)
    if (overlap < 0)
      throw new ConfigError(
        s"BATCH_WINDOW_OVERLAP_SECONDS must be >= 0, got $overlap")
    val minStart = intOr(env, "", "MIN_WINDOW_START_TIMESTAMP", 0)
    if (minStart < 0)
      throw new ConfigError(
        s"MIN_WINDOW_START_TIMESTAMP must be >= 0, got $minStart")
    EtlSettings(
      batchWindowSizeSeconds = size,
      batchWindowOverlapSeconds = overlap,
      logLevel = get(env, "", "LOG_LEVEL").getOrElse("INFO"),
      tempDir = get(env, "", "TEMP_DIR").getOrElse("/tmp"),
      minWindowStartTimestamp = minStart)
  }

  /** load_config (config.py:203-242) over an explicit map. */
  def load(env: Map[String, String]): AppConfig =
    AppConfig(prometheus(env), clickhouse(env), etl(env))

  /** load_config bound to the process environment. */
  def loadFromEnv(): AppConfig = load(sys.env)
}
