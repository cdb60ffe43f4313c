package graft.sources

import graft.config.PrometheusSettings
import graft.logging.StructuredLogger

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Duration
import java.util.Base64

/** Errors carrying the reference's diagnostic context
  * (prometheus_client.py:165-189): status code + a bounded response
  * preview, so operators see WHY the query failed without a debugger. */
final class PrometheusHttpException(
    val statusCode: Int,
    val url: String,
    val responsePreview: String,
    msg: String) extends RuntimeException(msg)

/** Live Prometheus `query_range` fetcher — the reference's
  * PrometheusClient.query_range_to_file (prometheus_client.py:126-209)
  * re-expressed over the JDK HTTP client:
  *
  *  - GET `{base}/api/v1/query_range?query=&start=&end=&step=`
  *  - basic auth when `user` is set (password already normalized to ""
  *    by the config loader — config.py:59)
  *  - request timeout from config; timeouts/connection errors are
  *    logged with the reference's structured fields and rethrown
  *  - non-2xx → [[PrometheusHttpException]] with a ≤1000-char body
  *    preview (prometheus_client.py:170-189)
  *  - the body STREAMS to the target file (InputStream → Files.copy):
  *    a 100 GB response never resides in memory, matching the
  *    reference's iter_content loop
  *
  * Division of labor at scale: ONE fetch per batch window lands the
  * response in the drop-directory; Spark then parses it in parallel
  * ([[PrometheusJson]]). The fetch is driver-side I/O by design — the
  * same shape as the reference — while all row-level work is
  * distributed. Fetching shards (per-tenant/per-matcher expressions)
  * in parallel is a loop over this client.
  */
final class PrometheusHttpClient(
    config: PrometheusSettings,
    logger: StructuredLogger = new StructuredLogger("prometheus_client")) {

  private val baseUrl = config.url.replaceAll("/+$", "")

  private val client: HttpClient = {
    val b = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(config.timeoutSeconds.toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
    // config.insecure disables TLS verification (reference: verify=False).
    // The JDK needs a permissive SSLContext for that.
    if (config.insecure) b.sslContext(Insecure.trustAllContext)
    b.build()
  }

  private def authHeader: Option[String] = config.user.map { u =>
    val cred = u + ":" + config.password.getOrElse("")
    "Basic " + Base64.getEncoder.encodeToString(
      cred.getBytes(StandardCharsets.UTF_8))
  }

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** query_range_to_file (prometheus_client.py:126-209). */
  def queryRangeToFile(expr: String, start: Long, end: Long, step: String,
                       filePath: String): Unit = {
    val url = s"$baseUrl/api/v1/query_range?query=${enc(expr)}" +
      s"&start=$start&end=$end&step=${enc(step)}"
    val reqB = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(config.timeoutSeconds.toLong))
      .GET()
    authHeader.foreach(reqB.header("Authorization", _))

    val response =
      try client.send(reqB.build(), HttpResponse.BodyHandlers.ofInputStream())
      catch {
        case e: java.net.http.HttpTimeoutException =>
          logger.error("Prometheus query_range timeout", Map(
            "prometheus_client.query_range_timeout.error" -> e.toString,
            "prometheus_client.query_range_timeout.expression" -> expr,
            "prometheus_client.query_range_timeout.url" -> url,
            "prometheus_client.query_range_timeout.timeout" -> config.timeoutSeconds,
            "prometheus_client.query_range_timeout.window_seconds" -> (end - start),
            "prometheus_client.query_range_timeout.step" -> step))
          throw e
        case e: java.net.ConnectException =>
          logger.error("Prometheus query_range connection error", Map(
            "prometheus_client.query_range_connection_error.error" -> e.toString,
            "prometheus_client.query_range_connection_error.expression" -> expr,
            "prometheus_client.query_range_connection_error.url" -> url))
          throw e
        case e: java.io.IOException =>
          logger.error("Prometheus query_range request failed", Map(
            "prometheus_client.query_range_request_failed.error" -> e.toString,
            "prometheus_client.query_range_request_failed.error_type" ->
              e.getClass.getSimpleName,
            "prometheus_client.query_range_request_failed.expression" -> expr,
            "prometheus_client.query_range_request_failed.url" -> url))
          throw e
      }

    val status = response.statusCode()
    if (status < 200 || status >= 300) {
      // raise_for_status with body preview (prometheus_client.py:165-189)
      val preview = {
        val buf = new Array[Byte](1000)
        val n = math.max(0, response.body().readNBytes(buf, 0, 1000))
        response.body().close()
        new String(buf, 0, n, StandardCharsets.UTF_8)
      }
      logger.error("Prometheus query failed", Map(
        "prometheus_client.query_failed.error" -> s"HTTP $status",
        "prometheus_client.query_failed.error_type" -> "HTTPStatusError",
        "prometheus_client.query_failed.expression" -> expr,
        "prometheus_client.query_failed.url" -> url,
        "prometheus_client.query_failed.status_code" -> status,
        "prometheus_client.query_failed.response_preview" -> preview))
      throw new PrometheusHttpException(status, url, preview,
        s"Prometheus query_range returned HTTP $status")
    }

    // stream the body to the file (prometheus_client.py:191-209)
    try {
      val body = response.body()
      try Files.copy(body, Paths.get(filePath),
        StandardCopyOption.REPLACE_EXISTING)
      finally body.close()
    } catch {
      case e: java.io.IOException =>
        logger.error("Failed to write Prometheus response to file", Map(
          "prometheus_client.query_range_to_file_failed.error" -> e.toString,
          "prometheus_client.query_range_to_file_failed.file_name" ->
            Paths.get(filePath).getFileName.toString,
          "prometheus_client.query_range_to_file_failed.expression" -> expr))
        throw e
    }
    ()
  }
}

/** Trust-all SSLContext for `insecure=true` — TLS verification OFF by
  * explicit operator opt-in, mirroring the reference's `verify=False`. */
private[graft] object Insecure {
  lazy val trustAllContext: javax.net.ssl.SSLContext = {
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(
            c: Array[java.security.cert.X509Certificate], t: String): Unit = ()
        override def checkServerTrusted(
            c: Array[java.security.cert.X509Certificate], t: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      }), new java.security.SecureRandom())
    ctx
  }
}
