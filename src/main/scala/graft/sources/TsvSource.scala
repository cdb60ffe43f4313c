package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One parsed TabSeparated metric row (the reference's ClickHouse
  * metrics-table schema, R1). */
case class TsvMetricRow(
    ts_us: Long,
    name: String,
    label_keys: Seq[String],
    label_values: Seq[String],
    value: Double)

/** Reader for the TabSeparated metric files [[graft.sinks.TsvSink]]
  * writes: the exact inverse of the R3/R4 rendering — tab-split,
  * unescape, array literal lexing, float parse with lowercase nan/inf —
  * proven a bijection in TsvSourceSpec (render → parse → equality).
  * This is the backfill path for the reference's own output.
  *
  * Scope note: the escape set mirrors the REFERENCE's
  * `_escape_tabseparated_chars` (backslash, tab, newline — it too skips
  * `\r`, `\b`, `\f`, `\0`); this reader additionally DECODES those
  * sequences defensively for dumps produced by ClickHouse itself, but a
  * value containing a raw carriage return is not round-trippable by
  * either the reference or this sink (text line splitting consumes it).
  *
  * Implementation is a typed per-partition JVM parser — a parser is
  * inherently row-wise imperative logic, the one place `mapPartitions`
  * beats expressions (SURVEY §5 preference order, last resort, used
  * once).
  */
object TsvSource {

  def read(spark: SparkSession, dir: String): Dataset[TsvMetricRow] = {
    import spark.implicits._
    spark.read.textFile(dir).mapPartitions(_.map(parseLine))
  }

  /** DataFrame view with the same column shape PrometheusJson.parse
    * produces (minus raw_value/ok — TSV rows are post-skip). */
  def readMetrics(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).toDF()

  private[graft] def parseLine(line: String): TsvMetricRow = {
    val f = splitFields(line)
    require(f.length == 5, s"expected 5 TSV fields, got ${f.length}: $line")
    val secs = f(0)
    val dot = secs.indexOf('.')
    // sign-aware: the fraction always moves AWAY from zero with the
    // integer part ("-1.5" = −1,500,000 µs, not −1e6 + 5e5)
    val tsUs =
      if (dot < 0) secs.toLong * 1000000L
      else {
        val whole = secs.substring(0, dot)
        val frac = (secs.substring(dot + 1) + "000000").substring(0, 6).toLong
        val mag = whole.replace("-", "").toLong * 1000000L + frac
        if (whole.startsWith("-")) -mag else mag
      }
    TsvMetricRow(
      ts_us = tsUs,
      name = unescape(f(1)),
      label_keys = parseChArray(f(2)),
      label_values = parseChArray(f(3)),
      value = parseFloat(f(4)))
  }

  /** Split on RAW tabs only — escaped `\t` sequences are data. */
  private def splitFields(line: String): Array[String] =
    line.split("\t", -1)

  /** Decode one escape char (the sink's set plus ClickHouse's extras). */
  private def decodeEscape(c: Char): String = c match {
    case '\\' => "\\"
    case 't' => "\t"
    case 'n' => "\n"
    case '\'' => "'"
    case 'r' => "\r"
    case 'b' => "\b"
    case 'f' => "\f"
    case '0' => "\u0000"
    case other => "\\" + other
  }

  /** Inverse of the R3 escape. */
  private[sources] def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        b.append(decodeEscape(s.charAt(i + 1)))
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Lex a ClickHouse array literal `['a','b']` back to elements. */
  private[sources] def parseChArray(s: String): Seq[String] = {
    require(s.length >= 2 && s.charAt(0) == '[' && s.last == ']',
      s"not an array literal: $s")
    if (s == "[]") return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 1
    while (i < s.length - 1) {
      require(s.charAt(i) == '\'', s"expected quote at $i in $s")
      i += 1
      val b = new java.lang.StringBuilder
      while (i < s.length - 1 && s.charAt(i) != '\'') {
        if (s.charAt(i) == '\\') {
          require(i + 1 < s.length - 1, s"dangling escape at $i in $s")
          b.append(decodeEscape(s.charAt(i + 1)))
          i += 2
        } else { b.append(s.charAt(i)); i += 1 }
      }
      require(i < s.length - 1 && s.charAt(i) == '\'',
        s"unterminated element at $i in $s")
      i += 1 // closing quote
      out += b.toString
      if (i < s.length - 1) {
        require(s.charAt(i) == ',', s"expected comma at $i in $s")
        i += 1
      }
    }
    out.toSeq
  }

  /** Inverse of R4: lowercase nan/inf plus plain decimal notation. */
  private[sources] def parseFloat(s: String): Double = s match {
    case "nan" => Double.NaN
    case "inf" => Double.PositiveInfinity
    case "-inf" => Double.NegativeInfinity
    case other => other.toDouble
  }
}
