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
  * writes (and ClickHouse `SELECT ... FORMAT TabSeparated` dumps): the
  * exact inverse of the R3/R4 rendering — tab-split, unescape, array
  * literal lexing, float parse with lowercase nan/inf. Exists so a
  * ClickHouse deployment can be BACKFILLED through Spark from its own
  * dumps, and so the escaping bijection is proven executable, not just
  * asserted (TsvSourceSpec round-trips rendered rows back to equality).
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
    val tsUs =
      if (dot < 0) secs.toLong * 1000000L
      else secs.substring(0, dot).toLong * 1000000L +
        (secs.substring(dot + 1) + "000000").substring(0, 6).toLong
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

  /** Inverse of the R3 escape: `\\`, `\t`, `\n`, `\'` → originals. */
  private[sources] def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\')
          case 't' => b.append('\t')
          case 'n' => b.append('\n')
          case '\'' => b.append('\'')
          case other => b.append('\\').append(other)
        }
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
      while (s.charAt(i) != '\'') {
        if (s.charAt(i) == '\\') {
          s.charAt(i + 1) match {
            case '\\' => b.append('\\')
            case 't' => b.append('\t')
            case 'n' => b.append('\n')
            case '\'' => b.append('\'')
            case other => b.append('\\').append(other)
          }
          i += 2
        } else { b.append(s.charAt(i)); i += 1 }
      }
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
