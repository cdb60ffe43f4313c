package graft

import graft.sinks.TsvSink
import graft.sources.{PrometheusJson, TsvSource}
import org.apache.spark.sql.functions._

/** The TSV reader is the exact inverse of the TSV sink: parse → render
  * → parse-back yields the original rows, including escapes and the
  * special float states. This is the backfill path (ClickHouse dump →
  * Spark) and the executable proof the R3/R4 encoding is a bijection.
  */
class TsvSourceSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: metric rows → TSV files → identical metric rows") {
    // labels exercise every escape: backslash, tab, newline, quote
    val fixture =
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"up","path":"C:\\dir","note":"a\tb","ml":"x\ny","q":"it's"},""" +
        """"values":[[1700000000.123456,"1"],[1700000060,"NaN"],""" +
        """[1700000120,"Inf"],[1700000180,"-Inf"],[1700000240,"0.125"]]}]}}"""
    val metrics = PrometheusJson.metricRows(
      PrometheusJson.parse(Seq(fixture).toDF("json"), "json"))
    val outDir = tmpDir("tsv_rt") + "/files"
    TsvSink.write(metrics, outDir)

    val back = TsvSource.read(spark, outDir)
    assert(back.count() == 5)
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("ts_us"), col("name"),
        array_join(col("label_keys"), "\u0001").as("k"),
        array_join(col("label_values"), "\u0001").as("v"),
        // NaN != NaN — compare the rendered form
        graft.functions.Portable.formatFloat(col("value")).as("fv"))
        .collect().map(_.toString).toSet
    assert(canon(back.toDF()) == canon(metrics))
    // escapes really survived: original label values recovered verbatim
    val row = back.head()
    assert(row.label_values.contains("C:\\dir"))
    assert(row.label_values.contains("a\tb"))
    assert(row.label_values.contains("x\ny"))
    assert(row.label_values.contains("it's"))
  }

  test("line parser units: timestamps, empty arrays, special floats") {
    val r = TsvSource.parseLine(
      "1700000000.000007\tm\t[]\t[]\t-inf")
    assert(r.ts_us == 1700000000000007L)
    assert(r.label_keys.isEmpty && r.label_values.isEmpty)
    assert(r.value.isNegInfinity)
    assert(TsvSource.parseLine("5\tm\t[]\t[]\tnan").value.isNaN)
    assert(TsvSource.parseLine("5.5\tm\t['a']\t['b']\t2").ts_us == 5500000L)
  }
}
