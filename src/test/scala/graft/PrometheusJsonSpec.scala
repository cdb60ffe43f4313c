package graft

import graft.sources.PrometheusJson
import org.apache.spark.sql.functions._

/** Parser spec against the reference's ingestion edge cases
  * (etl_job.py:545-738): string values, NaN/Inf preservation, skip
  * counting, label sorting, µs timestamps, missing __name__, and
  * malformed responses. */
class PrometheusJsonSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    """{"status":"success","data":{"resultType":"matrix","result":[""" +
      """{"metric":{"__name__":"up","job":"api","instance":"i1"},""" +
      """"values":[[1700000000.123456,"1"],[1700000060,2.5]]},""" +
      """{"metric":{"zz":"9","aa":"1","__name__":"mem"},""" +
      """"values":[[1700000000,"NaN"],[1700000001,"Inf"],[1700000002,"-Inf"],""" +
      """[1700000003,"oops"],[1700000004,"1e-3"]]},""" +
      """{"metric":{"no_name":"x"},"values":[[1700000000,"7"]]}]}}"""

  private def parsed = PrometheusJson.parse(Seq(fixture).toDF("json"), "json")

  test("series × points explode with µs timestamps (R1)") {
    assert(parsed.count() == 8)
    val up = parsed.filter(col("name") === "up")
      .orderBy("ts_us").collect()
    assert(up.map(_.getAs[Long]("ts_us")).toSeq ==
      Seq(1700000000123456L, 1700000060000000L))
    // number-typed and string-typed values both parse (R2)
    assert(up.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.5))
  }

  test("labels: __name__ extracted, remaining keys sorted (R1)") {
    val mem = parsed.filter(col("name") === "mem").head()
    assert(mem.getAs[scala.collection.Seq[String]]("label_keys").toSeq ==
      Seq("aa", "zz"))
    assert(mem.getAs[scala.collection.Seq[String]]("label_values").toSeq ==
      Seq("1", "9"))
    // missing __name__ → empty name, like metric.get("__name__", "")
    assert(parsed.filter(col("name") === "").count() == 1)
  }

  test("NaN/Inf preserved, garbage skipped and counted (R2)") {
    val mem = parsed.filter(col("name") === "mem").orderBy("ts_us").collect()
    val vals = mem.map(r =>
      Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue))
    assert(vals(0).exists(_.isNaN))
    assert(vals(1).contains(Double.PositiveInfinity))
    assert(vals(2).contains(Double.NegativeInfinity))
    assert(vals(3).isEmpty) // "oops"
    assert(vals(4).contains(0.001)) // "1e-3" — Python float() breadth
    val stats = PrometheusJson.skipStats(parsed)
      .filter(col("name") === "mem").head()
    assert(stats.getAs[Long]("rows_count") == 4)
    assert(stats.getAs[Long]("skipped_count") == 1)
    assert(PrometheusJson.metricRows(parsed).count() == 7)
  }

  test("malformed / non-success / non-matrix responses yield no rows") {
    val bad = Seq(
      "not json at all",
      """{"status":"error","data":{"resultType":"matrix","result":[]}}""",
      """{"status":"success","data":{"resultType":"vector","result":[]}}"""
    ).toDF("json")
    assert(PrometheusJson.parse(bad, "json").count() == 0)
  }

  test("degenerate series shapes (reference stream-parse edge cases)") {
    // mirrors test_etl_job_stream_parse_handles_{empty_value_pairs,
    // single_value_pair, values_array_contains_scalars,
    // value_pair_null_element, metric_label_non_string_value}
    val degenerate = Seq(
      // empty values array → zero rows for the series
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"a"},"values":[]}]}}""",
      // incomplete pair [ts] → dropped, NOT skip-counted (only value
      // parse failures count, like the reference)
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"b"},"values":[[1700000000]]}]}}""",
      // scalar where a pair belongs → dropped
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"c"},"values":[42]}]}}""",
      // null value element → row kept but skip-counted
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"d"},"values":[[1700000000,null]]}]}}""",
      // numeric label value → stringified, like the reference's str()
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"e","code":500},"values":[[1700000000,"1"]]}]}}"""
    ).toDF("json")
    val p = PrometheusJson.parse(degenerate, "json")
    assert(p.filter(col("name").isin("a", "b", "c")).count() == 0)
    val d = p.filter(col("name") === "d").head()
    assert(!d.getAs[Boolean]("ok"))
    assert(PrometheusJson.skipStats(p).filter(col("name") === "d")
      .head().getAs[Long]("skipped_count") == 1)
    val e = p.filter(col("name") === "e").head()
    assert(e.getAs[scala.collection.Seq[String]]("label_values").toSeq ==
      Seq("500"))
  }

  test("tsvLines renders the reference's TabSeparated row (R3/R4)") {
    val up = PrometheusJson.metricRows(parsed)
      .filter(col("name") === "up" && col("ts_us") === 1700000000123456L)
    val line = PrometheusJson.tsvLines(up).head().getString(0)
    assert(line ==
      "1700000000.123456\tup\t['instance','job']\t['i1','api']\t1")
  }
}
