package graft

import graft.sinks.LakeSink
import graft.sources.PrometheusJson
import org.apache.spark.sql.functions._

/** R10 lake layout: metric rows land under day=YYYYMMDD partitions, a
  * day filter prunes at the partition level, and a replayed write stays
  * confined to its day directories. */
class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("daily partitioning: layout, pruning, per-day replay unit") {
    val outDir = tmpDir("lake") + "/metrics"
    // two days of points: 2023-11-14 and 2023-11-15 (UTC)
    val fixture =
      """{"status":"success","data":{"resultType":"matrix","result":[""" +
        """{"metric":{"__name__":"up","job":"a"},"values":[""" +
        """[1700000000,"1"],[1700086400,"2"]]}]}}"""
    val metrics = PrometheusJson.metricRows(
      PrometheusJson.parse(Seq(fixture).toDF("json"), "json"))
      .drop("label_keys", "label_values") // lake schema: flat columns
    LakeSink.write(metrics, outDir)

    val days = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.startsWith("day=")).sorted.toSeq
    assert(days == Seq("day=20231114", "day=20231115"))

    // a day-filtered read prunes to the partition (PartitionFilters)
    val read = spark.read.parquet(outDir)
    val oneDay = read.filter(col("day") === 20231115)
    assert(oneDay.count() == 1)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"))

    // replay OVERWRITES exactly the day directories in the batch
    // (dynamic partition overwrite) — the per-day replay unit; row
    // count stays stable instead of duplicating
    LakeSink.write(metrics, outDir)
    assert(spark.read.parquet(outDir).count() == 2)
    assert(new java.io.File(outDir).listFiles()
      .count(_.getName.startsWith("day=")) == 2)

    // replaying ONE day must not clobber the other day's directory
    LakeSink.write(metrics.filter(col("ts_us") >= 1700086400000000L), outDir)
    assert(spark.read.parquet(outDir).count() == 2)
  }
}
