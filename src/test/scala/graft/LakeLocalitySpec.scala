package graft

import graft.sinks.LakeSink
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Proof for the second pruning tier (`LakeSink.writeClustered`): the
  * claim is not "the data is sorted" but "a selector query READS LESS"
  * — so the spec goes to the parquet FOOTERS and measures exactly what
  * predicate pushdown sees: per-row-group min/max statistics. A
  * one-name selector over the clustered layout must touch a fraction
  * of the row groups the unclustered layout forces it to read.
  */
class LakeLocalitySpec extends SparkSpec {

  /** (min, max) of the `name` column for every row group under dir. */
  private def nameRanges(dir: String): Seq[(String, String)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration())
      val r = ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "name").get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8,
            st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
              .toStringUsingUTF8)
        }
      } finally r.close()
    }
  }

  test("clustered write: selector touches a fraction of the row groups") {
    import spark.implicits._
    val metrics = Tables.events(spark, "/root/testdata/sf0.01")
      .select(unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"), col("value"))
    val plainDir = tmpDir("lake_plain") + "/m"
    val clustDir = tmpDir("lake_clust") + "/m"
    // the unclustered baseline at the SAME file count — an arbitrary
    // hash layout, the shape a shuffle-output write produces
    LakeSink.write(metrics.repartition(8), plainDir)
    LakeSink.writeClustered(metrics, clustDir, 8)

    // identical content (clustering must reorder, not change, the data)
    val a = spark.read.parquet(plainDir)
      .agg(count(lit(1)), sum(pmod(col("ts_us"), lit(1000000007L)))).head()
    val b = spark.read.parquet(clustDir)
      .agg(count(lit(1)), sum(pmod(col("ts_us"), lit(1000000007L)))).head()
    assert(a == b)

    val names = metrics.select("name").distinct()
      .as[String].collect().toSeq.sorted
    val plain = nameRanges(plainDir)
    val clust = nameRanges(clustDir)
    assert(plain.nonEmpty && clust.nonEmpty)
    def hits(rs: Seq[(String, String)], v: String): Int =
      rs.count { case (lo, hi) => lo <= v && v <= hi }
    val plainHits = names.map(hits(plain, _)).sum
    val clustHits = names.map(hits(clust, _)).sum
    // every one of the 8 unclustered files covers every name; the
    // range-clustered layout confines each name to few row groups
    assert(clustHits * 2 <= plainHits,
      s"clustered=$clustHits plain=$plainHits")
    // range clustering produces single-name row groups (min == max);
    // a hash layout cannot. The range boundaries come from sampling
    // seeded by the rdd id (suite-order-dependent), so a rare boundary
    // collapse can leave no single-name partition in ONE layout —
    // witness with a second, independently-sampled partition count
    // before calling the property false (flaked once in r10 at 508
    // tests when earlier suites shifted the rdd-id seed).
    val singleNameWitness =
      clust.exists { case (lo, hi) => lo == hi } || {
        val retryDir = tmpDir("lake_clust_retry") + "/m"
        LakeSink.writeClustered(metrics, retryDir, 10)
        nameRanges(retryDir).exists { case (lo, hi) => lo == hi }
      }
    assert(singleNameWitness,
      "range clustering must isolate at least one name in some layout")
    assert(!plain.exists { case (lo, hi) => lo == hi })

    // and the selector predicate actually reaches the scan
    val q = spark.read.parquet(clustDir)
      .filter(col("name") === names.head).select("ts_us")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("name"))
  }
}
