package graft

import graft.sinks.LakeSink
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Contract for [[LakeSink.compact]]: fewer files, identical rows,
  * locality PRESERVED (the footer row-group stats stay selector-tight
  * after the rewrite), and idempotence (a second run is a no-op). */
class LakeCompactionSpec extends SparkSpec {

  private def parquetFiles(dayDir: java.io.File): Seq[java.io.File] =
    dayDir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq

  private def dayDirs(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .toSeq.sortBy(_.getName)

  private def contentSig(dir: String) =
    spark.read.parquet(dir)
      .agg(count(lit(1)),
        sum(pmod(col("ts_us"), lit(1000000007L))),
        sum(graft.functions.Portable.hash60(col("name")) % 1000003L))
      .head()

  test("compact: fewer files, same rows, locality kept, idempotent") {
    val metrics = Tables.events(spark, "/root/testdata/sf0.01")
      .select(unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"), col("value"))
    val dir = tmpDir("lake_compact") + "/m"
    // the small-file shape a micro-batching ingester produces
    LakeSink.write(metrics.repartition(16), dir)
    val before = contentSig(dir)
    val filesBefore = dayDirs(dir).map(parquetFiles(_).size)
    assert(filesBefore.forall(_ == 16), s"fixture: $filesBefore")

    // target far above any day's bytes → 1 file per day
    val reports = LakeSink.compact(spark, dir, targetBytes = 1L << 30)
    assert(reports.nonEmpty && reports.forall(_.compacted))
    assert(reports.forall(r => r.filesBefore == 16 && r.filesAfter == 1))
    val days = dayDirs(dir)
    assert(days.forall(parquetFiles(_).size == 1))
    // no temp/backup residue from the swap
    assert(!new java.io.File(dir).listFiles()
      .exists(f => f.getName.startsWith(".compact-")
        || f.getName.startsWith(".old-")))

    // identical content (count + two order-free checksums)
    assert(contentSig(dir) == before)

    // idempotent: already at target → untouched, reported as such
    val again = LakeSink.compact(spark, dir, targetBytes = 1L << 30)
    assert(again.forall(r => !r.compacted && r.filesAfter == r.filesBefore))
    assert(contentSig(dir) == before)
  }

  test("compact: below-bytes target splits AND keeps the clustering tier") {
    val metrics = Tables.events(spark, "/root/testdata/sf0.01")
      .select(unix_micros(col("ts")).as("ts_us"),
        col("event_type").as("name"), col("value"))
    val dir = tmpDir("lake_compact2") + "/m"
    LakeSink.write(metrics.repartition(16), dir)
    val bytes = dayDirs(dir).map(d => parquetFiles(d).map(_.length).sum)
    // a target that wants ~6 files for the largest day — enough range
    // partitions that the (name, ts_us) ordering shows in the footers
    val target = bytes.max / 6 + 1
    val reports = LakeSink.compact(spark, dir, target)
    reports.zip(dayDirs(dir)).zip(bytes).foreach {
      case ((r, d), b) =>
        // want recomputed from the PRE-compaction bytes snapshot; range
        // partitions can come out empty (no file), so ≤ want, and the
        // report must match the directory
        val want = math.max(1L, (b + target - 1) / target).toInt
        assert(r.filesAfter == parquetFiles(d).size, r.day)
        if (r.compacted) {
          assert(r.filesAfter <= want, s"${r.day}: want $want, got $r")
          assert(r.filesAfter < r.filesBefore, r.day)
        }
    }
    assert(reports.exists(_.compacted))

    // locality preserved: the rewrite re-applies the (name, ts_us)
    // sort, so with several range partitions per day, single-name
    // row groups exist in the compacted footers — the pruning tier a
    // plain coalesce would have destroyed
    val ranges = dayDirs(dir).flatMap(parquetFiles).flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration())
      val r = ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == "name").get
        val st = c.getStatistics
        (st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8,
          st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8)
      } finally r.close()
    }
    assert(ranges.exists { case (lo, hi) => lo == hi },
      s"compaction destroyed the clustering tier: $ranges")
  }
}
