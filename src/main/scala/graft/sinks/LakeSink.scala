package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily-partitioned metrics lake writer — R10 as an actual sink, not
  * just a statistic: the reference's ClickHouse table declares
  * `PARTITION BY toYYYYMMDD(timestamp)`; the Spark-native equivalent is
  * a parquet lake partitioned by the same day key, which is what makes
  * time-range queries at 100 TB prune partitions at the FILE level
  * (`.explain` shows PartitionFilters on `day`).
  *
  * Two deliberate choices:
  *  - DYNAMIC partition overwrite: a replayed write replaces exactly
  *    the day directories present in the batch and touches nothing
  *    else — the per-day replay unit the reference gets from dropping
  *    and reloading a ClickHouse partition. (Plain append would
  *    duplicate rows on replay.)
  *  - the day key derives from UTC epoch-day integer arithmetic, not
  *    `date_format` of a timestamp, which renders in the SESSION
  *    timezone — a non-UTC caller would otherwise fragment the same
  *    instant across different day partitions than toYYYYMMDD.
  */
object LakeSink {
  private def withDay(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("day",
        date_format(
          date_add(lit(java.sql.Date.valueOf("1970-01-01")),
            // floor, not int-cast truncation: pre-1970 instants must
            // land in their own day, like toYYYYMMDD
            floor(col("ts_us") / 86400000000d).cast("int")),
          "yyyyMMdd").cast("int"))

  def write(metrics: DataFrame, dir: String): Unit =
    withDay(metrics)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(dir)

  /** LOCALITY-CLUSTERED variant of [[write]] — the second pruning tier.
    * Day partitioning prunes at the DIRECTORY level; within a day,
    * selector queries (`name = 'up'`, the reference's per-metric read
    * path) still scan every file unless the files carry tight min/max
    * statistics. Range-partitioning on (day, name, ts_us) + sorting
    * within partitions gives each output file — and each parquet ROW
    * GROUP inside it — a narrow `name` range and, within a name, a
    * contiguous `ts_us` range, so parquet predicate pushdown skips
    * whole row groups from the FOOTER alone (`LakeLocalitySpec` proves
    * it on the footers: a one-name selector touches a fraction of the
    * row groups an unclustered layout makes it read). This is the
    * Z-order-lite that covers the two real access patterns (by metric,
    * by time) without a space-filling-curve dependency; the range
    * exchange is one extra corpus shuffle paid ONCE at write, amortized
    * over every subsequent scan — the same write-once/read-many trade
    * as bucketing (BucketedJoinSpec).
    *
    * `numFiles` sizes the range partitioning: at 100 TB a caller
    * derives it from input volume / target file size (e.g. ~1 GB
    * files); sort keys must lead with `day` so each task writes into
    * few day directories (dynamic partition write stays append-cheap).
    */
  /** One day partition's compaction outcome. `compacted = false` means
    * the day was already at (or under) its target file count — the
    * idempotence signal a scheduled compactor keys on. */
  final case class CompactReport(day: String, filesBefore: Int,
      filesAfter: Int, bytes: Long, compacted: Boolean)

  /** Small-file compaction for a [[write]]/[[writeClustered]] lake —
    * the third lake-maintenance tier after partitioning and
    * clustering. Streaming ingest (MetricsStream's per-micro-batch
    * dynamic overwrite) and frequent small replays accumulate files
    * far below the parquet sweet spot; at 100 TB the cost is not disk
    * but PLANNING and OPEN overhead — a 1000-executor scan of 10M
    * 1 MB files spends longer listing and opening than reading.
    *
    * Per day directory: if the file count exceeds
    * ceil(bytes / targetBytes), rewrite the day at that file count,
    * re-applying the [[writeClustered]] sort (name, ts_us) so
    * compaction PRESERVES the row-group locality tier (compacting with
    * a plain coalesce would silently destroy the footer-stats pruning
    * LakeLocalitySpec proves). Days already at target are left
    * untouched — re-running the compactor is a no-op, and it never
    * cascades (output of one run is under target by construction).
    *
    * The swap is move-old-aside / move-new-in / delete-old via
    * filesystem renames — atomic on HDFS and POSIX; on object stores
    * renames are copies, where the same report-driven loop runs
    * against a manifest/table layer instead (the day-granular unit and
    * the idempotence contract are the portable parts).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long): Seq[CompactReport] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val root = new java.io.File(dir)
    val days = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .sortBy(_.getName)
    days.toSeq.map { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      val bytes = files.map(_.length).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= want)
        CompactReport(d.getName, files.length, files.length, bytes, false)
      else {
        val tmp = new java.io.File(root, s".compact-${d.getName}")
        spark.read.parquet(d.getAbsolutePath)
          .repartitionByRange(want, col("name"), col("ts_us"))
          .sortWithinPartitions("name", "ts_us")
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val bak = new java.io.File(root, s".old-${d.getName}")
        java.nio.file.Files.move(d.toPath, bak.toPath)
        java.nio.file.Files.move(tmp.toPath, d.toPath)
        deleteRecursively(bak)
        val after = d.listFiles().count(_.getName.endsWith(".parquet"))
        CompactReport(d.getName, files.length, after, bytes, true)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  def writeClustered(metrics: DataFrame, dir: String, numFiles: Int): Unit =
    withDay(metrics)
      .repartitionByRange(numFiles, col("day"), col("name"), col("ts_us"))
      .sortWithinPartitions("day", "name", "ts_us")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(dir)
}
