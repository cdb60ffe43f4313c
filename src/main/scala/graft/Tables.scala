package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated testdata lake.
  *
  * Column pruning / filter pushdown happen automatically because every
  * operator builds a declarative plan on top of these scans — `.explain`
  * on any query shows `ReadSchema` restricted to referenced columns.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as raw long (legacy flag) and truncate to µs with
    * integer `div` (double division would lose precision at ~1.7e18 ns).
    * DuckDB's `epoch_us` truncates identically, so oracle parity holds.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // also set at session build in Verify/Bench; this per-call set covers
    // driver-owned sessions and is idempotent (same constant value), so
    // concurrent callers cannot observe different configs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  /** Time-sliced events read with the range predicate applied to the RAW
    * nanos long BEFORE the µs conversion, so it reaches the parquet scan
    * as a real PushedFilter (row-group stats pruning) — a predicate on
    * the derived timestamp is only a post-scan DataFilter. Boundary math
    * keeps EXACT equivalence with `(µs > loUs) ∧ (µs ≤ hiUs)` under
    * floor division: µs = ns div 1000 > loUs ⟺ ns > loUs·1000+999, and
    * µs ≤ hiUs ⟺ ns ≤ hiUs·1000+999 (nonneg ns).
    */
  def eventsSlice(spark: SparkSession, dir: String,
      loUsExclusive: Long, hiUsInclusive: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") > loUsExclusive * 1000L + 999L &&
            col("ts") <= hiUsInclusive * 1000L + 999L)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.filter(unix_micros(col("ts")) > loUsExclusive &&
          unix_micros(col("ts")) <= hiUsInclusive)
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Fan a narrow scan out to default parallelism before compute-heavy
    * per-row stages (shingling, hashing, vector math). Small single-file
    * inputs otherwise pin the whole map stage to ONE core and every
    * consumer recomputes it. No-op when the scan already has enough
    * splits — the 100 TB case — so no full-data shuffle is added at
    * scale; `getNumPartitions` is static plan info, not a job.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
