package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (read as raw long via the
    * legacy flag and truncated to µs with integer `div` — double division
    * would lose precision at ~1.7e18 ns) and TIMESTAMP(MICROS) without a
    * timezone (which Spark ≥3.4 infers as TIMESTAMP_NTZ by default,
    * breaking `unix_micros` consumers). Both are normalized here to a
    * session-UTC TimestampType column: NTZ inference is disabled before
    * the read, and a defensive NTZ→LTZ cast covers driver-owned sessions
    * whose reader cached the NTZ schema. DuckDB reads the same file as a
    * naive-UTC timestamp, so `epoch_us` oracle parity holds either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // also set at session build in Verify/Bench; these per-call sets cover
    // driver-owned sessions and are idempotent (same constant values), so
    // concurrent callers cannot observe different configs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // NTZ→LTZ normalization below assumes a UTC session zone; pin it
    // per-call (idempotent, like the two reader confs) so a driver-owned
    // non-UTC session cannot shift instants by its zone offset
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeEvents(table(spark, dir, "events"))
  }

  /** The ts-encoding normalization, split out so specs can drive each
    * branch with a raw frame of the matching schema (the checked-in
    * testdata is TIMESTAMP(NANOS), so only the LongType branch is
    * exercised end-to-end otherwise). Assumes a UTC session zone —
    * pinned by the callers above. */
  private[graft] def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
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
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sliceEvents(table(spark, dir, "events"), loUsExclusive, hiUsInclusive)
  }

  /** The per-encoding slice logic behind [[eventsSlice]], spec-drivable
    * like [[normalizeEvents]]. */
  private[graft] def sliceEvents(raw: DataFrame,
      loUsExclusive: Long, hiUsInclusive: Long): DataFrame = {
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") > loUsExclusive * 1000L + 999L &&
            col("ts") <= hiUsInclusive * 1000L + 999L)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // filter on the raw NTZ column against constant-folded NTZ
        // literals so the range reaches the scan as a PushedFilter;
        // NTZ↔LTZ casts use the session zone (UTC), preserving instants
        raw.filter(col("ts") > timestamp_micros(lit(loUsExclusive)).cast(TimestampNTZType) &&
            col("ts") <= timestamp_micros(lit(hiUsInclusive)).cast(TimestampNTZType))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        // TimestampType (the NTZ-inference-disabled read): compare the
        // column against timestamp_micros literals — foldable, so the
        // range constant-folds and reaches the scan as a PushedFilter
        raw.filter(col("ts") > timestamp_micros(lit(loUsExclusive)) &&
          col("ts") <= timestamp_micros(lit(hiUsInclusive)))
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
