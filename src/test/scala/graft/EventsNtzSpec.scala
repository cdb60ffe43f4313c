package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIMESTAMP_NTZ events coverage (ADVICE r6): the checked-in testdata is
  * TIMESTAMP(NANOS), so the NTZ branches of [[Tables.normalizeEvents]]
  * and [[Tables.sliceEvents]] were previously untested — a regression in
  * the NTZ literal/boundary math or the NTZ→LTZ cast would go uncaught.
  * Here the SAME instants are materialized through three raw encodings —
  * nanos-long (the testdata shape), TIMESTAMP_NTZ read back from a real
  * parquet fixture, and session-UTC TimestampType — and all three must
  * agree row-for-row after normalization, including the (lo, hi]
  * boundary rows of the slice.
  */
class EventsNtzSpec extends SparkSpec {

  // instants in MICROseconds, straddling the slice boundaries below:
  // lo and lo+1 (exclusive bound), hi and hi+1 (inclusive bound)
  private val loUs = 1700000000000000L
  private val hiUs = 1700000600000000L
  private val micros = Seq(
    loUs - 1, loUs, loUs + 1, loUs + 500, hiUs - 1, hiUs, hiUs + 1)

  private def longRaw: DataFrame = {
    import spark.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) } // nanos, like testdata
      .toDF("event_id", "ts")
  }

  private def ntzRaw: DataFrame = {
    // a REAL parquet round-trip: write TIMESTAMP_NTZ, read it back with
    // an explicit NTZ schema (the driver-owned-session shape the
    // defensive branch exists for)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import spark.implicits._
    val dir = tmpDir("ntz-events")
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType))))
      .parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    raw
  }

  private def ltzRaw: DataFrame = {
    import spark.implicits._
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
  }

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("normalizeEvents: all three ts encodings yield identical instants") {
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toSet
    assert(rows(Tables.normalizeEvents(longRaw)) == expected, "nanos-long path")
    assert(rows(Tables.normalizeEvents(ntzRaw)) == expected, "NTZ path")
    assert(rows(Tables.normalizeEvents(ltzRaw)) == expected, "LTZ path")
  }

  test("sliceEvents: (lo, hi] boundary membership identical across encodings") {
    // expected slice: strictly after lo, up to and including hi
    val expected = micros.zipWithIndex
      .collect { case (us, i) if us > loUs && us <= hiUs => (i.toLong, us) }
      .toSet
    assert(expected.nonEmpty && expected.size < micros.size) // real boundaries
    assert(rows(Tables.sliceEvents(longRaw, loUs, hiUs)) == expected,
      "nanos-long slice")
    assert(rows(Tables.sliceEvents(ntzRaw, loUs, hiUs)) == expected,
      "NTZ slice")
    assert(rows(Tables.sliceEvents(ltzRaw, loUs, hiUs)) == expected,
      "LTZ slice")
  }

  test("end-to-end events() on an NTZ-written fixture dir") {
    // Tables.events disables NTZ inference, so the same fixture read
    // end-to-end arrives as LTZ and must still yield the same instants
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import spark.implicits._
    val dir = tmpDir("ntz-events-e2e")
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toSet
    assert(rows(Tables.events(spark, dir)) == expected)
  }
}
