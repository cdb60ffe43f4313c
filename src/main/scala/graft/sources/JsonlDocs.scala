package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus reader — the standard interchange format LLM training
  * corpora actually ship as (one JSON document per line: Common Crawl
  * derivatives, RedPajama/Dolma-style dumps). The Spark-side points:
  *
  *  - the schema is DECLARED, not inferred: schema inference is a full
  *    extra pass over 100 TB before the first real read, and a drifting
  *    upstream can silently widen a column mid-corpus. Declared schema +
  *    PERMISSIVE mode turns both problems into per-line accounting.
  *  - corrupt lines land in a corrupt-record column instead of killing
  *    the job; the validity verdict is `coalesce(..., false)` over the
  *    parsed fields because PERMISSIVE parsing yields a struct of NULL
  *    FIELDS (not a null row) for malformed input — a bare conjunction
  *    would be NULL, and `filter(!ok)` would silently drop exactly the
  *    rows the gate exists to catch (the round-5 EtlJob lesson, applied
  *    at the corpus edge).
  *  - [[readStrict]] is the reference-parity fail-fast mode
  *    (etl_job.py aborts the batch on the first malformed document):
  *    one cheap accounting aggregate, then abort-before-ingest — at
  *    100 TB you want the job dead at the audit, not half-written.
  *
  * Reading is scan-parallel (line-splittable input), the audit is one
  * map-side-combinable aggregate, and valid rows flow on with zero
  * extra shuffles.
  */
object JsonlDocs {

  /** The documents-table schema plus the corrupt-record channel. */
  private val CorruptCol = "_corrupt"
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(CorruptCol, StringType)))

  /** A line is a valid document iff it parsed AND carries the two
    * load-bearing fields. coalesce(false): see the object doc. */
  private val valid: org.apache.spark.sql.Column =
    coalesce(col(CorruptCol).isNull &&
      col("doc_id").isNotNull && col("text").isNotNull, lit(false))

  private def raw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Valid documents in the `documents` table shape (n_chars derived —
    * JSONL dumps rarely carry it and a declared-but-absent column is
    * simply NULL in every row). Invalid lines are dropped here; run
    * [[audit]] (or [[readStrict]]) when the drop count matters. */
  def read(spark: SparkSession, path: String): DataFrame =
    raw(spark, path)
      .filter(valid)
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("unk")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** One-row ingest accounting: total lines, valid docs, lines that
    * failed to parse at all, and lines that parsed but miss a
    * load-bearing field. The per-batch report an ingest job logs —
    * a jump in either drop class means upstream drift. */
  def audit(spark: SparkSession, path: String): DataFrame =
    raw(spark, path).agg(
      count(lit(1)).as("n_lines"),
      sum(valid.cast("long")).as("n_valid"),
      sum(col(CorruptCol).isNotNull.cast("long")).as("n_corrupt"),
      sum((col(CorruptCol).isNull &&
        (col("doc_id").isNull || col("text").isNull)).cast("long"))
        .as("n_missing_field"))

  /** Streaming variant of [[read]] — INCREMENTAL corpus ingest (new
    * JSONL dumps land in a directory; each is processed exactly once,
    * offsets checkpointed by Structured Streaming's file source). Same
    * declared schema, same coalesce(false) validity gate, applied
    * per micro-batch. */
  def stream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(dir)
      .filter(valid)
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("unk")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** Dedup-on-ingest over [[stream]]: drops any document whose CONTENT
    * was already ingested in this stream's lifetime — dropDuplicates on
    * the 60-bit content hash, so the state store holds 8 bytes per
    * distinct document ever seen, never text. That state is unbounded
    * by design (content dedup has no event-time horizon); at 100 TB
    * the production split is this stream-local dedup for the in-flight
    * window PLUS the batch incremental path against the settled corpus
    * (q_cross_dedup's base-collapses-to-fingerprints shape) run per
    * dump — the same two-tier design every large ingest uses. */
  def dedupedStream(docs: DataFrame): DataFrame =
    docs.withColumn("fp", graft.functions.Portable.hash60(col("text")))
      .dropDuplicates("fp")

  /** Reference-parity fail-fast read (etl_job.py:164's contract): any
    * invalid line aborts BEFORE any downstream consumption. */
  def readStrict(spark: SparkSession, path: String): DataFrame = {
    val a = audit(spark, path).head()
    val bad = a.getAs[Long]("n_lines") - a.getAs[Long]("n_valid")
    if (bad > 0)
      throw new IllegalStateException(
        s"JSONL batch rejected: $bad invalid of ${a.getAs[Long]("n_lines")} " +
          s"lines (${a.getAs[Long]("n_corrupt")} unparsable, " +
          s"${a.getAs[Long]("n_missing_field")} missing doc_id/text)")
    read(spark, path)
  }
}
