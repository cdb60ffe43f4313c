package graft

import graft.sources.JsonlDocs
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** JSONL corpus reader: valid-row shaping, per-class drop accounting,
  * and the reference-parity fail-fast contract — including the
  * PERMISSIVE null-fields trap (a malformed line must be COUNTED
  * dropped, not silently NULL-filtered).
  */
class JsonlDocsSpec extends SparkSpec {

  private def writeJsonl(lines: Seq[String]): String = {
    val dir = tmpDir("jsonl_docs")
    Files.write(Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    s"$dir/part0.jsonl"
  }

  private val good = Seq(
    """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}""",
    """{"doc_id": 2, "text": "gamma", "source": "books"}""",
    """{"doc_id": 3, "text": ""}""")
  private val corrupt = """{"doc_id": 4, "text": "unterminated"""
  private val missingField = """{"doc_id": 5, "lang": "en"}"""

  test("read: valid docs shaped to the documents schema, defaults filled") {
    val path = writeJsonl(good :+ corrupt :+ missingField)
    val rows = JsonlDocs.read(spark, path).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[String]("lang"),
          r.getAs[String]("source"), r.getAs[Long]("n_chars")))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == (("alpha beta", "en", "web", 10L)))
    assert(rows(2L) == (("gamma", "unk", "books", 5L)))
    assert(rows(3L) == (("", "unk", "unknown", 0L)))
  }

  test("audit: corrupt and missing-field lines counted per class") {
    val path = writeJsonl(good :+ corrupt :+ missingField)
    val a = JsonlDocs.audit(spark, path).head()
    assert(a.getAs[Long]("n_lines") == 5L)
    assert(a.getAs[Long]("n_valid") == 3L)
    assert(a.getAs[Long]("n_corrupt") == 1L)
    assert(a.getAs[Long]("n_missing_field") == 1L)
  }

  test("readStrict: any invalid line aborts before consumption") {
    val bad = writeJsonl(good :+ corrupt)
    val e = intercept[IllegalStateException] {
      JsonlDocs.readStrict(spark, bad)
    }
    assert(e.getMessage.contains("1 invalid of 4"))
    val clean = writeJsonl(good)
    assert(JsonlDocs.readStrict(spark, clean).count() == 3L)
  }

  test("stream: incremental ingest with cross-micro-batch content dedup") {
    val inDir = tmpDir("jsonl_stream_in")
    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(inDir, name),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    drop("a.jsonl", Seq(
      """{"doc_id": 1, "text": "first doc"}""",
      """{"doc_id": 2, "text": "second doc"}"""))
    val q = JsonlDocs.dedupedStream(JsonlDocs.stream(spark, inDir))
      .writeStream.format("memory").queryName("jsonl_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream_test").count() == 2L)
      // a later dump re-ships doc 1's CONTENT under a new id, adds one
      // genuinely new doc, and carries a corrupt line
      drop("b.jsonl", Seq(
        """{"doc_id": 7, "text": "first doc"}""",
        """{"doc_id": 3, "text": "third doc"}""",
        """{"doc_id": 8, "text": "broken"""))
      q.processAllAvailable()
      val ids = spark.table("jsonl_stream_test").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 2L, 3L),
        s"re-shipped content must dedup across micro-batches: $ids")
    } finally q.stop()
  }

  test("round-trip: JSONL-read docs drive a real operator unchanged") {
    // the reader's output must be a drop-in documents frame: hash the
    // same texts through q_dedup_exact's grouping shape
    val path = writeJsonl(Seq(
      """{"doc_id": 10, "text": "same text"}""",
      """{"doc_id": 11, "text": "same text"}""",
      """{"doc_id": 12, "text": "other"}"""))
    val docs = JsonlDocs.read(spark, path)
    val groups = docs
      .groupBy(graft.functions.Portable.hash60(
        org.apache.spark.sql.functions.col("text")).as("h"))
      .count().collect().map(_.getAs[Long]("count")).sorted.toSeq
    assert(groups == Seq(1L, 2L))
  }
}
