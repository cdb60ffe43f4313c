package graft.streaming

import graft.functions.Portable.hash60
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** One (doc, band) assignment row for the streaming LSH index. */
case class BandDoc(bandId: Long, bandHash: Long, docId: Long)

/** Keyed state for one LSH bucket: the doc ids indexed so far. */
case class BucketMembers(docIds: Seq[Long])

/** A streaming near-dup candidate: `docA < docB` share LSH band
  * `bandId`. The same pair can surface from several bands (downstream
  * dedups on (docA, docB), exactly like the batch band join's groupBy). */
case class CandidatePair(docA: Long, docB: Long, bandId: Long)

/** STREAMING near-duplicate candidate detection — the incremental twin
  * of the batch MinHash/LSH pipeline (`Dedup.qMinhashLsh`,
  * `Dedup.scala`): as documents arrive, each is checked against
  * everything already ingested and candidate near-dup pairs are emitted
  * the moment the second member shows up. This is what an ingest
  * pipeline actually runs — re-running the batch band self-join per
  * crawl dump is a full-corpus job; here the corpus lives as KEYED
  * STREAMING STATE (one group per LSH bucket, holding only 8-byte doc
  * ids) and each micro-batch touches only the buckets its documents
  * land in.
  *
  * Parity contract (spec'd in `StreamDedupSpec`): the signature math is
  * VALUE-IDENTICAL to the batch path — distinct 3-shingles, h30 =
  * hash60(shingle) mod 2³⁰, sᵢ = min((h30·aᵢ+bᵢ) mod P) with the SAME
  * plan-time coefficients ([[graft.operators.Dedup.mhA]]), 4×4 banding
  * with the same band-hash formula — so the streamed candidate-pair
  * set equals `q_minhash_lsh`'s on the same corpus, no matter how the
  * documents are split across micro-batches.
  *
  * Scale shape: the in-row signature is per-document HOF math (the
  * documented per-row-lambda case — each doc computes its own 16 mins;
  * the batch job's corpus-wide posexplode+window form does not apply
  * to a per-micro-batch stream). State per bucket is capped at
  * [[Dedup]]'s hot-bucket bound — the batch job drops over-cap buckets
  * retroactively, a stream can only stop ADMITTING once full, so the
  * cap is prospective here (identical behavior while under the cap,
  * i.e. everywhere at test SF). Total state = one 8-byte id per
  * indexed (doc, band): 4·n ids regardless of stream length — the
  * store spills via the state backend, never the JVM heap.
  */
object DedupStream {

  /** Per-document 4-band MinHash hashes computed IN-ROW (no shuffle,
    * no corpus pass): one row per (doc, band). Docs under 3 tokens
    * have no shingles and drop out, like the batch signature frame. */
  def withBands(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val shs = array_distinct(transform(
      sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
        element_at(w, i + 2))))
    val h30s = transform(shs, s => hash60(s) % 1073741824L)
    val sigs = (0 until 16).map(i =>
      array_min(transform(h30s,
        h => (h * Dedup.mhA(i) + Dedup.mhB(i)) % Dedup.P)))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b.toLong).as("band_id"),
        hash60(concat_ws(",",
          (0 until 4).map(j => sigs(b * 4 + j).cast("string")): _*))
          .as("band_hash"))
    }
    docs.filter(size(w) >= 3)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"),
        col("bb.band_hash").as("band_hash"))
  }

  /** Hot-bucket admission cap — the streaming counterpart of the batch
    * job's bucket-membership guard (same bound). */
  private[graft] val maxBucket = 10000

  /** The streaming candidate-pair emitter: LSH buckets are state
    * groups; a new document pairs against every member already in its
    * bucket (and earlier arrivals of the same micro-batch, replayed in
    * doc-id order for determinism), then joins the membership. Works
    * identically on a batch DataFrame (fMGWS runs one "micro-batch"),
    * which is what the parity spec exploits. */
  def candidatePairs(docs: DataFrame): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    withBands(docs)
      .select(col("band_id").as("bandId"), col("band_hash").as("bandHash"),
        col("doc_id").as("docId"))
      .as[BandDoc]
      .groupByKey(bd => (bd.bandId, bd.bandHash))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[BandDoc],
         state: GroupState[BucketMembers]) =>
          val existing = state.getOption.map(_.docIds).getOrElse(Seq.empty)
          val seen = existing.toSet
          val newcomers = rows.map(_.docId).toSeq.distinct.sorted
            .filterNot(seen)
          val members = scala.collection.mutable.ArrayBuffer(existing: _*)
          val out = scala.collection.mutable.ArrayBuffer[CandidatePair]()
          for (n <- newcomers if members.size < maxBucket) {
            for (m <- members)
              out += CandidatePair(math.min(m, n), math.max(m, n), key._1)
            members += n
          }
          state.update(BucketMembers(members.toSeq))
          out.iterator
      }
  }
}
