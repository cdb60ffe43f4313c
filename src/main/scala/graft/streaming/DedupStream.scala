package graft.streaming

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
  * Scale shape: the signature kernel runs as a typed per-document
  * flatMap on the JVM hash twin (see [[withBands]] — the documented
  * row-wise-imperative case; the batch job's corpus-wide
  * posexplode+window form does not apply to a per-micro-batch
  * stream). Total state = one 8-byte id per
  * indexed (doc, band): 4·n ids regardless of stream length — the
  * store spills via the state backend, never the JVM heap.
  *
  * OVER-CAP CONTRACT (pinned in `StreamDedupSpec`, VERDICT_r07 item 3):
  * state per bucket is capped at [[Dedup]]'s hot-bucket bound. The
  * batch job drops an over-cap bucket RETROACTIVELY (zero pairs); a
  * stream cannot un-emit, so the cap is PROSPECTIVE here — the first
  * `cap` arrivals are admitted and fully paired, later arrivals are
  * rejected. The exact relationship is therefore
  * **batch pairs ⊆ streamed pairs**, per bucket: equal while the
  * bucket stays ≤ cap (everywhere at test SF), and for an over-cap
  * bucket the stream keeps the arrival-order-prefix pairs (up to
  * ~cap²/2 of them) where batch emits none — the over-cap case is the
  * OPPOSITE extreme, not a mild divergence. So a rejected admission is
  * never silent: the kernel emits a [[CandidatePair]] MARKER row
  * (`docA == DroppedDocMarker`) per rejected document, letting an
  * operator count drops per bucket and trigger the batch job to
  * reconcile (re-run `q_minhash_lsh`, whose retroactive drop is the
  * ground truth for hot buckets). Filter markers with
  * `docA >= 0` before treating the stream as pairs.
  *
  * State-rewrite cost (ADVICE_r07): fMGWS rewrites the full
  * `Seq[Long]` bucket state on every touch — O(|bucket|) serialization
  * per micro-batch that touches it, which degrades exactly on hot
  * buckets. Measured fine at the benchmarked scale — the r8 state-size
  * sweep (`SPARK_GRAFT_STREAM_SWEEP`, SURVEY §6b) puts map and RocksDB
  * within ±7% of each other from 200k through 1.6M entries (2.4-4.8k
  * docs/s, throughput rising with state as fixed cost amortizes) — and
  * the admission cap bounds the worst rewrite at `cap` longs; if
  * production state far outgrows the heap (where RocksDB's off-heap
  * state and incremental snapshots start to matter), switch hot
  * buckets to an append-friendly layout (e.g. per-member keys under
  * `transformWithState`'s list state) first.
  */
object DedupStream {

  /** Per-document 4-band MinHash hashes, one row per (doc, band) —
    * computed IMPERATIVELY per document in a typed flatMap using the
    * spec-proven JVM hash twin (`hash60Jvm == hash60`, PortableSpec).
    * This is the documented row-wise-imperative case: the batch job's
    * codegen'd posexplode+window shingling needs a corpus-wide window
    * (not available on a stream), and the declarative in-row HOF
    * alternative evaluates an interpreted md5 lambda per shingle —
    * measured 68 docs/s vs ~20k docs/s for this flatMap (StreamBench's
    * neardup path; the per-doc cost is 48 md5s + 16·48 integer mixes
    * either way, but here they run as straight JVM code). Docs under 3
    * tokens have no shingles and drop out, like the batch frame. */
  def withBands(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) => bandHashesJvm(docId, text) }
      .toDF("doc_id", "band_id", "band_hash")
  }

  /** The per-doc signature kernel: distinct 3-shingles → h30 →
    * 16 universal-hash minima → 4 band hashes. Same constants, same
    * formulas, same values as `Dedup.minhashSigPlan` + band structs. */
  /** The raw 16-component MinHash signature of one document — the
    * kernel [[bandHashesJvm]] bands, exposed on its own (r12) so the
    * streaming SHARD-INGEST path can hand full signatures to the
    * persisted [[graft.index.BandIndex]] probe (which needs the
    * components for its sig-match verify, not just the band hashes).
    * None for docs under 3 tokens (no shingles — drops out exactly
    * like the batch frame). Value-identical to `Dedup.minhashSigPlan`
    * by the same constants/formulas; `StreamShardIngestSpec` pins the
    * frame-level equality. */
  private[graft] def sigJvm(text: String): Option[Array[Long]] = {
    import graft.functions.Portable.hash60Jvm
    val ws = text.split(" ", -1)
    if (ws.length < 3) None
    else {
      val sigs = Array.fill(16)(Long.MaxValue)
      val seen = new scala.collection.mutable.HashSet[String]()
      var i = 0
      while (i + 2 < ws.length) {
        val sh = ws(i) + " " + ws(i + 1) + " " + ws(i + 2)
        if (seen.add(sh)) {
          val h30 = hash60Jvm(sh) % 1073741824L
          var k = 0
          while (k < 16) {
            val v = (h30 * Dedup.mhA(k) + Dedup.mhB(k)) % Dedup.P
            if (v < sigs(k)) sigs(k) = v
            k += 1
          }
        }
        i += 1
      }
      Some(sigs)
    }
  }

  private[graft] def bandHashesJvm(docId: Long, text: String)
      : Seq[(Long, Long, Long)] = {
    import graft.functions.Portable.hash60Jvm
    sigJvm(text) match {
      case None => Seq.empty
      case Some(sigs) =>
        (0 until 4).map { b =>
          val cat = (0 until 4).map(j => sigs(b * 4 + j)).mkString(",")
          (docId, b.toLong, hash60Jvm(cat))
        }
    }
  }

  /** Hot-bucket admission cap — the streaming counterpart of the batch
    * job's bucket-membership guard (same bound, so the ⊆ contract in
    * the object doc holds bucket-by-bucket). */
  private[graft] val maxBucket = 10000

  /** `docA` value of a dropped-admission marker row: the bucket was at
    * its cap when `docB` arrived, so `docB` was rejected un-paired.
    * Real doc ids are nonnegative — `filter(docA >= 0)` yields pairs. */
  val DroppedDocMarker: Long = -1L

  /** The streaming candidate-pair emitter: LSH buckets are state
    * groups; a new document pairs against every member already in its
    * bucket (and earlier arrivals of the same micro-batch, replayed in
    * doc-id order for determinism), then joins the membership. Works
    * identically on a batch DataFrame (fMGWS runs one "micro-batch"),
    * which is what the parity spec exploits. `cap` is injectable so the
    * over-cap contract is testable without a 10k-doc bucket. */
  def candidatePairs(docs: DataFrame,
      cap: Int = maxBucket): Dataset[CandidatePair] = {
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
          for (n <- newcomers) {
            if (members.size < cap) {
              for (m <- members)
                out += CandidatePair(math.min(m, n), math.max(m, n), key._1)
              members += n
            } else {
              // full bucket: reject but NEVER silently — the marker is
              // what lets an operator see the stream has left the
              // batch-parity regime for this bucket (object doc)
              out += CandidatePair(DroppedDocMarker, n, key._1)
            }
          }
          state.update(BucketMembers(members.toSeq))
          out.iterator
      }
  }
}
