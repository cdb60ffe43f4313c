package graft

import graft.index.{AnnIndex, IndexMeta}
import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** The ANN build/serve split (VERDICT_r07 item 2): served results must
  * equal built-in-session results, the serve PLAN must not recompute
  * the index (no assignment argmax, no encode), and `ensure` must
  * validate-or-rebuild correctly — including refusing to clobber a
  * newer-format index.
  */
class IndexServeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("served IVF search == in-session q_ann_ivf, and ensure() reuses a valid index") {
    val root = tmpDir("ann_index")
    AnnIndex.write(spark, sf, root)
    val served = AnnIndex.annSearch(spark, root)
    assert(rowSet(served) == rowSet(Similarity.qAnnIvf(spark, sf)))
    // a second ensure must serve the existing artifacts, not rebuild:
    // the meta file's physical identity is the witness
    def metaFiles() = new java.io.File(s"$root/meta").listFiles()
      .map(f => (f.getName, f.lastModified)).toSet
    val before = metaFiles()
    assert(AnnIndex.ensure(spark, sf, root) == root)
    assert(metaFiles() == before, "valid index must be served untouched")
  }

  test("the serve plan reads parquet — no assignment argmax, no broadcast nested loop") {
    val root = tmpDir("ann_index_plan")
    AnnIndex.write(spark, sf, root)
    val plan = AnnIndex.annSearch(spark, root)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"served search must not re-run the n*K centroid argmax:\n${plan.take(1200)}")
    assert(plan.contains("Parquet"),
      s"served search must scan the index parquet:\n${plan.take(1200)}")
  }

  test("served ADC search == in-session q_ivf_pq (codebook round-trips through parquet)") {
    val root = tmpDir("ann_index_adc")
    AnnIndex.write(spark, sf, root)
    assert(rowSet(AnnIndex.adcSearch(spark, sf, root)) ==
      rowSet(Similarity.qIvfPq(spark, sf)))
  }

  test("ensure rebuilds a stale index (corpus-snapshot mismatch) and a missing one") {
    import spark.implicits._
    val root = tmpDir("ann_index_stale")
    // missing → build
    AnnIndex.ensure(spark, sf, root)
    val good = AnnIndex.readMeta(spark, root).get
    assert(good.corpusDir == sf && good.formatVersion == AnnIndex.FormatVersion)
    // tamper: claim a different corpus row count → stale → rebuild
    Seq(good.copy(nVectors = good.nVectors + 1)).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta")
    AnnIndex.ensure(spark, sf, root)
    assert(AnnIndex.readMeta(spark, root).get == good,
      "stale index must be rebuilt to the current snapshot")
  }

  test("a NEWER-format index is never clobbered; an absent index refuses to serve") {
    import spark.implicits._
    val root = tmpDir("ann_index_vers")
    Seq(IndexMeta(AnnIndex.FormatVersion + 1, sf, 1L, 1, 1, 1, 1, 0L))
      .toDS().toDF().coalesce(1).write.parquet(s"$root/meta")
    val e = intercept[IllegalStateException] { AnnIndex.ensure(spark, sf, root) }
    assert(e.getMessage.contains("refusing to overwrite"))
    val e2 = intercept[IllegalStateException] {
      AnnIndex.annSearch(spark, tmpDir("ann_index_absent")).collect()
    }
    assert(e2.getMessage.contains("no readable index meta"))
  }

  test("append: frozen-book incremental update == one-shot full build") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    // sub-corpus: first 400 vectors (superset of the K=16 seed
    // centroids, so the frozen book equals the full build's book)
    val subDir = tmpDir("ann_sub_corpus")
    all.filter(col("vec_id") < 400)
      .write.parquet(s"$subDir/embeddings.parquet")
    val incRoot = tmpDir("ann_index_inc")
    AnnIndex.write(spark, subDir, incRoot)
    val metaBefore = AnnIndex.readMeta(spark, incRoot).get
    assert(metaBefore.nVectors == 400)
    val newMeta = AnnIndex.append(spark, subDir, incRoot,
      all.filter(col("vec_id") >= 400).select("vec_id", "embedding"))
    assert(newMeta.nVectors == all.count())
    val fullRoot = tmpDir("ann_index_full")
    AnnIndex.write(spark, sf, fullRoot)
    assert(rowSet(AnnIndex.annSearch(spark, incRoot)) ==
      rowSet(AnnIndex.annSearch(spark, fullRoot)),
      "incrementally-appended posting lists must serve the same results")
    assert(rowSet(AnnIndex.adcSearch(spark, sf, incRoot)) ==
      rowSet(AnnIndex.adcSearch(spark, sf, fullRoot)),
      "appended codes must ADC-serve identically")
    // duplicate ids are rejected, not silently double-indexed
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, subDir, incRoot,
        all.filter(col("vec_id") === 10).select("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("already indexed"))
  }

  test("query(): external queries, nprobe=K == exact brute force, recall monotone in nprobe") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    // held-out split: index vec_id < 450 (dense-from-0 ids feed the
    // documented smallest-id centroid seeding), query with the 50
    // held-out vectors — external queries, the shape a retrieval
    // service actually serves
    val corpusDir = tmpDir("ann_query_corpus")
    all.filter(col("vec_id") < 450).write.parquet(s"$corpusDir/embeddings.parquet")
    val root = tmpDir("ann_query_index")
    AnnIndex.write(spark, corpusDir, root)
    val queries = all.filter(col("vec_id") >= 450)
      .select(col("vec_id").as("query_id"), col("embedding"))

    // JVM exact brute force over the indexed set (K=16 cells at this SF)
    def vecs(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      val q = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(x => math.round(x.toDouble * 1000)).toArray
      (r.getLong(0), q, q.map(x => x * x).sum)
    }
    val corpus = vecs(all.filter(col("vec_id") < 450))
    val brute = vecs(all.filter(col("vec_id") >= 450)
      .select(col("vec_id"), col("embedding")))
      .flatMap { case (qid, qa, na) =>
        corpus.map { case (n, qb, nb) =>
          (qid, n, qa.indices.map(i => qa(i) * qb(i)).sum.toDouble
            / math.sqrt((na * nb).toDouble))
        }.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
          case ((q, n, c), i) => (q, n,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, i + 1L)
        }
      }.toSet

    val fullProbe = AnnIndex.query(spark, root, queries, nprobe = 16)
      .select("query_id", "neighbor_id", "cosine", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong)).toSet
    assert(fullProbe == brute, "nprobe = K must equal exact brute force")

    def recall(np: Int): Double = {
      val got = AnnIndex.query(spark, root, queries, np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(p => brute.exists(b => (b._1, b._2) == p)).toDouble / brute.size
    }
    val (r1, r2, r4) = (recall(1), recall(2), recall(4))
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9,
      s"recall must be monotone in nprobe: $r1 / $r2 / $r4")
    assert(r4 > 0.3, s"probing 4 of 16 cells should recover real recall: $r4")
  }

  test("q_ann_served (the registered query) matches q_ann_ivf end-to-end") {
    assert(rowSet(Similarity.qAnnServed(spark, sf)) ==
      rowSet(Similarity.qAnnIvf(spark, sf)))
  }

  test("write() REFUSES a non-dense-id corpus; writeTrained() builds it and " +
      "query(nprobe=K) == brute force (VERDICT_r08 item 1)") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    // the trap corpus: every id shifted above 10^6 — the naive seed rule
    // (vec_id < K) selects NOTHING here
    val corpusDir = tmpDir("ann_shifted_corpus")
    all.filter(col("vec_id") < 450)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .write.parquet(s"$corpusDir/embeddings.parquet")
    val root = tmpDir("ann_shifted_index")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.write(spark, corpusDir, root)
    }
    assert(e.getMessage.contains("writeTrained"),
      s"the refusal must point at the trained-book path: ${e.getMessage}")
    assert(!new java.io.File(s"$root/meta").exists(),
      "a refused build must leave NO artifacts (never an empty index)")

    val meta = AnnIndex.writeTrained(spark, corpusDir, root)
    assert(meta.ivfK == 16 && meta.nVectors == 450)
    // every corpus vector must be assigned to exactly one cell
    assert(AnnIndex.assignments(spark, root).count() == 450)

    // external queries: the 50 held-out vectors, also id-shifted
    val queries = all.filter(col("vec_id") >= 450)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
    def vecs(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      val q = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(x => math.round(x.toDouble * 1000)).toArray
      (r.getLong(0), q, q.map(x => x * x).sum)
    }
    val corpus = vecs(all.filter(col("vec_id") < 450)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val brute = vecs(queries.select(col("query_id"), col("embedding")))
      .flatMap { case (qid, qa, na) =>
        corpus.map { case (n, qb, nb) =>
          (qid, n, qa.indices.map(i => qa(i) * qb(i)).sum.toDouble
            / math.sqrt((na * nb).toDouble))
        }.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
          case ((q, n, c), i) => (q, n,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, i + 1L)
        }
      }.toSet
    val fullProbe = AnnIndex.query(spark, root, queries, nprobe = 16)
      .select("query_id", "neighbor_id", "cosine", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong)).toSet
    assert(fullProbe == brute,
      "trained-book serving at nprobe = K must equal exact brute force")
  }

  test("ensure() rebuilds when the corpus is regenerated IN PLACE with the " +
      "same row count (content fingerprint, ADVICE_r08)") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    val corpusDir = tmpDir("ann_fp_corpus")
    val sub = all.filter(col("vec_id") < 300).collect()
    spark.createDataFrame(spark.sparkContext.parallelize(sub.toSeq, 2),
      all.schema).write.mode("overwrite")
      .parquet(s"$corpusDir/embeddings.parquet")
    val root = tmpDir("ann_fp_index")
    AnnIndex.ensure(spark, corpusDir, root)
    val built = AnnIndex.readMeta(spark, root).get

    // regenerate in place: same ids, same row count, DIFFERENT vectors.
    // A fresh session sees the new content; this session's memoized
    // frames must be dropped to model that.
    val perturbed = sub.map { r =>
      org.apache.spark.sql.Row(r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(x => x + 0.25f),
        r.get(2))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(perturbed.toSeq, 2), all.schema)
      .write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    Similarity.invalidateMaterialized()
    Similarity.invalidateProbes()

    AnnIndex.ensure(spark, corpusDir, root)
    val rebuilt = AnnIndex.readMeta(spark, root).get
    assert(rebuilt.nVectors == built.nVectors,
      "the regenerated corpus has the same row count by construction")
    assert(rebuilt.corpusFp != built.corpusFp,
      "ensure must have REBUILT: row-count validation alone would have " +
        "served the stale index")
  }

  test("trained book vs naive book: cell balance and mean own-centroid " +
      "cosine, measured (VERDICT_r08 item 1 'done' criterion)") {
    val naiveRoot = tmpDir("ann_naive_meas")
    val trainedRoot = tmpDir("ann_trained_meas")
    AnnIndex.write(spark, sf, naiveRoot)
    AnnIndex.writeTrained(spark, sf, trainedRoot)
    def stats(root: String): (Long, Double) = {
      val rows = AnnIndex.assignments(spark, root)
        .groupBy("cell").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.avg("ccos").as("m")).collect()
      val ns = rows.map(_.getLong(1))
      val meanCcos = {
        val tot = ns.sum.toDouble
        rows.map(r => r.getLong(1) * r.getDouble(2)).sum / tot
      }
      (ns.max, meanCcos)
    }
    val (naiveMax, naiveCcos) = stats(naiveRoot)
    val (trainedMax, trainedCcos) = stats(trainedRoot)
    info(f"naive:   max cell $naiveMax%d, mean own-centroid cos $naiveCcos%.4f")
    info(f"trained: max cell $trainedMax%d, mean own-centroid cos $trainedCcos%.4f")
    // k-means optimizes exactly the own-centroid affinity; the trained
    // book must not be WORSE than an arbitrary-seed book on its own
    // objective (small slack for integer-centroid truncation)
    assert(trainedCcos >= naiveCcos - 0.005,
      s"trained book lost its own objective: $trainedCcos vs $naiveCcos")
    // both books must cover the whole corpus
    assert(AnnIndex.assignments(spark, trainedRoot).count() ==
      AnnIndex.assignments(spark, naiveRoot).count())
  }

  test("delete(): every serve path == an index rebuilt without the rows; " +
      "vacuum compacts and meta commits last") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    val dead = Seq(100L, 200L, 300L)
    // reference: an index built from a corpus that never had the rows
    // (deleted ids sit above the K=16 naive seed and the PQ query set,
    // so books and query LUTs are identical across the two corpora)
    val keepDir = tmpDir("ann_del_corpus")
    all.filter(!col("vec_id").isin(dead: _*))
      .write.parquet(s"$keepDir/embeddings.parquet")
    val refRoot = tmpDir("ann_del_ref")
    AnnIndex.write(spark, keepDir, refRoot)
    val root = tmpDir("ann_del_live")
    AnnIndex.write(spark, sf, root)
    // delete is counted, idempotent, and refuses unknown ids
    assert(AnnIndex.delete(spark, root, dead.toDF("vec_id")) == 3L)
    assert(AnnIndex.delete(spark, root, dead.toDF("vec_id")) == 0L,
      "re-deleting the same ids must be a counted no-op")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.delete(spark, root, Seq(999999L).toDF("vec_id"))
    }
    assert(e.getMessage.contains("not in the index"))
    // tombstone-masked serving == the rebuilt-without-them index, on
    // every serve path (cell populations and hot-cell cap included)
    assert(rowSet(AnnIndex.annSearch(spark, root)) ==
      rowSet(AnnIndex.annSearch(spark, refRoot)))
    assert(rowSet(AnnIndex.adcSearch(spark, sf, root)) ==
      rowSet(AnnIndex.adcSearch(spark, keepDir, refRoot)))
    val queries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 450)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(rowSet(AnnIndex.query(spark, root, queries, nprobe = 2)) ==
      rowSet(AnnIndex.query(spark, refRoot, queries, nprobe = 2)))
    // vacuum physically reclaims: counts shrink, results hold, the
    // tombstone set is gone, meta commits the live count
    val before = AnnIndex.annSearch(spark, root).collect().map(_.toString).toSet
    val meta = AnnIndex.vacuum(spark, root)
    assert(meta.nVectors == all.count() - 3)
    assert(spark.read.parquet(s"$root/assignments").count() == meta.nVectors)
    assert(spark.read.parquet(s"$root/codes").count() == meta.nVectors)
    assert(!new java.io.File(s"$root/tombstones").exists())
    assert(rowSet(AnnIndex.annSearch(spark, root)) == before,
      "vacuum must not change served results")
    // a vacuumed id's row is physically gone — it may be re-appended
    AnnIndex.append(spark, keepDir, root,
      all.filter(col("vec_id") === 100L).select("vec_id", "embedding"))
    assert(AnnIndex.readMeta(spark, root).get.nVectors == all.count() - 2)
    // vacuum with nothing tombstoned is a no-op returning the same meta
    assert(AnnIndex.vacuum(spark, root) ==
      AnnIndex.readMeta(spark, root).get)
  }
}
