package graft.index

import java.util.concurrent.ConcurrentHashMap

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** What an index directory claims to be — persisted as a 1-row parquet
  * and validated on every serve/ensure. `nVectors` ties the index to a
  * corpus SNAPSHOT: a changed corpus invalidates the artifacts. */
case class IndexMeta(formatVersion: Int, corpusDir: String,
    nVectors: Long, dim: Int, ivfK: Int, pqM: Int, pqK: Int)

/** BUILD/SERVE split for the ANN family (VERDICT_r07 item 2): a
  * production index is built ONCE per corpus snapshot and SERVED by
  * every query after it — the reference's own write-once/read-many
  * idempotency story (SURVEY §1 R5/R9) applied to vectors. Before
  * this, every Similarity query rebuilt centroids/assignments/codebooks
  * per session (materialize-once made that per-session-cheap, but a
  * restarted service paid the n·K assignment argmax again).
  *
  * Artifacts under one index root, all plain parquet (readable by any
  * engine, splittable, column-pruned on serve):
  *   - `centroids/`    (cell, qc, nc)            — K rows, the coarse book
  *   - `assignments/`  (vec_id, cell, q, nrm, ccos) — one row per vector,
  *     the posting-list side; carries the quantized vector so in-cell
  *     exact search needs NO join back to the corpus
  *   - `codebook/`     (m, k, centroid)          — M·K rows, the PQ book
  *   - `codes/`        (vec_id, cell, code)      — one row per vector,
  *     the ~9-byte/vector ADC scan side
  *   - `meta/`         ([[IndexMeta]])           — 1 row, the validity claim
  *
  * SINK ([[write]]): one assignment pass + one encode pass, each a
  * single corpus scan, written with the corpus partitioning (no
  * repartition — at 100 TB the index write is bound by the same scan
  * that any one consumer query already pays). SOURCE ([[annSearch]] /
  * [[adcSearch]]): plans read the parquet artifacts directly — the
  * served IVF search contains NO broadcast-nested-loop argmax and the
  * served ADC scan no encode, which is the whole point (spec'd by plan
  * shape in `IndexServeSpec`). [[ensure]] is the deployment contract:
  * serve a VALID existing index untouched, rebuild a missing/stale one,
  * and refuse to clobber an index written by a NEWER format.
  */
object AnnIndex {

  /** Bump when the artifact layout changes. An index claiming a newer
    * version than this build understands is never overwritten. */
  val FormatVersion = 1

  private def p(root: String, part: String) = s"$root/$part"

  /** Build every artifact from the corpus at `corpusDir` into `root`
    * (overwrite). Two corpus scans total: the assignment argmax pass
    * and the PQ encode pass (codes then join the written assignment's
    * cell — a read of the narrow artifact, not a third corpus scan).
    *
    * Centroid seeding follows the engine's documented deterministic
    * rule — the K smallest vec_ids — which presumes DENSE-FROM-0 ids
    * (true of every fixture and of any corpus that assigns ids with
    * row_number/zipWithIndex). A corpus whose id space starts above K
    * would seed no centroids; re-id such a corpus before building (or
    * k-means the seeds via q_kmeans_step, the production path). */
  def write(spark: SparkSession, corpusDir: String, root: String): IndexMeta = {
    import spark.implicits._
    val (ivfK, pqM, pqK, d, n) = Similarity.indexGeometry(spark, corpusDir)
    Similarity.ivfCentroidsPlan(spark, corpusDir)
      .write.mode("overwrite").parquet(p(root, "centroids"))
    Similarity.ivfAssignedPlan(spark, corpusDir)
      .write.mode("overwrite").parquet(p(root, "assignments"))
    Similarity.pqCodebookFrame(spark, corpusDir)
      .write.mode("overwrite").parquet(p(root, "codebook"))
    val cells = spark.read.parquet(p(root, "assignments"))
      .select(col("vec_id"), col("cell"))
    Similarity.qPqCode(spark, corpusDir).select(col("vec_id"), col("code"))
      .join(cells, "vec_id")
      .select(col("vec_id"), col("cell"), col("code"))
      .write.mode("overwrite").parquet(p(root, "codes"))
    val meta = IndexMeta(FormatVersion, corpusDir, n, d, ivfK, pqM, pqK)
    Seq(meta).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(p(root, "meta"))
    meta
  }

  /** Read the validity claim; None if absent/unreadable. */
  def readMeta(spark: SparkSession, root: String): Option[IndexMeta] =
    try {
      import spark.implicits._
      spark.read.parquet(p(root, "meta")).as[IndexMeta].collect().headOption
    } catch { case _: Exception => None }

  private def served(spark: SparkSession, root: String, part: String): DataFrame = {
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"AnnIndex: no readable index meta at $root — build with write() or ensure()"))
    require(meta.formatVersion == FormatVersion,
      s"AnnIndex: $root is format v${meta.formatVersion}, this build serves v$FormatVersion")
    spark.read.parquet(p(root, part))
  }

  /** The served posting-list frame (vec_id, cell, q, nrm, ccos). */
  def assignments(spark: SparkSession, root: String): DataFrame =
    served(spark, root, "assignments")

  /** The served coarse centroids (cell, qc, nc). */
  def centroids(spark: SparkSession, root: String): DataFrame =
    served(spark, root, "centroids")

  /** SERVED IVF search: the in-cell exact top-3 over the parquet
    * posting lists — value-identical to `q_ann_ivf` built in-session
    * (same hot-cell cap, same tie order), with the n·K assignment
    * argmax amortized into the one-time build. */
  def annSearch(spark: SparkSession, root: String): DataFrame =
    Similarity.ivfSearch(spark, assignments(spark, root))

  /** SERVED ADC search: LUTs from the persisted codebook (M·K rows —
    * a bounded index-metadata read) against the persisted packed
    * codes; value-identical to `q_ivf_pq`. Queries' LUT entries are
    * computed fresh from the query vectors, as a real serving path
    * does. */
  def adcSearch(spark: SparkSession, corpusDir: String, root: String): DataFrame = {
    val rows = served(spark, root, "codebook")
      .select(col("m"), col("k"), col("centroid")).collect()
    val meta = readMeta(spark, root).get
    val book = Array.tabulate(meta.pqM, meta.pqK) { (m, k) =>
      rows.find(r => r.getInt(0) == m && r.getInt(1) == k)
        .getOrElse(throw new IllegalStateException(
          s"AnnIndex: codebook at $root is missing entry ($m,$k)"))
        .getAs[scala.collection.Seq[Long]](2).toArray
    }
    val codes = served(spark, root, "codes").select(col("vec_id"), col("code"))
    Similarity.adcTopK(codes, Similarity.pqLuts(spark, corpusDir, book))
  }

  /** The QUERY-SERVING API — what a retrieval service actually calls
    * (the `annSearch` diagnostic searches every indexed vector's own
    * cell; a service answers EXTERNAL queries): route each query
    * vector to its `nprobe` nearest coarse centroids (a |Q|·K
    * broadcast argmax over the tiny served centroid frame), then exact
    * cosine top-`k` over ONLY the probed cells' posting lists. Cost
    * per query ≈ nprobe·(n/K) candidates instead of n — the IVF
    * contract — and the posting-list side carries its quantized
    * vectors, so serving never touches the corpus table. `nprobe` is
    * the recall dial (`q_ivf_probe_curve` measures it; at nprobe = K
    * this degrades to exact brute force over the indexed set, which is
    * what the spec exploits as ground truth). Ties break on
    * (cosine desc, vec_id) like every ANN operator here.
    *
    * `queries`: (query_id, embedding) — quantized with the same
    * round(×1000) rule as the index build.
    */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      nprobe: Int = 1, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("query_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm", graft.functions.LongVectorDot.vecDot(col("q"), col("q")))
    val cents = centroids(spark, root)
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("ccos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("ccos",
        graft.functions.LongVectorDot.vecDot(col("q"), col("qc")).cast("double")
          / sqrt((col("nrm") * col("nc")).cast("double")))
      .withColumn("crn", row_number().over(probeW))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("cell"), col("q").as("qq"),
        col("nrm").as("qn"))
    val posting = assignments(spark, root).select(
      col("cell"), col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("nrm").as("nb"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    probed.join(posting, "cell")
      .withColumn("cos",
        graft.functions.LongVectorDot.vecDot(col("qq"), col("qb")).cast("double")
          / sqrt((col("qn") * col("nb")).cast("double")))
      // a query may probe two cells that share a vector only if cells
      // were duplicated — they are disjoint by construction, so no
      // dedup is needed before ranking
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
  }

  /** INCREMENTAL index update — the production shape for a growing
    * corpus: assign a batch of NEW vectors against the FROZEN coarse
    * centroids (the IVF contract: the book only changes on a full
    * re-train, which [[write]] is), append their posting-list rows and
    * packed codes, and bump the meta row-count so [[ensure]] keeps
    * validating against the corpus snapshot. Cost is one pass over the
    * BATCH (|batch|·K argmax + |batch| encodes), never the corpus —
    * vs [[write]]'s full-corpus rebuild. Cell populations drift as the
    * corpus grows away from the frozen book; `q_kmeans_shift` /
    * `q_cell_purity` are the re-train triggers an operator watches.
    *
    * `newVectors`: (vec_id, embedding) with ids DISJOINT from the
    * indexed ones (enforced — duplicate ids would double posting-list
    * entries and break the serve == rebuild contract).
    */
  def append(spark: SparkSession, corpusDir: String, root: String,
      newVectors: DataFrame): IndexMeta = {
    import spark.implicits._
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"AnnIndex: cannot append to $root — no readable index meta"))
    require(meta.formatVersion == FormatVersion,
      s"AnnIndex: $root is format v${meta.formatVersion}")
    val cents = centroids(spark, root)
    val q = newVectors.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nrm", graft.functions.LongVectorDot.vecDot(col("q"), col("q")))
    val dup = q.select(col("vec_id"))
      .join(assignments(spark, root).select(col("vec_id")), "vec_id").count()
    require(dup == 0, s"AnnIndex: $dup of the new vec_ids are already indexed")
    // frozen-book assignment: same argmax/tiebreak as the full build
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cell"))
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("ccos", graft.functions.LongVectorDot.vecDot(col("q"), col("qc"))
        .cast("double") / sqrt((col("nrm") * col("nc")).cast("double")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cell"), col("q"), col("nrm"), col("ccos"))
    assigned.write.mode("append").parquet(p(root, "assignments"))
    // encode the batch against the persisted codebook (ADC parity with
    // the build path: same first-minimum tie rule)
    val rows = served(spark, root, "codebook")
      .select(col("m"), col("k"), col("centroid")).collect()
    val book = Array.tabulate(meta.pqM, meta.pqK) { (m, k) =>
      rows.find(r => r.getInt(0) == m && r.getInt(1) == k).get
        .getAs[scala.collection.Seq[Long]](2).toArray
    }
    Similarity.pqEncode(q.select(col("vec_id"), col("q")), book,
        meta.dim / meta.pqM)
      .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("code"))
      .write.mode("append").parquet(p(root, "codes"))
    val newMeta = meta.copy(nVectors = meta.nVectors +
      newVectors.count())
    Seq(newMeta).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(p(root, "meta"))
    newMeta
  }

  /** Default per-corpus index location (scratch space — a deployment
    * points `root` at its lake instead). */
  def defaultRoot(corpusDir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_ann_index/" +
      corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")

  private val ensuring = new ConcurrentHashMap[String, AnyRef]()

  /** The deployment contract: return a root holding a VALID index for
    * `corpusDir`, building only when the existing one is missing or
    * stale (version/corpus/row-count mismatch). An index claiming a
    * NEWER format than this build is a hard error, never clobbered.
    * Serialized per root within the JVM; cross-process races resolve
    * to the same content (the build is deterministic), matching the
    * reference's idempotent-reload story. */
  def ensure(spark: SparkSession, corpusDir: String,
      root0: String = null): String = {
    val root = Option(root0).getOrElse(defaultRoot(corpusDir))
    val lock = ensuring.computeIfAbsent(root, _ => new AnyRef)
    lock.synchronized {
      readMeta(spark, root) match {
        case Some(m) if m.formatVersion > FormatVersion =>
          throw new IllegalStateException(
            s"AnnIndex: $root is format v${m.formatVersion} (newer than " +
              s"v$FormatVersion) — refusing to overwrite")
        case Some(m) if m.formatVersion == FormatVersion &&
            m.corpusDir == corpusDir &&
            m.nVectors == Similarity.indexGeometry(spark, corpusDir)._5 =>
          () // valid — serve as-is
        case _ => write(spark, corpusDir, root)
      }
    }
    root
  }
}
