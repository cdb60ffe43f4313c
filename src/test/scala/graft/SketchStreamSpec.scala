package graft

import graft.functions.Portable.hash60Jvm
import graft.operators.TextAnalysis
import graft.streaming.SketchStream
import org.apache.spark.sql.functions._

/** The mergeable-state claim of `q_cms_topk` made enforceable: the
  * SAME declarative counter plan (`SketchStream.counters`) run as a
  * streaming aggregation over micro-batched documents must end with
  * counters identical to the batch run over the whole frame — and the
  * estimates `min_j counters(j, bucket_j(t))` served from the streamed
  * grid must agree with the registered batch query's `est` column.
  */
class SketchStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("streamed CMS counters == batch counters; served estimates == q_cms_topk") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val streamDir = tmpDir("sketch_stream_in")
    // three chunks → three micro-batches; the counter grid must fold
    // them exactly (sums commute — that is the property under test)
    (0 until 3).foreach { m =>
      docs.filter(pmod(col("doc_id"), lit(3)) === m)
        .coalesce(1).write.mode("append").parquet(streamDir)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = SketchStream.counters(stream)
      .writeStream.format("memory").queryName("sketch_stream_counters")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("sketch_stream_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = grid(spark.table("sketch_stream_counters"))
    val batch = grid(SketchStream.counters(docs))
    assert(streamed == batch,
      "streamed-final counter grid must equal the batch grid")
    // constant state: the grid never exceeds d·W cells
    assert(streamed.size <= TextAnalysis.CmsDepth * TextAnalysis.CmsWidth)

    // serving: estimates read off the streamed grid == the batch
    // query's est column (same bucket constants by construction)
    val est = TextAnalysis.qCmsTopk(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(2))).toMap
    est.foreach { case (tok, e) =>
      val served = (0 until TextAnalysis.CmsDepth).map { j =>
        streamed((j, hash60Jvm(tok + "#" + j) % TextAnalysis.CmsWidth))
      }.min
      assert(served == e, s"estimate for '$tok': streamed $served vs batch $e")
    }
  }

  test("streamed KMV lows == batch bottom-64 sketch (KmvLows merge across micro-batches)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val streamDir = tmpDir("kmv_stream_in")
    // three chunks → three micro-batches; the KmvLows buffers must
    // serialize through the state store between batches and MERGE to
    // the same bottom-64 the batch heap computes — including duplicate
    // shingle hashes arriving in different micro-batches (the sketch's
    // own distinctness, no pre-distinct state)
    (0 until 3).foreach { m =>
      docs.filter(pmod(col("doc_id"), lit(3)) === m)
        .coalesce(1).write.mode("append").parquet(streamDir)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = graft.streaming.SketchStream.kmvSketch(stream)
      .writeStream.format("memory").queryName("kmv_stream_lows")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("kmv_stream_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("kmv_stream_lows").collect().map { r =>
      r.getString(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq
    }.toMap
    // batch twin: the registered query's sketch build (distinct →
    // TopKPerKey bottom-64, rk ascending in h)
    val batch = Dedup.kmvSketchPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, hs) => s -> hs.map(_._2).sorted.toSeq }
    assert(streamed.keySet == batch.keySet,
      s"watched sources: streamed ${streamed.keySet} vs batch ${batch.keySet}")
    batch.foreach { case (src, hs) =>
      assert(streamed(src) == hs,
        s"source $src: streamed lows ${streamed(src).take(5)}... " +
          s"!= batch ${hs.take(5)}...")
      assert(streamed(src).size <= 64, s"source $src state exceeded k")
    }
    // every watched source must actually be exercised
    assert(batch.keySet == Dedup.kmvWatchedSources.toSet)
  }
}
