package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Hygiene: a warmup pass exercises session init,
  * parquet read and codegen before anything is timed (otherwise the first
  * query absorbs ~5 s of JVM/session warmup and per-query numbers are
  * meaningless); queries run in sorted name order so runs are comparable;
  * each query is timed SPARK_GRAFT_BENCH_RUNS times (default 2) and the
  * MINIMUM reported — one-shot numbers carry ±30% Janino/JIT compilation
  * noise, and min-of-N measures the query, not the compiler; a failing
  * query is reported loudly as value −1 plus an `errors` list and stderr
  * trace — never as a fake timing.
  *
  * Besides the one-line stdout JSON (the driver's contract), the full
  * result — every run's timing per query, min, and spread — is written to
  * `SPARK_GRAFT_BENCH_OUT` (default `bench_local.json` in the CWD), because
  * the driver's artifact truncates long stdout and round 4 lost half the
  * per-query data to that.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: generic shuffle+codegen, then the flagship entry (parquet
    // scan path) on the smallest SF so no measured bytes are pre-cached.
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()

    // optional args = query names, for targeted re-measurement; the
    // driver passes none and gets the full set
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val allRuns = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            Some(e)
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (outcome.isEmpty) sec else -1.0
      }
      (name, times)
    }
    val results = allRuns.map { case (name, times) =>
      (name, if (times.contains(-1.0)) -1.0 else times.min)
    }
    val errors = results.collect { case (n, v) if v < 0 => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":${errors.mkString("[", ",", "]")},"sf":"$sfDir"}""")

    // Complete artifact: per-query all-run timings + min + max/min spread,
    // immune to the driver's stdout tail-truncation.
    val detail = allRuns.map { case (name, times) =>
      val min = if (times.contains(-1.0)) -1.0 else times.min
      val spread =
        if (times.contains(-1.0) || times.min <= 0) -1.0
        else times.max / times.min
      s""""$name":{"runs":[${times.mkString(",")}],"min":$min,"spread":$spread}"""
    }.mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs_per_query":$runs,"errors":${errors.mkString("[", ",", "]")},"queries":$detail}"""
    // best-effort: the stdout line above is the driver's contract; an
    // unwritable CWD must not turn a successful bench into exit != 0
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full artifact written to $out")
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $out: $e")
    }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
