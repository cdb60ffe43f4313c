package graft

import graft.functions.CityHash64
import org.apache.spark.sql.SparkSession

/** The extensions registration path end-to-end: a session built with
  * `GraftExtensions` must expose every native expression to PLAIN SQL
  * TEXT and rewrite the rank-filter idiom onto the heap operator — the
  * deployment story for users who never touch the Scala API. Built via
  * `builder.withExtensions(new GraftExtensions)` as a SECOND
  * SparkSession over the shared SparkContext — the same code path the
  * production `spark.sql.extensions=graft.GraftExtensions` config
  * drives, which can't be exercised here directly because static SQL
  * confs are pinned by the suite's pre-existing context. (Sessions own
  * their extension lists; suites run sequentially under `Test/fork`,
  * and the default/active session is restored in finally.)
  */
class GraftExtensionsSpec extends SparkSpec {

  test("a GraftExtensions session exposes SQL functions + heap rewrite") {
    val shared = spark // force shared-session init before we swap it out
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne shared, "a fresh session must have been constructed")

      val r = s2.sql(
        "SELECT vec_dot(array(1L,2L), array(3L,4L)) AS d, " +
          "city_hash64('hash') AS ch, " +
          "format_float(double(5.0)) AS ff, " +
          "ch_array(array('a','b')) AS ca").head()
      assert(r.getAs[Long]("d") == 1L * 3L + 2L * 4L)
      assert(r.getAs[Long]("ch") ==
        CityHash64.hashBytes("hash".getBytes("UTF-8")))
      assert(r.getAs[String]("ff") == "5")
      assert(r.getAs[String]("ca") == "['a','b']")

      // the vec_sum AGGREGATE resolves through the same extensions path
      s2.range(3).selectExpr("array(id, id * 2) AS v")
        .createOrReplaceTempView("ext_vs_in")
      val vs = s2.sql("SELECT vec_sum(v) AS s FROM ext_vs_in")
        .head().getAs[scala.collection.Seq[Long]]("s").toSeq
      assert(vs == Seq(0L + 1L + 2L, 0L + 2L + 4L))

      // multi-arg city_hash64 through SQL == the expression API (avoid
      // -0.0 here: SQL constant folding normalizes the sign bit away)
      val multi = s2.sql(
        "SELECT city_hash64(1705320060123456L, 'node_cpu_seconds_total', " +
          "array('cpu','instance','mode'), array('0','n1','idle'), " +
          "double(0.25)) AS id").head().getLong(0)
      assert(multi == 2082056042311452147L) // CityHash64Spec vector

      // the rank-filter idiom from SQL TEXT plans onto the heap operator
      import s2.implicits._
      Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5))
        .toDF("k", "v").createOrReplaceTempView("ext_t")
      val df = s2.sql(
        """SELECT * FROM (
          |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) rn
          |  FROM ext_t) WHERE rn <= 2""".stripMargin)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "rank-filter SQL must rewrite onto the bounded-heap operator")
      assert(df.collect().map(r2 =>
        (r2.getString(0), r2.getInt(1), r2.getInt(2))).toSet ==
        Set(("a", 1, 1), ("a", 2, 2), ("b", 4, 1), ("b", 5, 2)))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
