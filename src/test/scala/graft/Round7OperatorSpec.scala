package graft

import graft.operators.{MetricsEtl, Olap}
import org.apache.spark.sql.Row

/** Independent cross-checks for the round-7 operators (the
  * Round6OperatorSpec pattern): each result is re-derived from the raw
  * parquet by a from-scratch JVM computation that shares NO formulation
  * with either the Spark plan or the DuckDB oracle SQL.
  */
class Round7OperatorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Array[Row] =
    Tables.table(spark, dir, name).collect()

  test("q_supp_part_cnt == brute-force distinct-supplier count (Q16)") {
    val badSupp = rows("supplier")
      .filter(_.getAs[Double]("s_acctbal") < 0)
      .map(_.getAs[Long]("s_suppkey")).toSet
    val parts = rows("part").map { r =>
      r.getAs[Long]("p_partkey") ->
        ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[Int]("p_size")))
    }.toMap
    val sizes = Set(3, 9, 14, 19, 23, 36, 45, 49)
    val expected = rows("lineitem")
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .distinct
      .filterNot { case (_, s) => badSupp(s) }
      .flatMap { case (p, s) => parts.get(p).map(_ -> s) }
      .filter { case ((b, t, sz), _) =>
        b != "Brand#13" && !t.startsWith("MEDIUM") && sizes(sz) }
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).distinct.length.toLong }
    val got = Olap.qSuppPartCnt(spark, dir).collect().map { r =>
      (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Long]("p_size").toInt) -> r.getAs[Long]("supplier_cnt")
    }.toMap
    assert(got == expected)
  }

  test("q_excess_supplier == brute-force qualifying-supplier set (Q20)") {
    val promo = rows("part").filter(_.getAs[String]("p_type") == "PROMO")
      .map(_.getAs[Long]("p_partkey")).toSet
    def shipYear(r: Row): Int = r.getAs[Any]("l_shipdate") match {
      case t: java.sql.Timestamp =>
        t.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      case d: java.time.LocalDateTime => d.getYear
    }
    val qualifying = rows("lineitem")
      .filter(r => promo(r.getAs[Long]("l_partkey")) && shipYear(r) == 1996)
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .collect { case ((_, s), ls)
          if Math.round(ls.map(_.getAs[Double]("l_quantity")).sum) > 50 => s }
      .toSet
    val got = Olap.qExcessSupplier(spark, dir).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(got == qualifying)
    assert(got.nonEmpty, "fixture must exercise the non-empty branch")
  }

  test("q_promql_round: integer form == float floor(v/to + 0.5)*to") {
    val got = MetricsEtl.qPromqlRound(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val c = r.getAs[Long]("cents")
      for ((t, col) <- Seq(1L -> "round_c1", 50L -> "round_c50",
          100L -> "round_c100")) {
        val want = (math.floor(c.toDouble / t + 0.5) * t).toLong
        assert(r.getAs[Long](col) == want,
          s"cents=$c to=$t: ${r.getAs[Long](col)} != $want")
      }
    }
  }

  test("q_sort_by_label ranks == label-lexicographic order of the vector") {
    val got = MetricsEtl.qSortByLabel(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank_asc"))
    val sorted = got.sortBy(r =>
      (r.getAs[String]("name"), r.getAs[Long]("user_id")))
    assert(got.toSeq == sorted.toSeq, "rank_asc must equal label order")
    val n = got.length.toLong
    got.foreach(r => assert(
      r.getAs[Long]("rank_desc") == n - r.getAs[Long]("rank_asc") + 1))
  }

  test("q_group_agg == presence map of the instant vector") {
    val iv = MetricsEtl.qInstantVector(spark, dir).collect()
      .groupBy(_.getAs[String]("name"))
    val got = MetricsEtl.qGroupAgg(spark, dir).collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("group_value"), r.getAs[Long]("n_series")))).toMap
    assert(got.keySet == iv.keySet)
    got.foreach { case (name, (gv, n)) =>
      assert(gv == 1L)
      assert(n == iv(name).length.toLong)
    }
  }
}
