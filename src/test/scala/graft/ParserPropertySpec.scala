package graft

import graft.sources.{PrometheusJson, TsvSource}
import org.apache.spark.sql.functions._

/** Property-style (seeded, randomized) checks over the query_range
  * parser — the CI-grade fuzzing the reference gets from its 4.3k-LoC
  * test suite, compressed into generative invariants:
  *
  *  - row conservation: every [ts,value] point becomes exactly one row
  *  - R1: label keys always sorted, __name__ extracted, parallel arrays
  *  - R2: value-parse classification matches a JVM float() twin
  *  - R3/R4: the rendered TSV line count matches ok-rows, and the TSV
  *    round-trips through TsvSource (escape-heavy labels included)
  */
class ParserPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(424242L)

  /** Escape-heavy label text: quotes, backslashes, tabs, newlines,
    * brackets, unicode. JSON-encoded with proper escaping below. */
  private def randomLabel(): String = {
    val specials = "\\\t\n'\"[],:{}"
    val n = 1 + rnd.nextInt(12)
    (0 until n).map { _ =>
      rnd.nextInt(6) match {
        case 0 => specials(rnd.nextInt(specials.length))
        case 1 => (0x410 + rnd.nextInt(32)).toChar // cyrillic block
        case _ => (32 + rnd.nextInt(95)).toChar
      }
    }.mkString
  }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Value tokens at Python-float() breadth plus junk; paired with
    * whether CPython float() would accept them (the R2 rule). */
  private val valuePool: Seq[(String, Boolean)] = Seq(
    "\"1.5\"" -> true, "\"-2\"" -> true, "\"+3.25\"" -> true,
    "\".5\"" -> true, "\"5.\"" -> true, "\"1e-3\"" -> true,
    "\"2E+4\"" -> true, "\"NaN\"" -> true, "\"nan\"" -> true,
    "\"Inf\"" -> true, "\"-Inf\"" -> true, "\"Infinity\"" -> true,
    "\"  7.5  \"" -> true, // float() strips whitespace
    "7.25" -> true, "3" -> true, // number-typed tokens
    "\"oops\"" -> false, "\"1.2.3\"" -> false, "\"\"" -> false,
    "\"10 20\"" -> false, "\"0x10\"" -> false, "\"1,5\"" -> false)

  case class Series(name: String, labels: Map[String, String],
                    points: Seq[(Long, String, Boolean)])

  private def randomSeries(i: Int): Series = {
    val labels = (0 until rnd.nextInt(4))
      .map(j => s"k${j}_${randomLabel()}" -> randomLabel()).toMap
    val points = (0 to rnd.nextInt(5)).map { p =>
      val (tok, ok) = valuePool(rnd.nextInt(valuePool.size))
      (1700000000L + i * 1000L + p, tok, ok)
    }
    Series(s"metric_$i", labels, points)
  }

  private def render(ss: Seq[Series]): String = {
    val series = ss.map { s =>
      val metric = (Map("__name__" -> s.name) ++ s.labels)
        .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString(",")
      val values = s.points.map { case (t, tok, _) => s"[$t,$tok]" }.mkString(",")
      s"""{"metric":{$metric},"values":[$values]}"""
    }.mkString(",")
    s"""{"status":"success","data":{"resultType":"matrix","result":[$series]}}"""
  }

  private val seriesSet = Seq.tabulate(60)(randomSeries)
  private lazy val parsed =
    PrometheusJson.parse(Seq(render(seriesSet)).toDF("json"), "json")
      .persist()

  test("row conservation: one row per [ts,value] point") {
    assert(parsed.count() == seriesSet.map(_.points.size).sum)
  }

  test("R1: label keys sorted, parallel arrays, __name__ extracted") {
    val rows = parsed.select("name", "label_keys", "label_values").collect()
    val byName = seriesSet.map(s => s.name -> s.labels).toMap
    rows.foreach { r =>
      val keys = r.getAs[scala.collection.Seq[String]]("label_keys").toSeq
      val values = r.getAs[scala.collection.Seq[String]]("label_values").toSeq
      assert(keys == keys.sorted, s"unsorted keys: $keys")
      assert(keys.size == values.size)
      val expected = byName(r.getAs[String]("name"))
      assert(keys.zip(values).toMap == expected)
      assert(!keys.contains("__name__"))
    }
  }

  test("R2: ok/skip classification matches the declared float() breadth") {
    val expectedOk = seriesSet.flatMap(_.points).count(_._3)
    val expectedSkip = seriesSet.flatMap(_.points).count(!_._3)
    val got = parsed.agg(
      sum(when(col("ok"), 1L).otherwise(0L)),
      sum(when(!col("ok"), 1L).otherwise(0L))).head()
    assert(got.getLong(0) == expectedOk)
    assert(got.getLong(1) == expectedSkip)
  }

  test("R3/R4: TSV renders ok-rows only and round-trips through TsvSource") {
    val lines = PrometheusJson.tsvLines(PrometheusJson.metricRows(parsed))
    val n = lines.count()
    assert(n == seriesSet.flatMap(_.points).count(_._3))
    val dir = tmpDir("parser_prop") + "/tsv"
    lines.write.text(dir)
    val back = TsvSource.readMetrics(spark, dir)
    assert(back.count() == n)
    // label round-trip through escape → array literal → lex → unescape
    val origLabels = seriesSet.map(s => s.name -> s.labels.toSeq.sorted).toMap
    back.select("name", "label_keys", "label_values").collect().foreach { r =>
      val got = r.getAs[scala.collection.Seq[String]]("label_keys").toSeq
        .zip(r.getAs[scala.collection.Seq[String]]("label_values").toSeq)
      assert(got == origLabels(r.getAs[String]("name")),
        s"label round-trip mismatch for ${r.getAs[String]("name")}")
    }
  }
}
