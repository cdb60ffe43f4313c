package graft

import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Property-style checks (seeded, 200 samples each) over the portable
  * primitives — the invariants the reference's test suite pins for its
  * escaping/formatting helpers (etl_job.py:762-844), checked against
  * randomized inputs rather than just the canonical cases. */
class PortablePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randomString(): String = {
    val specials = "\\\t\n'[],"
    val n = rnd.nextInt(24)
    (0 until n).map { _ =>
      if (rnd.nextInt(4) == 0) specials(rnd.nextInt(specials.length))
      else (32 + rnd.nextInt(95)).toChar
    }.mkString
  }

  private def unescapeTsv(s: String): String = {
    // inverse of the reference's escape: scan for backslash pairs
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case c => b.append(c); i += 2 // \' from chArray elements
        }
      } else { b.append(s(i)); i += 1 }
    }
    b.toString
  }

  test("tsvEscape: output never contains raw tab/newline; roundtrips") {
    val samples = Seq.fill(200)(randomString()).distinct
    val escaped = samples.toDF("v")
      .select(col("v"), tsvEscape(col("v")).as("e")).collect()
    escaped.foreach { r =>
      val (orig, esc) = (r.getString(0), r.getString(1))
      assert(!esc.contains('\t') && !esc.contains('\n'),
        s"raw control char survives in ${esc}")
      assert(unescapeTsv(esc) == orig, s"roundtrip failed for ${orig}")
    }
  }

  test("chArray: bracketed, quoted, no raw tab/newline, roundtrips") {
    val samples = Seq.fill(100)(Seq.fill(rnd.nextInt(4))(randomString()))
    val rows = samples.toDF("v")
      .select(chArray(col("v")).as("a")).collect().map(_.getString(0))
    samples.zip(rows).foreach { case (orig, rendered) =>
      assert(rendered.startsWith("[") && rendered.endsWith("]"))
      assert(!rendered.contains('\t') && !rendered.contains('\n'))
      if (orig.isEmpty) assert(rendered == "[]")
      else {
        // lex the literal back the way ClickHouse would: quoted
        // elements, backslash escapes one char
        val inner = rendered.substring(1, rendered.length - 1)
        val parts = scala.collection.mutable.Buffer[String]()
        var i = 0
        while (i < inner.length) {
          assert(inner(i) == '\'', s"expected quote at $i in $rendered")
          i += 1
          val b = new StringBuilder
          while (inner(i) != '\'') {
            if (inner(i) == '\\') {
              inner(i + 1) match {
                case '\\' => b.append('\\')
                case 't' => b.append('\t')
                case 'n' => b.append('\n')
                case '\'' => b.append('\'')
                case c => b.append(c)
              }
              i += 2
            } else { b.append(inner(i)); i += 1 }
          }
          i += 1 // closing quote
          parts += b.toString
          if (i < inner.length) {
            assert(inner(i) == ',', s"expected comma at $i in $rendered")
            i += 1
          }
        }
        assert(parts.toSeq == orig, s"array roundtrip failed for $orig")
      }
    }
  }

  test("formatFloat: never scientific, parseable, reference precision") {
    val samples = Seq.fill(200) {
      val mag = math.pow(10, rnd.nextInt(24) - 12)
      (rnd.nextDouble() * 2 - 1) * mag
    } :+ 0.0 :+ -0.0
    val out = samples.toDF("v")
      .select(col("v"), formatFloat(col("v")).as("f")).collect()
    out.foreach { r =>
      val (v, s) = (r.getDouble(0), r.getString(1))
      assert(!s.toLowerCase.contains("e"), s"scientific notation in $s")
      val back = s.toDouble
      // precision contract matches the reference: 15 significant digits
      // in the %g range, 15 DECIMAL PLACES in the %.15f fallback — tiny
      // magnitudes keep absolute (not relative) precision, exactly like
      // etl_job._format_float under CPython
      val tol = math.max(1e-15, math.abs(v) * 1e-14)
      assert(math.abs(back - v) <= tol, s"formatFloat($v) = $s → $back")
    }
  }

  test("centsStr: equals BigDecimal rendering of round(v*100)/100") {
    val samples = Seq.fill(200)((rnd.nextDouble() * 2 - 1) * 10000)
    val out = samples.toDF("v")
      .select(col("v"), centsStr(col("v")).as("s")).collect()
    out.foreach { r =>
      val (v, s) = (r.getDouble(0), r.getString(1))
      val cents = BigDecimal(v * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val expected =
        (if (cents < 0) "-" else "") +
          s"${math.abs(cents) / 100}." + f"${math.abs(cents) % 100}%02d"
      assert(s == expected, s"centsStr($v)")
    }
  }

  test("hash60: Spark == JVM on random strings, always in [0, 2^60)") {
    val samples = Seq.fill(100)(randomString()).distinct
    val out = samples.toDF("v")
      .select(col("v"), hash60(col("v")).as("h")).collect()
    out.foreach { r =>
      val (s, h) = (r.getString(0), r.getLong(1))
      assert(h == hash60Jvm(s) && h >= 0 && h < (1L << 60), s"hash60($s)")
    }
  }
}
