package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives (SURVEY.md §4).
  *
  * The reference uses ClickHouse `cityHash64(...)` as the content-hash row
  * identity (reference README.md metrics-table DDL). cityHash64 is not
  * available in DuckDB (the oracle), so the engine standardizes on a
  * 60-bit hash derived from md5 — md5 is bit-identical everywhere:
  *
  *   Spark :  conv(substr(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB:  CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * 15 hex chars = 60 bits < 2^63, so the value is always a non-negative
  * BIGINT in both engines. All hash-based operators (content ids, MinHash
  * seeds, SimHash bit extraction, LSH planes, fingerprints) build on this,
  * which makes them oracle-verifiable rather than rows-only-checked.
  *
  * Everything here is `org.apache.spark.sql.functions` built-ins only —
  * codegen'd, no UDFs, whole-stage-codegen friendly.
  */
object Portable {

  /** 60-bit non-negative deterministic hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of the same hash, for oracle SQL authoring. */
  def hash60Sql(inner: String): String =
    s"CAST('0x' || substr(md5($inner), 1, 15) AS BIGINT)"

  /** JVM twin of [[hash60]] — md5 hex, first 15 nibbles as a long.
    * Bit-identical to the Spark/DuckDB expressions (asserted in specs);
    * used to derive plan-time constants (MinHash coefficients, LSH plane
    * seeds) that must be embedded identically in both engines' plans.
    */
  def hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Extract bit `i` (0 = LSB) of a long column as 0/1 int. */
  def bit(c: Column, i: Int): Column =
    shiftright(c, i).bitwiseAND(lit(1L)).cast("int")

  /** TabSeparated escaping per ClickHouse spec (reference etl_job.py:762-780):
    * backslash first, then tab, then newline. Literal `replace` (a
    * codegen'd StringReplace), not `regexp_replace` — the patterns are
    * literal and the regex engine cost ~3× on the rendering hot path. */
  def tsvEscape(c: Column): Column = {
    val bs = replace(c, lit("\\"), lit("\\\\"))
    val tb = replace(bs, lit("\t"), lit("\\t"))
    replace(tb, lit("\n"), lit("\\n"))
  }

  /** ClickHouse array-literal rendering of an array<string> column:
    * `['a','b']`, elements TSV-escaped then `'`-escaped (reference
    * etl_job.py:782-808). Native single-pass expression — see
    * [[ChArrayExpr]] for why (the transform-lambda form evaluated
    * interpreted per element on the rendering hot path). */
  def chArray(arr: Column): Column = ChArrayExpr.chArray(arr)

  /** One literal backslash, for assembling DuckDB SQL. (The `s` string
    * interpolator processes escapes even in triple quotes, so backslashes
    * are concatenated explicitly rather than written inline.) */
  private val BS = "\\"

  /** DuckDB rendering of [[tsvEscape]], for oracle SQL authoring:
    * `replace(replace(replace(x, '\', '\\'), chr(9), '\t'), chr(10), '\n')`.
    */
  def tsvEscapeSql(inner: String): String =
    "replace(replace(replace(" + inner +
      ", '" + BS + "', '" + BS + BS + "')" +
      ", chr(9), '" + BS + "t')" +
      ", chr(10), '" + BS + "n')"

  /** DuckDB rendering of [[chArray]] over an array expression; the inner
    * quote-escape is `replace(e, '''', '\''')` (single quote → `\'`).
    * `coalesce(e, '')` matches [[ChFormat.chArray]]'s null-element rule:
    * without it DuckDB would propagate NULL through the transform and
    * `array_to_string` would DROP the element (`[]` vs Spark's `['']`).
    */
  def chArraySql(arr: String): String =
    "('[' || array_to_string(list_transform(" + arr +
      ", e -> '''' || replace(" + tsvEscapeSql("coalesce(e, '')") +
      ", '''', '" + BS + "''') || ''''), ',') || ']')"

  /** Render a value as fixed 2-decimal string via integer cents. Unlike
    * `%.2f` (Java Formatter rounds the decimal expansion HALF_UP, C printf
    * rounds the binary double half-even — they disagree on `.xx5`
    * boundaries), `round(v*100)` + integer formatting is bit-identical
    * across engines: both operate on the same binary double and round
    * exact-half away from zero. */
  def centsStr(v: Column): Column = {
    val cents = round(v * 100).cast("long")
    val a = abs(cents)
    concat(
      when(cents < 0, lit("-")).otherwise(lit("")),
      ((a - (a % 100)) / 100).cast("long").cast("string"), lit("."),
      lpad((a % 100).cast("string"), 2, "0"))
  }

  /** DuckDB rendering of [[centsStr]], for oracle SQL authoring. */
  def centsStrSql(inner: String): String = {
    val c = s"CAST(round(($inner)*100) AS BIGINT)"
    s"(CASE WHEN $c < 0 THEN '-' ELSE '' END || " +
      s"CAST(abs($c) // 100 AS VARCHAR) || '.' || " +
      s"lpad(CAST(abs($c) % 100 AS VARCHAR), 2, '0'))"
  }

  /** Epoch-µs long → `"seconds.micros"` string with exact integer math
    * (`%.6f` on a double re-rounds the binary value; this never does). */
  def microsSecondsStr(tsUs: Column): Column =
    concat(
      ((tsUs - (tsUs % 1000000L)) / 1000000L).cast("long").cast("string"),
      lit("."), lpad((tsUs % 1000000L).cast("string"), 6, "0"))

  /** DuckDB rendering of [[microsSecondsStr]]. */
  def microsSecondsStrSql(inner: String): String =
    s"(CAST(($inner) // 1000000 AS VARCHAR) || '.' || " +
      s"lpad(CAST(($inner) % 1000000 AS VARCHAR), 6, '0'))"

  /** R4 float formatting (reference etl_job.py:810-844): no scientific
    * notation ever; `nan` / `inf` / `-inf` lowercase; trailing zeros
    * stripped — Python-identical output. Delegates to the native
    * [[FormatFloatExpr]] (one codegen'd JVM call; the equivalent
    * expression tree was ~50× slower on the ingest hot path). Spec'd
    * against the reference's cases in PortableSpec.
    */
  def formatFloat(v: Column): Column = FormatFloatExpr.formatFloat(v)
}
