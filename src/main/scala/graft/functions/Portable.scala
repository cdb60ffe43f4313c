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

  /** Extract bit `i` (0 = LSB) of a long column as 0/1 int. */
  def bit(c: Column, i: Int): Column =
    shiftright(c, i).bitwiseAND(lit(1L)).cast("int")

  /** TabSeparated escaping per ClickHouse spec (reference etl_job.py:762-780):
    * backslash first, then tab, then newline. */
  def tsvEscape(c: Column): Column = {
    val bs = regexp_replace(c, "\\\\", "\\\\\\\\")
    val tb = regexp_replace(bs, "\t", "\\\\t")
    regexp_replace(tb, "\n", "\\\\n")
  }

  /** ClickHouse array-literal rendering of an array<string> column:
    * `['a','b']`, elements TSV-escaped then `'`-escaped
    * (reference etl_job.py:782-808). */
  def chArray(arr: Column): Column = {
    val escaped = transform(arr, e => {
      val t = tsvEscape(e)
      concat(lit("'"), regexp_replace(t, "'", "\\\\'"), lit("'"))
    })
    concat(lit("["), array_join(escaped, ","), lit("]"))
  }
}
