package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeBlock, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CityHash64, **v1.0.2** — the exact revision ClickHouse vendors for its
  * `cityHash64()` SQL function (ClickHouse `contrib/cityhash102`; the
  * upstream v1.1 changed `HashLen0to16`/`HashLen17to32` and the long-input
  * loop, so a current-cityhash library would NOT reproduce ClickHouse ids).
  *
  * Why this exists (reference README.md:119-134): the reference's dedup
  * identity is `id UInt64 MATERIALIZED cityHash64(timestamp, name,
  * labels.key, labels.value, value)` on the ClickHouse side. graft's
  * portable `hash60` gives the same dedup SEMANTICS but different id
  * VALUES, so rows written by graft could not be cross-checked
  * byte-for-byte against an existing deployment's materialized ids. This
  * object re-implements the public algorithm (Google cityhash, MIT
  * license; Pike & Alakuijala) so the ids agree bit-for-bit.
  *
  * All arithmetic is on Scala `Long` used as uint64 — two's-complement
  * `+`/`*`/`^` agree with C unsigned semantics; the only care points are
  * LOGICAL shifts (`>>>`) and unsigned byte loads, both handled here.
  *
  * Scala top-level object ⇒ the JVM class `graft.functions.CityHash64`
  * carries static forwarders, so Janino-generated code calls
  * `graft.functions.CityHash64.hashBytes(...)` directly (same pattern as
  * Spark's own `XxHash64Function`).
  */
object CityHash64 {
  // CityHash v1.0.2 constants (cityhash/src/city.cc)
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL
  private final val K3 = 0xc949d7c7509e6557L
  private final val KMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  // Rotate right; the C code guards shift==0 (UB in C, defined on the JVM
  // but kept for 1:1 shape). RotateByAtLeast1 is the unguarded variant.
  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else java.lang.Long.rotateRight(v, shift)
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    java.lang.Long.rotateRight(v, shift)

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Murmur-inspired 128→64 fold (cityhash city.h `Hash128to64`); also
    * ClickHouse's pairwise combiner for multi-argument `cityHash64`.
    */
  def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * KMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * KMul
    b ^= (b >>> 47)
    b * KMul
  }

  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = (a + (b << 8)).toLong // uint32, always < 2^24 here
      val z = (len + (c << 2)).toLong
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val a = fetch64(s, off) * K1
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * K2
    val d = fetch64(s, off + len - 16) * K0
    hashLen16(
      rotate(a - b, 43) + rotate(c, 30) + d,
      a + rotate(b ^ K3, 20) - c + len)
  }

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    var z = fetch64(s, off + 24)
    var a = fetch64(s, off) + (len + fetch64(s, off + len - 16)) * K0
    var b = rotate(a + z, 52)
    var c = rotate(a, 37)
    a += fetch64(s, off + 8)
    c += rotate(a, 7)
    a += fetch64(s, off + 16)
    val vf = a + z
    val vs = b + rotate(a, 31) + c
    a = fetch64(s, off + 16) + fetch64(s, off + len - 32)
    z = fetch64(s, off + len - 8)
    b = rotate(a + z, 52)
    c = rotate(a, 37)
    a += fetch64(s, off + len - 24)
    c += rotate(a, 7)
    a += fetch64(s, off + len - 16)
    val wf = a + z
    val ws = b + rotate(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  // WeakHashLen32WithSeeds; the two outputs land in a caller-owned
  // 2-slot array (one allocation per >64-byte hash, none per loop pass,
  // and no shared mutable state — executors call this concurrently).
  @inline private def weakHash32(s: Array[Byte], i: Int, a0: Long, b0: Long,
      outA: Array[Long]): Unit = {
    val w = fetch64(s, i)
    val x = fetch64(s, i + 8)
    val y = fetch64(s, i + 16)
    val z = fetch64(s, i + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    outA(0) = a + z
    outA(1) = b + c
  }

  /** CityHash64 over `len` bytes of `s` starting at `off` (v1.0.2). */
  def hashBytes(s: Array[Byte], off: Int, len: Int): Long = {
    if (len <= 32) {
      if (len <= 16) hashLen0to16(s, off, len) else hashLen17to32(s, off, len)
    } else if (len <= 64) {
      hashLen33to64(s, off, len)
    } else {
      // 56 bytes of state: v, w, x, y, z (city.cc CityHash64, v1.0.2)
      var x = fetch64(s, off)
      var y = fetch64(s, off + len - 16) ^ K1
      var z = fetch64(s, off + len - 56) ^ K0
      val v = new Array[Long](2)
      val w = new Array[Long](2)
      weakHash32(s, off + len - 64, len.toLong, y, v)
      weakHash32(s, off + len - 32, len.toLong * K1, K0, w)
      z += shiftMix(v(1)) * K1
      x = rotate(z + x, 39) * K1
      y = rotate(y, 33) * K1
      var remaining = (len - 1) & ~63
      var p = off
      while (remaining != 0) {
        x = rotate(x + y + v(0) + fetch64(s, p + 16), 37) * K1
        y = rotate(y + v(1) + fetch64(s, p + 48), 42) * K1
        x ^= w(1)
        y ^= v(0)
        z = rotate(z ^ w(0), 33)
        val vs = v(1)
        val wEntry = w(0)
        weakHash32(s, p, vs * K1, x + wEntry, v)
        weakHash32(s, p + 32, z + w(1), y, w)
        val t = z; z = x; x = t
        p += 64
        remaining -= 64
      }
      hashLen16(
        hashLen16(v(0), w(0)) + shiftMix(y) * K1 + z,
        hashLen16(v(1), w(1)) + x)
    }
  }

  def hashBytes(s: Array[Byte]): Long = hashBytes(s, 0, s.length)

  /** CityHash64 of a UTF8String's bytes (ClickHouse hashes String columns
    * as raw bytes, no length prefix — FunctionsHashing.h executeString).
    */
  def hashUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length)
  }

  // ---- ClickHouse FunctionAnyHash conventions (FunctionsHashing.h) ----
  //
  // Multi-argument `cityHash64(a, b, ...)`: acc = hash(a); acc =
  // combineHashes(acc, hash(b)); ... where combineHashes = Hash128to64.
  //
  // POD (numeric) columns: ClickHouse's ImplCityHash64 sets
  // `use_int_hash_for_pods = true`, so numbers are hashed with
  // `intHash64(bit_cast<UInt64>(x))` (the 64-bit avalanche below), NOT by
  // CityHash64 of their bytes; bit_cast zero-extends narrower types.
  // Float64 goes through its raw IEEE bits. DateTime64(6) is Decimal64 →
  // the underlying Int64 microsecond count.
  //
  // Array columns (executeArray): acc ← fold(intHash64(array_length)),
  // then per element acc ← combineHashes(acc, hash(element)).
  //
  // These conventions are isolated HERE so a one-time golden check against
  // a live ClickHouse can adjust a single file if any detail drifts
  // between ClickHouse versions.

  /** ClickHouse `intHash64` (Common/HashTable/Hash.h): the 64-bit
    * finalizer used for POD columns under cityHash64.
    */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** ClickHouse combineHashes for cityHash64 = Hash128to64(h1, h2). */
  def combine(h1: Long, h2: Long): Long = hash128to64(h1, h2)

  /** Fold one scalar hash into the running multi-arg accumulator. */
  def foldScalar(acc: Long, first: Boolean, h: Long): Long =
    if (first) h else combine(acc, h)

  /** True iff the array holds a NULL element — [[CityHash64Expr]] yields
    * NULL for such rows (ClickHouse's plain Array(String) cannot hold
    * NULLs, so there is no ClickHouse value to be bit-exact against;
    * silently hashing a substitute would fabricate parity). */
  def hasNullElement(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Fold an array-of-strings column into the accumulator: length hash
    * first, then each element's CityHash64 (FunctionsHashing.h
    * executeArray).
    */
  def foldStringArray(acc: Long, first: Boolean, arr: ArrayData): Long = {
    val n = arr.numElements()
    var r = foldScalar(acc, first, intHash64(n.toLong))
    var i = 0
    while (i < n) {
      r = combine(r, hashUtf8(arr.getUTF8String(i)))
      i += 1
    }
    r
  }
}

/** Native Catalyst expression: ClickHouse-compatible
  * `cityHash64(arg, ...)` over mixed String / integer / Double /
  * Array(String) children — the row-id twin of the reference's
  * `MATERIALIZED cityHash64(timestamp, name, labels.key, labels.value,
  * value)` (reference README.md:119-134). `doGenCode` emits straight
  * static calls into [[CityHash64]] (no boxing, stays inside
  * whole-stage codegen); the interpreted `eval` twin keeps non-codegen
  * paths correct. NULL if any child is NULL (the reference schema has no
  * nullable id inputs).
  */
case class CityHash64Expr(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure("city_hash64 needs ≥1 argument")
    children.map(_.dataType).zipWithIndex.collectFirst {
      case (t, i) if !CityHash64Expr.supported(t) =>
        TypeCheckResult.TypeCheckFailure(
          s"city_hash64 argument $i has unsupported type $t " +
            "(want string/int/bigint/double/array<string>)")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = LongType
  // a NULL array ELEMENT also nullifies the result (no ClickHouse
  // Array(String) value exists to be bit-exact against)
  override def nullable: Boolean = children.exists(c =>
    c.nullable || (c.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }))
  override def prettyName: String = "city_hash64"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var acc = 0L
    var i = 0
    while (i < children.length) {
      val c = children(i)
      val v = c.eval(input)
      if (v == null) return null
      acc = c.dataType match {
        case StringType =>
          CityHash64.foldScalar(acc, i == 0,
            CityHash64.hashUtf8(v.asInstanceOf[UTF8String]))
        case LongType =>
          CityHash64.foldScalar(acc, i == 0,
            CityHash64.intHash64(v.asInstanceOf[Long]))
        case IntegerType => // bit_cast zero-extends narrower PODs
          CityHash64.foldScalar(acc, i == 0,
            CityHash64.intHash64(v.asInstanceOf[Int].toLong & 0xffffffffL))
        case DoubleType =>
          CityHash64.foldScalar(acc, i == 0, CityHash64.intHash64(
            java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])))
        case ArrayType(StringType, _) =>
          val arr = v.asInstanceOf[ArrayData]
          if (CityHash64.hasNullElement(arr)) return null
          CityHash64.foldStringArray(acc, i == 0, arr)
        case t => throw new IllegalStateException(s"unreachable: $t")
      }
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val city = "graft.functions.CityHash64"
    val acc = ctx.freshName("cityAcc")
    val evals = children.map(_.genCode(ctx))
    val folds = children.zipWithIndex.map { case (c, i) =>
      val e = evals(i)
      val fold = c.dataType match {
        case ArrayType(StringType, _) =>
          s"$acc = $city.foldStringArray($acc, ${i == 0}, ${e.value});"
        case StringType =>
          s"$acc = $city.foldScalar($acc, ${i == 0}, $city.hashUtf8(${e.value}));"
        case LongType =>
          s"$acc = $city.foldScalar($acc, ${i == 0}, $city.intHash64(${e.value}));"
        case IntegerType =>
          s"$acc = $city.foldScalar($acc, ${i == 0}, " +
            s"$city.intHash64(((long) ${e.value}) & 0xffffffffL));"
        case DoubleType =>
          s"$acc = $city.foldScalar($acc, ${i == 0}, " +
            s"$city.intHash64(Double.doubleToRawLongBits(${e.value})));"
        case t => throw new IllegalStateException(s"unreachable: $t")
      }
      val elemNullable = c.dataType match {
        case ArrayType(_, containsNull) => containsNull
        case _ => false
      }
      val nullCheck = Seq(
        if (nullable && c.nullable)
          s"if (${e.isNull}) { ${ev.isNull} = true; break; }"
        else "",
        if (nullable && elemNullable)
          s"if ($city.hasNullElement(${e.value})) " +
            s"{ ${ev.isNull} = true; break; }"
        else ""
      ).filter(_.nonEmpty).mkString("\n")
      s"""
         |${e.code}
         |$nullCheck
         |$fold
       """.stripMargin
    }
    val nullDecl = if (nullable) s"boolean ${ev.isNull} = false;" else ""
    val body =
      s"""
         |long $acc = 0L;
         |$nullDecl
         |do {
         |${folds.mkString("\n")}
         |} while (false);
         |final long ${ev.value} = $acc;
       """.stripMargin
    // When !nullable, no `boolean <isNull>` is declared above, so a parent
    // that consults ev.isNull without checking child.nullable would emit a
    // reference to an undeclared variable and force codegen fallback.
    // Spark's nullSafeCodeGen convention: hand back FalseLiteral instead.
    if (nullable) ev.copy(code = CodeBlock(Seq(body), Seq.empty))
    else ev.copy(code = CodeBlock(Seq(body), Seq.empty), isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object CityHash64Expr {
  private[functions] def supported(t: DataType): Boolean = t match {
    case StringType | LongType | IntegerType | DoubleType => true
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** DataFrame-API handle: ClickHouse-bit-exact cityHash64. */
  def cityHash64(cols: Column*): Column =
    GraftBridge.column(CityHash64Expr(cols.map(GraftBridge.expression)))
}
