package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE: the K-Minimum-Values sketch — the k
  * smallest DISTINCT values of a long column, as a sorted array.
  *
  * Why a custom aggregate (SURVEY §5 preference order): KMV state is a
  * bounded sorted set with set-union merge — exactly the
  * `TypedImperativeAggregate` contract (partial buffers per partition,
  * map-side combined, mergeable across partitions AND across streaming
  * micro-batches), and nothing the built-in aggregates express without
  * first materializing a full `distinct` (whose state grows with the
  * corpus — the thing a sketch exists to avoid). With this aggregate
  * the distinct-count estimate `(k−1)·SPACE / h₍ₖ₎` needs ONE pass, k
  * longs of state per group, and the same declarative plan serves
  * batch and Structured Streaming (`SketchStream.kmvSketch`): a
  * streaming distinct-count whose state per key is 64 longs, never a
  * growing hash set.
  *
  * Distinctness is the aggregate's own job (duplicate inputs are
  * no-ops), so callers feed RAW hash streams — no pre-`distinct`, no
  * shuffle ahead of the partial aggregate. NULL inputs are skipped
  * like the built-in aggregates; fewer than k distinct values yield
  * the full (shorter) sorted array and the caller's estimator falls
  * back to the exact count it implies.
  */
case class KmvLows(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k > 0, "kmv_lows: k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_lows requires bigint, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_lows"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  /** Sorted-insert `h` if it is new and among the k smallest. */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // duplicate — KMV is a DISTINCT sketch
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // evict the current k-th smallest, shift the tail right
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else insert(buf, v.asInstanceOf[Long])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var out = b1
    var i = 0
    while (i < b2.length) { out = insert(out, b2(i)); i += 1 }
    out
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvLows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvLows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvLows =
    copy(child = newChild)
}

object KmvLows {
  /** DataFrame-API handle for the aggregate. */
  def kmvLows(c: Column, k: Int = 64): Column =
    GraftBridge.column(
      KmvLows(GraftBridge.expression(c), k).toAggregateExpression())
}
