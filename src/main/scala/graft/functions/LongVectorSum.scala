package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE: element-wise sum of `array<long>` vectors
  * — `vec_sum(q)[i] = Σ_rows q[i]`.
  *
  * Why a custom aggregate (SURVEY §5 preference order): the relational
  * way to sum vectors element-wise is posexplode → groupBy(key, dim) —
  * which multiplies the SHUFFLED row count by the dimension d (n·d
  * narrow rows through the exchange). This aggregate keeps vectors
  * in-row: the partial state is one long[d] per group per partition,
  * map-side combined like any other partial aggregate, so the exchange
  * moves `groups·partitions` buffers instead of n·d rows — at 100 TB /
  * d=64 that is a 64× cut in shuffled rows for every centroid-style
  * computation (k-means refinement, per-class centroids). State is d
  * longs per group — bounded by K·d, never by the corpus.
  *
  * Ragged inputs are a hard error (centroid math over mixed dims is
  * meaningless); empty groups and all-NULL groups return NULL. NULL
  * vectors are skipped, matching the built-in SUM convention. A null
  * ELEMENT inside a vector is likewise a hard error — a partial vector
  * has no meaningful element-wise sum, and silently reading the slot
  * as 0 (what `ArrayData.getLong` returns for a null entry) would
  * corrupt every centroid downstream.
  */
case class LongVectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  /** Empty sentinel until the first non-null row fixes the dimension. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length == 0) new Array[Long](n) else buf
      require(b.length == n,
        s"vec_sum: ragged vector lengths (${b.length} vs $n)")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i),
          s"vec_sum: null element at index $i (partial vectors have no sum)")
        b(i) += arr.getLong(i); i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.length == 0) b2
    else if (b2.length == 0) b1
    else {
      require(b1.length == b2.length,
        s"vec_sum: ragged vector lengths (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVectorSum =
    copy(child = newChild)
}

object LongVectorSum {
  /** DataFrame-API handle for the aggregate. */
  def vecSum(a: Column): Column =
    GraftBridge.column(
      LongVectorSum(GraftBridge.expression(a)).toAggregateExpression())
}
