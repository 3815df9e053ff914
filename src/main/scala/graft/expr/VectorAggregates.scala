package graft.expr

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable (Σ vectors, count) aggregation buffer; `sums` is sized lazily on
  * the first row so the aggregate needs no dim parameter. */
final class VecAvgBuf(var sums: Array[Double], var n: Long)

/** Element-wise mean of ARRAY<FLOAT|DOUBLE> vectors — the centroid
  * aggregate a vector pipeline keeps needing (per-label prototypes, cluster
  * centroid refreshes, embedding drift monitors), as a typed Catalyst
  * aggregate (the third custom tier next to the codegen scalar expressions
  * and the TopKPerKey physical operator).
  *
  * Execution shape: a HashAggregate with partial aggregation — each task
  * folds its rows into one (Σ, n) buffer (dim doubles + a count), partials
  * merge on the shuffle, so the data moved per group is O(dim), never
  * O(rows). That is exactly the map-side-combine contract a 100 TB
  * `groupBy(label)` needs. Nulls and length-mismatched tails are ignored
  * per element (fixed-dim collections never hit that path); empty groups
  * yield null. */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvgBuf] {

  override def prettyName: String = "vec_avg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT|DOUBLE> arg, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): VecAvgBuf = new VecAvgBuf(Array.emptyDoubleArray, 0L)

  override def update(buf: VecAvgBuf, input: InternalRow): VecAvgBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (buf.sums.length < m) buf.sums = java.util.Arrays.copyOf(buf.sums, m)
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i))
          buf.sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecAvgBuf, other: VecAvgBuf): VecAvgBuf = {
    if (buf.sums.length < other.sums.length)
      buf.sums = java.util.Arrays.copyOf(buf.sums, other.sums.length)
    var i = 0
    while (i < other.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: VecAvgBuf): Any =
    if (buf.n == 0) null
    else new GenericArrayData(buf.sums.map(_ / buf.n))

  override def serialize(buf: VecAvgBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.sums.length)
    bb.putLong(buf.n)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvgBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sums = Array.fill((bytes.length - 8) / 8)(bb.getDouble)
    new VecAvgBuf(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAgg {
  /** Column-API entry point: `df.groupBy(k).agg(VectorAgg.vecAvg(col("v")))`. */
  def vecAvg(v: Column): Column =
    GraftColumnBridge.column(
      VectorAvg(GraftColumnBridge.expression(v)).toAggregateExpression())
}
