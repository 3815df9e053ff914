package graft.expr

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values sketch buffer: the k smallest DISTINCT strings seen so
  * far, kept in a bounded sorted set — O(k) state regardless of input
  * cardinality. Elements are [[UTF8String]]s, whose `compareTo` is binary
  * UTF-8 order — the SAME order Spark's `min`/`sort_array` and external
  * SQL engines use. (A TreeSet[java.lang.String] would compare UTF-16 code
  * units, which disagrees with UTF-8 order for supplementary characters.)
  */
final class KMinBuf(val k: Int) {
  val set = new java.util.TreeSet[UTF8String]()
  def add(s: UTF8String): Unit = {
    // skip the insert when the buffer is full and s can't make the cut —
    // at 100 TB most rows take this O(log k) comparison-only path
    if (set.size < k || set.last().compareTo(s) > 0) {
      set.add(s)
      if (set.size > k) set.remove(set.last())
    }
  }
}

/** `kmin_values(expr, k)`: the k smallest distinct STRING values per group,
  * as a sorted array — the KMV distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002) over any
  * uniformly-hashed column. With h the k-th smallest of U distinct uniform
  * hashes in [0,1), E[h] ≈ k/U, so (k−1)/h estimates U.
  *
  * Why a custom TypedImperativeAggregate and not `slice(sort_array(
  * collect_list(h)), 1, k)`: collect_list materializes the ENTIRE group —
  * O(rows) buffer and shuffle bytes — while this buffer is a capped
  * TreeSet: O(k) state, map-side partial aggregation, O(k) per group on
  * the wire. At 100 TB the difference is "a 16 KB sketch per group"
  * versus "the group". Duplicate values dedup inside the buffer (a sorted
  * SET), so the input needs NO pre-distinct pass — counting distinct
  * without a distinct shuffle is the whole point of the sketch.
  *
  * The hash is the CALLER's choice (e.g. md5 hex) — deliberately, so an
  * external SQL engine can reproduce the sketch bit for bit (unlike HLL++
  * register layouts, which are engine-private). */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinBuf] {

  require(k > 0, s"kmin_values needs k >= 1, got $k")

  override def prettyName: String = "kmin_values"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING arg, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KMinBuf = new KMinBuf(k)

  override def update(buf: KMinBuf, input: InternalRow): KMinBuf = {
    val v = child.eval(input)
    // clone: the evaluated UTF8String may point into a reused row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: KMinBuf, other: KMinBuf): KMinBuf = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KMinBuf): Any = {
    val arr = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: KMinBuf): Array[Byte] = {
    val items = new Array[Array[Byte]](buf.set.size)
    var total = 4
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) {
      items(i) = it.next().getBytes
      total += 4 + items(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(items.length)
    items.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KMinBuf(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.set.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchAgg {
  /** `df.groupBy(g).agg(SketchAgg.kminValues(col("h"), 64))`. */
  def kminValues(v: Column, k: Int): Column =
    GraftColumnBridge.column(
      KMinValues(GraftColumnBridge.expression(v), k).toAggregateExpression())
}
