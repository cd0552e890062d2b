package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bottom-k selection aggregate: `bottom_k(key, id, k)` keeps the k
  * smallest (key, id) pairs under the strict lexicographic order
  * (key asc, id asc). The buffer is a ≤ k-element sorted array that
  * merges by insertion, so the aggregate is partial-aggregation
  * friendly (map-side combine) AND chop-invariant: with distinct ids
  * the order is total, so the result is THE global k minimum whatever
  * the arrival or merge order — exactly the property incremental
  * streaming state needs.
  *
  * This is the streaming-safe counterpart of the native TopKPerGroup
  * plan (plans/TopKPlan.scala): the batch plan bounds the shuffle with
  * per-partition heaps; this bounds streaming STATE to k entries per
  * group, which is what makes weighted reservoir sampling viable on an
  * unbounded stream.
  *
  * Output: array<struct<ekey double, id bigint>>, ascending — position
  * i is sample rank i+1.
  */
case class BottomKPairsAgg(
    key: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("ekey", DoubleType).add("id", LongType), containsNull = false)

  private val ord = Ordering.Tuple2[Double, Long]

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def insert(buf: mutable.ArrayBuffer[(Double, Long)], kv: (Double, Long)): Unit =
    if (buf.size < k || ord.lt(kv, buf.last)) {
      var i = buf.indexWhere(e => ord.lt(kv, e)) // k is small: linear scan
      if (i < 0) i = buf.size
      buf.insert(i, kv)
      if (buf.size > k) buf.remove(buf.size - 1)
    }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)], input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      insert(buf, (kv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)], b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.map { case (e, i) => InternalRow(e, i) }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (e, i) => out.writeDouble(e); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf.append((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKPairsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKPairsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(key = c(0), id = c(1))
}

object BottomKAgg {
  /** k smallest (key, id) pairs, ascending (key asc, id asc). */
  def bottomK(key: Column, id: Column, k: Int): Column =
    Bridge.column(BottomKPairsAgg(Bridge.expression(key), Bridge.expression(id), k)
      .toAggregateExpression())
}
