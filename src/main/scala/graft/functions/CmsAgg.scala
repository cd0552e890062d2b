package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch aggregate: `cms_sketch(item)` builds a D×W counter
  * grid (D=3 hash rows, W=64 buckets) over a stream of string items;
  * the frequency estimate for an item is min over rows of its bucket's
  * counter — never an undercount, overcount bounded by ‖stream‖/W per
  * row (Cormode & Muthukrishnan 2005).
  *
  * The 100 TB properties: fixed 1.5 KB state regardless of cardinality,
  * and merge = elementwise counter ADDITION — commutative/associative,
  * so the sketch is bit-identical under any partitioning or micro-batch
  * chop (the same argument as QuantileSketchAgg, and unlike GK/HLL whose
  * merge is order-sensitive). Because the row hashes are the PORTABLE
  * polynomial hash (HashFunctions.polyHash with per-row seeds), a SQL
  * engine can replay the entire sketch as three GROUP BYs — this is the
  * one sketch in the library whose internals are fully oracle-backed,
  * not just error-bounded by a spec.
  */
object CmsAgg {
  val Depth = 3
  val Width = 64
  /** Per-row hash seeds: row d folds from seed 7 + 101·d (co-prime
    * offsets; any fixed distinct seeds give independent-enough rows
    * for the CM bound). Shared with oracle SQL via [[bucketSql]]. */
  val seeds: Array[Long] = Array.tabulate(Depth)(d => HashFunctions.PolySeed + 101L * d)

  def bucket(s: UTF8String, d: Int): Int =
    (HashFunctions.polyHashWith(s, seeds(d), HashFunctions.PolyMul) % Width).toInt

  /** The identical bucket computation as DuckDB SQL text. */
  def bucketSql(e: String, d: Int): String =
    s"(${HashFunctions.polyHashSql(e, seeds(d))} % $Width)"

  /** D·W flat counter array, row-major: slot = d·W + bucket. */
  def cms(item: Column): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(item)).toAggregateExpression())
}

case class CmsSketchAgg(
    item: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import CmsAgg.{Depth, Width}

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < Depth) {
        buf(d * Width + CmsAgg.bucket(s, d)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Depth * Width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
}
