package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile-sketch state: geometric (log-γ) bucket counts.
  * `pos(i)` counts values in (γ^(i-1), γ^i]; `neg` mirrors for x < 0;
  * exact zeros counted apart. */
final class QSketch(
    val pos: mutable.HashMap[Int, Long] = mutable.HashMap.empty,
    val neg: mutable.HashMap[Int, Long] = mutable.HashMap.empty,
    var zeros: Long = 0L) {
  def total: Long = zeros + pos.valuesIterator.sum + neg.valuesIterator.sum
}

/** Log-bucket quantile sketch aggregate — the DDSketch construction
  * (Masson, Lee, Rim: "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019; public paper).
  *
  * Chosen over t-digest/KLL deliberately: those two keep state whose
  * shape depends on INSERTION AND MERGE ORDER (centroid clustering /
  * sampled compactions), so two runs over different partitionings give
  * different answers. Here a value deterministically lands in bucket
  * i = ⌈ln|x| / ln γ⌉ and merging is pure per-bucket count ADDITION —
  * commutative and associative — so any partitioning, task order, or
  * combine tree yields the bit-identical sketch. That makes it safe for
  * the repo's exact-compare verification discipline and for 100 TB
  * map-side partial aggregation (buffers are a few KB, merge is O(buckets)).
  *
  * Guarantee: quantile estimates have RELATIVE error ≤ α, with
  * γ = (1+α)/(1-α) (bucket midpoint 2γ^i/(γ+1) is within α of any
  * value in the bucket). Bucket count grows with the log of the data's
  * dynamic range: ~ln(max/min)/ln γ (≈115 buckets per decade at α=1%)
  * — if `maxBuckets` is ever exceeded the lowest (most-negative-value)
  * buckets collapse, working from the bottom of the number line across
  * BOTH sign maps (standard DDSketch fallback: the low tail loses the
  * guarantee; determinism then depends on collapse timing, so size
  * maxBuckets to the data's range). At α=1% the full double range —
  * subnormals ~1e−308 up to ~1.8e308 — needs ≈35.5k buckets per
  * direction per sign, ≈142k total; the 262144 default covers that
  * with headroom, so collapse never fires on real doubles.
  */
case class QuantileSketchAgg(
    child: Expression,
    quantiles: Seq[Double],
    alpha: Double = 0.01,
    maxBuckets: Int = 262144,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] {

  private val gamma = (1.0 + alpha) / (1.0 - alpha)
  private val lnGamma = math.log(gamma)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QSketch = new QSketch()

  private def bucketOf(x: Double): Int = math.ceil(math.log(x) / lnGamma).toInt

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x == 0.0) buf.zeros += 1
      else if (x > 0) bump(buf.pos, bucketOf(x), 1L)
      else bump(buf.neg, bucketOf(-x), 1L)
      if (buf.pos.size + buf.neg.size > maxBuckets) collapse(buf)
    }
    buf
  }

  private def bump(m: mutable.HashMap[Int, Long], i: Int, n: Long): Unit =
    m.update(i, m.getOrElse(i, 0L) + n)

  /** Fold the lowest-VALUE buckets together until under budget, walking
    * up the number line across both sign maps: most-negative bucket
    * (neg's highest index) folds into the next-most-negative; a lone
    * remaining neg bucket folds into zeros; then pos's lowest index
    * folds into its second-lowest. Works whichever sign dominates. */
  private def collapse(buf: QSketch): Unit = {
    while (buf.pos.size + buf.neg.size > maxBuckets) {
      if (buf.neg.size > 1) {
        // two highest neg indices = the two most-negative buckets
        val ks = buf.neg.keysIterator
        var hi = ks.next(); var hi2 = Int.MinValue
        ks.foreach { k =>
          if (k > hi) { hi2 = hi; hi = k } else if (k > hi2) hi2 = k
        }
        val c = buf.neg.remove(hi).get
        bump(buf.neg, hi2, c)
      } else if (buf.neg.size == 1) {
        // last negative bucket: absorb into zeros (bottom tail fully lost)
        val (i, c) = buf.neg.head
        buf.neg.remove(i)
        buf.zeros += c
      } else if (buf.pos.size > 1) {
        val ks = buf.pos.keysIterator
        var lo = ks.next(); var lo2 = Int.MaxValue
        ks.foreach { k =>
          if (k < lo) { lo2 = lo; lo = k } else if (k < lo2) lo2 = k
        }
        val c = buf.pos.remove(lo).get
        bump(buf.pos, lo2, c)
      } else return // a single bucket can't be reduced further
    }
  }

  override def merge(a: QSketch, b: QSketch): QSketch = {
    a.zeros += b.zeros
    b.pos.foreach { case (i, n) => bump(a.pos, i, n) }
    b.neg.foreach { case (i, n) => bump(a.neg, i, n) }
    if (a.pos.size + a.neg.size > maxBuckets) collapse(a)
    a
  }

  /** Walk buckets in value order: most-negative → zeros → positive. */
  override def eval(buf: QSketch): Any = {
    val n = buf.total
    if (n == 0) return new GenericArrayData(quantiles.map(_ => 0.0).toArray[Any])
    // (bucket value estimate, count) in ascending value order
    val negSorted = buf.neg.toArray.sortBy(-_._1).map { case (i, c) =>
      (-mid(i), c)
    }
    val posSorted = buf.pos.toArray.sortBy(_._1).map { case (i, c) =>
      (mid(i), c)
    }
    val ordered =
      if (buf.zeros > 0) negSorted ++ Array((0.0, buf.zeros)) ++ posSorted
      else negSorted ++ posSorted
    // value estimate at a 0-based rank: the bucket holding that rank
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var k = 0
      while (k < ordered.length) {
        cum += ordered(k)._2
        if (cum > rank) return ordered(k)._1
        k += 1
      }
      ordered.last._1
    }
    val out = quantiles.map { q =>
      // linear interpolation at index q·(n−1) — the same convention as
      // percentile()/quantile_cont, so sparse tails (where adjacent
      // order statistics sit in different buckets) stay within the α
      // bound of the interpolated quantile too
      val g = q * (n - 1)
      val lo = math.max(0L, math.floor(g).toLong)
      val hi = math.min(n - 1, math.ceil(g).toLong)
      val frac = g - lo
      valueAt(lo) * (1.0 - frac) + valueAt(hi) * frac
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Midpoint estimate of bucket i: within α of every value inside. */
  private def mid(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1.0)

  override def serialize(buf: QSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.zeros)
    def writeMap(m: mutable.HashMap[Int, Long]): Unit = {
      out.writeInt(m.size)
      m.foreach { case (i, c) => out.writeInt(i); out.writeLong(c) }
    }
    writeMap(buf.pos); writeMap(buf.neg)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new QSketch()
    buf.zeros = in.readLong()
    def readMap(m: mutable.HashMap[Int, Long]): Unit = {
      val n = in.readInt()
      (0 until n).foreach(_ => m.update(in.readInt(), in.readLong()))
    }
    readMap(buf.pos); readMap(buf.neg)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object QuantileSketch {
  /** `quantile_sketch(col, qs, α)` — mergeable quantiles at bounded
    * relative error, deterministic under any partitioning. */
  def quantileSketch(c: Column, qs: Seq[Double], alpha: Double = 0.01): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(c.cast("double")), qs, alpha)
      .toAggregateExpression())
}
