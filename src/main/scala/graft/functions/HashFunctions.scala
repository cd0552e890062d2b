package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash sketching over a token array.
  *
  * `minhashSketch(toks)` emits 17 longs: 16 minhash values — one per
  * permutation h_i(s) = (a_i·murmur3(s) + b_i) mod p over the doc's
  * word-bigram shingles — plus the distinct-shingle count. Equivalent
  * to explode-shingles → groupBy(doc) → 16×min() + count(), but as a
  * single per-row kernel: the sketch is computed at scan time with NO
  * shuffle, which is the difference between shuffling every shingle of
  * 100 TB and shuffling 136 bytes per document. Murmur3 (seed 42)
  * matches Spark's `hash()` so results are identical to the composed
  * plan.
  */
object HashFunctions {
  val P: Long = 2147483647L
  val NumPerms = 16
  private val space = UTF8String.fromString(" ")

  /** (a_i, b_i) permutation parameters — fixed, shared with docs. */
  val perms: Array[(Long, Long)] =
    (0 until NumPerms).map(i => (1L + 2L * i, 7L + 13L * i)).toArray

  private val permA: Array[Long] = perms.map(_._1)
  private val permB: Array[Long] = perms.map(_._2)

  def sketch(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    // linear-probe open-addressing set of shingle hashes (no boxing);
    // sentinel Long.MinValue = empty slot
    var cap = Integer.highestOneBit(math.max(4, n) * 4 - 1) << 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Long.MinValue)
    var distinct = 0L
    var i = 0
    while (i < n - 1) {
      val shingle = UTF8String.concat(toks.getUTF8String(i), space, toks.getUTF8String(i + 1))
      // identical to Spark's hash(shingle): Murmur3 seed 42 over UTF8 bytes
      val h32 = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(shingle.getBaseObject, shingle.getBaseOffset, shingle.numBytes(), 42)
      val key = h32.toLong
      var slot = (key.toInt & (cap - 1))
      var fresh = false
      var probing = true
      while (probing) {
        val cur = table(slot)
        if (cur == Long.MinValue) { table(slot) = key; fresh = true; probing = false }
        else if (cur == key) probing = false
        else slot = (slot + 1) & (cap - 1)
      }
      if (fresh) {
        distinct += 1
        val h = java.lang.Math.floorMod(key, P)
        var j = 0
        while (j < NumPerms) {
          val v = java.lang.Math.floorMod(h * permA(j) + permB(j), P)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](NumPerms + 1)
    var j = 0
    while (j < NumPerms) {
      out(j) = if (mins(j) == Long.MaxValue) -1L else mins(j)
      j += 1
    }
    out(NumPerms) = distinct
    new GenericArrayData(out)
  }

  /** Distinct shingles deduplicate by 32-bit murmur3 here; the composed
    * plan dedupes by full string. A 32-bit collision inside one doc
    * would differ — ~n²/2³³ per doc, negligible, and both sides of the
    * operator use the same sketch so results stay self-consistent. */
  def minhashSketch(toks: Column): Column =
    Bridge.column(MinHashSketchExpr(Bridge.expression(toks)))

  /** Distinct word-bigram shingle hashes of a token array (the verify
    * side of MinHash dedup): one native pass, emitting int32 murmur3
    * values — joins on 4-byte keys instead of re-materialized shingle
    * strings. Dedup discipline matches [[sketch]] (32-bit hash). */
  def shingleHashes(toks: Column): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(toks)))

  def shingleHashArray(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var cap = Integer.highestOneBit(math.max(4, n) * 4 - 1) << 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Long.MinValue)
    val out = new Array[Int](math.max(0, n - 1))
    var m = 0
    var i = 0
    while (i < n - 1) {
      val shingle = UTF8String.concat(toks.getUTF8String(i), space, toks.getUTF8String(i + 1))
      val h32 = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(shingle.getBaseObject, shingle.getBaseOffset, shingle.numBytes(), 42)
      val key = h32.toLong
      var slot = (key.toInt & (cap - 1))
      var fresh = false
      var probing = true
      while (probing) {
        val cur = table(slot)
        if (cur == Long.MinValue) { table(slot) = key; fresh = true; probing = false }
        else if (cur == key) probing = false
        else slot = (slot + 1) & (cap - 1)
      }
      if (fresh) { out(m) = h32; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    HashFunctions.shingleHashArray(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashFunctions.shingleHashArray($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MinHashSketchExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    HashFunctions.sketch(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashFunctions.sketch($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
