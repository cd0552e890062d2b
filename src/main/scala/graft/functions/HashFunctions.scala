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
  * permutation h_i(s) = (a_i·H(s) + b_i) mod p over the doc's
  * word-bigram shingles — plus the distinct-shingle count. Equivalent
  * to explode-shingles → groupBy(doc) → 16×min() + count(), but as a
  * single per-row kernel: the sketch is computed at scan time with NO
  * shuffle, which is the difference between shuffling every shingle of
  * 100 TB and shuffling 136 bytes per document.
  *
  * The base shingle hash H is a PORTABLE polynomial hash over the
  * string's characters, h ← (h·1000003 + codepoint) mod p, h₀ = 7 —
  * chosen over murmur3 deliberately: DuckDB can replay it verbatim
  * (list_reduce over ascii(substring(...))), which upgrades every
  * operator built on these kernels from rows-only to fully
  * oracle-backed. The hash enters min() and set-membership only, so
  * its (slightly weaker) avalanche behavior costs nothing: minima of
  * any fixed injective-enough map of distinct shingles are equally
  * valid MinHash estimators, and collisions (~n²/2³² per doc) merely
  * merge two shingles IDENTICALLY in both engines.
  */
object HashFunctions {
  val P: Long = 2147483647L
  val PolyMul: Long = 1000003L
  val PolySeed: Long = 7L
  val NumPerms = 16
  private val space = UTF8String.fromString(" ")

  /** (a_i, b_i) permutation parameters — fixed, shared with docs. */
  val perms: Array[(Long, Long)] =
    (0 until NumPerms).map(i => (1L + 2L * i, 7L + 13L * i)).toArray

  private val permA: Array[Long] = perms.map(_._1)
  private val permB: Array[Long] = perms.map(_._2)

  /** x mod P for 0 ≤ x < 2^63, exploiting P = 2^31−1 being a Mersenne
    * prime: 2^31 ≡ 1 (mod P), so x ≡ (x & P) + (x >>> 31). Two folds +
    * one conditional subtract land exactly in [0, P) — the same value
    * `x % P` gives, with adds/shifts in place of a ~20-cycle idiv.
    * This is what claws back the polynomial hash's cost vs the old
    * murmur3 kernel while keeping the DuckDB-replayable arithmetic. */
  @inline private def mod31(x: Long): Long = {
    var y = (x & P) + (x >>> 31)
    y = (y & P) + (y >>> 31)
    if (y >= P) y - P else y
  }

  /** Portable polynomial string hash in [0, P): identical to DuckDB's
    * `list_reduce(list_prepend(7, list_transform(range(1, len(s)+1),
    * i -> ascii(substring(s, i, 1)))), (h, c) -> (h*1000003 + c) % P)`.
    * Iterates Java chars = BMP code points — the corpus is ASCII, and
    * any non-BMP divergence would only re-bucket a shingle the same
    * way on the Spark side of every operator that uses it. */
  def polyHash(s: UTF8String): Long = polyHashWith(s, PolySeed, PolyMul)

  def polyHashWith(s: UTF8String, seed: Long, mul: Long): Long = {
    // fast path: pure-ASCII bytes ARE the code points — fold over the
    // UTF8 buffer with zero allocation (the corpus hot path; matches
    // the murmur3 predecessor's alloc-free profile). TWO bytes per
    // step: h·mul² + c₁·mul + c₂ ≡ ((h·mul + c₁) mod P)·mul + c₂
    // (mod P) — same value, half the reductions, and each reduction
    // is the cheap Mersenne fold. h < P and mul² mod P < P keep the
    // accumulator < 2^62 + 2^38, inside mod31's domain.
    val n = s.numBytes()
    val mulSq = mod31(mul * mul) // mul < 2^31 ⇒ no overflow
    var h = if (seed >= P) mod31(seed) else seed
    var i = 0
    while (i + 1 < n) {
      val b1 = s.getByte(i)
      val b2 = s.getByte(i + 1)
      if ((b1 | b2) < 0) return polyHashSlow(s, seed, mul) // non-ASCII: decode
      h = mod31(h * mulSq + b1.toLong * mul + b2.toLong)
      i += 2
    }
    if (i < n) {
      val b = s.getByte(i)
      if (b < 0) return polyHashSlow(s, seed, mul)
      h = mod31(h * mul + b.toLong)
    }
    h
  }

  private val PolyMulSq: Long = mod31(PolyMul * PolyMul)

  /** Continue the ASCII Horner fold of `s` from state `h0`; returns -1
    * if `s` has a non-ASCII byte (caller falls back to the decoding
    * path). Two-byte steps — see [[polyHashWith]]. */
  @inline private def foldAscii(h0: Long, s: UTF8String, mul: Long, mulSq: Long): Long = {
    val n = s.numBytes()
    var h = h0
    var i = 0
    while (i + 1 < n) {
      val b1 = s.getByte(i)
      val b2 = s.getByte(i + 1)
      if ((b1 | b2) < 0) return -1L
      h = mod31(h * mulSq + b1.toLong * mul + b2.toLong)
      i += 2
    }
    if (i < n) {
      val b = s.getByte(i)
      if (b < 0) return -1L
      h = mod31(h * mul + b.toLong)
    }
    h
  }

  /** polyHash of "a b" WITHOUT materializing the concatenation — the
    * shingle hot path runs one Horner fold across the three segments
    * (a, ' ', b), saving an allocation + copy per shingle. Identical
    * value to polyHash(concat(a, " ", b)): any decomposition of the
    * byte sequence into 1-/2-byte Horner steps computes the same
    * Σ cᵢ·mulⁿ⁻¹⁻ⁱ mod P. */
  def polyHashShingle(a: UTF8String, b: UTF8String): Long = {
    var h = foldAscii(PolySeed, a, PolyMul, PolyMulSq)
    if (h >= 0L) {
      h = mod31(h * PolyMul + 32L) // ' '
      h = foldAscii(h, b, PolyMul, PolyMulSq)
    }
    if (h >= 0L) h else polyHash(UTF8String.concat(a, space, b))
  }

  /** Non-ASCII fallback: fold over Java chars (BMP code points). */
  private def polyHashSlow(s: UTF8String, seed: Long, mul: Long): Long = {
    val str = s.toString
    var h = seed
    var i = 0
    while (i < str.length) {
      h = (h * mul + str.charAt(i).toLong) % P
      i += 1
    }
    h
  }

  /** The same hash as DuckDB SQL text, for oracle construction. */
  def polyHashSql(e: String, seed: Long = PolySeed, mul: Long = PolyMul): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"list_transform(range(1, len($e) + 1), ch_i -> CAST(ascii(substring($e, ch_i, 1)) AS BIGINT))), " +
      s"(ph_h, ph_c) -> (ph_h * $mul + ph_c) % $P)"

  /** Column form of [[polyHashWith]] — a codegen'd scalar kernel for
    * per-token hashing (SimHash bit sources etc.). */
  def polyHashCol(s: Column, seed: Long, mul: Long): Column =
    Bridge.column(PolyHashExpr(Bridge.expression(s), seed, mul))

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
      // portable base hash in [0, P), no shingle-string materialization
      val key = polyHashShingle(toks.getUTF8String(i), toks.getUTF8String(i + 1))
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
        var j = 0
        while (j < NumPerms) {
          val v = mod31(key * permA(j) + permB(j)) // key,a < 2^31: no overflow
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

  /** Distinct shingles deduplicate by the polynomial hash here; the
    * composed plan dedupes by full string. A collision inside one doc
    * (~n²/2³² per doc, negligible) merges two shingles the same way in
    * both engines, so results stay self-consistent AND oracle-equal. */
  def minhashSketch(toks: Column): Column =
    Bridge.column(MinHashSketchExpr(Bridge.expression(toks)))

  /** Distinct word-bigram shingle hashes of a token array (the verify
    * side of MinHash dedup): one native pass emitting the portable
    * polynomial hashes — joins on 8-byte keys instead of
    * re-materialized shingle strings, and DuckDB rebuilds the same
    * values with list functions. Dedup discipline matches [[sketch]]. */
  def shingleHashes(toks: Column): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(toks)))

  /** [[sketch]] over PRECOMPUTED distinct shingle hashes (the
    * [[shingleHashes]] output) — identical permutation arithmetic, so
    * a sketch rebuilt from a persisted minhash-index `shingles` table
    * equals the one built from text (Dedup.appendToMinhashIndex derives
    * each batch's bands from its committed shingles this way). The
    * input carries distinct hashes by contract; no dedup table here. */
  def sketchFromHashes(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val key = hs.getLong(i)
      var j = 0
      while (j < NumPerms) {
        val v = mod31(key * permA(j) + permB(j)) // key,a < 2^31: no overflow
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](NumPerms + 1)
    var j = 0
    while (j < NumPerms) {
      out(j) = if (mins(j) == Long.MaxValue) -1L else mins(j)
      j += 1
    }
    out(NumPerms) = n.toLong
    new GenericArrayData(out)
  }

  def minhashSketchFromHashes(shs: Column): Column =
    Bridge.column(MinHashFromHashesExpr(Bridge.expression(shs)))

  def shingleHashArray(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var cap = Integer.highestOneBit(math.max(4, n) * 4 - 1) << 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Long.MinValue)
    val out = new Array[Long](math.max(0, n - 1))
    var m = 0
    var i = 0
    while (i < n - 1) {
      val key = polyHashShingle(toks.getUTF8String(i), toks.getUTF8String(i + 1))
      var slot = (key.toInt & (cap - 1))
      var fresh = false
      var probing = true
      while (probing) {
        val cur = table(slot)
        if (cur == Long.MinValue) { table(slot) = key; fresh = true; probing = false }
        else if (cur == key) probing = false
        else slot = (slot + 1) & (cap - 1)
      }
      if (fresh) { out(m) = key; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

case class PolyHashExpr(child: Expression, seed: Long, mul: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    HashFunctions.polyHashWith(a.asInstanceOf[UTF8String], seed, mul)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HashFunctions.polyHashWith($a, ${seed}L, ${mul}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    HashFunctions.shingleHashArray(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashFunctions.shingleHashArray($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MinHashFromHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    HashFunctions.sketchFromHashes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashFunctions.sketchFromHashes($a)")
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
