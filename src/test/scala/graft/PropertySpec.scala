package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BottomKPairsAgg, CmsAgg, CmsSketchAgg, QuantileSketchAgg, TopKItemsAgg}

/** Randomized evidence for the MERGE contracts the engine's custom
  * aggregates stake their 100 TB correctness on: map-side combine means
  * Spark may split the input into any partitioning and merge partial
  * buffers in any order — so each aggregate's (update, serialize,
  * deserialize, merge, eval) pipeline must produce one answer whatever
  * the chop. The specs elsewhere pin specific cases; these properties
  * sweep ~100 random (data, partitioning, merge-order) triples per
  * contract, driving the real TypedImperativeAggregate surface at the
  * buffer level (BoundReference inputs — no Spark session, so the sweep
  * is fast enough to run wide).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** Split `xs` at the (deduped, sorted) cut points, keeping empties out. */
  private def chop[A](xs: List[A], cuts: List[Int]): List[List[A]] = {
    val pts = (cuts.map(c => math.abs(c) % (xs.size + 1)).distinct.sorted :+ xs.size).distinct
    (0 :: pts).zip(pts).map { case (a, b) => xs.slice(a, b) }.filter(_.nonEmpty) match {
      case Nil => List(xs)
      case ps  => ps
    }
  }

  test("bottom_k: any partitioning + any merge order + the wire format give THE global k-minimum") {
    val genRow = Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(-1000L, 1000L))
    val gen = for {
      xs <- Gen.listOfN(60, genRow)
      k <- Gen.chooseNum(1, 8)
      cuts <- Gen.listOfN(5, Gen.chooseNum(0, 60))
      perm <- Gen.long
    } yield (xs, k, cuts, perm)
    check("bottom_k", Prop.forAllNoShrink(gen) { case (xs, k, cuts, perm) =>
      val agg = BottomKPairsAgg(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      def buffOf(part: List[(Double, Long)]) =
        part.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
          agg.update(b, InternalRow(x._1, x._2))
        }
      val parts = new scala.util.Random(perm).shuffle(chop(xs, cuts))
      // every partial buffer crosses the wire before merging, as it
      // would in a real shuffle
      val merged = parts.map(p => agg.deserialize(agg.serialize(buffOf(p))))
        .reduceLeft((a, b) => agg.merge(a, b))
      val got = agg.eval(merged).asInstanceOf[ArrayData].array.toSeq
        .map { case r: InternalRow => (r.getDouble(0), r.getLong(1)) }
      val want = xs.sorted.take(k)
      got == want
    })
  }

  test("topk_items: exact under capacity whatever the partitioning and merge order") {
    val gen = for {
      xs <- Gen.listOfN(80, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      k <- Gen.chooseNum(1, 6)
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, 80))
      perm <- Gen.long
    } yield (xs, k, cuts, perm)
    check("topk_items", Prop.forAllNoShrink(gen) { case (xs, k, cuts, perm) =>
      val agg = TopKItemsAgg(BoundReference(0, StringType, nullable = true), k, capacity = 64)
      def buffOf(part: List[String]) =
        part.foldLeft(agg.createAggregationBuffer()) { (b, s) =>
          agg.update(b, InternalRow(UTF8String.fromString(s)))
        }
      val parts = new scala.util.Random(perm).shuffle(chop(xs, cuts))
      val merged = parts.map(p => agg.deserialize(agg.serialize(buffOf(p))))
        .reduceLeft((a, b) => agg.merge(a, b))
      val got = agg.eval(merged).asInstanceOf[ArrayData].array.toSeq
        .map { case r: InternalRow => (r.getUTF8String(0).toString, r.getLong(1)) }
      val want = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (item, c) => (-c, item) }.take(k)
      got == want
    })
  }

  test("cms_sketch: the merged grid equals the sequential grid; estimates never undercount") {
    val gen = for {
      xs <- Gen.listOfN(100, Gen.oneOf((1 to 12).map(i => s"tok$i")))
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, 100))
      perm <- Gen.long
    } yield (xs, cuts, perm)
    check("cms_sketch", Prop.forAllNoShrink(gen) { case (xs, cuts, perm) =>
      val agg = CmsSketchAgg(BoundReference(0, StringType, nullable = true))
      def buffOf(part: List[String]) =
        part.foldLeft(agg.createAggregationBuffer()) { (b, s) =>
          agg.update(b, InternalRow(UTF8String.fromString(s)))
        }
      val parts = new scala.util.Random(perm).shuffle(chop(xs, cuts))
      val merged = parts.map(p => agg.deserialize(agg.serialize(buffOf(p))))
        .reduceLeft((a, b) => agg.merge(a, b))
      val sequential = buffOf(xs)
      val gridEqual = merged.sameElements(sequential)
      // CM contract: min over rows >= exact count, for every item
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val noUndercount = exact.forall { case (item, c) =>
        val est = (0 until CmsAgg.Depth).map { d =>
          merged(d * CmsAgg.Width + CmsAgg.bucket(UTF8String.fromString(item), d))
        }.min
        est >= c
      }
      gridEqual && noUndercount
    })
  }

  test("polyHash: the two-byte Mersenne-fold fast path equals the naive Horner replay") {
    import graft.functions.HashFunctions
    // the definitional hash: h = ((h*mul + c) mod P) per char, seed
    // pre-reduced — exactly what the DuckDB oracle text computes
    def naive(s: String, seed: Long, mul: Long): Long = {
      var h = if (seed >= HashFunctions.P) seed % HashFunctions.P else seed
      s.foreach { ch => h = (h * mul + ch.toLong) % HashFunctions.P }
      h
    }
    val gen = for {
      s <- Gen.listOf(Gen.choose(0, 127).map(_.toChar)).map(_.mkString)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
      mul <- Gen.chooseNum(1L, 2147483647L)
    } yield (s, seed, mul)
    check("polyHash", Prop.forAllNoShrink(gen) { case (s, seed, mul) =>
      HashFunctions.polyHashWith(UTF8String.fromString(s), seed, mul) ==
        naive(s, seed, mul)
    })
  }

  test("polyHash: the non-ASCII fallback equals the char-based replay") {
    import graft.functions.HashFunctions
    def naive(s: String): Long = {
      var h = HashFunctions.PolySeed
      s.foreach { ch =>
        h = (h * HashFunctions.PolyMul + ch.toLong) % HashFunctions.P
      }
      h
    }
    val gen = Gen.listOf(Gen.frequency(
      4 -> Gen.choose(32, 126).map(_.toChar),
      1 -> Gen.oneOf('é', 'ß', '中', 'λ', '→'))).map(_.mkString)
    check("polyHashSlow", Prop.forAllNoShrink(gen) { s =>
      HashFunctions.polyHash(UTF8String.fromString(s)) == naive(s)
    })
  }

  test("polyHashShingle streams the three segments identically to hashing the concatenation") {
    import graft.functions.HashFunctions
    val tok = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(33, 126).map(_.toChar),
      1 -> Gen.oneOf('ü', '中'))).map(_.mkString)
    check("polyHashShingle", Prop.forAllNoShrink(Gen.zip(tok, tok)) { case (a, b) =>
      HashFunctions.polyHashShingle(UTF8String.fromString(a), UTF8String.fromString(b)) ==
        HashFunctions.polyHash(UTF8String.fromString(s"$a $b"))
    })
  }

  test("quantile_sketch: merge order cannot move an estimate; estimates hold the 1% contract") {
    val gen = for {
      xs <- Gen.listOfN(80, Gen.chooseNum(0.01, 1e5))
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, 80))
      perm <- Gen.long
    } yield (xs, cuts, perm)
    check("quantile_sketch", Prop.forAllNoShrink(gen) { case (xs, cuts, perm) =>
      val agg = QuantileSketchAgg(
        BoundReference(0, DoubleType, nullable = true), Seq(0.5, 0.95))
      def buffOf(part: List[Double]) =
        part.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
          agg.update(b, InternalRow(x))
        }
      def evalParts(parts: List[List[Double]]): Seq[Double] = {
        val merged = parts.map(p => agg.deserialize(agg.serialize(buffOf(p))))
          .reduceLeft((a, b) => agg.merge(a, b))
        agg.eval(merged).asInstanceOf[ArrayData].toDoubleArray().toSeq
      }
      val parts = chop(xs, cuts)
      val one = evalParts(List(xs))
      val chopped = evalParts(new scala.util.Random(perm).shuffle(parts))
      // bit-identical across chops, and each estimate within alpha
      // (relative) of the INTERPOLATED true quantile - eval follows the
      // percentile()/quantile_cont convention (index q*(n-1)), so both
      // endpoints of the interpolation carry the bucket guarantee and
      // the convex combination inherits it for positive data
      val sorted = xs.sorted
      def near(est: Double, q: Double): Boolean = {
        val g = q * (xs.size - 1)
        val lo = math.floor(g).toInt
        val hi = math.ceil(g).toInt
        val frac = g - lo
        val trueq = sorted(lo) * (1.0 - frac) + sorted(hi) * frac
        math.abs(est - trueq) <= 0.0101 * trueq + 1e-12
      }
      one == chopped && near(one.head, 0.5) && near(one(1), 0.95)
    })
  }
}
