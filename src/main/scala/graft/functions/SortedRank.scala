package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Rank of a value among SORTED cut points — `#{cut : cut < v}`, the
  * quantile-bucket index — as an O(log n)-per-row binary search over a
  * REFERENCED constant array.
  *
  * This is the scale-safe form of the literal-array
  * `aggregate(typedLit(cuts), …)` fold the z-order rewrite uses for
  * its per-column bucket cuts: the fold is O(cuts) PER ROW, fine at
  * the ≤ 2^bits bucket-cut counts but wrong for OUTPUT-FILE boundaries
  * — a large compaction's cut list is (files − 1) long, and an
  * 800k-file rewrite would pay 800k comparisons per row. The cut array
  * rides the expression as a referenced object (never inlined into
  * generated source), so codegen stays constant-size at any cut count.
  * NULL input ranks 0 — NULLs sort to the first bucket, matching the
  * fold's `when(...).otherwise(0)` arm. */
object SortedRank {
  /** First index whose cut is >= v == count of cuts strictly below v. */
  def rank(cuts: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** `e` (double) ranked among `cuts` (must be sorted ascending). */
  def sortedRank(e: Column, cuts: Seq[Double]): Column = {
    val arr = cuts.toArray
    require(arr.sameElements(arr.sorted), "cut points must be sorted")
    Bridge.column(SortedRankExpr(Bridge.expression(e.cast("double")), arr))
  }
}

case class SortedRankExpr(child: Expression, cuts: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_rank needs a DOUBLE input, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else SortedRank.rank(cuts, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("sortedRankCuts", cuts, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.SortedRank.rank($cutsRef, ${c.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  // Array[Double] equality is reference-based; compare contents so two
  // plan fragments with equal cuts canonicalize identically
  override def equals(o: Any): Boolean = o match {
    case SortedRankExpr(c, cs) =>
      c == child && java.util.Arrays.equals(cs, cuts)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cuts)
}
