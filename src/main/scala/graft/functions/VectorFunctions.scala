package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector kernels for the similarity operators.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * left-to-right double accumulation over float elements, so results
  * (and the DuckDB oracle) are unchanged — but implemented as Catalyst
  * expressions with `doGenCode`: Spark's higher-order functions are
  * interpreted closures with per-element boxing, which dominates the
  * brute-force KNN profile. The static evaluators below run inside
  * whole-stage codegen as a tight primitive loop.
  */
object VectorFunctions {
  /** Σ a_i·b_i over float arrays, accumulated in double, index order. */
  def dotD(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Σ a_i·b_i with a FLOAT-array left side and DOUBLE-array right side
    * (centroid vectors live on the 1e-6 double grid after Lloyd
    * re-estimation), same left-to-right double accumulation. */
  def dotFD(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getFloat(i).toDouble * ys.getDouble(i)
      i += 1
    }
    acc
  }

  /** √(Σ a_i²), same accumulation discipline. */
  def normD(xs: ArrayData): Double = {
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = xs.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  /** Σ (a_i−b_i)² with a FLOAT-array left side and DOUBLE-array right
    * side (PQ codebook centroids live on the 1e-6 double grid), same
    * left-to-right double accumulation — subtract/multiply/add are all
    * exactly IEEE-specified, so the fold is bit-identical to DuckDB's
    * list_sum over the same zip. */
  def sqDistFD(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs.getFloat(i).toDouble - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(a), Bridge.expression(b)))

  /** float-array × double-array squared L2 distance (see [[sqDistFD]]). */
  def sqDistFd(a: Column, b: Column): Column =
    Bridge.column(SqDistFDExpr(Bridge.expression(a), Bridge.expression(b)))

  /** float-array × double-array dot (see [[dotFD]]). */
  def dotFd(a: Column, b: Column): Column =
    Bridge.column(DotFDExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Deterministic ±1 Rademacher hyperplane from the portable LCG's
    * mid bits — sign(plane·64 + j) for j < dim, replicated DRIVER-side
    * so the projection dot runs through the codegen'd [[DotFDExpr]]
    * kernel instead of an interpreted per-element lambda that
    * re-derives the LCG per row (the hot-path cost the class doc
    * blames on higher-order-function boxing). Bit-identical to the
    * lambda form: both are the same ascending float→double
    * multiply-then-add fold, and the DuckDB oracles keep replaying
    * the integer recipe. */
  def rademacherSigns(plane: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map { j =>
      if (((1103515245L * (plane * 64 + j) + 12345L) / 1024L) % 2L == 0L) 1.0 else -1.0
    }

  /** `embedding · rademacherSigns(plane)` through the codegen'd kernel. */
  def rademacherDot(emb: Column, plane: Int): Column =
    dotFd(emb, org.apache.spark.sql.functions.typedLit(rademacherSigns(plane)))

  def norm(a: Column): Column =
    Bridge.column(NormExpr(Bridge.expression(a)))

  /** cos(a, b) with a pre-computed norm column per side. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}

case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorFunctions.dotD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotFDExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorFunctions.dotFD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SqDistFDExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.sqDistFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorFunctions.sqDistFD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    VectorFunctions.normD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorFunctions.normD($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
