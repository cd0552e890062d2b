package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, DoubleType}
import org.apache.spark.sql.graft.Bridge  // expr->Column bridge in Spark 4

/** Ray-casting point-in-polygon test — the engine's ST_CONTAINS
  * (reference: ST_CONTAINS(zn.zone_shape, ST_GEOGPOINT(...)),
  * sql_queries/data_extraction_queries_automated_script.sql:354).
  *
  * `pip(px, py, xs, ys)` where xs/ys are the polygon's vertex
  * coordinate arrays (closed implicitly). Planar even-odd rule —
  * adequate for city-zone-sized polygons; a spherical variant would
  * swap the crossing predicate only.
  *
  * Implemented as a native Catalyst Expression with `doGenCode`
  * delegating to a static evaluator, so the predicate stays inside
  * whole-stage codegen (no UDF boxing in the hot filter path).
  */
object PointInPolygon {
  /** Even-odd ray cast; static so both eval and codegen call it. */
  def contains(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = xs.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      if (((yi > py) != (yj > py)) &&
        (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def apply(px: Column, py: Column, xs: Column, ys: Column): Column =
    Bridge.column(PipExpr(
      Bridge.expression(px), Bridge.expression(py),
      Bridge.expression(xs), Bridge.expression(ys)))
}

case class PipExpr(px: Expression, py: Expression, xs: Expression, ys: Expression)
    extends QuaternaryExpression {
  override def first: Expression = px
  override def second: Expression = py
  override def third: Expression = xs
  override def fourth: Expression = ys
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    px.nullable || py.nullable || xs.nullable || ys.nullable

  override def nullSafeEval(p1: Any, p2: Any, a1: Any, a2: Any): Any =
    PointInPolygon.contains(p1.asInstanceOf[Double], p2.asInstanceOf[Double],
      a1.asInstanceOf[ArrayData], a2.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p1, p2, a1, a2) =>
      s"${ev.value} = graft.functions.PointInPolygon.contains($p1, $p2, $a1, $a2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(px = newFirst, py = newSecond, xs = newThird, ys = newFourth)
}
