package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.PipExpr

/** Optimizer rule: a point-in-polygon test against a LITERAL
  * axis-aligned rectangle is just two range predicates — and unlike an
  * opaque expression, range predicates push down into the parquet scan
  * (PushedFilters) and feed min/max row-group skipping. City-zone
  * bounding-box pre-filters are exactly this shape at 100 TB: the
  * precise polygon test stays for the residual rows, the rectangle
  * prefilter prunes IO.
  *
  * Semantics preserved exactly: the ray caster counts left/bottom edges
  * inside and right/top edges outside (half-open box) — see
  * [[graft.operators.Geo]].
  */
object RectPipRule extends Rule[LogicalPlan] {

  private def doubles(l: Literal): Option[IndexedSeq[Double]] = l.value match {
    case a: ArrayData => Some((0 until a.numElements()).map(a.getDouble))
    case _ => None
  }

  /** (x0, x1, y0, y1) if the 4-vertex ring is an axis-aligned rectangle. */
  private def asRect(xs: Literal, ys: Literal): Option[(Double, Double, Double, Double)] =
    for {
      xv <- doubles(xs) if xv.length == 4
      yv <- doubles(ys) if yv.length == 4
      // every edge (incl. closing edge) must be axis-aligned
      if (0 until 4).forall { i =>
        val j = (i + 1) % 4
        xv(i) == xv(j) || yv(i) == yv(j)
      }
      if xv.distinct.sorted.length == 2 && yv.distinct.sorted.length == 2
    } yield (xv.min, xv.max, yv.min, yv.max)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case PipExpr(px, py, xs: Literal, ys: Literal) if asRect(xs, ys).isDefined =>
      val (x0, x1, y0, y1) = asRect(xs, ys).get
      And(
        And(GreaterThanOrEqual(px, Literal(x0)), LessThan(px, Literal(x1))),
        And(GreaterThanOrEqual(py, Literal(y0)), LessThan(py, Literal(y1))))
  }
}
