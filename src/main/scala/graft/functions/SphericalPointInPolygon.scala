package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.graft.Bridge

/** GEODESIC point-in-polygon — the engine's spherical ST_CONTAINS,
  * matching BigQuery GEOGRAPHY semantics where polygon edges are
  * great-circle arcs on the sphere (reference:
  * `ST_CONTAINS(zn.zone_shape, ST_GEOGPOINT(...))`,
  * sql_queries/data_extraction_queries_automated_script.sql:354, :219).
  * The planar [[PointInPolygon]] ray-cast treats lat/lon as a flat
  * plane — right for city-scale zones, wrong for polygons crossing the
  * antimeridian or spanning large arcs; this kernel closes that gap.
  *
  * `sph_pip(lon, lat, lons, lats)` with degrees in, vertex arrays
  * closing implicitly. Crossing-parity on the sphere: the point is
  * inside iff the great-circle arc from it to the SOUTH POLE (the
  * declared-outside reference) crosses the polygon's edges an odd
  * number of times. Each edge test is exact vector algebra — two
  * great-circle normals (cross products), their intersection direction,
  * and minor-arc membership sign tests — no projections, so longitudes
  * may be expressed continuously across ±180 (a vertex at 190° IS
  * −170°) and edges bulge poleward exactly as GEOGRAPHY's do.
  *
  * Contract: polygons must not contain or touch the south pole (it is
  * the outside reference — delivery/city zones never do; for antarctic
  * work pick another reference), edges must be minor arcs (< 180°, the
  * WKT convention), and points exactly ON an edge or vertex — or whose
  * meridian COINCIDES with a meridian edge (coplanar reference arc) —
  * are undefined boundary behavior, as in every crossing-parity test.
  * A vertex merely lying ON the point's reference meridian is handled
  * by the planar ray-cast's own convention (straddle test with the
  * on-plane side grouped non-positive): a chain crossing the meridian
  * at a vertex counts once, a chain touching it at an apex counts
  * twice — parity preserved either way.
  *
  * Native Catalyst expression with `doGenCode` delegating to the static
  * evaluator — the predicate stays inside whole-stage codegen, same as
  * the planar kernel. Per-row cost is O(vertices) trig on the broadcast
  * zone dimension's arrays.
  */
object SphericalPointInPolygon {

  private def vec(lonDeg: Double, latDeg: Double): Array[Double] = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    val c = math.cos(lat)
    Array(c * math.cos(lon), c * math.sin(lon), math.sin(lat))
  }

  private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2),
      a(0) * b(1) - a(1) * b(0))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)

  /** X lies on the great circle of (a, b) (normal n) by construction;
    * it is on the MINOR arc iff it is on b's side of a and a's side of
    * b — two sign tests against the circle normal. */
  private def onArc(a: Array[Double], b: Array[Double], n: Array[Double],
      x: Array[Double]): Boolean =
    dot(cross(a, x), n) >= 0 && dot(cross(x, b), n) >= 0

  /** Does polygon edge a→b cross the reference arc p→r?
    *
    * The edge-side test is the STRADDLE of the reference great circle's
    * plane — `(n2·a > 0) != (n2·b > 0)`, the spherical analogue of the
    * planar ray-cast's `(yi > py) != (yj > py)` rule, with "exactly on
    * the plane" grouped with the non-positive side. That gives vertices
    * lying ON the reference meridian the planar convention's parity: a
    * chain passing THROUGH the meridian at a shared vertex counts one
    * crossing (one incident edge straddles), a chain merely TOUCHING it
    * (apex — both edges on the same side) counts two, preserving
    * even/odd. A straddling minor arc crosses the plane exactly once;
    * that intersection is the member of the antipodal pair ±(n1×n2)
    * lying on the edge arc, and the crossing is real iff it also lies
    * within the reference SEGMENT p→r. */
  private def arcsCross(a: Array[Double], b: Array[Double],
      p: Array[Double], r: Array[Double]): Boolean = {
    val n2 = cross(p, r)
    if ((dot(n2, a) > 0) == (dot(n2, b) > 0)) return false
    val n1 = cross(a, b)
    val x = cross(n1, n2)
    val norm = math.sqrt(dot(x, x))
    // numerically coplanar despite the straddle (grazing geometry):
    // degenerate by contract — report no crossing
    if (norm < 1e-15) return false
    val xn = Array(x(0) / norm, x(1) / norm, x(2) / norm)
    // the straddle guarantees the minor arc a→b crosses the plane
    // exactly once, so the edge-side intersection is the antipodal-pair
    // member in the edge midpoint's hemisphere — a dot test that stays
    // well-conditioned even when the crossing sits AT a vertex, where
    // the onArc endpoint sign tests degenerate to ±ε
    val mid = Array(a(0) + b(0), a(1) + b(1), a(2) + b(2))
    val cand =
      if (dot(xn, mid) >= 0) xn else Array(-xn(0), -xn(1), -xn(2))
    onArc(p, r, n2, cand)
  }

  /** Crossing-parity containment; static so both eval and codegen call
    * it. Each vertex's 3-vector is computed ONCE (carried from edge to
    * edge) — this runs per row on the broadcast zone join, and the
    * toRadians+trig conversion is its dominant cost. */
  def contains(pLon: Double, pLat: Double, lons: ArrayData,
      lats: ArrayData): Boolean = {
    val p = vec(pLon, pLat)
    val r = Array(0.0, 0.0, -1.0)
    var crossings = 0
    val n = lons.numElements()
    if (n == 0) return false
    var a = vec(lons.getDouble(n - 1), lats.getDouble(n - 1))
    var i = 0
    while (i < n) {
      val b = vec(lons.getDouble(i), lats.getDouble(i))
      if (arcsCross(a, b, p, r)) crossings += 1
      a = b
      i += 1
    }
    (crossings & 1) == 1
  }

  def apply(lon: Column, lat: Column, lons: Column, lats: Column): Column =
    Bridge.column(SphPipExpr(
      Bridge.expression(lon), Bridge.expression(lat),
      Bridge.expression(lons), Bridge.expression(lats)))
}

case class SphPipExpr(lon: Expression, lat: Expression,
    lons: Expression, lats: Expression) extends QuaternaryExpression {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = lons
  override def fourth: Expression = lats
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    lon.nullable || lat.nullable || lons.nullable || lats.nullable

  override def nullSafeEval(p1: Any, p2: Any, a1: Any, a2: Any): Any =
    SphericalPointInPolygon.contains(p1.asInstanceOf[Double],
      p2.asInstanceOf[Double], a1.asInstanceOf[ArrayData],
      a2.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p1, p2, a1, a2) =>
      s"${ev.value} = graft.functions.SphericalPointInPolygon.contains($p1, $p2, $a1, $a2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lon = newFirst, lat = newSecond, lons = newThird, lats = newFourth)
}
