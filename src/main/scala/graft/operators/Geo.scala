package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import graft.functions.PointInPolygon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geo zone tagging (SURVEY.md §2 block A) — the reference's
  * ST_CONTAINS point-in-polygon order→zone join
  * (data_extraction_queries_automated_script.sql:144-165, 354).
  *
  * Events are points in (value, k) space; zones are polygons held in a
  * small broadcast dimension. The polygons here are rectangles so the
  * DuckDB oracle can express membership as range predicates, but the
  * engine side runs the general ray-casting expression
  * ([[graft.functions.PointInPolygon]]) — non-convex polygons are
  * covered by its unit spec.
  *
  * Scale: zones broadcast (they are O(cities)); the fact side is a
  * single codegen'd filter pass, no shuffle before the rollup.
  */
object Geo {

  /** (zone, xmin, xmax, ymin, ymax) — gaps left on purpose so some
    * points fall in no zone. */
  private val zones: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("z_low_small", 0.0, 4.0, 0.0, 45.0),
    ("z_low_big", 0.0, 4.0, 55.0, 100.0),
    ("z_mid", 4.0, 9.0, 10.0, 90.0),
    ("z_high", 9.0, 30.0, 0.0, 100.0),
  )

  def geoContains(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zoneDf = zones.map { case (z, x0, x1, y0, y1) =>
      // rectangle as an explicit polygon ring for the ray-caster
      (z, Seq(x0, x1, x1, x0), Seq(y0, y0, y1, y1))
    }.toDF("zone", "xs", "ys")
    val pts = Tables.events(spark, dir)
      .select(col("event_id"), col("value").as("x"),
        when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("double").as("y"))
    pts.join(broadcast(zoneDf),
        PointInPolygon(col("x"), col("y"), col("xs"), col("ys")))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_points"), sumMoney(col("x")).as("sum_x"))
      .orderBy("zone")
  }

  /** Oracle: the same rectangles as half-open range predicates. The ray
    * caster counts a point on the left/bottom edge as inside and on the
    * right/top edge as outside (strict `<` on the crossing), matching
    * xmin <= x < xmax ∧ ymin <= y < ymax for axis-aligned rectangles. */
  private val geoContainsOracle = {
    val zoneRows = zones.map { case (z, x0, x1, y0, y1) =>
      s"('$z', $x0, $x1, $y0, $y1)"
    }.mkString(", ")
    s"""WITH zones(zone, x0, x1, y0, y1) AS (VALUES $zoneRows),
       |pts AS (
       |  SELECT event_id, "value" AS x,
       |    CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS DOUBLE) AS y
       |  FROM events)
       |SELECT zone, COUNT(*) AS n_points,
       |  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sum_x
       |FROM pts JOIN zones ON x >= x0 AND x < x1 AND y >= y0 AND y < y1
       |GROUP BY 1 ORDER BY zone""".stripMargin
  }

  /** Point-in-polygon against a LITERAL rectangle — the shape
    * [[graft.plans.RectPipRule]] rewrites to range predicates, which
    * then push into the parquet scan (bounding-box prefilter pattern). */
  def geoFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("value").as("x"),
        when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("double").as("y"),
        col("event_type"))
      .filter(PointInPolygon(col("x"), col("y"),
        typedLit(Seq(2.0, 8.0, 8.0, 2.0)), typedLit(Seq(20.0, 20.0, 70.0, 70.0))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sumMoney(col("x")).as("sum_x"))
      .orderBy("event_type")
  }

  private val geoFilterOracle =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_x
      |FROM (
      |  SELECT event_type, "value",
      |    CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS DOUBLE) AS y
      |  FROM events)
      |WHERE "value" >= 2.0 AND "value" < 8.0 AND y >= 20.0 AND y < 70.0
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Zone tagging with zones landed as WKT TEXT (the interchange form
    * the reference's ST_ASTEXT round-trips): [[graft.functions.Wkt]]
    * parses `POLYGON((x y, …))` into coordinate arrays ONCE on the
    * O(cities) dimension side, then the identical broadcast +
    * ray-cast + rollup as [[geoContains]]. The oracle parses the SAME
    * WKT strings with DuckDB string/list functions and expresses the
    * rectangles as range predicates — both engines bind their zone
    * geometry from the text, so a parse divergence fails the hash. */
  def geoWkt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zoneDf = zones.map { case (z, x0, x1, y0, y1) =>
      (z, s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
    }.toDF("zone", "wkt")
      .select(col("zone"),
        graft.functions.Wkt.xs(col("wkt")).as("xs"),
        graft.functions.Wkt.ys(col("wkt")).as("ys"))
    val pts = Tables.events(spark, dir)
      .select(col("event_id"), col("value").as("x"),
        when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("double").as("y"))
    pts.join(broadcast(zoneDf),
        PointInPolygon(col("x"), col("y"), col("xs"), col("ys")))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_points"), sumMoney(col("x")).as("sum_x"))
      .orderBy("zone")
  }

  private val geoWktOracle = {
    val zoneRows = zones.map { case (z, x0, x1, y0, y1) =>
      s"('$z', 'POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))')"
    }.mkString(", ")
    s"""WITH zw(zone, wkt) AS (VALUES $zoneRows),
       |parsed AS (
       |  SELECT zone,
       |    list_transform(string_split(regexp_extract(wkt, 'POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)', 1), ','),
       |      p -> CAST(string_split(trim(p), ' ')[1] AS DOUBLE)) AS xs,
       |    list_transform(string_split(regexp_extract(wkt, 'POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)', 1), ','),
       |      p -> CAST(string_split(trim(p), ' ')[2] AS DOUBLE)) AS ys
       |  FROM zw),
       |zones AS (
       |  SELECT zone, list_min(xs) AS x0, list_max(xs) AS x1,
       |    list_min(ys) AS y0, list_max(ys) AS y1
       |  FROM parsed),
       |pts AS (
       |  SELECT event_id, "value" AS x,
       |    CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS DOUBLE) AS y
       |  FROM events)
       |SELECT zone, COUNT(*) AS n_points,
       |  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sum_x
       |FROM pts JOIN zones ON x >= x0 AND x < x1 AND y >= y0 AND y < y1
       |GROUP BY 1 ORDER BY zone""".stripMargin
  }

  /** (zone, lon0, lon1, lat0, lat1) for the SPHERICAL tagger. Bounds
    * are chosen so planar and geodesic containment agree EXACTLY on the
    * data: longitudes are meridian edges (great circles — identical in
    * both models), and latitude bounds sit 0.4° off the data's 0.8°
    * lat grid while the N/S edges' great-circle bulge stays under 0.14°
    * (tan φmax = tan φ / cos(Δλ/2)) — no data point can fall in a
    * planar-vs-spherical disagreement sliver, so the planar range
    * oracle replays the geodesic result. The spec proves the kernel is
    * genuinely geodesic on polygons where the two models DISAGREE. */
  private val sphereZones: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("s_west", 0.013, 4.027, -20.4, 28.4),
    ("s_mid", 4.027, 9.013, -36.4, 36.4),
    ("s_east", 9.013, 29.507, -8.4, 8.4),
  )

  /** Zone tagging under GEOGRAPHY semantics: events as (lon, lat)
    * points — lon = value (wrapping mod 360 on the sphere, as plain
    * trigonometry does — the data's tail reaches 560°), lat = 0.8·k −
    * 40 (a [−40, 39.2] grid) — against great-circle polygon zones via
    * the geodesic [[graft.functions.SphericalPointInPolygon]] kernel.
    * Same broadcast + codegen'd filter + rollup shape as
    * [[geoContains]]; only the crossing predicate is spherical. */
  def geoSphere(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zoneDf = sphereZones.map { case (z, l0, l1, b0, b1) =>
      (z, Seq(l0, l1, l1, l0), Seq(b0, b0, b1, b1))
    }.toDF("zone", "lons", "lats")
    val pts = Tables.events(spark, dir)
      .select(col("event_id"), col("value").as("lon"),
        (when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("double")
          * 0.8 - 40.0).as("lat"))
    pts.join(broadcast(zoneDf),
        graft.functions.SphericalPointInPolygon(
          col("lon"), col("lat"), col("lons"), col("lats")))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_points"), sumMoney(col("lon")).as("sum_lon"))
      .orderBy("zone")
  }

  /** The oracle's range test runs on lon MOD 360: longitudes wrap on
    * the sphere (562° IS 202°, and a 362° point IS a 2° point inside a
    * [0°, 4°] zone), and the geodesic kernel inherits that from plain
    * trigonometry — so the replay must state it too. The data's values
    * are non-negative, so a single `%` is the full wrap. sum_lon stays
    * over the RAW value (both engines aggregate the stored column; only
    * membership wraps). */
  private val geoSphereOracle = {
    val zoneRows = sphereZones.map { case (z, l0, l1, b0, b1) =>
      s"('$z', $l0, $l1, $b0, $b1)"
    }.mkString(", ")
    s"""WITH zones(zone, l0, l1, b0, b1) AS (VALUES $zoneRows),
       |pts AS (
       |  SELECT event_id, "value" AS lon, "value" % 360 AS wlon,
       |    CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS DOUBLE)
       |      * 0.8 - 40.0 AS lat
       |  FROM events)
       |SELECT zone, COUNT(*) AS n_points,
       |  CAST(SUM(CAST(lon AS DECIMAL(18,4))) AS DOUBLE) AS sum_lon
       |FROM pts JOIN zones
       |  ON wlon >= l0 AND wlon < l1 AND lat > b0 AND lat < b1
       |GROUP BY 1 ORDER BY zone""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_geo_contains", geoContains, Some(geoContainsOracle)),
    Op("q_geo_filter", geoFilter, Some(geoFilterOracle)),
    Op("q_geo_wkt", geoWkt, Some(geoWktOracle)),
    Op("q_geo_sphere", geoSphere, Some(geoSphereOracle)),
  )
}
