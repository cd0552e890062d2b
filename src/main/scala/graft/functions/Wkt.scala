package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT polygon text → coordinate arrays — the ingestion shim between
  * the common geo interchange format and [[PointInPolygon]]'s
  * array-based ray caster (reference: the zone-polygon CTE applies
  * ST_ASTEXT / ST_GEOGPOINT / ST_CONTAINS over polygon text,
  * sql_queries/data_extraction_queries_automated_script.sql:144-165).
  *
  * `POLYGON((x1 y1, x2 y2, …))` single-ring polygons (the zone-shape
  * case; holes/multipolygons are out of scope — those rows parse to
  * the outer ring only). Built entirely from codegen'd built-ins
  * (regexp_extract / split / transform / cast), so parsing is a
  * scan-local expression: a polygon dimension parses once before the
  * broadcast, never per fact row. A closed ring's duplicate last
  * vertex is harmless to the even-odd rule (the degenerate edge can
  * never cross the ray), so the parser keeps it — faithful to the
  * text, zero extra logic.
  */
object Wkt {

  /** The ring's "x y" vertex strings, in text order. */
  private def ring(wkt: Column): Column =
    split(
      regexp_extract(wkt, "POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)", 1),
      "\\s*,\\s*")

  /** Vertex x coordinates of a `POLYGON((…))` string. */
  def xs(wkt: Column): Column =
    transform(ring(wkt), p => split(trim(p), "\\s+").getItem(0).cast("double"))

  /** Vertex y coordinates of a `POLYGON((…))` string. */
  def ys(wkt: Column): Column =
    transform(ring(wkt), p => split(trim(p), "\\s+").getItem(1).cast("double"))
}
