package graft.geometry

import org.locationtech.jts.geom._

/** RFC 7946 GeoJSON geometry encoding over the repo's JTS kernel.
  *
  * The reference's GeoJSON path goes through OGR's GeoJSON driver and
  * reprojects to EPSG:4326 first (geometry/sinks.py:160-163); these
  * helpers give the Spark sink/source the same wire format — real nested
  * coordinate arrays, not WKT-in-JSON — so the newline-delimited output is
  * a valid GeoJSON text sequence any GeoJSON reader takes.
  */
object GeoJson {

  private def pos(c: Coordinate): String = s"[${Gml.fmt(c.x)},${Gml.fmt(c.y)}]"

  private def posArray(cs: Array[Coordinate]): String =
    cs.map(pos).mkString("[", ",", "]")

  private def polygonCoords(p: Polygon): String = {
    val rings = p.getExteriorRing.getCoordinates +:
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN(_).getCoordinates)
    rings.map(posArray).mkString("[", ",", "]")
  }

  /** JTS geometry → RFC 7946 geometry object (JSON text). */
  def toGeoJson(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type":"Point","coordinates":${pos(p.getCoordinate)}}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":${posArray(l.getCoordinates)}}"""
    case p: Polygon =>
      s"""{"type":"Polygon","coordinates":${polygonCoords(p)}}"""
    case m: MultiPoint =>
      val cs = (0 until m.getNumGeometries)
        .map(i => pos(m.getGeometryN(i).asInstanceOf[Point].getCoordinate))
      s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
    case m: MultiLineString =>
      val cs = (0 until m.getNumGeometries)
        .map(i => posArray(m.getGeometryN(i).getCoordinates))
      s"""{"type":"MultiLineString","coordinates":${cs.mkString("[", ",", "]")}}"""
    case m: MultiPolygon =>
      val cs = (0 until m.getNumGeometries)
        .map(i => polygonCoords(m.getGeometryN(i).asInstanceOf[Polygon]))
      s"""{"type":"MultiPolygon","coordinates":${cs.mkString("[", ",", "]")}}"""
    case m: GeometryCollection =>
      val gs = (0 until m.getNumGeometries).map(i => toGeoJson(m.getGeometryN(i)))
      s"""{"type":"GeometryCollection","geometries":${gs.mkString("[", ",", "]")}}"""
    case other =>
      throw new IllegalArgumentException(s"cannot encode ${other.getGeometryType} as GeoJSON")
  }

  private val factory = new GeometryFactory()

  private def num(v: Any): Double = v match {
    case d: Double => d
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case other => throw new IllegalArgumentException(s"not a coordinate number: $other")
  }

  private def coord(v: Any): Coordinate = v match {
    case l: List[_] if l.length >= 2 => new Coordinate(num(l(0)), num(l(1)))
    case other => throw new IllegalArgumentException(s"not a position: $other")
  }

  private def coords(v: Any): Array[Coordinate] = v match {
    case l: List[_] => l.map(coord).toArray
    case other => throw new IllegalArgumentException(s"not a position array: $other")
  }

  private def polygonOf(v: Any): Polygon = v match {
    case l: List[_] if l.nonEmpty =>
      val rings = l.map(r => factory.createLinearRing(coords(r)))
      factory.createPolygon(rings.head, rings.tail.toArray)
    case other => throw new IllegalArgumentException(s"not polygon coordinates: $other")
  }

  /** Parsed GeoJSON geometry value (graft.core.Json shape) → JTS. Also
    * accepts a plain WKT string for back-compat with the sink's earlier
    * WKT-carrier lines. */
  def fromGeoJson(v: Any): Geometry = v match {
    case null => null
    case wkt: String => GeomFunctions.readWkt(wkt)
    case m: Map[_, _] =>
      val obj = m.asInstanceOf[Map[String, Any]]
      val kind = obj.getOrElse("type",
        throw new IllegalArgumentException("geometry object without type"))
      def cs = obj.getOrElse("coordinates",
        throw new IllegalArgumentException(s"$kind without coordinates"))
      kind match {
        case "Point"      => factory.createPoint(coord(cs))
        case "LineString" => factory.createLineString(coords(cs))
        case "Polygon"    => polygonOf(cs)
        case "MultiPoint" =>
          factory.createMultiPoint(coords(cs).map(factory.createPoint))
        case "MultiLineString" => cs match {
          case l: List[_] =>
            factory.createMultiLineString(l.map(x => factory.createLineString(coords(x))).toArray)
          case other => throw new IllegalArgumentException(s"bad MultiLineString: $other")
        }
        case "MultiPolygon" => cs match {
          case l: List[_] => factory.createMultiPolygon(l.map(polygonOf).toArray)
          case other => throw new IllegalArgumentException(s"bad MultiPolygon: $other")
        }
        case "GeometryCollection" =>
          obj.getOrElse("geometries", List.empty) match {
            case l: List[_] =>
              factory.createGeometryCollection(l.map(fromGeoJson).toArray)
            case other => throw new IllegalArgumentException(s"bad GeometryCollection: $other")
          }
        case other => throw new IllegalArgumentException(s"unknown geometry type $other")
      }
    case other => throw new IllegalArgumentException(s"not a GeoJSON geometry: $other")
  }
}
