package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geometry._

/** Test-only in-memory feature source, the analogue of the reference's
  * MockGeometry (tests/factories.py:193-282): returns the given WKT
  * polygons + properties regardless of the request bbox. */
case class SeqGeometrySource(
    rows: Seq[(Long, String, Double, String)], // fid, wkt, value, name
    proj: String = "EPSG:28992"
) extends GeometryBlock {
  override def columns: Set[String] = Set("geometry", "value", "name")
  override def projection: String = proj
  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    var df = rows.toDF("fid", "wkt", "value", "name")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("value"), col("name"))
    req.geometryWkt.foreach { wkt =>
      df = df.filter(GeomFunctions.stFilter(col("geometry"), lit(wkt),
        lit(if (req.mode == "centroid") "centroid" else "intersects")))
    }
    req.filters.foreach { case (k, v) => df = df.filter(col(k) === lit(v)) }
    req.limit.foreach(n => df = df.limit(n))
    df
  }
}

object GeometryFixtures {
  def square(x1: Double, y1: Double, x2: Double, y2: Double): String =
    s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"

  /** Two unit-ish squares + a tiny sliver, in the raster fixture's CRS. */
  val features: SeqGeometrySource = SeqGeometrySource(Seq(
    (1L, square(135000, 455999, 135001, 456000), 42.0, "a"),
    (2L, square(135001, 455998, 135003, 456000), 7.5, "b"),
    (3L, square(135000.2, 455999.7, 135000.3, 455999.8), -1.0, "c")))

  val request: GeometryRequest = GeometryRequest()
}
