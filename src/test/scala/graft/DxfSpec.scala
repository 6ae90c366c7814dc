package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.geometry._

class DxfSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("DXF round-trips points, lines, polygons-with-holes and XDATA attrs") {
    import spark.implicits._
    val df = Seq(
      (0L, "POINT (5.1 52.05)", "home", 7L, 1.25),
      (1L, "LINESTRING (5.0 52.0, 5.1 52.1, 5.2 52.1)", "path", 8L, -2.5),
      (2L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "donut", 9L, 0.125),
      (3L, "MULTILINESTRING ((5 52, 5.1 52), (5.2 52.2, 5.3 52.3))",
        "multi", 10L, 3.5),
      (4L, "MULTIPOINT ((1 2), (3 4))", null.asInstanceOf[String], 11L, 4.5))
      .toDF("fid", "wkt", "name", "n", "v")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("name"), col("n"), col("v"))
    val path = s"${tmp("graft_dxf")}/drawing.dxf"
    DxfSink.writeStream(df, "EPSG:28992", path)(spark)
    assert(Files.exists(Paths.get(path.stripSuffix(".dxf") + ".prj")))
    val src = DxfSource(path)
    assert(src.projection == "EPSG:28992")
    val back = src.frame(GeometryRequest())(spark).orderBy("fid").collect()
    assert(back.length == 5)
    def geom(i: Int) = GeomFunctions.readWkb(back(i).getAs[Array[Byte]]("geometry"))
    assert(geom(0).getGeometryType == "Point" &&
      geom(0).getCoordinate.x == 5.1 && geom(0).getCoordinate.y == 52.05)
    assert(back(0).getAs[String]("name") == "home")
    assert(back(0).getAs[String]("n") == "7") // XDATA attrs are strings
    assert(back(0).getAs[String]("v") == "1.25")
    assert(geom(1).getGeometryType == "LineString" && geom(1).getNumPoints == 3)
    // the ringed polygon decomposed into two closed polylines sharing one
    // fid — the reader must regroup them and restore the hole
    val donut = geom(2).asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(donut.getNumInteriorRing == 1)
    assert(donut.getExteriorRing.getNumPoints == 5)
    assert(geom(3).getGeometryType == "MultiLineString" &&
      geom(3).getNumGeometries == 2)
    assert(geom(4).getGeometryType == "MultiPoint" && geom(4).getNumGeometries == 2)
    // null attribute stays absent
    assert(back(4).isNullAt(back(4).fieldIndex("name")))
  }

  test("foreign CAD file: entity subset, layers, curves, skips, loud no-CRS") {
    val dir = tmp("graft_dxf_foreign")
    // a hand-written (CAD-style) drawing: LWPOLYLINE closed, CIRCLE, ARC,
    // TEXT (skipped), layers, no XDATA → sequential fids
    Files.writeString(Paths.get(s"$dir/plan.dxf"),
      Seq("0", "SECTION", "2", "HEADER", "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        "0", "LWPOLYLINE", "8", "walls", "90", "4", "70", "1",
        "10", "0", "20", "0", "10", "10", "20", "0",
        "10", "10", "20", "8", "10", "0", "20", "8",
        "0", "CIRCLE", "8", "columns", "10", "5", "20", "4", "40", "0.5",
        "0", "ARC", "8", "doors", "10", "2", "20", "0", "40", "1",
        "50", "0", "51", "90",
        "0", "TEXT", "8", "labels", "10", "1", "20", "1", "1", "Room A",
        "0", "POINT", "8", "survey", "10", "3.5", "20", "7.25",
        "0", "ENDSEC", "0", "EOF").mkString("\n") + "\n")
    // no .prj, no argument → loud
    intercept[IllegalArgumentException] { DxfSource(s"$dir/plan.dxf").projection }
    val src = DxfSource(s"$dir/plan.dxf", "EPSG:28992")
    assert(src.projection == "EPSG:28992")
    val rows = src.frame(GeometryRequest())(spark).orderBy("fid").collect()
    assert(rows.length == 4) // TEXT skipped
    assert(Dxf.read(s"$dir/plan.dxf").skipped == Map("TEXT" -> 1))
    def geom(i: Int) = GeomFunctions.readWkb(rows(i).getAs[Array[Byte]]("geometry"))
    // closed LWPOLYLINE → polygon, layer column carried
    assert(geom(0).getGeometryType == "Polygon")
    assert(rows(0).getAs[String]("layer") == "walls")
    // circle tessellates to a polygon of the right area (pi r^2 within 1%)
    assert(geom(1).getGeometryType == "Polygon")
    assert(math.abs(geom(1).getArea - math.Pi * 0.25) < 0.01 * math.Pi * 0.25)
    // 90-degree arc → open linestring from (3,0) to (2,1)
    val arc = geom(2)
    assert(arc.getGeometryType == "LineString")
    val cs = arc.getCoordinates
    assert(math.abs(cs.head.x - 3.0) < 1e-9 && math.abs(cs.head.y) < 1e-9)
    assert(math.abs(cs.last.x - 2.0) < 1e-9 && math.abs(cs.last.y - 1.0) < 1e-9)
    assert(geom(3).getGeometryType == "Point")
    assert(rows(3).getAs[String]("layer") == "survey")
  }

  test("DXF dispatches through GeometryFileSource/to_file and the JSON view") {
    val pts = SeqGeometrySource(Seq(
      (1L, "POINT (5.0 52.0)", 1.0, "a"),
      (2L, "POINT (5.1 52.1)", 2.0, "b")), proj = "EPSG:4326")
    val out = tmp("graft_dxf_disp") + "/pts.dxf"
    GeometryToFile.toFile(pts, out)
    val back = GeometryFileSource(out).frame(GeometryRequest())(spark)
      .orderBy("fid").collect()
    assert(back.map(_.getAs[Long]("fid")).toSeq == Seq(1L, 2L))
    assert(back.map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
    val view = graft.core.BlockRegistry.fromJson(DxfSource(out).toJson)
    assert(view == DxfSource(out))
  }
}
