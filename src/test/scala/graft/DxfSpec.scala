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

  test("BLOCK/INSERT references expand with transform, by-block layers, nesting") {
    val dir = tmp("graft_dxf_blocks")
    // block "CHAIR": a point at base offset (1, 0) on layer 0 plus a line
    // on its own layer; block "DESKSET" nests an INSERT of CHAIR
    Files.writeString(Paths.get(s"$dir/office.dxf"),
      Seq("0", "SECTION", "2", "BLOCKS",
        "0", "BLOCK", "2", "CHAIR", "10", "0", "20", "0",
        "0", "POINT", "8", "0", "10", "1", "20", "0",
        "0", "LINE", "8", "legs", "10", "0", "20", "0", "11", "0", "21", "2",
        "0", "ENDBLK",
        "0", "BLOCK", "2", "DESKSET", "10", "0", "20", "0",
        "0", "INSERT", "8", "0", "2", "CHAIR", "10", "10", "20", "0",
        "0", "ENDBLK",
        "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        // plain insert at (100, 50), scale 2, no rotation, layer "room1"
        "0", "INSERT", "8", "room1", "2", "CHAIR",
        "10", "100", "20", "50", "41", "2", "42", "2",
        // rotated insert: 90 degrees about (0,0)
        "0", "INSERT", "8", "room2", "2", "CHAIR",
        "10", "0", "20", "0", "50", "90",
        // nested: DESKSET contains CHAIR at (10,0)
        "0", "INSERT", "8", "room3", "2", "DESKSET", "10", "0", "20", "100",
        // unknown block: skipped and counted, not fatal
        "0", "INSERT", "8", "x", "2", "GHOST", "10", "0", "20", "0",
        "0", "ENDSEC", "0", "EOF").mkString("\n") + "\n")
    val drawing = Dxf.read(s"$dir/office.dxf")
    assert(drawing.skipped == Map("INSERT(GHOST)" -> 1))
    val es = drawing.entities
    assert(es.length == 6) // 3 inserts x (point + line)
    // insert 1: point (1,0)*2 + (100,50) = (102, 50); layer-0 member takes
    // the insert's layer, the explicit "legs" layer stays
    val p1 = es(0)
    assert(p1.geom.getGeometryType == "Point" && p1.layer == "room1")
    assert(math.abs(p1.geom.getCoordinate.x - 102) < 1e-9 &&
      math.abs(p1.geom.getCoordinate.y - 50) < 1e-9)
    assert(es(1).layer == "legs")
    val l1 = es(1).geom.getCoordinates
    assert(math.abs(l1(1).x - 100) < 1e-9 && math.abs(l1(1).y - 54) < 1e-9)
    // insert 2: rotation 90 deg maps (1,0) -> (0,1)
    val p2 = es(2).geom.getCoordinate
    assert(math.abs(p2.x) < 1e-9 && math.abs(p2.y - 1) < 1e-9)
    // insert 3 (nested): CHAIR at (10,0) inside DESKSET at (0,100)
    val p3 = es(4).geom.getCoordinate
    assert(math.abs(p3.x - 11) < 1e-9 && math.abs(p3.y - 100) < 1e-9)
    // a self-referencing block fails loudly instead of recursing forever
    Files.writeString(Paths.get(s"$dir/cycle.dxf"),
      Seq("0", "SECTION", "2", "BLOCKS",
        "0", "BLOCK", "2", "LOOP", "10", "0", "20", "0",
        "0", "INSERT", "2", "LOOP", "10", "1", "20", "1",
        "0", "ENDBLK", "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        "0", "INSERT", "2", "LOOP", "10", "0", "20", "0",
        "0", "ENDSEC", "0", "EOF").mkString("\n") + "\n")
    val e = intercept[IllegalArgumentException] { Dxf.read(s"$dir/cycle.dxf") }
    assert(e.getMessage.contains("nesting"))
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
