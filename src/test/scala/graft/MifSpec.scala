package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.geometry._

class MifSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("MIF round-trips points, lines, regions, NONE and typed attributes") {
    import spark.implicits._
    val df = Seq(
      (0L, "POINT (5.1 52.05)", "home, with \"quotes\"", 7L, 1.25, true),
      (1L, "LINESTRING (5.0 52.0, 5.1 52.1, 5.2 52.1)", "path", 8L, -2.5, false),
      (2L, "MULTILINESTRING ((5.0 52.0, 5.1 52.0), (5.2 52.2, 5.3 52.3))",
        "multi", 9L, 0.125, true),
      (3L, "POLYGON ((5 52, 6 52, 6 53, 5 53, 5 52), (5.4 52.4, 5.6 52.4, 5.6 52.6, 5.4 52.6, 5.4 52.4))",
        "donut", 10L, 3.5, false),
      (4L, "MULTIPOINT ((5 52), (6 53))", null.asInstanceOf[String], 11L, 4.5, true),
      (5L, null.asInstanceOf[String], "empty", 12L, 5.5, false))
      .toDF("fid", "wkt", "name", "n", "v", "flag")
      .select(col("fid"),
        when(col("wkt").isNotNull, GeomFunctions.stGeomFromWkt(col("wkt")))
          .as("geometry"),
        col("name"), col("n"), col("v"), col("flag"))
    val path = s"${tmp("graft_mif")}/features.mif"
    MifSink.writeStream(df, "EPSG:4326", path)(spark)
    assert(Files.exists(Paths.get(path.stripSuffix(".mif") + ".mid")))
    val src = MifSource(path)
    assert(src.projection == "EPSG:4326")
    val back = src.frame(GeometryRequest())(spark).orderBy("fid").collect()
    assert(back.length == 6)
    val schema = src.frame(GeometryRequest())(spark).schema
    assert(schema("n").dataType.typeName == "long")
    assert(schema("v").dataType.typeName == "double")
    assert(schema("flag").dataType.typeName == "boolean")
    def geom(i: Int) = GeomFunctions.readWkb(back(i).getAs[Array[Byte]]("geometry"))
    assert(geom(0).getGeometryType == "Point" &&
      geom(0).getCoordinate.x == 5.1 && geom(0).getCoordinate.y == 52.05)
    assert(back(0).getAs[String]("name") == "home, with \"quotes\"")
    assert(back(0).getAs[Long]("n") == 7L && back(0).getAs[Double]("v") == 1.25)
    assert(back(0).getAs[Boolean]("flag"))
    assert(geom(1).getGeometryType == "LineString" && geom(1).getNumPoints == 3)
    assert(geom(2).getGeometryType == "MultiLineString" &&
      geom(2).getNumGeometries == 2)
    val donut = geom(3).asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(donut.getNumInteriorRing == 1) // hole recovered by containment
    assert(geom(4).getGeometryType == "MultiPoint" && geom(4).getNumGeometries == 2)
    assert(back(5).isNullAt(back(5).fieldIndex("geometry"))) // NONE
    assert(back(4).isNullAt(back(4).fieldIndex("name")))     // null attr
  }

  test("projected CRS rides NonEarth + .prj and survives the round-trip") {
    import spark.implicits._
    val df = Seq((0L, "POINT (155000 463000)")).toDF("fid", "wkt")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    val path = s"${tmp("graft_mif_rd")}/rd.mif"
    MifSink.writeStream(df, "EPSG:28992", path)(spark)
    val text = Files.readString(Paths.get(path))
    assert(text.contains("CoordSys NonEarth"))
    assert(Files.exists(Paths.get(path.stripSuffix(".mif") + ".prj")))
    val src = MifSource(path)
    assert(src.projection == "EPSG:28992")
    // native coordinates untouched (MIF carries the source CRS, unlike GPX)
    val g = GeomFunctions.readWkb(src.frame(GeometryRequest())(spark)
      .head.getAs[Array[Byte]]("geometry"))
    assert(g.getCoordinate.x == 155000.0 && g.getCoordinate.y == 463000.0)
  }

  test("foreign CoordSys clauses: WGS84, TM over WGS84, loud failures") {
    val dir = tmp("graft_mif_foreign")
    // a hand-written (MapInfo-style) pair: region with hole + separate
    // island, tab default delimiter absent → explicit comma, TM CoordSys
    Files.writeString(Paths.get(s"$dir/tm.mif"),
      """Version 300
        |Charset "WindowsLatin1"
        |Delimiter ","
        |CoordSys Earth Projection 8, 104, "m", 9, 0, 0.9996, 500000, 0
        |Columns 2
        |  zone Char(10)
        |  code Integer
        |Data
        |
        |Region 3
        |  5
        |440000 5500000
        |460000 5500000
        |460000 5520000
        |440000 5520000
        |440000 5500000
        |  5
        |445000 5505000
        |450000 5505000
        |450000 5510000
        |445000 5510000
        |445000 5505000
        |  4
        |470000 5500000
        |480000 5500000
        |475000 5510000
        |470000 5500000
        | Pen (1,2,0)
        | Brush (2,16777215,16777215)
        |Point 450000 5515000
        | Symbol (34,0,12)
        |""".stripMargin)
    Files.writeString(Paths.get(s"$dir/tm.mid"),
      "\"UTM32\",7\n\"UTM32\",8\n")
    val src = MifSource(s"$dir/tm.mif")
    // the TM clause resolves through the WKT hub (a PARAM self-contained
    // code or an EPSG match — either way a usable, transformable CRS)
    val proj = src.projection
    assert(proj.nonEmpty && proj != "EPSG:4326")
    val rows = src.frame(GeometryRequest())(spark).orderBy("fid").collect()
    assert(rows.length == 2)
    val region = GeomFunctions.readWkb(rows(0).getAs[Array[Byte]]("geometry"))
    // MITAB rule: ring 2 inside ring 1 → hole; ring 3 outside → own shell
    assert(region.getGeometryType == "MultiPolygon" && region.getNumGeometries == 2)
    val first = region.asInstanceOf[org.locationtech.jts.geom.MultiPolygon]
      .getGeometryN(0).asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(first.getNumInteriorRing == 1)
    assert(rows(0).getAs[String]("zone") == "UTM32" &&
      rows(0).getAs[Long]("code") == 7L)
    // the TM CRS actually transforms: round-trip a point to WGS84 and back
    val (lon, lat) = graft.raster.Proj.transform(proj, "EPSG:4326",
      500000.0, 0.0)
    assert(math.abs(lon - 9.0) < 1e-9 && math.abs(lat) < 1e-9)

    // Earth 1, 104 → WGS84
    Files.writeString(Paths.get(s"$dir/ll.mif"),
      "Version 300\nCoordSys Earth Projection 1, 104\nColumns 0\nData\nPoint 5 52\n")
    assert(MifSource(s"$dir/ll.mif").projection == "EPSG:4326")
    // an unsupported clause fails loudly, quoting itself
    Files.writeString(Paths.get(s"$dir/bad.mif"),
      "Version 300\nCoordSys Earth Projection 3, 62, \"m\", 0, 0, 30, 60, 0, 0\nColumns 0\nData\nPoint 1 2\n")
    val e = intercept[IllegalArgumentException] {
      MifSource(s"$dir/bad.mif").projection
    }
    assert(e.getMessage.contains("CoordSys"))
    // NonEarth with no .prj and no argument fails loudly
    Files.writeString(Paths.get(s"$dir/ne.mif"),
      "Version 300\nCoordSys NonEarth Units \"m\"\nColumns 0\nData\nPoint 1 2\n")
    intercept[IllegalArgumentException] { MifSource(s"$dir/ne.mif").projection }
    // ...but the projection argument rescues it
    assert(MifSource(s"$dir/ne.mif", "EPSG:28992").projection == "EPSG:28992")
  }

  test("MIF dispatches through GeometryFileSource/to_file/mergeFiles + JSON view") {
    val pts = SeqGeometrySource(Seq(
      (1L, "POINT (5.0 52.0)", 1.0, "a"),
      (2L, "POINT (5.1 52.1)", 2.0, "b")), proj = "EPSG:4326")
    val dir = tmp("graft_mif_tiles")
    GeometryFileSink(pts, dir, "mif")
      .write(GeometryRequest(mode = "centroid", filters = Map("name" -> "a")))
    GeometryFileSink(pts, dir, "mif")
      .write(GeometryRequest(mode = "centroid", filters = Map("name" -> "b")))
    val target = tmp("graft_mif_merge") + "/all.mif"
    GeometryFileSink.mergeFiles(dir, target)
    val back = GeometryFileSource(target).frame(GeometryRequest())(spark)
      .orderBy("fid").collect()
    assert(back.map(_.getAs[Long]("fid")).toSeq == Seq(1L, 2L))
    assert(back.map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
    val view = graft.core.BlockRegistry.fromJson(MifSource(target).toJson)
    assert(view == MifSource(target))
  }
}
