package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.geometry._

class GpxSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("GPX waypoints round-trip: std fields, extensions, fid, exact coords") {
    import spark.implicits._
    val df = Seq(
      (0L, "POINT (5.1 52.05)", "home", 12.5, 7L),
      (1L, "POINT (5.2 52.15)", "a <&> b", -3.25, 9L),
      (2L, "POINT (5.3 52.25)", null.asInstanceOf[String], 0.125, 11L))
      .toDF("fid", "wkt", "name", "ele", "p_size")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("name"), col("ele"), col("p_size"))
    val path = s"${tmp("graft_gpx")}/pts.gpx"
    GpxSink.writeStream(df, "EPSG:4326", path)(spark)
    val back = GpxSource(path).frame(GeometryRequest())(spark)
      .orderBy("fid").collect()
    assert(back.length == 3)
    val r0 = back(0)
    val schema = GpxSource(path).frame(GeometryRequest())(spark).schema
    // std fields typed (ele double), extension p_size string-typed
    assert(schema("ele").dataType.typeName == "double")
    assert(schema("p_size").dataType.typeName == "string")
    assert(r0.getAs[Long]("fid") == 0L)
    assert(r0.getAs[String]("name") == "home")
    assert(r0.getAs[Double]("ele") == 12.5)
    assert(r0.getAs[String]("p_size") == "7")
    val g1 = GeomFunctions.readWkb(back(1).getAs[Array[Byte]]("geometry"))
    assert(g1.getGeometryType == "Point")
    assert(g1.getCoordinate.x == 5.2 && g1.getCoordinate.y == 52.15)
    // XML escaping survives
    assert(back(1).getAs[String]("name") == "a <&> b")
    // null attr stays null
    assert(back(2).isNullAt(back(2).fieldIndex("name")))
  }

  test("GPX sink reprojects to WGS84; tracks round-trip lines and multilines") {
    import spark.implicits._
    // RD Amersfoort (155000, 463000) ≈ (5.3872, 52.1551)
    val wpt = Seq((0L, "POINT (155000 463000)"))
      .toDF("fid", "wkt")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    val dir = tmp("graft_gpx_rd")
    GpxSink.writeStream(wpt, "EPSG:28992", s"$dir/rd.gpx")(spark)
    val p = GeomFunctions.readWkb(GpxSource(s"$dir/rd.gpx")
      .frame(GeometryRequest())(spark).head.getAs[Array[Byte]]("geometry"))
    assert(math.abs(p.getCoordinate.x - 5.3872) < 1e-3 &&
      math.abs(p.getCoordinate.y - 52.1551) < 1e-3)

    val lines = Seq(
      (0L, "LINESTRING (5.0 52.0, 5.1 52.1)", "trackA"),
      (1L, "MULTILINESTRING ((5.0 52.0, 5.1 52.0), (5.2 52.2, 5.3 52.3))", "trackB"))
      .toDF("fid", "wkt", "name")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("name"))
    GpxSink.writeStream(lines, "EPSG:4326", s"$dir/trk.gpx")(spark)
    val trks = GpxSource(s"$dir/trk.gpx", "tracks")
      .frame(GeometryRequest())(spark).orderBy("fid").collect()
    assert(trks.length == 2)
    val t0 = GeomFunctions.readWkb(trks(0).getAs[Array[Byte]]("geometry"))
    assert(t0.getGeometryType == "LineString" && t0.getNumPoints == 2)
    val t1 = GeomFunctions.readWkb(trks(1).getAs[Array[Byte]]("geometry"))
    assert(t1.getGeometryType == "MultiLineString" && t1.getNumGeometries == 2)
    assert(trks(1).getAs[String]("name") == "trackB")
    // the same file's waypoints layer is empty, tracks don't leak
    assert(GpxSource(s"$dir/trk.gpx").frame(GeometryRequest())(spark).count() == 0)
  }

  test("GPX rejects polygons loudly; foreign files parse without extensions") {
    import spark.implicits._
    val poly = Seq((0L, "POLYGON ((0 0, 1 0, 1 1, 0 0))"))
      .toDF("fid", "wkt")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    val dir = tmp("graft_gpx_bad")
    intercept[Exception] {
      GpxSink.writeStream(poly, "EPSG:4326", s"$dir/bad.gpx")(spark)
    }
    // a hand-written (device-style) file: no extensions, multiline layout
    Files.writeString(Paths.get(s"$dir/device.gpx"),
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="unit">
        |  <wpt lat="52.37" lon="4.89">
        |    <ele>2.0</ele>
        |    <time>2020-01-02T03:04:05Z</time>
        |    <name>Amsterdam</name>
        |  </wpt>
        |  <trk><name>ride</name><trkseg>
        |    <trkpt lat="52.0" lon="5.0"></trkpt>
        |    <trkpt lat="52.1" lon="5.1"></trkpt>
        |  </trkseg></trk>
        |</gpx>
        |""".stripMargin)
    val w = GpxSource(s"$dir/device.gpx").frame(GeometryRequest())(spark).collect()
    assert(w.length == 1)
    assert(w(0).getAs[Long]("fid") == -1L) // no persisted fid
    assert(w(0).getAs[String]("name") == "Amsterdam")
    assert(w(0).getAs[Double]("ele") == 2.0)
    assert(w(0).getAs[String]("time") == "2020-01-02T03:04:05Z")
    val t = GpxSource(s"$dir/device.gpx", "tracks")
      .frame(GeometryRequest())(spark).collect()
    assert(t.length == 1 && t(0).getAs[String]("name") == "ride")
  }

  test("gpx tiles write and mergeFiles appends them into one file") {
    val pts = SeqGeometrySource(Seq(
      (1L, "POINT (5.0 52.0)", 1.0, "a"),
      (2L, "POINT (5.1 52.1)", 2.0, "b")), proj = "EPSG:4326")
    val dir = tmp("graft_gpx_tiles")
    // two requests → two <hash>.gpx tiles
    GeometryFileSink(pts, dir, "gpx")
      .write(GeometryRequest(mode = "centroid", filters = Map("name" -> "a")))
    GeometryFileSink(pts, dir, "gpx")
      .write(GeometryRequest(mode = "centroid", filters = Map("name" -> "b")))
    val target = tmp("graft_gpx_merge") + "/all.gpx"
    GeometryFileSink.mergeFiles(dir, target)
    val back = GeometryFileSource(target).frame(GeometryRequest())(spark)
      .orderBy("fid").collect()
    assert(back.map(_.getAs[Long]("fid")).toSeq == Seq(1L, 2L))
    assert(back.map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
    // FeatureCollection .geojson targets merge through the same API
    val jdir = tmp("graft_fc_tiles")
    GeometryToFile.toFile(pts, s"$jdir/a.geojson",
      fields = Some(Seq("value", "name")))
    val jtarget = tmp("graft_fc_merge") + "/all.geojson"
    GeometryFileSink.mergeFiles(jdir, jtarget)
    assert(GeometryFileSource(jtarget).frame(GeometryRequest())(spark)
      .count() == 2)
  }

  test("self-closing waypoints parse one feature each, not a merged last-point") {
    val dir = tmp("graft_gpx_selfclose")
    // legal GPX: wpt needs only lat/lon attributes, so <wpt .../> is valid
    // and carries no </wpt> separator — three of them plus a normal one
    Files.writeString(Paths.get(s"$dir/sc.gpx"),
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="unit">
        |  <wpt lat="52.0" lon="5.0"/>
        |  <wpt lat="52.1" lon="5.1" />
        |  <wpt lat="52.2" lon="5.2"><name>named</name></wpt>
        |  <wpt lat="52.3" lon="5.3"/>
        |</gpx>
        |""".stripMargin)
    val w = GpxSource(s"$dir/sc.gpx").frame(GeometryRequest())(spark)
      .collect().map(r =>
        GeomFunctions.readWkb(r.getAs[Array[Byte]]("geometry")).getCoordinate)
    assert(w.length == 4)
    assert(w.map(c => (c.x, c.y)).toSet ==
      Set((5.0, 52.0), (5.1, 52.1), (5.2, 52.2), (5.3, 52.3)))
  }

  test("schema is layer-scoped and track std children are XSD-legal") {
    import spark.implicits._
    val dir = tmp("graft_gpx_scope")
    // waypoint-only children (ele/time/sym) must not leak into the tracks
    // schema of a mixed file...
    Files.writeString(Paths.get(s"$dir/mixed.gpx"),
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="unit">
        |  <wpt lat="52.0" lon="5.0"><ele>3.5</ele><sym>Flag</sym></wpt>
        |  <trk><name>r</name><trkseg>
        |    <trkpt lat="52.0" lon="5.0"><ele>1.0</ele></trkpt>
        |  </trkseg></trk>
        |</gpx>
        |""".stripMargin)
    val trkCols = GpxSource(s"$dir/mixed.gpx", "tracks")
      .frame(GeometryRequest())(spark).columns.toSet
    assert(!trkCols.contains("ele") && !trkCols.contains("sym"))
    assert(trkCols.contains("name"))
    val wptCols = GpxSource(s"$dir/mixed.gpx")
      .frame(GeometryRequest())(spark).columns.toSet
    assert(wptCols.contains("ele") && wptCols.contains("sym") &&
      !wptCols.contains("name") /* name only appears on the trk here */)
    // ...and a sink round-trip of tracks WITH ele/time/sym keeps the file
    // XSD-legal (those ride in <extensions>) while values survive typed
    val lines = Seq((0L, "LINESTRING (5.0 52.0, 5.1 52.1)", "t", 12.5, "Dot"))
      .toDF("fid", "wkt", "name", "ele", "sym")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("name"), col("ele"), col("sym"))
    GpxSink.writeStream(lines, "EPSG:4326", s"$dir/t.gpx")(spark)
    val xml = Files.readString(Paths.get(s"$dir/t.gpx"))
    val trkBody = "(?s)<trk>.*</trk>".r.findFirstIn(xml).get
    assert(!trkBody.contains("<ele>") && !trkBody.contains("<sym>"))
    assert(trkBody.contains("<graft:ele>12.5</graft:ele>"))
    assert(trkBody.contains("<name>t</name>")) // trk-legal stays direct
    val back = GpxSource(s"$dir/t.gpx", "tracks").frame(GeometryRequest())(spark)
    assert(back.schema("ele").dataType.typeName == "double")
    val r = back.head
    assert(r.getAs[Double]("ele") == 12.5 && r.getAs[String]("sym") == "Dot" &&
      r.getAs[String]("name") == "t")
  }

  test("nested Garmin-style extension trees flatten instead of failing") {
    val dir = tmp("graft_gpx_nested")
    Files.writeString(Paths.get(s"$dir/n.gpx"),
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="unit">
        |  <wpt lat="52.0" lon="5.0"><extensions>
        |    <gpxx:WaypointExtension>
        |      <gpxx:DisplayMode>SymbolAndName</gpxx:DisplayMode>
        |    </gpxx:WaypointExtension>
        |    <plain>7</plain>
        |  </extensions></wpt>
        |</gpx>
        |""".stripMargin)
    val df = GpxSource(s"$dir/n.gpx").frame(GeometryRequest())(spark)
    val r = df.head
    assert(r.getAs[String]("plain") == "7")
    // nested subtree flattens into its top-level parent column
    assert(r.getAs[String]("WaypointExtension").trim == "SymbolAndName")
    assert(!df.columns.contains("DisplayMode"))
  }

  test("GPX dispatches through GeometryFileSource/to_file and the JSON view") {
    import spark.implicits._
    val df = Seq((3L, "POINT (5.0 52.0)")).toDF("fid", "wkt")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
    val dir = tmp("graft_gpx_disp")
    GpxSink.writeStream(df, "EPSG:4326", s"$dir/d.gpx")(spark)
    val src = GeometryFileSource(s"$dir/d.gpx")
    assert(src.projection == "EPSG:4326")
    assert(src.frame(GeometryRequest())(spark).head.getAs[Long]("fid") == 3L)
    val back = graft.core.BlockRegistry.fromJson(GpxSource(s"$dir/d.gpx").toJson)
    assert(back == GpxSource(s"$dir/d.gpx"))
    // spatial-filter pushpath: a bbox that excludes the point
    assert(GpxSource(s"$dir/d.gpx").frame(GeometryRequest(
      geometryWkt = Some("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))(spark)
      .count() == 0)
  }
}
