package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.geometry._

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // drive GeometryFileSource end-to-end: construct the view from its JSON
    // graph (the wire form a service client would send), dispatch on the
    // .gpkg extension, and pull a filtered frame
    val gpkg = "src/test/resources/fixture.gpkg"
    val view = GeometryFileSource(gpkg, layer = Some("plots"))
    val wire = view.toJson
    val back = graft.core.BlockRegistry.fromJson(wire)
      .asInstanceOf[GeometryBlock]
    println(s"columns: ${back.columns.toSeq.sorted.mkString(",")}")
    println(s"projection: ${back.projection}")
    val df = back.frame(GeometryRequest(
      geometryWkt = Some("POLYGON ((150 -26.1, 156.1 -26.1, 156.1 -24.9, 150 -24.9, 150 -26.1))")))
    df.select(col("fid"), col("name"), col("value")).orderBy("fid").show()
    println(s"boxed rows: ${df.count()}")

    // and the .shp branch through the same dispatcher (the box selects only
    // point features — a shapefile is single-shape-type)
    ShapefileSink.write(back, "/tmp/scratch_export.shp", GeometryRequest(
      geometryWkt = Some("POLYGON ((150 -26.1, 156.1 -26.1, 156.1 -24.9, 150 -24.9, 150 -26.1))")))
    val shpView = GeometryFileSource("/tmp/scratch_export.shp")
    println(s"shp reopened rows: ${shpView.frame(GeometryRequest()).count()}")

    // the .gpkg WRITE path: all 2000 fixture features — multi-leaf b-trees,
    // an overflow-chain payload, NULL geometries — then reopen through the
    // extension dispatcher (external validation: `sqlite3` opens the file
    // and PRAGMA integrity_check returns ok)
    GeoPackageSink.write(back, "/tmp/scratch_export.gpkg", GeometryRequest())
    val gpkgView = GeometryFileSource("/tmp/scratch_export.gpkg")
    println(s"gpkg reopened rows: ${gpkgView.frame(GeometryRequest()).count()}")

    // round-6/7 single-file formats through the to_file dispatcher:
    // FlatGeobuf (packed Hilbert R-tree + bbox pushdown), CSV-WKT, KML
    // (reprojected to WGS84), GeoJSON FeatureCollection (the OGR/QGIS
    // document layout)
    for (ext <- Seq("fgb", "csv", "kml", "geojson")) {
      val out = s"/tmp/scratch_export.$ext"
      new java.io.File(out).delete()
      GeometryToFile.toFile(gpkgView, out)
      val v = GeometryFileSource(out)
      println(s"$ext reopened rows: ${v.frame(GeometryRequest()).count()} " +
        s"proj: ${v.projection}")
    }

    // GPX (points only — filter the mixed fixture down to waypoints)
    locally {
      val df = gpkgView.frame(GeometryRequest())
      // export the point subset through the streaming writer directly
      val points = df.filter(
        org.apache.spark.sql.functions.udf((wkb: Array[Byte]) =>
          wkb != null &&
            GeomFunctions.readWkb(wkb).getGeometryType == "Point")
          .apply(col("geometry")))
      new java.io.File("/tmp/scratch_export.gpx").delete()
      GpxSink.writeStream(points, gpkgView.projection,
        "/tmp/scratch_export.gpx")(spark)
      val v = GeometryFileSource("/tmp/scratch_export.gpx")
      println(s"gpx reopened rows: ${v.frame(GeometryRequest()).count()} " +
        s"proj: ${v.projection}")
    }

    // ENVI raster path: write a 2-frame stack, reopen via the extension
    // dispatcher, pull a frame
    locally {
      import graft.raster._
      val mem = MemorySource(
        Seq(Array.tabulate(64)(_ * 1.0), Array.tabulate(64)(i => 63.0 - i)),
        8, 8, 255.0, "EPSG:28992", 1.0, 0.0, 8.0, 0L, Some(3600000L),
        "float64")
      val req = RasterRequest(Bbox(0, 0, 8, 8), "EPSG:28992", 8, 8,
        Some(java.time.Instant.ofEpochMilli(0)),
        Some(java.time.Instant.ofEpochMilli(3600000L)))
      new java.io.File("/tmp/scratch_envi").mkdirs()
      EnviSink(mem, "/tmp/scratch_envi/stack.dat").write(req)(spark)
      val src = RasterFileSource("/tmp/scratch_envi/stack.dat", 0L, 3600000L)
      val res = src.getData(req)(spark).get
      println(s"envi frames: ${res.values.size} " +
        s"first-cell: ${res.values.head.head} ${res.values(1).head}")
    }

    spark.stop()
  }
}
