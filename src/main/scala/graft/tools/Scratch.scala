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

    // round-6 formats through the to_file dispatcher: FlatGeobuf (packed
    // Hilbert R-tree + bbox pushdown), CSV-WKT, KML (reprojected to WGS84)
    for (ext <- Seq("fgb", "csv", "kml")) {
      val out = s"/tmp/scratch_export.$ext"
      new java.io.File(out).delete()
      GeometryToFile.toFile(gpkgView, out)
      val v = GeometryFileSource(out)
      println(s"$ext reopened rows: ${v.frame(GeometryRequest()).count()} " +
        s"proj: ${v.projection}")
    }

    spark.stop()
  }
}
