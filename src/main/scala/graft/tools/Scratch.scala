package graft.tools

import org.apache.spark.sql.SparkSession
import graft.raster._
import org.apache.spark.sql.functions.col

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

    val t0 = java.time.Instant.parse("2000-01-01T00:00:00Z")
    val src = MemorySource(
      data = Seq(Array.fill(100)(1.0), Array.fill(100)(7.0), Array.fill(100)(255.0)),
      gridW = 10, gridH = 10, noDataIn = 255,
      projection = "EPSG:28992", pixelSize = 0.5, originX = 135000, originY = 456000,
      timeFirstMs = t0.toEpochMilli, frameDeltaMs = Some(3600000L), dtypeName = "uint8")
    val req = RasterRequest(Bbox(135000, 455997, 135002, 456000), "EPSG:28992", 4, 6,
      Some(t0), Some(t0.plusSeconds(3 * 3600)))

    // drive the new misc/reduction/temporal operators through the public API:
    // classify the hourly source, group it with a shifted copy, aggregate to
    // a daily mean and accumulate — a realistic composed view
    val classified = Classify(src, Seq(2.0, 8.0))
    val grouped = Group(Seq(src, Shift(src, 3600000L * 3)))
    println("grouped times = " + grouped.allTimes.mkString(","))
    val dayMean = TemporalAggregate(grouped, Some("D"), "mean", timezone = "Europe/Amsterdam")
    val cum = Cumulative(src, "sum")
    println("classified -> " + classified.getData(req).get.values.map(_.head).mkString(","))
    println("dayMean(Ams) -> " + dayMean.getData(req.copy(
      start = Some(java.time.Instant.parse("1999-12-31T23:00:00Z")),
      stop = Some(java.time.Instant.parse("2000-01-02T23:00:00Z"))))
      .map(r => r.times.mkString(",") + " vals " + r.values.map(_.head).mkString(",")))
    println("cumulative -> " + cum.getData(req).get.values.map(_.head).mkString(","))
    println("snap/resample -> " + Resample(src, "h").getData(req).get.values.map(_.head).mkString(","))

    // geometry + zonal stats through the public API
    {
      import graft.geometry._
      val feats = TableGeometrySource("/root/testdata/sf0.001/part.parquet",
        "p_partkey", Seq("p_size", "p_retailprice"),
        geomWktExpr = Some("concat('POLYGON ((', 135000 + p_partkey % 10, ' ', 455990 + cast(p_partkey / 10 as int), ', ', 135000 + p_partkey % 10 + 1, ' ', 455990 + cast(p_partkey / 10 as int), ', ', 135000 + p_partkey % 10 + 1, ' ', 455990 + cast(p_partkey / 10 as int) + 1, ', ', 135000 + p_partkey % 10, ' ', 455990 + cast(p_partkey / 10 as int) + 1, ', ', 135000 + p_partkey % 10, ' ', 455990 + cast(p_partkey / 10 as int), '))')"))
      val withArea = feats.set("area", Area(feats, "EPSG:28992"))
      val priced = withArea.set("price_bucket",
        FieldOps.Classify(feats.getSeries("p_retailprice"), Seq(1000.0), Seq("cheap", "pricey")))
      val zonal = AggregateRaster(priced, src, "mean", pixelSize = Some(0.5))
      val out = zonal.frame(GeometryRequest(start = Some(t0)))
      out.filter(col("fid").between(50, 54)).select("fid", "area", "price_bucket", "agg").show(5, false)
      println("zonal rows = " + out.count())
    }

    // sinks + serde through the public API
    {
      val out = java.nio.file.Files.createTempDirectory("scratch_sink").toString
      RasterToFile.toFile(Smooth(src, 1.0), out)
      val reopened = RasterParquetSource(out)
      println("sink roundtrip -> times=" + reopened.allTimes.size +
        " first=" + reopened.getData(RasterRequest(reopened.extent.get,
          "EPSG:28992", 10, 10, Some(t0), Some(t0.plusSeconds(3 * 3600))))
          .get.values(0).take(3).mkString(","))
      val view2 = graft.core.BlockRegistry.fromJson(
        Group(Seq(src, Shift(src, 7200000L))).toJson)
      println("serde roundtrip -> " + view2.getClass.getSimpleName +
        " times=" + view2.asInstanceOf[RasterBlock].allTimes.size)
      println("stencil -> " + Dilate(Classify(src, Seq(2.0)), Seq(1.0))
        .getData(req).get.values(0).take(4).mkString(","))
    }

    // operator-overloaded DAG + geojson round trip
    locally {
      import graft.geometry._
      val masked = Clip(src, (src > 0.5) & (src < 100.0))
      println("overloaded ops -> " + masked.getData(req).get.values.map(_.head).mkString(","))
      val gj = java.nio.file.Files.createTempDirectory("scratch_gj").toString
      GeometryFileSink(TableGeometrySource("/root/testdata/sf0.001/region.parquet",
        "r_regionkey", Seq("r_name"),
        geomWktExpr = Some("concat('POLYGON ((', r_regionkey, ' 0, ', r_regionkey + 1, ' 0, ', r_regionkey + 1, ' 1, ', r_regionkey, ' 1, ', r_regionkey, ' 0))')")),
        gj, format = "geojson").write(GeometryRequest())
      println("geojson roundtrip -> " +
        GeoJsonSource(gj).frame(GeometryRequest()).count() + " features")
    }

    // request modes + temporal zonal series
    locally {
      import graft.geometry._
      println("meta mode -> " + Smooth(src, 1.0).getMeta(req))
      val metaSrc = src.copy(metadata = Seq("m0", "m1", "m2"))
      println("meta via Snap -> " +
        Snap(metaSrc, Shift(metaSrc, 1800000L)).getMeta(req))
      val feats = TableGeometrySource("/root/testdata/sf0.001/region.parquet",
        "r_regionkey", Seq("r_name"), geomWktExpr = Some(
          "concat('POLYGON ((', 135000 + r_regionkey, ' 455999, ', 135001 + r_regionkey, " +
            "' 455999, ', 135001 + r_regionkey, ' 456000, ', 135000 + r_regionkey, " +
            "' 456000, ', 135000 + r_regionkey, ' 455999))')"))
      println("extent mode -> " + feats.getExtent(GeometryRequest()))
      val zonal = AggregateRaster(feats, src, "sum", pixelSize = Some(0.5))
      println("temporal zonal series -> " + zonal.frame(GeometryRequest(
        start = Some(t0), stop = Some(t0.plusSeconds(3 * 3600))))
        .select("agg").head().getSeq[Double](0))
    }

    // GeoTIFF export + re-open through the public API
    locally {
      val out = java.nio.file.Files.createTempDirectory("scratch_tif").toString
      val paths = GeoTiffSink(Multiply(src, 3), out).write(RasterRequest(
        Bbox(135000, 455995, 135005, 456000), "EPSG:28992", 10, 10,
        Some(t0), Some(t0.plusSeconds(3 * 3600))))
      println("geotiff files -> " + paths.size + " first bytes: " +
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(paths.head))
          .take(4).map(b => f"$b%02x").mkString(" "))
      val back = GeoTiffSource(out, t0.toEpochMilli, 3600000L)
      println("geotiff reopen -> " + back.getData(RasterRequest(
        back.extent.get, "EPSG:28992", 10, 10, Some(t0), Some(t0.plusSeconds(7200))))
        .get.values.map(_.head).mkString(","))
    }

    val view = Divide(Add(src, src), 4)   // (x + x) / 4
    println("dtype=" + view.dtype.name + " noData=" + view.noDataValue)
    val res = view.getData(req).get
    res.times.zip(res.values).foreach { case (t, arr) =>
      println(s"$t -> " + arr.take(6).mkString(",") + s" ... (${arr.length} cells)")
    }
    println("JSON view: " + view.toJson.take(400))
    // probe: out-of-period request
    println("out-of-period -> " + view.getData(req.copy(
      start = Some(java.time.Instant.parse("2001-01-01T00:00:00Z")),
      stop = Some(java.time.Instant.parse("2001-01-02T00:00:00Z")))))
    // reprojection: request the RD raster in WGS84 over its footprint
    locally {
      val (lon1, lat1) = Proj.rdToWgs84(135000, 455995)
      val (lon2, lat2) = Proj.rdToWgs84(135005, 456000)
      val wgs = src.getData(RasterRequest(Bbox(lon1, lat1, lon2, lat2),
        "EPSG:4326", 6, 6, Some(t0), Some(t0))).get
      println("reprojection -> " + wgs.values(0).mkString(","))
      // probe: unsupported CRS still raises cleanly
      try { src.getData(req.copy(projection = "EPSG:32632")) }
      catch { case e: Exception => println("unsupported-crs probe -> " + e.getMessage) }
    }
    spark.stop()
  }
}
