package graft

import java.nio.file.Files
import graft.raster._
import RasterFixtures._

class GeoTiffSpec extends SparkSpec {

  test("GeoTIFF codec round-trips values, georeferencing and nodata") {
    val dir = Files.createTempDirectory("graft_tiff").toString
    val vals = Array.tabulate(12)(_.toDouble)
    GeoTiff.write(s"$dir/a.tif", vals, 4, 3, Bbox(10, 20, 14, 23), 28992, -9999.0)
    val t = GeoTiff.read(s"$dir/a.tif")
    assert(t.values.toSeq == vals.toSeq)
    assert(t.w == 4 && t.h == 3)
    assert(t.bbox == Bbox(10, 20, 14, 23))
    assert(t.epsg == 28992 && t.noData == -9999.0)
  }

  test("GeoTiffSink exports frames + manifest; GeoTiffSource serves them back") {
    val dir = Files.createTempDirectory("graft_tiff_sink").toString
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000), "EPSG:28992",
      10, 10, Some(T0), Some(T0.plusMillis(3 * Hour)))
    val paths = GeoTiffSink(source, dir).write(req)
    assert(paths.size == 3)
    val back = GeoTiffSource(dir, T0.toEpochMilli, Hour)
    assert(back.projection == "EPSG:28992")
    assert(back.allTimes == source.allTimes)
    val res = back.getData(req).get
    // stored 255-sentinel cells come back as the float64 sentinel
    assert(res.values(0).forall(_ == 1.0))
    assert(res.values(2).forall(_ == back.noDataValue))
    // and the re-opened store composes with the operator DAG
    assert(Add(back, 1).getData(req).get.values(1).head == 8.0)
  }
}
