package graft

import java.nio.file.Files
import graft.raster._

class GpkgTilesSpec extends SparkSpec {

  test("tile pyramid round-trips values, CRS, extent; sparse tiles skipped") {
    val dir = Files.createTempDirectory("graft_gpkgt").toString
    // 10×10 grid: NE quadrant (rows 0-4, cols 5-9) is ALL nodata → with
    // 5-px tiles that whole tile must not be stored
    val d = Array.tabulate(100) { i =>
      val r = i / 10; val c = i % 10
      if (r < 5 && c >= 5) 255.0 else (r * 10 + c).toDouble
    }
    val src = MemorySource(Seq(d), 10, 10, 255.0, "EPSG:28992", 0.5,
      135000, 456000, dtypeName = "uint8")
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000),
      "EPSG:28992", 10, 10, None, None)
    val path = GpkgRasterSink(src, s"$dir/t.gpkg", tileSize = 5).write(req)(spark)
    val back = GpkgRasterSource(path)
    assert(back.projection == "EPSG:28992")
    assert(back.cellSize.contains(0.5))
    assert(back.extent.contains(Bbox(135000, 455995, 135005, 456000)))
    assert(!back.temporal)
    val res = back.getData(req)(spark).get
    val g = res.values.head
    val nd = res.noDataValue
    assert(nd == 65535.0)
    for (r <- 0 until 10; c <- 0 until 10) {
      val want = if (r < 5 && c >= 5) nd else (r * 10 + c).toDouble
      assert(g(r * 10 + c) == want, s"($r,$c)")
    }
    // sparse: only 3 of 4 tiles stored
    val meta = GpkgTiles.readMeta(path)
    val tileTable = graft.geometry.Sqlite.master(path)
      .find(m => m.kind == "table" && m.name == meta.table).get
    assert(graft.geometry.Sqlite.scanTable(path, tileTable.rootPage).length == 3)
  }

  test("multi-frame requests fail loudly; value range is enforced") {
    val req = RasterFixtures.valsRequest
    val e = intercept[IllegalArgumentException] {
      GpkgRasterSink(RasterFixtures.source,
        Files.createTempDirectory("gt2").toString + "/x.gpkg").write(req)(spark)
    }
    assert(e.getMessage.contains("non-temporal"))
  }
}
