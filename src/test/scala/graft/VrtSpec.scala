package graft

import java.nio.file.{Files, Paths}
import graft.raster._

/** GDAL-style `.vrt` XML mosaic reading: hand-written descriptors over
  * real GeoTIFF tiles — offsets, relative paths, band→frame mapping,
  * tile-pruned windows, and loud rejection of the unsupported VRT
  * surface (ComplexSource, warped bands, rotation, resampling). */
class VrtSpec extends SparkSpec {

  private def writeTile(path: String, w: Int, h: Int, bbox: Bbox,
      f: (Int, Int) => Double, nd: Double = -9999.0): Unit =
    GeoTiff.write(path, Array.tabulate(w * h)(i => f(i % w, i / w)),
      w, h, bbox, 28992, nd, "float64")

  /** Two 4x4 tiles side by side on a 0.5-unit grid, mosaic 8x4. */
  private def buildMosaic(dir: String): String = {
    writeTile(s"$dir/left.tif", 4, 4, Bbox(0, 0, 2, 2),
      (x, y) => 10.0 * y + x)
    writeTile(s"$dir/right.tif", 4, 4, Bbox(2, 0, 4, 2),
      (x, y) => 100.0 + 10.0 * y + x)
    val vrt =
      s"""<VRTDataset rasterXSize="8" rasterYSize="4">
         |  <SRS>EPSG:28992</SRS>
         |  <GeoTransform> 0.0, 0.5, 0.0, 2.0, 0.0, -0.5 </GeoTransform>
         |  <VRTRasterBand dataType="Float64" band="1">
         |    <NoDataValue>-9999</NoDataValue>
         |    <ColorInterp>Gray</ColorInterp>
         |    <SimpleSource>
         |      <SourceFilename relativeToVRT="1">left.tif</SourceFilename>
         |      <SourceBand>1</SourceBand>
         |      <SrcRect xOff="0" yOff="0" xSize="4" ySize="4"/>
         |      <DstRect xOff="0" yOff="0" xSize="4" ySize="4"/>
         |    </SimpleSource>
         |    <SimpleSource>
         |      <SourceFilename relativeToVRT="1">right.tif</SourceFilename>
         |      <SourceBand>1</SourceBand>
         |      <SrcRect xOff="0" yOff="0" xSize="4" ySize="4"/>
         |      <DstRect xOff="4" yOff="0" xSize="4" ySize="4"/>
         |    </SimpleSource>
         |  </VRTRasterBand>
         |</VRTDataset>
         |""".stripMargin
    val p = s"$dir/mosaic.vrt"
    Files.writeString(Paths.get(p), vrt)
    p
  }

  test("two-tile mosaic reads through the dispatcher with exact values") {
    val dir = Files.createTempDirectory("graft_vrt").toString
    val p = buildMosaic(dir)
    val src = RasterFileSource(p)
    assert(src.isInstanceOf[VrtSource])
    assert(src.projection == "EPSG:28992")
    assert(src.cellSize.contains(0.5))
    assert(src.extent.contains(Bbox(0, 0, 4, 2)))
    val req = RasterRequest(Bbox(0, 0, 4, 2), "EPSG:28992", 8, 4, None, None)
    val vals = src.getData(req)(spark).get.values(0)
    for (y <- 0 until 4; x <- 0 until 8) {
      val want = if (x < 4) 10.0 * y + x else 100.0 + 10.0 * y + (x - 4)
      assert(vals(y * 8 + x) == want, s"($x,$y)=${vals(y * 8 + x)}")
    }
  }

  test("partial rects leave nodata gaps; source nodata maps through") {
    val dir = Files.createTempDirectory("graft_vrtg").toString
    writeTile(s"$dir/t.tif", 4, 4, Bbox(0, 0, 2, 2),
      (x, y) => if (x == 1 && y == 1) -9999.0 else 10.0 * y + x)
    // only the tile's interior 2x2 lands at dst (1,1); the border stays
    // VRT-nodata
    val vrt =
      s"""<VRTDataset rasterXSize="4" rasterYSize="4">
         |  <SRS>EPSG:28992</SRS>
         |  <GeoTransform>0, 0.5, 0, 2.0, 0, -0.5</GeoTransform>
         |  <VRTRasterBand dataType="Float64" band="1">
         |    <NoDataValue>-1</NoDataValue>
         |    <SimpleSource>
         |      <SourceFilename relativeToVRT="1">t.tif</SourceFilename>
         |      <SourceBand>1</SourceBand>
         |      <SrcRect xOff="1" yOff="1" xSize="2" ySize="2"/>
         |      <DstRect xOff="1" yOff="1" xSize="2" ySize="2"/>
         |    </SimpleSource>
         |  </VRTRasterBand>
         |</VRTDataset>""".stripMargin
    Files.writeString(Paths.get(s"$dir/m.vrt"), vrt)
    val m = Vrt.readMeta(s"$dir/m.vrt")
    val vals = Vrt.readBand(m, 0)
    for (y <- 0 until 4; x <- 0 until 4) {
      val inside = x >= 1 && x <= 2 && y >= 1 && y <= 2
      val want =
        if (!inside) -1.0
        else if (x == 1 && y == 1) -1.0 // source nodata -> vrt nodata
        else 10.0 * y + x
      assert(vals(y * 4 + x) == want, s"($x,$y)=${vals(y * 4 + x)}")
    }
  }

  test("multiple VRTRasterBands map onto the time axis") {
    val dir = Files.createTempDirectory("graft_vrtb").toString
    writeTile(s"$dir/a.tif", 2, 2, Bbox(0, 0, 1, 1), (x, y) => 1.0)
    writeTile(s"$dir/b.tif", 2, 2, Bbox(0, 0, 1, 1), (x, y) => 2.0)
    def band(n: Int, f: String) =
      s"""<VRTRasterBand dataType="Float64" band="$n">
         |  <NoDataValue>-9999</NoDataValue>
         |  <SimpleSource>
         |    <SourceFilename relativeToVRT="1">$f</SourceFilename>
         |    <SourceBand>1</SourceBand>
         |  </SimpleSource>
         |</VRTRasterBand>""".stripMargin
    Files.writeString(Paths.get(s"$dir/m.vrt"),
      s"""<VRTDataset rasterXSize="2" rasterYSize="2">
         |<SRS>EPSG:28992</SRS>
         |<GeoTransform>0, 0.5, 0, 1.0, 0, -0.5</GeoTransform>
         |${band(1, "a.tif")}
         |${band(2, "b.tif")}
         |</VRTDataset>""".stripMargin)
    val src = VrtSource(s"$dir/m.vrt", 0L, 3600000L)
    assert(src.temporal && src.allTimes.length == 2)
    val req = RasterRequest(Bbox(0, 0, 1, 1), "EPSG:28992", 2, 2,
      Some(java.time.Instant.ofEpochMilli(0)),
      Some(java.time.Instant.ofEpochMilli(3600000L)))
    val res = src.getData(req)(spark).get
    assert(res.values(0).forall(_ == 1.0) && res.values(1).forall(_ == 2.0))
  }

  test("windowed requests decode only the touched tiles (prune proof)") {
    val dir = Files.createTempDirectory("graft_vrtp").toString
    val p = buildMosaic(dir)
    val src0 = VrtSource(p)
    val leftReq = RasterRequest(Bbox(0, 0, 1.5, 2), "EPSG:28992", 3, 4,
      None, None)
    val before = src0.getData(leftReq)(spark).get.values(0)
    // clobber the RIGHT tile: a left-window request must never read it
    Files.write(Paths.get(s"$dir/right.tif"),
      Array.fill[Byte](64)(0x7F))
    val src = VrtSource(p)
    val after = src.getData(leftReq)(spark).get.values(0)
    assert(after.toSeq == before.toSeq)
    // and the clobber is real: touching the right half fails loudly
    intercept[Exception] {
      src.getData(RasterRequest(Bbox(2.5, 0, 4, 2), "EPSG:28992", 3, 4,
        None, None))(spark)
    }
  }

  test("unsupported VRT surface is rejected by name") {
    val dir = Files.createTempDirectory("graft_vrtf").toString
    writeTile(s"$dir/t.tif", 2, 2, Bbox(0, 0, 1, 1), (x, y) => 1.0)
    def vrtWith(body: String, gt: String = "0, 0.5, 0, 1.0, 0, -0.5") =
      s"""<VRTDataset rasterXSize="2" rasterYSize="2">
         |<SRS>EPSG:28992</SRS><GeoTransform>$gt</GeoTransform>
         |$body
         |</VRTDataset>""".stripMargin
    def expectFail(name: String, content: String, needle: String): Unit = {
      val f = s"$dir/$name.vrt"
      Files.writeString(Paths.get(f), content)
      val e = intercept[IllegalArgumentException] { Vrt.readMeta(f) }
      assert(e.getMessage.contains(needle), s"$name: ${e.getMessage}")
    }
    val simple =
      s"""<VRTRasterBand band="1"><SimpleSource>
         |<SourceFilename>$dir/t.tif</SourceFilename>
         |</SimpleSource></VRTRasterBand>""".stripMargin
    expectFail("complex", vrtWith(
      """<VRTRasterBand band="1"><ComplexSource>
        |<SourceFilename>x.tif</SourceFilename>
        |</ComplexSource></VRTRasterBand>""".stripMargin), "ComplexSource")
    expectFail("warped", vrtWith(
      """<VRTRasterBand band="1" subClass="VRTWarpedRasterBand"/>"""),
      "subClass")
    expectFail("rotated", vrtWith(simple, "0, 0.5, 0.1, 1.0, 0, -0.5"),
      "rotated")
    expectFail("resample", vrtWith(
      s"""<VRTRasterBand band="1"><SimpleSource>
         |<SourceFilename>$dir/t.tif</SourceFilename>
         |<SrcRect xOff="0" yOff="0" xSize="2" ySize="2"/>
         |<DstRect xOff="0" yOff="0" xSize="1" ySize="1"/>
         |</SimpleSource></VRTRasterBand>""".stripMargin), "resampling")
    // sub-pixel rects would be silently snapped by up to half a pixel
    expectFail("fractional", vrtWith(
      s"""<VRTRasterBand band="1"><SimpleSource>
         |<SourceFilename>$dir/t.tif</SourceFilename>
         |<SrcRect xOff="0.5" yOff="0" xSize="2" ySize="2"/>
         |<DstRect xOff="0.5" yOff="0" xSize="2" ySize="2"/>
         |</SimpleSource></VRTRasterBand>""".stripMargin), "fractional")
  }
}
