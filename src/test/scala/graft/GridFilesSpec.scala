package graft

import java.nio.file.{Files, Paths}
import java.time.Instant
import graft.raster._

class GridFilesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val ND = Double.MaxValue

  // ------------------------------------------------------------ ASCII grid

  test("ASCII grid round-trips values, georeferencing, nodata and CRS") {
    val dir = tmp("graft_asc")
    val vals = Array(1.5, 2.25, -3.0, ND, 0.125, 1e-17)
    AsciiGrid.write(s"$dir/a.asc", vals, 3, 2, Bbox(10, 20, 13, 22), ND,
      "EPSG:28992", "float64")
    assert(Files.exists(Paths.get(s"$dir/a.prj")), ".prj sidecar written")
    val g = AsciiGrid.read(s"$dir/a.asc")
    assert(g.values.toSeq == vals.toSeq) // Double.toString is exact
    assert(g.w == 3 && g.h == 2 && g.cellSize == 1.0)
    assert(g.originX == 10.0 && g.originY == 22.0)
    assert(g.noData == ND && g.dtypeName == "float64")
    assert(Proj.normalize(g.projection) == "EPSG:28992")
  }

  test("ASCII grid xllcenter/dx-dy variants parse; integral grids infer int32") {
    val dir = tmp("graft_asc_var")
    // GDAL's dx/dy extension + center-anchored origin, integer values
    Files.writeString(Paths.get(s"$dir/c.asc"),
      """ncols 2
        |nrows 2
        |xllcenter 100.5
        |yllcenter 200.5
        |dx 1.0
        |dy 1.0
        |NODATA_value -9999
        |1 2
        |-9999 4
        |""".stripMargin)
    val g = AsciiGrid.read(s"$dir/c.asc", projectionArg = "EPSG:28992")
    assert(g.w == 2 && g.h == 2 && g.cellSize == 1.0)
    assert(g.originX == 100.0 && g.originY == 202.0) // corner-anchored
    assert(g.dtypeName == "int32" && g.noData == -9999.0)
    assert(g.values.toSeq == Seq(1.0, 2.0, -9999.0, 4.0))
    // non-square dx/dy fails loudly
    Files.writeString(Paths.get(s"$dir/bad.asc"),
      "ncols 1\nnrows 1\nxllcorner 0\nyllcorner 0\ndx 1\ndy 2\n5\n")
    intercept[IllegalArgumentException] {
      AsciiGrid.read(s"$dir/bad.asc", projectionArg = "EPSG:28992")
    }
    // wrong value count fails loudly
    Files.writeString(Paths.get(s"$dir/short.asc"),
      "ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2 3\n")
    intercept[IllegalArgumentException] {
      AsciiGrid.read(s"$dir/short.asc", projectionArg = "EPSG:28992")
    }
  }

  test("ASCII grid without .prj or projection argument fails loudly") {
    val dir = tmp("graft_asc_noprj")
    Files.writeString(Paths.get(s"$dir/n.asc"),
      "ncols 1\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\n5\n")
    intercept[IllegalArgumentException] { AsciiGrid.read(s"$dir/n.asc") }
  }

  test("a state-plane .prj sidecar georeferences an ASCII grid cross-CRS") {
    // the parameterized-CRS path: an ESRI LCC .prj whose parameters match
    // no hub EPSG code still resolves (PARAM code) and serves a WGS84
    // request through the warp
    val caZone5 =
      """PROJCS["NAD_1983_StatePlane_California_V_FIPS_0405_Feet",
        |GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",
        |SPHEROID["GRS_1980",6378137.0,298.257222101]],
        |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],
        |PROJECTION["Lambert_Conformal_Conic"],
        |PARAMETER["False_Easting",6561666.666666666],
        |PARAMETER["False_Northing",1640416.666666667],
        |PARAMETER["Central_Meridian",-118.0],
        |PARAMETER["Standard_Parallel_1",34.03333333333333],
        |PARAMETER["Standard_Parallel_2",35.46666666666667],
        |PARAMETER["Latitude_Of_Origin",33.5],
        |UNIT["Foot_US",0.3048006096012192]]""".stripMargin.replaceAll("\n", "")
    val dir = tmp("graft_asc_sp")
    Files.writeString(Paths.get(s"$dir/sp.asc"),
      "ncols 2\nnrows 2\nxllcorner 6500000\nyllcorner 1600000\ncellsize 100000\n1 2\n3 4\n")
    Files.writeString(Paths.get(s"$dir/sp.prj"), caZone5)
    val src = AsciiGridSource(s"$dir/sp.asc")
    assert(src.projection.startsWith("PARAM:LCC:"))
    // a WGS84 request over LA must see data (the grid covers ~LA county)
    val req = RasterRequest(Bbox(-119.0, 33.5, -117.5, 34.8), "EPSG:4326", 8, 8,
      Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(0)))
    val res = src.getData(req)(spark).get
    assert(res.values.head.exists(v => v != res.noDataValue))
  }

  // ------------------------------------------------------------------ XYZ

  test("XYZ round-trips values and grid inference; accepts shuffled/comma lines") {
    val dir = tmp("graft_xyz")
    val vals = Array(1.0, 2.5, 3.0, 4.25, -5.0, 6.5)
    Xyz.write(s"$dir/a.xyz", vals, 3, 2, Bbox(100, 200, 130, 220),
      "EPSG:28992", "float64")
    val g = Xyz.read(s"$dir/a.xyz")
    assert(g.values.toSeq == vals.toSeq)
    assert(g.w == 3 && g.h == 2 && g.cellSize == 10.0)
    assert(g.originX == 100.0 && g.originY == 220.0)
    assert(Proj.normalize(g.projection) == "EPSG:28992")

    // shuffled line order + comma separators + header line (GDAL accepts)
    val lines = Files.readString(Paths.get(s"$dir/a.xyz")).trim.split("\n")
    val shuffled = new scala.util.Random(7).shuffle(lines.toSeq)
      .map(_.replaceAll(" ", ","))
    Files.writeString(Paths.get(s"$dir/b.xyz"),
      "x,y,z\n" + shuffled.mkString("\n") + "\n")
    Files.copy(Paths.get(s"$dir/a.prj"), Paths.get(s"$dir/b.prj"))
    val g2 = Xyz.read(s"$dir/b.xyz")
    assert(g2.values.toSeq == vals.toSeq && g2.cellSize == 10.0)
  }

  test("XYZ rejects incomplete, duplicate and non-uniform grids") {
    val dir = tmp("graft_xyz_bad")
    // missing one cell of the 2x2
    Files.writeString(Paths.get(s"$dir/m.xyz"),
      "0.5 0.5 1\n1.5 0.5 2\n0.5 1.5 3\n")
    intercept[IllegalArgumentException] {
      Xyz.read(s"$dir/m.xyz", projectionArg = "EPSG:28992")
    }
    // duplicate cell
    Files.writeString(Paths.get(s"$dir/d.xyz"),
      "0.5 0.5 1\n0.5 0.5 2\n1.5 0.5 3\n1.5 1.5 4\n")
    intercept[IllegalArgumentException] {
      Xyz.read(s"$dir/d.xyz", projectionArg = "EPSG:28992")
    }
    // non-uniform x spacing
    Files.writeString(Paths.get(s"$dir/u.xyz"),
      "0.5 0.5 1\n1.5 0.5 2\n4.0 0.5 3\n")
    intercept[IllegalArgumentException] {
      Xyz.read(s"$dir/u.xyz", projectionArg = "EPSG:28992")
    }
  }

  // ------------------------------------------------------- PNG + world file

  test("PNG world-file round-trips 8- and 16-bit grayscale") {
    val dir = tmp("graft_png")
    val vals8 = Array.tabulate(12)(i => (i * 20 % 256).toDouble)
    PngWorld.write(s"$dir/a.png", vals8, 4, 3, Bbox(10, 20, 14, 23),
      "EPSG:28992", bits = 8)
    assert(Files.exists(Paths.get(s"$dir/a.pgw")) &&
      Files.exists(Paths.get(s"$dir/a.prj")))
    val g8 = PngWorld.read(s"$dir/a.png")
    assert(g8.values.toSeq == vals8.toSeq)
    assert(g8.w == 4 && g8.h == 3 && g8.cellSize == 1.0)
    assert(g8.originX == 10.0 && g8.originY == 23.0)
    assert(g8.dtypeName == "uint8")
    assert(Proj.normalize(g8.projection) == "EPSG:28992")

    val vals16 = Array.tabulate(12)(i => (i * 4999 % 65536).toDouble)
    PngWorld.write(s"$dir/b.png", vals16, 4, 3, Bbox(0, 0, 8, 6),
      "EPSG:3857", bits = 16)
    val g16 = PngWorld.read(s"$dir/b.png")
    assert(g16.values.toSeq == vals16.toSeq)
    assert(g16.dtypeName == "uint16" && g16.cellSize == 2.0)
  }

  test("PNG rejects RGB/palette files, missing world files, rotation") {
    val dir = tmp("graft_png_bad")
    // RGB image → not a single-band raster
    val rgb = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(rgb, "png", new java.io.File(s"$dir/rgb.png"))
    Files.writeString(Paths.get(s"$dir/rgb.pgw"), "1\n0\n0\n-1\n0.5\n1.5\n")
    intercept[IllegalArgumentException] {
      PngWorld.read(s"$dir/rgb.png", projectionArg = "EPSG:28992")
    }
    // valid gray png but no world file
    val gray = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    javax.imageio.ImageIO.write(gray, "png", new java.io.File(s"$dir/g.png"))
    intercept[IllegalArgumentException] {
      PngWorld.read(s"$dir/g.png", projectionArg = "EPSG:28992")
    }
    // rotated world file
    Files.writeString(Paths.get(s"$dir/g.pgw"), "1\n0.1\n0\n-1\n0.5\n1.5\n")
    intercept[IllegalArgumentException] {
      PngWorld.read(s"$dir/g.png", projectionArg = "EPSG:28992")
    }
    // out-of-range value on write
    intercept[IllegalArgumentException] {
      PngWorld.write(s"$dir/o.png", Array(300.0), 1, 1, Bbox(0, 0, 1, 1),
        "EPSG:28992", bits = 8)
    }
  }

  // ------------------------------------------------- sources, sinks, dispatch

  test("grid-file sinks export frames + manifest; sources read them back") {
    // FOUR frames: lexicographic file order would put frame_10800000
    // before frame_3600000 — the numeric-aware sort must not
    val vals = Seq(
      Array(1.0, 2.0, 3.0, ND, 5.0, 6.0),
      Array(10.0, 20.0, 30.0, 40.0, ND, 60.0),
      Array(7.0, 8.0, 9.0, 10.0, 11.0, 12.0),
      Array(-1.0, -2.0, -3.0, -4.0, -5.0, ND))
    val src = MemorySource(vals, 3, 2, ND, "EPSG:28992", 1.0, 100.0, 202.0,
      0L, Some(3600000L), "float64")
    val req = RasterRequest(Bbox(100, 200, 103, 202), "EPSG:28992", 3, 2,
      Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(3 * 3600000L)))

    val ascDir = tmp("graft_sink_asc")
    val ascPaths = AsciiGridSink(src, ascDir).write(req)(spark)
    assert(ascPaths.size == 4 && Files.exists(Paths.get(ascDir, "manifest.json")))
    val ascBack = AsciiGridSource(ascDir, 0L, 3600000L)
    assert(ascBack.allTimes.size == 4 && ascBack.temporal)
    val ascRes = ascBack.getData(req)(spark).get
    assert(ascRes.values.map(_.toSeq).toSeq == vals.map(_.toSeq))

    val xyzDir = tmp("graft_sink_xyz")
    XyzSink(src, xyzDir).write(req)(spark)
    val xyzBack = XyzSource(xyzDir, 0L, 3600000L, noDataArg = ND)
    val xyzRes = xyzBack.getData(req)(spark).get
    assert(xyzRes.values.map(_.toSeq).toSeq == vals.map(_.toSeq))

    // PNG is uint8: use in-range values (sentinel 255 handled via noDataArg)
    val vals8 = Seq(Array(1.0, 2.0, 3.0, 255.0, 5.0, 6.0))
    val src8 = MemorySource(vals8, 3, 2, 255.0, "EPSG:28992", 1.0, 100.0, 202.0,
      0L, None, "uint8")
    val req8 = RasterRequest(Bbox(100, 200, 103, 202), "EPSG:28992", 3, 2,
      Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(0)))
    val pngDir = tmp("graft_sink_png")
    PngSink(src8, pngDir).write(req8)(spark)
    val pngBack = PngSource(pngDir, noDataArg = 255.0)
    val pngRes = pngBack.getData(req8)(spark).get
    assert(pngRes.values.head.toSeq == vals8.head.toSeq)
    assert(pngBack.dtype.name == "uint8")
  }

  test("RasterFileSource dispatches by extension (file and directory)") {
    val dir = tmp("graft_dispatch")
    AsciiGrid.write(s"$dir/a.asc", Array(5.0), 1, 1, Bbox(0, 0, 1, 1),
      -1.0, "EPSG:28992")
    assert(RasterFileSource(s"$dir/a.asc").isInstanceOf[AsciiGridSource])
    assert(RasterFileSource(dir).isInstanceOf[AsciiGridSource])
    Xyz.write(s"$dir/b.xyz", Array(5.0, 1.0, 2.0, 3.0), 2, 2, Bbox(0, 0, 2, 2),
      "EPSG:28992")
    assert(RasterFileSource(s"$dir/b.xyz").isInstanceOf[XyzSource])
    PngWorld.write(s"$dir/c.png", Array(5.0), 1, 1, Bbox(0, 0, 1, 1),
      "EPSG:28992")
    assert(RasterFileSource(s"$dir/c.png").isInstanceOf[PngSource])
    val tifDir = tmp("graft_dispatch_tif")
    GeoTiff.write(s"$tifDir/d.tif", Array(5.0), 1, 1, Bbox(0, 0, 1, 1),
      28992, -1.0)
    assert(RasterFileSource(s"$tifDir/d.tif").isInstanceOf[GeoTiffSource])
    intercept[IllegalArgumentException] { RasterFileSource(s"$dir/e.txt") }
  }

  test("grid-file sources serve a resampled cross-grid request via the warp") {
    val dir = tmp("graft_warp_asc")
    // 4x4 checkerboard at cell 1; request 2x2 at cell 2 → NN picks the
    // source pixel containing each output center (odd row/col)
    val vals = Array.tabulate(16)(i => ((i % 4 + i / 4) % 2).toDouble)
    AsciiGrid.write(s"$dir/w.asc", vals, 4, 4, Bbox(0, 0, 4, 4), -1.0,
      "EPSG:28992")
    val req = RasterRequest(Bbox(0, 0, 4, 4), "EPSG:28992", 2, 2,
      Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(0)))
    val res = AsciiGridSource(s"$dir/w.asc").getData(req)(spark).get
    // output centers at world (1,3),(3,3),(1,1),(3,1) → source rows
    // floor((4-3)/1)=1 and floor((4-1)/1)=3, cols 1 and 3
    assert(res.values.head.toSeq == Seq(
      vals(1 * 4 + 1), vals(1 * 4 + 3), vals(3 * 4 + 1), vals(3 * 4 + 3)))
  }

  // ------------------------------------------------------------ ENVI

  test("ENVI round-trips a multiband stack bit-exactly (bands = frames)") {
    val dir = tmp("graft_envi")
    val b0 = Array(1.5, -2.25, 3.0, ND, 5.0, 1e-17)
    val b1 = Array(0.0, 7.5, -8.0, 9.0, ND, 11.0)
    Envi.write(s"$dir/stack.dat", Seq(b0, b1), 3, 2, Bbox(10, 20, 13, 22),
      ND, "EPSG:28992", "float64")
    assert(Files.exists(Paths.get(s"$dir/stack.hdr")))
    val (h, bands) = Envi.readBands(s"$dir/stack.dat")
    assert(h.samples == 3 && h.lines == 2 && h.bands == 2)
    assert(h.cellSize == 1.0 && h.originX == 10.0 && h.originY == 22.0)
    assert(h.noData == ND && h.dtype == DType.F8)
    assert(Proj.normalize(h.projection) == "EPSG:28992")
    assert(bands(0).toSeq == b0.toSeq && bands(1).toSeq == b1.toSeq)
    // the .hdr path and the data path open the same stack
    assert(Envi.readBands(s"$dir/stack.hdr")._2(1).toSeq == b1.toSeq)
    // source: band i = frame i on the synthetic time axis
    val src = EnviSource(s"$dir/stack.dat", 0L, 3600000L)
    assert(src.temporal && src.allTimes.size == 2 &&
      src.allTimes(1) == Instant.ofEpochMilli(3600000L))
    val req = RasterRequest(Bbox(10, 20, 13, 22), "EPSG:28992", 3, 2,
      Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(3600000L)))
    val res = src.getData(req)(spark).get
    assert(res.values(0).toSeq == b0.toSeq && res.values(1).toSeq == b1.toSeq)
  }

  test("ENVI reads bil/bip interleaves, big endian, uint8 and ref-pixel offsets") {
    val dir = tmp("graft_envi_var")
    // 2x2, 2 bands; band values chosen to detect any interleave mix-up
    val flat = Array[Byte](1, 2, 3, 4, 11, 12, 13, 14) // bsq order
    def hdr(interleave: String, dt: Int, bo: Int, mapRef: String) =
      s"""ENVI
         |samples = 2
         |lines = 2
         |bands = 2
         |header offset = 0
         |data type = $dt
         |interleave = $interleave
         |byte order = $bo
         |map info = {Arbitrary, $mapRef, 1.0, 1.0, units=Meters}
         |""".stripMargin
    // bil: line0 = b0row0, b1row0 → 1 2 11 12 3 4 13 14
    Files.write(Paths.get(s"$dir/a.dat"),
      Array[Byte](1, 2, 11, 12, 3, 4, 13, 14))
    Files.writeString(Paths.get(s"$dir/a.hdr"), hdr("bil", 1, 0, "1, 1, 0.0, 2.0"))
    val (_, bil) = Envi.readBands(s"$dir/a.dat", "EPSG:28992")
    assert(bil(0).toSeq == Seq(1.0, 2.0, 3.0, 4.0) &&
      bil(1).toSeq == Seq(11.0, 12.0, 13.0, 14.0))
    // bip: per pixel all bands → 1 11 2 12 3 13 4 14
    Files.write(Paths.get(s"$dir/b.dat"),
      Array[Byte](1, 11, 2, 12, 3, 13, 4, 14))
    Files.writeString(Paths.get(s"$dir/b.hdr"), hdr("bip", 1, 0, "1, 1, 0.0, 2.0"))
    val (_, bip) = Envi.readBands(s"$dir/b.dat", "EPSG:28992")
    assert(bip(0).toSeq == Seq(1.0, 2.0, 3.0, 4.0) &&
      bip(1).toSeq == Seq(11.0, 12.0, 13.0, 14.0))
    // big-endian int16 bsq
    val be = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    Seq(256, -2, 3, 4, 11, 12, 13, 14).foreach(v => be.putShort(v.toShort))
    Files.write(Paths.get(s"$dir/c.dat"), be.array())
    Files.writeString(Paths.get(s"$dir/c.hdr"), hdr("bsq", 2, 1, "1, 1, 0.0, 2.0"))
    val (ch, cb) = Envi.readBands(s"$dir/c.dat", "EPSG:28992")
    assert(ch.dtype == DType.I2 && cb(0).toSeq == Seq(256.0, -2.0, 3.0, 4.0))
    // fractional/offset reference pixel: tie at pixel (2, 3)'s UL corner
    Files.write(Paths.get(s"$dir/d.dat"), flat.take(4))
    Files.writeString(Paths.get(s"$dir/d.hdr"),
      hdr("bsq", 1, 0, "2, 3, 100.0, 50.0").replace("bands = 2", "bands = 1"))
    val dh = Envi.readHeader(s"$dir/d.dat", "EPSG:28992")
    assert(dh.originX == 99.0 && dh.originY == 52.0)
    // undersized data file fails loudly
    Files.write(Paths.get(s"$dir/e.dat"), Array[Byte](1, 2, 3))
    Files.writeString(Paths.get(s"$dir/e.hdr"), hdr("bsq", 1, 0, "1, 1, 0.0, 2.0"))
    intercept[IllegalArgumentException] { Envi.readBands(s"$dir/e.dat", "EPSG:28992") }
    // unknown data type fails loudly
    Files.writeString(Paths.get(s"$dir/f.hdr"), hdr("bsq", 6, 0, "1, 1, 0.0, 2.0"))
    Files.write(Paths.get(s"$dir/f.dat"), flat)
    intercept[IllegalArgumentException] { Envi.readHeader(s"$dir/f.dat", "EPSG:28992") }
  }

  test("ENVI dispatches through RasterFileSource and the JSON view dialect") {
    val dir = tmp("graft_envi_disp")
    Envi.write(s"$dir/one.dat", Seq(Array(5.0)), 1, 1, Bbox(0, 0, 1, 1),
      -1.0, "EPSG:28992")
    assert(RasterFileSource(s"$dir/one.dat").isInstanceOf[EnviSource])
    assert(RasterFileSource(s"$dir/one.hdr").isInstanceOf[EnviSource])
    val src = Multiply(EnviSource(s"$dir/one.dat"), 2.0)
    val back = graft.core.BlockRegistry.fromJson(src.toJson)
    assert(back == src)
  }

  test("grid-file sources register in the JSON view dialect") {
    val dir = tmp("graft_view_asc")
    AsciiGrid.write(s"$dir/v.asc", Array(5.0), 1, 1, Bbox(0, 0, 1, 1),
      -1.0, "EPSG:28992")
    val src = Multiply(AsciiGridSource(s"$dir/v.asc"), 2.0)
    val json = src.toJson
    val back = graft.core.BlockRegistry.fromJson(json)
    assert(back == src)
  }
}
