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
