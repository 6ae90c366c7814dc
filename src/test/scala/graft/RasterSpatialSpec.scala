package graft

import graft.raster._
import graft.geometry.GeometryRequest
import RasterFixtures._

class RasterSpatialSpec extends SparkSpec {

  /** 10×10 uint8 source with a single 7 at (row 4, col 4), rest 1. */
  private val spot: MemorySource = {
    val d = Array.fill(100)(1.0); d(4 * 10 + 4) = 7.0
    source.copy(data = Seq(d))
  }
  private val fullReq = RasterRequest(
    Bbox(135000, 455995, 135005, 456000), "EPSG:28992", 10, 10,
    Some(T0), Some(T0.plusMillis(3 * Hour)))

  private def grid(r: RasterResult): Array[Double] = r.values(0)

  test("Dilate grows marked values by one cell incl. diagonals") {
    val res = Dilate(spot, Seq(7.0)).getData(fullReq).get
    val g = grid(res)
    for (y <- 3 to 5; x <- 3 to 5) assert(g(y * 10 + x) == 7.0, s"($x,$y)")
    assert(g(2 * 10 + 4) == 1.0 && g(6 * 10 + 4) == 1.0)
    assert(g.count(_ == 7.0) == 9)
  }

  test("Dilate works across tile boundaries (halo exchange)") {
    val w = 300
    val d = Array.fill(w * 4)(1.0)
    d(1 * w + 255) = 7.0 // one px left of the 256-tile boundary
    val wide = MemorySource(Seq(d), w, 4, 255, "EPSG:28992", 0.5, 135000, 456000,
      T0.toEpochMilli, Some(Hour), "uint8")
    val req = RasterRequest(Bbox(135000, 455998, 135000 + w * 0.5, 456000),
      "EPSG:28992", w, 4, Some(T0), Some(T0))
    val g = Dilate(wide, Seq(7.0)).getData(req).get.values(0)
    for (y <- 0 to 2; x <- 254 to 256) assert(g(y * w + x) == 7.0, s"($x,$y)")
    assert(g(0 * w + 253) == 1.0 && g(0 * w + 257) == 1.0)
  }

  test("MovingMax applies a circular max filter skipping nodata") {
    val res = MovingMax(spot, 3).getData(fullReq).get
    val g = grid(res)
    // 3x3 footprint (diagonals included since 2 < 2.25)
    for (y <- 3 to 5; x <- 3 to 5) assert(g(y * 10 + x) == 7.0)
    assert(g(0) == 1.0)
    // all-nodata frame stays nodata
    val ndRes = MovingMax(nodataSource, 3).getData(fullReq).get
    assert(ndRes.values(0).forall(_ == 255.0))
  }

  test("Smooth preserves a constant field and spreads a spot") {
    val const = source.copy(data = Seq(Array.fill(100)(5.0)))
    val g = Smooth(const, 1.0).getData(fullReq).get.values(0)
    // interior cells stay ≈5 (boundary pulled toward fill=0)
    assert(math.abs(g(5 * 10 + 5) - 5.0) < 0.2)
    val gs = Smooth(spot, 1.0).getData(fullReq).get.values(0)
    assert(gs(4 * 10 + 4) < 7.0 && gs(4 * 10 + 4) > 1.0)
    assert(gs(4 * 10 + 6) > 1.0) // energy spread sideways
  }

  test("HillShade of a flat surface gives uniform shading") {
    val flat = source.copy(data = Seq(Array.fill(100)(3.0)))
    val g = HillShade(flat, altitude = 45, azimuth = 315).getData(fullReq).get.values(0)
    // flat → cang = sin(45°) → 255 * 0.7071 → 180 (uint8 truncation)
    assert(g(5 * 10 + 5) == 180.0)
    val hs = HillShade(flat)
    assert(hs.dtype == DType.U1 && hs.noDataValue == 256.0)
  }

  test("Place stamps the source at coordinates and merges with statistic") {
    // anchor at source center; stamp at two spots inside the request
    val placed = Place(spot, "EPSG:28992", (135002.5, 455997.5),
      Seq((135001.0, 455999.0), (135004.0, 455996.0)))
    val res = placed.getData(fullReq).get
    val g = grid(res)
    // the 7-spot sits at offset (-0.3, +0.3) from the anchor: near each
    // coordinate there must be a 7
    assert(g.count(_ == 7.0) == 2)
    assert(placed.extent.isDefined)
  }

  test("Place warp completes 1e5 coordinates via the distributed mapping build") {
    // the tile-mapping relation (output tile → source tiles) is built as a
    // Spark job; 1e5 placements would have looped 1e5 × outputTiles times
    // on the driver under the old build. All placements at the anchor →
    // zero shift → every in-extent pixel samples data in every placement,
    // so "count" must be exactly n everywhere.
    val n = 100000
    val placed = Place(spot, "EPSG:28992", (135002.5, 455997.5),
      Seq.fill(n)((135002.5, 455997.5)), "count", Some("warp"))
    val g = grid(placed.getData(fullReq).get)
    assert(g.length == 100 && g.forall(_ == n.toDouble))
  }

  test("RasterizeWKT burns a boolean mask with the cell-center rule") {
    val wkt = "POLYGON ((135001 455997, 135003 455997, 135003 455999, 135001 455999, 135001 455997))"
    val r = RasterizeWKT(wkt, "EPSG:28992")
    assert(r.dtype == DType.Bool)
    val g = r.getData(fullReq.copy(start = None, stop = None)).get.values(0)
    // cells with center inside [135001,135003]×[455997,455999]: 4×4 block
    assert(g.count(_ == 1.0) == 16)
    assert(g(4 * 10 + 2) == 1.0 && g(0) == 0.0)
  }

  test("Rasterize burns features, last feature wins") {
    val feats = SeqGeometrySource(Seq(
      (1L, GeometryFixtures.square(135000, 455995, 135005, 456000), 10.0, "low"),
      (2L, GeometryFixtures.square(135001, 455997, 135003, 455999), 20.0, "high")))
    val r = Rasterize(feats, columnName = Some("value"), dtypeName = "float64")
    val g = r.getData(fullReq.copy(start = None, stop = None)).get.values(0)
    assert(g(4 * 10 + 4) == 20.0) // overlapping: higher fid wins
    assert(g(0) == 10.0)
    val mask = Rasterize(feats)
    assert(mask.dtype == DType.Bool)
    val gm = mask.getData(fullReq.copy(start = None, stop = None)).get.values(0)
    assert(gm.forall(_ == 1.0))
  }

  test("Slope and Aspect match the hand-derived plane gradients") {
    // plane z = x, 1 m pixels: Horn gradient gx = -1 (z falls toward -x
    // in the kernel's sign convention), gy = 0 -> slope 45.0 deg (450
    // deci-deg), aspect atan2(0, -1) = 180 deg (1800)
    val plane = MemorySource(
      data = Seq(Array.tabulate(25)(i => (i % 5).toDouble)),
      gridW = 5, gridH = 5, noDataIn = 255, projection = "EPSG:28992",
      pixelSize = 1.0, originX = 0, originY = 5, dtypeName = "float64")
    val req = RasterRequest(Bbox(0, 0, 5, 5), "EPSG:28992", 5, 5, None, None)
    val sl = Slope(plane).getData(req).get.values(0)
    val as = Aspect(plane).getData(req).get.values(0)
    assert(sl(2 * 5 + 2) == 450.0)
    assert(as(2 * 5 + 2) == 1800.0)
    // flat plane: slope 0 everywhere, aspect flat marker -1
    val flat = plane.copy(data = Seq(Array.fill(25)(3.0)))
    val slF = Slope(flat).getData(req).get.values(0)
    val asF = Aspect(flat).getData(req).get.values(0)
    assert(slF(2 * 5 + 2) == 0.0 && asF(2 * 5 + 2) == -1.0)
  }

  test("Roughness/TPI/TRI match the hand-derived window statistics") {
    val plane = MemorySource(
      data = Seq(Array.tabulate(25)(i => (i % 5).toDouble)),
      gridW = 5, gridH = 5, noDataIn = 255, projection = "EPSG:28992",
      pixelSize = 1.0, originX = 0, originY = 5, dtypeName = "float64")
    val req = RasterRequest(Bbox(0, 0, 5, 5), "EPSG:28992", 5, 5, None, None)
    // plane z = x, interior cell (2,2): window values x ∈ {1,2,3}
    val ro = Roughness(plane).getData(req).get.values(0)
    assert(ro(2 * 5 + 2) == 2.0) // max 3 − min 1
    val tp = Tpi(plane).getData(req).get.values(0)
    assert(tp(2 * 5 + 2) == 0.0) // center 2 == neighbour mean 2
    val tr = Tri(plane).getData(req).get.values(0)
    // Σ|q(2) − q(nb)| = (3 + 0 + 3) · 10⁶ micro-units
    assert(tr(2 * 5 + 2) == 6000000.0)
  }
}

class SmoothZoomSpec extends SparkSpec {
  import RasterFixtures._
  test("Smooth switches to zoom mode for large margins") {
    // 100×100 px over the 5 m footprint: request cell 0.05 m, size 10 m →
    // 200 px margin >> threshold → zoom mode; the grown bbox (25 m at
    // 100 px → 0.25 m coarse cells) still resolves the source
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000), "EPSG:28992",
      100, 100, Some(T0), Some(T0))
    val res = Smooth(source, 10.0, fill = 0).getData(req).get
    assert(res.values(0).length == 10000)
    // heavy smoothing against fill=0 pulls everything below the source value
    assert(res.values(0).forall(v => v >= 0.0 && v < 1.0))
    assert(res.values(0).exists(_ > 0.01))
    // exact mode still used for small sizes (values stay near the original)
    val exact = Smooth(source, 1.0, fill = 0).getData(req).get
    assert(exact.values(0)(55) > 0.5)
  }

  test("exact Smooth matches a global convolution across interior tile seams") {
    // 20×300 raster spans two tile rows (TILE=256): rows near y=256 read
    // their Gaussian taps across the seam, which requires the patch halo
    // to cover the kernel radius int(4σ+0.5), not just the margin
    val (w, h) = (20, 300)
    val data = Array.tabulate(w * h)(i => ((i * 37) % 101).toDouble)
    val src = MemorySource(Seq(data), w, h, -1.0, "EPSG:28992", 1.0, 0.0, h.toDouble)
    val req = RasterRequest(Bbox(0, 0, w, h), "EPSG:28992", w, h, None, None)
    val size = 2.0 // σ = 2/3, margin 2, radius 3 > margin
    val got = Smooth(src, size, fill = 0).getData(req).get.values(0)
    // reference: scipy-compatible separable gaussian over the margin-
    // expanded array, constant fill beyond it
    val m = 2
    val sigma = size / 3.0
    val radius = (4 * sigma + 0.5).toInt
    val k0 = Array.tabulate(2 * radius + 1)(j =>
      math.exp(-0.5 * (j - radius) * (j - radius) / (sigma * sigma)))
    val k = k0.map(_ / k0.sum)
    val (ew, eh) = (w + 2 * m, h + 2 * m)
    def at(a: Array[Double], x: Int, y: Int): Double =
      if (x < 0 || x >= ew || y < 0 || y >= eh) 0.0 else a(y * ew + x)
    val expanded = Array.tabulate(ew * eh) { i =>
      val (x, y) = (i % ew - m, i / ew - m)
      if (x < 0 || x >= w || y < 0 || y >= h) 0.0 else data(y * w + x)
    }
    val hp = Array.tabulate(ew * eh) { i =>
      val (x, y) = (i % ew, i / ew)
      (0 to 2 * radius).map(j => k(j) * at(expanded, x + j - radius, y)).sum
    }
    val vp = Array.tabulate(ew * eh) { i =>
      val (x, y) = (i % ew, i / ew)
      (0 to 2 * radius).map(j => k(j) * at(hp, x, y + j - radius)).sum
    }
    var worst = 0.0
    for (y <- 0 until h; x <- 0 until w)
      worst = math.max(worst, math.abs(got(y * w + x) - vp((y + m) * ew + x + m)))
    assert(worst < 1e-9, s"seam divergence: $worst")
  }

  test("zoom upsample enumerates O(outputTiles) pairs, matching the containment filter") {
    val TILE = TileLayout.TILE
    // a realistic zoom map: w output px over [bx1, bx1+w·cw); coarse grid has
    // the same pixel count over a bbox grown by 500 units each side
    val w = 100000
    val cw = 1.0; val bx1 = 0.0
    val gx1 = -500.0; val ccw = (w * cw + 1000.0) / w
    def f(ox: Int): Int =
      math.min(w - 1, math.max(0, math.floor((bx1 + (ox + 0.5) * cw - gx1) / ccw).toInt))
    val n = TileLayout.tilesX(w)
    val ranges = Smooth.inverseTileRange(n, w, TILE, f)
    val totalPairs = ranges.map { case (lo, hi) => math.max(0, hi - lo + 1) }.sum
    assert(totalPairs <= 4 * n) // linear in tile count, not O(n²)
    // the ranges must reproduce the brute-force containment filter exactly
    for (ct <- Seq(0, 1, n / 2, n - 2, n - 1)) {
      val cx0 = ct * TILE; val ctw = math.min(TILE, w - cx0)
      val want = (0 until n).filter { ot =>
        val otw = math.min(TILE, w - ot * TILE)
        f(ot * TILE + otw - 1) >= cx0 && f(ot * TILE) < cx0 + ctw
      }
      val (lo, hi) = ranges(ct)
      assert(want == (lo to hi))
    }
  }}
