package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster._
import RasterFixtures._

class ProjSpec extends AnyFunSuite {

  test("RD New origin maps to the Amersfoort reference coordinates") {
    val (lon, lat) = Proj.rdToWgs84(155000, 463000)
    assert(math.abs(lat - 52.15517440) < 1e-7)
    assert(math.abs(lon - 5.38720621) < 1e-7)
  }

  test("RD ↔ WGS84 round-trips within centimeters") {
    for ((x, y) <- Seq((135000.0, 456000.0), (100000.0, 400000.0), (200000.0, 550000.0))) {
      val (lon, lat) = Proj.rdToWgs84(x, y)
      val (x2, y2) = Proj.wgs84ToRd(lon, lat)
      assert(math.abs(x2 - x) < 0.05 && math.abs(y2 - y) < 0.05, s"($x,$y)")
    }
  }

  test("web mercator round-trips and matches known values") {
    val (mx, my) = Proj.transform("EPSG:4326", "EPSG:3857", 5.387206, 52.155174)
    assert(math.abs(mx - 599700) < 200) // ~599.7 km east
    val (lon, lat) = Proj.transform("EPSG:3857", "EPSG:4326", mx, my)
    assert(math.abs(lon - 5.387206) < 1e-9 && math.abs(lat - 52.155174) < 1e-9)
  }

  // ---- UTM / ellipsoidal Transverse Mercator ------------------------------

  test("OGC URN and CRS84 spellings normalize to their EPSG codes") {
    assert(Proj.normalize("urn:ogc:def:crs:EPSG::4326") == "EPSG:4326")
    assert(Proj.normalize("urn:ogc:def:crs:EPSG:9.9:28992") == "EPSG:28992")
    assert(Proj.normalize("urn:ogc:def:crs:OGC:1.3:CRS84") == "EPSG:4326")
    assert(Proj.normalize("CRS84") == "EPSG:4326")
    assert(Proj.normalize("EPSG::32631") == "EPSG:32631")
    assert(Proj.supported("urn:ogc:def:crs:EPSG::32631"))
    // composing through transform works with the URN spelling
    val (x1, y1) = Proj.transform("urn:ogc:def:crs:EPSG::4326", "EPSG:3857", 5.0, 52.0)
    val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:3857", 5.0, 52.0)
    assert(x1 == x2 && y1 == y2)
  }

  test("UTM codes are recognized; junk zones are not") {
    for (c <- Seq("EPSG:32601", "EPSG:32631", "EPSG:32660", "EPSG:32717", "EPSG:25832"))
      assert(Proj.supported(c), c)
    for (c <- Seq("EPSG:32600", "EPSG:32661", "EPSG:32699", "EPSG:9999"))
      assert(!Proj.supported(c), c)
  }

  test("UTM ↔ WGS84 round-trips to sub-micrometre across zones and hemispheres") {
    // points spread over each zone's 6° width, mid and high latitudes
    val cases = Seq(
      ("EPSG:32631", 3.0, 52.0), ("EPSG:32631", 0.5, 48.0), ("EPSG:32631", 5.5, 70.0),
      ("EPSG:32617", -79.4, 43.64), ("EPSG:32601", -177.0, 30.0),
      ("EPSG:32660", 177.0, 15.0), ("EPSG:32733", 15.0, -33.9),
      ("EPSG:32719", -70.6, -33.4), ("EPSG:25832", 9.0, 54.0),
      ("EPSG:25831", 4.4, 51.2))
    for ((code, lon, lat) <- cases) {
      val (e1, n1) = Proj.transform("EPSG:4326", code, lon, lat)
      val (lon2, lat2) = Proj.transform(code, "EPSG:4326", e1, n1)
      val (e2, n2) = Proj.transform("EPSG:4326", code, lon2, lat2)
      // grid round-trip: metres, directly the |err| < 1e-6 m target
      assert(math.abs(e2 - e1) < 1e-6 && math.abs(n2 - n1) < 1e-6,
        s"$code ($lon,$lat): grid drift ${e2 - e1}, ${n2 - n1}")
      assert(math.abs(lon2 - lon) < 1e-11 && math.abs(lat2 - lat) < 1e-11,
        s"$code ($lon,$lat): angular drift")
    }
  }

  test("central-meridian northing equals k0 × meridian arc (independent integral)") {
    // the meridian arc length is computed HERE by numeric integration of
    // M(φ) = ∫ a(1−e²)/(1−e² sin²φ)^{3/2} dφ — independent of the Krüger
    // series under test
    val a = 6378137.0; val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    def integrand(phi: Double): Double =
      a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    def meridianArc(latDeg: Double): Double = {
      val hi = math.toRadians(latDeg)
      val nSteps = 20000 // Simpson's rule, more than enough for 1e-7 m
      val h = hi / nSteps
      var s = integrand(0) + integrand(hi)
      for (i <- 1 until nSteps)
        s += (if (i % 2 == 1) 4.0 else 2.0) * integrand(i * h)
      s * h / 3.0
    }
    for (lat <- Seq(0.01, 10.0, 40.0, 52.0, 75.0)) {
      // zone 31 central meridian is 3°E
      val (e, n) = Proj.transform("EPSG:4326", "EPSG:32631", 3.0, lat)
      assert(math.abs(e - 500000.0) < 1e-6, s"lat $lat: easting $e")
      val expect = 0.9996 * meridianArc(lat)
      assert(math.abs(n - expect) < 1e-5, s"lat $lat: northing $n vs $expect")
    }
    // southern hemisphere: false northing 10 000 km
    val (_, nS) = Proj.transform("EPSG:4326", "EPSG:32731", 3.0, -40.0)
    assert(math.abs(nS - (10000000.0 - 0.9996 * meridianArc(40.0))) < 1e-5)
  }

  test("UTM matches published anchor coordinates") {
    // CN Tower (the UTM article's worked example): 43°38'33.24"N
    // 79°23'13.7"W → zone 17N 630084 E, 4833438 N
    val (e1, n1) = Proj.transform("EPSG:4326", "EPSG:32617",
      -(79 + 23 / 60.0 + 13.7 / 3600.0), 43 + 38 / 60.0 + 33.24 / 3600.0)
    assert(math.abs(e1 - 630084) < 1.0, s"easting $e1")
    assert(math.abs(n1 - 4833438) < 1.5, s"northing $n1")
    // easting is antisymmetric about the central meridian
    val (eW, nW) = Proj.transform("EPSG:4326", "EPSG:32631", 2.0, 45.0)
    val (eE, nE) = Proj.transform("EPSG:4326", "EPSG:32631", 4.0, 45.0)
    assert(math.abs((eE - 500000) + (eW - 500000)) < 1e-6)
    assert(math.abs(nE - nW) < 1e-6)
  }

  test("UTM composes through the hub with RD and web mercator") {
    // Amersfoort (RD origin) sits in UTM zone 31N
    val (e, n) = Proj.transform("EPSG:28992", "EPSG:32631", 155000, 463000)
    // independent: hub through WGS84 explicitly
    val (lon, lat) = Proj.rdToWgs84(155000, 463000)
    val (e2, n2) = Proj.transform("EPSG:4326", "EPSG:32631", lon, lat)
    assert(e == e2 && n == n2)
    assert(e > 600000 && e < 700000 && n > 5700000 && n < 5850000, s"($e,$n)")
    // and back within RD polynomial accuracy (~25 cm)
    val (x2, y2) = Proj.transform("EPSG:32631", "EPSG:28992", e, n)
    assert(math.abs(x2 - 155000) < 0.5 && math.abs(y2 - 463000) < 0.5)
  }

  test("Lambert-93 (EPSG:2154): unit scale on standard parallels, round-trips, CC zones") {
    // projection origin maps to the false origin
    val (e0, n0) = Proj.transform("EPSG:4326", "EPSG:2154", 3.0, 46.5)
    assert(math.abs(e0 - 700000.0) < 1e-6 && math.abs(n0 - 6600000.0) < 1e-6)
    // the 2SP DEFINING property: scale factor exactly 1 on both standard
    // parallels — checked against an independent meridian-radius formula
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    for (lat <- Seq(44.0, 49.0)) {
      val d = 1e-6 // degrees
      val (x1, y1) = Proj.transform("EPSG:4326", "EPSG:2154", 4.0, lat - d)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:2154", 4.0, lat + d)
      val mapped = math.hypot(x2 - x1, y2 - y1)
      val phi = math.toRadians(lat)
      val mRad = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
      assert(math.abs(mapped / (mRad * math.toRadians(2 * d)) - 1.0) < 1e-6,
        s"scale at $lat")
    }
    // round-trips over the France extent, |err| < 1e-6 m
    for ((lon, lat) <- Seq((-4.5, 48.4), (2.35, 48.85), (7.7, 48.6),
        (3.0, 43.0), (9.2, 41.9))) {
      val (x, y) = Proj.transform("EPSG:4326", "EPSG:2154", lon, lat)
      val (lon2, lat2) = Proj.transform("EPSG:2154", "EPSG:4326", x, y)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:2154", lon2, lat2)
      assert(math.abs(x2 - x) < 1e-6 && math.abs(y2 - y) < 1e-6, s"($lon,$lat)")
    }
    // Paris lands where Lambert-93 puts it (~652.5 km E, ~6862 km N)
    val (xp, yp) = Proj.transform("EPSG:4326", "EPSG:2154", 2.3522, 48.8566)
    assert(xp > 600000 && xp < 700000 && yp > 6850000 && yp < 6880000, s"($xp,$yp)")
    // nine CC zones: each origin hits its false origin; round-trip holds
    for (z <- 3942 to 3950) {
      val lat = 42.0 + (z - 3942)
      val (e, n) = Proj.transform("EPSG:4326", s"EPSG:$z", 3.0, lat)
      assert(math.abs(e - 1700000.0) < 1e-6, s"zone $z easting")
      assert(math.abs(n - ((z - 3942 + 1) * 1000000.0 + 200000.0)) < 1e-6, s"zone $z northing")
      val (lon2, lat2) = Proj.transform(s"EPSG:$z", "EPSG:4326", 1750000.0, n + 30000.0)
      val (x2, y2) = Proj.transform("EPSG:4326", s"EPSG:$z", lon2, lat2)
      assert(math.abs(x2 - 1750000.0) < 1e-6 && math.abs(y2 - (n + 30000.0)) < 1e-6)
    }
  }

  test("British National Grid (EPSG:27700): OS worked example, datum shift, round-trips") {
    // the OS guide's worked example (OSGB36 geodetic → grid, datum-internal,
    // so it pins the TM-on-Airy math exactly): 52°39'27.2531"N 1°43'4.5177"E
    // → E 651409.903, N 313177.270
    val (e, n) = Proj.osgbGrid.forward(
      1 + 43 / 60.0 + 4.5177 / 3600.0, 52 + 39 / 60.0 + 27.2531 / 3600.0)
    assert(math.abs(e - 651409.903) < 0.005, s"easting $e")
    assert(math.abs(n - 313177.270) < 0.005, s"northing $n")
    // WGS84 hub round-trip through the Helmert shift. The negated-parameter
    // inverse is first-order (millimetre-scale residual: s·r cross terms on
    // an earth radius) — far below the shift's own ~2 m accuracy vs OSTN
    for ((lon, lat) <- Seq((-0.1276, 51.5072), (-3.19, 55.95), (-5.93, 54.60),
        (1.3, 52.63))) {
      val (x, y) = Proj.transform("EPSG:4326", "EPSG:27700", lon, lat)
      val (lon2, lat2) = Proj.transform("EPSG:27700", "EPSG:4326", x, y)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:27700", lon2, lat2)
      assert(math.abs(x2 - x) < 0.01 && math.abs(y2 - y) < 0.01, s"($lon,$lat)")
    }
    // central London lands in the TQ square (~530 km E, ~180 km N)
    val (xl, yl) = Proj.transform("EPSG:4326", "EPSG:27700", -0.1276, 51.5072)
    assert(xl > 525000 && xl < 536000 && yl > 178000 && yl < 186000, s"($xl,$yl)")
    // the datum shift is real: grid coords with and without the Helmert
    // differ by the expected ~50-120 m over Britain
    val (xNoShift, yNoShift) = Proj.osgbGrid.forward(-0.1276, 51.5072)
    val d = math.hypot(xl - xNoShift, yl - yNoShift)
    assert(d > 50 && d < 130, s"datum shift magnitude $d")
  }

  test("ETRS89 UTM and WGS84 UTM agree to sub-millimetre (GRS80 vs WGS84)") {
    val (e1, n1) = Proj.transform("EPSG:4326", "EPSG:32632", 9.0, 54.0)
    val (e2, n2) = Proj.transform("EPSG:4326", "EPSG:25832", 9.0, 54.0)
    assert(math.abs(e1 - e2) < 1e-3 && math.abs(n1 - n2) < 1e-3)
  }
}

class ReprojectionSpec extends SparkSpec {
  test("MemorySource serves a WGS84 request over an RD raster") {
    // the fixture footprint in WGS84
    val (lon1, lat1) = Proj.rdToWgs84(135000, 455995)
    val (lon2, lat2) = Proj.rdToWgs84(135005, 456000)
    val req = RasterRequest(Bbox(lon1, lat1, lon2, lat2), "EPSG:4326", 10, 10,
      Some(T0), Some(T0))
    val res = source.getData(req).get
    // all request cells land inside the source footprint → frame-0 value 1
    assert(res.values(0).count(_ == 1.0) > 90)
    // and a request far away is all nodata
    val far = RasterRequest(Bbox(4.0, 51.0, 4.001, 51.001), "EPSG:4326", 4, 4,
      Some(T0), Some(T0))
    assert(source.getData(far).get.values(0).forall(_ == 255.0))
  }

  test("MemorySource in UTM serves WGS84 and RD requests") {
    import java.time.Instant
    val src = MemorySource(
      data = Seq(Array.fill(100)(1.0)),
      gridW = 10, gridH = 10, noDataIn = 255.0,
      projection = "EPSG:32631", pixelSize = 5.0,
      originX = 600000.0, originY = 5800000.0, // ~52.3°N inside zone 31
      timeFirstMs = 0L, frameDeltaMs = None, dtypeName = "float64")
    val t = Some(Instant.ofEpochMilli(0L))
    val (lon1, lat1) = Proj.transform("EPSG:32631", "EPSG:4326", 600001, 5799951)
    val (lon2, lat2) = Proj.transform("EPSG:32631", "EPSG:4326", 600049, 5799999)
    val res = src.getData(RasterRequest(Bbox(lon1, lat1, lon2, lat2),
      "EPSG:4326", 10, 10, t, t)).get
    assert(res.values(0).count(_ == 1.0) > 90, res.values(0).toSeq.toString)
    // far away in lon/lat → all nodata (the output-dtype sentinel)
    val far = src.getData(RasterRequest(Bbox(-100.0, 10.0, -99.9, 10.1),
      "EPSG:4326", 4, 4, t, t)).get
    assert(far.values(0).forall(_ == far.noDataValue))
  }

  test("Area reprojects: a 1-degree-ish WGS84 square has metric RD area") {
    import graft.geometry._
    val sq = SeqGeometrySource(Seq(
      (1L, GeometryFixtures.square(5.387, 52.155, 5.388, 52.156), 0.0, "x")),
      proj = "EPSG:4326")
    val withArea = sq.set("area", Area(sq, "EPSG:28992"))
    val a = withArea.frame(GeometryRequest()).select("area").head().getDouble(0)
    // ~68 m (lon) × ~111 m (lat) → ~7600 m²
    assert(a > 6000 && a < 9000, s"area $a")
  }

  test("polar stereographic: EPSG guidance worked example, round-trips, true scale") {
    // EPSG Guidance Note 7-2, Polar Stereographic variant B worked example
    // (WGS84 / Australian Antarctic parameters: φ_ts 71°S, λ0 70°E,
    // FE = FN = 6 000 000): 75°S 120°E → E 7 255 380.79, N 7 053 389.56
    val aap = Proj.psSpecFor(6378137.0, 298.257223563, -71.0, 70.0,
      6000000.0, 6000000.0, south = true)
    val (ew, nw) = aap.forward(120.0, -75.0)
    assert(math.abs(ew - 7255380.79) < 0.01, s"easting $ew")
    assert(math.abs(nw - 7053389.56) < 0.01, s"northing $nw")
    // and the guidance example's reverse direction
    val (lonw, latw) = aap.inverse(7255380.79, 7053389.56)
    assert(math.abs(lonw - 120.0) < 1e-7 && math.abs(latw - -75.0) < 1e-7)

    // both aspects: the pole maps to the natural origin
    val (px, py) = Proj.transform("EPSG:4326", "EPSG:3031", 33.0, -90.0)
    assert(math.hypot(px, py) < 1e-6)
    val (qx, qy) = Proj.transform("EPSG:4326", "EPSG:3413", 12.0, 90.0)
    assert(math.hypot(qx, qy) < 1e-6)

    // the DEFINING property: true scale on the standard parallel, checked
    // against an independent parallel-radius formula (scale along a circle
    // of latitude = mapped arc / (ν cosφ Δλ))
    val ae = 6378137.0; val f = 1 / 298.257223563; val e2 = f * (2 - f)
    for ((code, latTs) <- Seq(("EPSG:3031", -71.0), ("EPSG:3413", 70.0))) {
      val d = 1e-6
      val (x1, y1) = Proj.transform("EPSG:4326", code, 10.0 - d, latTs)
      val (x2, y2) = Proj.transform("EPSG:4326", code, 10.0 + d, latTs)
      val phi = math.toRadians(latTs)
      val nu = ae / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val truth = nu * math.cos(phi) * math.toRadians(2 * d)
      assert(math.abs(math.hypot(x2 - x1, y2 - y1) / truth - 1.0) < 1e-6, code)
    }

    // round-trips over each hemisphere's working extent, |err| < 1e-6 m
    for ((lon, lat) <- Seq((0.0, -71.0), (166.67, -77.85), (-68.1, -67.57),
        (58.0, -89.9))) {
      val (x, y) = Proj.transform("EPSG:4326", "EPSG:3031", lon, lat)
      val (lon2, lat2) = Proj.transform("EPSG:3031", "EPSG:4326", x, y)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:3031", lon2, lat2)
      assert(math.abs(x2 - x) < 1e-6 && math.abs(y2 - y) < 1e-6, s"($lon,$lat)")
    }
    for ((lon, lat) <- Seq((-45.0, 70.0), (-18.8, 76.8), (156.0, 71.3),
        (-110.0, 89.95))) {
      val (x, y) = Proj.transform("EPSG:4326", "EPSG:3413", lon, lat)
      val (lon2, lat2) = Proj.transform("EPSG:3413", "EPSG:4326", x, y)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:3413", lon2, lat2)
      assert(math.abs(x2 - x) < 1e-6 && math.abs(y2 - y) < 1e-6, s"($lon,$lat)")
    }
    // McMurdo Station lands in the right part of the 3031 plane
    // (~166.7°E, 77.85°S → x ≈ +310 km, y ≈ −1310 km)
    val (mx, my) = Proj.transform("EPSG:4326", "EPSG:3031", 166.67, -77.85)
    assert(mx > 250000 && mx < 350000 && my < -1250000 && my > -1400000, s"($mx,$my)")

    // the NSIDC-south and Arctic variants: true scale on their parallels,
    // round-trips; 3995 and 3031 differ only in the ts parallel, so their
    // outputs agree in direction but not magnitude
    for ((code, latTs, lon, lat) <- Seq(("EPSG:3976", -70.0, 100.0, -75.0),
        ("EPSG:3995", 71.0, -30.0, 80.0))) {
      val d = 1e-6
      val (x1, y1) = Proj.transform("EPSG:4326", code, 10.0 - d, latTs)
      val (x2, y2) = Proj.transform("EPSG:4326", code, 10.0 + d, latTs)
      val phi = math.toRadians(latTs)
      val nu = ae / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val truth = nu * math.cos(phi) * math.toRadians(2 * d)
      assert(math.abs(math.hypot(x2 - x1, y2 - y1) / truth - 1.0) < 1e-6, code)
      val (x, y) = Proj.transform("EPSG:4326", code, lon, lat)
      val (lon2, lat2) = Proj.transform(code, "EPSG:4326", x, y)
      val (x3, y3) = Proj.transform("EPSG:4326", code, lon2, lat2)
      assert(math.abs(x3 - x) < 1e-6 && math.abs(y3 - y) < 1e-6, code)
    }
  }

  test("hub-coincident geographic datums normalize onto EPSG:4326") {
    // ETRS89, RGF93, NAD83 lat/lon — all within the hub's grid-free
    // accuracy of WGS84, same convention as the projected families
    for (code <- Seq("EPSG:4258", "EPSG:4171", "EPSG:4269")) {
      assert(Proj.normalize(code) == "EPSG:4326", code)
      assert(Proj.supported(code), code)
      val (x, y) = Proj.transform(code, "EPSG:28992", 5.38720621, 52.15517440)
      assert(math.abs(x - 155000) < 1 && math.abs(y - 463000) < 1)
    }
  }

  test("Albers (EPSG:5070): Snyder worked example, equal-area property, round-trips") {
    // Snyder, "Map Projections — A Working Manual", §14 numerical example
    // (Clarke 1866, parallels 29.5°/45.5°, origin 23°N 96°W):
    // 35°N 75°W → x 1 885 472.7, y 1 535 925.0
    val snyder = Proj.albersSpecFor(6378206.4, 294.978698214,
      29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
    val (xs, ys) = snyder.forward(-75.0, 35.0)
    assert(math.abs(xs - 1885472.7) < 0.5, s"x $xs")
    assert(math.abs(ys - 1535925.0) < 0.5, s"y $ys")
    val (lons, lats) = snyder.inverse(1885472.7, 1535925.0)
    assert(math.abs(lons - -75.0) < 1e-5 && math.abs(lats - 35.0) < 1e-5)

    // the DEFINING property: unit scale along both standard parallels,
    // against the independent parallel-radius formula
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    for (lat <- Seq(29.5, 45.5)) {
      val d = 1e-6
      val (x1, y1) = Proj.transform("EPSG:4326", "EPSG:5070", -96.0 - d, lat)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:5070", -96.0 + d, lat)
      val phi = math.toRadians(lat)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val truth = nu * math.cos(phi) * math.toRadians(2 * d)
      assert(math.abs(math.hypot(x2 - x1, y2 - y1) / truth - 1.0) < 1e-6, s"scale at $lat")
    }

    // the EQUAL-AREA property everywhere: the Jacobian determinant of the
    // map equals the ellipsoidal area element M ν cosφ (independent of the
    // projection formulas) — checked at points far from the parallels
    for ((lon, lat) <- Seq((-120.0, 49.0), (-75.0, 25.2), (-96.0, 37.0))) {
      val d = 1e-5
      def fw(lo: Double, la: Double) = Proj.transform("EPSG:4326", "EPSG:5070", lo, la)
      val (x0, y0) = fw(lon - d, lat); val (x1, y1) = fw(lon + d, lat)
      val (x2, y2) = fw(lon, lat - d); val (x3, y3) = fw(lon, lat + d)
      val dxdl = (x1 - x0) / (2 * d); val dydl = (y1 - y0) / (2 * d)
      val dxdp = (x3 - x2) / (2 * d); val dydp = (y3 - y2) / (2 * d)
      val jac = math.abs(dxdl * dydp - dydl * dxdp) // per degree²
      val phi = math.toRadians(lat)
      val sin2 = math.sin(phi) * math.sin(phi)
      val mRad = a * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
      val nu = a / math.sqrt(1 - e2 * sin2)
      val truth = mRad * nu * math.cos(phi) * math.toRadians(1.0) * math.toRadians(1.0)
      assert(math.abs(jac / truth - 1.0) < 1e-5, s"area element at ($lon,$lat)")
    }

    // round-trips over CONUS, |err| < 1e-6 m
    for ((lon, lat) <- Seq((-124.4, 48.4), (-66.9, 44.8), (-80.2, 25.8),
        (-117.1, 32.7), (-96.0, 23.0))) {
      val (x, y) = Proj.transform("EPSG:4326", "EPSG:5070", lon, lat)
      val (lon2, lat2) = Proj.transform("EPSG:5070", "EPSG:4326", x, y)
      val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:5070", lon2, lat2)
      assert(math.abs(x2 - x) < 1e-6 && math.abs(y2 - y) < 1e-6, s"($lon,$lat)")
    }
    // Denver lands where 5070 puts it (~ −787 km, 1.85 Mm)
    val (dx, dy) = Proj.transform("EPSG:4326", "EPSG:5070", -104.99, 39.74)
    assert(dx > -900000 && dx < -700000 && dy > 1750000 && dy < 1950000, s"($dx,$dy)")
  }

  test("LCC-2SP in survey feet matches the EPSG 9802 worked example") {
    // EPSG Guidance 7-2: NAD27 / Texas South Central (Clarke 1866, US
    // survey feet): φ0 = 27°50', λ0 = 99°W, parallels 28°23' / 30°17',
    // FE = 2 000 000 ft, FN = 0; φ = 28°30'N, λ = 96°W →
    // E = 2 963 503.91 ft, N = 254 759.80 ft
    val u = 1200.0 / 3937.0 // US survey foot
    val lcc = Proj.LccSpec(6378206.4, 294.97869821,
      28.0 + 23.0 / 60, 30.0 + 17.0 / 60, 27.0 + 50.0 / 60, -99.0,
      2000000.0 * u, 0.0)
    val (em, nm) = lcc.forward(-96.0, 28.5)
    assert(math.abs(em / u - 2963503.91) < 0.1, s"E ${em / u}")
    assert(math.abs(nm / u - 254759.80) < 0.1, s"N ${nm / u}")
    val (lon, lat) = lcc.inverse(em, nm)
    assert(math.abs(lon + 96.0) < 1e-9 && math.abs(lat - 28.5) < 1e-9)
  }

  test("LCC-1SP matches the EPSG 9801 worked example (Jamaica National Grid)") {
    // EPSG Guidance 7-2 §3.2.2: Clarke 1866, φ0 = 18°N, λ0 = 77°W,
    // k0 = 1.0, FE = 250000, FN = 150000; φ = 17°55'55.80"N,
    // λ = 76°56'37.26"W → E = 255966.58, N = 142493.51
    val lcc = Proj.LccSpec(6378206.4, 294.97869821, 18.0, 18.0, 18.0, -77.0,
      250000.0, 150000.0, k0 = 1.0)
    val lat = 17.0 + 55.0 / 60 + 55.80 / 3600
    val lon = -(76.0 + 56.0 / 60 + 37.26 / 3600)
    val (e, n) = lcc.forward(lon, lat)
    assert(math.abs(e - 255966.58) < 0.05, s"E $e")
    assert(math.abs(n - 142493.51) < 0.05, s"N $n")
    val (lon2, lat2) = lcc.inverse(e, n)
    assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    // NTF Lambert zone II: the grid origin maps to the false origin
    val ntf2 = Proj.LccSpec(6378249.2, 293.46602, 46.8, 46.8, 46.8,
      2.337229166666667, 600000.0, 2200000.0, k0 = 0.99987742)
    val (e0, n0) = ntf2.forward(2.337229166666667, 46.8)
    assert(math.abs(e0 - 600000.0) < 1e-6 && math.abs(n0 - 2200000.0) < 1e-6)
  }

  test("Swiss Oblique Mercator: origin exactness and sub-µm round-trips") {
    // Bern origin (the LV03 definition): φ0/λ0 map to the false origin
    // exactly — K is constructed so S(φ0) hits b0 on the sphere
    val so = Proj.SomercSpec(6377397.155, 299.1528128,
      46.95240555555556, 7.439583333333333, 600000.0, 200000.0)
    val (e0, n0) = so.forward(7.439583333333333, 46.95240555555556)
    assert(math.abs(e0 - 600000.0) < 1e-6 && math.abs(n0 - 200000.0) < 1e-6)
    for ((lon, lat) <- Seq((6.1, 46.2), (8.54, 47.38), (9.83, 46.5), (7.0, 47.56))) {
      val (x, y) = so.forward(lon, lat)
      val (lon2, lat2) = so.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-12 && math.abs(lat2 - lat) < 1e-12, s"($lon,$lat)")
    }
  }

  test("ellipsoidal Mercator matches the EPSG 9804 worked example") {
    // EPSG Guidance 7-2 §3.2.1 (Makassar / NEIEZ, Bessel 1841):
    // λ0 = 110°E, k0 = 0.997, FE = 3900000, FN = 900000;
    // φ = 3°S, λ = 120°E → E = 5009726.58 m, N = 569150.82 m
    val merc = Proj.MercSpec(6377397.155, 299.1528128, 110.0, 0.997,
      3900000.0, 900000.0)
    val (e, n) = merc.forward(120.0, -3.0)
    assert(math.abs(e - 5009726.58) < 0.02, s"E $e")
    assert(math.abs(n - 569150.82) < 0.02, s"N $n")
    val (lon, lat) = merc.inverse(e, n)
    assert(math.abs(lon - 120.0) < 1e-9 && math.abs(lat + 3.0) < 1e-9)
    // the ellipsoidal form differs measurably from the sphere at latitude:
    // EPSG:3395-style WGS84 Mercator vs EPSG:3857 at 60°N is ~37 km
    val m3395 = Proj.MercSpec(6378137.0, 298.257223563, 0.0, 1.0, 0.0, 0.0)
    val ySph = 6378137.0 * math.log(math.tan(math.Pi / 4 + math.toRadians(60.0) / 2))
    val (_, yEll) = m3395.forward(0.0, 60.0)
    assert(ySph - yEll > 30000.0 && ySph - yEll < 45000.0)
  }
}
