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
}
