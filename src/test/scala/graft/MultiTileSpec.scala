package graft

import java.time.Instant
import graft.raster._

/** The tile machinery across multiple tiles per axis — the sf-scale query
  * harness stays within one 256px tile, so this covers the multi-tile
  * paths (TableRasterSource densify join, elemwise zip alignment, reduce,
  * temporal relabel) on a 300×300 grid (4 tiles). */
class MultiTileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val req = RasterRequest(Bbox(0, 0, 300, 300), "EPSG:28992", 300, 300,
    Some(Instant.ofEpochMilli(0)), Some(Instant.ofEpochMilli(3 * 3600000L)))
  private def src(valueExpr: String = "value") =
    TableRasterSource(s"$dir/events.parquet", "event_id", valueExpr,
      4, 300, 300, "event_type = 'error'")

  test("TableRasterSource produces dense multi-tile frames") {
    val f = src().frame(req)
    // 4 frames × 4 tiles (2×2 of 256+44)
    assert(f.count() == 16)
    val res = src().getData(req).get
    assert(res.times.size == 4)
    // event 0 (error → nodata) is cell 0 frame 0; event 4 → cell 1 frame 0
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "event_type", "value").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    for (id <- Seq(1L, 5L, 1001L, 999L)) {
      val t = (id % 4).toInt; val cell = (id / 4).toInt
      val expected =
        if (!events.contains(id) || events(id)._1 == "error") src().noDataValue
        else events(id)._2
      assert(res.values(t)(cell) == expected, s"event $id")
    }
    // cells past the table tail are nodata
    assert(res.values(0)(89999) == src().noDataValue)
  }

  test("elemwise and reduce align across tiles") {
    val a = src(); val b = src("value * 2")
    val res = Add(a, b).getData(req).get
    val base = a.getData(req).get
    for (i <- Seq(0, 100, 70000)) {
      val exp = if (base.values(1)(i) == a.noDataValue) res.noDataValue
                else base.values(1)(i) * 3
      assert(res.values(1)(i) == exp, s"cell $i")
    }
    val m = Max(Seq(a, b)).getData(req).get
    assert(m.values(1)(100) == (if (base.values(1)(100) == a.noDataValue)
      m.noDataValue else base.values(1)(100) * 2))
  }

  test("stencil halo works on the multi-tile grid") {
    val g = Dilate(src("cast(floor(value) as long) % 10"), Seq(5.0))
    // just structural sanity: full grid back, 4 frames
    val res = g.getData(req).get
    assert(res.values.length == 4 && res.values(0).length == 90000)
  }
}
