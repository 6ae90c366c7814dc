package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.raster._
import RasterFixtures._

class CoreSpec extends AnyFunSuite {

  test("tokens are deterministic and content-based") {
    val a1 = Add(source, 1)
    val a2 = Add(source, 1)
    val a3 = Add(source, 2)
    assert(a1.token == a2.token)
    assert(a1.token != a3.token)
    // integral doubles hash like ints (Python number equality)
    assert(Add(source, 1.0).token == a1.token)
    assert(a1.graphName.startsWith("Add_"))
  }

  test("graph collapses shared subexpressions onto one key") {
    val shared = Multiply(source, 2)
    val view = Add(shared, shared)
    val g = view.graph
    assert(g.size == 3) // MemorySource, Multiply, Add
    assert(g.keys.count(_.startsWith("Multiply_")) == 1)
  }

  test("JSON v2 serde round-trips a composed raster view") {
    val view = Divide(Add(source, source), 4)
    val json = view.toJson
    val back = BlockRegistry.fromJson(json)
    // token equality is the identity check — case-class == compares Array
    // fields by reference, so deep-array blocks never compare equal directly
    assert(back.token == view.token)
    assert(back.toJson == json)
  }

  test("serde round-trips misc/temporal operators") {
    val view = TemporalAggregate(
      Classify(MaskBelow(source, 2.0), Seq(2.0, 8.0)),
      Some("D"), "count", timezone = "Europe/Amsterdam")
    assert(BlockRegistry.fromJson(view.toJson).token == view.token)
    val rc = Reclassify(Classify(source, Seq(5.0)), Seq((0.0, 100.0), (1.0, 200.0)))
    assert(BlockRegistry.fromJson(rc.toJson).token == rc.token)
    val grp = Group(Seq(source, Shift(source, 3600000L)))
    assert(BlockRegistry.fromJson(grp.toJson).token == grp.token)
  }

  test("DummyBlock placeholders deserialize") {
    val d = DummyBlock("placeholder")
    assert(BlockRegistry.fromJson(d.toJson) == d)
  }

  test("Json renders and parses scalars, lists, maps, escapes") {
    val v = Map("a" -> 1L, "b" -> List(1.5, "x\n\"y", true, null))
    assert(Json.parse(Json.render(v)) == v)
  }
}

class GeometrySerdeSpec extends SparkSpec {
  import graft.geometry._
  import graft.core.BlockRegistry

  test("geometry views with field ops and zonal stats round-trip") {
    val feats = TableGeometrySource("/root/testdata/sf0.001/customer.parquet",
      "c_custkey", Seq("c_acctbal"))
    val view = feats.set("score",
      FieldOps.Where(
        FieldOps.Round(FieldOps.Divide(feats.getSeries("c_acctbal"), 100.0), 2),
        FieldOps.Greater(feats.getSeries("c_acctbal"), 0.0), 0.0))
    val back = BlockRegistry.fromJson(view.toJson)
    assert(back.token == view.token)
    // and the deserialized view evaluates
    val df = back.asInstanceOf[GeometryBlock].frame(GeometryRequest())
    assert(df.count() == 150)

    val zonal = AggregateRaster(feats, RasterFixtures.source, "mean",
      pixelSize = Some(0.5), maxPixels = Some(1000000L), autoPixelSize = true)
    val back2 = BlockRegistry.fromJson(zonal.toJson)
    assert(back2.token == zonal.token)
    assert(back2.asInstanceOf[AggregateRaster].maxPixels.contains(1000000L))

    val thr = AggregateRasterAboveThreshold(feats, RasterFixtures.source, "sum",
      pixelSize = Some(0.5), maxPixels = Some(2000000L), thresholdName = "thr")
    val back3 = BlockRegistry.fromJson(thr.toJson)
    assert(back3.token == thr.token)
    assert(back3.asInstanceOf[AggregateRasterAboveThreshold]
      .maxPixels.contains(2000000L))

    val placed = Place(RasterFixtures.source, "EPSG:28992", (135001.0, 455999.0),
      Seq((135002.0, 455999.0)), "max", Some("group"))
    val back4 = BlockRegistry.fromJson(placed.toJson)
    assert(back4.token == placed.token)
    assert(back4.asInstanceOf[Place].modeHint.contains("group"))
  }
}
