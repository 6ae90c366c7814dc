package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geometry._

class KmlSpec extends SparkSpec {

  private def tmpKml(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"kml_$tag").resolve(s"$tag.kml").toString

  test("sink reprojects to WGS84 and the source round-trips schema + values") {
    val out = tmpKml("basic")
    // fixture features are EPSG:28992 — the KML datum is WGS84 by spec,
    // so coordinates must arrive reprojected
    KmlSink.writeStream(
      GeometryFixtures.features.frame(GeometryRequest()), "EPSG:28992", out)
    val src = KmlSource(out)
    assert(src.projection == "EPSG:4326")
    assert(src.columns == Set("fid", "value", "name", "geometry"))
    val df = src.frame(GeometryRequest()).cache()
    assert(df.count() == 3)
    assert(df.schema("value").dataType == org.apache.spark.sql.types.DoubleType)
    val r2 = df.filter(col("fid") === 2).head()
    assert(r2.getAs[Double]("value") == 7.5)
    assert(r2.getAs[String]("name") == "b")
    val g = GeomFunctions.readWkb(r2.getAs[Array[Byte]]("geometry"))
    // the written corner equals the hub transform of the RD corner
    val (lon, lat) = graft.raster.Proj.transform("EPSG:28992", "EPSG:4326", 135001, 455998)
    val c = g.getCoordinates.minBy(c => math.hypot(c.x - lon, c.y - lat))
    assert(math.hypot(c.x - lon, c.y - lat) < 1e-9)
    df.unpersist()
  }

  private case class MixedSource() extends GeometryBlock {
    override def columns: Set[String] = Set("geometry", "n", "f", "flag", "note")
    override def projection: String = "EPSG:4326"
    override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
      import spark.implicits._
      Seq(
        (1L, "POINT (1 2)", Some(7L), Some(1.25), Some(true), Some("""a<b>&"c' €""")),
        (2L, "LINESTRING (0 0, 3 4, 5 5)", Some(-3L), None, Some(false), None),
        (3L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))", None, Some(2.5e-3), None, Some("plain")),
        (4L, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))", Some(1L), Some(6.75), Some(false), Some("mpoly")),
        (5L, null.asInstanceOf[String], Some(8L), Some(8.0), Some(true), Some("nogeom"))
      ).toDF("fid", "wkt", "n", "f", "flag", "note")
        .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
          col("n"), col("f"), col("flag"), col("note"))
    }
  }

  test("geometry families, holes, nulls, escaping round-trip in WGS84") {
    val sp = spark
    val out = tmpKml("mixed")
    KmlSink.writeStream(MixedSource().frame(GeometryRequest())(sp), "EPSG:4326", out)(sp)
    val back = KmlSource(out).frame(GeometryRequest())(sp).orderBy("fid").collect()
    assert(back.length == 5)
    val wkts = Seq(
      "POINT (1 2)",
      "LINESTRING (0 0, 3 4, 5 5)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
    wkts.zipWithIndex.foreach { case (w, i) =>
      val g = GeomFunctions.readWkb(back(i).getAs[Array[Byte]]("geometry"))
      assert(g.equalsExact(GeomFunctions.readWkt(w)), s"fid ${i + 1}")
    }
    assert(back(4).isNullAt(back(4).fieldIndex("geometry")))
    assert(back(0).getAs[Long]("n") == 7L)
    assert(back(0).getAs[String]("note") == """a<b>&"c' €""")
    assert(back(1).isNullAt(back(1).fieldIndex("f")))
  }

  test("foreign Data/value layout (no Schema) parses with string attrs") {
    val out = tmpKml("foreign")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      ("""<?xml version="1.0" encoding="utf-8" ?>
        |<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
        |<Placemark><name>spot</name>
        |  <ExtendedData><Data name="kind"><value>well</value></Data></ExtendedData>
        |  <Point><coordinates>4.5,52.1</coordinates></Point>
        |</Placemark>
        |<Placemark><name>area</name>
        |  <ExtendedData><Data name="kind"><value>field</value></Data></ExtendedData>
        |  <Polygon><outerBoundaryIs><LinearRing>
        |    <coordinates>4.0,52.0 4.1,52.0 4.1,52.1 4.0,52.1 4.0,52.0</coordinates>
        |  </LinearRing></outerBoundaryIs></Polygon>
        |</Placemark>
        |</Document></kml>""".stripMargin).getBytes("UTF-8"))
    val df = KmlSource(out).frame(GeometryRequest()).collect()
    assert(df.length == 2)
    assert(df.map(_.getAs[String]("kind")).toSet == Set("well", "field"))
  }

  test("dispatcher routes .kml; filters and limit apply; serde round-trips") {
    val out = tmpKml("dispatch")
    GeometryToFile.toFile(GeometryFixtures.features, out)
    val view = GeometryFileSource(out)
    assert(view.projection == "EPSG:4326")
    assert(view.frame(GeometryRequest()).count() == 3)
    assert(view.frame(GeometryRequest(filters = Map("name" -> "b")))
      .select("fid").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(view.frame(GeometryRequest(limit = Some(2))).count() == 2)
    val back = graft.core.BlockRegistry.fromJson(view.toJson)
    assert(back.token == view.token)
  }
}
