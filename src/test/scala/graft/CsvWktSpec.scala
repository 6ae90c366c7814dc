package graft

import org.apache.spark.sql.functions._
import graft.geometry._

class CsvWktSpec extends SparkSpec {

  private def tmpCsv(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"csv_$tag").resolve(s"$tag.csv").toString

  test("sink writes OGR-layout csv the source round-trips, typed") {
    val out = tmpCsv("basic")
    CsvWktSink.writeStream(
      GeometryFixtures.features.frame(GeometryRequest()), "EPSG:28992", out)
    val head = scala.io.Source.fromFile(out).getLines().next()
    assert(head == "fid,value,name,WKT")
    val src = CsvWktSource(out, "EPSG:28992")
    assert(src.projection == "EPSG:28992")
    assert(src.columns == Set("fid", "value", "name", "geometry"))
    val df = src.frame(GeometryRequest()).cache()
    assert(df.count() == 3)
    assert(df.schema("value").dataType == org.apache.spark.sql.types.DoubleType)
    val r2 = df.filter(col("fid") === 2).head()
    assert(r2.getAs[Double]("value") == 7.5)
    assert(r2.getAs[String]("name") == "b")
    assert(GeomFunctions.readWkb(r2.getAs[Array[Byte]]("geometry")).equalsExact(
      GeomFunctions.readWkt(GeometryFixtures.square(135001, 455998, 135003, 456000))))
    df.unpersist()
  }

  test("quoting survives commas, quotes and newlines in attributes") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "POINT (1 2)", """he said "hi", twice"""),
      (2L, "POINT (3 4)", "plain"),
      (3L, "POINT (5 6)", "line one\nline two")).toDF("fid", "wkt", "note")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"), col("note"))
    val out = tmpCsv("quotes")
    CsvWktSink.writeStream(df, "EPSG:4326", out)(sp)
    val back = CsvWktSource(out).frame(GeometryRequest())(sp).orderBy("fid").collect()
    assert(back(0).getAs[String]("note") == """he said "hi", twice""")
    assert(back(1).getAs[String]("note") == "plain")
    // RFC 4180 quoted newline: the multiLine reader keeps it one record
    assert(back.length == 3)
    assert(back(2).getAs[String]("note") == "line one\nline two")
  }

  test("a foreign csv without fid gets sequential file-order fids") {
    val out = tmpCsv("foreign")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      ("name,population,WKT\n" +
        "alpha,100,\"POINT (1 1)\"\n" +
        "beta,200,\"POINT (2 2)\"\n" +
        "gamma,,\n").getBytes("UTF-8"))
    val df = CsvWktSource(out).frame(GeometryRequest()).orderBy("fid").collect()
    assert(df.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(df(1).getAs[String]("name") == "beta")
    assert(df(1).getAs[Int]("population") == 200)
    assert(df(2).isNullAt(df(2).fieldIndex("geometry")))
  }

  test("filters, bbox and limit apply; dispatcher routes .csv") {
    val out = tmpCsv("dispatch")
    GeometryToFile.toFile(GeometryFixtures.features, out)
    val view = GeometryFileSource(out, proj = Some("EPSG:28992"))
    assert(view.frame(GeometryRequest()).count() == 3)
    assert(view.frame(GeometryRequest(filters = Map("name" -> "b")))
      .select("fid").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val boxed = view.frame(GeometryRequest(
      geometryWkt = Some(GeometryFixtures.square(135000.9, 455997, 135004, 456001))))
      .select("fid").collect().map(_.getLong(0)).sorted.toSeq
    assert(boxed == Seq(1L, 2L))
    assert(view.frame(GeometryRequest(limit = Some(1))).count() == 1)
    val back = graft.core.BlockRegistry.fromJson(view.toJson)
    assert(back.token == view.token)
  }
}
