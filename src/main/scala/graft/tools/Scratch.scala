package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, countDistinct, explode, lit, lower, udf}
import graft.geometry._
import graft.raster._

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Round-8 focus:
  * the NetCDF / MIF / DXF codecs, plus the scale-soak outlier probes
  * (pair-output and trigram-alphabet growth across /tmp/sf1 → /tmp/sf10,
  * run only when those synthetic directories exist).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- NetCDF: stack → one .nc → RasterFileSource dispatch → slice
    val dir = java.nio.file.Files.createTempDirectory("scratch_r8").toString
    val mem = MemorySource(
      data = Seq(Array.tabulate(64)(_ * 1.0), Array.tabulate(64)(_ * 2.0)),
      gridW = 8, gridH = 8, noDataIn = 255, projection = "EPSG:28992",
      pixelSize = 0.5, originX = 135000, originY = 456000,
      timeFirstMs = 0L, frameDeltaMs = Some(3600000L), dtypeName = "float64")
    val req = RasterRequest(Bbox(135000, 455996, 135004, 456000),
      "EPSG:28992", 8, 8, Some(java.time.Instant.ofEpochMilli(0)),
      Some(java.time.Instant.ofEpochMilli(3600000L)))
    NetCdfSink(mem, s"$dir/stack.nc").write(req)
    val nc = RasterFileSource(s"$dir/stack.nc")
    println(s"netcdf: proj=${nc.projection} times=${nc.allTimes.size} " +
      s"cell=${nc.cellSize.get} rows=${nc.frame(req).count()}")

    // ---- MIF + DXF: features → single file → GeometryFileSource dispatch
    val featsDf = Seq(
      (1L, "POINT (5.0 52.0)", 1.5, "alpha"),
      (2L, "LINESTRING (5.0 52.0, 5.2 52.2)", 2.5, "beta"),
      (3L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        3.5, "gamma")).toDF("fid", "wkt", "value", "name")
      .select(col("fid"), GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"),
        col("value"), col("name"))
    val feats = MergedFrameBlock(
      Set("fid", "geometry", "value", "name"), "EPSG:4326")(featsDf)
    Seq("mif", "dxf").foreach { ext =>
      val out = s"$dir/feats.$ext"
      GeometryToFile.toFile(feats, out)
      val back = GeometryFileSource(out)
      val rows = back.frame(GeometryRequest()).orderBy("fid").collect()
      val donut = GeomFunctions.readWkb(rows(2).getAs[Array[Byte]]("geometry"))
      println(s"$ext: proj=${back.projection} rows=${rows.length} " +
        s"donut=${donut.getGeometryType}/" +
        s"${donut.asInstanceOf[org.locationtech.jts.geom.Polygon].getNumInteriorRing} " +
        s"names=${rows.map(_.getAs[String]("name")).mkString(",")}")
    }

    // ---- soak outlier probes (only when the synthetic SFs exist)
    Seq("/tmp/sf1", "/tmp/sf10").filter(d => new java.io.File(d).exists())
      .foreach { sf =>
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        val embs = spark.read.parquet(s"$sf/embeddings.parquet")
        val lshPairs = graft.pipeline.Dedup
          .lshCandidatePairs(docs, "doc_id", "text", 32, 8, 3).count()
        val nearDups = graft.pipeline.Dedup.embeddingNearDups(
          embs, "vec_id", "embedding", 0.3,
          graft.pipeline.Similarity.randomPlanes(4, 64)).count()
        val tgUdf = udf { (t: String) =>
          if (t == null) Array.empty[String]
          else {
            val s = t.toLowerCase(java.util.Locale.ROOT)
            val cps = s.codePoints().toArray
            if (cps.length < 3) Array.empty[String]
            else Array.tabulate(cps.length - 2)(i => new String(cps, i, 3))
          }
        }
        val distinctTg = docs.select(explode(tgUdf(col("text"))).as("tg"))
          .agg(countDistinct(col("tg"))).head.getLong(0)
        println(s"soak $sf: docs=${docs.count()} p07_pairs=$lshPairs " +
          s"p11_pairs=$nearDups distinct_trigrams=$distinctTg")
      }

    spark.stop()
  }
}
