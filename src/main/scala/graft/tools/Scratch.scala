package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Current probe:
  * g20-shape FlatGeobuf write + read timing decomposition.
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
    import graft.geometry._
    import spark.implicits._
    val sp = spark
    // g20-shape: 2000 squares with attrs from part-like data
    val df = (0 until 200000).map { i =>
      val x = (i % 50).toDouble; val y = (i / 50) * 2.0
      (i.toLong, i % 50, 900.0 + i, s"part$i",
        s"POLYGON (($x $y, ${x + 1} $y, ${x + 1} ${y + 1}, $x ${y + 1}, $x $y))")
    }.toDF("fid", "p_size", "p_retailprice", "p_name", "wkt")
      .select(col("fid"), col("p_size"), col("p_retailprice"), col("p_name"),
        GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry"))
      .cache()
    df.count()
    for (round <- 1 to 2) {
      val dir = java.nio.file.Files.createTempDirectory(s"g20probe$round")
      val out = dir.resolve("parts.fgb").toString
      var t0 = System.nanoTime()
      FlatGeobufSink.writeStream(df, "EPSG:28992", out)(sp)
      val wWrite = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val src = FlatGeobufSource(out)
      val n = src.frame(GeometryRequest())(sp).collect().length
      val wRead = (System.nanoTime() - t0) / 1e9
      println(f"round $round write $wWrite%.3f s read $wRead%.3f s rows $n")
    }
    spark.stop()
  }
}
