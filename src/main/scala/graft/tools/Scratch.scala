package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Current focus:
  * profiling the g27 DXF round-trip phases at sf1 (the 360 s soak outlier).
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

    val dir = "/tmp/graft_sf1"
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p = TableGeometrySource(s"$dir/part.parquet", "p_partkey",
      Seq("p_size", "p_retailprice", "p_name"),
      geomWktExpr = Some(
        "concat('POINT (', 4.5 + (p_partkey % 50) * 0.001, ' ', " +
          "51.9 + cast(p_partkey / 50 as int) * 0.0005, ')')"),
      proj = "EPSG:4326")
    val out = java.nio.file.Files.createTempDirectory("scr_dxf")
      .resolve("parts.dxf").toString
    time("materialize df")(p.frame(GeometryRequest()).count())
    time("write dxf")(GeometryToFile.toFile(p, out))
    println("file MB: " + java.nio.file.Files.size(
      java.nio.file.Paths.get(out)) / 1e6)
    val back = GeometryFileSource(out)
    time("read back count")(back.frame(GeometryRequest()).count())
    time("read back count AGAIN")(back.frame(GeometryRequest()).count())
    spark.stop()
  }
}
