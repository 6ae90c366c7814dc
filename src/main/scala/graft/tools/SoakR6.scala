package graft.tools

import org.apache.spark.sql.SparkSession
import graft.geometry._

/** Round-6 soak driver: the three streaming single-file exports at 200k
  * features (the synthetic sf1 `part` table), with peak-heap sampling to
  * evidence the one-partition driver-memory bound. Run with a deliberately
  * small -Xmx (e.g. SBT_OPTS=-Xmx3g) to make an unbounded buffer fail
  * rather than hide in a large heap. Prints one JSON line per export.
  */
object SoakR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val squares = TableGeometrySource(s"$sfDir/part.parquet", "p_partkey",
      Seq("p_size"),
      geomWktExpr = Some(
        """concat('POLYGON ((', p_partkey % 50, ' ', cast(p_partkey / 50 as int) * 2,
          |', ', (p_partkey % 50) + (p_size / 10), ' ', cast(p_partkey / 50 as int) * 2,
          |', ', (p_partkey % 50) + (p_size / 10), ' ', cast(p_partkey / 50 as int) * 2 + (p_size / 10),
          |', ', p_partkey % 50, ' ', cast(p_partkey / 50 as int) * 2 + (p_size / 10),
          |', ', p_partkey % 50, ' ', cast(p_partkey / 50 as int) * 2, '))')"""
          .stripMargin.replaceAll("\n", "")))

    val rt = Runtime.getRuntime
    val dir = java.nio.file.Files.createTempDirectory("soak_r6")

    for (ext <- Seq("shp", "gpkg", "gml", "fgb", "csv", "kml")) {
      val out = dir.resolve(s"parts200k.$ext").toString
      System.gc()
      val base = rt.totalMemory() - rt.freeMemory()
      val peak = new java.util.concurrent.atomic.AtomicLong(base)
      @volatile var done = false
      val sampler = new Thread(() => {
        while (!done) {
          val used = rt.totalMemory() - rt.freeMemory()
          peak.updateAndGet(p => math.max(p, used))
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      GeometryToFile.toFile(squares, out)
      val writeSec = (System.nanoTime() - t0) / 1e9
      done = true; sampler.join()
      val t1 = System.nanoTime()
      val backRows = GeometryFileSource(out).frame(GeometryRequest()).count()
      val readSec = (System.nanoTime() - t1) / 1e9
      val fileMb = new java.io.File(out).length() / 1e6
      println(s"""{"soak_export":"$ext","rows":$backRows,"write_sec":$writeSec,"read_sec":$readSec,"file_mb":$fileMb,"heap_base_mb":${base / 1e6},"heap_peak_mb":${peak.get / 1e6}}""")
    }
    spark.stop()
  }
}
