package graft.tools

import org.apache.spark.sql.SparkSession
import graft.geometry._

/** Round-7 soak driver: the FlatGeobuf single-file export at 2M features,
  * evidencing the O(1)-driver-memory R-tree build (the 40 B/feature leaf
  * skeleton spills to a temp file instead of the heap — at 2M features the
  * old in-memory skeleton alone was 80 MB of Node objects plus ArrayBuffer
  * growth; at 1G it would have been 40 GB). Run with a small -Xmx so an
  * unbounded buffer fails rather than hides. Prints one JSON line. */
object SoakR7 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("soak_r7")
    val keys = dir.resolve("keys.parquet").toString
    spark.range(n).selectExpr("id AS p_partkey",
      "CAST(id % 50 + 1 AS INT) AS p_size").write.parquet(keys)

    val squares = TableGeometrySource(keys, "p_partkey", Seq("p_size"),
      geomWktExpr = Some(
        """concat('POLYGON ((', p_partkey % 1400, ' ', cast(p_partkey / 1400 as int) * 2,
          |', ', (p_partkey % 1400) + (p_size / 10), ' ', cast(p_partkey / 1400 as int) * 2,
          |', ', (p_partkey % 1400) + (p_size / 10), ' ', cast(p_partkey / 1400 as int) * 2 + (p_size / 10),
          |', ', p_partkey % 1400, ' ', cast(p_partkey / 1400 as int) * 2 + (p_size / 10),
          |', ', p_partkey % 1400, ' ', cast(p_partkey / 1400 as int) * 2, '))')"""
          .stripMargin.replaceAll("\n", "")))

    val rt = Runtime.getRuntime
    val out = dir.resolve(s"parts$n.fgb").toString
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
    val src = GeometryFileSource(out)
    val backRows = src.frame(GeometryRequest()).count()
    val readSec = (System.nanoTime() - t1) / 1e9
    // bbox pushdown over the spilled-build index still prunes
    val t2 = System.nanoTime()
    val boxed = src.frame(GeometryRequest(geometryWkt =
      Some("POLYGON ((100 100, 160 100, 160 160, 100 160, 100 100))"))).count()
    val bboxSec = (System.nanoTime() - t2) / 1e9
    val fileMb = new java.io.File(out).length() / 1e6
    println(s"""{"soak_fgb_rows":$backRows,"bbox_rows":$boxed,"write_sec":$writeSec,"read_sec":$readSec,"bbox_sec":$bboxSec,"file_mb":$fileMb,"heap_base_mb":${base / 1e6},"heap_peak_mb":${peak.get / 1e6}}""")
    spark.stop()
  }
}
