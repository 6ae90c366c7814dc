package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-lane profiling driver for the optimization rounds: runs named
  * queries in isolation (fresh-JVM comparable), times `reps` executions
  * with the SAME action as the bench (`.count()`), and optionally dumps
  * `.explain("formatted")` to a file per query.
  *
  * Usage:
  *   runMain graft.tools.Prof <sfDir> <reps> <outDirOrNONE> <q1,q2,...>
  *
  * Prints one JSON line per (query, rep) and a min line per query.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val outDir = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup as the bench: JIT priming + shared frame cache
    try {
      graft.SparkEntry.entry(spark).count()
      val g = graft.QueryLib.eventsGrid(spark, sfDir)
      graft.QueryLib.eventsRaster(sfDir, g)
        .frame(graft.QueryLib.fullReq(g))(spark).count()
    } catch { case _: Throwable => }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      if (outDir != "NONE") {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      }
      val ts = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"prof:$name#$i")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"prof":"$name","rep":$i,"sec":$sec,"rows":$n}""")
        sec
      }
      println(s"""{"prof_min":"$name","sec":${ts.min},"reps":$reps}""")
    }
    spark.stop()
  }
}
