package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state repetition bench: runs named queries N times in one
  * session and prints per-rep timings — separates JIT/startup cost from
  * plan cost for sub-second queries. */
object RepBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = Seq("r02_multiply_rasters", "r15_reclassify")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 10).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"REP $n " + ts.map(t => f"$t%.3f").mkString(" ") +
        f" | min=${ts.min}%.3f last5min=${ts.takeRight(5).min}%.3f")
    }
    spark.stop()
  }
}
