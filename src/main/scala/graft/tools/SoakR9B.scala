package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Lines

/** Round-9 soak for the new line/window operators: p41 boilerplate
  * removal and p42 exact-substring window dedup (stride 1 = the exact
  * setting, stride 4 = the approximation lever) at sf0.1 / sf1 / sf10,
  * with shuffle partitions scaled to input per the round-9 partition
  * finding. One JSON line per (query, sf). */
object SoakR9B {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/sf1",
      "sf10" -> "/tmp/sf10").filter(s => new java.io.File(s._2).exists())
    for ((sfName, dir) <- sfs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val parts = math.max(32, (n / 1500).toInt)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      def run(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"soak":"$name","partitions":$parts,"sf":"$sfName","sec":$sec%.3f,"rows":$rows}""")
      }
      import org.apache.spark.sql.functions._
      // aggregate over REAL output columns: a bare count() lets
      // Catalyst eliminate the left joins and the whole pipeline
      run("p41_line_boilerplate") {
        Lines.dropBoilerplate(docs, "doc_id", "text", 2)
          .agg(sum(length(col("clean_text"))), sum(col("n_removed")))
          .collect()(0).getLong(0)
      }
      run("p42_window_dedup_s1") {
        Lines.windowDupStats(docs, "doc_id", "text", 40, 1)
          .agg(sum(col("dup_chars")), sum(col("n_dup_windows")))
          .collect()(0).getLong(0)
      }
      run("p42_window_dedup_s4") {
        Lines.windowDupStats(docs, "doc_id", "text", 40, 4)
          .agg(sum(col("dup_chars")), sum(col("n_dup_windows")))
          .collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}
