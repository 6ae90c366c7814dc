package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.TextAnalysis

/** Timing probe for the p27 physical strategies at a given SF dir. */
object P27Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (run <- 1 to 2) {
      var t0 = System.nanoTime()
      TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 5).count()
      println(s"run $run fast: ${(System.nanoTime() - t0) / 1e9}s")
      t0 = System.nanoTime()
      TextAnalysis.trigramFamiliarity(docs, "doc_id", "text", 5,
        broadcastLimit = 0).count()
      println(s"run $run join: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
