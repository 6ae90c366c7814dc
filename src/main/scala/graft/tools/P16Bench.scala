package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.QueryLib.tbl
import graft.pipeline.Dedup

/** Dev driver: time the p16 duplicate-clusters query in isolation. */
object P16Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val pairs = Dedup.jaccardPairs(
      tbl(spark, sfDir, "documents").filter(col("doc_id") < 40), "doc_id", "text", 3)
    val n = Dedup.duplicateClusters(pairs).count()
    println(s"p16 rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
