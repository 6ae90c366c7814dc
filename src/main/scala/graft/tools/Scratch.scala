package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geometry._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SCRATCH $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    graft.SparkEntry.entry(spark).count()
    val sq = """concat('POLYGON ((', p_partkey % 50, ' ', cast(p_partkey / 50 as int) * 2, ', ', (p_partkey % 50) + (p_size / 10), ' ', cast(p_partkey / 50 as int) * 2, ', ', (p_partkey % 50) + (p_size / 10), ' ', (cast(p_partkey / 50 as int) * 2) + (p_size / 10), ', ', p_partkey % 50, ' ', (cast(p_partkey / 50 as int) * 2) + (p_size / 10), ', ', p_partkey % 50, ' ', cast(p_partkey / 50 as int) * 2, '))')"""
    val p = TableGeometrySource(s"$dir/part.parquet", "p_partkey",
      Seq("p_size"), geomWktExpr = Some(sq))
    val df0 = p.frame(GeometryRequest())(spark)
    println("sizeInBytes estimate: " +
      df0.queryExecution.optimizedPlan.stats.sizeInBytes)
    // mimic the fgb hilbert column with a cheap stand-in orderable col
    val keyed = df0.withColumn("__hil", col("fid") * 2654435761L % 1000000)
    def drain(d: org.apache.spark.sql.DataFrame): Long = {
      val it = d.toLocalIterator()
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("funnel(current width) drain") { drain(SinkFunnel.ordered(keyed, col("__hil"))) }
      time("coalesce(1)+sort drain") {
        drain(keyed.coalesce(1).sortWithinPartitions(col("__hil")))
      }
      time("range(4)+sort drain") {
        drain(keyed.repartitionByRange(4, col("__hil")).sortWithinPartitions(col("__hil")))
      }
      time("range(8)+sort drain") {
        drain(keyed.repartitionByRange(8, col("__hil")).sortWithinPartitions(col("__hil")))
      }
      time("range(32)+sort drain") {
        drain(keyed.repartitionByRange(32, col("__hil")).sortWithinPartitions(col("__hil")))
      }
    }
    spark.stop()
  }
}
