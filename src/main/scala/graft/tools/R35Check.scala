package graft.tools
import org.apache.spark.sql.SparkSession
object R35Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("r35check").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val df30 = graft.SparkEntry.queries("r30_smooth")(spark, dir)
    val s30 = df30.agg(org.apache.spark.sql.functions.sum("v")).collect()(0)
    println("r30 rows=" + df30.count() + " sum=" + s30)
    val df = graft.SparkEntry.queries("r35_smooth_linear")(spark, dir)
    df.show(5, false)
    println("r35 rows=" + df.count())
    spark.stop()
  }
}
