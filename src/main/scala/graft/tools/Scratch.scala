package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geometry._

/** Ad-hoc measurement probe (not on any query/bench path).
  * Usage: runMain graft.tools.Scratch [sfDir] — default /root/testdata/sf0.1.
  *
  * r17 shape: in-JVM interleaved A/B of the two eager sub-jobs this
  * round restructured — p49's evalGrams (distinct+collect vs kernel
  * treeAggregate) and g31's skew-stats pass (ring-exploded count vs
  * center-count + offset aggregate) — so the comparison is immune to
  * the host's cross-run window drift. */
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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SCRATCH $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    graft.SparkEntry.entry(spark).count()

    // ---- p49 evalGrams: OLD distinct+collect vs NEW kernel treeAggregate
    val docs = graft.QueryLib.tbl(spark, dir, "documents")
    val evalDocs = docs.filter(col("doc_id") % 89 === 0)
    for (rep <- 1 to 4) {
      time(s"evalGrams OLD(distinct+collect) #$rep") {
        val n = evalDocs
          .select(explode(graft.pipeline.Dedup.shingles(col("text"), 13)).as("g"))
          .distinct().limit(10000001).collect().length
        print(s"  n=$n ")
      }
      time(s"evalGrams NEW(kernel treeAgg)    #$rep") {
        val bc = graft.streaming.StreamDecontaminate.evalGrams(evalDocs, "text", 13)
        print(s"  n=${bc.value.size} ")
        bc.destroy()
      }
    }

    // ---- g31 stats pass: OLD ring-exploded count vs NEW offset aggregate
    val a = TableGeometrySource(s"$dir/part.parquet", "p_partkey", Seq(),
      geomWktExpr = Some(
        "concat('POINT (', 4.5 + (p_partkey % 50) * 0.0009765625, ' ', " +
          "51.9 + cast(p_partkey / 50 as int) * 0.00048828125, ')')"),
      proj = "EPSG:4326").frame(GeometryRequest())(spark)
    val b = TableGeometrySource(s"$dir/customer.parquet", "c_custkey", Seq(),
      geomWktExpr = Some(
        "concat('POINT (', 4.5 + (c_custkey % 60) * 0.0009765625, ' ', " +
          "51.9 + cast(c_custkey / 60 as int) * 0.000244140625, ')')"),
      proj = "EPSG:4326").frame(GeometryRequest())(spark)
    val cellSize = 0.0029296875
    val rings = 1
    def cid(cx: Long, cy: Long): Long = (cx << 32) | (cy & 0xFFFFFFFFL)
    val cellOf = udf { (x: Double, y: Double) =>
      cid(math.floor(x / cellSize).toLong, math.floor(y / cellSize).toLong)
    }
    val ringCells = udf { (x: Double, y: Double) =>
      val cx = math.floor(x / cellSize).toLong
      val cy = math.floor(y / cellSize).toLong
      (for (dx <- -rings to rings; dy <- -rings to rings)
        yield cid(cx + dx, cy + dy)).toArray
    }
    val shiftCells = udf { (c: Long) =>
      val cx = c >> 32; val cy = c.toInt.toLong
      (for (dx <- -rings to rings; dy <- -rings to rings)
        yield cid(cx + dx, cy + dy)).toArray
    }
    def cents(df: org.apache.spark.sql.DataFrame, fid: String, x: String, y: String) =
      df.select(col("fid").as(fid),
        GeomFunctions.stCentroidX(col("geometry")).as(x),
        GeomFunctions.stCentroidY(col("geometry")).as(y))
    val saltAbove = 100000
    for (rep <- 1 to 4) {
      time(s"g31 stats OLD(ring explode)   #$rep") {
        val lC = cents(a, "a_fid", "ax", "ay")
          .select(explode(ringCells(col("ax"), col("ay"))).as("cell"))
        val rC = cents(b, "b_fid", "bx", "by")
          .select(cellOf(col("bx"), col("by")).as("cell"))
        val n = lC.select(col("cell"), lit(0).as("_side"))
          .unionAll(rC.select(col("cell"), lit(1).as("_side")))
          .groupBy("cell", "_side").agg(count(lit(1)).as("_n"))
          .filter(col("_n") > saltAbove).limit(65537).collect().length
        print(s"  hot=$n ")
      }
      time(s"g31 stats NEW(offset agg)     #$rep") {
        val lCounts = cents(a, "a_fid", "ax", "ay")
          .select(cellOf(col("ax"), col("ay")).as("cell"))
          .groupBy("cell").agg(count(lit(1)).as("_c"))
          .select(explode(shiftCells(col("cell"))).as("cell"), col("_c"))
          .groupBy("cell").agg(sum(col("_c")).as("_n"))
          .select(col("cell"), lit(0).as("_side"), col("_n"))
        val rCounts = cents(b, "b_fid", "bx", "by")
          .select(cellOf(col("bx"), col("by")).as("cell"))
          .groupBy("cell").agg(count(lit(1)).as("_n"))
          .select(col("cell"), lit(1).as("_side"), col("_n"))
        val n = lCounts.unionAll(rCounts)
          .filter(col("_n") > saltAbove).limit(65537).collect().length
        print(s"  hot=$n ")
      }
    }
    spark.stop()
  }
}
