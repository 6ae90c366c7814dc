package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Round-14 focus:
  * the positioned-read I/O layer (file:// through block API + DSv2 read
  * AND write), the bbox AOI pushdown, and GRIB1 second-order packing.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.raster._

    val dir = java.nio.file.Files.createTempDirectory("scr_r14").toString
    val w = 600; val h = 520
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => ((t * 13 + i) % 991).toDouble))

    // ---- GRIB1 second-order (16-bit P2 caps points at 65535: use a
    // sub-64k grid), block-API read through file://
    Grib.writeEdition1(s"$dir/so.grib",
      frames.map(_.take(240 * 260)), 240, 260, Double.MaxValue,
      Seq(0L, 3600000L, 7200000L), 0.0, 0.0, 0.05, secondOrder = true)
    val g1 = RasterFileSource(s"file://$dir/so.grib")
    println(s"grib1-so file://: times=${g1.allTimes.size} " +
      s"cell=${g1.cellSize.get}")
    // the big archive lanes below use edition 2
    Grib.write(s"$dir/big.grib2", frames, w, h, Double.MaxValue,
      Seq(0L, 3600000L, 7200000L), 0.0, 0.0, 0.05)

    // ---- DSv2: bbox pushdown over the same archive
    val df = spark.read.format("graft-raster")
      .option("bbox", "25.65,0,29.0,26.0") // tile column tx=2 only
      .load(s"file://$dir/big.grib2")
    val n = df.count()
    println(s"dsv2 bbox: rows=$n (want 9 = 3 frames x 3 ty x tx=2)")
    assert(n == 9)

    // ---- DSv2 write path: full read -> sharded Zarr v3 -> read back
    spark.read.format("graft-raster").load(s"$dir/big.grib2")
      .write.format("graft-raster").mode("append")
      .option("width", w.toString).option("height", h.toString)
      .option("x0", "0").option("y0", "0").option("cell", "0.05")
      .option("projection", "EPSG:4326").save(s"$dir/out.zarr")
    val back = spark.read.format("graft-raster").load(s"$dir/out.zarr")
    val sums = back.groupBy("t")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "aggregate(values, cast(0.0 as double), (a, x) -> a + x)")))
      .orderBy("t").collect().map(_.getDouble(1))
    val want = frames.map(_.sum)
    println(s"write roundtrip sums: got=${sums.toSeq} want=${want.toSeq}")
    assert(sums.toSeq == want.toSeq)

    // ---- bbox prunes whole band files
    NetCdf.write(s"$dir/top.nc", Seq(frames.head.take(w * 260)), w, 260,
      Bbox(0, 13, 30, 26), -9999.0, "EPSG:4326", Seq(0L))
    NetCdf.write(s"$dir/bot.nc", Seq(frames.head.drop(w * 260)), w, 260,
      Bbox(0, 0, 30, 13), -9999.0, "EPSG:4326", Seq(0L))
    val bands = spark.read.format("graft-raster")
      .option("bbox", "0,0,30,13")
      .load(s"$dir/top.nc", s"$dir/bot.nc")
    println(s"band prune: partitions=${bands.rdd.getNumPartitions} (want 1)")
    assert(bands.rdd.getNumPartitions == 1)

    println("scratch r14: I/O layer + bbox + write path OK")
    spark.stop()
  }
}
