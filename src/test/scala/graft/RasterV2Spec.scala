package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.raster.{Bbox, Grib, Zarr}

/** DataSource V2 connector: executor-side decode, frame-partition
  * pruning under temporal pushdown, directory expansion. */
class RasterV2Spec extends SparkSpec {

  private def writeGrib(path: String, frames: Seq[Array[Double]],
      w: Int, h: Int): Unit =
    Grib.write(path, frames, w, h, Double.MaxValue,
      frames.indices.map(_ * 3600000L), 0.0, 0.0, 0.05)

  test("graft-raster reads a GRIB stack with exact tile values") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val w = 7; val h = 5
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => (t * 1000 + i).toDouble))
    writeGrib(s"$dir/s.grib2", frames, w, h)
    val df = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    assert(df.columns.toSeq == Seq("path", "t", "ty", "tx", "values"))
    val rows = df.orderBy("t").collect()
    assert(rows.length == 3) // one 256-tile covers the 7x5 grid
    for ((r, t) <- rows.zipWithIndex) {
      assert(r.getLong(1) == t * 3600000L)
      assert(r.getSeq[Double](4) == frames(t).toSeq)
    }
  }

  test("temporal pushdown prunes whole (file, frame) partitions") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2p").toString
    writeGrib(s"$dir/s.grib2",
      Seq.tabulate(4)(t => Array.fill(4)(t.toDouble)), 2, 2)
    val df = sp.read.format("graft-raster").load(s"$dir/s.grib2")
    assert(df.rdd.getNumPartitions == 4)
    val sliced = df.filter(col("t") >= 3600000L && col("t") <= 7200000L)
    // one partition per surviving frame: the filter reached planning
    assert(sliced.rdd.getNumPartitions == 2,
      sliced.queryExecution.executedPlan.toString)
    assert(sliced.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 3.0) // frames 1 + 2
  }

  test("a directory expands to its GRIB files; Zarr stores read too") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2d").toString
    writeGrib(s"$dir/a.grib2", Seq(Array.fill(4)(1.0)), 2, 2)
    writeGrib(s"$dir/b.grib2", Seq(Array.fill(4)(2.0)), 2, 2)
    Zarr.write(s"$dir/c.zarr", Seq(Array.fill(4)(3.0)), 2, 2,
      Bbox(0, 0, 2, 2), -9.0, "EPSG:28992", Seq(0L))
    val df = sp.read.format("graft-raster").load(dir)
    assert(df.count() == 3)
    assert(df.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 6.0)
    // per-path provenance survives
    assert(df.select(countDistinct(col("path"))).collect()(0).getLong(0) == 3)
  }

  test("unknown layouts fail loudly by name") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dsv2f").toString
    Files.writeString(Paths.get(s"$dir/x.bin"), "not a raster")
    val e = intercept[Exception] {
      sp.read.format("graft-raster").load(s"$dir/x.bin").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("graft-raster")), e.getMessage)
    val e2 = intercept[Exception] {
      sp.read.format("graft-raster")
        .load(Files.createTempDirectory("graft_dsv2e").toString).collect()
    }
    assert(msgs(e2).exists(_.contains("no GRIB files or Zarr stores")))
  }
}
