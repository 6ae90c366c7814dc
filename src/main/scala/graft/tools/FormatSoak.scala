package graft.tools

import org.apache.spark.sql.SparkSession
import graft.raster._

/** Size soak for the round-8 stack codecs: a 2000×2000×4 float64 stack
  * (128 MB of pixels) through Zarr / HDF5 / NetCDF write+read, plus a
  * sliced read, timing each leg. Prints one JSON line per leg. */
object FormatSoak {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val W = 2000; val H = 2000; val F = 4
    val bands = (0 until F).map(f =>
      Array.tabulate(W * H)(i => (i % 977) * 1.0 + f))
    val mem = MemorySource(bands, W, H, -9999, "EPSG:28992", 1.0,
      0, H, 0L, Some(3600000L), "float64")
    val req = RasterRequest(Bbox(0, 0, W, H), "EPSG:28992", W, H,
      Some(java.time.Instant.ofEpochMilli(0)),
      Some(java.time.Instant.ofEpochMilli(3L * 3600000L)))
    val slice = req.copy(start = Some(java.time.Instant.ofEpochMilli(3600000L)),
      stop = Some(java.time.Instant.ofEpochMilli(3600000L)))
    val dir = java.nio.file.Files.createTempDirectory("fmt_soak").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"leg":"$name","sec":${(System.nanoTime()-t0)/1e9}%.2f}""")
      r
    }
    t("zarr_write") { ZarrSink(mem, s"$dir/s.zarr").write(req) }
    val z = ZarrSource(s"$dir/s.zarr")
    t("zarr_read_full") { assert(z.getData(req).get.values.length == F) }
    t("zarr_read_slice") {
      assert(ZarrSource(s"$dir/s.zarr").getData(slice).get.values.length == 1) }
    t("hdf5_write") { Hdf5Sink(mem, s"$dir/s.nc").write(req) }
    t("hdf5_read_full") {
      assert(Hdf5Source(s"$dir/s.nc").getData(req).get.values.length == F) }
    t("hdf5_read_slice") {
      assert(Hdf5Source(s"$dir/s.nc").getData(slice).get.values.length == 1) }
    t("netcdf_write") { NetCdfSink(mem, s"$dir/c.nc").write(req) }
    t("netcdf_read_full") {
      assert(NetCdfSource(s"$dir/c.nc").getData(req).get.values.length == F) }
    t("netcdf_read_slice") {
      assert(NetCdfSource(s"$dir/c.nc").getData(slice).get.values.length == 1) }
    def mb(p: String): Long = {
      val f = new java.io.File(p)
      (if (f.isDirectory) f.listFiles.map(x => if (x.isDirectory)
        x.listFiles.map(_.length).sum else x.length).sum
       else f.length) / (1 << 20)
    }
    println(s"""{"sizes_mb":{"zarr":${mb(s"$dir/s.zarr")},"hdf5":${mb(s"$dir/s.nc")},"netcdf":${mb(s"$dir/c.nc")}}}""")
    spark.stop()
  }
}
