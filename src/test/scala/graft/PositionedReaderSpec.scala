package graft

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{FileIO, PositionedReader}
import graft.raster.{Bbox, Grib, Hdf5, Hdf5Write, Zarr}

/** The positioned-read I/O layer: local `FileChannel` vs Hadoop
  * `FSDataInputStream` backends must be byte-identical AND issue the
  * identical read sequences — that identity is what carries every
  * byte-range-pruning claim (header-only planning, chunk-pruned AOI
  * reads) onto object storage unchanged. */
class PositionedReaderSpec extends SparkSpec {

  /** Wraps a reader, recording every (position, bytesRequested). */
  private final class Recording(under: PositionedReader)
      extends PositionedReader {
    val reads = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    override def size(): Long = under.size()
    override def read(dst: ByteBuffer, position: Long): Int = {
      reads += ((position, dst.remaining()))
      under.read(dst, position)
    }
    override def close(): Unit = under.close()
  }

  test("scheme detection: URLs route to Hadoop, bare paths stay local") {
    assert(FileIO.hasScheme("file:///tmp/x.nc"))
    assert(FileIO.hasScheme("file:/tmp/x.nc"))
    assert(FileIO.hasScheme("hdfs://nn:8020/data/a.grib2"))
    assert(FileIO.hasScheme("s3a://bucket/key/stack.zarr"))
    assert(!FileIO.hasScheme("/tmp/x.nc"))
    assert(!FileIO.hasScheme("relative/path.tif"))
    assert(!FileIO.hasScheme("weird:name/with:colons")) // no slash after :
  }

  test("local and file:// backends read identical bytes, same EOF rule") {
    val p = Files.createTempFile("pr_bytes", ".bin")
    val data = Array.tabulate[Byte](70000)(i => (i * 31 + 7).toByte)
    Files.write(p, data)
    val local = PositionedReader.open(p.toString)
    val hadoop = PositionedReader.open(s"file://$p")
    try {
      assert(local.size() == data.length && hadoop.size() == data.length)
      for ((off, len) <- Seq((0L, 16), (65521L, 4000), (69999L, 16),
          (1234L, 1), (0L, 70000))) {
        val a = ByteBuffer.allocate(len); val b = ByteBuffer.allocate(len)
        val na = local.read(a, off); val nb = hadoop.read(b, off)
        // the Hadoop side may fill fully where FileChannel short-reads;
        // both must agree on the bytes that ARE read from each offset
        val got = math.min(na, nb)
        assert(got > 0, s"read at $off returned $na/$nb")
        assert(a.array().take(got).toSeq == b.array().take(got).toSeq,
          s"byte mismatch at offset $off")
      }
      // at/past EOF both return -1 (the FileChannel contract)
      val e = ByteBuffer.allocate(8)
      assert(local.read(e, 70000L) == -1 && hadoop.read(e, 70000L) == -1)
      assert(local.read(e, 99999L) == -1 && hadoop.read(e, 99999L) == -1)
    } finally { local.close(); hadoop.close() }
  }

  test("HDF5 header walk + windowed chunk read issue the SAME " +
      "positioned reads through both backends") {
    val dir = Files.createTempDirectory("pr_h5").toString
    val p = s"$dir/stack.nc"
    val w = 64; val h = 64
    val bands = Seq.tabulate(2)(t =>
      Array.tabulate(w * h)(i => (t * 1000 + i).toDouble))
    Hdf5Write.write(p, bands, w, h, Bbox(0, 0, 8, 8), 255.0,
      "EPSG:28992", Seq(0L, 3600000L), "float64", chunkRows = 16)
    def drive(url: String): (Seq[(Long, Int)], Seq[(Long, Int)], Array[Double]) = {
      val meta = new Recording(PositionedReader.open(url))
      val m = try Hdf5.readMeta(meta, url) finally meta.close()
      val data = new Recording(PositionedReader.open(url))
      // AOI window: top-left quarter -> only its chunks' byte ranges
      val frame = try Hdf5.readFrames(data, m, Seq(1),
        Some((0, 32, 0, 32))).head finally data.close()
      (meta.reads.toSeq, data.reads.toSeq, frame)
    }
    val (mLocal, dLocal, fLocal) = drive(p)
    val (mHadoop, dHadoop, fHadoop) = drive(s"file://$p")
    assert(mLocal == mHadoop, "metadata read sequences diverge")
    assert(dLocal == dHadoop, "windowed data read sequences diverge")
    // header-only planning: the metadata walk reads a small prefix of
    // the file's bytes, never the chunk payloads
    val fileLen = Files.size(Paths.get(p))
    val metaBytes = mLocal.map(_._2.toLong).sum
    assert(metaBytes < fileLen / 4,
      s"metadata walk read $metaBytes of $fileLen bytes")
    // the windowed read decodes the requested quarter identically
    for (r <- 0 until 32; c <- 0 until 32)
      assert(fLocal(r * w + c) == fHadoop(r * w + c))
    assert(fLocal(0) == 1000.0)
  }

  test("DSv2 connector: r59-shape GRIB read through a file:// Hadoop " +
      "path matches the local-path read") {
    val sp = spark
    val dir = Files.createTempDirectory("pr_dsv2").toString
    val w = 7; val h = 5
    val frames = Seq.tabulate(3)(t =>
      Array.tabulate(w * h)(i => (t * 1000 + i).toDouble))
    Grib.write(s"$dir/s.grib2", frames, w, h, Double.MaxValue,
      frames.indices.map(_ * 3600000L), 0.0, 0.0, 0.05)
    def readAll(url: String): Seq[(Long, Int, Int, Seq[Double])] =
      sp.read.format("graft-raster").load(url)
        .select(col("t"), col("ty"), col("tx"), col("values"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getSeq[Double](3))).toSeq.sortBy(x => (x._1, x._2, x._3))
    val viaLocal = readAll(s"$dir/s.grib2")
    val viaHadoop = readAll(s"file://$dir/s.grib2")
    assert(viaLocal.nonEmpty && viaLocal == viaHadoop)
    // directory expansion (planner listing) through the Hadoop backend
    val viaHadoopDir = readAll(s"file://$dir")
    assert(viaHadoopDir == viaLocal)
  }

  test("block API: RasterFileSource dispatches and decodes file:// " +
      "URLs for every format family") {
    val sp = spark
    val dir = Files.createTempDirectory("pr_block").toString
    val w = 6; val h = 4
    val vals = Array.tabulate(w * h)(_ * 1.0)
    import graft.raster._
    // GRIB2, GeoTIFF, NetCDF, HDF5, Zarr store, ASCII grid (+ .prj)
    Grib.write(s"$dir/s.grib2", Seq(vals), w, h, Double.MaxValue,
      Seq(0L), 0.0, 0.0, 0.05)
    GeoTiff.write(s"$dir/s.tif", vals, w, h, Bbox(0, 0, 6, 4), 28992,
      -9999.0)
    NetCdf.write(s"$dir/s.nc", Seq(vals), w, h, Bbox(0, 0, 6, 4),
      -9999.0, "EPSG:28992", Seq(0L))
    Hdf5Write.write(s"$dir/s4.nc", Seq(vals), w, h, Bbox(0, 0, 6, 4),
      -9999.0, "EPSG:28992", Seq(0L))
    Zarr.write(s"$dir/s.zarr", Seq(vals), w, h, Bbox(0, 0, 6, 4),
      -9999.0, "EPSG:28992", Seq(0L))
    AsciiGrid.write(s"$dir/s.asc", vals, w, h, Bbox(0, 0, 6, 4),
      -9999.0, "EPSG:28992")
    val req = RasterRequest(Bbox(0, 0, 6, 4), "EPSG:28992", w, h,
      None, None)
    val reqLl = RasterRequest(Bbox(0.0, 0.0, 0.3, 0.2), "EPSG:4326",
      w, h, None, None)
    for (name <- Seq("s.grib2", "s.tif", "s.nc", "s4.nc", "s.zarr",
        "s.asc")) {
      val src = RasterFileSource(s"file://$dir/$name")
      val r = if (name == "s.grib2") reqLl else req
      val got = src.getData(r)(sp).get.values.head
      assert(got.toSeq == vals.toSeq, name)
    }
  }

  test("DSv2 connector: r61-shape temporal pushdown and a Zarr store " +
      "through file:// prune exactly as locally") {
    val sp = spark
    val dir = Files.createTempDirectory("pr_dsv2z").toString
    Grib.write(s"$dir/s.grib2",
      Seq.tabulate(4)(t => Array.fill(4)(t.toDouble)), 2, 2,
      Double.MaxValue, (0 until 4).map(_ * 3600000L), 0.0, 0.0, 0.05)
    val sliced = sp.read.format("graft-raster").load(s"file://$dir/s.grib2")
      .filter(col("t") >= 3600000L && col("t") <= 7200000L)
    // planning-time partition pruning works identically over Hadoop
    assert(sliced.rdd.getNumPartitions == 2,
      sliced.queryExecution.executedPlan.toString)
    assert(sliced.select(sum(element_at(col("values"), 1)))
      .collect()(0).getDouble(0) == 3.0)

    val zdir = s"$dir/c.zarr"
    Zarr.write(zdir, Seq(Array.tabulate(4)(_.toDouble)), 2, 2,
      Bbox(0, 0, 2, 2), -9.0, "EPSG:28992", Seq(0L))
    val z = sp.read.format("graft-raster").load(s"file://$zdir")
      .select(col("t"), col("ty"), col("tx"), col("values")).collect()
    assert(z.length == 1 && z(0).getSeq[Double](3) == Seq(0.0, 1.0, 2.0, 3.0))
  }

  test("readFully: 0-byte reads retry (legal short transfer, not EOF), " +
      "a negative return is EOF, an endless 0 stream fails loudly") {
    // a backend that answers every other call with a legal 0-byte
    // transfer — readFully must ride through and still fill the buffer
    class Stutter(data: Array[Byte]) extends PositionedReader {
      var calls = 0
      override def size(): Long = data.length.toLong
      override def read(dst: ByteBuffer, position: Long): Int = {
        calls += 1
        if (position >= data.length) return -1
        if (calls % 2 == 1) return 0 // legal: nothing transferred
        val n = math.min(dst.remaining(), data.length - position.toInt)
        dst.put(data, position.toInt, n)
        n
      }
      override def close(): Unit = ()
    }
    val payload = Array.tabulate[Byte](32)(_.toByte)
    val b = ByteBuffer.allocate(16)
    val end = PositionedReader.readFully(new Stutter(payload), 8L, b)
    assert(end == 24L)
    assert(b.array().toSeq == payload.slice(8, 24).toSeq)
    // past EOF -> EOFException (negative return), not a hang
    intercept[java.io.EOFException] {
      PositionedReader.readFully(new Stutter(payload), 40L,
        ByteBuffer.allocate(4))
    }
    // a transport stuck at 0 forever fails loudly instead of spinning
    class Stuck extends PositionedReader {
      override def size(): Long = 100L
      override def read(dst: ByteBuffer, position: Long): Int = 0
      override def close(): Unit = ()
    }
    val ex = intercept[java.io.IOException] {
      PositionedReader.readFully(new Stuck, 0L, ByteBuffer.allocate(4))
    }
    assert(ex.getMessage.contains("stuck"), ex.getMessage)
    // the FlatGeobuf read primitive rides the same semantics
    val viaFgb = graft.geometry.FgbMeta.readAt(new Stutter(payload), 4L, 8)
    assert(viaFgb.toSeq == payload.slice(4, 12).toSeq)

    // end to end: a REAL header + R-tree walk through a stuttering
    // backend decodes identically to the clean read
    val sp = spark
    import sp.implicits._
    import graft.geometry._
    val dir = Files.createTempDirectory("stutter_fgb").toString
    val url = s"$dir/s.fgb"
    FlatGeobufSink.writeStream(
      Seq((1L, "a", "POINT (1 2)"), (2L, "b", "POINT (3 4)"))
        .toDF("fid", "name", "wkt")
        .select(col("fid"), col("name"),
          GeomFunctions.stGeomFromWkt(col("wkt")).as("geometry")),
      "EPSG:28992", url)(sp)
    val bytes = Files.readAllBytes(Paths.get(url))
    val clean = FgbMeta.read(url)
    val stuttered = FgbMeta.read(url, new Stutter(bytes))
    assert(stuttered.numItems == clean.numItems &&
      stuttered.offsets.toSeq == clean.offsets.toSeq &&
      stuttered.cols == clean.cols)
  }

  test("positional geometry codecs (shapefile, GeoPackage, MapInfo TAB) " +
      "decode file:// URLs identically to local paths") {
    val sp = spark
    import graft.geometry._
    val dir = Files.createTempDirectory("pr_geom").toString
    val src = GeometryFixtures.features
    def rows(url: String): Seq[(Long, String)] =
      GeometryFileSource(url).frame(GeometryRequest())(sp)
        .select(col("fid"),
          GeomFunctions.stAsWkt(col("geometry")).as("wkt"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    for (name <- Seq("f.shp", "f.gpkg", "f.tab", "f.geojson", "f.gml",
        "f.csv", "f.kml")) {
      GeometryToFile.toFile(src, s"$dir/$name")
      assert(rows(s"file://$dir/$name") == rows(s"$dir/$name"), name)
    }
    // geoparquet: the schema PROBE (parquet footer of one part) must be
    // scheme-aware like the data path — columns and rows agree across
    // bare and file:// URLs
    val store = s"$dir/gp_store"
    GeometryToFile.toFile(src, store)
    val local = GeoParquetSource(store)
    val scheme = GeoParquetSource(s"file://$store")
    assert(scheme.columns == local.columns, scheme.columns)
    assert(scheme.columns.contains("geometry") && scheme.columns.size > 1,
      scheme.columns)
    def gpRows(s: GeoParquetSource): Seq[(Long, String)] =
      s.frame(GeometryRequest())(sp)
        .select(col("fid"),
          GeomFunctions.stAsWkt(col("geometry")).as("wkt"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(gpRows(scheme) == gpRows(local))
  }
}
