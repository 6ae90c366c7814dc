package graft

import java.nio.file.Files
import graft.raster._
import RasterFixtures._

class GeoTiffSpec extends SparkSpec {

  test("GeoTIFF codec round-trips values, georeferencing and nodata") {
    val dir = Files.createTempDirectory("graft_tiff").toString
    val vals = Array.tabulate(12)(_.toDouble)
    GeoTiff.write(s"$dir/a.tif", vals, 4, 3, Bbox(10, 20, 14, 23), 28992, -9999.0)
    val t = GeoTiff.read(s"$dir/a.tif")
    assert(t.values.toSeq == vals.toSeq)
    assert(t.w == 4 && t.h == 3)
    assert(t.bbox == Bbox(10, 20, 14, 23))
    assert(t.epsg == 28992 && t.noData == -9999.0)
  }

  test("a raster taller than 65535 rows round-trips: dimension tags " +
      "promote SHORT->LONG instead of truncating mod 2^16") {
    // 75000 rows wrote ImageLength=9464 before the fix (sf30 soak's
    // mosaic lane); keep width tiny so the spec stays sub-second
    val dir = Files.createTempDirectory("graft_tiff_tall").toString
    val w = 2; val h = 70001
    val vals = Array.tabulate(w * h)(i => (i % 9973).toDouble)
    GeoTiff.write(s"$dir/tall.tif", vals, w, h, Bbox(0, 0, w, h), 28992, -1.0)
    val t = GeoTiff.read(s"$dir/tall.tif")
    assert(t.w == w && t.h == h)
    assert(t.values.length == w * h)
    assert(t.values(0) == 0.0 && t.values(w * h - 1) == ((w * h - 1) % 9973).toDouble)
  }

  test("BigTIFF and big-endian fixtures decode exactly (independent encoder)") {
    // fixtures from tools/make_bigtiff_fixture.py — BigTIFF (version 43,
    // 20-byte entries, LONG8 offset arrays) and MM-order classic TIFF
    // written from the published specs independently of this reader
    val f64 = GeoTiff.read(getClass.getResource("/bigtiff_le_f64.tif").getPath)
    assert(f64.w == 40 && f64.h == 30 && f64.dtypeName == "float64")
    assert((0 until 30).forall(y => (0 until 40).forall(x =>
      f64.values(y * 40 + x) == x * 1.5 - y * 0.75)))
    assert(f64.epsg == 28992)

    // big-endian BigTIFF: multi-byte sample decode + predictor 2 in BE
    val u16 = GeoTiff.read(getClass.getResource("/bigtiff_be_u16.tif").getPath)
    assert(u16.w == 48 && u16.h == 32 && u16.dtypeName == "uint16")
    assert((0 until 32).forall(y => (0 until 48).forall(x =>
      u16.values(y * 48 + x) == ((x * 523 + y * 7817) % 65521).toDouble)))

    // big-endian classic with a 2-byte INLINE ASCII GDAL_NODATA — the
    // inline-vs-offset value resolution edge
    val u8 = GeoTiff.read(getClass.getResource("/classic_be_u8.tif").getPath)
    assert(u8.w == 60 && u8.h == 25 && u8.dtypeName == "uint8")
    assert(u8.noData == 7.0)
    assert((0 until 25).forall(y => (0 until 60).forall(x =>
      u8.values(y * 60 + x) == ((x * 11 + y * 29) % 251).toDouble)))
    assert(u8.bbox == Bbox(135000.0, 456000.0 - 25 * 0.5, 135000.0 + 60 * 0.5, 456000.0))
  }

  test("floating-point predictor (3) fixtures decode bit-exactly") {
    // TechNote 3 byte-plane differencing, fixtures from
    // tools/make_bigtiff_fixture.py (independent spec-derived encoder)
    val f32 = GeoTiff.read(getClass.getResource("/fp_pred_f32.tif").getPath)
    assert(f32.w == 64 && f32.h == 20 && f32.dtypeName == "float32")
    assert((0 until 20).forall(y => (0 until 64).forall(x =>
      f32.values(y * 64 + x) == (x * 0.25f - y * 8.5f).toDouble)))

    val f64 = GeoTiff.read(getClass.getResource("/fp_pred_f64.tif").getPath)
    assert(f64.w == 30 && f64.h == 22 && f64.dtypeName == "float64")
    assert((0 until 22).forall(y => (0 until 30).forall(x =>
      f64.values(y * 30 + x) == x * 1.125 + y * 0.0625 - 100.0)))
  }

  test("GeoTIFF PackBits fixtures decode byte-exactly (independent encoder)") {
    // fixtures from tools/make_packbits_fixture.py — a spec-derived TIFF
    // PackBits encoder (literal/repeat runs, per-row packing, 128-byte run
    // cap) written independently of the Scala decoder; both meet only at
    // TIFF 6.0 §9
    val u8 = GeoTiff.read(getClass.getResource("/packbits_uint8.tif").getPath)
    assert(u8.w == 200 && u8.h == 60 && u8.epsg == 28992)
    assert(u8.dtypeName == "uint8")
    assert((0 until 60).forall(y => (0 until 200).forall { x =>
      val v = (x / 40) * 50 + (if ((x * 31 + y * 17) % 23 == 0) 7 else 0)
      u8.values(y * 200 + x) == v.toDouble
    }))

    val f64 = GeoTiff.read(getClass.getResource("/packbits_f64.tif").getPath)
    assert(f64.w == 50 && f64.h == 40 && f64.dtypeName == "float64")
    assert((0 until 40).forall(y => (0 until 50).forall { x =>
      f64.values(y * 50 + x) == x * 0.25 - y * 2.0 + (if (x == y) 1.0 else 0.0)
    }))
    assert(f64.bbox == Bbox(135000.0, 456000.0 - 40 * 0.5, 135000.0 + 50 * 0.5, 456000.0))
  }

  test("GeoTIFF LZW fixtures decode bit-exactly (independent encoder)") {
    // fixtures from tools/make_lzw_fixture.py — a spec-derived TIFF-LZW
    // encoder (MSB-first, early change, predictor 2) written independently
    // of the Scala decoder; both meet only at TIFF 6.0 §13
    val u8 = GeoTiff.read(getClass.getResource("/lzw_uint8.tif").getPath)
    assert(u8.w == 100 && u8.h == 40 && u8.epsg == 28992)
    assert(u8.dtypeName == "uint8")
    assert((0 until 40).forall(y => (0 until 100).forall(x =>
      u8.values(y * 100 + x) == ((x * 7 + y * 13) % 251).toDouble)))

    val u16 = GeoTiff.read(getClass.getResource("/lzw_uint16.tif").getPath)
    assert(u16.w == 64 && u16.h == 48 && u16.dtypeName == "uint16")
    assert((0 until 48).forall(y => (0 until 64).forall(x =>
      u16.values(y * 64 + x) == ((x * 531 + y * 7919) % 65521).toDouble)))

    val f64 = GeoTiff.read(getClass.getResource("/lzw_f64.tif").getPath)
    assert(f64.w == 60 && f64.h == 30 && f64.dtypeName == "float64")
    assert((0 until 30).forall(y => (0 until 60).forall(x =>
      f64.values(y * 60 + x) == x * 0.5 + y * 1.25)))
    assert(f64.bbox == Bbox(135000.0, 456000.0 - 30 * 0.5, 135000.0 + 60 * 0.5, 456000.0))

    // high-entropy single strip: the code stream walks 9→12-bit widths and
    // hits the 4094-entry table reset — the early-change danger zones
    def lcgByte(x: Int, y: Int): Int = {
      var s = (y * 128 + x + 1) & 0x7FFFFFFF
      var i = 0
      while (i < 2) { s = (s * 1103515245 + 12345) & 0x7FFFFFFF; i += 1 }
      (s >> 16) & 0xFF
    }
    val noise = GeoTiff.read(getClass.getResource("/lzw_noise.tif").getPath)
    assert(noise.w == 128 && noise.h == 128 && noise.dtypeName == "uint8")
    assert((0 until 128).forall(y => (0 until 128).forall(x =>
      noise.values(y * 128 + x) == lcgByte(x, y).toDouble)))
  }

  test("GeoTIFF codec round-trips every sample type") {
    val dir = Files.createTempDirectory("graft_tiff_dtypes").toString
    val ints = Array.tabulate(12)(i => (i * 37 % 200).toDouble)
    for (dt <- Seq("float64", "float32", "int32", "int16", "uint8", "uint16")) {
      GeoTiff.write(s"$dir/$dt.tif", ints, 4, 3, Bbox(0, 0, 4, 3), 28992, 255.0, dt)
      val t = GeoTiff.read(s"$dir/$dt.tif")
      assert(t.dtypeName == dt, dt)
      assert(t.values.toSeq == ints.toSeq, dt)
    }
    // fractional float32 survives at float precision
    val fracs = Array.tabulate(12)(i => i + 0.25)
    GeoTiff.write(s"$dir/f32.tif", fracs, 4, 3, Bbox(0, 0, 4, 3), 28992, -1.0, "float32")
    assert(GeoTiff.read(s"$dir/f32.tif").values.toSeq ==
      fracs.map(v => v.toFloat.toDouble).toSeq)
    // signed ints keep their sign; unsigned wrap like numpy uint8
    GeoTiff.write(s"$dir/neg.tif", Array.fill(12)(-7.0), 4, 3,
      Bbox(0, 0, 4, 3), 28992, 0.0, "int16")
    assert(GeoTiff.read(s"$dir/neg.tif").values.forall(_ == -7.0))
  }

  test("GeoTIFF multi-strip layout round-trips (rowsPerStrip < height)") {
    val dir = Files.createTempDirectory("graft_tiff_strips").toString
    val (w, h) = (7, 11)
    val vals = Array.tabulate(w * h)(i => (i % 251).toDouble)
    GeoTiff.write(s"$dir/s.tif", vals, w, h, Bbox(0, 0, w, h), 28992, -1.0,
      "float64", rowsPerStrip = 3) // 4 strips, last one ragged (2 rows)
    val t = GeoTiff.read(s"$dir/s.tif")
    assert(t.w == w && t.h == h)
    assert(t.values.toSeq == vals.toSeq)
    // uint8 multi-strip too (1-byte samples exercise the offset math)
    GeoTiff.write(s"$dir/s8.tif", vals, w, h, Bbox(0, 0, w, h), 28992, 255.0,
      "uint8", rowsPerStrip = 4)
    assert(GeoTiff.read(s"$dir/s8.tif").values.toSeq == vals.toSeq)
  }

  test("GeoTIFF deflate compression round-trips, striped and tiled") {
    val dir = Files.createTempDirectory("graft_tiff_deflate").toString
    val (w, h) = (37, 23)
    val vals = Array.tabulate(w * h)(i => ((i * 31) % 97).toDouble)
    // striped + deflate, multiple strips
    GeoTiff.write(s"$dir/d.tif", vals, w, h, Bbox(0, 0, w, h), 28992, -1.0,
      "float64", rowsPerStrip = 5, compression = "deflate")
    val d = GeoTiff.read(s"$dir/d.tif")
    assert(d.values.toSeq == vals.toSeq && d.w == w && d.h == h)
    // deflate actually shrinks this repetitive raster
    assert(Files.size(java.nio.file.Paths.get(s"$dir/d.tif")) < w * h * 8)
    // tiled + deflate, ragged edge tiles (37x23 with 16px tiles)
    GeoTiff.write(s"$dir/t.tif", vals, w, h, Bbox(5, 7, 5 + w, 7 + h), 28992,
      -1.0, "float64", compression = "deflate", tileSize = 16)
    val t = GeoTiff.read(s"$dir/t.tif")
    assert(t.values.toSeq == vals.toSeq)
    assert(t.bbox == Bbox(5, 7, 5 + w, 7 + h) && t.epsg == 28992)
    // tiled uncompressed, uint16 (2-byte samples exercise tile offsets)
    GeoTiff.write(s"$dir/tu.tif", vals, w, h, Bbox(0, 0, w, h), 28992, 255.0,
      "uint16", tileSize = 32)
    assert(GeoTiff.read(s"$dir/tu.tif").values.toSeq == vals.toSeq)
    // single-tile image (tile larger than the raster)
    GeoTiff.write(s"$dir/one.tif", vals.take(12), 4, 3, Bbox(0, 0, 4, 3),
      28992, -1.0, "float32", compression = "deflate", tileSize = 16)
    assert(GeoTiff.read(s"$dir/one.tif").values.toSeq == vals.take(12).toSeq)
  }

  test("GeoTiffSink passes compression and tiling through") {
    val dir = Files.createTempDirectory("graft_tiff_sink_opts").toString
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000), "EPSG:28992",
      20, 20, Some(T0), Some(T0))
    val paths = GeoTiffSink(source, s"$dir/out", compression = "deflate",
      tileSize = 16).write(req)(spark)
    assert(paths.nonEmpty)
    val t = GeoTiff.read(paths.head)
    assert(t.w == 20 && t.h == 20)
    // and the tiled-deflate file serves back through GeoTiffSource
    val direct = GeoTiffSink(source, s"$dir/plain").write(req)(spark)
    assert(GeoTiff.read(direct.head).values.toSeq == t.values.toSeq)
  }

  test("GeoTiffSink writes the source dtype; GeoTiffSource restores it") {
    val dir = Files.createTempDirectory("graft_tiff_dt_sink").toString
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000), "EPSG:28992",
      10, 10, Some(T0), Some(T0.plusMillis(3 * Hour)))
    GeoTiffSink(source, dir).write(req) // fixture source is uint8
    val t = GeoTiff.read(s"$dir/frame_${T0.toEpochMilli}.tif")
    assert(t.dtypeName == "uint8")
    val back = GeoTiffSource(dir, T0.toEpochMilli, Hour)
    assert(back.dtype == DType.U1)
  }

  test("GeoTiffSink exports frames + manifest; GeoTiffSource serves them back") {
    val dir = Files.createTempDirectory("graft_tiff_sink").toString
    val req = RasterRequest(Bbox(135000, 455995, 135005, 456000), "EPSG:28992",
      10, 10, Some(T0), Some(T0.plusMillis(3 * Hour)))
    val paths = GeoTiffSink(source, dir).write(req)
    assert(paths.size == 3)
    val back = GeoTiffSource(dir, T0.toEpochMilli, Hour)
    assert(back.projection == "EPSG:28992")
    assert(back.allTimes == source.allTimes)
    val res = back.getData(req).get
    // stored 255-sentinel cells come back as the float64 sentinel
    assert(res.values(0).forall(_ == 1.0))
    assert(res.values(2).forall(_ == back.noDataValue))
    // and the re-opened store composes with the operator DAG
    assert(Add(back, 1).getData(req).get.values(1).head == 8.0)
  }

  test("forced BigTIFF (version 43) round-trips, striped and tiled") {
    val dir = Files.createTempDirectory("graft_bigtiff").toString
    val vals = Array.tabulate(100 * 60)(i => if (i % 7 == 0) -1.0 else i.toDouble)
    for ((name, ts) <- Seq(("strip", 0), ("tile", 16))) {
      val p = s"$dir/$name.tif"
      GeoTiff.write(p, vals, 100, 60, Bbox(10, 20, 110, 80), 28992, -1.0,
        rowsPerStrip = 13, tileSize = ts, bigTiff = true)
      val head = Files.readAllBytes(java.nio.file.Paths.get(p)).take(4)
      assert(head(2) == 43 && head(3) == 0, s"$name is not version 43")
      val t = GeoTiff.read(p)
      assert(t.w == 100 && t.h == 60 && t.noData == -1.0)
      assert(t.bbox == Bbox(10, 20, 110, 80) && t.epsg == 28992)
      assert(t.values.toSeq == vals.toSeq, name)
    }
    // deflate under BigTIFF too
    val pz = s"$dir/z.tif"
    GeoTiff.write(pz, vals, 100, 60, Bbox(0, 0, 100, 60), 28992, -1.0,
      compression = "deflate", tileSize = 32, bigTiff = true)
    assert(GeoTiff.read(pz).values.toSeq == vals.toSeq)
  }

  test("sparse BigTIFF tiles (offset 0) read as nodata, GDAL convention") {
    val dir = Files.createTempDirectory("graft_sparse").toString
    val p = s"$dir/sparse.tif"
    val vals = Array.tabulate(64 * 32)(_.toDouble)
    GeoTiff.write(p, vals, 64, 32, Bbox(0, 0, 64, 32), 28992, -7.0,
      tileSize = 16, bigTiff = true)
    // locate tag 324 (tile offsets) in the BigTIFF IFD and zero the first
    // element — the GDAL sparse-file marker for an unwritten tile
    val raf = new java.io.RandomAccessFile(p, "rw")
    try {
      val hdr = new Array[Byte](8); raf.seek(8); raf.readFully(hdr)
      val ifd = java.nio.ByteBuffer.wrap(hdr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val cnt = new Array[Byte](8); raf.seek(ifd); raf.readFully(cnt)
      val n = java.nio.ByteBuffer.wrap(cnt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
      var arrOff = -1L
      for (i <- 0 until n) {
        val e = new Array[Byte](20)
        raf.seek(ifd + 8 + i * 20); raf.readFully(e)
        val bb = java.nio.ByteBuffer.wrap(e).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if ((bb.getShort(0) & 0xffff) == 324) arrOff = bb.getLong(12)
      }
      assert(arrOff > 0, "tile-offsets entry not found")
      raf.seek(arrOff); raf.write(new Array[Byte](8)) // first tile offset := 0
    } finally raf.close()
    val t = GeoTiff.read(p)
    // first 16x16 tile is nodata; the rest is intact
    for (y <- 0 until 32; x <- 0 until 64) {
      val expect = if (y < 16 && x < 16) -7.0 else (y * 64 + x).toDouble
      assert(t.values(y * 64 + x) == expect, s"($x,$y)")
    }
  }

  test("band-selected read materializes only the requested bands") {
    val dir = Files.createTempDirectory("graft_mbsel").toString
    val w = 5; val h = 4
    val bands = Seq.tabulate(4)(b => Array.tabulate(w * h)(i => b * 100.0 + i))
    RasterFixtures.writeChunkyMultibandTiff(s"$dir/mb.tif", bands, w, h)
    // selection order is respected, out-of-order included
    val t = GeoTiff.read(s"$dir/mb.tif", Seq(2, 0))
    assert(t.bandCount == 2 && t.moreBands.size == 1)
    assert(t.values.toSeq == bands(2).toSeq)
    assert(t.moreBands.head.toSeq == bands(0).toSeq)
    // the in-memory guard is sized by bands DECODED, not the file's
    // band count: a full read over a lowered limit fails loudly while
    // the selective read of the same file succeeds
    val prev = RequestGuards.rasterLimitPixels
    RequestGuards.rasterLimitPixels = w.toLong * h * 2
    try {
      val e = intercept[IllegalArgumentException] {
        GeoTiff.read(s"$dir/mb.tif")
      }
      assert(e.getMessage.contains("in-memory limit"), e.getMessage)
      assert(GeoTiff.read(s"$dir/mb.tif", Seq(3)).values.toSeq ==
        bands(3).toSeq)
    } finally RequestGuards.rasterLimitPixels = prev
    // bad selections are loud
    intercept[IllegalArgumentException] {
      GeoTiff.read(s"$dir/mb.tif", Seq(4))
    }
    intercept[IllegalArgumentException] {
      GeoTiff.read(s"$dir/mb.tif", Seq.empty[Int])
    }
  }

  test("a foreign chunky multiband TIFF reads bands as time frames") {
    // hand-rolled classic little-endian TIFF, 4x3, 2 bands interleaved
    // per pixel (PlanarConfiguration=1), float64, one strip — written
    // from the TIFF 6.0 spec independently of the codec's writer
    val w = 4; val h = 3; val spp = 2
    val entries = Seq[(Int, Int, Int, Long)](
      (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 64), (259, 3, 1, 1),
      (262, 3, 1, 1), (273, 4, 1, 0L /* patched */), (277, 3, 1, spp),
      (278, 3, 1, h), (279, 4, 1, (w * h * spp * 8).toLong), (284, 3, 1, 1),
      (339, 3, 1, 3),
      (33550, 12, 3, 0L /* patched */), (33922, 12, 6, 0L /* patched */),
      (34735, 3, 8, 0L /* patched */))
    val n = entries.length
    val ifdOff = 8
    val ifdLen = 2 + n * 12 + 4
    val psOff = ifdOff + ifdLen
    val tpOff = psOff + 24
    val gkOff = tpOff + 48
    val dataOff = gkOff + 16
    val total = dataOff + w * h * spp * 8
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    bb.putShort(n.toShort)
    for ((tag, typ, cnt, v0) <- entries) {
      val v = tag match {
        case 273 => dataOff.toLong
        case 33550 => psOff.toLong
        case 33922 => tpOff.toLong
        case 34735 => gkOff.toLong
        case _ => v0
      }
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3 && cnt == 1) { bb.putShort(v.toShort); bb.putShort(0) }
      else bb.putInt(v.toInt)
    }
    bb.putInt(0) // next IFD
    bb.putDouble(1.0).putDouble(1.0).putDouble(0.0) // pixel scale
    bb.putDouble(0).putDouble(0).putDouble(0)
      .putDouble(100.0).putDouble(203.0).putDouble(0) // tiepoint
    Seq(1, 1, 0, 1, 3072, 0, 1, 28992).foreach(k => bb.putShort(k.toShort))
    // band 1 = pixel index, band 2 = 1000 + index, interleaved
    for (i <- 0 until w * h) { bb.putDouble(i.toDouble); bb.putDouble(1000.0 + i) }
    val dir = Files.createTempDirectory("graft_mb").toString
    val p = s"$dir/mb.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bb.array())

    val t = GeoTiff.read(p)
    assert(t.bandCount == 2 && t.moreBands.size == 1)
    assert(t.values.toSeq == (0 until 12).map(_.toDouble))
    assert(t.moreBands.head.toSeq == (0 until 12).map(1000.0 + _))
    assert(t.bbox == Bbox(100, 200, 104, 203) && t.epsg == 28992)

    // the source serves one frame per band, reference-style
    val src = GeoTiffSource(p)
    assert(src.temporal && src.allTimes.size == 2)
    val sp = spark
    val req = RasterRequest(Bbox(100, 200, 104, 203), "EPSG:28992", 4, 3,
      start = Some(java.time.Instant.ofEpochMilli(0)),
      stop = Some(java.time.Instant.ofEpochMilli(300000)))
    val res = src.getData(req)(sp).get
    assert(res.values.size == 2)
    assert(res.values(0).toSeq == (0 until 12).map(_.toDouble))
    assert(res.values(1).toSeq == (0 until 12).map(1000.0 + _))
  }

  test("overview IFDs round-trip: chained levels, nearest decimation") {
    val dir = Files.createTempDirectory("graft_ovr").toString
    val p = s"$dir/ovr.tif"
    val w = 1000; val h = 800
    val vals = Array.tabulate(w * h)(i => (i % 7919).toDouble)
    GeoTiff.write(p, vals, w, h, Bbox(0, 0, 1000, 800), 28992, -9999.0,
      tileSize = 256, overviews = true)
    // 1000x800 → 500x400 → 250x200 (≤ minDim 256 stops the cascade)
    assert(GeoTiff.levelDims(p) == Seq((1000, 800), (500, 400), (250, 200)))
    // level 0 unchanged
    assert(GeoTiff.read(p).values.toSeq == vals.toSeq)
    // level 1: GDAL nearest convention — top-left of each 2x2
    val l1 = GeoTiff.readLevel(p, 1)
    assert(l1.w == 500 && l1.h == 400)
    assert(l1.bbox == Bbox(0, 0, 1000, 800)) // geo derives from IFD 0
    assert(l1.epsg == 28992 && l1.noData == -9999.0)
    for (y <- Seq(0, 1, 123, 399); x <- Seq(0, 1, 321, 499))
      assert(l1.values(y * 500 + x) == vals(2 * y * w + 2 * x), s"l1 ($x,$y)")
    // level 2 decimates level 1
    val l2 = GeoTiff.readLevel(p, 2)
    assert(l2.w == 250 && l2.h == 200)
    for (y <- Seq(0, 99, 199); x <- Seq(0, 127, 249))
      assert(l2.values(y * 250 + x) == vals(4 * y * w + 4 * x), s"l2 ($x,$y)")
  }

  test("sparse tiles and an overview pyramid compose") {
    // the 100 TB mosaic shape: mostly-empty tiled raster written sparse
    // (holes for nodata tiles) with a COG pyramid appended behind it
    val dir = Files.createTempDirectory("graft_sparse_ovr").toString
    val p = s"$dir/sc.tif"
    val w = 512; val h = 512; val nd = -7.0
    val vals = Array.fill(w * h)(nd)
    // one populated 64x64 block at (128, 128)
    for (y <- 128 until 192; x <- 128 until 192)
      vals(y * w + x) = (y * w + x).toDouble
    GeoTiff.write(p, vals, w, h, Bbox(0, 0, 512, 512), 28992, nd,
      tileSize = 64, sparse = true)
    val denseLen = new java.io.File(p).length()
    GeoTiff.appendOverviews(p, vals, w, h, nd, "float64",
      tileSize = 64, minDim = 64)
    assert(GeoTiff.levelDims(p) == Seq((512, 512), (256, 256), (128, 128), (64, 64)))
    assert(new java.io.File(p).length() > denseLen) // levels appended after
    // level 0 sparse holes still read as nodata; data block intact
    val t0 = GeoTiff.read(p)
    assert(t0.values(0) == nd)
    assert(t0.values(130 * w + 130) == (130 * w + 130).toDouble)
    // level 2 decimates: populated block shrinks to (32..48)^2 at 4x stride
    val l2 = GeoTiff.readLevel(p, 2)
    assert(l2.w == 128)
    assert(l2.values(0) == nd)
    assert(l2.values(33 * 128 + 33) == (132 * w + 132).toDouble)
    // a quarter-scale request over the data block serves from the pyramid
    val sp = spark
    val req = RasterRequest(Bbox(128, 320, 192, 384), "EPSG:28992", 16, 16)
    val res = GeoTiffSource(p).getData(req)(sp).get
    // request cell 4px → level 2; center of request pixel (0,0) is world
    // (130, 382) → level-2 sample (32, 32) → full (128+?, ...)
    assert(res.values(0).forall(v => v == nd || v >= 128.0))
    assert(res.values(0).count(_ != nd) == 256) // the block fills the window
  }

  test("a coarse request reads only overview bytes (full-res clobber proof)") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_cog").toString
    val p = s"$dir/cog.tif"
    val w = 1024; val h = 1024
    val vals = Array.tabulate(w * h)(i => (i % 9973).toDouble)
    GeoTiff.write(p, vals, w, h, Bbox(0, 0, 1024, 1024), 28992, -9999.0,
      tileSize = 256, overviews = true)
    assert(GeoTiff.levelDims(p) == Seq((1024, 1024), (512, 512), (256, 256)))
    // clobber every full-resolution pixel byte: find the first strip/tile's
    // known byte pattern and overwrite the whole level-0 data region
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val first8 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(vals(0)).array()
    val second8 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(vals(1)).array()
    var dataOff = -1
    var i = 0
    while (dataOff < 0 && i < bytes.length - 16) {
      if ((0 until 8).forall(k => bytes(i + k) == first8(k)) &&
        (0 until 8).forall(k => bytes(i + 8 + k) == second8(k))) dataOff = i
      i += 1
    }
    assert(dataOff > 0, "level-0 data region not found")
    val raf = new java.io.RandomAccessFile(p, "rw")
    try {
      raf.seek(dataOff)
      raf.write(Array.fill(w * h * 8)(0x5A.toByte)) // full-res pixels → garbage
    } finally raf.close()
    // full-resolution read now sees the clobber...
    assert(GeoTiff.read(p).values(0) != vals(0))
    // ...but a 1/16-scale request is served bit-exactly from the overview
    // pyramid — proof it touched no full-resolution pixel byte
    val req = RasterRequest(Bbox(0, 0, 1024, 1024), "EPSG:28992", 64, 64)
    val res = GeoTiffSource(p).getData(req)(sp).get
    // request cell = 16px ⇒ level 2 (cell 4px) serves; its pixel (x*?, ...)
    // NN warp picks the level-2 sample containing each request center
    for (ry <- Seq(0, 13, 63); rx <- Seq(0, 31, 63)) {
      val cx = (rx + 0.5) * 16 // request center in world coords (= px)
      val cy1 = 1024 - (ry + 0.5) * 16
      val l2x = math.min(255, (cx / 4).toInt) // level-2 grid (cell 4px)
      val l2y = math.min(255, ((1024 - cy1) / 4).toInt)
      val expect = vals(math.min(2 * math.min(2 * l2y, 511), 1023) * w +
        math.min(2 * math.min(2 * l2x, 511), 1023))
      assert(res.values(0)(ry * 64 + rx) == expect, s"($rx,$ry)")
    }
    // a windowed coarse read touches a strict subset of the level
    val winT = GeoTiff.readLevelWindow(p, 2, Bbox(10, 10, 50, 50))
    assert(winT.w == 256 && winT.h == 256) // one 256-tile level → whole tile
    val winT1 = GeoTiff.readLevelWindow(p, 1, Bbox(10, 900, 700, 1020))
    assert(winT1.w == 512 && winT1.h == 256) // 2x1 of the 512-level's tiles
    assert(winT1.bbox == Bbox(0, 512, 1024, 1024)) // anchored at the top
  }
}
