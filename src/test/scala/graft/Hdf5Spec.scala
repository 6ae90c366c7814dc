package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.raster._

/** HDF5 / NetCDF-4 read tests against INDEPENDENTLY hand-assembled files:
  * a from-scratch byte-level HDF5 serializer (v0 superblock, v1 object
  * headers, old-style groups, contiguous + chunked/deflate/shuffle
  * layouts, v1 attributes incl. a vlen string through a global heap)
  * built from the public HDF5 File Format Specification — the reader
  * never sees its own writer's output because there is no writer.
  */
class Hdf5Spec extends SparkSpec {

  private val UNDEF = -1L

  // ------------------------------------------------------- file builder

  private class Builder {
    private var buf = new Array[Byte](1 << 16)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, len + n))
        System.arraycopy(buf, 0, nb, 0, len); buf = nb
      }
    def pos: Long = len.toLong
    def bytes(b: Array[Byte]): Long = {
      ensure(b.length); val at = len
      System.arraycopy(b, 0, buf, len, b.length); len += b.length
      at.toLong
    }
    def u8(v: Int): Unit = { ensure(1); buf(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit =
      bytes(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(v.toShort).array())
    def u32(v: Int): Unit =
      bytes(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v).array())
    def u64(v: Long): Unit =
      bytes(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array())
    def patch64(at: Long, v: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array()
      System.arraycopy(b, 0, buf, at.toInt, 8)
    }
    def pad(to: Int): Unit = while (len % to != 0) u8(0)
    def result: Array[Byte] = buf.take(len)
  }

  // message payload builders ------------------------------------------

  private def pad8(n: Int): Int = (n + 7) & ~7

  private def msgBytes(typ: Int, body: Array[Byte]): Array[Byte] = {
    val size = pad8(body.length)
    val b = ByteBuffer.allocate(8 + size).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(typ.toShort); b.putShort(size.toShort)
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(body)
    b.array()
  }

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(dims.length.toByte); b.put(0.toByte)
    b.put(new Array[Byte](5))
    dims.foreach(b.putLong)
    b.array()
  }

  /** cls 0 fixed (signedness + width), cls 1 float, cls 3 string. */
  private def datatype(cls: Int, size: Int, signed: Boolean = true,
      bigEndian: Boolean = false): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.put(((1 << 4) | cls).toByte)
    var bits0 = 0
    if (bigEndian) bits0 |= 1
    if (cls == 0 && signed) bits0 |= 8
    b.put(bits0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    if (cls == 0) { b.putShort(0); b.putShort((size * 8).toShort) }
    else if (cls == 1 && size == 8) {
      b.putShort(0); b.putShort(64)
      b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte)
      // bias doesn't fit the 16-byte buffer head; extend
      return b.array() ++ ByteBuffer.allocate(4)
        .order(ByteOrder.LITTLE_ENDIAN).putInt(1023).array()
    } else if (cls == 1 && size == 4) {
      b.putShort(0); b.putShort(32)
      b.put(23.toByte); b.put(8.toByte); b.put(0.toByte); b.put(23.toByte)
      return b.array() ++ ByteBuffer.allocate(4)
        .order(ByteOrder.LITTLE_ENDIAN).putInt(127).array()
    }
    b.array()
  }

  private def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte); b.put(1.toByte); b.putLong(addr); b.putLong(size)
    b.array()
  }

  private def layoutChunked(btree: Long, chunkDims: Seq[Int],
      elemSize: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(11 + (chunkDims.length + 1) * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte); b.put(2.toByte)
    b.put((chunkDims.length + 1).toByte)
    b.putLong(btree)
    chunkDims.foreach(b.putInt)
    b.putInt(elemSize)
    b.array()
  }

  private def filterDeflate(): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 8 + 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(1.toByte); b.putShort(0); b.putInt(0)
    b.putShort(1); b.putShort(0); b.putShort(0); b.putShort(1) // id, nm, fl, nv
    b.putInt(6)  // level
    b.putInt(0)  // odd nvals pad
    b.array()
  }

  private def attr(name: String, dt: Array[Byte], ds: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val nm = name.getBytes("UTF-8") :+ 0.toByte
    val b = ByteBuffer.allocate(8 + pad8(nm.length) + pad8(dt.length) +
      pad8(ds.length) + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(nm.length.toShort)
    b.putShort(dt.length.toShort)
    b.putShort(ds.length.toShort)
    b.put(nm); b.put(new Array[Byte](pad8(nm.length) - nm.length))
    b.put(dt); b.put(new Array[Byte](pad8(dt.length) - dt.length))
    b.put(ds); b.put(new Array[Byte](pad8(ds.length) - ds.length))
    b.put(data)
    b.array()
  }

  private def strAttr(name: String, v: String): Array[Byte] = {
    val s = v.getBytes("UTF-8") :+ 0.toByte
    attr(name, datatype(3, s.length), dataspace(Nil), s)
  }

  private def dblAttr(name: String, v: Double): Array[Byte] =
    attr(name, datatype(1, 8), dataspace(Nil),
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v).array())

  private def objectHeader(b: Builder, msgs: Seq[Array[Byte]]): Long = {
    val at = b.pos
    val total = msgs.map(_.length).sum
    b.u8(1); b.u8(0); b.u16(msgs.length); b.u32(1); b.u32(total); b.u32(0)
    msgs.foreach(b.bytes)
    at
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](65536)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end(); out.toByteArray
  }

  private def doubles(vals: Seq[Double]): Array[Byte] = {
    val b = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(b.putDouble); b.array()
  }

  /** Assemble a NetCDF-4-shaped HDF5 file: root group (old-style) with
    * datasets x, y, time (contiguous f8) and `rain` (chunked int16 +
    * deflate, scale/offset, fill, grid_mapping) + a `crs` dataset whose
    * spatial_ref attribute is a VLEN string in a global heap.
    *
    * `xName` renames the x coordinate; `tagScales` adds the
    * CLASS="DIM_SCALE" convention attribute to x/y/time; `withAux`
    * adds an untagged auxiliary 1-D dataset whose length collides
    * with the x axis. */
  private def buildFile(path: String, xName: String = "x",
      tagScales: Boolean = false, withAux: Boolean = false): Unit = {
    val b = new Builder
    // ---- superblock (patched later)
    b.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    b.u8(0); b.u8(0); b.u8(0); b.u8(0) // versions
    b.u8(0); b.u8(8); b.u8(8); b.u8(0) // shared, offsets, lengths
    b.u16(4); b.u16(16); b.u32(0)      // K values, flags
    b.u64(0); b.u64(UNDEF)
    val eofPatch = b.pos; b.u64(0)     // EOF
    b.u64(UNDEF)
    val rootEntry = b.pos
    b.u64(0); b.u64(0) /*root OH patched*/ ; b.u32(0); b.u32(0)
    b.bytes(new Array[Byte](16))

    // ---- data payloads
    // grid: 4 wide × 3 high, 0.5 m pixels, origin (100, 200); y DESCENDING
    val xs = Seq(100.25, 100.75, 101.25, 101.75)
    val ys = Seq(199.75, 199.25, 198.75)
    val times = Seq(0.0, 1.0) // hours since 2000-01-01
    val xAddr = b.bytes(doubles(xs))
    val yAddr = b.bytes(doubles(ys))
    val tAddr = b.bytes(doubles(times))
    val auxAddr = if (withAux) b.bytes(doubles(Seq(7.0, 8.0, 9.0, 10.0))) else 0L
    // rain: (2, 3, 4) int16 chunks of (1, 2, 4), raw = 2*true, fill -9
    def raw(t: Int, r: Int, c: Int): Int = 2 * (100 * t + 10 * r + c)
    def chunkBytes(t: Int, cy: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(2 * 4 * 2).order(ByteOrder.LITTLE_ENDIAN)
      for (jy <- 0 until 2; jx <- 0 until 4) {
        val rr = cy * 2 + jy
        bb.putShort(if (rr >= 3) -9 else raw(t, rr, jx).toShort)
      }
      bb.array()
    }
    // chunk (t=1, cy=1) is MISSING → fill
    val chunkAddrs = for (t <- 0 until 2; cy <- 0 until 2
        if !(t == 1 && cy == 1)) yield {
      val z = deflate(chunkBytes(t, cy))
      (Seq(t.toLong, cy * 2L, 0L), b.bytes(z), z.length.toLong)
    }
    // chunk B-tree (single leaf)
    b.pad(8)
    val btreeAddr = b.pos
    b.u32(0x45455254); b.u8(1); b.u8(0); b.u16(chunkAddrs.length)
    b.u64(UNDEF); b.u64(UNDEF)
    chunkAddrs.foreach { case (offs, addr, nbytes) =>
      b.u32(nbytes.toInt); b.u32(0)
      offs.foreach(b.u64); b.u64(0) // + elem-size 0 key
      b.u64(addr)
    }
    // final key
    b.u32(0); b.u32(0); (0 until 4).foreach(_ => b.u64(0))

    // ---- global heap with the CRS WKT (vlen attr target)
    val wkt = raster.WktSrs.toWkt("EPSG:28992").get
    val wktB = wkt.getBytes("UTF-8")
    b.pad(8)
    val gcolAddr = b.pos
    val objSpace = 16 + pad8(wktB.length) + 16
    b.u32(0x4C4F4347); b.u8(1); b.u8(0); b.u16(0)
    b.u64(16 + objSpace)
    b.u16(1); b.u16(1); b.u32(0); b.u64(wktB.length)
    b.bytes(wktB); b.pad(8)
    b.bytes(new Array[Byte](16)) // free-space terminator

    // ---- dataset object headers
    val f8 = datatype(1, 8)
    val tagMsg: Seq[Array[Byte]] =
      if (tagScales) Seq(msgBytes(0x000C, strAttr("CLASS", "DIM_SCALE")))
      else Nil
    val xOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(4))),
      msgBytes(0x0003, f8),
      msgBytes(0x0008, layoutContiguous(xAddr, 32)),
      msgBytes(0x000C, strAttr("units", "m"))) ++ tagMsg)
    val yOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(3))),
      msgBytes(0x0003, f8),
      msgBytes(0x0008, layoutContiguous(yAddr, 24))) ++ tagMsg)
    val tOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(2))),
      msgBytes(0x0003, f8),
      msgBytes(0x0008, layoutContiguous(tAddr, 16)),
      msgBytes(0x000C, strAttr("units", "hours since 2000-01-01"))) ++ tagMsg)
    val auxOH = if (withAux) objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(4))),
      msgBytes(0x0003, f8),
      msgBytes(0x0008, layoutContiguous(auxAddr, 32)))) else 0L
    // crs: 0-d int with a VLEN spatial_ref attribute via the global heap
    val vlenDt = {
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      d.put(((1 << 4) | 9).toByte); d.put(0.toByte); d.put(0.toByte)
      d.put(0.toByte); d.putInt(16)
      d.array()
    }
    val vlenData = {
      val d = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      d.putInt(wktB.length); d.putLong(gcolAddr); d.putInt(1)
      d.array()
    }
    val crsOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Nil)),
      msgBytes(0x0003, datatype(0, 4)),
      msgBytes(0x0008, layoutContiguous(UNDEF, 0)),
      msgBytes(0x000C, attr("spatial_ref", vlenDt, dataspace(Nil), vlenData))))
    val i2be = datatype(0, 2, signed = true)
    val rainOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(2, 3, 4))),
      msgBytes(0x0003, i2be),
      msgBytes(0x000B, filterDeflate()),
      msgBytes(0x0008, layoutChunked(btreeAddr, Seq(1, 2, 4), 2)),
      msgBytes(0x000C, dblAttr("_FillValue", -9.0)),
      msgBytes(0x000C, dblAttr("scale_factor", 0.5)),
      msgBytes(0x000C, dblAttr("add_offset", 0.0)),
      msgBytes(0x000C, strAttr("grid_mapping", "crs"))))

    // ---- root group: local heap + SNOD + B-tree + object header
    b.pad(8)
    val heapDataAddr = b.pos
    val entryOHs: Seq[(String, Long)] =
      Seq(xName -> xOH, "y" -> yOH, "time" -> tOH, "crs" -> crsOH,
        "rain" -> rainOH) ++
        (if (withAux) Seq("station_elev" -> auxOH) else Nil)
    val names = entryOHs.map(_._1)
    val nameOffs = scala.collection.mutable.Map.empty[String, Long]
    names.foreach { n =>
      nameOffs(n) = b.pos - heapDataAddr
      b.bytes(n.getBytes("UTF-8")); b.u8(0)
    }
    b.pad(8)
    val heapDataSize = b.pos - heapDataAddr
    val heapAddr = b.pos
    b.u32(0x50414548); b.u32(0)
    b.u64(heapDataSize); b.u64(1); b.u64(heapDataAddr)
    val snodAddr = b.pos
    b.u32(0x444F4E53); b.u8(1); b.u8(0)
    // SNOD entries must be name-ordered
    val ordered = entryOHs.sortBy(_._1)
    b.u16(ordered.length)
    ordered.foreach { case (n, oh) =>
      b.u64(nameOffs(n)); b.u64(oh); b.u32(0); b.u32(0)
      b.bytes(new Array[Byte](16))
    }
    val btreeGroupAddr = b.pos
    b.u32(0x45455254); b.u8(0); b.u8(0); b.u16(1)
    b.u64(UNDEF); b.u64(UNDEF)
    b.u64(0); b.u64(snodAddr); b.u64(0)
    val rootOH = objectHeader(b, Seq(
      msgBytes(0x0011, {
        val s = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        s.putLong(btreeGroupAddr); s.putLong(heapAddr); s.array()
      })))
    b.patch64(rootEntry + 8, rootOH)
    b.patch64(eofPatch, b.pos)
    Files.write(Paths.get(path), b.result)
  }

  // ------------------------------------------------------------- tests

  test("hand-assembled NetCDF-4 (HDF5) stack reads end to end") {
    val dir = Files.createTempDirectory("graft_h5").toString
    buildFile(s"$dir/rain.nc")
    val src = Hdf5Source(s"$dir/rain.nc")
    assert(src.projection == "EPSG:28992") // via the VLEN global-heap WKT
    assert(src.cellSize.contains(0.5))
    assert(src.extent.contains(Bbox(100.0, 198.5, 102.0, 200.0)))
    assert(src.temporal && src.timeDeltaMs.contains(3600000L))
    assert(src.allTimes == Seq("2000-01-01T00:00:00Z", "2000-01-01T01:00:00Z")
      .map(java.time.Instant.parse))
    val req = RasterRequest(Bbox(100.0, 198.5, 102.0, 200.0),
      "EPSG:28992", 4, 3,
      Some(java.time.Instant.parse("2000-01-01T00:00:00Z")),
      Some(java.time.Instant.parse("2000-01-01T01:00:00Z")))
    val res = src.getData(req)(spark).get
    assert(res.values.length == 2)
    val nd = res.noDataValue
    // scale 0.5 over raw 2*true → true values; frame 1 rows 2.. missing
    val f0 = res.values(0)
    for (r <- 0 until 3; c <- 0 until 4)
      assert(f0(r * 4 + c) == 10.0 * r + c, s"f0($r,$c)=${f0(r * 4 + c)}")
    val f1 = res.values(1)
    for (c <- 0 until 4) {
      assert(f1(0 * 4 + c) == 100.0 + c)
      assert(f1(1 * 4 + c) == 110.0 + c)
      assert(f1(2 * 4 + c) == nd, s"f1(2,$c) should be fill")
    }
  }

  test("RasterFileSource routes .nc by magic: CDF vs HDF5") {
    val dir = Files.createTempDirectory("graft_h5d").toString
    buildFile(s"$dir/stack.nc")
    val viaDispatch = RasterFileSource(s"$dir/stack.nc")
    assert(viaDispatch.isInstanceOf[Hdf5Source])
    // and a classic file still routes to the classic codec
    val req = RasterFixtures.valsRequest
    NetCdfSink(RasterFixtures.source, s"$dir/classic.nc").write(req)(spark)
    assert(RasterFileSource(s"$dir/classic.nc").isInstanceOf[NetCdfSource])
  }

  test("Hdf5Sink round-trips the whole stack through its own writer") {
    val dir = Files.createTempDirectory("graft_h5w").toString
    val req = RasterFixtures.valsRequest
    Hdf5Sink(RasterFixtures.source, s"$dir/stack.nc", chunkRows = 4)
      .write(req)(spark)
    val back = RasterFileSource(s"$dir/stack.nc")
    assert(back.isInstanceOf[Hdf5Source])
    assert(back.projection == "EPSG:28992")
    assert(back.temporal && back.timeDeltaMs.contains(RasterFixtures.Hour))
    assert(back.cellSize.contains(0.5))
    val res = back.getData(req)(spark).get
    val want = RasterFixtures.source.getData(req)(spark).get
    assert(res.times == want.times)
    assert(res.values.map(_.toSeq).toSeq == want.values.map(_.toSeq).toSeq)
    assert(res.noDataValue == want.noDataValue)
  }

  test("temporal slice decodes only the selected frames' chunks") {
    val dir = Files.createTempDirectory("graft_h5s").toString
    val req = RasterFixtures.valsRequest
    Hdf5Sink(RasterFixtures.source, s"$dir/stack.nc").write(req)(spark)
    // the writer lays chunks sequentially right after the coordinate
    // payloads: superblock (96 B) + x/y/time doubles — clobber the FIRST
    // chunk (frame 0); a correctly pruned single-frame read of frame 1
    // must never touch it
    val firstChunk = 96L + 8L * (req.width + req.height + 3)
    val raf = new java.io.RandomAccessFile(s"$dir/stack.nc", "rw")
    try {
      raf.seek(firstChunk)
      // only 4 bytes: a deflated 24-px frame is ~13 bytes, and a longer
      // clobber would bleed into the NEXT chunk
      raf.write(Array.fill[Byte](4)(0x7F))
    } finally raf.close()
    val back = Hdf5Source(s"$dir/stack.nc")
    val one = back.getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
    // and the clobber is real: the full-stack read fails on frame 0
    intercept[Exception] {
      Hdf5Source(s"$dir/stack.nc").getData(req)(spark)
    }
  }

  test("layout v4 Fixed Array chunk index reads, prunes, and pages") {
    val dir = Files.createTempDirectory("graft_h5fa").toString
    val req = RasterFixtures.valsRequest
    val want = RasterFixtures.source.getData(req)(spark).get
    val bands = want.values.map(_.clone())
    val timesMs = want.times.map(_.toEpochMilli)
    // 4x6 px, chunkRows 2 -> 3 chunks/frame x 3 frames = 9 chunks
    for ((pageBits, name) <- Seq((10, "unpaged"), (2, "paged"))) {
      // pageBits 2 -> pages of 4 elements -> 9 chunks span 3 pages
      val p = s"$dir/$name.nc"
      Hdf5Write.write(p, bands, req.width, req.height, req.bbox,
        want.noDataValue, "EPSG:28992", timesMs, dtypeName = "uint8",
        chunkRows = 2, chunkIndex = "farray", faPageBits = pageBits)
      val back = Hdf5Source(p)
      assert(back.temporal && back.allTimes == want.times, name)
      val res = back.getData(req)(spark).get
      assert(res.values.map(_.toSeq).toSeq ==
        want.values.map(_.toSeq).toSeq, name)
    }
    // header-only pruning holds for the FA index: clobber the first
    // chunk (frame 0); a frame-1 slice must never touch it
    val p = s"$dir/unpaged.nc"
    val firstChunk = 96L + 8L * (req.width + req.height + 3)
    val raf = new java.io.RandomAccessFile(p, "rw")
    try { raf.seek(firstChunk); raf.write(Array.fill[Byte](4)(0x7F)) }
    finally raf.close()
    val one = Hdf5Source(p).getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
    intercept[Exception] { Hdf5Source(p).getData(req)(spark) }
  }

  test("layout v4 Extensible Array chunk index: index/data/super blocks") {
    val dir = Files.createTempDirectory("graft_h5ea").toString
    val req = RasterFixtures.valsRequest
    val want = RasterFixtures.source.getData(req)(spark).get
    val timesMs = want.times.map(_.toEpochMilli)
    // small creation parameters walk every block shape: 18 chunks
    // (chunkRows 1 -> 6/frame x 3) = 1 inline element + direct data
    // blocks g0 (2 elmts) / g1 (4), super block 2's unpaged blocks
    // g2/g3 (4 each, g3 all-undefined past the grid), super block 3's
    // PAGED block g4 (8 elmts in 4-element pages, page 1 all-undefined)
    val shapes = Seq(
      ("small", 1, Seq(1, 2, 2, 2)), // idxBlkElmts, minElmts, minPtrs, pageBits
      ("defaults", 2, Seq(4, 16, 4, 10))) // 1.10 defaults: inline + g0 only
    for ((name, chunkRows, Seq(ie, me, mp, pb)) <- shapes) {
      val p = s"$dir/$name.nc"
      Hdf5Write.write(p, want.values, req.width, req.height, req.bbox,
        want.noDataValue, "EPSG:28992", timesMs, dtypeName = "uint8",
        chunkRows = chunkRows, chunkIndex = "earray", eaIdxBlkElmts = ie,
        eaMinElmts = me, eaSupMinPtrs = mp, eaPageBits = pb)
      val bytes = Files.readAllBytes(Paths.get(p))
      def has(sig: String) = bytes.sliding(4).exists(_.sameElements(
        sig.getBytes("US-ASCII")))
      assert(has("EAHD") && has("EAIB") && has("EADB"), name)
      assert(has("EASB") == (name == "small"), name) // defaults never grow past g0
      val back = Hdf5Source(p)
      assert(back.temporal && back.allTimes == want.times, name)
      assert(back.getData(req)(spark).get.values.map(_.toSeq).toSeq ==
        want.values.map(_.toSeq).toSeq, name)
    }
    // header-only pruning holds for the EA index: clobber the first
    // chunk (frame 0); a frame-1 slice must never touch it
    val p = s"$dir/small.nc"
    val firstChunk = 96L + 8L * (req.width + req.height + 3)
    val raf = new java.io.RandomAccessFile(p, "rw")
    try { raf.seek(firstChunk); raf.write(Array.fill[Byte](4)(0x7F)) }
    finally raf.close()
    val one = Hdf5Source(p).getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
    intercept[Exception] { Hdf5Source(p).getData(req)(spark) }
  }

  test("layout v4 v2 B-tree chunk index: root leaf and one internal level") {
    val dir = Files.createTempDirectory("graft_h5b2").toString
    val req = RasterFixtures.valsRequest
    val want = RasterFixtures.source.getData(req)(spark).get
    val timesMs = want.times.map(_.toEpochMilli)
    // node size 512 holds 13 records of this width: 9 chunks
    // (chunkRows 2) -> a root BTLF; 18 chunks (chunkRows 1) -> one
    // BTIN level over leaves with separator records in the root
    for ((name, chunkRows, wantSig) <- Seq(("leaf", 2, "BTLF"),
        ("internal", 1, "BTIN"))) {
      val p = s"$dir/$name.nc"
      Hdf5Write.write(p, want.values, req.width, req.height, req.bbox,
        want.noDataValue, "EPSG:28992", timesMs, dtypeName = "uint8",
        chunkRows = chunkRows, chunkIndex = "btree2")
      val bytes = Files.readAllBytes(Paths.get(p))
      def has(sig: String) = bytes.sliding(4).exists(_.sameElements(
        sig.getBytes("US-ASCII")))
      assert(has("BTHD") && has(wantSig), name)
      assert(has("BTIN") == (name == "internal"), name)
      val back = Hdf5Source(p)
      assert(back.temporal && back.allTimes == want.times, name)
      assert(back.getData(req)(spark).get.values.map(_.toSeq).toSeq ==
        want.values.map(_.toSeq).toSeq, name)
    }
    // header-only pruning holds for the v2 B-tree index too
    val p = s"$dir/internal.nc"
    val firstChunk = 96L + 8L * (req.width + req.height + 3)
    val raf = new java.io.RandomAccessFile(p, "rw")
    try { raf.seek(firstChunk); raf.write(Array.fill[Byte](4)(0x7F)) }
    finally raf.close()
    val one = Hdf5Source(p).getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
    intercept[Exception] { Hdf5Source(p).getData(req)(spark) }
    // a LYING depth field is corruption, not garbage: flipping the BTHD
    // depth to 2 over a root leaf makes the walker expect a BTIN where
    // a BTLF sits (sig+ver+type+nodeSize+recSize = offset 12)
    val base = Files.readAllBytes(Paths.get(s"$dir/leaf.nc"))
    val at = base.indices.find(i => i + 4 <= base.length &&
      base(i) == 'B' && base(i + 1) == 'T' && base(i + 2) == 'H' &&
      base(i + 3) == 'D').getOrElse(fail("BTHD not found"))
    val mut = base.clone(); mut(at + 12) = 2
    Files.write(Paths.get(s"$dir/deep.nc"), mut)
    val e = intercept[IllegalArgumentException] {
      Hdf5Source(s"$dir/deep.nc").getData(req)(spark)
    }
    assert(e.getMessage.contains("BTIN signature"), e.getMessage)
    // an absurd depth is loud before any node is read
    val mut17 = base.clone(); mut17(at + 12) = 17
    Files.write(Paths.get(s"$dir/deep17.nc"), mut17)
    val e17 = intercept[IllegalArgumentException] {
      Hdf5Source(s"$dir/deep17.nc").getData(req)(spark)
    }
    assert(e17.getMessage.contains("depth 17"), e17.getMessage)
  }

  test("layout v4 v2 B-tree chunk index: depth >= 2 (multi-level " +
      "internal walk with per-level pointer widths)") {
    val dir = Files.createTempDirectory("graft_h5b2d").toString
    val req = RasterFixtures.valsRequest
    val want = RasterFixtures.source.getData(req)(spark).get
    val timesMs = want.times.map(_.toEpochMilli)
    val p = s"$dir/deep2.nc"
    // node size 128 / one-row uint8 chunks: leafCap 3, level-1 cap 2,
    // level-2 cap 2 -> 18 chunk records need depth 2 (cum capacities
    // 3 / 11 / 35)
    Hdf5Write.write(p, want.values, req.width, req.height, req.bbox,
      want.noDataValue, "EPSG:28992", timesMs, dtypeName = "uint8",
      chunkRows = 1, chunkIndex = "btree2", b2NodeSize = 128)
    val bytes = Files.readAllBytes(Paths.get(p))
    val at = bytes.indices.find(i => i + 4 <= bytes.length &&
      bytes(i) == 'B' && bytes(i + 1) == 'T' && bytes(i + 2) == 'H' &&
      bytes(i + 3) == 'D').getOrElse(fail("BTHD not found"))
    val depth = ((bytes(at + 12) & 0xFF) | ((bytes(at + 13) & 0xFF) << 8))
    assert(depth == 2, s"fixture emitted depth $depth, wanted 2")
    val back = Hdf5Source(p)
    assert(back.temporal && back.allTimes == want.times)
    assert(back.getData(req)(spark).get.values.map(_.toSeq).toSeq ==
      want.values.map(_.toSeq).toSeq)
    // frame pruning still walks only the needed chunks' byte ranges:
    // clobber frame 0's first chunk, slice frame 1 cleanly
    val firstChunk = 96L + 8L * (req.width + req.height + 3)
    val raf = new java.io.RandomAccessFile(p, "rw")
    try { raf.seek(firstChunk); raf.write(Array.fill[Byte](4)(0x7F)) }
    finally raf.close()
    val one = Hdf5Source(p).getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
    intercept[Exception] { Hdf5Source(p).getData(req)(spark) }
    // corrupting bytes inside the first internal node (a separator
    // record or a child pointer) is LOUD — capacity check, signature
    // check or a failed chunk decode — never silent truncation
    val byIdx = Files.readAllBytes(Paths.get(s"$dir/deep2.nc"))
    val btin = byIdx.indices.find(i => i + 4 <= byIdx.length &&
      byIdx(i) == 'B' && byIdx(i + 1) == 'T' && byIdx(i + 2) == 'I' &&
      byIdx(i + 3) == 'N').getOrElse(fail("BTIN not found"))
    for (off <- Seq(6 + 37 + 8, 6, 6 + 37)) {
      val mutp = byIdx.clone(); mutp(btin + off) = 0
      Files.write(Paths.get(s"$dir/badptr.nc"), mutp)
      val got = Hdf5Source(s"$dir/badptr.nc")
      val r = try { Right(got.getData(req)(spark).get.values.map(_.toSeq)) }
        catch { case e: Exception => Left(e) }
      r match {
        case Left(_) => // loud — good
        case Right(vals) => // a benign byte: the data must be UNCHANGED
          assert(vals.toSeq == want.values.map(_.toSeq).toSeq,
            s"offset $off silently changed the decode")
      }
    }
  }

  test("v4 chunk indexes this reader does not carry fail loudly by name") {
    val dir = Files.createTempDirectory("graft_h5fx").toString
    val req = RasterFixtures.valsRequest
    val want = RasterFixtures.source.getData(req)(spark).get
    val p0 = s"$dir/base.nc"
    Hdf5Write.write(p0, want.values, req.width, req.height, req.bbox,
      want.noDataValue, "EPSG:28992", want.times.map(_.toEpochMilli),
      chunkRows = 2, chunkIndex = "farray")
    val base = Files.readAllBytes(Paths.get(p0))
    // locate the v4 layout message: version 4, class 2, flags 0,
    // dimensionality 4, dim width 4, then 16 dim bytes, then index type
    val sig = Array[Byte](4, 2, 0, 4, 4)
    val at = base.indices.find(i => i + 22 <= base.length &&
      sig.indices.forall(k => base(i + k) == sig(k)) &&
      base(i + 21) == 3).getOrElse(fail("layout v4 message not found"))
    val mut0 = base.clone(); mut0(at + 21) = 6.toByte
    Files.write(Paths.get(s"$dir/idx6.nc"), mut0)
    val e0 = intercept[IllegalArgumentException] {
      Hdf5Source(s"$dir/idx6.nc").getData(req)(spark)
    }
    assert(e0.getMessage.contains("chunk index type 6"), e0.getMessage)
    // a corrupted index header signature is loud, not garbage — for
    // every v4 index family this reader carries
    for ((ci, sig) <- Seq("farray" -> "FAHD", "earray" -> "EAHD",
        "btree2" -> "BTHD")) {
      val p0 = s"$dir/sig_$ci.nc"
      Hdf5Write.write(p0, want.values, req.width, req.height, req.bbox,
        want.noDataValue, "EPSG:28992", want.times.map(_.toEpochMilli),
        chunkRows = 2, chunkIndex = ci)
      val by = Files.readAllBytes(Paths.get(p0))
      val sb = sig.getBytes("US-ASCII")
      val sAt = by.indices.find(i => i + 4 <= by.length &&
        sb.indices.forall(k => by(i + k) == sb(k)))
        .getOrElse(fail(s"$sig not found"))
      val mut = by.clone(); mut(sAt) = 'X'
      val p = s"$dir/bad_$ci.nc"
      Files.write(Paths.get(p), mut)
      val e = intercept[IllegalArgumentException] {
        Hdf5Source(p).getData(req)(spark)
      }
      assert(e.getMessage.contains(sig), e.getMessage)
    }
  }

  test("hdf5 failure modes are loud: dense links, bad filters, v2 trees") {
    val dir = Files.createTempDirectory("graft_h5b").toString
    // truncated file
    Files.write(Paths.get(s"$dir/trunc.h5"),
      Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n', 3))
    val e = intercept[IllegalArgumentException] {
      Hdf5Source(s"$dir/trunc.h5").projection
    }
    assert(e.getMessage.contains("hdf5"))
  }

  // ------------------------------ ordered filter pipelines (fletcher32)

  /** v1 filter-pipeline message for an arbitrary ordered entry list:
    * (id, clientValues). */
  private def filterPipeline(entries: Seq[(Int, Seq[Int])]): Array[Byte] = {
    val sz = 8 + entries.map { case (_, vs) =>
      8 + 4 * vs.length + (if (vs.length % 2 == 1) 4 else 0)
    }.sum
    val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(entries.length.toByte); b.putShort(0); b.putInt(0)
    entries.foreach { case (id, vs) =>
      b.putShort(id.toShort); b.putShort(0); b.putShort(0)
      b.putShort(vs.length.toShort)
      vs.foreach(b.putInt)
      if (vs.length % 2 == 1) b.putInt(0)
    }
    b.array()
  }

  /** Forward shuffle (H5Zshuffle): whole elements byte-transposed,
    * leftover tail copied through unchanged. */
  private def shuffleFwd(raw: Array[Byte], elem: Int): Array[Byte] = {
    val n = raw.length / elem
    val out = new Array[Byte](raw.length)
    var k = 0
    for (j <- 0 until elem; i <- 0 until n) { out(k) = raw(i * elem + j); k += 1 }
    System.arraycopy(raw, n * elem, out, n * elem, raw.length - n * elem)
    out
  }

  /** HDF5 fletcher32 (big-endian 16-bit pairing), appended little-endian
    * — independent re-implementation for the fixture side. */
  private def fletchAppend(raw: Array[Byte]): Array[Byte] = {
    var s1 = 0L; var s2 = 0L
    var i = 0
    while (i + 1 < raw.length) {
      s1 += (((raw(i) & 0xFF) << 8) | (raw(i + 1) & 0xFF)).toLong
      s2 += s1
      s1 = (s1 & 0xFFFF) + (s1 >>> 16); s2 = (s2 & 0xFFFF) + (s2 >>> 16)
      i += 2
    }
    if (raw.length % 2 == 1) {
      s1 += ((raw(i) & 0xFF) << 8).toLong; s2 += s1
      s1 = (s1 & 0xFFFF) + (s1 >>> 16); s2 = (s2 & 0xFFFF) + (s2 >>> 16)
    }
    s1 = (s1 & 0xFFFF) + (s1 >>> 16); s2 = (s2 & 0xFFFF) + (s2 >>> 16)
    val sum = ((s2 << 16) | s1).toInt
    val out = java.util.Arrays.copyOf(raw, raw.length + 4)
    out(raw.length) = sum.toByte
    out(raw.length + 1) = (sum >>> 8).toByte
    out(raw.length + 2) = (sum >>> 16).toByte
    out(raw.length + 3) = (sum >>> 24).toByte
    out
  }

  /** Minimal one-dataset file: a 4×4 int16 grid `v`, chunks 2×4, with
    * the given pipeline message and per-chunk (bytes, filterMask)
    * produced by `encode`. */
  private def buildFiltered(path: String, pipeline: Array[Byte],
      encode: (Array[Byte], Int) => (Array[Byte], Int)): Unit = {
    val b = new Builder
    b.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    b.u8(0); b.u8(8); b.u8(8); b.u8(0)
    b.u16(4); b.u16(16); b.u32(0)
    b.u64(0); b.u64(UNDEF)
    val eofPatch = b.pos; b.u64(0)
    b.u64(UNDEF)
    val rootEntry = b.pos
    b.u64(0); b.u64(0); b.u32(0); b.u32(0)
    b.bytes(new Array[Byte](16))

    def chunkRaw(cy: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(2 * 4 * 2).order(ByteOrder.LITTLE_ENDIAN)
      for (jy <- 0 until 2; jx <- 0 until 4)
        bb.putShort((100 * (cy * 2 + jy) + jx).toShort)
      bb.array()
    }
    val chunks = (0 until 2).map { cy =>
      val (enc, mask) = encode(chunkRaw(cy), cy)
      (Seq(cy * 2L, 0L), b.bytes(enc), enc.length.toLong, mask)
    }
    b.pad(8)
    val btreeAddr = b.pos
    b.u32(0x45455254); b.u8(1); b.u8(0); b.u16(chunks.length)
    b.u64(UNDEF); b.u64(UNDEF)
    chunks.foreach { case (offs, addr, nbytes, mask) =>
      b.u32(nbytes.toInt); b.u32(mask)
      offs.foreach(b.u64); b.u64(0)
      b.u64(addr)
    }
    b.u32(0); b.u32(0); (0 until 3).foreach(_ => b.u64(0))

    val vOH = objectHeader(b, Seq(
      msgBytes(0x0001, dataspace(Seq(4, 4))),
      msgBytes(0x0003, datatype(0, 2, signed = true)),
      msgBytes(0x000B, pipeline),
      msgBytes(0x0008, layoutChunked(btreeAddr, Seq(2, 4), 2))))

    b.pad(8)
    val heapDataAddr = b.pos
    val nameOff = b.pos - heapDataAddr
    b.bytes("v".getBytes("UTF-8")); b.u8(0)
    b.pad(8)
    val heapDataSize = b.pos - heapDataAddr
    val heapAddr = b.pos
    b.u32(0x50414548); b.u32(0)
    b.u64(heapDataSize); b.u64(1); b.u64(heapDataAddr)
    val snodAddr = b.pos
    b.u32(0x444F4E53); b.u8(1); b.u8(0)
    b.u16(1)
    b.u64(nameOff); b.u64(vOH); b.u32(0); b.u32(0)
    b.bytes(new Array[Byte](16))
    val btreeGroupAddr = b.pos
    b.u32(0x45455254); b.u8(0); b.u8(0); b.u16(1)
    b.u64(UNDEF); b.u64(UNDEF)
    b.u64(0); b.u64(snodAddr); b.u64(0)
    val rootOH = objectHeader(b, Seq(
      msgBytes(0x0011, {
        val s = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        s.putLong(btreeGroupAddr); s.putLong(heapAddr); s.array()
      })))
    b.patch64(rootEntry + 8, rootOH)
    b.patch64(eofPatch, b.pos)
    Files.write(Paths.get(path), b.result)
  }

  private def readV(path: String): Array[Double] = {
    val ch = graft.io.PositionedReader.open(path)
    try {
      val links = Hdf5.groupLinks(ch, Hdf5.rootAddress(ch)).toMap
      val ds = Hdf5.readDataset(ch, "v", links("v")).get
      Hdf5.readData(ch, ds)
    } finally ch.close()
  }

  private val wantV: Seq[Double] =
    for (r <- 0 until 4; c <- 0 until 4) yield (100 * r + c).toDouble

  test("h5py pipeline order decodes: shuffle -> deflate -> fletcher32") {
    val dir = Files.createTempDirectory("graft_h5f1").toString
    val p = s"$dir/a.h5"
    buildFiltered(p, filterPipeline(Seq(2 -> Seq(2), 1 -> Seq(6), 3 -> Nil)),
      (raw, _) => (fletchAppend(deflate(shuffleFwd(raw, 2))), 0))
    assert(readV(p).toSeq == wantV)
  }

  test("libnetcdf pipeline order decodes: fletcher32 -> shuffle -> deflate") {
    val dir = Files.createTempDirectory("graft_h5f2").toString
    val p = s"$dir/b.h5"
    // checksum applied FIRST: shuffle then runs over data+4 with a
    // 4-byte leftover tail (H5Zshuffle passthrough)
    buildFiltered(p, filterPipeline(Seq(3 -> Nil, 2 -> Seq(2), 1 -> Seq(6))),
      (raw, _) => (deflate(shuffleFwd(fletchAppend(raw), 2)), 0))
    assert(readV(p).toSeq == wantV)
  }

  test("szip (filter 4) is a loud PERMANENT deferral naming the " +
      "repack workaround") {
    // a NASA EOS-shaped pipeline (szip with H5Zszip client data) must
    // fail at the filter parse — by name, with the h5repack pointer —
    // never by silently misdecoding a CCSDS-121 stream this reader
    // cannot independently validate
    val dir = Files.createTempDirectory("graft_h5sz").toString
    val p = s"$dir/szip.h5"
    buildFiltered(p,
      filterPipeline(Seq(4 -> Seq(0x15, 16, 16, 4))),
      (raw, _) => (raw, 0))
    val e = intercept[IllegalArgumentException] { readV(p) }
    assert(e.getMessage.contains("szip"), e.getMessage)
    assert(e.getMessage.contains("CCSDS"), e.getMessage)
    assert(e.getMessage.contains("h5repack"), e.getMessage)
  }

  test("fletcher32 verification is real: corrupted checksum fails loudly") {
    val dir = Files.createTempDirectory("graft_h5f3").toString
    val p = s"$dir/c.h5"
    buildFiltered(p, filterPipeline(Seq(2 -> Seq(2), 1 -> Seq(6), 3 -> Nil)),
      (raw, cy) => {
        val enc = fletchAppend(deflate(shuffleFwd(raw, 2)))
        if (cy == 1) enc(enc.length - 1) = (enc(enc.length - 1) ^ 0x55).toByte
        (enc, 0)
      })
    val e = intercept[IllegalArgumentException] { readV(p) }
    assert(e.getMessage.contains("fletcher32"))
  }

  test("DIM_SCALE tagging disambiguates aux 1-D variables as coordinates") {
    val dir = Files.createTempDirectory("graft_h5ds").toString
    // x coord has a NON-conventional name AND an untagged aux 1-D var
    // shares its length — only the CLASS=DIM_SCALE tags on the real
    // coordinates resolve the axis
    buildFile(s"$dir/tagged.nc", xName = "projection_x",
      tagScales = true, withAux = true)
    val src = Hdf5Source(s"$dir/tagged.nc")
    assert(src.cellSize.contains(0.5))
    assert(src.extent.contains(Bbox(100.0, 198.5, 102.0, 200.0)))
    // without tags the same layout is genuinely ambiguous -> loud
    buildFile(s"$dir/untagged.nc", xName = "projection_x",
      tagScales = false, withAux = true)
    val e = intercept[IllegalArgumentException] {
      Hdf5Source(s"$dir/untagged.nc").cellSize
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("filterMask bits index pipeline POSITION, not filter type") {
    val dir = Files.createTempDirectory("graft_h5f4").toString
    val p = s"$dir/d.h5"
    // pipeline [shuffle, deflate]; chunk 1 stored shuffled-but-raw with
    // mask bit 1 (the deflate POSITION) set — a type-keyed mask (deflate
    // = bit 0) would inflate garbage or unshuffle twice
    buildFiltered(p, filterPipeline(Seq(2 -> Seq(2), 1 -> Seq(6))),
      (raw, cy) =>
        if (cy == 0) (deflate(shuffleFwd(raw, 2)), 0)
        else (shuffleFwd(raw, 2), 0x2))
    assert(readV(p).toSeq == wantV)
  }
}
