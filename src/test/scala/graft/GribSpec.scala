package graft

import java.nio.file.{Files, Paths}
import graft.raster._

/** GRIB2 read tests against INDEPENDENTLY hand-assembled messages: a
  * from-scratch big-endian serializer built from the WMO FM 92 GRIB2
  * section layouts (templates 3.0 / 4.0 / 5.0), exercising E/D scaling,
  * sign-and-magnitude integers, bitmaps, and both scanning modes — the
  * reader is never shown only its own writer's output. */
class GribSpec extends SparkSpec {

  // ------------------------------------------------------ byte builder

  private class B {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
    def sm32(v: Long): Unit = u32(if (v < 0) (1L << 31) | -v else v)
    def sm16(v: Int): Unit = u16(if (v < 0) 0x8000 | -v else v)
    def f32(v: Float): Unit =
      u32(java.lang.Float.floatToIntBits(v) & 0xFFFFFFFFL)
    def str(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def result(): Array[Byte] = out.toByteArray
  }

  /** One message: 4x3 grid of 12-or-fewer packed values.
    * `xs` are the packed integers (row-major, N->S unless scan 0x40),
    * `bitmap` marks present cells (None = no bitmap section 255). */
  private def message(xs: Seq[Int], bitmap: Option[Seq[Boolean]],
      hourOfDay: Int, r: Float = 1.5f, e: Int = -1, d: Int = 1,
      nbits: Int = 4, scan: Int = 0, forecastHours: Int = 0,
      w: Int = 4, h: Int = 3): Array[Byte] = {
    val b = new B
    val n = w * h
    val bitmapBytes = if (bitmap.isDefined) (n + 7) / 8 else 0
    val dataBytes = (xs.length * nbits + 7) / 8
    val msgLen = 16L + 21 + 72 + 34 + 21 + (6 + bitmapBytes) +
      (5 + dataBytes) + 4
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    // sec1: ref time 2020-03-01 hourOfDay:00:00
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(hourOfDay); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    // sec3 template 3.0: 0.5-deg cells, first center (52.0N, 4.0E)
    b.u32(72); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0); b.u16(0)
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(w.toLong); b.u32(h.toLong); b.u32(0); b.u32(0)
    val la1 = if ((scan & 0x40) != 0) 52000000L - (h - 1) * 500000L
      else 52000000L
    b.sm32(la1); b.sm32(4000000L)
    b.u8(0x30)
    b.sm32(0L); b.sm32(0L) // la2/lo2 (redundant, reader ignores)
    b.u32(500000L); b.u32(500000L)
    b.u8(scan)
    // sec4 template 4.0: total precipitation, forecast at +forecastHours
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(forecastHours.toLong)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    // sec5 template 5.0
    b.u32(21); b.u8(5); b.u32(xs.length.toLong); b.u16(0)
    b.f32(r); b.sm16(e); b.sm16(d); b.u8(nbits); b.u8(0)
    // sec6
    b.u32(6L + bitmapBytes); b.u8(6)
    bitmap match {
      case None => b.u8(255)
      case Some(bits) =>
        b.u8(0)
        var acc = 0; var k = 0
        bits.foreach { bit =>
          acc = (acc << 1) | (if (bit) 1 else 0); k += 1
          if (k == 8) { b.u8(acc); acc = 0; k = 0 }
        }
        if (k > 0) b.u8(acc << (8 - k))
    }
    // sec7
    b.u32(5L + dataBytes); b.u8(7)
    var acc = 0L; var nb = 0
    xs.foreach { x =>
      acc = (acc << nbits) | x; nb += nbits
      while (nb >= 8) { b.u8(((acc >>> (nb - 8)) & 0xFF).toInt); nb -= 8 }
    }
    if (nb > 0) b.u8(((acc << (8 - nb)) & 0xFF).toInt)
    b.str("7777")
    b.result()
  }

  private def writeFile(path: String, msgs: Array[Byte]*): Unit =
    Files.write(Paths.get(path), msgs.flatten.toArray)

  /** One message with a caller-supplied section 5 tail (octets 12+:
    * R/E/D + template params) and raw section 7 payload — for the
    * complex-packing (5.2/5.3) layouts the fixed 5.0 helper can't
    * express. Grid/product sections mirror `message()`. */
  private def complexMsg(w: Int, h: Int, template: Int, numPoints: Int,
      sec5Tail: B => Unit, payload: Array[Byte],
      bitmap: Option[Seq[Boolean]] = None,
      hourOfDay: Int = 6): Array[Byte] = {
    val tail = new B; sec5Tail(tail)
    val tailBytes = tail.result()
    val sec5Len = 11 + tailBytes.length
    val n = w * h
    val bitmapBytes = if (bitmap.isDefined) (n + 7) / 8 else 0
    val msgLen = 16L + 21 + 72 + 34 + sec5Len + (6 + bitmapBytes) +
      (5 + payload.length) + 4
    val b = new B
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(hourOfDay); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    b.u32(72); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0); b.u16(0)
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(w.toLong); b.u32(h.toLong); b.u32(0); b.u32(0)
    b.sm32(52000000L); b.sm32(4000000L)
    b.u8(0x30)
    b.sm32(0L); b.sm32(0L)
    b.u32(500000L); b.u32(500000L)
    b.u8(0)
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(0L)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    b.u32(sec5Len.toLong); b.u8(5); b.u32(numPoints.toLong); b.u16(template)
    b.out.write(tailBytes)
    b.u32(6L + bitmapBytes); b.u8(6)
    bitmap match {
      case None => b.u8(255)
      case Some(bits) =>
        b.u8(0)
        var acc = 0; var k = 0
        bits.foreach { bit =>
          acc = (acc << 1) | (if (bit) 1 else 0); k += 1
          if (k == 8) { b.u8(acc); acc = 0; k = 0 }
        }
        if (k > 0) b.u8(acc << (8 - k))
    }
    b.u32(5L + payload.length); b.u8(7)
    b.out.write(payload)
    b.str("7777")
    b.result()
  }

  private val T0 = java.time.Instant.parse("2020-03-01T06:00:00Z")

  // -------------------------------------------------------------- tests

  test("hand-assembled two-message stack decodes with E/D scaling") {
    val dir = Files.createTempDirectory("graft_grib").toString
    // frame 0 at 06:00 (analysis), frame 1 valid 07:00 via ref 06:00 +
    // forecast 1h — valid-time, not ref-time, orders the axis
    writeFile(s"$dir/rain.grib2",
      message((0 until 12).toSeq, None, 6),
      message((0 until 12).map(_ + 1), None, 6, forecastHours = 1))
    val src = RasterFileSource(s"$dir/rain.grib2")
    assert(src.isInstanceOf[GribSource])
    assert(src.projection == "EPSG:4326")
    assert(src.cellSize.contains(0.5))
    // first center (52.0, 4.0), 0.5-deg cells: origin edges (3.75, 52.25)
    val ext = src.extent.get
    assert(math.abs(ext.x1 - 3.75) < 1e-9 && math.abs(ext.y2 - 52.25) < 1e-9)
    assert(math.abs(ext.x2 - 5.75) < 1e-9 && math.abs(ext.y1 - 50.75) < 1e-9)
    assert(src.allTimes == Seq(T0, T0.plusSeconds(3600)))
    val req = RasterRequest(ext, "EPSG:4326", 4, 3,
      Some(T0), Some(T0.plusSeconds(3600)))
    val res = src.getData(req)(spark).get
    // v = (1.5 + X * 2^-1) / 10^1
    for (i <- 0 until 12) {
      assert(math.abs(res.values(0)(i) - (1.5 + i * 0.5) / 10.0) < 1e-12)
      assert(math.abs(res.values(1)(i) - (1.5 + (i + 1) * 0.5) / 10.0) < 1e-12)
    }
  }

  test("bitmap cells come back as nodata; section-5 count is enforced") {
    val dir = Files.createTempDirectory("graft_gribb").toString
    val present = Seq(true, false, true, true, true, true, false, true,
      true, true, true, false)
    writeFile(s"$dir/b.grib2",
      message((0 until 9).toSeq, Some(present), 6))
    val src = GribSource(s"$dir/b.grib2")
    val req = RasterRequest(src.extent.get, "EPSG:4326", 4, 3,
      Some(T0), Some(T0))
    val vals = src.getData(req)(spark).get.values(0)
    val nd = Double.MaxValue
    var k = 0
    for (i <- 0 until 12) {
      if (present(i)) {
        assert(math.abs(vals(i) - (1.5 + k * 0.5) / 10.0) < 1e-12); k += 1
      } else assert(vals(i) == nd, s"cell $i should be nodata")
    }
    // declared point count must match the bitmap
    writeFile(s"$dir/bad.grib2",
      message((0 until 8).toSeq, Some(present), 6))
    val e = intercept[IllegalArgumentException] {
      GribSource(s"$dir/bad.grib2").getData(req)(spark)
    }
    assert(e.getMessage.contains("bitmap"))
  }

  test("scan mode 0x40 (south-to-north rows) flips to the north-down grid") {
    val dir = Files.createTempDirectory("graft_gribs").toString
    // rows written S->N; reading back must give the same frame as the
    // N->S message with rows pre-flipped
    val northDown = (0 until 12).toSeq
    val southUp = (2 to 0 by -1).flatMap(r => (0 until 4).map(c => r * 4 + c))
    writeFile(s"$dir/n.grib2", message(northDown, None, 6))
    writeFile(s"$dir/s.grib2", message(southUp, None, 6, scan = 0x40))
    val a = GribSource(s"$dir/n.grib2")
    val b = GribSource(s"$dir/s.grib2")
    assert(a.extent == b.extent) // same physical graticule
    val req = RasterRequest(a.extent.get, "EPSG:4326", 4, 3, Some(T0), Some(T0))
    assert(a.getData(req)(spark).get.values(0).toSeq ==
      b.getData(req)(spark).get.values(0).toSeq)
  }

  test("GribSink round-trips a stack; times and nodata survive") {
    val dir = Files.createTempDirectory("graft_gribw").toString
    val req = RasterFixtures.valsRequest
    val path = GribSink(RasterFixtures.source, s"$dir/stack.grib2",
      degPerCell = 0.05).write(req)(spark)
    val back = RasterFileSource(path)
    assert(back.isInstanceOf[GribSource])
    assert(back.temporal &&
      back.timeDeltaMs.contains(RasterFixtures.Hour))
    val want = RasterFixtures.source.getData(req)(spark).get
    // read on the grib's own graticule (the sink REMAPS the pixel grid
    // onto lat/lon; values and times are what round-trip)
    val ext = back.extent.get
    val backReq = RasterRequest(ext, "EPSG:4326", req.width, req.height,
      req.start, req.stop)
    val res = back.getData(backReq)(spark).get
    assert(res.times == want.times)
    val nd = want.noDataValue
    for (f <- want.values.indices; i <- want.values(f).indices) {
      val w = want.values(f)(i)
      val g = res.values(f)(i)
      if (w == nd) assert(g == res.noDataValue) else assert(g == w,
        s"frame $f cell $i: $g != $w")
    }
  }

  test("temporal slice decodes only the selected fields' bytes") {
    val dir = Files.createTempDirectory("graft_gribp").toString
    val path = s"$dir/stack.grib2"
    writeFile(path,
      message((0 until 12).toSeq, None, 6),
      message((0 until 12).map(_ + 1), None, 6, forecastHours = 1))
    val src0 = GribSource(path)
    val ext = src0.extent.get
    val full = RasterRequest(ext, "EPSG:4326", 4, 3,
      Some(T0), Some(T0.plusSeconds(3600)))
    val slice = full.copy(start = Some(T0.plusSeconds(3600)))
    val fullBefore = src0.getData(full)(spark).get
    // zero frame 0's packed data payload (12 values x 4 bits = the 6
    // bytes before the first "7777"): the message structure stays
    // valid, so only a read that touches frame 0's DATA bytes changes
    val bytes = Files.readAllBytes(Paths.get(path))
    val firstEnd = {
      var i = 16; var at = -1
      while (at < 0 && i < bytes.length - 4) {
        if (bytes(i) == '7' && bytes(i + 1) == '7' && bytes(i + 2) == '7' &&
          bytes(i + 3) == '7') at = i
        i += 1
      }
      at
    }
    assert(firstEnd > 0)
    for (i <- (firstEnd - 6) until firstEnd) bytes(i) = 0
    Files.write(Paths.get(path), bytes)
    val src = GribSource(path)
    val one = src.getData(slice)(spark).get
    assert(one.times == Seq(T0.plusSeconds(3600)))
    assert(one.values(0).toSeq == fullBefore.values(1).toSeq)
    // and the clobber is real: a full read decodes DIFFERENT frame-0
    // values now (all X=0)
    val fullAfter = src.getData(full)(spark).get
    assert(fullAfter.values(0).toSeq != fullBefore.values(0).toSeq)
    assert(fullAfter.values(0).forall(_ == 0.15))
  }

  test("failure modes are loud: edition 3, bad templates, truncation") {
    val dir = Files.createTempDirectory("graft_gribf").toString
    val good = message((0 until 12).toSeq, None, 6)
    // unknown edition (1 and 2 both read now; 3 does not exist)
    val ed3 = good.clone(); ed3(7) = 3
    Files.write(Paths.get(s"$dir/ed3.grib2"), ed3)
    val e1 = intercept[IllegalArgumentException] {
      GribSource(s"$dir/ed3.grib2").extent
    }
    assert(e1.getMessage.contains("edition"))
    // an edition-1 flag on GRIB2 bytes reparses the header as the
    // edition-1 layout and fails loudly on its nonsense lengths
    val ed1 = good.clone(); ed1(7) = 1
    Files.write(Paths.get(s"$dir/ed1.grib2"), ed1)
    val e1b = intercept[IllegalArgumentException] {
      GribSource(s"$dir/ed1.grib2").extent
    }
    assert(e1b.getMessage.contains("GRIB1"), e1b.getMessage)
    // grid template 3.90 (space view, unsupported) — offset: 16 (sec0)
    // + 21 (sec1) + 12 bytes into sec3 -> template number at bytes 49-50
    val sv = good.clone(); sv(50) = 90
    Files.write(Paths.get(s"$dir/sv.grib2"), sv)
    val e3 = intercept[IllegalArgumentException] {
      GribSource(s"$dir/sv.grib2").extent
    }
    assert(e3.getMessage.contains("3.90"))
    // a 3.30 template in a too-short (3.0-sized) section is loud too
    val lcc = good.clone(); lcc(50) = 30
    Files.write(Paths.get(s"$dir/lcc_short.grib2"), lcc)
    val e3s = intercept[IllegalArgumentException] {
      GribSource(s"$dir/lcc_short.grib2").extent
    }
    assert(e3s.getMessage.contains("too short"), e3s.getMessage)
    // truncated mid-message
    Files.write(Paths.get(s"$dir/trunc.grib2"), good.take(60))
    val et = intercept[IllegalArgumentException] {
      GribSource(s"$dir/trunc.grib2").extent
    }
    assert(et.getMessage.toLowerCase.contains("grib"))
    // non-integral values refuse to pack rather than round
    val ew = intercept[IllegalArgumentException] {
      Grib.write(s"$dir/frac.grib2", Seq(Array(1.25, 2.0)), 2, 1,
        Double.MaxValue, Seq(0L), 0.0, 0.0, 0.5)
    }
    assert(ew.getMessage.contains("non-integral"))
    // odd-microdegree pitch: centers would fall on half-microdegree
    // positions that integer La1/Lo1 fields cannot carry
    val eo = intercept[IllegalArgumentException] {
      Grib.write(s"$dir/odd.grib2", Seq(Array(1.0, 2.0)), 2, 1,
        Double.MaxValue, Seq(0L), 0.0, 0.0, 0.000003)
    }
    assert(eo.getMessage.contains("odd"))
  }

  test("hand-assembled 5.2 complex packing: groups, refs, widths, E/D") {
    // 12 points in 3 groups: X = [3,4,5,6,3 | 7,0,5,2 | 10,10,10]
    // refs [3,0,10] (4 bits), widths [2,3,0] (widthRef 0, 2 bits),
    // lengths [5,4,3] as lenRef 3 + scaled*1, last true length 3
    val sec5: B => Unit = { b =>
      b.f32(1.5f); b.sm16(-1); b.sm16(1) // R, E, D
      b.u8(4)  // ref bits
      b.u8(0)  // original type
      b.u8(1)  // general group splitting
      b.u8(0)  // no missing mgmt
      b.u32(0); b.u32(0)
      b.u32(3) // NG
      b.u8(0); b.u8(2)  // widthRef, widthBits
      b.u32(3); b.u8(1) // lenRef, lenInc
      b.u32(3)          // true last length
      b.u8(2)           // lenBits
    }
    val payload = Array[Byte](
      0x30, 0xA0.toByte,        // refs 3,0,10 @4b + pad
      0xB0.toByte,              // widths 2,3,0 @2b + pad
      0x90.toByte,              // scaled lens 2,1,0 @2b + pad
      0x1B, 0x38, 0xA8.toByte)  // 0,1,2,3,0 @2b; 7,0,5,2 @3b; (w=0) + pad
    val dir = Files.createTempDirectory("graft_grib52").toString
    writeFile(s"$dir/c.grib2", complexMsg(4, 3, 2, 12, sec5, payload))
    val ch = graft.io.PositionedReader.open(s"$dir/c.grib2")
    try {
      val m = Grib.readMeta(ch, s"$dir/c.grib2")
      val got = Grib.decode(ch, m.fields.head, Double.MaxValue)
      val expX = Seq(3, 4, 5, 6, 3, 7, 0, 5, 2, 10, 10, 10)
      // decoder formula shape: R/10^D + X * (2^E/10^D)
      val want = expX.map(x => 1.5 / 10.0 + x * (0.5 / 10.0))
      assert(got.toSeq == want, got.toSeq)
    } finally ch.close()
  }

  test("hand-assembled 5.3 spatial differencing reconstructs exactly") {
    // order 2, 2-octet descriptors: X = [10,12,15,19,24,30] — second
    // differences are all 1, so minsd=1 and every packed value is 0
    // (NG=1, 0-bit refs and widths: the whole field rides in the
    // initial values + minimum)
    val sec52: B => Unit = { b =>
      b.f32(0f); b.sm16(0); b.sm16(0)
      b.u8(0)  // ref bits: none
      b.u8(0); b.u8(1); b.u8(0); b.u32(0); b.u32(0)
      b.u32(1) // NG
      b.u8(0); b.u8(0)  // widthRef 0, widthBits 0
      b.u32(6); b.u8(1); b.u32(6); b.u8(0)
      b.u8(2); b.u8(2)  // order 2, 2 octets
    }
    val pay2 = Array[Byte](0, 10, 0, 12, 0, 1) // ival1=10, ival2=12, min=1
    val dir = Files.createTempDirectory("graft_grib53").toString
    writeFile(s"$dir/o2.grib2", complexMsg(3, 2, 3, 6, sec52, pay2))
    val ch2 = graft.io.PositionedReader.open(s"$dir/o2.grib2")
    try {
      val m = Grib.readMeta(ch2, s"$dir/o2.grib2")
      val got = Grib.decode(ch2, m.fields.head, Double.MaxValue)
      assert(got.toSeq == Seq(10.0, 12.0, 15.0, 19.0, 24.0, 30.0), got.toSeq)
    } finally ch2.close()

    // order 1 with a NEGATIVE minimum (sign-magnitude byte 0x82):
    // X = [5,3,2,4], diffs [-2,-1,2], minsd=-2, packed [0,0,1,4] @3b
    val sec51: B => Unit = { b =>
      b.f32(0f); b.sm16(0); b.sm16(0)
      b.u8(2)  // ref bits (one ref = 0)
      b.u8(0); b.u8(1); b.u8(0); b.u32(0); b.u32(0)
      b.u32(1)
      b.u8(3); b.u8(0)  // widthRef 3, widthBits 0
      b.u32(4); b.u8(1); b.u32(4); b.u8(0)
      b.u8(1); b.u8(1)  // order 1, 1 octet
    }
    val pay1 = Array[Byte](0x05, 0x82.toByte, // ival1=5, minsd=-2
      0x00,                                   // ref 0 @2b + pad
      0x00, 0xC0.toByte)                      // 0,0,1,4 @3b + pad
    writeFile(s"$dir/o1.grib2", complexMsg(4, 1, 3, 4, sec51, pay1))
    val ch1 = graft.io.PositionedReader.open(s"$dir/o1.grib2")
    try {
      val m = Grib.readMeta(ch1, s"$dir/o1.grib2")
      val got = Grib.decode(ch1, m.fields.head, Double.MaxValue)
      assert(got.toSeq == Seq(5.0, 3.0, 2.0, 4.0), got.toSeq)
    } finally ch1.close()
  }

  test("complex-packed write/read round-trips with bitmaps and slicing") {
    val nd = Double.MaxValue
    val dir = Files.createTempDirectory("graft_gribc").toString
    val w = 7; val h = 5
    // spatially-smooth field + nodata holes — the complex-packing
    // sweet spot (small second differences)
    def frame(t: Int): Array[Double] = Array.tabulate(w * h) { i =>
      val r = i / w; val c = i % w
      if ((r + c + t) % 9 == 0) nd
      else 100.0 + 3 * r + 2 * c + t + (r * c % 4)
    }
    val frames = Seq(frame(0), frame(1), frame(2))
    val times = Seq(0L, 3600000L, 7200000L)
    for ((tpl, od) <- Seq((2, 2), (3, 1), (3, 2))) {
      val p = s"$dir/t${tpl}o$od.grib2"
      Grib.write(p, frames, w, h, nd, times, 0.0, 0.0, 0.05,
        template = tpl, sdOrder = od)
      val ch = graft.io.PositionedReader.open(p)
      try {
        val m = Grib.readMeta(ch, p)
        assert(m.timesMs == times)
        for (i <- frames.indices)
          assert(Grib.decode(ch, m.fields(i), nd).sameElements(frames(i)),
            s"template $tpl order $od frame $i")
      } finally ch.close()
    }
    // the field-pruned temporal slice decodes a complex-packed frame
    val p3 = s"$dir/t3o2.grib2"
    val src = GribSource(p3)
    val req = RasterRequest(src.extent.get, "EPSG:4326", w, h,
      Some(java.time.Instant.ofEpochMilli(3600000L)),
      Some(java.time.Instant.ofEpochMilli(3600000L)))
    val res = src.getData(req).get
    assert(res.values.length == 1)
    assert(res.values.head.sameElements(frame(1)))
  }

  test("product template 4.8: valid time is the interval END (absolute)") {
    // one message, 2x1 grid, simple packing, product 4.8 whose overall
    // time interval ends 2020-03-02T09:00Z (reference 2020-03-01T06:00Z)
    val b = new B
    val n = 2
    val sec4Len = 58L // 34 common + 7 end-time + 1 nRanges + 4 missing + 12
    val dataBytes = 1L // 2 values at 4 bits
    val msgLen = 16L + 21 + 72 + sec4Len + 21 + 6 + (5 + dataBytes) + 4
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    b.u32(72); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0); b.u16(0)
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(2L); b.u32(1L); b.u32(0); b.u32(0)
    b.sm32(52000000L); b.sm32(4000000L)
    b.u8(0x30); b.sm32(0L); b.sm32(0L)
    b.u32(500000L); b.u32(500000L); b.u8(0)
    // section 4, template 4.8
    b.u32(sec4Len); b.u8(4); b.u16(0); b.u16(8)
    b.u8(1); b.u8(8)          // category, number (total precip)
    b.u8(2); b.u8(0); b.u8(0) // process ids
    b.u16(0); b.u8(0)         // cutoff
    b.u8(1); b.u32(24L)       // forecast +24 h (start of interval)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0) // surfaces
    b.u16(2020); b.u8(3); b.u8(2); b.u8(9); b.u8(0); b.u8(0) // interval END
    b.u8(1)                   // one time range specification
    b.u32(0)                  // no missing values
    b.u8(1); b.u8(2); b.u8(1); b.u32(3L); b.u8(255); b.u32(0) // accum, 3 h
    // section 5/6/7: X = [3, 7] at 4 bits, R=0 E=0 D=0
    b.u32(21); b.u8(5); b.u32(2); b.u16(0)
    b.f32(0f); b.sm16(0); b.sm16(0); b.u8(4); b.u8(0)
    b.u32(6); b.u8(6); b.u8(255)
    b.u32(6); b.u8(7); b.u8(0x37)
    b.str("7777")
    val dir = Files.createTempDirectory("graft_grib48").toString
    writeFile(s"$dir/acc.grib2", b.result())
    val ch = graft.io.PositionedReader.open(s"$dir/acc.grib2")
    try {
      val m = Grib.readMeta(ch, s"$dir/acc.grib2")
      // NOT refTime+forecast (2020-03-02T06:00) — the transmitted end
      assert(m.timesMs == Seq(
        java.time.Instant.parse("2020-03-02T09:00:00Z").toEpochMilli))
      assert(Grib.decode(ch, m.fields.head, Double.MaxValue).toSeq ==
        Seq(3.0, 7.0))
    } finally ch.close()
    // an unknown product template stays loud
    val bad = b.result().clone()
    // sec4 template u16 at offset 16+21+72+7+2 = 118? sec4 starts at
    // 109; len(4) num(1) coords(2) -> template at 116-117
    assert(bad(117) == 8)
    bad(117) = 9
    Files.write(Paths.get(s"$dir/bad.grib2"), bad)
    val e = intercept[IllegalArgumentException] {
      GribSource(s"$dir/bad.grib2").extent
    }
    assert(e.getMessage.contains("4.9"))
  }

  test("spherical PARAM:LCC matches Snyder's published worked example") {
    // Snyder 1987 (USGS PP 1395), spherical LCC numerical example:
    // R=1, parallels 33/45, origin (23N, 96W); (35N, 75W) ->
    // x=0.2966785, y=0.2462112
    val code = "PARAM:LCC:A=1;INVF=1000000000000;SP1=33;SP2=45;" +
      "LAT0=23;LON0=-96"
    val (x, y) = Proj.transform("EPSG:4326", code, -75.0, 35.0)
    assert(math.abs(x - 0.2966785) < 2e-6 &&
      math.abs(y - 0.2462112) < 2e-6, s"($x, $y)")
    val (lon, lat) = Proj.transform(code, "EPSG:4326", x, y)
    assert(math.abs(lon + 75) < 1e-7 && math.abs(lat - 35) < 1e-7)
  }

  test("grid template 3.30: Lambert grid in native metres + warped read") {
    // hand-assembled HRRR-style message: sphere 6371229, parallels
    // 38.5/38.5, LoV 262.5, 3 km cells, 3x2 grid, first point NW
    val b = new B
    val n = 6
    val msgLen = 16L + 21 + 81 + 34 + 21 + 6 + (5 + 3) + 4
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    // section 3, template 3.30 (81 octets)
    b.u32(81); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0)
    b.u16(30)
    b.u8(6)                        // shape: sphere 6371229
    b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(3); b.u32(2)             // Nx, Ny
    b.sm32(38000000L)              // La1 38.0
    b.sm32(262000000L)             // Lo1 262.0 (= -98)
    b.u8(0x08)                     // resolution/component flags
    b.sm32(38500000L)              // LaD
    b.sm32(262500000L)             // LoV (= -97.5)
    b.u32(3000000L); b.u32(3000000L) // Dx, Dy mm
    b.u8(0)                        // projection centre: north pole
    b.u8(0)                        // scan: +i, -j (first row north)
    b.sm32(38500000L); b.sm32(38500000L) // Latin1, Latin2
    b.sm32(0L); b.sm32(0L)         // southern pole (unused)
    // section 4 (4.0), 5 (5.0, X=0..5 @4 bits), 6, 7, 8
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(0L)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    b.u32(21); b.u8(5); b.u32(n.toLong); b.u16(0)
    b.f32(0f); b.sm16(0); b.sm16(0); b.u8(4); b.u8(0)
    b.u32(6); b.u8(6); b.u8(255)
    b.u32(8); b.u8(7); b.u8(0x01); b.u8(0x23); b.u8(0x45)
    b.str("7777")
    val dir = Files.createTempDirectory("graft_grib330").toString
    writeFile(s"$dir/lcc.grib2", b.result())
    val src = GribSource(s"$dir/lcc.grib2")
    val proj = src.projection
    assert(proj.startsWith("PARAM:LCC:") && proj.contains("SP1=38.5") &&
      proj.contains("LON0=-97.5"), proj)
    assert(src.cellSize.contains(3000.0))
    // extent derives from the PROJECTED first point (cell centers ->
    // edges in metres)
    val (x1, y1) = Proj.transform("EPSG:4326", proj, -98.0, 38.0)
    val ext = src.extent.get
    assert(math.abs(ext.x1 - (x1 - 1500)) < 1e-6 &&
      math.abs(ext.y2 - (y1 + 1500)) < 1e-6, ext)
    // native full read decodes the packed values in row-major order
    val ch = graft.io.PositionedReader.open(s"$dir/lcc.grib2")
    try {
      val m = Grib.readMeta(ch, s"$dir/lcc.grib2")
      assert(Grib.decode(ch, m.fields.head, Double.MaxValue).toSeq ==
        Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    } finally ch.close()
    // cross-CRS: a 1x1 EPSG:4326 point request at cell (0,1)'s center
    // warps through the shared NN stage onto the Lambert grid
    val (clon, clat) = Proj.transform(proj, "EPSG:4326", x1 + 3000, y1)
    val req = RasterRequest(Bbox(clon, clat, clon, clat), "EPSG:4326", 1, 1,
      None, None)
    val got = src.getData(req)(spark).get.values(0)
    assert(got.toSeq == Seq(1.0), got.toSeq)
  }

  test("grid template 3.10: Mercator grid + warped read") {
    // Hawaii-style: sphere 6371229, true scale 20N, 2.5 km cells,
    // 3x2, first point (22N, 200E = -160), scan 0
    val b = new B
    val n = 6
    val msgLen = 16L + 21 + 72 + 34 + 21 + 6 + (5 + 3) + 4
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    b.u32(72); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0)
    b.u16(10)
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(3); b.u32(2)
    b.sm32(22000000L)   // La1 22.0
    b.sm32(200000000L)  // Lo1 200.0 (= -160)
    b.u8(0x08)
    b.sm32(20000000L)   // LaD 20.0
    b.sm32(0L); b.sm32(0L) // la2/lo2 (reader ignores)
    b.u8(0)             // scan
    b.u32(0)            // orientation
    b.u32(2500000L); b.u32(2500000L) // Di, Dj mm
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(0L)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    b.u32(21); b.u8(5); b.u32(n.toLong); b.u16(0)
    b.f32(0f); b.sm16(0); b.sm16(0); b.u8(4); b.u8(0)
    b.u32(6); b.u8(6); b.u8(255)
    b.u32(8); b.u8(7); b.u8(0x01); b.u8(0x23); b.u8(0x45)
    b.str("7777")
    val dir = Files.createTempDirectory("graft_grib310").toString
    writeFile(s"$dir/merc.grib2", b.result())
    val src = GribSource(s"$dir/merc.grib2")
    val proj = src.projection
    assert(proj.startsWith("PARAM:MERC:") && proj.contains("SP1=20") &&
      proj.contains("LON0=-160"), proj)
    assert(src.cellSize.contains(2500.0))
    val (x1, y1) = Proj.transform("EPSG:4326", proj, -160.0, 22.0)
    assert(math.abs(x1) < 1e-6) // central meridian pinned to Lo1
    val ext = src.extent.get
    assert(math.abs(ext.x1 - (x1 - 1250)) < 1e-6 &&
      math.abs(ext.y2 - (y1 + 1250)) < 1e-6, ext)
    // warped point read at cell (1,0)'s center -> value 3
    val (clon, clat) = Proj.transform(proj, "EPSG:4326", x1, y1 - 2500)
    val req = RasterRequest(Bbox(clon, clat, clon, clat), "EPSG:4326", 1, 1,
      None, None)
    assert(src.getData(req)(spark).get.values(0).toSeq == Seq(3.0))
  }

  test("grid template 3.20: polar stereographic grid + warped read") {
    // NCEP Alaska-style: sphere 6371229, true scale 60N, LoV 210
    // (= -150), 5 km cells, 3x2, first point NW, scan 0
    def msg(centre: Int, laD: Long): Array[Byte] = {
      val b = new B
      val n = 6
      val msgLen = 16L + 21 + 65 + 34 + 21 + 6 + (5 + 3) + 4
      b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
      b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
      b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
      b.u8(0); b.u8(0)
      b.u32(65); b.u8(3); b.u8(0); b.u32(n.toLong); b.u8(0); b.u8(0)
      b.u16(20)
      b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
      b.u32(3); b.u32(2)
      b.sm32(64000000L)   // La1 64.0
      b.sm32(205000000L)  // Lo1 205.0 (= -155)
      b.u8(0x08)
      b.sm32(laD)         // LaD
      b.sm32(210000000L)  // LoV (= -150)
      b.u32(5000000L); b.u32(5000000L)
      b.u8(centre); b.u8(0)
      b.u32(34); b.u8(4); b.u16(0); b.u16(0)
      b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
      b.u8(1); b.u32(0L)
      b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
      b.u32(21); b.u8(5); b.u32(n.toLong); b.u16(0)
      b.f32(0f); b.sm16(0); b.sm16(0); b.u8(4); b.u8(0)
      b.u32(6); b.u8(6); b.u8(255)
      b.u32(8); b.u8(7); b.u8(0x01); b.u8(0x23); b.u8(0x45)
      b.str("7777")
      b.result()
    }
    val dir = Files.createTempDirectory("graft_grib320").toString
    writeFile(s"$dir/ps.grib2", msg(0, 60000000L))
    val src = GribSource(s"$dir/ps.grib2")
    val proj = src.projection
    assert(proj.startsWith("PARAM:PS:") && proj.contains("SP1=60") &&
      proj.contains("LON0=-150") && !proj.contains("SOUTH"), proj)
    assert(src.cellSize.contains(5000.0))
    val (x1, y1) = Proj.transform("EPSG:4326", proj, -155.0, 64.0)
    val ext = src.extent.get
    assert(math.abs(ext.x1 - (x1 - 2500)) < 1e-6 &&
      math.abs(ext.y2 - (y1 + 2500)) < 1e-6, ext)
    // warped point read at cell (1,2)'s center -> value 5
    val (clon, clat) =
      Proj.transform(proj, "EPSG:4326", x1 + 2 * 5000, y1 - 5000)
    val req = RasterRequest(Bbox(clon, clat, clon, clat), "EPSG:4326", 1, 1,
      None, None)
    assert(src.getData(req)(spark).get.values(0).toSeq == Seq(5.0))
    // a south-pole flag contradicting a northern LaD is loud
    writeFile(s"$dir/bad.grib2", msg(0x80, 60000000L))
    val e = intercept[IllegalArgumentException] {
      GribSource(s"$dir/bad.grib2").extent
    }
    assert(e.getMessage.contains("contradicts"), e.getMessage)
  }

  test("complex-packing failure modes are loud and named") {
    // template 5.40 names the JPEG2000 gap; bad splitting/missing too
    val base = complexMsg(3, 2, 3, 6, { b =>
      b.f32(0f); b.sm16(0); b.sm16(0)
      b.u8(0); b.u8(0); b.u8(1); b.u8(0); b.u32(0); b.u32(0)
      b.u32(1); b.u8(0); b.u8(0); b.u32(6); b.u8(1); b.u32(6); b.u8(0)
      b.u8(2); b.u8(2)
    }, Array[Byte](0, 10, 0, 12, 0, 1))
    val dir = Files.createTempDirectory("graft_gribcf").toString
    // section 5 starts at 16+21+72+34 = 143; its template u16 is at
    // 152-153, splitting method octet 22 at 164, missing mgmt at 165,
    // sd order octet 48 at 143+47 = 190
    def mutated(at: Int, v: Int): Array[Byte] = {
      val c = base.clone(); c(at) = v.toByte; c
    }
    def expectFail(name: String, bytes: Array[Byte], needle: String): Unit = {
      Files.write(Paths.get(s"$dir/$name.grib2"), bytes)
      val e = intercept[IllegalArgumentException] {
        GribSource(s"$dir/$name.grib2").extent
      }
      assert(e.getMessage.contains(needle), s"$name: ${e.getMessage}")
    }
    assert(base(153) == 3) // template byte where we expect it
    expectFail("jp2", mutated(153, 40), "JPEG2000")
    assert(base(164) == 1)
    expectFail("split", mutated(164, 2), "group splitting")
    assert(base(165) == 0)
    expectFail("missing", mutated(165, 1), "missing value management")
    assert(base(190) == 2)
    expectFail("order", mutated(190, 3), "differencing order")
  }

  test("GRIB edition 1 round-trips values, bitmap and times exactly") {
    val dir = Files.createTempDirectory("graft_g1").toString
    val p = s"$dir/stack.grib"
    val w = 7; val h = 5; val nd = Double.MaxValue
    val frames = Seq(
      Array.tabulate(w * h)(i => (i % 13).toDouble),
      Array.tabulate(w * h)(i => if (i % 4 == 0) nd else (100 + i).toDouble),
      Array.fill(w * h)(42.0)) // constant frame: nbits = 0
    val times = Seq(0L, 3600000L, 7200000L)
    Grib.writeEdition1(p, frames, w, h, nd, times, laSouth = 50.0,
      loWest = 4.0, degPerCell = 0.05)
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      assert(m.w == w && m.h == h && m.timesMs == times)
      assert(m.cellSize == 0.05 && m.projection == "EPSG:4326")
      for (i <- frames.indices)
        assert(Grib.decode(ch, m.fields(i), nd).toSeq == frames(i).toSeq,
          s"frame $i")
      // time semantics ride the PDS: analysis (TRI 1) means valid == ref
      assert(m.fields.forall(f => f.refTimeMs == f.validTimeMs))
    } finally ch.close()
    // forecast variant: valid = ref + P1 hours under TRI 0
    val p2 = s"$dir/fc.grib"
    Grib.writeEdition1(p2, frames.take(1), w, h, nd, Seq(7200000L), 50.0,
      4.0, 0.05, forecastHours = 2)
    val ch2 = graft.io.PositionedReader.open(p2)
    try {
      val m2 = Grib.readMeta(ch2, p2)
      assert(m2.timesMs == Seq(7200000L))
      assert(m2.fields.head.refTimeMs == 0L)
      assert(Grib.decode(ch2, m2.fields.head, nd).toSeq == frames(0).toSeq)
    } finally ch2.close()
  }

  test("mixed edition 1 + 2 archives read as one stack") {
    val dir = Files.createTempDirectory("graft_g1mix").toString
    val w = 6; val h = 4; val nd = Double.MaxValue
    val f0 = Array.tabulate(w * h)(i => (i * 3 % 17).toDouble)
    val f1 = Array.tabulate(w * h)(i => (i * 5 % 19).toDouble)
    Grib.write(s"$dir/a.grib2", Seq(f0), w, h, nd, Seq(0L), 50.0, 4.0, 0.05)
    Grib.writeEdition1(s"$dir/b.grib", Seq(f1), w, h, nd, Seq(3600000L),
      50.0, 4.0, 0.05)
    val both = Files.readAllBytes(Paths.get(s"$dir/a.grib2")) ++
      Files.readAllBytes(Paths.get(s"$dir/b.grib"))
    val p = s"$dir/mixed.grib2"
    Files.write(Paths.get(p), both)
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      assert(m.timesMs == Seq(0L, 3600000L))
      assert(Grib.decode(ch, m.fields(0), nd).toSeq == f0.toSeq)
      assert(Grib.decode(ch, m.fields(1), nd).toSeq == f1.toSeq)
    } finally ch.close()
  }

  test("GRIB1 rejects the unsupported by name") {
    val dir = Files.createTempDirectory("graft_g1f").toString
    val base0 = s"$dir/base.grib"
    Grib.writeEdition1(base0, Seq(Array.tabulate(12)(_.toDouble)), 4, 3,
      Double.MaxValue, Seq(0L), 50.0, 4.0, 0.05)
    val base = Files.readAllBytes(Paths.get(base0))
    def expectFail(name: String, at: Int, v: Int, needle: String): Unit = {
      val c = base.clone(); c(at) = v.toByte
      Files.write(Paths.get(s"$dir/$name.grib"), c)
      val e = intercept[IllegalArgumentException] {
        GribSource(s"$dir/$name.grib").extent
      }
      assert(e.getMessage.contains(needle), s"$name: ${e.getMessage}")
    }
    // layout with no bitmap: IS 8 | PDS 28 @8 | GDS 32 @36 | BDS @68
    expectFail("edition", 7, 3, "edition 3")
    expectFail("nogds", 15, 0x00, "predefined grids")
    expectFail("tri", 28, 3, "time range indicator")
    expectFail("pv", 40, 0, "vertical-coordinate")
    expectFail("drt", 41, 5, "data representation type")
    val ni = base.clone(); ni(42) = 0xFF.toByte; ni(43) = 0xFF.toByte
    Files.write(Paths.get(s"$dir/ni.grib"), ni)
    val eNi = intercept[IllegalArgumentException] {
      GribSource(s"$dir/ni.grib").extent
    }
    assert(eNi.getMessage.contains("quasi-regular"), eNi.getMessage)
    expectFail("incr", 52, 0x00, "direction increments")
    expectFail("scan", 63, 0x80, "scanning mode")
    expectFail("sh", 71, 0x80 | base(71), "spherical-harmonic")
    // second-order flag WITHOUT the octet-14 extension octet: still a
    // named loud failure (the supported second-order path needs it)
    expectFail("cx", 71, 0x40 | base(71), "extended-flags octet")
    expectFail("extra", 71, 0x10 | base(71), "additional BDS flags")
  }

  test("unpackComplex fails loudly on crafted overflow, never garbage") {
    import graft.raster.Grib
    // (a) width-field int overflow: widthBits=31 all-ones makes
    // widthRef + 2^31-1 wrap negative — must hit the loud range check,
    // not silently read 0-bit values
    val pNegW = Grib.Packing(4, 0f, 0, 0, nbits = 0, template = 2,
      cx = Grib.Cx(ng = 1, widthRef = 255, widthBits = 31, lenRef = 0,
        lenInc = 0, lastLen = 4, lenBits = 0, sdOrder = 0, sdOctets = 0))
    val e1 = intercept[IllegalArgumentException] {
      Grib.unpackComplex(Array.fill[Byte](64)(0xFF.toByte), pNegW, 4)
    }
    assert(e1.getMessage.contains("group width"), e1.getMessage)
    // (b) order-2 spatial-difference integration on max-width all-ones
    // values walks past 2^63 within a few steps: exact arithmetic must
    // throw, not wrap into plausible-looking values
    val pOvf = Grib.Packing(8, 0f, 0, 0, nbits = 0, template = 3,
      cx = Grib.Cx(ng = 1, widthRef = 62, widthBits = 0, lenRef = 0,
        lenInc = 0, lastLen = 8, lenBits = 0, sdOrder = 2, sdOctets = 7))
    intercept[ArithmeticException] {
      Grib.unpackComplex(Array.fill[Byte](128)(0xFF.toByte), pOvf, 8)
    }
  }

  // ------------------------------------- quasi-regular (reduced) grids

  /** One message on a REDUCED lat/lon grid: template 3.0 with Ni/Di
    * marked missing and a 2-octet per-row point list; simple packing
    * (R=0, E=D=0, 8 bits). `rows` are the per-row point values. */
  private def reducedMsg(rows: Seq[Seq[Int]], bitmap: Option[Seq[Boolean]],
      la1: Double = 52.0, lo1: Double = 4.0, lo2: Double = 5.5,
      dj: Double = 0.5, scan: Int = 0, interpretation: Int = 1,
      diRaw: Long = 0xFFFFFFFFL, listSumDelta: Int = 0): Array[Byte] = {
    val nj = rows.length
    val numPoints = rows.map(_.length).sum + listSumDelta
    val xs = rows.flatten
    val stored = bitmap.map(bm => xs.zip(bm).filter(_._2).map(_._1))
      .getOrElse(xs)
    val sec3Len = 72 + nj * 2
    val bitmapBytes = if (bitmap.isDefined) (numPoints + 7) / 8 else 0
    val dataBytes = stored.length // 8 bits each
    val msgLen = 16L + 21 + sec3Len + 34 + 21 + (6 + bitmapBytes) +
      (5 + dataBytes) + 4
    val b = new B
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    // section 3: optOctets 2, interpretation 1 (points per row)
    b.u32(sec3Len.toLong); b.u8(3); b.u8(0); b.u32(numPoints.toLong)
    b.u8(2); b.u8(interpretation); b.u16(0) // template 3.0
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(0xFFFFFFFFL) // Ni missing
    b.u32(nj.toLong)
    b.u32(0); b.u32(0) // basic angle, subdivisions
    b.sm32(math.rint(la1 * 1e6).toLong); b.sm32(math.rint(lo1 * 1e6).toLong)
    b.u8(0x30)
    b.sm32(0L); b.sm32(math.rint(lo2 * 1e6).toLong) // la2 (ignored), lo2
    b.u32(diRaw) // Di missing for reduced
    b.u32(math.rint(dj * 1e6).toLong)
    b.u8(scan)
    rows.foreach(r => b.u16(r.length)) // the per-row point list
    // section 4 template 4.0
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(0L)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    // section 5 template 5.0: R=0 E=0 D=0, 8 bits
    b.u32(21); b.u8(5); b.u32(stored.length.toLong); b.u16(0)
    b.f32(0f); b.sm16(0); b.sm16(0); b.u8(8); b.u8(0)
    // section 6
    b.u32(6L + bitmapBytes); b.u8(6)
    bitmap match {
      case None => b.u8(255)
      case Some(bits) =>
        b.u8(0)
        var acc = 0; var k = 0
        bits.foreach { bit =>
          acc = (acc << 1) | (if (bit) 1 else 0); k += 1
          if (k == 8) { b.u8(acc); acc = 0; k = 0 }
        }
        if (k > 0) b.u8(acc << (8 - k))
    }
    // section 7
    b.u32(5L + dataBytes); b.u8(7)
    stored.foreach(b.u8)
    b.str("7777")
    b.result()
  }

  test("reduced lat/lon grid expands rows by nearest-neighbor longitude") {
    val dir = Files.createTempDirectory("graft_gribred").toString
    val rows = Seq(Seq(10, 11, 12, 13), Seq(20, 21), Seq(30, 31, 32),
      Seq(40, 41, 42, 43))
    val p = s"$dir/red.grib2"
    writeFile(p, reducedMsg(rows, None))
    val src = RasterFileSource(p)
    // longest row is 4 wide: di = (5.5-4.0)/3 = 0.5 = dj
    assert(src.cellSize.contains(0.5))
    val ext = src.extent.get
    assert(math.abs(ext.x1 - 3.75) < 1e-9 && math.abs(ext.x2 - 5.75) < 1e-9)
    val req = RasterRequest(ext, "EPSG:4326", 4, 4, Some(T0), Some(T0))
    val got = src.getData(req)(spark).get.values.head.toSeq
    assert(got == Seq[Double](
      10, 11, 12, 13,   // full row: identity
      20, 20, 21, 21,   // 2 -> 4: src round(x/3)
      30, 31, 31, 32,   // 3 -> 4: src round(2x/3)
      40, 41, 42, 43), got)
  }

  test("reduced grid bitmap covers the STORED points; nodata expands too") {
    val dir = Files.createTempDirectory("graft_gribredb").toString
    val rows = Seq(Seq(10, 11, 12, 13), Seq(20, 21), Seq(30, 31, 32))
    // mark row 1's second stored point (value 21) missing: 9 points,
    // bit 5 clear
    val present = Seq(true, true, true, true, true, false, true, true, true)
    val p = s"$dir/redbm.grib2"
    writeFile(p, reducedMsg(rows, Some(present)))
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      val got = Grib.decode(ch, m.fields.head, Double.NaN).toSeq
      assert(got.take(4) == Seq[Double](10, 11, 12, 13))
      assert(got(4) == 20 && got(5) == 20 && got(6).isNaN && got(7).isNaN)
      assert(got.drop(8) == Seq[Double](30, 31, 31, 32))
    } finally ch.close()
  }

  test("reduced-grid failure modes are loud and named") {
    val dir = Files.createTempDirectory("graft_gribredf").toString
    val rows = Seq(Seq(1, 2, 3), Seq(4, 5))
    def readBack(p: String): Unit = {
      val ch = graft.io.PositionedReader.open(p)
      try {
        val m = Grib.readMeta(ch, p)
        m.fields.foreach(f => Grib.decode(ch, f, Double.NaN))
      } finally ch.close()
    }
    // interpretation other than points-per-row
    val p1 = s"$dir/interp.grib2"
    writeFile(p1, reducedMsg(rows, None, interpretation = 3))
    val e1 = intercept[IllegalArgumentException] { readBack(p1) }
    assert(e1.getMessage.contains("interpretation"), e1.getMessage)
    // Di present contradicts the reduced marking
    val p2 = s"$dir/di.grib2"
    writeFile(p2, reducedMsg(rows, None, diRaw = 500000L))
    val e2 = intercept[IllegalArgumentException] { readBack(p2) }
    assert(e2.getMessage.contains("Di missing"), e2.getMessage)
    // list sum disagreeing with section 3's point count
    val p3 = s"$dir/sum.grib2"
    writeFile(p3, reducedMsg(rows, None, listSumDelta = 2))
    val e3 = intercept[IllegalArgumentException] { readBack(p3) }
    assert(e3.getMessage.contains("point list sums"), e3.getMessage)
  }

  // --------------------------------------- Gaussian grids (template 3.40)

  /** One message on a Gaussian grid: template 3.40, N parallels
    * pole→equator at octets 68-71; `rows` as in [[reducedMsg]] (all
    * equal length = regular; varying + `reduced=true` = reduced
    * Gaussian with Ni/Di missing + 2-octet point list). */
  private def gaussMsg(rows: Seq[Seq[Int]], nPar: Int, la1: Double,
      la2: Double, lo1: Double, lo2: Double, reduced: Boolean,
      diMicro: Long = 500000L, scan: Int = 0): Array[Byte] = {
    val nj = rows.length
    val numPoints = rows.map(_.length).sum
    val xs = rows.flatten
    val listBytes = if (reduced) nj * 2 else 0
    val sec3Len = 72 + listBytes
    val dataBytes = xs.length
    val msgLen = 16L + 21 + sec3Len + 34 + 21 + 6 + (5 + dataBytes) + 4
    val b = new B
    b.str("GRIB"); b.u16(0); b.u8(0); b.u8(2); b.u64(msgLen)
    b.u32(21); b.u8(1); b.u16(98); b.u16(0); b.u8(2); b.u8(1); b.u8(0)
    b.u16(2020); b.u8(3); b.u8(1); b.u8(6); b.u8(0); b.u8(0)
    b.u8(0); b.u8(0)
    b.u32(sec3Len.toLong); b.u8(3); b.u8(0); b.u32(numPoints.toLong)
    b.u8(if (reduced) 2 else 0); b.u8(if (reduced) 1 else 0)
    b.u16(40) // template 3.40
    b.u8(6); b.u8(0); b.u32(0); b.u8(0); b.u32(0); b.u8(0); b.u32(0)
    b.u32(if (reduced) 0xFFFFFFFFL else rows.head.length.toLong)
    b.u32(nj.toLong)
    b.u32(0); b.u32(0)
    b.sm32(math.rint(la1 * 1e6).toLong); b.sm32(math.rint(lo1 * 1e6).toLong)
    b.u8(0x30)
    b.sm32(math.rint(la2 * 1e6).toLong); b.sm32(math.rint(lo2 * 1e6).toLong)
    b.u32(if (reduced) 0xFFFFFFFFL else diMicro)
    b.u32(nPar.toLong) // N
    b.u8(scan)
    if (reduced) rows.foreach(r => b.u16(r.length))
    b.u32(34); b.u8(4); b.u16(0); b.u16(0)
    b.u8(1); b.u8(8); b.u8(2); b.u8(0); b.u8(0); b.u16(0); b.u8(0)
    b.u8(1); b.u32(0L)
    b.u8(1); b.u8(0); b.u32(0); b.u8(255); b.u8(0); b.u32(0)
    b.u32(21); b.u8(5); b.u32(xs.length.toLong); b.u16(0)
    b.f32(0f); b.sm16(0); b.sm16(0); b.u8(8); b.u8(0)
    b.u32(6L); b.u8(6); b.u8(255)
    b.u32(5L + dataBytes); b.u8(7); xs.foreach(b.u8)
    b.str("7777")
    b.result()
  }

  /** Literature 4-point Gauss-Legendre abscissae (P4 roots) — the
    * independent source the reader's Newton iteration is checked
    * against. */
  private val P4Lats: Seq[Double] =
    Seq(0.861136311594053, 0.339981043584856, -0.339981043584856,
      -0.861136311594053).map(x => math.toDegrees(math.asin(x)))

  test("Gaussian latitudes match the literature Legendre roots") {
    val got = Grib.gaussianLatitudes(4)
    P4Lats.zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-9, s"got $g want $want")
    }
    // N=16 sanity: antisymmetric, strictly decreasing, inside ±90
    val g32 = Grib.gaussianLatitudes(32)
    assert(g32.length == 32)
    g32.zip(g32.reverse).foreach { case (a, b) =>
      assert(math.abs(a + b) < 1e-9) }
    g32.sliding(2).foreach(p => assert(p(0) > p(1)))
  }

  test("regular Gaussian grid (3.40) resamples rows onto a square grid") {
    val dir = Files.createTempDirectory("graft_gribga").toString
    // N=2: 4 parallels at +-59.4406, +-19.8757; stored row r carries
    // (r+1)*50 + x (8-bit packing: stay under 256)
    val rows = (0 until 4).map(r => (0 until 4).map(x => (r + 1) * 50 + x))
    val latN = P4Lats.head
    val p = s"$dir/gauss.grib2"
    writeFile(p, gaussMsg(rows, 2, latN, -latN, 4.0, 5.5, reduced = false))
    val src = RasterFileSource(p)
    assert(src.cellSize.contains(0.5))
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      // square target: 0.5-deg pitch over 2*59.4406 -> 239 rows
      assert(m.w == 4 && m.h == 239, s"${m.w} x ${m.h}")
      val got = Grib.decode(ch, m.fields.head, Double.NaN)
      assert(got.length == 4 * 239)
      // nearest-parallel row mapping (midpoints 39.66, 0, -39.66):
      // sampled safely inside each band
      def rowVals(r: Int) = got.slice(r * 4, r * 4 + 4).toSeq
      assert(rowVals(5) == rows(0).map(_.toDouble))
      assert(rowVals(50) == rows(1).map(_.toDouble))
      assert(rowVals(150) == rows(2).map(_.toDouble))
      assert(rowVals(230) == rows(3).map(_.toDouble))
    } finally ch.close()
  }

  test("reduced Gaussian grid: row expansion and latitude resample compose") {
    val dir = Files.createTempDirectory("graft_gribgr").toString
    // ERA5's native shape in miniature: varying points per parallel
    val rows = Seq(Seq(10, 11, 12, 13), Seq(20, 21), Seq(30, 31),
      Seq(40, 41, 42, 43))
    val latN = P4Lats.head
    val p = s"$dir/redgauss.grib2"
    writeFile(p, gaussMsg(rows, 2, latN, -latN, 4.0, 5.5, reduced = true))
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      assert(m.w == 4 && m.h == 239)
      val got = Grib.decode(ch, m.fields.head, Double.NaN)
      def rowVals(r: Int) = got.slice(r * 4, r * 4 + 4).toSeq
      assert(rowVals(5) == Seq[Double](10, 11, 12, 13))
      assert(rowVals(50) == Seq[Double](20, 20, 21, 21)) // 2 -> 4 expand
      assert(rowVals(150) == Seq[Double](30, 30, 31, 31))
      assert(rowVals(230) == Seq[Double](40, 41, 42, 43))
    } finally ch.close()
  }

  test("Gaussian grid failure modes are loud and named") {
    val dir = Files.createTempDirectory("graft_gribgf").toString
    val rows = (0 until 4).map(r => (0 until 4).map(x => r * 10 + x))
    // la1 off every N=2 parallel
    val p1 = s"$dir/offgrid.grib2"
    writeFile(p1, gaussMsg(rows, 2, 50.0, -50.0, 4.0, 5.5, reduced = false))
    val e1 = intercept[IllegalArgumentException] {
      val ch = graft.io.PositionedReader.open(p1)
      try Grib.readMeta(ch, p1) finally ch.close()
    }
    assert(e1.getMessage.contains("Gaussian parallels"), e1.getMessage)
    // nj disagreeing with the parallels inside [la2, la1]
    val p2 = s"$dir/njbad.grib2"
    writeFile(p2, gaussMsg(rows.take(3), 2, P4Lats.head, -P4Lats.head,
      4.0, 5.5, reduced = false))
    val e2 = intercept[IllegalArgumentException] {
      val ch = graft.io.PositionedReader.open(p2)
      try Grib.readMeta(ch, p2) finally ch.close()
    }
    assert(e2.getMessage.contains("lie in"), e2.getMessage)
  }

  // ------------------------------------------------- 5.41 PNG packing

  /** PNG bytes built directly from BufferedImage — independent of the
    * writer's `encodePngX` path. */
  private def pngBytes(xs: Seq[Long], pw: Int, ph: Int,
      imgType: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(pw, ph, imgType)
    val ra = img.getRaster
    for (y <- 0 until ph; x <- 0 until pw) {
      val v = xs(y * pw + x)
      if (ra.getNumBands == 3) {
        ra.setSample(x, y, 0, ((v >>> 16) & 0xFF).toInt)
        ra.setSample(x, y, 1, ((v >>> 8) & 0xFF).toInt)
        ra.setSample(x, y, 2, (v & 0xFF).toInt)
      } else ra.setSample(x, y, 0, v.toInt)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("hand-assembled 5.41 PNG message: E/D scaling, bitmap strip") {
    import java.awt.image.BufferedImage
    val dir = Files.createTempDirectory("graft_grib41h").toString
    // 4x3 grid, depth 8, R=1.5 E=-1 D=1: v = (1.5 + X/2) / 10
    val xs = Seq[Long](3, 0, 200, 7, 11, 255, 0, 1, 2, 90, 180, 64)
    val p1 = s"$dir/full.grib2"
    writeFile(p1, complexMsg(4, 3, 41, 12,
      t => { t.f32(1.5f); t.sm16(-1); t.sm16(1); t.u8(8); t.u8(0) },
      pngBytes(xs, 4, 3, BufferedImage.TYPE_BYTE_GRAY)))
    val ch1 = graft.io.PositionedReader.open(p1)
    try {
      val m = Grib.readMeta(ch1, p1)
      assert(m.fields.head.packing.template == 41)
      val got = Grib.decode(ch1, m.fields.head, Double.NaN)
      val want = xs.map(x => (1.5 + x * 0.5) / 10.0)
      got.toSeq.zip(want).foreach { case (g, x) =>
        assert(math.abs(g - x) < 1e-12, s"got $g want $x")
      }
    } finally ch1.close()
    // bitmap variant: 8 present points ride a 8x1 PNG strip (the NCEP
    // bitmap shape); 16-bit depth
    val present = Seq(true, false, true, true, false, true, true, false,
      true, true, false, true)
    val xsB = Seq[Long](700, 0, 65535, 12, 40000, 1, 2, 3)
    val p2 = s"$dir/bm.grib2"
    writeFile(p2, complexMsg(4, 3, 41, 8,
      t => { t.f32(2f); t.sm16(0); t.sm16(0); t.u8(16); t.u8(0) },
      pngBytes(xsB, 8, 1, BufferedImage.TYPE_USHORT_GRAY),
      bitmap = Some(present)))
    val ch2 = graft.io.PositionedReader.open(p2)
    try {
      val m = Grib.readMeta(ch2, p2)
      val got = Grib.decode(ch2, m.fields.head, Double.NaN)
      var k = 0
      present.zipWithIndex.foreach { case (pr, i) =>
        if (pr) { assert(got(i) == 2.0 + xsB(k)); k += 1 }
        else assert(got(i).isNaN, s"cell $i")
      }
    } finally ch2.close()
    // 24-bit RGB carries X = (R<<16)|(G<<8)|B
    val xs24 = Seq[Long](0, 1, 255, 256, 65535, 65536, (1L << 24) - 1,
      0xABCDEFL, 42, 7, 1000000, 16777000)
    val p3 = s"$dir/rgb.grib2"
    writeFile(p3, complexMsg(4, 3, 41, 12,
      t => { t.f32(0f); t.sm16(0); t.sm16(0); t.u8(24); t.u8(0) },
      pngBytes(xs24, 4, 3, BufferedImage.TYPE_INT_RGB)))
    val ch3 = graft.io.PositionedReader.open(p3)
    try {
      val m = Grib.readMeta(ch3, p3)
      val got = Grib.decode(ch3, m.fields.head, Double.NaN)
      assert(got.toSeq == xs24.map(_.toDouble))
    } finally ch3.close()
  }

  test("5.41 failure modes: depth 32, dims mismatch, corrupt PNG") {
    import java.awt.image.BufferedImage
    val dir = Files.createTempDirectory("graft_grib41f").toString
    def tail(depth: Int): B => Unit =
      t => { t.f32(0f); t.sm16(0); t.sm16(0); t.u8(depth); t.u8(0) }
    // depth 32 (RGBA) rejected by name at header parse
    val p1 = s"$dir/d32.grib2"
    writeFile(p1, complexMsg(4, 3, 41, 12, tail(32),
      pngBytes(Seq.fill(12)(1L), 4, 3, BufferedImage.TYPE_BYTE_GRAY)))
    val e1 = intercept[IllegalArgumentException] {
      val ch = graft.io.PositionedReader.open(p1)
      try Grib.readMeta(ch, p1) finally ch.close()
    }
    assert(e1.getMessage.contains("RGBA"), e1.getMessage)
    // PNG dims disagree with the section-5 point count
    val p2 = s"$dir/dims.grib2"
    writeFile(p2, complexMsg(4, 3, 41, 12, tail(8),
      pngBytes(Seq.fill(8)(1L), 4, 2, BufferedImage.TYPE_BYTE_GRAY)))
    val e2 = intercept[IllegalArgumentException] {
      val ch = graft.io.PositionedReader.open(p2)
      try {
        val m = Grib.readMeta(ch, p2)
        Grib.decode(ch, m.fields.head, Double.NaN)
      } finally ch.close()
    }
    assert(e2.getMessage.contains("section 5 declares"), e2.getMessage)
    // garbage payload is not silently zeros
    val p3 = s"$dir/garbage.grib2"
    writeFile(p3, complexMsg(4, 3, 41, 12, tail(8),
      Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)))
    val e3 = intercept[IllegalArgumentException] {
      val ch = graft.io.PositionedReader.open(p3)
      try {
        val m = Grib.readMeta(ch, p3)
        Grib.decode(ch, m.fields.head, Double.NaN)
      } finally ch.close()
    }
    assert(e3.getMessage.contains("PNG"), e3.getMessage)
  }

  test("template 5.41 write/read round-trips all depths, nodata, slicing") {
    val nd = Double.MaxValue
    val dir = Files.createTempDirectory("graft_grib41w").toString
    val w = 9; val h = 6
    // value multipliers spanning the three PNG shapes the writer elects:
    // 8-bit gray, 16-bit gray, 24-bit RGB
    for ((mult, name) <- Seq((1.0, "d8"), (300.0, "d16"), (70000.0, "d24"))) {
      def frame(t: Int): Array[Double] = Array.tabulate(w * h) { i =>
        if ((i + t) % 11 == 0) nd else 5.0 + mult * ((i * 7 + t * 13) % 200)
      }
      val frames = Seq(frame(0), frame(1), frame(2))
      val times = Seq(0L, 3600000L, 7200000L)
      val p = s"$dir/$name.grib2"
      Grib.write(p, frames, w, h, nd, times, 0.0, 0.0, 0.05, template = 41)
      val ch = graft.io.PositionedReader.open(p)
      try {
        val m = Grib.readMeta(ch, p)
        assert(m.timesMs == times)
        m.fields.foreach(f => assert(f.packing.template == 41))
        for (i <- frames.indices)
          assert(Grib.decode(ch, m.fields(i), nd).sameElements(frames(i)),
            s"$name frame $i")
      } finally ch.close()
    }
    // constant frame: depth 0, empty section 7 (the 5.0 convention)
    val pc = s"$dir/const.grib2"
    Grib.write(pc, Seq(Array.fill(w * h)(42.0)), w, h, nd, Seq(0L),
      0.0, 0.0, 0.05, template = 41)
    val chc = graft.io.PositionedReader.open(pc)
    try {
      val m = Grib.readMeta(chc, pc)
      assert(m.fields.head.packing.nbits == 0 &&
        m.fields.head.dataLen == 0)
      assert(Grib.decode(chc, m.fields.head, nd).forall(_ == 42.0))
    } finally chc.close()
    // the field-pruned temporal slice decodes a PNG-packed frame
    val src = GribSource(s"$dir/d16.grib2")
    val req = RasterRequest(src.extent.get, "EPSG:4326", w, h,
      Some(java.time.Instant.ofEpochMilli(3600000L)),
      Some(java.time.Instant.ofEpochMilli(3600000L)))
    val res = src.getData(req).get
    assert(res.values.length == 1)
    assert(res.values.head.zipWithIndex.forall { case (v, i) =>
      if ((i + 1) % 11 == 0) v.isNaN || v == nd
      else v == 5.0 + 300.0 * ((i * 7 + 13) % 200)
    })
  }

  /** Hand-assembled GRIB1 SECOND-ORDER message (independent of the
    * writer): row-by-row groups, NO secondary bit-map, constant
    * second-order width — the minimal WMO Code Table 11 shape. The
    * overrides poke specific octets for the clobber tests. */
  private def grib1SecondOrderMsg(w: Int, h: Int, ibmR: Long,
      foWidth: Int, fos: Seq[Long], soWidth: Int, sos: Seq[Long],
      extFlags: Int = 0x00, flagNibble: Int = 0x5,
      n1Override: Int = -1, n2Override: Int = -1,
      p1Override: Int = -1): Array[Byte] = {
    require(fos.length == h && sos.length == w * h)
    val b = new B
    val widthOctets = 1
    // physical layout from the REAL pointers; overrides poke only the
    // declared header octets (so a bad pointer cannot resize the BDS)
    val n1r = 22 + widthOctets
    val foBytes = (h * foWidth + 7) / 8
    val n2r = n1r + foBytes
    val n1 = if (n1Override > 0) n1Override else n1r
    val n2 = if (n2Override > 0) n2Override else n2r
    val soBits = sos.length * soWidth
    val soBytes = (soBits + 7) / 8
    val bds0 = (n2r - 1) + soBytes
    val bdsLen = bds0 + (bds0 % 2)
    val unused = bdsLen * 8 - ((n2r - 1) * 8 + soBits)
    val msgLen = 8 + 28 + 32 + bdsLen + 4
    b.str("GRIB"); b.u8((msgLen >>> 16) & 0xFF); b.u16(msgLen & 0xFFFF)
    b.u8(1)
    // PDS: 2020-01-02 03:04 analysis (TRI 1)
    b.u8(0); b.u16(28); b.u8(2); b.u8(0); b.u8(0); b.u8(255); b.u8(0x80)
    b.u8(11); b.u8(1); b.u16(0)
    b.u8(20); b.u8(1); b.u8(2); b.u8(3); b.u8(4); b.u8(1)
    b.u8(0); b.u8(0); b.u8(1); b.u16(0); b.u8(0); b.u8(21); b.u8(0)
    b.u16(0) // D = 0
    // GDS: w x h at 1-deg pitch from (0, 0), scan 0 (north first)
    b.u8(0); b.u16(32); b.u8(0); b.u8(255); b.u8(0)
    b.u16(w); b.u16(h)
    def s24(v: Long): Unit = { b.u8(((v >>> 16) & 0xFF).toInt)
      b.u16((v & 0xFFFF).toInt) }
    s24(h * 1000L - 500); s24(500)     // La1, Lo1 (centers)
    b.u8(0x80)
    s24(500); s24(w * 1000L - 500)     // La2, Lo2
    b.u16(1000); b.u16(1000); b.u8(0)
    b.u8(0); b.u16(0); b.u8(0)         // reserved 29-32
    // BDS second-order
    b.u8((bdsLen >>> 16) & 0xFF); b.u16(bdsLen & 0xFFFF)
    b.u8((flagNibble << 4) | unused)
    b.u16(0) // E = 0
    b.u32(ibmR)
    b.u8(foWidth)
    b.u16(n1); b.u8(extFlags); b.u16(n2)
    b.u16(if (p1Override >= 0) p1Override else h); b.u16(w * h)
    b.u8(0)   // octet 21 reserved
    b.u8(soWidth) // single width octet (constant widths)
    var acc = 0L; var nb = 0
    def putBits(v: Long, wd: Int): Unit = {
      var k = wd - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >>> k) & 1L); nb += 1
        if (nb == 8) { b.u8((acc & 0xFF).toInt); acc = 0; nb = 0 }
        k -= 1
      }
    }
    fos.foreach(putBits(_, foWidth))
    if (nb > 0) { b.u8(((acc << (8 - nb)) & 0xFF).toInt); acc = 0; nb = 0 }
    sos.foreach(putBits(_, soWidth))
    if (nb > 0) { b.u8(((acc << (8 - nb)) & 0xFF).toInt); acc = 0; nb = 0 }
    var pad = bdsLen - bds0
    while (pad > 0) { b.u8(0); pad -= 1 }
    b.str("7777")
    b.result()
  }

  test("hand-assembled GRIB1 second-order message: row groups, " +
      "first+second order sum, E/D scaling") {
    val dir = Files.createTempDirectory("graft_g1so").toString
    val w = 4; val h = 3
    val fos = Seq(0L, 10L, 3L)
    val sos = Seq(1L, 2L, 3L, 4L, 0L, 7L, 5L, 2L, 6L, 1L, 0L, 4L)
    // R = 5.0 as an IBM-360 hex float: 0x41500000
    val msg = grib1SecondOrderMsg(w, h, 0x41500000L, 4, fos, 3, sos)
    val p = s"$dir/so.grib"
    Files.write(Paths.get(p), msg)
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      assert(m.w == w && m.h == h && m.fields.length == 1)
      val got = Grib.decode(ch, m.fields.head, Double.MaxValue)
      val want = (0 until h).flatMap(r => (0 until w).map(c =>
        5.0 + fos(r) + sos(r * w + c)))
      assert(got.toSeq == want, got.toSeq)
    } finally ch.close()
  }

  test("GRIB1 second-order round-trips values, bitmap and slicing " +
      "through the writer (secondary bit-map, per-group widths)") {
    val dir = Files.createTempDirectory("graft_g1sorw").toString
    val p = s"$dir/stack.grib"
    val w = 9; val h = 6; val nd = Double.MaxValue
    val frames = Seq(
      Array.tabulate(w * h)(i => ((i % 13) * (i / w + 1)).toDouble),
      Array.tabulate(w * h)(i =>
        if (i % 5 == 0) nd else (1000 + i * 7 % 90).toDouble),
      Array.fill(w * h)(42.0))
    val times = Seq(0L, 3600000L, 7200000L)
    Grib.writeEdition1(p, frames, w, h, nd, times, laSouth = 50.0,
      loWest = 4.0, degPerCell = 0.05, secondOrder = true)
    val ch = graft.io.PositionedReader.open(p)
    try {
      val m = Grib.readMeta(ch, p)
      assert(m.timesMs == times)
      for (i <- frames.indices)
        assert(Grib.decode(ch, m.fields(i), nd).toSeq == frames(i).toSeq,
          s"frame $i")
      // header-only slicing still holds: decode only field 1's ranges
      assert(m.fields(1).dataOffset > m.fields(0).dataOffset)
    } finally ch.close()
    // the whole stack through the block API
    val src = GribSource(p)
    assert(src.allTimes.map(_.toEpochMilli) == times)
  }

  test("template 5.40 JPEG2000: the permanent deferral is loud, names " +
      "the template and the transcode workaround") {
    // a structurally valid message whose DRS declares 5.40: a real
    // NCEP JPEG2000 product must fail HERE, at planning, by name —
    // never by silently misdecoding. The message also carries the
    // nearest workaround (upstream transcode to a carried template).
    val dir = Files.createTempDirectory("graft_g540").toString
    val sec5: B => Unit = { b =>
      b.f32(0.0f); b.sm16(0); b.sm16(0) // R, E, D
      b.u8(8)  // depth
      b.u8(0)  // original type
      b.u8(0); b.u8(255) // compression type / target ratio (lossless)
    }
    val p = s"$dir/j2k.grib2"
    writeFile(p, complexMsg(4, 3, 40, 12, sec5,
      Array.fill[Byte](32)(0x33)))
    val e = intercept[IllegalArgumentException] { GribSource(p).extent }
    assert(e.getMessage.contains("5.40"), e.getMessage)
    assert(e.getMessage.contains("JPEG2000"), e.getMessage)
    assert(e.getMessage.contains("transcode"), e.getMessage)
    assert(e.getMessage.contains("wgrib2"), e.getMessage)
  }

  test("GRIB1 second-order failure modes are loud and named") {
    val dir = Files.createTempDirectory("graft_g1sof").toString
    val w = 4; val h = 3
    val fos = Seq(0L, 10L, 3L)
    val sos = Seq(1L, 2L, 3L, 4L, 0L, 7L, 5L, 2L, 6L, 1L, 0L, 4L)
    def expect(name: String, needle: String)(msg: Array[Byte]): Unit = {
      val p = s"$dir/$name.grib"
      Files.write(Paths.get(p), msg)
      val e = intercept[IllegalArgumentException] {
        val ch = graft.io.PositionedReader.open(p)
        try {
          val m = Grib.readMeta(ch, p)
          Grib.decode(ch, m.fields.head, Double.MaxValue)
        } finally ch.close()
      }
      assert(e.getMessage.contains(needle), s"$name: ${e.getMessage}")
    }
    expect("matrix", "matrix-of-values")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, extFlags = 0x80))
    expect("reserved", "reserved")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, extFlags = 0x10))
    expect("noext", "extended-flags octet")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, flagNibble = 0x4))
    expect("rows", "groups for")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, p1Override = 2))
    expect("overlap", "overlap")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, n1Override = 10))
    expect("overrun", "overruns the BDS")(grib1SecondOrderMsg(w, h,
      0x41500000L, 4, fos, 3, sos, n2Override = 29))
  }
}
