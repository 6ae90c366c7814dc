package graft.raster

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.time.Instant
import org.apache.spark.sql.SparkSession

/** Pure-JVM GeoTIFF codec (no GDAL on the classpath). Reads classic TIFF
  * and BigTIFF in either byte order; writes classic little-endian.
  * Striped or tiled layout, uncompressed / DEFLATE (`java.util.zip`) /
  * LZW / PackBits (both read-only; LZW with horizontal-predictor support),
  * six sample types (float64/float32, int16/int32, uint8/uint16),
  * ModelPixelScale/ModelTiepoint + GeoKey EPSG tagging and the GDAL_NODATA
  * convention — the subset the reference's RasterFileSource/Sink actually
  * exercises (raster/sources.py:396-564, sinks.py:18-141). All three TIFF
  * predictors decode (none / horizontal / floating-point).
  * The layout follows TIFF 6.0 + the GeoTIFF 1.1 spec
  * (ascending IFD tags, correct field types, out-of-line offset/byte-count
  * arrays). Write paths round-trip through this reader; the LZW read path
  * is additionally pinned by fixtures from an independent spec-derived
  * encoder (tools/make_lzw_fixture.py) — no external TIFF reader exists in
  * this environment to cross-validate against.
  */
object GeoTiff {

  /** dtypeName → (bitsPerSample, TIFF SampleFormat). Format 1 = unsigned
    * int, 2 = signed int, 3 = IEEE float. */
  private val SampleTypes: Map[String, (Int, Int)] = Map(
    "float64" -> ((64, 3)), "float32" -> ((32, 3)),
    "int32" -> ((32, 2)), "int16" -> ((16, 2)),
    "uint8" -> ((8, 1)), "uint16" -> ((16, 1)))

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** TIFF-flavour LZW decode (TIFF 6.0 §13): MSB-first bit packing, 9-bit
    * initial codes, ClearCode 256 / EndOfInformation 257, and the "early
    * change" width bump when one code short of the table limit. Decodes at
    * most `expected` bytes; a truncated stream raises rather than looping. */
  private def lzwDecode(packed: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outAt = 0
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var nextCode = 258
    var width = 9
    var bitPos = 0L
    val nBits = packed.length.toLong * 8
    var prev: Array[Byte] = null
    var done = false
    while (!done && outAt < expected) {
      if (bitPos + width > nBits) throw new IllegalArgumentException(
        "truncated LZW stream in TIFF segment")
      var code = 0
      var k = 0
      while (k < width) {
        val b = bitPos + k
        code = (code << 1) | ((packed((b >> 3).toInt) >> (7 - (b & 7).toInt)) & 1)
        k += 1
      }
      bitPos += width
      if (code == 257) done = true
      else if (code == 256) {
        java.util.Arrays.fill(dict.asInstanceOf[Array[AnyRef]], 258, 4096, null)
        nextCode = 258; width = 9; prev = null
      } else {
        val entry =
          if (code < nextCode && dict(code) != null) dict(code)
          else if (prev != null && code == nextCode) prev :+ prev(0)
          else throw new IllegalArgumentException(
            s"corrupt LZW stream: code $code used before definition")
        val n = math.min(entry.length, expected - outAt)
        System.arraycopy(entry, 0, out, outAt, n)
        outAt += n
        if (prev != null && nextCode < 4096) {
          dict(nextCode) = prev :+ entry(0); nextCode += 1
        }
        // early change: the width grows one code BEFORE the table limit
        if (nextCode == (1 << width) - 1 && width < 12) width += 1
        prev = entry
      }
    }
    out
  }

  /** PackBits decode (TIFF 6.0 §9): control byte n in [0, 127] copies n+1
    * literal bytes; n in [-127, -1] repeats the next byte 1-n times; -128
    * is a no-op. Decodes exactly `expected` bytes; truncated or
    * over-running streams raise rather than read past either buffer. */
  private def packBitsDecode(packed: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = 0
    var o = 0
    while (o < expected) {
      if (i >= packed.length) throw new IllegalArgumentException(
        "truncated PackBits stream in TIFF segment")
      val n = packed(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > packed.length || o + cnt > expected)
          throw new IllegalArgumentException("corrupt PackBits literal run")
        System.arraycopy(packed, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (i >= packed.length || o + cnt > expected)
          throw new IllegalArgumentException("corrupt PackBits repeat run")
        java.util.Arrays.fill(out, o, o + cnt, packed(i))
        i += 1; o += cnt
      }
    }
    out
  }

  /** Undo TIFF predictor 3 (floating-point, TechNote 3): each row's sample
    * bytes are stored as byte planes, most-significant plane first, then
    * byte-wise horizontally differenced. Reverse: accumulate the byte
    * deltas across the row, then de-interleave plane p into sample byte
    * position p counted from the MSB (so LSB-first for little-endian
    * files, as libtiff's fpAcc does). Returns a new array in the file's
    * byte order, ready for the sample ByteBuffer. */
  private def undoFloatPredictor(raw: Array[Byte], rowW: Int, bytesPer: Int,
      bigEndian: Boolean): Array[Byte] = {
    val rowBytes = rowW * bytesPer
    val rows = raw.length / rowBytes
    val out = new Array[Byte](raw.length)
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      var i = 1
      while (i < rowBytes) {
        raw(base + i) = (raw(base + i) + raw(base + i - 1)).toByte
        i += 1
      }
      var p = 0
      while (p < bytesPer) { // plane 0 holds every sample's MSB
        val byteIdx = if (bigEndian) p else bytesPer - 1 - p
        var x = 0
        while (x < rowW) {
          out(base + x * bytesPer + byteIdx) = raw(base + p * rowW + x)
          x += 1
        }
        p += 1
      }
      r += 1
    }
    out
  }

  /** Undo TIFF predictor 2 (horizontal differencing) in place: each sample
    * is stored as the delta from its left neighbour in the file's byte
    * order, per row of `rowW` samples of `bytesPer` bytes. */
  private def undoPredictor(raw: Array[Byte], rowW: Int, bytesPer: Int,
      bigEndian: Boolean): Unit = {
    val rowBytes = rowW * bytesPer
    val rows = raw.length / rowBytes
    def shiftOf(k: Int): Int = if (bigEndian) 8 * (bytesPer - 1 - k) else 8 * k
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      var x = 1
      while (x < rowW) {
        var cur = 0L; var prev = 0L
        var k = 0
        while (k < bytesPer) {
          cur |= (raw(base + x * bytesPer + k) & 0xffL) << shiftOf(k)
          prev |= (raw(base + (x - 1) * bytesPer + k) & 0xffL) << shiftOf(k)
          k += 1
        }
        val sum = cur + prev
        k = 0
        while (k < bytesPer) {
          raw(base + x * bytesPer + k) = ((sum >> shiftOf(k)) & 0xff).toByte
          k += 1
        }
        x += 1
      }
      r += 1
    }
  }

  private def inflate(packed: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(packed)
    val out = new Array[Byte](expected)
    var at = 0
    while (!inf.finished() && at < expected) {
      val n = inf.inflate(out, at, expected - at)
      // n == 0 without finishing means the inflater stalled: truncated
      // input, or a zlib header demanding a preset dictionary — error out
      // rather than spinning forever on a malformed file
      if (n == 0) throw new IllegalArgumentException(
        "truncated or unsupported deflate stream in TIFF segment")
      at += n
    }
    inf.end()
    out
  }

  /** `tileSize` 0 = striped layout; > 0 = tiled layout with square tiles
    * of that size (TIFF requires a multiple of 16). `compression` is
    * "none" or "deflate". */
  def write(path: String, values: Array[Double], w: Int, h: Int,
      bbox: Bbox, epsg: Int, noData: Double, dtypeName: String = "float64",
      rowsPerStrip: Int = 256, compression: String = "none",
      tileSize: Int = 0): Unit = {
    require(values.length == w * h, "value count must equal w*h")
    val (bits, sampleFormat) = SampleTypes.getOrElse(dtypeName,
      throw new IllegalArgumentException(
        s"unsupported GeoTIFF dtype '$dtypeName' (${SampleTypes.keys.mkString(", ")})"))
    val comp = compression match {
      case "none"    => 1
      case "deflate" => 8 // Adobe deflate (zlib); the reader also takes 32946
      case other => throw new IllegalArgumentException(
        s"unsupported compression '$other' (none, deflate)")
    }
    val tiled = tileSize > 0
    require(!tiled || tileSize % 16 == 0, "TIFF tile size must be a multiple of 16")
    val bytesPer = bits / 8

    def encode(vals: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vals.length * bytesPer).order(ByteOrder.LITTLE_ENDIAN)
      val put: Double => Unit = (bits, sampleFormat) match {
        case (64, 3) => v => { bb.putDouble(v); () }
        case (32, 3) => v => { bb.putFloat(v.toFloat); () }
        case (32, 2) => v => { bb.putInt(math.rint(v).toInt); () }
        case (16, 2) => v => { bb.putShort(math.rint(v).toShort); () }
        case (16, 1) => v => { bb.putShort((math.rint(v).toLong & 0xffffL).toShort); () }
        case (8, 1)  => v => { bb.put((math.rint(v).toLong & 0xffL).toByte); () }
        case _ => throw new IllegalStateException("unreachable")
      }
      vals.foreach(put)
      bb.array()
    }

    val rps = math.min(math.max(rowsPerStrip, 1), h)
    // raw segments: strips of full rows, or square tiles padded with nodata
    val rawSegments: Array[Array[Byte]] =
      if (!tiled) {
        val nStrips = (h + rps - 1) / rps
        Array.tabulate(nStrips) { s =>
          val rows = math.min(rps, h - s * rps)
          encode(values.slice(s * rps * w, (s * rps + rows) * w))
        }
      } else {
        val tAcross = (w + tileSize - 1) / tileSize
        val tDown = (h + tileSize - 1) / tileSize
        Array.tabulate(tDown * tAcross) { ti =>
          val ty = ti / tAcross; val tx = ti % tAcross
          val tvals = Array.fill(tileSize * tileSize)(noData)
          var y = 0
          while (y < tileSize && ty * tileSize + y < h) {
            var x = 0
            while (x < tileSize && tx * tileSize + x < w) {
              tvals(y * tileSize + x) = values((ty * tileSize + y) * w + tx * tileSize + x)
              x += 1
            }
            y += 1
          }
          encode(tvals)
        }
      }
    val segments = if (comp == 1) rawSegments else rawSegments.map(deflate)
    val nSegs = segments.length
    val segArrays = nSegs > 1 // offset/byte-count arrays live out-of-line

    // GDAL_NODATA: NUL-terminated ASCII, space-padded past 4 bytes so the
    // IFD entry legitimately stores an offset (TIFF 6.0 inlines <= 4 bytes)
    val ndAscii = (noData.toString.padTo(4, ' ') + 0.toChar).getBytes("ASCII")
    val geographic = epsg == 4326
    val geoKeys: Array[Int] = Array(
      1, 1, 0, 3, // version, revision, minor, number of keys
      1024, 0, 1, if (geographic) 2 else 1, // GTModelType
      1025, 0, 1, 1, // GTRasterType = PixelIsArea
      (if (geographic) 2048 else 3072), 0, 1, epsg)
    val nEntries = if (tiled) 15 else 14
    val headerLen = 8
    val ifdLen = 2 + nEntries * 12 + 4
    var aux = headerLen + ifdLen
    val segArrOff = aux; aux += (if (segArrays) nSegs * 4 * 2 else 0)
    val pixelScaleOff = aux; aux += 3 * 8
    val tiepointOff = aux; aux += 6 * 8
    val geoKeysOff = aux; aux += geoKeys.length * 2
    val ndOff = aux; aux += ndAscii.length
    val dataOff = aux
    val segBytes = segments.map(_.length)
    val segOffs = segBytes.scanLeft(dataOff)(_ + _).init
    val total = dataOff + segBytes.sum

    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerLen)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) { buf.putShort(value.toShort).putShort(0) }
      else buf.putInt(value)
    }
    def offsetsEntry(tag: Int): Unit =
      if (segArrays) entry(tag, 4, nSegs, segArrOff) else entry(tag, 4, 1, segOffs(0))
    def countsEntry(tag: Int): Unit =
      if (segArrays) entry(tag, 4, nSegs, segArrOff + nSegs * 4)
      else entry(tag, 4, 1, segBytes(0))
    // entries must be ascending by tag id
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    entry(258, 3, 1, bits)
    entry(259, 3, 1, comp)
    entry(262, 3, 1, 1)
    if (!tiled) offsetsEntry(273)
    entry(277, 3, 1, 1)
    if (!tiled) { entry(278, 3, 1, rps); countsEntry(279) }
    if (tiled) {
      entry(322, 3, 1, tileSize)
      entry(323, 3, 1, tileSize)
      offsetsEntry(324)
      countsEntry(325)
    }
    entry(339, 3, 1, sampleFormat)
    entry(33550, 12, 3, pixelScaleOff)
    entry(33922, 12, 6, tiepointOff)
    entry(34735, 3, geoKeys.length, geoKeysOff)
    entry(42113, 2, ndAscii.length, ndOff)
    buf.putInt(0) // next IFD
    if (segArrays) {
      segOffs.foreach(buf.putInt)
      segBytes.foreach(buf.putInt)
    }
    buf.putDouble(bbox.width / w).putDouble(bbox.height / h).putDouble(0.0)
    // tiepoint: raster (0,0,0) → world (x1, y2, 0) (top-left)
    buf.putDouble(0).putDouble(0).putDouble(0)
      .putDouble(bbox.x1).putDouble(bbox.y2).putDouble(0)
    geoKeys.foreach(k => buf.putShort(k.toShort))
    buf.put(ndAscii)
    segments.foreach(buf.put)
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), buf.array())
  }

  case class Tiff(values: Array[Double], w: Int, h: Int, bbox: Bbox,
      epsg: Int, noData: Double, dtypeName: String = "float64")

  /** TIFF field-type byte widths (TIFF 6.0 §2 + BigTIFF LONG8/SLONG8/IFD8).
    * RATIONAL(5)/SRATIONAL(10) are two LONGs = 8 bytes — without them the
    * inline-vs-offset decision for tags like XResolution resolves against a
    * 1-byte width and reads the wrong offset. Unknown types reject instead
    * of defaulting (a lax default makes the corrupt-tag bound too weak). */
  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1,
    7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8, 13 -> 4, 16 -> 8,
    17 -> 8, 18 -> 8)

  def read(path: String): Tiff = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 8, "truncated TIFF header")
    val bigEndian = bytes(0) == 'M' && bytes(1) == 'M'
    require(bigEndian || (bytes(0) == 'I' && bytes(1) == 'I'),
      "not a TIFF (bad byte-order mark)")
    val buf = ByteBuffer.wrap(bytes)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val version = buf.getShort(2).toInt
    // 42 = classic TIFF (4-byte offsets, 12-byte entries); 43 = BigTIFF
    // (8-byte offsets, 20-byte entries) — same tag vocabulary
    require(version == 42 || version == 43, s"not a TIFF (version $version)")
    val big = version == 43
    if (big) require(buf.getShort(4) == 8 && buf.getShort(6) == 0,
      "malformed BigTIFF header")
    // this reader materializes the file as one Array[Byte], so offsets
    // beyond 2 GB are out of range even in BigTIFF (readAllBytes raises
    // first); toInt below is safe under that ceiling
    val ifd = if (big) buf.getLong(8).toInt else buf.getInt(4)
    val n = if (big) buf.getLong(ifd).toInt else buf.getShort(ifd) & 0xffff
    val entriesBase = ifd + (if (big) 8 else 2)
    val inlineCap = if (big) 8 else 4
    // tag -> (type, count, file offset of the value bytes): values at most
    // inlineCap bytes live inside the entry's value field, larger ones
    // behind the stored offset — resolving that here means every consumer
    // below reads from a plain file offset
    var tags = Map.empty[Int, (Int, Int, Int)]
    for (i <- 0 until n) {
      val off = entriesBase + i * (if (big) 20 else 12)
      val tag = buf.getShort(off) & 0xffff
      val typ = buf.getShort(off + 2).toInt
      val count = (if (big) buf.getLong(off + 4) else buf.getInt(off + 4).toLong).toInt
      val valueField = off + (if (big) 12 else 8)
      require(TypeSizes.contains(typ), s"corrupt TIFF: tag $tag has unknown field type $typ")
      val byteLen = TypeSizes(typ).toLong * count
      // structural bound: out-of-line value bytes live inside the file, so
      // a count driving byteLen past the file size is corruption, not data
      // (stops hostile 8-byte counts from sizing allocations)
      require(count >= 0 && byteLen <= bytes.length,
        s"corrupt TIFF: tag $tag count $count exceeds file size")
      val valueOff =
        if (byteLen <= inlineCap) valueField
        else if (big) buf.getLong(valueField).toInt else buf.getInt(valueField)
      require(valueOff >= 0 && valueOff + byteLen <= bytes.length,
        s"corrupt TIFF: tag $tag value offset outside the file")
      tags += tag -> ((typ, count, valueOff))
    }
    // typed scalar read from the resolved value offset
    def scalar(tag: Int): Int = {
      val (typ, _, off) = tags(tag)
      typ match {
        case 1      => bytes(off) & 0xff
        case 3      => buf.getShort(off) & 0xffff
        case 16     => buf.getLong(off).toInt
        case _      => buf.getInt(off)
      }
    }
    def scalarOpt(tag: Int): Option[Int] = tags.get(tag).map(_ => scalar(tag))
    val w = scalar(256); val h = scalar(257)
    // single-request materialization cap, same limit the engine's request
    // guards enforce — and the backstop against hostile dimension tags
    require(w > 0 && h > 0 && w.toLong * h <= RequestGuards.rasterLimitPixels,
      s"TIFF of $w x $h pixels exceeds the in-memory limit of " +
        s"${RequestGuards.rasterLimitPixels} pixels")
    val bits = scalar(258)
    val sampleFormat = scalarOpt(339).getOrElse(1)
    val comp = scalarOpt(259).getOrElse(1)
    require(comp == 1 || comp == 5 || comp == 8 || comp == 32946 || comp == 32773,
      s"reader supports uncompressed, LZW, PackBits, or deflate TIFF only (compression=$comp)")
    val predictor = scalarOpt(317).getOrElse(1)
    val dtypeName = SampleTypes.collectFirst {
      case (name, (b, f)) if b == bits && f == sampleFormat => name
    }.getOrElse(throw new IllegalArgumentException(
      s"unsupported sample type bits=$bits format=$sampleFormat"))
    // predictor 2 (horizontal differencing) is defined on integer samples,
    // 3 (floating-point byte-plane differencing) on float samples
    require(predictor == 1 || (predictor == 2 && sampleFormat != 3) ||
      (predictor == 3 && sampleFormat == 3),
      s"unsupported TIFF predictor $predictor for sample format $sampleFormat")
    val bytesPer = bits / 8
    // offset/count arrays: SHORT, LONG, or (BigTIFF) LONG8 elements, read
    // from the resolved value offset (inline and out-of-line look alike)
    def intsOf(tag: Int): Array[Int] = {
      val (typ, count, off) = tags(tag)
      Array.tabulate(count) { i =>
        typ match {
          case 3  => buf.getShort(off + i * 2) & 0xffff
          case 16 => buf.getLong(off + i * 8).toInt
          case _  => buf.getInt(off + i * 4)
        }
      }
    }
    val tiled = tags.contains(322)
    val decodeFrom: (ByteBuffer, Int) => Double = (bits, sampleFormat) match {
      case (64, 3) => (b, off) => b.getDouble(off)
      case (32, 3) => (b, off) => b.getFloat(off).toDouble
      case (32, 2) => (b, off) => b.getInt(off).toDouble
      case (16, 2) => (b, off) => b.getShort(off).toDouble
      case (16, 1) => (b, off) => (b.getShort(off) & 0xffff).toDouble
      case (8, 1)  => (b, off) => (b.get(off) & 0xff).toDouble
      case _ => throw new IllegalStateException("unreachable")
    }
    // one segment (strip or tile) as a decode-ready little-endian buffer;
    // `rowW` is the segment's row width in samples (predictor 2 is per-row)
    def segment(off: Int, count: Int, expected: Int, rowW: Int): ByteBuffer = {
      require(off >= 0 && count >= 0 && off.toLong + count <= bytes.length,
        s"corrupt TIFF: segment [$off, +$count) outside the file")
      val packed = java.util.Arrays.copyOfRange(bytes, off, off + count)
      val raw = comp match {
        case 1     => packed
        case 5     => lzwDecode(packed, expected)
        case 32773 => packBitsDecode(packed, expected)
        case _     => inflate(packed, expected)
      }
      if (predictor == 2) undoPredictor(raw, rowW, bytesPer, bigEndian)
      val decoded =
        if (predictor == 3) undoFloatPredictor(raw, rowW, bytesPer, bigEndian)
        else raw
      ByteBuffer.wrap(decoded)
        .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    }
    val values = new Array[Double](w * h)
    if (!tiled) {
      val stripOffs = intsOf(273)
      val stripCnts = intsOf(279)
      val rps = scalarOpt(278).getOrElse(h)
      var strip = 0
      while (strip * rps < h) {
        val rows = math.min(rps, h - strip * rps)
        val seg = segment(stripOffs(strip), stripCnts(strip), rows * w * bytesPer, w)
        var r = 0
        while (r < rows) {
          var j = 0
          while (j < w) {
            values((strip * rps + r) * w + j) = decodeFrom(seg, (r * w + j) * bytesPer)
            j += 1
          }
          r += 1
        }
        strip += 1
      }
    } else {
      val tw = scalar(322); val th = scalar(323)
      val tileOffs = intsOf(324)
      val tileCnts = intsOf(325)
      val tAcross = (w + tw - 1) / tw
      val tDown = (h + th - 1) / th
      var ti = 0
      while (ti < tDown * tAcross) {
        val ty = ti / tAcross; val tx = ti % tAcross
        val seg = segment(tileOffs(ti), tileCnts(ti), tw * th * bytesPer, tw)
        var y = 0
        while (y < th && ty * th + y < h) {
          var x = 0
          while (x < tw && tx * tw + x < w) {
            values((ty * th + y) * w + tx * tw + x) = decodeFrom(seg, (y * tw + x) * bytesPer)
            x += 1
          }
          y += 1
        }
        ti += 1
      }
    }
    val psOff = tags(33550)._3
    val (sx, sy) = (buf.getDouble(psOff), buf.getDouble(psOff + 8))
    val tpOff = tags(33922)._3
    val (ox, oy) = (buf.getDouble(tpOff + 24), buf.getDouble(tpOff + 32))
    val bbox = Bbox(ox, oy - sy * h, ox + sx * w, oy)
    val gkOff = tags(34735)._3
    val nKeys = buf.getShort(gkOff + 6).toInt
    var epsg = 0
    for (k <- 0 until nKeys) {
      val kOff = gkOff + 8 + k * 8
      val keyId = buf.getShort(kOff) & 0xffff
      if (keyId == 3072 || keyId == 2048) epsg = buf.getShort(kOff + 6) & 0xffff
    }
    val nd = tags.get(42113).map { case (_, count, off) =>
      new String(bytes, off, count, "ASCII").replace(0.toChar.toString, " ").trim.toDouble
    }.getOrElse(Double.MaxValue)
    Tiff(values, w, h, bbox, epsg, nd, dtypeName)
  }
}

/** Write one GeoTIFF per frame + a VRT-style JSON manifest (the reference's
  * tile-and-merge pattern, sinks.py:123-141). Frames are collected per
  * request — this is the export path, not the distributed store (that is
  * RasterParquetSink). The file sample type follows the source dtype when
  * the codec supports it; everything else exports as float64. */
case class GeoTiffSink(source: RasterBlock, url: String,
    compression: String = "none", tileSize: Int = 0) {
  def write(req: RasterRequest)(implicit spark: SparkSession): Seq[String] = {
    val res = source.getData(req).getOrElse(
      throw new IllegalArgumentException("empty result"))
    val epsg = req.projection.stripPrefix("EPSG:").toIntOption.getOrElse(0)
    val dt = source.dtype.name match {
      case n @ ("float32" | "int16" | "int32" | "uint8" | "uint16") => n
      case _ => "float64"
    }
    val paths = res.times.zipWithIndex.map { case (t, i) =>
      val p = s"$url/frame_${t.toEpochMilli}.tif"
      GeoTiff.write(p, res.values(i), req.width, req.height, req.bbox, epsg,
        res.noDataValue, dt, compression = compression, tileSize = tileSize)
      p
    }
    val manifest = Map("type" -> "graft-geotiff-v1",
      "frames" -> res.times.map(_.toEpochMilli), "files" -> paths)
    Files.writeString(Paths.get(url, "manifest.json"), graft.core.Json.render(manifest))
    paths
  }
}

/** Re-open a GeoTIFF directory (or single file) as a raster source. Files
  * are read driver-side at construction (they are bounded exports) and
  * served like MemorySource frames. */
case class GeoTiffSource(url: String, timeFirstMs: Long = 0L,
    timeDeltaMsArg: Long = 300000L) extends RasterBlock {
  private lazy val files: Seq[String] = {
    val p = Paths.get(url)
    if (Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      Files.list(p).iterator().asScala.map(_.toString)
        .filter(_.endsWith(".tif")).toSeq.sorted
    } else Seq(url)
  }
  private lazy val tiffs: Seq[GeoTiff.Tiff] = files.map(GeoTiff.read)
  private lazy val memory: MemorySource = {
    val t = tiffs.head
    MemorySource(tiffs.map(_.values), t.w, t.h, t.noData,
      s"EPSG:${t.epsg}", (t.bbox.x2 - t.bbox.x1) / t.w, t.bbox.x1, t.bbox.y2,
      timeFirstMs, if (tiffs.size > 1) Some(timeDeltaMsArg) else None,
      t.dtypeName)
  }
  override def dtype: DType = DType.byName(tiffs.head.dtypeName)
  override def projection: String = memory.projection
  override def temporal: Boolean = memory.temporal
  override def timeDeltaMs: Option[Long] = memory.timeDeltaMs
  override def period: Option[(Instant, Instant)] = memory.period
  override def extent: Option[Bbox] = memory.extent
  override def cellSize: Option[Double] = memory.cellSize
  override def allTimes: Seq[Instant] = memory.allTimes
  // the file's stored sentinel is remapped to the dtype-max convention by
  // the underlying MemorySource
  override def frame(req: RasterRequest)(implicit spark: SparkSession) =
    memory.frame(req)
}
