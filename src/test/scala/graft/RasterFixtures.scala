package graft

import java.time.Instant
import graft.raster._

/** The reference's canonical conftest fixtures (see FIXTURES.md §1-2;
  * reference tests/conftest.py:9-117): a 3-frame 10×10 uint8 raster with
  * frame values 1, 7, 255 (=nodata), EPSG:28992, 0.5 m pixels, top-left
  * origin (135000, 456000), hourly frames from 2000-01-01. */
object RasterFixtures {
  val T0: Instant = Instant.parse("2000-01-01T00:00:00Z")
  val Hour: Long = 3600000L

  def frame(v: Double): Array[Double] = Array.fill(100)(v)

  val source: MemorySource = MemorySource(
    data = Seq(frame(1), frame(7), frame(255)),
    gridW = 10, gridH = 10, noDataIn = 255,
    projection = "EPSG:28992", pixelSize = 0.5,
    originX = 135000, originY = 456000,
    timeFirstMs = T0.toEpochMilli, frameDeltaMs = Some(Hour),
    dtypeName = "uint8",
    metadata = (0 until 3).map(i => s"Testmeta for band $i"))

  val emptySource: MemorySource =
    source.copy(data = Seq.empty, frameDeltaMs = None)

  val nodataSource: MemorySource =
    source.copy(data = Seq(frame(255), frame(255), frame(255)))

  /** 4×6 px request over bbox (135000, 455997, 135002, 456000), full period. */
  val valsRequest: RasterRequest = RasterRequest(
    bbox = Bbox(135000, 455997, 135002, 456000),
    projection = "EPSG:28992", width = 4, height = 6,
    start = Some(T0), stop = Some(T0.plusMillis(3 * Hour)))

  /** Degenerate 1×1 point request at (135001, 455999). */
  val pointRequest: RasterRequest = RasterRequest(
    bbox = Bbox(135001, 455999, 135001, 455999),
    projection = "EPSG:28992", width = 1, height = 1,
    start = Some(T0), stop = Some(T0.plusMillis(3 * Hour)))

  /** Same as valsRequest but outside the period (2001) → empty. */
  val valsRequestNone: RasterRequest = valsRequest.copy(
    start = Some(Instant.parse("2001-01-01T00:00:00Z")),
    stop = Some(Instant.parse("2001-01-01T03:00:00Z")))

  /** Hand-rolled classic little-endian chunky-interleave multiband TIFF
    * (PlanarConfiguration=1, float64, one strip), written from the TIFF
    * 6.0 spec independently of the codec's writer — the foreign-file
    * shape the band-pruned decode must handle. Bbox (100, 203-h) to
    * (100+w, 203), EPSG:28992, 1 m pixels. */
  def writeChunkyMultibandTiff(path: String, bands: Seq[Array[Double]],
      w: Int, h: Int): Unit = {
    val spp = bands.length
    require(spp >= 1 && bands.forall(_.length == w * h))
    val entries = Seq[(Int, Int, Int, Long)](
      (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 64), (259, 3, 1, 1),
      (262, 3, 1, 1), (273, 4, 1, 0L /* patched */), (277, 3, 1, spp),
      (278, 3, 1, h), (279, 4, 1, (w.toLong * h * spp * 8)), (284, 3, 1, 1),
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
    for (i <- 0 until w * h; b <- 0 until spp) bb.putDouble(bands(b)(i))
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }
}
