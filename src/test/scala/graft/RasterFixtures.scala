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
}
