package graft

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import java.time.Instant
import graft.raster._

class NetCdfSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ------------------------------------------------- CDF-1 test builder
  // A from-scratch CDF-1 serializer (4-byte begins, record dim support)
  // so foreign-file reads are tested against INDEPENDENTLY built bytes,
  // not just our own CDF-2 writer's output.

  private val NcShort = 3; private val NcInt = 4
  private val NcFloat = 5; private val NcDouble = 6
  private def tSize(t: Int): Int = t match {
    case 1 | 2 | 7 => 1; case 3 | 8 => 2; case 4 | 5 | 9 => 4
    case 6 | 10 | 11 => 8
  }
  private case class TAtt(n: String, t: Int, text: String = "",
      nums: Seq[Double] = Nil)
  private case class TVar(n: String, dims: Seq[Int], atts: Seq[TAtt],
      t: Int, data: Seq[Double])

  private def pad4(n: Int): Int = (n + 3) & ~3
  private def nmSize(s: String): Int = 4 + pad4(s.length)
  private def attSize(a: TAtt): Int = nmSize(a.n) + 8 +
    pad4((if (a.t == 2) a.text.length else a.nums.length) * tSize(a.t))
  private def putNm(b: ByteBuffer, s: String): Unit = {
    b.putInt(s.length); b.put(s.getBytes("UTF-8"))
    (s.length until pad4(s.length)).foreach(_ => b.put(0.toByte))
  }
  private def putV(b: ByteBuffer, t: Int, v: Double): Unit = t match {
    case 1 | 7 => b.put(v.toByte); case 3 | 8 => b.putShort(v.toShort)
    case 4 | 9 => b.putInt(v.toInt); case 5 => b.putFloat(v.toFloat)
    case 6 => b.putDouble(v); case 10 | 11 => b.putLong(v.toLong)
  }
  private def putAtt(b: ByteBuffer, a: TAtt): Unit = {
    putNm(b, a.n); b.putInt(a.t)
    if (a.t == 2) {
      b.putInt(a.text.length); b.put(a.text.getBytes("UTF-8"))
      (a.text.length until pad4(a.text.length)).foreach(_ => b.put(0.toByte))
    } else {
      b.putInt(a.nums.length); a.nums.foreach(putV(b, a.t, _))
      val sz = a.nums.length * tSize(a.t)
      (sz until pad4(sz)).foreach(_ => b.put(0.toByte))
    }
  }

  /** dims with length 0 = the record dimension; record vars are those
    * whose first dim is the record dim. `version` 1 or 5 — CDF-5 widens
    * every NON_NEG field (counts, name lengths, dim lengths, ndims,
    * dimids, vsize) to 8 bytes and the begin offsets to 8 bytes. */
  private def buildCdf(dims: Seq[(String, Int)], vars: Seq[TVar],
      numrecs: Int, version: Int = 1): Array[Byte] = {
    val v5 = version == 5
    val nnSz = if (v5) 8 else 4
    val beginSz = if (v5) 8 else 4
    val recDim = dims.indexWhere(_._2 == 0)
    def isRec(v: TVar) = v.dims.headOption.contains(recDim)
    def sliceElems(v: TVar): Int =
      (if (isRec(v)) v.dims.tail else v.dims).map(dims(_)._2).product max 1
    def vsize(v: TVar): Int = pad4(sliceElems(v) * tSize(v.t))
    def nmSz(s: String): Int = nnSz + pad4(s.length)
    def atSz(a: TAtt): Int = nmSz(a.n) + 4 + nnSz +
      pad4((if (a.t == 2) a.text.length else a.nums.length) * tSize(a.t))
    val headSize = 4 + nnSz +
      (4 + nnSz + dims.map { case (n, _) => nmSz(n) + nnSz }.sum) +
      (4 + nnSz) /* no gatts */ +
      (4 + nnSz + vars.map(v => nmSz(v.n) + nnSz + nnSz * v.dims.length +
        (if (v.atts.isEmpty) 4 + nnSz else 4 + nnSz + v.atts.map(atSz).sum) +
        4 + nnSz + beginSz).sum)
    val fixed = vars.filterNot(isRec)
    val recs = vars.filter(isRec)
    val fixedBegins = fixed.map(vsize).scanLeft(headSize)(_ + _).init
    val recStart = headSize + fixed.map(vsize).sum
    val recBegins = recs.map(vsize).scanLeft(recStart)(_ + _).init
    val recSize = recs.map(vsize).sum
    val begins = (fixed.zip(fixedBegins) ++ recs.zip(recBegins)).toMap
    val total = recStart + recSize * numrecs
    val b = ByteBuffer.allocate(total)
    def putNN(v: Long): Unit = if (v5) b.putLong(v) else b.putInt(v.toInt)
    def putName(s: String): Unit = {
      putNN(s.length); b.put(s.getBytes("UTF-8"))
      (s.length until pad4(s.length)).foreach(_ => b.put(0.toByte))
    }
    def putA(a: TAtt): Unit = {
      putName(a.n); b.putInt(a.t)
      if (a.t == 2) {
        putNN(a.text.length); b.put(a.text.getBytes("UTF-8"))
        (a.text.length until pad4(a.text.length)).foreach(_ => b.put(0.toByte))
      } else {
        putNN(a.nums.length); a.nums.foreach(putV(b, a.t, _))
        val sz = a.nums.length * tSize(a.t)
        (sz until pad4(sz)).foreach(_ => b.put(0.toByte))
      }
    }
    b.put("CDF".getBytes); b.put(version.toByte)
    putNN(numrecs)
    b.putInt(0x0A); putNN(dims.length)
    dims.foreach { case (n, l) => putName(n); putNN(l) }
    b.putInt(0); putNN(0) // no global atts
    b.putInt(0x0B); putNN(vars.length)
    vars.foreach { v =>
      putName(v.n)
      putNN(v.dims.length); v.dims.foreach(d => putNN(d))
      if (v.atts.isEmpty) { b.putInt(0); putNN(0) }
      else { b.putInt(0x0C); putNN(v.atts.length); v.atts.foreach(putA) }
      b.putInt(v.t); putNN(vsize(v))
      if (v5) b.putLong(begins(v)) else b.putInt(begins(v))
    }
    assert(b.position() == headSize, s"${b.position()} != $headSize")
    fixed.foreach { v =>
      v.data.foreach(putV(b, v.t, _))
      val sz = v.data.length * tSize(v.t)
      (sz until pad4(sz)).foreach(_ => b.put(0.toByte))
    }
    (0 until numrecs).foreach { r =>
      recs.foreach { v =>
        val per = sliceElems(v)
        v.data.slice(r * per, (r + 1) * per).foreach(putV(b, v.t, _))
        val sz = per * tSize(v.t)
        (sz until pad4(sz)).foreach(_ => b.put(0.toByte))
      }
    }
    assert(b.position() == total)
    b.array()
  }

  private def buildCdf1(dims: Seq[(String, Int)], vars: Seq[TVar],
      numrecs: Int): Array[Byte] = buildCdf(dims, vars, numrecs, 1)

  // --------------------------------------------------------------- tests

  test("NetCDF round-trips the whole stack: values, times, CRS, extent") {
    val dir = tmp("graft_nc")
    val req = RasterFixtures.valsRequest
    NetCdfSink(RasterFixtures.source, s"$dir/stack.nc").write(req)(spark)
    // the in-file spatial_ref WKT must be enough: no .prj, no argument
    Files.deleteIfExists(Paths.get(s"$dir/stack.prj"))
    val back = NetCdfSource(s"$dir/stack.nc")
    assert(back.projection == "EPSG:28992")
    assert(back.temporal && back.timeDeltaMs.contains(RasterFixtures.Hour))
    assert(back.allTimes == Seq(0, 1, 2).map(i =>
      RasterFixtures.T0.plusMillis(i * RasterFixtures.Hour)))
    assert(back.cellSize.contains(0.5))
    assert(back.extent.contains(req.bbox.copy(
      x1 = 135000, y1 = 455997, x2 = 135002, y2 = 456000)))
    val res = back.getData(req)(spark).get
    val want = RasterFixtures.source.getData(req)(spark).get
    assert(res.times == want.times)
    assert(res.values.map(_.toSeq).toSeq == want.values.map(_.toSeq).toSeq)
    assert(res.noDataValue == want.noDataValue)
    // a temporal SLICE reads only that frame
    val one = back.getData(req.copy(
      start = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour)),
      stop = Some(RasterFixtures.T0.plusMillis(RasterFixtures.Hour))))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 7.0))
  }

  test("temporal slice reads only the selected frames' byte ranges") {
    val dir = tmp("graft_nc_prune")
    val req = RasterFixtures.valsRequest
    NetCdfSink(RasterFixtures.source, s"$dir/stack.nc").write(req)(spark)
    // drop the final byte: the LAST frame's range is now short, so a
    // whole-stack read must fail — but a frame-0 slice, whose bytes are
    // intact, must succeed iff the read is positioned per frame
    val raf = new java.io.RandomAccessFile(s"$dir/stack.nc", "rw")
    try raf.setLength(raf.length() - 1) finally raf.close()
    val back = NetCdfSource(s"$dir/stack.nc")
    val one = back.getData(req.copy(
      start = Some(RasterFixtures.T0), stop = Some(RasterFixtures.T0)))(spark).get
    assert(one.times.length == 1 && one.values.head.forall(_ == 1.0))
    intercept[Exception] {
      NetCdfSource(s"$dir/stack.nc").getData(req)(spark)
    }
  }

  test("foreign CDF-1 file: record time, ascending y, scale/offset, degrees") {
    // hand-built bytes — record (unlimited) time dim, float payload with
    // scale_factor/add_offset/_FillValue, ascending latitude axis, and
    // lon/lat degree units (no grid_mapping → EPSG:4326 heuristic)
    val bytes = buildCdf1(
      dims = Seq(("time", 0), ("lat", 2), ("lon", 3)),
      vars = Seq(
        TVar("time", Seq(0), Seq(
          TAtt("units", 2, text = "hours since 2000-01-01 00:00:00")),
          NcDouble, Seq(0.0, 1.0)),
        TVar("lat", Seq(1), Seq(TAtt("units", 2, text = "degrees_north")),
          NcDouble, Seq(10.25, 10.75)), // ASCENDING cell centers
        TVar("lon", Seq(2), Seq(TAtt("units", 2, text = "degrees_east")),
          NcDouble, Seq(5.25, 5.75, 6.25)),
        TVar("t2m", Seq(0, 1, 2), Seq(
          TAtt("_FillValue", NcFloat, nums = Seq(-99.0)),
          TAtt("scale_factor", NcDouble, nums = Seq(0.5)),
          TAtt("add_offset", NcDouble, nums = Seq(100.0))),
          NcFloat, Seq(1, 2, 3, 4, 5, -99, 10, 20, 30, 40, 50, 60))),
      numrecs = 2)
    val dir = tmp("graft_nc_foreign")
    Files.write(Paths.get(s"$dir/era.nc"), bytes)
    val src = NetCdfSource(s"$dir/era.nc")
    assert(src.projection == "EPSG:4326")
    assert(src.cellSize.contains(0.5))
    assert(src.extent.contains(Bbox(5.0, 10.0, 6.5, 11.0)))
    val t0 = Instant.parse("2000-01-01T00:00:00Z")
    assert(src.allTimes == Seq(t0, t0.plusMillis(3600000L)))
    val req = RasterRequest(Bbox(5.0, 10.0, 6.5, 11.0), "EPSG:4326", 3, 2,
      Some(t0), Some(t0.plusMillis(3600000L)))
    val res = src.getData(req)(spark).get
    // ascending y flips: stored row 1 (lat 10.75) is the TOP output row;
    // raw -99 is the fill → engine nodata; everything else scales
    val nd = res.noDataValue
    assert(res.values(0).toSeq == Seq(102.0, 102.5, nd, 100.5, 101.0, 101.5))
    assert(res.values(1).toSeq == Seq(120.0, 125.0, 130.0, 105.0, 110.0, 115.0))
  }

  test("foreign CDF-1 single-frame 2-D variable with projected coords") {
    val bytes = buildCdf1(
      dims = Seq(("y", 2), ("x", 2)),
      vars = Seq(
        TVar("y", Seq(0), Seq(TAtt("units", 2, text = "m")),
          NcDouble, Seq(456000.75, 456000.25)), // descending (north up)
        TVar("x", Seq(1), Seq(TAtt("units", 2, text = "m")),
          NcDouble, Seq(135000.25, 135000.75)),
        TVar("depth", Seq(0, 1), Nil, NcInt, Seq(7, 8, 9, 10))),
      numrecs = 0)
    val dir = tmp("graft_nc_2d")
    Files.write(Paths.get(s"$dir/d.nc"), bytes)
    // projected meters + no grid_mapping + no .prj → the projection
    // argument names the CRS (same contract as the other grid formats)
    val src = NetCdfSource(s"$dir/d.nc", projectionArg = "EPSG:28992")
    assert(!src.temporal && src.dtype == DType.I4)
    assert(src.projection == "EPSG:28992")
    assert(src.extent.contains(Bbox(135000, 456000, 135001, 456001)))
    val req = RasterRequest(Bbox(135000, 456000, 135001, 456001),
      "EPSG:28992", 2, 2, Some(Instant.ofEpochMilli(0)),
      Some(Instant.ofEpochMilli(0)))
    val res = src.getData(req)(spark).get
    assert(res.values.head.toSeq == Seq(7.0, 8.0, 9.0, 10.0))
  }

  test("packed int16 write: scale/offset derived, 4x smaller, ~2^-16 exact") {
    val dir = tmp("graft_nc_pack")
    val req = RasterFixtures.valsRequest
    NetCdfSink(RasterFixtures.source, s"$dir/full.nc").write(req)(spark)
    NetCdfSink(RasterFixtures.source, s"$dir/packed.nc",
      packTo = Some("int16")).write(req)(spark)
    // the packed variable stores int16 where the full one stores int16
    // already (uint8 source) — use a float source for a real size check
    val floatSrc = RasterFixtures.source.copy(
      data = Seq(Array.tabulate(100)(_ * 0.37),
        Array.tabulate(100)(i => 100.0 - i * 0.11),
        RasterFixtures.frame(255)),
      dtypeName = "float64")
    NetCdfSink(floatSrc, s"$dir/f64.nc").write(req)(spark)
    NetCdfSink(floatSrc, s"$dir/f64p.nc", packTo = Some("int16"))
      .write(req)(spark)
    val szFull = Files.size(Paths.get(s"$dir/f64.nc"))
    val szPacked = Files.size(Paths.get(s"$dir/f64p.nc"))
    // payload shrinks 8 → 2 bytes per value (72 values here; header +
    // coordinate variables are shared fixed costs, and the packed header
    // carries two extra attributes ~60 bytes)
    assert(szFull - szPacked >= 72 * 6 - 80, s"$szPacked vs $szFull")
    val back = NetCdfSource(s"$dir/f64p.nc")
    assert(back.projection == "EPSG:28992")
    val got = back.getData(req)(spark).get
    val want = floatSrc.getData(req)(spark).get
    // packing quantizes to (max-min)/2^16: values match within scale/2 and
    // nodata cells stay exactly nodata (fill code reserved)
    val mn = 0.0; val mx = 100.0
    val tol = (mx - mn) / 65534.0 / 2 + 1e-12
    got.values.zip(want.values).foreach { case (g, w) =>
      g.zip(w).foreach { case (a, b) =>
        if (b == want.noDataValue) assert(a == got.noDataValue)
        else assert(math.abs(a - b) <= tol, s"$a vs $b")
      }
    }
  }

  test("CDF-5 (64-bit data): wide NON_NEG fields and the unsigned/64-bit types") {
    // NcUInt64 = 11 payload with a record time dim — every NON_NEG field
    // in this file is 8 bytes wide
    val bytes = buildCdf(
      dims = Seq(("time", 0), ("y", 2), ("x", 2)),
      vars = Seq(
        TVar("time", Seq(0), Seq(
          TAtt("units", 2, text = "seconds since 2000-01-01")),
          NcDouble, Seq(0.0, 60.0)),
        TVar("y", Seq(1), Seq(TAtt("units", 2, text = "m")),
          NcDouble, Seq(456001.5, 456000.5)),
        TVar("x", Seq(2), Seq(TAtt("units", 2, text = "m")),
          NcDouble, Seq(135000.5, 135001.5)),
        TVar("counts", Seq(0, 1, 2), Seq(TAtt("_FillValue", 11, nums = Seq(0.0))),
          11, Seq(10, 20, 30, 40, 50, 60, 70, 0))),
      numrecs = 2, version = 5)
    val dir = tmp("graft_nc_cdf5")
    Files.write(Paths.get(s"$dir/big.nc"), bytes)
    val src = NetCdfSource(s"$dir/big.nc", projectionArg = "EPSG:28992")
    assert(src.temporal && src.dtype == DType.U8)
    assert(src.cellSize.contains(1.0))
    val t0 = Instant.parse("2000-01-01T00:00:00Z")
    assert(src.allTimes == Seq(t0, t0.plusMillis(60000L)))
    val req = RasterRequest(Bbox(135000, 456000, 135002, 456002),
      "EPSG:28992", 2, 2, Some(t0), Some(t0.plusMillis(60000L)))
    val res = src.getData(req)(spark).get
    assert(res.values(0).toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    // raw 0 is the fill → engine nodata sentinel
    assert(res.values(1).toSeq.take(3) == Seq(50.0, 60.0, 70.0))
    assert(res.values(1)(3) == res.noDataValue)
  }

  test("NetCDF dispatches through RasterFileSource and the JSON view") {
    val dir = tmp("graft_nc_disp")
    NetCdfSink(RasterFixtures.source, s"$dir/s.nc")
      .write(RasterFixtures.valsRequest)(spark)
    val src = RasterFileSource(s"$dir/s.nc")
    assert(src.isInstanceOf[NetCdfSource])
    assert(src.projection == "EPSG:28992")
    // directory dispatch finds the .nc
    assert(RasterFileSource(dir).isInstanceOf[NetCdfSource])
    val back = graft.core.BlockRegistry.fromJson(NetCdfSource(s"$dir/s.nc").toJson)
    assert(back == NetCdfSource(s"$dir/s.nc"))
  }

  test("NetCDF failure modes are loud: HDF5, bad time units, ragged grid") {
    val dir = tmp("graft_nc_bad")
    // NetCDF-4 = HDF5 container: tell the user what to do, don't mislabel
    Files.write(Paths.get(s"$dir/h5.nc"),
      Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    val e1 = intercept[IllegalArgumentException] {
      NetCdfSource(s"$dir/h5.nc").projection
    }
    assert(e1.getMessage.contains("CDF magic"))
    // time variable without CF units
    val noUnits = buildCdf1(
      dims = Seq(("time", 2), ("y", 1), ("x", 2)),
      vars = Seq(
        TVar("time", Seq(0), Nil, NcDouble, Seq(0.0, 1.0)),
        TVar("y", Seq(1), Nil, NcDouble, Seq(0.5)),
        TVar("x", Seq(2), Nil, NcDouble, Seq(0.5, 1.5)),
        TVar("v", Seq(0, 1, 2), Nil, NcShort, Seq(1, 2, 3, 4))),
      numrecs = 0)
    Files.write(Paths.get(s"$dir/nounits.nc"), noUnits)
    val e2 = intercept[IllegalArgumentException] {
      NetCdfSource(s"$dir/nounits.nc", projectionArg = "EPSG:28992").allTimes
    }
    assert(e2.getMessage.contains("units"))
    // non-uniform x spacing
    val ragged = buildCdf1(
      dims = Seq(("y", 1), ("x", 3)),
      vars = Seq(
        TVar("y", Seq(0), Nil, NcDouble, Seq(0.5)),
        TVar("x", Seq(1), Nil, NcDouble, Seq(0.5, 1.5, 4.0)),
        TVar("v", Seq(0, 1), Nil, NcShort, Seq(1, 2, 3))),
      numrecs = 0)
    Files.write(Paths.get(s"$dir/ragged.nc"), ragged)
    val e3 = intercept[IllegalArgumentException] {
      NetCdfSource(s"$dir/ragged.nc", projectionArg = "EPSG:28992").extent
    }
    assert(e3.getMessage.contains("spacing"))
  }

  test("CF time-unit spellings parse to the same instants") {
    val vals = Array(0.0, 1.5)
    val a = NetCdf.parseCfTimes("seconds since 1970-01-01 00:00:00", vals)
    assert(a == Seq(0L, 1500L))
    assert(NetCdf.parseCfTimes("days since 2000-01-01", Array(1.0)).head ==
      Instant.parse("2000-01-02T00:00:00Z").toEpochMilli)
    assert(NetCdf.parseCfTimes("hours since 2000-01-01T06:00:00Z", Array(2.0)).head ==
      Instant.parse("2000-01-01T08:00:00Z").toEpochMilli)
    assert(NetCdf.parseCfTimes("minutes since 2000-01-01 00:00:00 +01:00",
      Array(0.0)).head == Instant.parse("1999-12-31T23:00:00Z").toEpochMilli)
    intercept[IllegalArgumentException] {
      NetCdf.parseCfTimes("fortnights since 2000-01-01", Array(0.0))
    }
  }
}
