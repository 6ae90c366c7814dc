package graft

import graft.raster._
import RasterFixtures._

class RasterElemwiseSpec extends SparkSpec {

  private def frames(r: Option[RasterResult]): Seq[Seq[Double]] =
    r.get.values.toSeq.map(_.toSeq)

  test("MemorySource resamples to the requested grid (conftest golden)") {
    val res = source.getData(valsRequest).get
    assert(res.times.size == 3)
    assert(res.width == 4 && res.height == 6)
    assert(res.noDataValue == 255.0)
    assert(frames(Some(res)) == Seq(
      Seq.fill(24)(1.0), Seq.fill(24)(7.0), Seq.fill(24)(255.0)))
  }

  test("MemorySource point request returns 1x1") {
    val res = source.getData(pointRequest).get
    assert(res.values.map(_.toSeq).toSeq == Seq(Seq(1.0), Seq(7.0), Seq(255.0)))
  }

  test("MemorySource out-of-period request is empty") {
    assert(source.getData(valsRequestNone).isEmpty)
    assert(emptySource.getData(valsRequest).isEmpty)
  }

  test("MemorySource snap rules: no start/stop → last frame; start only → nearest") {
    val res = source.getData(valsRequest.copy(start = None, stop = None)).get
    assert(res.times == Seq(T0.plusMillis(2 * Hour)))
    assert(res.values(0).forall(_ == 255.0))
    val near = source.getData(
      valsRequest.copy(start = Some(T0.plusMillis(Hour + 60000)), stop = None)).get
    assert(near.times == Seq(T0.plusMillis(Hour)))
  }

  test("Add raster + constant promotes uint8 to int32 and propagates nodata") {
    val add = Add(source, 1)
    assert(add.dtype == DType.I4)
    val res = add.getData(valsRequest).get
    val nd = DType.I4.noDataValue
    assert(res.noDataValue == nd)
    assert(frames(Some(res)) == Seq(
      Seq.fill(24)(2.0), Seq.fill(24)(8.0), Seq.fill(24)(nd)))
  }

  test("Add raster + raster") {
    val res = Add(source, source).getData(valsRequest).get
    val nd = DType.I4.noDataValue
    assert(frames(Some(res)) == Seq(
      Seq.fill(24)(2.0), Seq.fill(24)(14.0), Seq.fill(24)(nd)))
  }

  test("Subtract/Multiply/Divide/Power semantics") {
    val nd4 = DType.I4.noDataValue
    assert(frames(Subtract(source, 1).getData(valsRequest)).map(_.head) ==
      Seq(0.0, 6.0, nd4))
    assert(frames(Multiply(source, 3).getData(valsRequest)).map(_.head) ==
      Seq(3.0, 21.0, nd4))
    val div = Divide(source, 2)
    assert(div.dtype == DType.F4)
    assert(frames(div.getData(valsRequest)).map(_.head) ==
      Seq(0.5, 3.5, DType.F4.noDataValue))
    assert(frames(Power(source, 2).getData(valsRequest)).map(_.head) ==
      Seq(1.0, 49.0, nd4))
  }

  test("comparisons give bool, nodata → False (NotEqual → True)") {
    val eq = Equal(source, 7)
    assert(eq.dtype == DType.Bool)
    assert(frames(eq.getData(valsRequest)).map(_.head) == Seq(0.0, 1.0, 0.0))
    assert(frames(NotEqual(source, 7).getData(valsRequest)).map(_.head) ==
      Seq(1.0, 0.0, 1.0))
    assert(frames(Greater(source, 1).getData(valsRequest)).map(_.head) ==
      Seq(0.0, 1.0, 0.0))
    assert(frames(GreaterEqual(source, 7).getData(valsRequest)).map(_.head) ==
      Seq(0.0, 1.0, 0.0))
    assert(frames(Less(source, 7).getData(valsRequest)).map(_.head) ==
      Seq(1.0, 0.0, 0.0))
    assert(frames(LessEqual(source, 1).getData(valsRequest)).map(_.head) ==
      Seq(1.0, 0.0, 0.0))
  }

  test("logic ops on boolean rasters") {
    val t = Equal(source, 7)  // frame pattern F,T,F
    val f = Equal(source, 1)  // frame pattern T,F,F
    assert(frames(And(t, f).getData(valsRequest)).map(_.head) == Seq(0.0, 0.0, 0.0))
    assert(frames(Or(t, f).getData(valsRequest)).map(_.head) == Seq(1.0, 1.0, 0.0))
    assert(frames(Xor(t, t).getData(valsRequest)).map(_.head) == Seq(0.0, 0.0, 0.0))
    assert(frames(Invert(t).getData(valsRequest)).map(_.head) == Seq(1.0, 0.0, 1.0))
  }

  test("IsData / IsNoData") {
    assert(frames(IsData(source).getData(valsRequest)).map(_.head) == Seq(1.0, 1.0, 0.0))
    assert(frames(IsNoData(source).getData(valsRequest)).map(_.head) == Seq(0.0, 0.0, 1.0))
  }

  test("Exp/Log/Log10: ≥float32, non-finite → nodata") {
    val lg = Log(source)
    assert(lg.dtype == DType.F4)
    val res = frames(lg.getData(valsRequest)).map(_.head)
    assert(math.abs(res(0) - 0.0) < 1e-6)
    assert(math.abs(res(1) - math.log(7)) < 1e-6)
    assert(res(2) == DType.F4.noDataValue)
    // log of a negative-valued raster → nodata
    val neg = Subtract(source, 10) // frame0 = -9
    val ln = Log(neg)
    assert(frames(ln.getData(valsRequest)).map(_.head).head == ln.noDataValue)
  }

  test("FillNoData: rightmost data wins, nodata transparent") {
    val a = source                       // 1, 7, nodata
    val b = Multiply(source, 2)          // 2, 14, nodata
    val fill = FillNoData(Seq(a, b))
    val res = frames(fill.getData(valsRequest)).map(_.head)
    assert(res(0) == 2.0 && res(1) == 14.0 && res(2) == fill.noDataValue)
    val fill2 = FillNoData(Seq(nodataSource, a))
    assert(frames(fill2.getData(valsRequest)).map(_.head) ==
      Seq(1.0, 7.0, fill2.noDataValue))
  }

  test("dtype promotion matches numpy") {
    import DType._
    assert(promote(U1, I1) == I2)
    assert(promote(U4, I4) == I8)
    assert(promote(U8, I8) == F8)
    assert(promote(I8, F4) == F8)
    assert(promote(I2, F4) == F4)
    assert(promote(U1, U2) == U2)
    assert(promote(Bool, U1) == U1)
    assert(promote(F4, F8) == F8)
  }
}
