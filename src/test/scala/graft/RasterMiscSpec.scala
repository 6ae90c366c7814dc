package graft

import graft.raster._
import RasterFixtures._

class RasterMiscSpec extends SparkSpec {

  private def heads(r: Option[RasterResult]): Seq[Double] =
    r.get.values.toSeq.map(_.head)

  test("Clip masks store where source has nodata / False") {
    val clipped = Clip(source, nodataSource)
    assert(heads(clipped.getData(valsRequest)) == Seq(255.0, 255.0, 255.0))
    val boolMask = Equal(source, 7) // F, T, F
    val clipped2 = Clip(source, boolMask)
    assert(heads(clipped2.getData(valsRequest)) == Seq(255.0, 7.0, 255.0))
  }

  test("Mask replaces data with a constant, sentinel 0/1 rule") {
    val m = Mask(source, 8)
    assert(m.dtype == DType.U1)
    assert(heads(m.getData(valsRequest)) == Seq(8.0, 8.0, 0.0))
    val m0 = Mask(source, 0)
    assert(heads(m0.getData(valsRequest)) == Seq(0.0, 0.0, 1.0))
  }

  test("MaskBelow turns cells below value to nodata") {
    assert(heads(MaskBelow(source, 5).getData(valsRequest)) == Seq(255.0, 7.0, 255.0))
  }

  test("Step classifies into left/at/right keeping nodata") {
    val s = Step(source, left = 10, right = 20, value = 7)
    assert(heads(s.getData(valsRequest)) == Seq(10.0, 15.0, 255.0))
    val s2 = Step(source, left = 1, right = 3, value = 4, atOpt = Some(9))
    assert(heads(s2.getData(valsRequest)) == Seq(1.0, 3.0, 255.0))
  }

  test("Classify bins with np.digitize semantics") {
    val c = Classify(source, Seq(2.0, 8.0))
    assert(c.dtype == DType.U1)
    assert(c.noDataValue == 255.0)
    // 1 < 2 → bin 0; 2 <= 7 < 8 → bin 1; nodata → 255
    assert(heads(c.getData(valsRequest)) == Seq(0.0, 1.0, 255.0))
    val cr = Classify(source, Seq(1.0, 7.0), right = true)
    // right=True: v <= edge → 1 in bin 0... digitize(1,[1,7],right=True)=0
    assert(heads(cr.getData(valsRequest)) == Seq(0.0, 1.0, 255.0))
  }

  test("Reclassify maps listed values; select drops the rest") {
    val rc = Reclassify(source, Seq((7.0, 1000.0)))
    assert(rc.dtype == DType.I8)
    assert(heads(rc.getData(valsRequest)) ==
      Seq(1.0, 1000.0, DType.I8.noDataValue))
    val rcSel = Reclassify(source, Seq((7.0, 1000.0)), select = true)
    assert(heads(rcSel.getData(valsRequest)) ==
      Seq(DType.I8.noDataValue, 1000.0, DType.I8.noDataValue))
  }

  test("Max reduces cellwise ignoring nodata; keeps promoted dtype") {
    val m = Max(Seq(source, Multiply(source, 2)))
    val nd = m.noDataValue
    assert(heads(m.getData(valsRequest)) == Seq(2.0, 14.0, nd))
    val m2 = Max(Seq(source, nodataSource))
    assert(m2.dtype == DType.U1)
    assert(heads(m2.getData(valsRequest)) == Seq(1.0, 7.0, 255.0))
  }

  test("Reduce statistics over a stack") {
    val stack = Seq(source, Multiply(source, 3), nodataSource)
    assert(heads(Reduce(stack, "sum").getData(valsRequest)) == Seq(4.0, 28.0, 0.0))
    assert(heads(Reduce(stack, "count").getData(valsRequest)) == Seq(2.0, 2.0, 0.0))
    assert(heads(Reduce(stack, "mean").getData(valsRequest)) == Seq(2.0, 14.0,
      Reduce(stack, "mean").noDataValue))
    assert(heads(Reduce(stack, "median").getData(valsRequest)).take(2) == Seq(2.0, 14.0))
    assert(heads(Reduce(stack, "first").getData(valsRequest)).take(2) == Seq(1.0, 7.0))
    assert(heads(Reduce(stack, "last").getData(valsRequest)).take(2) == Seq(3.0, 21.0))
    assert(heads(Reduce(stack, "argmax").getData(valsRequest)).take(2) == Seq(1.0, 1.0))
    assert(heads(Reduce(stack, "argmin").getData(valsRequest)).take(2) == Seq(0.0, 0.0))
    assert(heads(Reduce(stack, "p75").getData(valsRequest)).take(2) == Seq(2.5, 17.5))
  }

  test("Group unions periods and paints rightmost-wins") {
    val g = Group(Seq(nodataSource, Multiply(source, 2)))
    assert(g.period == source.period)
    assert(heads(g.getData(valsRequest)) == Seq(2.0, 14.0, g.noDataValue))
    // latest-frame request over union
    val latest = g.getData(valsRequest.copy(start = None, stop = None)).get
    assert(latest.times == Seq(T0.plusMillis(2 * Hour)))
  }

  test("Group of shifted sources unions the time axis") {
    val shifted = source.copy(timeFirstMs = T0.toEpochMilli + 3 * Hour)
    val g = Group(Seq(source, shifted))
    assert(g.allTimes.size == 6)
    val res = g.getData(valsRequest.copy(stop = Some(T0.plusMillis(6 * Hour)))).get
    assert(res.times.size == 6)
    assert(res.values.map(_.head).toSeq == Seq(1.0, 7.0, 255.0, 1.0, 7.0, 255.0))
  }
}
