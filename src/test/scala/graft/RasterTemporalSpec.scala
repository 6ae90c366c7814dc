package graft

import java.time.Instant
import graft.raster._
import RasterFixtures._

class RasterTemporalSpec extends SparkSpec {

  private def heads(r: Option[RasterResult]): Seq[Double] =
    r.get.values.toSeq.map(_.head)

  test("TemporalAggregate daily sum/count/mean/max skip nodata") {
    val daySum = TemporalAggregate(source, Some("D"), "sum")
    val res = daySum.getData(valsRequest).get
    assert(res.times == Seq(T0))
    assert(res.values(0).forall(_ == 8.0))
    assert(heads(TemporalAggregate(source, Some("D"), "count").getData(valsRequest)) == Seq(2.0))
    assert(heads(TemporalAggregate(source, Some("D"), "mean").getData(valsRequest)) == Seq(4.0))
    assert(heads(TemporalAggregate(source, Some("D"), "max").getData(valsRequest)) == Seq(7.0))
    assert(heads(TemporalAggregate(source, Some("D"), "p75").getData(valsRequest)) == Seq(5.5))
  }

  test("TemporalAggregate frequency=None aggregates whole period at period end") {
    val agg = TemporalAggregate(source, None, "sum")
    val res = agg.getData(valsRequest).get
    assert(res.times == Seq(T0.plusMillis(2 * Hour)))
    assert(res.values(0).forall(_ == 8.0))
  }

  test("TemporalAggregate hourly keeps per-frame bins; empty bins 0 or nodata") {
    val hourSum = TemporalAggregate(source, Some("h"), "sum")
    assert(heads(hourSum.getData(valsRequest)) == Seq(1.0, 7.0, 0.0))
    val hourMean = TemporalAggregate(source, Some("h"), "mean")
    assert(heads(hourMean.getData(valsRequest)) ==
      Seq(1.0, 7.0, hourMean.noDataValue))
    assert(hourSum.dtype == DType.I4)
    assert(hourMean.dtype == DType.F4)
  }

  test("TemporalAggregate in Europe/Amsterdam bins by local day") {
    val agg = TemporalAggregate(source, Some("D"), "sum", timezone = "Europe/Amsterdam")
    // the aggregated raster's only label sits at local midnight = 23:00Z the
    // day before, so a request starting at T0 misses it (reference
    // _snap_to_resampled_labels returns empty when start > period stop)
    assert(agg.getData(valsRequest).isEmpty)
    val res = agg.getData(valsRequest.copy(
      start = Some(Instant.parse("1999-12-31T23:00:00Z")))).get
    assert(res.times == Seq(Instant.parse("1999-12-31T23:00:00Z")))
    assert(res.values(0).forall(_ == 8.0))
  }

  test("TemporalSum sums frames without nodata handling") {
    val ts = TemporalSum(source)
    val res = ts.getData(valsRequest).get
    assert(res.times == Seq(T0.plusMillis(2 * Hour)))
    assert(res.values(0).forall(_ == 263.0)) // 1 + 7 + 255 (sentinel summed as-is)
  }

  test("Shift moves the time axis") {
    val sh = Shift(source, 30 * 60000L)
    assert(sh.period.get._1 == T0.plusMillis(30 * 60000L))
    val res = sh.getData(valsRequest).get
    assert(res.times.map(_.toEpochMilli).toSeq ==
      Seq(0, 1, 2).map(k => T0.toEpochMilli + k * Hour + 30 * 60000L))
    assert(heads(Some(res)) == Seq(1.0, 7.0, 255.0))
  }

  test("Cumulative sum/count accumulate over time; nodata adds zero") {
    assert(heads(Cumulative(source, "sum").getData(valsRequest)) == Seq(1.0, 8.0, 8.0))
    assert(heads(Cumulative(source, "count").getData(valsRequest)) == Seq(1.0, 2.0, 2.0))
  }

  test("Cumulative resets at frequency boundaries") {
    // 6 hourly frames across a 3h reset boundary is hard with the 3-frame
    // fixture; use a daily reset with hourly frames instead: no reset within
    // the fixture's 3 hours, then shift source across midnight to force one.
    val crossing = source.copy(
      data = Seq(RasterFixtures.frame(1), RasterFixtures.frame(7),
        RasterFixtures.frame(2), RasterFixtures.frame(5)),
      timeFirstMs = Instant.parse("2000-01-01T22:00:00Z").toEpochMilli)
    val req = valsRequest.copy(
      start = Some(Instant.parse("2000-01-01T22:00:00Z")),
      stop = Some(Instant.parse("2000-01-02T02:00:00Z")))
    val cum = Cumulative(crossing, "sum", Some("D"))
    // D bins with closed=right (Cumulative hardcodes right/right): the
    // midnight frame still belongs to the previous day's bin, so the reset
    // happens at the 01:00 frame
    assert(heads(cum.getData(req)) == Seq(1.0, 8.0, 10.0, 5.0))
  }

  test("Snap takes store values at index timestamps") {
    val index = Shift(source, 30 * 60000L)
    val snapped = Snap(source, index)
    val res = snapped.getData(valsRequest.copy(stop = Some(T0.plusMillis(4 * Hour)))).get
    assert(res.times == index.allTimes)
    assert(heads(Some(res)) == Seq(1.0, 7.0, 255.0))
  }

  test("Snap broadcasts a non-temporal store over the index axis") {
    val single = source.copy(data = Seq(RasterFixtures.frame(9)), frameDeltaMs = None)
    val snapped = Snap(single, source)
    assert(heads(snapped.getData(valsRequest)) == Seq(9.0, 9.0, 9.0))
  }

  test("TemporalAggregate regroups meta per bin (mode=meta)") {
    // daily bins: all three hourly frames of 2000-01-01 collapse into the
    // single day label → one group with all three metas (temporal.py:716-720)
    val day = TemporalAggregate(source, Some("D"), "sum")
    val req = valsRequest.copy(start = Some(T0.minusMillis(Hour)),
      stop = Some(T0.plusMillis(48 * Hour)))
    assert(day.getMetaGroups(req) ==
      Some(Seq((0 until 3).map(i => s"Testmeta for band $i"))))
    // hourly bins (closed=left): one source frame per label → singleton groups
    val hour = TemporalAggregate(source, Some("h"), "sum")
    assert(hour.getMetaGroups(valsRequest) ==
      Some(Seq(Seq("Testmeta for band 0"), Seq("Testmeta for band 1"),
        Seq("Testmeta for band 2"))))
    // frequency=None: the single period-end label carries every frame's meta
    val whole = TemporalAggregate(source, None, "sum")
    assert(whole.getMetaGroups(valsRequest) ==
      Some(Seq((0 until 3).map(i => s"Testmeta for band $i"))))
  }

  test("Cumulative accumulates meta within the bin (mode=meta)") {
    // frequency=None: growing prefixes (temporal.py:945-957)
    val cum = Cumulative(source, "sum", None)
    assert(cum.metaGroupsFor(source.allTimes) ==
      Some(Seq(Seq("Testmeta for band 0"),
        Seq("Testmeta for band 0", "Testmeta for band 1"),
        Seq("Testmeta for band 0", "Testmeta for band 1", "Testmeta for band 2"))))
    // 1:1 wrappers keep singleton groups
    assert(Shift(source, Hour).metaGroupsFor(source.allTimes.map(_.plusMillis(Hour))) ==
      Some((0 until 3).map(i => Seq(s"Testmeta for band $i"))))
  }

  test("Resample relabels to a frequency grid") {
    val shifted = source.copy(timeFirstMs = T0.toEpochMilli + 15 * 60000L)
    val rs = Resample(shifted, "h", "nearest")
    assert(rs.period.get == (T0, T0.plusMillis(2 * Hour)))
    val res = rs.getData(valsRequest).get
    assert(res.times == Seq(0, 1, 2).map(k => T0.plusMillis(k * Hour)))
    assert(heads(Some(res)) == Seq(1.0, 7.0, 255.0))
    // forward direction: period labels are the first labels *left* of the
    // source period endpoints (temporal.py:1104-1110)
    val fw = Resample(shifted, "h", "forward")
    assert(fw.period.get == (T0, T0.plusMillis(2 * Hour)))
  }
}
