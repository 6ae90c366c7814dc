package graft

import graft.raster._
import RasterFixtures._

/** The reference tests every operator against empty sources
  * (tests/conftest.py empty_source / nodata_source variants); this battery
  * asserts empty-in → empty-out (None) without crashes across the
  * operator families. */
class EmptySpec extends SparkSpec {

  private val e = emptySource

  test("metadata of empty sources") {
    assert(e.period.isEmpty && e.extent.isEmpty && e.allTimes.isEmpty)
    assert(e.getData(valsRequest).isEmpty)
  }

  test("elementwise over an empty source is empty") {
    assert(Add(e, 1).getData(valsRequest).isEmpty)
    assert(Add(e, source).period.isEmpty)
    assert(Add(e, source).getData(valsRequest).isEmpty)
    assert(FillNoData(Seq(e)).getData(valsRequest).isEmpty)
    assert(Log(e).getData(valsRequest).isEmpty)
  }

  test("misc/temporal/reduce over an empty source are empty") {
    assert(MaskBelow(e, 5).getData(valsRequest).isEmpty)
    assert(Classify(e, Seq(2.0)).getData(valsRequest).isEmpty)
    assert(TemporalAggregate(e, Some("D"), "sum").getData(valsRequest).isEmpty)
    assert(Cumulative(e).getData(valsRequest).isEmpty)
    assert(TemporalSum(e).getData(valsRequest).isEmpty)
    assert(Shift(e, 1000).getData(valsRequest).isEmpty)
    assert(Max(Seq(e)).getData(valsRequest).isEmpty)
    assert(Reduce(Seq(e, e), "mean").getData(valsRequest).isEmpty)
  }

  test("Snap/Resample with an empty store or index are empty") {
    assert(Snap(e, source).getData(valsRequest).isEmpty)
    assert(Snap(source, e).getData(valsRequest).isEmpty)
    assert(Resample(e, "h").period.isEmpty)
    assert(Resample(e, "h").getData(valsRequest).isEmpty)
  }

  test("Group of empty + non-empty serves the non-empty part") {
    val g = Group(Seq(e, source))
    assert(g.period == source.period)
    assert(g.getData(valsRequest).get.values.map(_.head).toSeq == Seq(1.0, 7.0, g.noDataValue))
    assert(Group(Seq(e, e)).getData(valsRequest).isEmpty)
  }

  test("new round-2 operators handle empty inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // empty pair set → empty cluster assignment (both strategies)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.pipeline.Dedup.duplicateClusters(noPairs).count() == 0)
    assert(graft.pipeline.Dedup.duplicateClusters(noPairs, driverPairLimit = 0L)
      .count() == 0)
    // sessionize over zero events → zero sessions
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("user_id", "ts", "event_id", "value")
    assert(graft.streaming.Sessionize.batch(noEvents, 30).count() == 0)
    // jaccard pairs over an empty corpus
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.pipeline.Dedup.jaccardPairs(noDocs, "doc_id", "text").count() == 0)
  }

  test("stencils over an empty source are empty") {
    assert(Dilate(e, Seq(1.0)).getData(valsRequest).isEmpty)
    assert(MovingMax(e, 3).getData(valsRequest).isEmpty)
    assert(Smooth(e, 1.0).getData(valsRequest).isEmpty)
  }
}
