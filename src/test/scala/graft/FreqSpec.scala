package graft

import java.time.{DayOfWeek, Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite
import graft.raster._

/** Golden tests for the pandas bin/label rules, values generated with
  * pandas.Series.resample (see the probe grid in the reference tests,
  * tests/test_raster_temporal.py:78-203). */
class FreqSpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")
  private val ams = ZoneId.of("Europe/Amsterdam")
  private def i(s: String): Instant = Instant.parse(s)

  test("ME bins by calendar month; default right/right") {
    val f = Freq.parse("ME")
    assert(f.binLabel(i("2000-01-31T00:00:00Z"), "right", "right", utc) == i("2000-01-31T00:00:00Z"))
    assert(f.binLabel(i("2000-01-31T10:00:00Z"), "right", "right", utc) == i("2000-01-31T00:00:00Z"))
    assert(f.binLabel(i("2000-02-01T00:00:00Z"), "right", "right", utc) == i("2000-02-29T00:00:00Z"))
    assert(f.binLabel(i("2000-01-15T00:00:00Z"), "right", "left", utc) == i("1999-12-31T00:00:00Z"))
    // Amsterdam: 2000-01-31T23:30Z is already Feb 1 local
    assert(f.binLabel(i("2000-01-31T23:30:00Z"), "right", "right", ams) ==
      i("2000-02-29T00:00:00Z").minusMillis(3600000))
  }

  test("MS bins with exact midnight edges respecting closed") {
    val f = Freq.parse("MS")
    assert(f.binLabel(i("2000-01-01T00:00:00Z"), "left", "left", utc) == i("2000-01-01T00:00:00Z"))
    assert(f.binLabel(i("2000-01-01T00:00:00Z"), "right", "left", utc) == i("1999-12-01T00:00:00Z"))
    assert(f.binLabel(i("2000-02-01T00:00:00Z"), "right", "left", utc) == i("2000-01-01T00:00:00Z"))
    assert(f.binLabel(i("2000-01-15T00:00:00Z"), "right", "left", utc) == i("2000-01-01T00:00:00Z"))
  }

  test("W-SUN: closed=right by date; closed=left pushes anchor day to next week") {
    val f = Freq.parse("W")
    // 2000-01-02 is a Sunday
    assert(f.binLabel(i("2000-01-02T00:00:00Z"), "right", "right", utc) == i("2000-01-02T00:00:00Z"))
    assert(f.binLabel(i("2000-01-02T10:00:00Z"), "right", "right", utc) == i("2000-01-02T00:00:00Z"))
    assert(f.binLabel(i("2000-01-03T00:00:00Z"), "right", "right", utc) == i("2000-01-09T00:00:00Z"))
    assert(f.binLabel(i("2000-01-02T00:00:00Z"), "left", "right", utc) == i("2000-01-09T00:00:00Z"))
    assert(f.binLabel(i("2000-01-03T00:00:00Z"), "right", "left", utc) == i("2000-01-02T00:00:00Z"))
    assert(Freq.parse("W-MON") == WeekFreq(DayOfWeek.MONDAY))
  }

  test("D bins are local days, DST/timezone aware") {
    val f = Freq.parse("D")
    assert(f.binLabel(i("2000-01-02T00:00:00Z"), "left", "left", utc) == i("2000-01-02T00:00:00Z"))
    assert(f.binLabel(i("2000-01-02T00:00:00Z"), "right", "left", utc) == i("2000-01-01T00:00:00Z"))
    assert(f.binLabel(i("2000-01-02T10:00:00Z"), "right", "left", utc) == i("2000-01-02T00:00:00Z"))
    // Amsterdam (+01:00 in winter): 22:00Z is still Jan 1 local; 23:30Z is Jan 2 local
    assert(f.binLabel(i("2000-01-01T22:00:00Z"), "left", "left", ams) == i("1999-12-31T23:00:00Z"))
    assert(f.binLabel(i("2000-01-01T23:30:00Z"), "left", "left", ams) == i("2000-01-02T00:00:00Z").minusMillis(3600000))
  }

  test("h bins: fixed duration, closed/label sides") {
    val f = Freq.parse("h")
    assert(f.binLabel(i("2000-01-02T10:00:00Z"), "left", "left", utc) == i("2000-01-02T10:00:00Z"))
    assert(f.binLabel(i("2000-01-02T10:00:00Z"), "right", "left", utc) == i("2000-01-02T09:00:00Z"))
    assert(f.binLabel(i("2000-01-02T10:30:00Z"), "right", "left", utc) == i("2000-01-02T10:00:00Z"))
    assert(f.binLabel(i("2000-01-02T10:30:00Z"), "left", "right", utc) == i("2000-01-02T11:00:00Z"))
  }

  test("QE/YE/QS/YS labels") {
    assert(Freq.parse("QE").binLabel(i("2000-02-15T00:00:00Z"), "right", "right", utc) == i("2000-03-31T00:00:00Z"))
    assert(Freq.parse("YE").binLabel(i("2000-02-15T00:00:00Z"), "right", "right", utc) == i("2000-12-31T00:00:00Z"))
    assert(Freq.parse("QS").binLabel(i("2000-02-15T00:00:00Z"), "left", "left", utc) == i("2000-01-01T00:00:00Z"))
    assert(Freq.parse("YS").binLabel(i("2000-02-15T00:00:00Z"), "left", "left", utc) == i("2000-01-01T00:00:00Z"))
  }

  test("range and next/prev traverse labels") {
    val me = Freq.parse("ME")
    assert(me.range(i("2000-01-31T00:00:00Z"), i("2000-04-30T00:00:00Z"), utc).map(_.toString) ==
      Seq("2000-01-31T00:00:00Z", "2000-02-29T00:00:00Z", "2000-03-31T00:00:00Z", "2000-04-30T00:00:00Z"))
    val qe = Freq.parse("QE")
    assert(qe.next(i("2000-03-31T00:00:00Z"), utc) == i("2000-06-30T00:00:00Z"))
    assert(qe.prev(i("2000-03-31T00:00:00Z"), utc) == i("1999-12-31T00:00:00Z"))
  }

  test("pandas golden grid: anchored QE-/QS-/YE-/YS- aliases and end-type closed=left") {
    // Every line was produced by pandas.Series.resample on the driver's
    // pandas (freq|closed|label|ts|expected_label) — 480 combinations over
    // 10 frequencies including the month-anchored quarterly/yearly aliases
    // and boundary-date timestamps that pin the closed="left" shift.
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/freq_pandas_goldens.txt"), "UTF-8")
    val lines = try src.getLines().filter(_.nonEmpty).toSeq finally src.close()
    assert(lines.size == 480)
    var checked = 0
    for (line <- lines) {
      val Array(fs, c, l, ts, want) = line.split('|')
      val f = Freq.parse(fs)
      val got = f.binLabel(i(ts), c, l, utc)
      assert(got == i(want), s"$fs closed=$c label=$l t=$ts: got $got want $want")
      checked += 1
    }
    assert(checked == 480)
  }

  test("anchored parse dispatch and label stepping") {
    assert(Freq.parse("QE-JAN") == QuarterFreq(end = true, 1))
    assert(Freq.parse("QS-FEB") == QuarterFreq(end = false, 2))
    assert(Freq.parse("YE-JUN") == YearFreq(end = true, 6))
    assert(Freq.parse("YS-APR") == YearFreq(end = false, 4))
    assert(Freq.parse("A-SEP") == YearFreq(end = true, 9)) // pre-2.2 alias
    // stepping stays on the anchored grid, leap-safe
    val qeFeb = Freq.parse("QE-FEB")
    assert(qeFeb.next(i("2000-02-29T00:00:00Z"), utc) == i("2000-05-31T00:00:00Z"))
    assert(qeFeb.prev(i("2000-02-29T00:00:00Z"), utc) == i("1999-11-30T00:00:00Z"))
    val yeFeb = Freq.parse("YE-FEB")
    assert(yeFeb.next(i("2000-02-29T00:00:00Z"), utc) == i("2001-02-28T00:00:00Z"))
    assert(yeFeb.prev(i("2001-02-28T00:00:00Z"), utc) == i("2000-02-29T00:00:00Z"))
    val ysApr = Freq.parse("YS-APR")
    assert(ysApr.next(i("2000-04-01T00:00:00Z"), utc) == i("2001-04-01T00:00:00Z"))
  }

  test("legacy aliases normalize") {
    assert(Freq.parse("H") == FixedFreq(3600000))
    assert(Freq.parse("15T") == FixedFreq(900000))
    assert(Freq.parse("M") == MonthFreq(end = true))
    assert(Freq.parse("A") == YearFreq(end = true))
  }
}
