package graft.raster

import java.time._
import java.time.temporal.TemporalAdjusters

/** Re-implementation of the pandas resampling bin/label rules used by the
  * reference temporal blocks (dask_geomodeling/raster/temporal.py:258-473)
  * on `java.time`.
  *
  * Semantics were derived from the pandas documentation and validated
  * empirically against pandas resample() for h/min/s/D/W/MS/ME/QS/QE/YS/YE ×
  * closed × label × timezone grids:
  *  - fixed frequencies (s/min/h) bin by real duration anchored at the local
  *    midnight of the timestamp's own day (pandas origin="start_day");
  *  - D bins are local calendar days (DST-aware);
  *  - W/ME/QE/YE ("end" anchored types) bin by local calendar date — their
  *    bin edges sit at end-of-day, so at ms granularity membership is by
  *    date; weekly closed="left" shifts an anchor-day date into the *next*
  *    week (verified against pandas);
  *  - MS/QS/YS edges sit exactly at period-start midnight and respect
  *    `closed`;
  *  - end-anchored types default closed/label to "right", all others to
  *    "left" (temporal.py:352-370).
  */
sealed trait Freq extends Serializable {
  def endType: Boolean
  def timeDeltaMs: Option[Long]

  /** The label of the bin that `t` falls into. */
  def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant

  /** Shift a label by ±1 frequency step. */
  def next(label: Instant, zone: ZoneId): Instant
  def prev(label: Instant, zone: ZoneId): Instant

  final def shiftInt(t: Instant, k: Int, zone: ZoneId): Instant = {
    var r = t
    var i = 0
    while (i < math.abs(k)) { r = if (k > 0) next(r, zone) else prev(r, zone); i += 1 }
    r
  }

  /** Shift with fractional step counts (temporal.py:298-319): interpolate
    * linearly between the two enclosing integer shifts. */
  final def shiftFrac(t: Instant, n: Double, zone: ZoneId): Instant = {
    if (n == math.rint(n)) shiftInt(t, n.toInt, zone)
    else {
      val k = math.floor(n).toInt
      val a = shiftInt(t, k, zone)
      val b = shiftInt(t, k + 1, zone)
      val frac = n - k
      Instant.ofEpochMilli(
        a.toEpochMilli + math.round((b.toEpochMilli - a.toEpochMilli) * frac))
    }
  }

  /** All labels from `start` to `stop` inclusive (pd.date_range on labels). */
  final def range(start: Instant, stop: Instant, zone: ZoneId): Seq[Instant] = {
    val buf = Seq.newBuilder[Instant]
    var cur = start
    var guard = 0
    while (!cur.isAfter(stop) && guard < 2000000) { buf += cur; cur = next(cur, zone); guard += 1 }
    buf.result()
  }

  /** Label closest to `dt`, optionally restricted to one side
    * (_get_closest_label, temporal.py:325-351). */
  final def closestLabel(dt: Instant, zone: ZoneId, side: String = "both"): Instant = {
    val base = binLabel(dt, "left", "left", zone)
    val candidates = Seq(prev(base, zone), base, next(base, zone), next(next(base, zone), zone))
    val filtered = side match {
      case "right" => candidates.filter(c => !c.isBefore(dt))
      case "left"  => candidates.filter(c => !c.isAfter(dt))
      case _       => candidates
    }
    filtered.minBy(c => (math.abs(c.toEpochMilli - dt.toEpochMilli), c.toEpochMilli))
  }

  /** Default closed/label sides (_default_closed_label, temporal.py:352-370). */
  final def defaults(closed: Option[String], label: Option[String]): (String, String) = {
    val d = if (endType) "right" else "left"
    (closed.getOrElse(d), label.getOrElse(d))
  }
}

object Freq {

  /** Parse a pandas offset alias, accepting pre-2.2 spellings
    * (normalize_offset, reference utils.py:979-1010). */
  def parse(s: String): Freq = {
    val m = "^(\\d*)([A-Za-z-]+)$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse frequency '$s'"))
    val n = if (m.group(1).isEmpty) 1 else m.group(1).toInt
    val unit = m.group(2)
    def one(f: Freq): Freq = {
      require(n == 1, s"multiples of '$unit' are not supported")
      f
    }
    unit match {
      case "ms"              => FixedFreq(n.toLong)
      case "s" | "S"         => FixedFreq(n * 1000L)
      case "min" | "T"       => FixedFreq(n * 60000L)
      case "h" | "H"         => FixedFreq(n * 3600000L)
      case "D" | "d"         => one(DayFreq)
      case "W"               => one(WeekFreq(DayOfWeek.SUNDAY))
      case w if w.startsWith("W-") =>
        one(WeekFreq(DayOfWeek.valueOf(dayName(w.drop(2)))))
      case "ME" | "M"        => one(MonthFreq(end = true))
      case "MS"              => one(MonthFreq(end = false))
      case "QE" | "Q"        => one(QuarterFreq(end = true))
      case "QS"              => one(QuarterFreq(end = false))
      case "YE" | "Y" | "A"  => one(YearFreq(end = true))
      case "YS" | "AS"       => one(YearFreq(end = false))
      // month-anchored quarterly/yearly aliases (pre-2.2 spellings kept)
      case Anchored(base, mon) =>
        val m = monthNum(mon)
        base match {
          case "QE" | "Q"       => one(QuarterFreq(end = true, m))
          case "QS"             => one(QuarterFreq(end = false, m))
          case "YE" | "Y" | "A" => one(YearFreq(end = true, m))
          case "YS" | "AS"      => one(YearFreq(end = false, m))
        }
      case other => throw new IllegalArgumentException(s"unsupported frequency '$other'")
    }
  }

  private val Anchored = "^(QE|QS|Q|YE|YS|Y|A|AS)-([A-Za-z]{3})$".r

  private def dayName(abbr: String): String = abbr.toUpperCase match {
    case "MON" => "MONDAY"; case "TUE" => "TUESDAY"; case "WED" => "WEDNESDAY"
    case "THU" => "THURSDAY"; case "FRI" => "FRIDAY"; case "SAT" => "SATURDAY"
    case "SUN" => "SUNDAY"
    case other => throw new IllegalArgumentException(s"unknown weekday '$other'")
  }

  private def monthNum(abbr: String): Int = abbr.toUpperCase match {
    case "JAN" => 1; case "FEB" => 2; case "MAR" => 3; case "APR" => 4
    case "MAY" => 5; case "JUN" => 6; case "JUL" => 7; case "AUG" => 8
    case "SEP" => 9; case "OCT" => 10; case "NOV" => 11; case "DEC" => 12
    case other => throw new IllegalArgumentException(s"unknown month '$other'")
  }

  private[raster] def midnight(d: LocalDate, zone: ZoneId): Instant =
    d.atStartOfDay(zone).toInstant
  private[raster] def localDate(t: Instant, zone: ZoneId): LocalDate =
    t.atZone(zone).toLocalDate
}

/** Sub-day fixed frequencies (s/min/h), anchored at the local midnight of
  * the timestamp's own day (pandas origin="start_day"). */
case class FixedFreq(ms: Long) extends Freq {
  require(86400000L % ms == 0,
    s"sub-day frequency must divide a day evenly (got $ms ms)")
  override def endType: Boolean = false
  override def timeDeltaMs: Option[Long] = Some(ms)

  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    val mid = Freq.midnight(Freq.localDate(t, zone), zone).toEpochMilli
    val off = t.toEpochMilli - mid
    val k = if (closed == "right") Math.floorDiv(off - 1, ms) else Math.floorDiv(off, ms)
    val binStart = mid + k * ms
    Instant.ofEpochMilli(if (label == "right") binStart + ms else binStart)
  }
  override def next(label: Instant, zone: ZoneId): Instant = label.plusMillis(ms)
  override def prev(label: Instant, zone: ZoneId): Instant = label.minusMillis(ms)
}

/** Calendar days in the target timezone (DST-aware). */
case object DayFreq extends Freq {
  override def endType: Boolean = false
  override def timeDeltaMs: Option[Long] = Some(86400000L)
  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    var d = Freq.localDate(t, zone)
    if (closed == "right" && t == Freq.midnight(d, zone)) d = d.minusDays(1)
    Freq.midnight(if (label == "right") d.plusDays(1) else d, zone)
  }
  override def next(label: Instant, zone: ZoneId): Instant =
    label.atZone(zone).plusDays(1).toInstant
  override def prev(label: Instant, zone: ZoneId): Instant =
    label.atZone(zone).minusDays(1).toInstant
}

/** Weekly, anchored on `anchor` (default W-SUN); an "end" type. */
case class WeekFreq(anchor: DayOfWeek) extends Freq {
  override def endType: Boolean = true
  override def timeDeltaMs: Option[Long] = Some(7 * 86400000L)
  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    val d = Freq.localDate(t, zone)
    val endDate =
      if (closed == "left") d.`with`(TemporalAdjusters.next(anchor))
      else d.`with`(TemporalAdjusters.nextOrSame(anchor))
    Freq.midnight(if (label == "left") endDate.minusDays(7) else endDate, zone)
  }
  override def next(label: Instant, zone: ZoneId): Instant =
    label.atZone(zone).plusDays(7).toInstant
  override def prev(label: Instant, zone: ZoneId): Instant =
    label.atZone(zone).minusDays(7).toInstant
}

/** Month start/end. End type bins by local calendar month (edges at
  * end-of-day); start type has exact midnight edges respecting `closed`. */
case class MonthFreq(end: Boolean) extends Freq {
  override def endType: Boolean = end
  override def timeDeltaMs: Option[Long] = None

  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    val date = Freq.localDate(t, zone)
    var d = date.withDayOfMonth(1)
    if (!end && closed == "right" && t == Freq.midnight(d, zone)) d = d.minusMonths(1)
    if (end) {
      // closed="left": the boundary DATE itself belongs to the next bin
      // (verified against pandas; same rule WeekFreq always had)
      if (closed == "left" && date == d.`with`(TemporalAdjusters.lastDayOfMonth))
        d = d.plusMonths(1)
      val eom = d.`with`(TemporalAdjusters.lastDayOfMonth)
      Freq.midnight(if (label == "left") d.minusDays(1) else eom, zone)
    } else {
      Freq.midnight(if (label == "right") d.plusMonths(1) else d, zone)
    }
  }
  override def next(label: Instant, zone: ZoneId): Instant = step(label, zone, 1)
  override def prev(label: Instant, zone: ZoneId): Instant = step(label, zone, -1)
  private def step(label: Instant, zone: ZoneId, n: Int): Instant = {
    val d = Freq.localDate(label, zone)
    if (end)
      Freq.midnight(d.withDayOfMonth(1).plusMonths(n).`with`(TemporalAdjusters.lastDayOfMonth), zone)
    else Freq.midnight(d.plusMonths(n), zone)
  }
}

/** Quarterly, optionally month-anchored (pandas `QE-<MON>`/`QS-<MON>`):
  * quarter boundary months are ≡ `anchorMonth` (mod 3). `QE` ≡ `QE-DEC`
  * (ends Mar/Jun/Sep/Dec), `QS` ≡ `QS-JAN` (starts Jan/Apr/Jul/Oct);
  * `QE-JAN` ends Jan/Apr/Jul/Oct, etc. */
case class QuarterFreq(end: Boolean, anchorMonth: Int = 0) extends Freq {
  require(anchorMonth >= 0 && anchorMonth <= 12, s"bad anchor month $anchorMonth")
  override def endType: Boolean = end
  override def timeDeltaMs: Option[Long] = None
  // default anchors match pandas: QE-DEC, QS-JAN
  private val anchor = if (anchorMonth != 0) anchorMonth else if (end) 12 else 1
  private def idx(d: LocalDate): Int = d.getYear * 12 + d.getMonthValue - 1
  private def monthStart(i: Int): LocalDate =
    LocalDate.of(Math.floorDiv(i, 12), Math.floorMod(i, 12) + 1, 1)
  private val rem = Math.floorMod(anchor - 1, 3)
  /** First day of the quarter containing month index `i`: for the end type
    * the quarter ENDS at the next boundary month ≥ i; for the start type it
    * STARTS at the last boundary month ≤ i. */
  private def quarterStart(d: LocalDate): LocalDate = {
    val i = idx(d)
    if (end) monthStart(i + Math.floorMod(rem - i, 3) - 2)
    else monthStart(i - Math.floorMod(i - rem, 3))
  }

  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    val d = Freq.localDate(t, zone)
    var qs = quarterStart(d)
    if (!end && closed == "right" && t == Freq.midnight(qs, zone)) qs = qs.minusMonths(3)
    if (end) {
      // closed="left": a quarter-end DATE belongs to the next quarter
      if (closed == "left" && d == qs.plusMonths(3).minusDays(1)) qs = qs.plusMonths(3)
      val qe = qs.plusMonths(3).minusDays(1)
      Freq.midnight(if (label == "left") qs.minusDays(1) else qe, zone)
    } else {
      Freq.midnight(if (label == "right") qs.plusMonths(3) else qs, zone)
    }
  }
  override def next(label: Instant, zone: ZoneId): Instant = step(label, zone, 1)
  override def prev(label: Instant, zone: ZoneId): Instant = step(label, zone, -1)
  private def step(label: Instant, zone: ZoneId, n: Int): Instant = {
    val d = Freq.localDate(label, zone)
    if (end) {
      val qs = quarterStart(d.plusDays(1)) // start of the quarter after the label
      Freq.midnight(qs.plusMonths(3L * n).minusDays(1), zone)
    } else Freq.midnight(quarterStart(d).plusMonths(3L * n), zone)
  }
}

/** Yearly, optionally month-anchored (pandas `YE-<MON>`/`YS-<MON>`): the
  * year ends at the last day of `anchorMonth` (end type) or starts at its
  * first day (start type). `YE` ≡ `YE-DEC`, `YS` ≡ `YS-JAN`. */
case class YearFreq(end: Boolean, anchorMonth: Int = 0) extends Freq {
  require(anchorMonth >= 0 && anchorMonth <= 12, s"bad anchor month $anchorMonth")
  override def endType: Boolean = end
  override def timeDeltaMs: Option[Long] = None
  private val anchor = if (anchorMonth != 0) anchorMonth else if (end) 12 else 1

  override def binLabel(t: Instant, closed: String, label: String, zone: ZoneId): Instant = {
    val d = Freq.localDate(t, zone)
    if (end) {
      // the year ends at the last day of the next anchor month (inclusive)
      var yEnd = if (d.getMonthValue <= anchor) d.getYear else d.getYear + 1
      // last-of-month computed per year (minusYears would clamp Feb 29→28)
      def monthEnd(y: Int) =
        LocalDate.of(y, anchor, 1).`with`(TemporalAdjusters.lastDayOfMonth)
      // closed="left": the year-end DATE belongs to the next year
      if (closed == "left" && d == monthEnd(yEnd)) yEnd += 1
      Freq.midnight(monthEnd(if (label == "left") yEnd - 1 else yEnd), zone)
    } else {
      var ys = LocalDate.of(
        if (d.getMonthValue >= anchor) d.getYear else d.getYear - 1, anchor, 1)
      if (closed == "right" && t == Freq.midnight(ys, zone)) ys = ys.minusYears(1)
      Freq.midnight(if (label == "right") ys.plusYears(1) else ys, zone)
    }
  }
  override def next(label: Instant, zone: ZoneId): Instant = step(label, zone, 1)
  override def prev(label: Instant, zone: ZoneId): Instant = step(label, zone, -1)
  private def step(label: Instant, zone: ZoneId, n: Int): Instant = {
    val d = Freq.localDate(label, zone)
    if (end) Freq.midnight(LocalDate.of(d.getYear + n, anchor, 1)
      .`with`(TemporalAdjusters.lastDayOfMonth), zone)
    else Freq.midnight(LocalDate.of(d.getYear + n, anchor, 1), zone)
  }
}
