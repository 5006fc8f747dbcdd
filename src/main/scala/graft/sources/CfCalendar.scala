package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Non-standard CF calendars (CF §4.4.1): `360_day`, `noleap`/
  * `365_day`, `all_leap`/`366_day` — the fixed-length-year calendars
  * climate models emit (CMIP-adjacent aux products in the reference's
  * xarray open path, convml-data utils/luigi.py:29-47, decode through
  * cftime). Their dates are NOT Gregorian instants — `2000-02-30`
  * exists in `360_day` and no TIMESTAMP can carry it — so, exactly
  * like cftime/xarray, this surface decodes to CALENDAR DATETIMES
  * (rendered `"YYYY-MM-DD HH:MM:SS"`, cftime's str()) rather than
  * TIMESTAMP, and maps calendar-datetime bounds onto numeric
  * coordinate ranges so a time crop prunes chunks like any bbox.
  * [[CfTime]] keeps refusing these calendars on its TIMESTAMP path;
  * this is the explicit, correctly-typed route. Calendars beyond the
  * fixed-length three (julian, proleptic mixes) still refuse loudly.
  *
  * All date arithmetic is closed-form: every year has the same
  * `monthLengths`, so day numbers are `y * yearDays + cumDays(m-1) +
  * (d-1)` and the inverse is integer division — no leap rules.
  */
object CfCalendar {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"cf calendar: $msg")

  private final case class Cal(name: String, monthLengths: IndexedSeq[Int]) {
    val yearDays: Int = monthLengths.sum
    /** cumDays(k) = days before month k+1 (13 entries, 0 .. yearDays). */
    val cumDays: IndexedSeq[Int] = monthLengths.scanLeft(0)(_ + _)
  }

  private val NoLeapMonths = IndexedSeq(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val AllLeapMonths = IndexedSeq(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private val cals: Map[String, Cal] = Map(
    "360_day" -> Cal("360_day", IndexedSeq.fill(12)(30)),
    "noleap" -> Cal("noleap", NoLeapMonths),
    "365_day" -> Cal("noleap", NoLeapMonths),
    "all_leap" -> Cal("all_leap", AllLeapMonths),
    "366_day" -> Cal("all_leap", AllLeapMonths))

  def supported(calendar: String): Boolean =
    cals.contains(calendar.toLowerCase)

  private def calOf(calendar: String): Cal =
    cals.getOrElse(calendar.toLowerCase,
      fail(s"calendar '$calendar' unsupported (360_day, noleap/365_day, " +
        "all_leap/366_day here; standard/gregorian -> CfTime)"))

  private val MicrosPerDay = 86400000000L

  /** Micros since the calendar's year-0 origin of a (y, m, d, hh, mm,
    * ss, microsOfSecond) calendar datetime. */
  private def toMicros(c: Cal, y: Int, m: Int, d: Int, hh: Int, mm: Int,
      ss: Int, us: Long): Long = {
    if (m < 1 || m > 12) fail(s"month $m out of range")
    if (d < 1 || d > c.monthLengths(m - 1))
      fail(s"day $d out of range for month $m of calendar ${c.name}")
    // parseInstant's regex admits any two-digit field; without these a
    // typo'd bound like 36:70:00 would silently roll into later days
    // (cftime rejects it) and a crop would select the wrong window
    if (hh < 0 || hh > 23) fail(s"hour $hh out of range")
    if (mm < 0 || mm > 59) fail(s"minute $mm out of range")
    if (ss < 0 || ss > 59) fail(s"second $ss out of range")
    val day = y.toLong * c.yearDays + c.cumDays(m - 1) + (d - 1)
    day * MicrosPerDay + ((hh * 60L + mm) * 60L + ss) * 1000000L + us
  }

  private def fromMicros(c: Cal, micros: Long): (Int, Int, Int, Int, Int, Int, Long) = {
    val day = Math.floorDiv(micros, MicrosPerDay)
    val rem = micros - day * MicrosPerDay
    val y = Math.floorDiv(day, c.yearDays.toLong)
    val doy = (day - y * c.yearDays).toInt
    // cumDays(k) = days before month k+1, so the month containing doy
    // is the LAST k (0-based) with cumDays(k) <= doy, plus one
    val m = c.cumDays.take(12).lastIndexWhere(_ <= doy) + 1
    val d = doy - c.cumDays(m - 1) + 1
    val secs = rem / 1000000L
    ((y.toLong).toInt, m, d, (secs / 3600).toInt, (secs / 60 % 60).toInt,
      (secs % 60).toInt, rem % 1000000L)
  }

  /** cftime's str() rendering (sub-second truncated; the decode paths
    * only ever see whole-micro values). */
  private def render(t: (Int, Int, Int, Int, Int, Int, Long)): String =
    f"${t._1}%04d-${t._2}%02d-${t._3}%02d ${t._4}%02d:${t._5}%02d:${t._6}%02d"

  /** Parse a calendar instant `"Y-M-D[ h:m[:s[.f]]]"`. Calendar
    * datetimes are zone-naive (cftime's model) — a trailing `Z` is
    * tolerated, any other offset refuses. */
  private[sources] def parseInstant(c: Cal, s: String): Long = {
    val re = ("^(-?\\d{1,6})-(\\d{1,2})-(\\d{1,2})" +
      "(?:[ T](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.(\\d{1,9}))?)?)?" +
      "(Z)?$").r
    s.trim match {
      case re(y, mo, d, h, mi, sec, frac, _) =>
        val us = Option(frac)
          .map(f => (f.padTo(6, '0').take(6)).toLong).getOrElse(0L)
        toMicros(c, y.toInt, mo.toInt, d.toInt,
          Option(h).map(_.toInt).getOrElse(0),
          Option(mi).map(_.toInt).getOrElse(0),
          Option(sec).map(_.toInt).getOrElse(0), us)
      case _ => fail(s"cannot parse calendar instant '$s' " +
        "(zone offsets are meaningless in model calendars)")
    }
  }

  /** (epoch micros since the calendar origin, micros per step) for
    * `units` under `calendar`. */
  def parseUnits(units: String, calendar: String): (Long, Long) = {
    val c = calOf(calendar)
    val (step, instant) = CfTime.splitUnits(units)
    (parseInstant(c, instant), step)
  }

  /** Calendar-datetime bounds -> the numeric coordinate range for a
    * value crop ([[CoordCrop]]'s input) — the non-Gregorian analogue
    * of [[CfTime.numericRange]]. */
  def numericRange(units: String, calendar: String, t0: String,
      t1: String): (Double, Double) = {
    val c = calOf(calendar)
    val (epoch, step) = parseUnits(units, calendar)
    def num(t: String): Double = (parseInstant(c, t) - epoch).toDouble / step
    (num(t0), num(t1))
  }

  /** Numeric coordinate value -> rendered calendar datetime (driver
    * side; single-value convenience over [[datetimeStrings]]). */
  def datetimeString(units: String, calendar: String, value: Double): String =
    datetimeStrings(units, calendar, Array(value)).head

  /** Bulk render: units/calendar parse ONCE (two regex parses), then
    * every coordinate renders from the precomputed (epoch, step, Cal) —
    * the decode paths map up to 1M coordinates through this driver-side
    * and must not re-parse per element. */
  def datetimeStrings(units: String, calendar: String,
      values: Array[Double]): Array[String] = {
    val c = calOf(calendar)
    val (epoch, step) = parseUnits(units, calendar)
    values.map(v => render(fromMicros(c, epoch + math.round(v * step))))
  }

  /** Column decode for a mount dimension: the coordinate VALUES become
    * rendered calendar datetimes via a literal lookup (KB-scale axes,
    * same shape as [[CfTime.timestampFromValues]]); an out-of-axis dim
    * value decodes to null. */
  def datetimeFromValues(dimCol: Column, units: String, calendar: String,
      coords: Array[Double]): Column = {
    require(coords.length <= 1000000,
      s"coordinate axis of ${coords.length} values is beyond the literal " +
        "decode path")
    try_element_at(typedlit(datetimeStrings(units, calendar, coords)),
      dimCol.cast("int") + 1)
  }
}
