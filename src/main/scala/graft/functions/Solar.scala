package graft.functions

import graft.core.Projection.{DegPerRad, RadPerDeg}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solar-geometry scalar functions, built purely from Spark's codegen'd
  * trig/date built-ins (no UDFs — these stay inside whole-stage codegen).
  *
  * Reference: convml_data/utils/time_filters.py:29-32 (N_hours_from_zenith
  * filter) and convml_data/sources/ceres_geo/sw_flux.py:15-80 /
  * derived_variables.py:7-24 (declination, elevation, TOA fluxes). The
  * formulas themselves are standard textbook solar geometry.
  *
  * Deg<->rad conversions use explicit literal factors (not `radians()`/
  * `degrees()`) so DuckDB-oracle comparisons see identical FP ops — see
  * graft.core.Projection's class doc for why.
  */
object Solar {
  val TwoPi: Double = 6.283185307179586
  val S0: Double = 1361.0

  /** Local solar hour in [0, 24): UTC clock hour shifted by lon/15 deg/h.
    * (lon+360) keeps the dividend positive so a single `%` (fmod) suffices
    * — identical FP behaviour across engines.
    */
  def solarHour(ts: Column, lonDeg: Column): Column =
    (hour(ts).cast("double") + minute(ts).cast("double") / 60.0
      + (lonDeg.cast("double") + 360.0) / 15.0) % 24.0

  /** |hours from local solar noon|; always <= 12 so no wraparound term. */
  def hoursFromZenith(ts: Column, lonDeg: Column): Column =
    abs(solarHour(ts, lonDeg) - 12.0)

  /** F3: keep rows within `maxHours` of local solar zenith
    * (utils/time_filters.py:29-32). */
  def withinHoursOfZenith(ts: Column, lonDeg: Column, maxHours: Double): Column =
    hoursFromZenith(ts, lonDeg) <= maxHours

  /** Solar declination (deg): 23.45 sin(2π (284+doy)/365)
    * (ceres_geo/sw_flux.py:15-38 public formula). */
  def declinationDeg(ts: Column): Column =
    lit(23.45) * sin(lit(TwoPi) * (lit(284.0) + dayofyear(ts).cast("double")) / 365.0)

  /** Solar elevation angle (deg) from declination, latitude, hour angle. */
  def elevationDeg(ts: Column, latDeg: Column, lonDeg: Column): Column = {
    val decl = declinationDeg(ts) * RadPerDeg
    val lat = latDeg.cast("double") * RadPerDeg
    val hourAngle = (solarHour(ts, lonDeg) - 12.0) * 15.0 * RadPerDeg
    asin(sin(lat) * sin(decl) + cos(lat) * cos(decl) * cos(hourAngle)) * DegPerRad
  }

  /** TOA incoming shortwave S0*sin(elev), clamped at 0 (night)
    * (ceres_geo/sw_flux.py:41-60). */
  def toaIncomingSw(ts: Column, latDeg: Column, lonDeg: Column): Column =
    greatest(lit(0.0), lit(S0) * sin(elevationDeg(ts, latDeg, lonDeg) * RadPerDeg))
}
