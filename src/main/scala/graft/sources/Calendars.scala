package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated-calendar sources: the reference's "query" tasks that
  * enumerate files purely from a time axis and a path convention — no
  * listing needed.
  *
  * Reference: convml_data/sources/era5/pipeline.py:44-98 (hourly files
  * between t_start/t_end by path convention), ceres_geo/query.py:30-53
  * (hourly with a per-satellite phase offset — GOES-16 at :30, Meteosat
  * on the hour — and a known-missing-times blacklist, MISSING_TIMES
  * query.py:11), ceres_syn1deg_modis/query.py:23-38 (one daily physical
  * file = 24 hourly logical rows).
  *
  * Spark shape: `sequence(t0, t1, interval) + explode` — rows materialize
  * lazily and distribute; the blacklist is a broadcast anti-join. On a
  * real deployment the emitted `path` column feeds `binaryFile` scans or
  * a staging fetch (S2/S4/S6 stay outside the engine per SURVEY §7.1.3).
  */
object Calendars {

  /** Hourly timeline [t0, t1] with a minute phase offset. */
  def hourly(spark: SparkSession, t0: String, t1: String, phaseMinutes: Int = 0): DataFrame =
    spark.sql(
      s"""SELECT explode(sequence(
         |  timestamp'$t0' + interval $phaseMinutes minutes,
         |  timestamp'$t1',
         |  interval 1 hour)) AS time""".stripMargin)

  /** ERA5-style path convention
    * (`ecmwf-era5_oper_an_{levtype}_{yyyyMMddHHmm}.{var}.nc`,
    * era5/pipeline.py:14-41). */
  def era5Path(time: Column, levtype: String, variable: String): Column =
    concat(lit(s"ecmwf-era5_oper_an_${levtype}_"),
      date_format(time, "yyyyMMddHHmm"), lit(s".$variable.nc"))

  /** Inverse codec: parse (time, levtype, variable) back out of a path. */
  def parseEra5Path(path: Column): (Column, Column, Column) = (
    to_timestamp(regexp_extract(path, "_an_[a-z]+_([0-9]{12})\\.", 1), "yyyyMMddHHmm"),
    regexp_extract(path, "_an_([a-z]+)_[0-9]{12}\\.", 1),
    regexp_extract(path, "\\.([a-z0-9_]+)\\.nc$", 1))

  /** C3: channel shorthand `bt_13` -> (channel 13, kind "bt")
    * (goes16/utils.py:58-76). */
  def parseChannelShorthand(c: Column): (Column, Column) = (
    split(c, "_").getItem(1).cast("long"),
    split(c, "_").getItem(0))

  /** ceres_geo-style calendar: hourly at a satellite phase offset with a
    * missing-times blacklist removed via broadcast anti-join. */
  def ceresGeoCalendar(spark: SparkSession, t0: String, t1: String,
      phaseMinutes: Int, missing: Seq[String]): DataFrame = {
    val cal = hourly(spark, t0, t1, phaseMinutes)
    if (missing.isEmpty) cal
    else {
      import spark.implicits._
      val black = missing.toDF("mt").select(to_timestamp(col("mt")).as("time"))
      cal.join(broadcast(black), Seq("time"), "left_anti")
    }
  }

  /** SYN1deg-style: one physical daily file -> 24 hourly logical rows. */
  def dailyFileToHourlyRows(dailyFiles: DataFrame, dayCol: String): DataFrame =
    dailyFiles
      .withColumn("hour_of_day", explode(sequence(lit(0), lit(23))))
      .withColumn("time", expr(s"timestampadd(HOUR, hour_of_day, $dayCol)"))
}
