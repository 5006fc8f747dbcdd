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

  /** C3: product shorthand `multichannel__bt_13__bt_14` -> array of
    * (channel, prefix) structs (goes16/utils.py:68-76,
    * parse_product_shorthand). */
  def parseProductShorthand(product: Column): Column =
    transform(slice(split(product, "__"), 2, 64), c =>
      struct(split(c, "_").getItem(1).cast("long").as("channel"),
        split(c, "_").getItem(0).as("prefix")))

  /** Product -> required input channels (sources/__init__.py:22-33:
    * truecolor_rgb needs ABI channels 1, 2, 3). */
  def productInputChannels(product: String): Seq[Int] = product match {
    case "truecolor_rgb" => Seq(1, 2, 3)
    case p if p.startsWith("multichannel__") || p.startsWith("singlechannel__") =>
      p.split("__").drop(1).map(c => c.split("_").last.toInt).toSeq
    case p => throw new IllegalArgumentException(s"unknown GOES product '$p'")
  }

  /** C2: GOES-16 ABI S3 object key codec (the `satdata.parse_key` format,
    * goes16/pipeline.py:33-35). Key shape (public noaa-goes16 layout):
    *
    *   {product}/{yyyy}/{DDD}/{HH}/OR_{product}-M{mode}C{cc}_G{sat}_
    *     s{yyyyDDDHHmmss}{t}_e..._c....nc
    *
    * (DDD = day-of-year, trailing t = tenths of seconds). */
  def goesKey(time: Column, product: String, mode: Int, channel: Column,
      satellite: Int = 16): Column =
    concat(
      lit(s"$product/"), date_format(time, "yyyy/DDD/HH"), lit("/"),
      lit(s"OR_$product-M${mode}C"), lpad(channel.cast("string"), 2, "0"),
      lit(s"_G$satellite" + "_s"), date_format(time, "yyyyDDDHHmmss"), lit("0"),
      lit("_e"), date_format(time, "yyyyDDDHHmmss"), lit("0"),
      lit("_c"), date_format(time, "yyyyDDDHHmmss"), lit("0.nc"))

  /** Inverse codec: (start_time, product, mode, channel, satellite). */
  def parseGoesKey(key: Column): (Column, Column, Column, Column, Column) = (
    to_timestamp(substring(regexp_extract(key, "_s([0-9]{14})_", 1), 1, 13),
      "yyyyDDDHHmmss"),
    regexp_extract(key, "OR_([A-Za-z0-9-]+)-M[0-9]+C[0-9]{2}_", 1),
    regexp_extract(key, "-M([0-9]+)C[0-9]{2}_", 1).cast("long"),
    regexp_extract(key, "-M[0-9]+C([0-9]{2})_", 1).cast("long"),
    regexp_extract(key, "_G([0-9]+)_s", 1).cast("long"))

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
