package graft.operators

import graft.SparkSpec
import graft.core.DomainInference
import graft.sources.Calendars
import org.apache.spark.sql.functions._

class TileMetricsCalendarsSpec extends SparkSpec {
  import spark.implicits._

  test("tile metric registry: fraction / rms / range via groupBy agg") {
    val px = Seq(("t1", 0.0), ("t1", 1.0), ("t1", 1.0), ("t1", 0.0), ("t2", 3.0), ("t2", 4.0))
      .toDF("tile_id", "v").as[(String, Double)]
    val out = px.groupByKey(_._1).mapValues(_._2)
      .agg(TileMetrics.registry("mask__fraction"),
        TileMetrics.registry("value__rms"),
        TileMetrics.registry("value__range"))
      .collect().map { case (k, f, r, g) => k -> ((f, r, g)) }.toMap
    val (frac1, rms1, rng1) = out("t1")
    assert(frac1 == 0.5 && math.abs(rms1 - math.sqrt(0.5)) < 1e-12 && rng1 == 1.0)
    assert(out("t2")._3 == 1.0)
    intercept[IllegalArgumentException](TileMetrics.registry("nope"))
  }

  test("calendars: hourly phase, blacklist anti-join, daily->hourly explode") {
    val cal = Calendars.ceresGeoCalendar(spark, "2024-01-01 00:00:00", "2024-01-02 00:00:00",
      phaseMinutes = 30, missing = Seq("2024-01-01 05:30:00"))
    assert(cal.count() == 23) // 24 slots at :30 minus 1 blacklisted
    assert(cal.where(minute(col("time")) =!= 30).count() == 0)
    val daily = Seq("2024-01-01").toDF("d").select(to_timestamp(col("d")).as("day"))
    val hourly = Calendars.dailyFileToHourlyRows(daily, "day")
    assert(hourly.count() == 24)
    assert(hourly.agg(max(col("time"))).head().getTimestamp(0).toString.contains("23:00"))
  }

  test("era5 path codec and channel shorthand parse") {
    val df = Seq("2024-03-05 07:00:00").toDF("t").select(to_timestamp(col("t")).as("t"))
      .withColumn("path", Calendars.era5Path(col("t"), "ml", "q"))
    val path = df.select("path").as[String].head()
    assert(path == "ecmwf-era5_oper_an_ml_202403050700.q.nc")
    val (pt, plev, pvar) = Calendars.parseEra5Path(col("path"))
    val parsed = df.select(pt, plev, pvar).as[(java.sql.Timestamp, String, String)].head()
    assert(parsed._2 == "ml" && parsed._3 == "q" && parsed._1.toString.startsWith("2024-03-05 07:00"))
    val (ch, kind) = Calendars.parseChannelShorthand(lit("bt_13"))
    assert(Seq(1).toDF("x").select(ch, kind).as[(Long, String)].head() == ((13L, "bt")))
  }

  test("GOES ABI key codec round-trips and drives scene assembly per channel") {
    // codec round-trip on a known instant
    val t = Seq("2020-01-01 12:34:56").toDF("t").select(to_timestamp(col("t")).as("t"))
      .withColumn("key", Calendars.goesKey(col("t"), "ABI-L1b-RadF", 6, lit(2)))
    val key = t.select("key").as[String].head()
    assert(key == "ABI-L1b-RadF/2020/001/12/OR_ABI-L1b-RadF-M6C02_G16_" +
      "s20200011234560_e20200011234560_c20200011234560.nc")
    val (pt, prod, mode, ch, sat) = Calendars.parseGoesKey(col("key"))
    val parsed = t.select(pt, prod, mode, ch, sat)
      .as[(java.sql.Timestamp, String, Long, Long, Long)].head()
    assert(parsed == ((java.sql.Timestamp.valueOf("2020-01-01 12:34:56"),
      "ABI-L1b-RadF", 6L, 2L, 16L)))

    // product shorthand expansion (goes16/utils.py:68-76)
    assert(Calendars.productInputChannels("truecolor_rgb") == Seq(1, 2, 3))
    assert(Calendars.productInputChannels("multichannel__bt_13__bt_14") == Seq(13, 14))
    val parsedProd = Seq(1).toDF("x")
      .select(Calendars.parseProductShorthand(lit("multichannel__bt_13__bt_14")))
      .as[Seq[(Long, String)]].head()
    assert(parsedProd == Seq((13L, "bt"), (14L, "bt")))

    // A1 from per-channel GOES listings: only timestamps with all 3
    // truecolor channels present become scenes
    val times = Seq("2020-01-01 00:00:00", "2020-01-01 01:00:00", "2020-01-01 02:00:00")
    val listings = (for {
      ts <- times; ch <- Calendars.productInputChannels("truecolor_rgb")
      if !(ts.contains("01:00") && ch == 3) // channel 3 missing at 01:00
    } yield (ts, ch)).toDF("ts", "ch")
      .select(to_timestamp(col("ts")).as("t"), col("ch"))
      .withColumn("key", Calendars.goesKey(col("t"), "ABI-L1b-RadF", 6, col("ch")))
    val (kt, _, _, kch, _) = Calendars.parseGoesKey(col("key"))
    val perChannel = listings.select(col("key"))
      .select(col("key"), kt.as("time"), concat(lit("C"), kch).as("input"))
    val scenes = SceneAssembly.assembleScenes(perChannel, "time", "input", "key", nInputs = 3)
    val got = scenes.select("time").as[java.sql.Timestamp].collect().map(_.toString).sorted
    assert(got.toSeq == Seq("2020-01-01 00:00:00.0", "2020-01-01 02:00:00.0"))
    // each scene carries the full channel->key map
    val m = scenes.where(col("time") === "2020-01-01 00:00:00")
      .select("inputs").as[Map[String, String]].head()
    assert(m.keySet == Set("C1", "C2", "C3") && m("C2").contains("M6C02"))
  }

  test("domain inference: centroid of symmetric points is the center; lon wrap") {
    val pts = Seq((10.0, -50.0), (10.0, -60.0), (20.0, -50.0), (20.0, -60.0)).toDF("lat", "lon")
    val c = DomainInference.sphericalCentroid(pts, col("lat"), col("lon"))
      .as[(Double, Double)].head()
    assert(math.abs(c._2 - -55.0) < 1e-9 && c._1 > 14.9 && c._1 < 15.2)
    val wrapped = Seq(190.0, 170.0).toDF("lon")
      .select(DomainInference.wrapLon(col("lon"))).as[Double].collect().sorted
    assert(wrapped.toSeq == Seq(-170.0, 170.0))
  }
}
