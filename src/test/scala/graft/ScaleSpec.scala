package graft

import graft.core.DataSourceConfig
import graft.operators.Skew
import graft.pipeline.Bucketing
import graft.streaming.StreamAsOf
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val exampleJson =
    """{
      |  "source": "goes16", "product": "truecolor_rgb",
      |  "time": {
      |    "t_start": "2020-02-02 10:00:00", "t_end": "2020-02-03 10:00:00",
      |    "filters": {"N_hours_from_zenith": "2.0", "minutes": "0|30"}
      |  },
      |  "domain": {"central_latitude": 13.3, "central_longitude": -57.5,
      |             "l_zonal": 400.0e3, "l_meridional": 400.0e3},
      |  "sampling": {"resolution": 1000.0, "tile_N": 256,
      |               "N_triplets": {"train": 2, "study": 1},
      |               "neigh_dist_scaling": 0.1},
      |  "aux_products": {
      |    "ctt": {"source": "ceres_geo", "product": "cloud_top_temperature",
      |            "scene_mapping_strategy": "all_scenes_within_dt_aux",
      |            "dt_aux_seconds": 3600}}
      |}""".stripMargin

  test("DataSourceConfig parses meta.yaml-equivalent JSON and compiles predicates") {
    val cfg = DataSourceConfig.fromJson(exampleJson)
    assert(cfg.source == "goes16" && cfg.tileSizeM == 256000.0)
    assert(cfg.sampling.N_triplets == Map("train" -> 2, "study" -> 1))
    assert(cfg.aux_products("ctt").scene_mapping_strategy == "all_scenes_within_dt_aux")
    // predicate compilation: rows at :00/:30 within the window AND near zenith
    val ts = Seq("2020-02-02 14:00:00", "2020-02-02 14:15:00", "2020-02-05 14:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("t"))
    val kept = ts.where(DataSourceConfig.timePredicate(cfg, col("t"))).as[java.sql.Timestamp].collect()
    // -57.5 deg lon => solar noon ~ 15:50 UTC; 14:00 is 1.8h from zenith (kept),
    // 14:15 fails the minutes filter, Feb 5 is outside the window
    assert(kept.map(_.toString).toSeq == Seq("2020-02-02 14:00:00.0"))
    // invalid configs rejected
    intercept[IllegalArgumentException](DataSourceConfig.fromJson("""{"source":"x","product":"y",
      "time":{},"domain":{"central_latitude":0,"central_longitude":0,"l_zonal":1,"l_meridional":1},
      "sampling":{"resolution":1}}"""))
  }

  test("bucketed join runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, "/root/testdata/sf0.001").select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, "/root/testdata/sf0.001")
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(joined.count() > 0)
      assert(!Bucketing.hasShuffle(joined), "bucketed join should be exchange-free:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
      // the same join on raw parquet DOES shuffle — the bucketing is what removed it
      val raw = Tables.orders(spark, "/root/testdata/sf0.001")
        .join(Tables.lineitem(spark, "/root/testdata/sf0.001"),
          col("o_orderkey") === col("l_orderkey"))
      raw.count()
      assert(Bucketing.hasShuffle(raw))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join equals the plain join") {
    val left = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val right = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val salted = Skew.saltedJoin(left, right, "l_orderkey", col("l_linenumber"), nSalts = 8)
    val plain = left.join(right, "l_orderkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("streaming as-of join matches the batch as-of on the same data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sasof").toString
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    e.where(col("event_type") === "view")
      .select(col("event_id").as("probe_id"), col("ts").as("probe_ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/probe")
    e.where(col("event_type") === "purchase")
      .select(col("ts").as("build_ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/build")
    val pSchema = spark.read.parquet(s"$dir/probe").schema
    val bSchema = spark.read.parquet(s"$dir/build").schema
    val out = StreamAsOf.nearestWithin(
      spark.readStream.schema(pSchema).parquet(s"$dir/probe"),
      spark.readStream.schema(bSchema).parquet(s"$dir/build"),
      "probe_id", "probe_ts", "build_ts",
      halfWindowUs = 900L * 1000000, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory").queryName("sasof")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT probe_id, matched_ts, dt_us FROM sasof")
      .as[(Long, java.sql.Timestamp, Long)].collect().toMap0
    val batch = graft.operators.AsOfJoin.nearestWithin(
      e.where(col("event_type") === "view")
        .select(col("event_id").as("probe_id"), col("ts").as("probe_ts")),
      e.where(col("event_type") === "purchase").select(col("ts").as("build_ts")),
      "probe_ts", "build_ts", 900L * 1000000, Seq("probe_id"))
      .select(col("probe_id"), col("build_ts"), col("dt_us"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toMap0
    assert(streamed == batch && batch.nonEmpty)
  }

  private implicit class Tup3Map[A, B, C](rows: Array[(A, B, C)]) {
    def toMap0: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
