package graft

import graft.embeddings.{Inference, Transforms}
import graft.functions.{ImageOps, UserFunctions}
import graft.operators.{Flow, Profiles}
import graft.pipeline.Incremental
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

class PhaseDSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts match the batch equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.runToMemory(
      StreamOps.windowedCounts(stream, "1 day", "2 hours"), "wc",
      org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      val streamed = spark.sql("SELECT sum(n) FROM wc").as[Long].head()
      val batch = Tables.events(spark, "/root/testdata/sf0.001").count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming exact dedup emits one row per digest within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val docs = Seq(
      ("2024-01-01 00:00:00", "alpha"), ("2024-01-01 00:05:00", "beta"),
      ("2024-01-01 00:10:00", "alpha"), ("2024-01-01 00:15:00", "gamma"),
      ("2024-01-01 00:20:00", "beta"), ("2024-01-01 00:25:00", "alpha"))
      .toDF("ts", "text").select(to_timestamp(col("ts")).as("ts"), col("text"))
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = StreamOps.runToMemory(
      StreamOps.streamingExactDedup(stream, "ts", "text", "1 hour"), "sded",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val texts = spark.sql("SELECT text FROM sded").collect().map(_.getString(0)).sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("stateful per-user tracking carries state across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-track").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("user_id") < 5).coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.runToMemory(StreamOps.trackPerUser(stream), "trk",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val out = spark.sql("SELECT user_id, n_events FROM trk").as[(Long, Long)].collect().toMap
      val expect = Tables.events(spark, "/root/testdata/sf0.001")
        .where(col("user_id") < 5).groupBy("user_id").count()
        .as[(Long, Long)].collect().toMap
      assert(out == expect)
    } finally q.stop()
  }

  test("inference stub embeds tiles with per-partition batching") {
    val tiles = (1 to 100).map(i => (i.toLong, Seq.fill(16)(i.toDouble))).toDF("tile_id", "values")
      .repartition(7)
    val out = Inference.embedTiles(tiles, "tile_id", "values",
      new Inference.LinearStubModel(4), batchSize = 8)
    val got = out.as[(Long, Seq[Float])].collect().toMap
    assert(got.size == 100)
    // emb_k = mean * (k+1) / 4; tile i has mean i
    assert(math.abs(got(10L)(3) - 10.0f) < 1e-5)
    assert(math.abs(got(10L)(0) - 2.5f) < 1e-5)
  }

  test("PCA reduces embedding dimensionality") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val model = Transforms.fitPca(df, "embedding", 8)
    val out = Transforms.applyPca(df, model, "embedding", "emb_pca")
    assert(out.select(size(col("emb_pca"))).as[Int].head() == 8)
    assert(out.count() == 200)
  }

  test("seeded KMeans is deterministic, persists, and stamps the manifest name") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(300)
    def assignments(seed: Long): Map[Long, Long] = {
      val m = Transforms.fitKmeans(df, "embedding", k = 5, seed = seed)
      Transforms.applyKmeans(df, m, "embedding", "cluster")
        .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    }
    val a = assignments(42L)
    val b = assignments(42L)
    assert(a == b, "same seed must reproduce identical clusters")
    assert(a.values.toSet.size == 5)

    // model persistence round-trip (the joblib analog)
    val m = Transforms.fitKmeans(df, "embedding", k = 5, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("graft-kmeans").toString + "/m"
    m.save(dir)
    val loaded = org.apache.spark.ml.clustering.KMeansModel.load(dir)
    val viaLoaded = Transforms.applyKmeans(df, loaded, "embedding", "cluster")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(viaLoaded == a)

    // reference-format transform identifier + extra-args parser
    assert(Transforms.transformIdentifier("pca") == "pca_transform")
    assert(Transforms.transformIdentifier("hdbscan", "min_cluster_size=10,epsilon=0.5")
      == "hdbscan_transform__min_cluster_size_10__epsilon_0.5")
    val parsed = Transforms.parseTransformExtraArgs("min_cluster_size=10,epsilon=0.5")
    assert(parsed == Map("min_cluster_size" -> 10, "epsilon" -> 0.5))
  }

  test("user-function registry validates and builds columns") {
    val reg = UserFunctions.exampleRegistry()
    assert(reg.names == Seq("cloud_mask", "ir_shallow_clouds"))
    val df = Seq((280.0, 295.0)).toDF("bt13_cold", "bt13_warm")
    val out = df.select(
      reg("cloud_mask", Map("bt_13" -> col("bt13_cold"))).as("cold"),
      reg("cloud_mask", Map("bt_13" -> col("bt13_warm"))).as("warm"))
      .as[(Boolean, Boolean)].head()
    assert(out == ((true, false)))
    intercept[IllegalArgumentException](reg("nope", Map.empty))
    intercept[IllegalArgumentException](reg("cloud_mask", Map("wrong" -> lit(1))))
  }

  test("filter DSL parses ops and applies simple predicates") {
    val parsed = UserFunctions.parseFilterDsl("v__gt=1,v__lte=5,v__isnan=false,v__upper_percentile=90")
    assert(parsed.length == 4)
    assert(parsed.collect { case p: UserFunctions.PercentileFilter => p }.head.p == 0.9)
    val df = Seq(0.5, 2.0, 4.0, 6.0, Double.NaN).toDF("v")
    val out = UserFunctions.applySimpleFilters(df, "v__gt=1,v__lte=5,v__isnan=false")
      .as[Double].collect().sorted
    assert(out.toSeq == Seq(2.0, 4.0))
    intercept[IllegalArgumentException](UserFunctions.parseFilterDsl("v__bogus=1"))
  }

  test("PNG encode/decode round-trips pixel values") {
    val rgb = Seq(0.0, 0.5, 1.0, 1.0, 0.25, 0.75) // 1x2 image
    val df = Seq((rgb, 1, 2)).toDF("rgb", "ny", "nx")
    val bytes = df.select(ImageOps.encodePng(col("rgb"), col("ny"), col("nx"))).as[Array[Byte]].head()
    assert(bytes.length > 8 && bytes(1) == 'P'.toByte)
    val back = df.withColumn("png", ImageOps.encodePng(col("rgb"), col("ny"), col("nx")))
      .select(ImageOps.decodePng(col("png"))).as[Seq[Double]].head()
    rgb.zip(back).foreach { case (want, got) => assert(math.abs(want - got) <= 1.0 / 255 + 1e-9) }
  }

  test("image math: clip/gamma/green-combo/minmax") {
    val df = Seq((Seq(0.0, 0.5, 2.0), Seq(1.0, 1.0, 1.0), Seq(0.5, 0.5, 0.5))).toDF("r", "b", "g")
    val clipped = df.select(ImageOps.clipArr(col("r"), 0, 1)).as[Seq[Double]].head()
    assert(clipped == Seq(0.0, 0.5, 1.0))
    val tg = df.select(ImageOps.trueGreen(col("r"), col("b"), col("g"))).as[Seq[Double]].head()
    assert(math.abs(tg(1) - (0.5 * 0.4836 + 1.0 * 0.4571 + 0.5 * 0.0604)) < 1e-12)
    val mm = df.select(ImageOps.minMaxScaleArr(col("r"))).as[Seq[Double]].head()
    assert(mm == Seq(0.0, 0.25, 1.0))
  }

  test("resize: nearest picks source pixels, bilinear blends with half-pixel centers") {
    // 2x2 RGB image, distinct channel values per pixel
    val rgb = Seq(
      10.0, 11.0, 12.0, 20.0, 21.0, 22.0, // row 0: px(0,0), px(0,1)
      30.0, 31.0, 32.0, 40.0, 41.0, 42.0) // row 1
    val df = Seq(Tuple1(rgb)).toDF("rgb")
    // nearest 2x2 -> 4x4: each source pixel becomes a 2x2 block
    val near = df.select(ImageOps.resizeRgbNearest(col("rgb"), 2, 2, 4, 4))
      .as[Seq[Double]].head()
    assert(near.length == 4 * 4 * 3)
    def nearPx(j: Int, i: Int) = near.slice((j * 4 + i) * 3, (j * 4 + i) * 3 + 3)
    assert(nearPx(0, 0) == Seq(10.0, 11.0, 12.0))
    assert(nearPx(1, 1) == Seq(10.0, 11.0, 12.0))
    assert(nearPx(0, 2) == Seq(20.0, 21.0, 22.0))
    assert(nearPx(3, 3) == Seq(40.0, 41.0, 42.0))
    // identity resize is exact
    assert(df.select(ImageOps.resizeRgbNearest(col("rgb"), 2, 2, 2, 2))
      .as[Seq[Double]].head() == rgb)
    // bilinear 2x2 -> 4x4: half-pixel centers give wy = wx = 0.25 at
    // out(1,1): 0.5625*10 + 0.1875*20 + 0.1875*30 + 0.0625*40 = 17.5
    val bi = df.select(ImageOps.resizeRgbBilinear(col("rgb"), 2, 2, 4, 4))
      .as[Seq[Double]].head()
    def biPx(j: Int, i: Int, c: Int) = bi((j * 4 + i) * 3 + c)
    assert(math.abs(biPx(1, 1, 0) - 17.5) < 1e-12)
    // corners clamp to the source corners
    assert(biPx(0, 0, 0) == 10.0 && biPx(3, 3, 2) == 42.0)
    // centers of the output map back to source pixels on a 2x downscale
    val down = df.select(ImageOps.resizeRgbBilinear(col("rgb"), 2, 2, 1, 1))
      .as[Seq[Double]].head()
    // single output pixel = average of the four source pixels per channel
    assert(math.abs(down(0) - 25.0) < 1e-12)
    assert(math.abs(down(1) - 26.0) < 1e-12)
  }

  test("frameSample keeps every k-th frame intact") {
    // 5 frames x 2 values; stride 2 -> frames 0, 2, 4
    val video = (0 until 10).map(_.toDouble)
    val df = Seq(Tuple1(video)).toDF("v")
    val got = df.select(ImageOps.frameSample(col("v"), 2, 2)).as[Seq[Double]].head()
    assert(got == Seq(0.0, 1.0, 4.0, 5.0, 8.0, 9.0))
    // stride 1 is the identity; stride > nFrames keeps only frame 0
    assert(df.select(ImageOps.frameSample(col("v"), 2, 1)).as[Seq[Double]].head() == video)
    assert(df.select(ImageOps.frameSample(col("v"), 2, 9)).as[Seq[Double]].head() ==
      Seq(0.0, 1.0))
  }

  test("profile ops: layer mean, vertical integral, recurrence") {
    val rows = for (k <- Seq("a", "b"); l <- 1 to 5) yield Profiles.LevelRow(k, l, l.toDouble)
    val ds = rows.toDS()
    val lm = Profiles.layerMean(ds.toDF(), Seq("key"), "level", "v", 2, 4)
      .where(col("key") === "a").select("v_layer_mean").as[Double].head()
    assert(lm == 3.0)
    val vi = Profiles.verticalIntegral(ds.toDF(), Seq("key"), "level", "v")
      .where(col("key") === "a").select("v_integral").as[Double].head()
    assert(vi == (1 + 2 + 3 + 4).toDouble) // dp=1 each, last level dropped
    val rec = Profiles.bottomUpRecurrence(ds, _ => 2.0).collect()
      .filter(_._1 == "a").sortBy(-_._2)
    // bottom-up: level 5 first: acc=10, then 18, 24, 28, 30
    assert(rec.map(_._3).toSeq == Seq(10.0, 18.0, 24.0, 28.0, 30.0))
  }

  test("interpolateToPressure: exact on ln(p)-linear fields, bracket edges, no-bracket drop") {
    // v = 3*ln(p) + 7 must interpolate EXACTLY at any target (the
    // interpolation is linear in ln p); z linear in level is inexact but
    // bounded by the bracket values
    val rows = for (k <- Seq("a", "b"); l <- 0 to 9)
      yield (k, l, 20000.0 * (l + 1), 3.0 * math.log(20000.0 * (l + 1)) + 7.0, l * 100.0)
    val df = rows.toDF("key", "level", "p", "v", "z")
    val out = Profiles.interpolateToPressure(df, Seq("key"), "level", "p",
      Seq("v", "z"), 70000.0, "700").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("v700") - (3.0 * math.log(70000.0) + 7.0)) < 1e-9)
      val z = r.getAs[Double]("z700")
      assert(z > 200.0 && z < 300.0) // bracket levels 2 (60000) and 3 (80000)
    }
    // exact-hit: p == target picks that level's value with weight 0
    val hit = Profiles.interpolateToPressure(df, Seq("key"), "level", "p",
      Seq("z"), 60000.0, "600").where(col("key") === "a").collect()
    assert(hit.head.getAs[Double]("z600") == 200.0)
    // a column whose profile never brackets the target produces no row
    val none = Profiles.interpolateToPressure(df, Seq("key"), "level", "p",
      Seq("z"), 5000.0, "050").collect()
    assert(none.isEmpty)
  }

  test("Bolton LCL: rh-drop, peak layer selection, half_minmax/median sampling") {
    // column "c": 6 levels, t constant so delta peaks track rh maxima.
    // rh[level 3] <= 0 is dropped BEFORE peak finding (reference order);
    // remaining rh 0.5,0.8,0.5,0.9,0.6 peaks at levels 1 (alt 500) and
    // 4 (alt 200) -> min peak alt 200 -> layer = levels 4,5.
    // column "mono": monotone rh -> no interior peak -> no output row.
    val rh = Map(0 -> 0.5, 1 -> 0.8, 2 -> 0.5, 3 -> -0.1, 4 -> 0.9, 5 -> 0.6)
    val rows =
      (0 to 5).map(l => ("c", l, (6 - l) * 100.0, 290.0, rh(l))) ++
        (0 to 3).map(l => ("mono", l, (6 - l) * 100.0, 290.0, 0.2 + 0.1 * l))
    val df = rows.toDF("key", "level", "alt", "t", "rh")
    val out = Profiles.boltonZlcl(df, Seq("key"), "level", "t", "rh", "alt").collect()
    assert(out.length == 1 && out.head.getString(0) == "c")
    val r = out.head
    assert(r.getAs[Long]("n_layer_levels") == 2L)
    def zlcl(alt: Double, t: Double, rhv: Double): Double = {
      val tlcl = 1.0 / (1.0 / (t - 55.0) - math.log(rhv) / 2840.0) + 55.0
      alt - 1004.0 * (tlcl - t) / 9.80665
    }
    val (z4, z5) = (zlcl(200.0, 290.0, 0.9), zlcl(100.0, 290.0, 0.6))
    assert(math.abs(r.getAs[Double]("z_lcl_half_minmax") - 0.5 * (z4 + z5)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_lcl_median") - 0.5 * (z4 + z5)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_lcl_mean") - 0.5 * (z4 + z5)) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_lcl_layer_std") - 0.5 * math.abs(z4 - z5)) < 1e-9)
  }

  test("flow chaining tracks a moving blob and marks lost points") {
    def frame(g: String, t: Int, cx: Int): Flow.Frame = {
      val v = Array.fill(20 * 10)(0.0)
      v(5 * 20 + cx) = 1.0 // single bright pixel at row 5, col cx
      Flow.Frame(g, t, 20, 10, v)
    }
    val frames = Seq(frame("d1", 0, 2), frame("d1", 1, 6), frame("d1", 2, 10)).toDS()
    val out = Flow.chainTrajectories(frames, seedStride = 8).collect()
    val traj0 = out.filter(p => p.traj_id == 0).sortBy(_.seq).map(p => p.x)
    // seed at x=4; blob moves +4 px/frame -> 4, 8, 12
    assert(traj0.toSeq == Seq(4.0, 8.0, 12.0))
    // a point seeded near the right edge drifts out and is marked lost
    val lost = out.filter(p => p.seq == 2 && p.x == -1.0)
    assert(lost.nonEmpty)
  }

  test("incremental stage writes only missing partitions and is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString + "/out"
    val in1 = Seq(("s1", 1), ("s2", 2)).toDF("scene", "v")
    val n1 = Incremental.runStage(spark, in1, "scene", dir)(df => df.withColumn("v2", col("v") * 2))
    assert(n1 == 2)
    val in2 = Seq(("s1", 1), ("s2", 2), ("s3", 3)).toDF("scene", "v")
    val n2 = Incremental.runStage(spark, in2, "scene", dir)(df => df.withColumn("v2", col("v") * 2))
    assert(n2 == 1) // only s3 is new
    val n3 = Incremental.runStage(spark, in2, "scene", dir)(df => df.withColumn("v2", col("v") * 2))
    assert(n3 == 0) // fully materialized -> no work
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("runStage leaves the session conf alone; later static overwrites stay static") {
    // dynamic overwrite is a PER-WRITER option: mutating the session
    // conf would silently turn the caller's own later static-mode
    // overwrite writes into dynamic ones for the rest of the session
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(key)
    val dir = java.nio.file.Files.createTempDirectory("graft-inc-conf").toString + "/out"
    val in = Seq(("s1", 1), ("s2", 2)).toDF("scene", "v")
    assert(Incremental.runStage(spark, in, "scene", dir)(identity) == 2)
    assert(spark.conf.getOption(key) == before,
      s"runStage mutated the session conf: $key = ${spark.conf.getOption(key)}")
    // a subsequent partitioned overwrite behaves STATICALLY (the
    // session default): writing only s1 replaces the whole table
    val other = java.nio.file.Files.createTempDirectory("graft-inc-conf2").toString + "/out"
    Seq(("s1", 1), ("s2", 2)).toDF("scene", "v")
      .write.partitionBy("scene").parquet(other)
    Seq(("s1", 9)).toDF("scene", "v")
      .write.mode("overwrite").partitionBy("scene").parquet(other)
    val left = spark.read.parquet(other).select("scene").distinct()
      .collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("s1"),
      s"static overwrite became dynamic (scenes left: ${left.mkString(",")})")
  }
}
