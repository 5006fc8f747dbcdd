package graft.operators

import graft.SparkSpec
import graft.core.{Domain, Projection}
import org.apache.spark.sql.functions._

class RasterSpec extends SparkSpec {
  import spark.implicits._

  test("Tiler enumerates origins with stride and y-flip (rect/tiles.py:139-146)") {
    val scenes = Seq(("s1", 48, 32)).toDF("scene_id", "nx", "ny")
    val specs = Tiler.tileSpecs(scenes, col("nx"), col("ny"), tileN = 16, step = 16)
      .select("i0", "j0", "tile_id").as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // i0 in {0,16,32}; j (pre-flip) in {0,16} -> j0 = 32-(j+16) in {16,0}
    assert(specs.map(s => (s._1, s._2)).toSeq ==
      Seq((0, 0), (0, 16), (16, 0), (16, 16), (32, 0), (32, 16)))
    // 2 tiles along y => tile_id = i_idx*2 + j_idx, all distinct 0..5
    assert(specs.map(_._3).sorted.toSeq == (0L to 5L).toSeq)
  }

  test("bilinear regrid interpolates a linear field exactly") {
    // f(x,y) = 2x + 3y sampled at cell centers is reproduced exactly by
    // bilinear interpolation at any interior destination point
    val src = Regrid.GridDef(0, 1, 10, 0, 1, 10)
    val dst = Regrid.GridDef(2, 0.5, 8, 2, 0.5, 8)
    val srcDf = spark.range(100).select(
      (col("id") / 10).cast("int").as("src_i"), (col("id") % 10).cast("int").as("src_j"))
      .withColumn("value", (col("src_i") + 0.5) * 2.0 + (col("src_j") + 0.5) * 3.0)
    val w = Regrid.bilinearWeights(spark, src, dst)
    val out = Regrid.applyWeights(srcDf, w, Nil).collect()
    out.foreach { r =>
      val (di, dj, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val (xc, yc) = (2 + (di + 0.5) * 0.5, 2 + (dj + 0.5) * 0.5)
      assert(math.abs(v - (2 * xc + 3 * yc)) < 1e-9, s"dst($di,$dj)")
    }
  }

  test("nearest regrid picks the closest source cell") {
    val src = Regrid.GridDef(0, 1, 4, 0, 1, 4)
    val dst = Regrid.GridDef(0, 2, 2, 0, 2, 2)
    val srcDf = spark.range(16).select(
      (col("id") / 4).cast("int").as("src_i"), (col("id") % 4).cast("int").as("src_j"))
      .withColumn("value", col("src_i") * 10.0 + col("src_j"))
    val w = Regrid.nearestWeights(spark, src, dst)
    val out = Regrid.applyWeights(srcDf, w, Nil)
      .orderBy("dst_i", "dst_j").select("value").as[Double].collect()
    // dst centers at 1,3 -> frac coords 0.5, 2.5 -> round() -> src 1, 3 (HALF_UP)
    assert(out.toSeq == Seq(11.0, 13.0, 31.0, 33.0))
  }

  test("curvilinear bilinear weights: exact on linear fields, sum to 1, reduce to regular") {
    // warped mesh: x,y vary in BOTH indices (curvilinear), genuinely
    // non-parallelogram quads (the inverse-bilinear quadratic path)
    val src = spark.range(256).select(
      expr("id div 16").as("src_i"), (col("id") % 16).as("src_j"))
      .withColumn("x", (col("src_i") * 100 + col("src_j") * 5).cast("double")
        + lit(0.25) * col("src_i") * col("src_j"))
      .withColumn("y", (col("src_j") * 100 - col("src_i") * 4).cast("double")
        + lit(0.125) * col("src_j") * col("src_j"))
    val dst = spark.range(100).select(
      expr("id div 10").as("dst_i"), (col("id") % 10).as("dst_j"))
      .withColumn("x", (lit(200) + col("dst_i") * 100).cast("double"))
      .withColumn("y", (lit(200) + col("dst_j") * 100).cast("double"))
    val w = Regrid.curvilinearBilinearWeights(src, dst, binSize = 256.0)

    // every interior dst point matched by exactly 4 corner rows, Σw = 1
    val sums = w.groupBy("dst_i", "dst_j")
      .agg(count(lit(1)).as("n"), sum("w").as("sw")).collect()
    assert(sums.length == 100)
    sums.foreach { r =>
      assert(r.getAs[Long]("n") == 4L)
      assert(math.abs(r.getAs[Double]("sw") - 1.0) < 1e-12)
    }

    // interpolation is EXACT for a linear field f = 2x + 3y + 7:
    // join weights to corner values and compare to f at the dst point
    val srcVal = src.withColumn("fv", lit(2.0) * col("x") + lit(3.0) * col("y") + 7.0)
      .select("src_i", "src_j", "fv")
    val interp = Regrid.applyWeights(
      srcVal.withColumnRenamed("fv", "value"), w, Nil)
    val got = interp.collect().map(r =>
      (r.getAs[Long]("dst_i"), r.getAs[Long]("dst_j")) -> r.getAs[Double]("value")).toMap
    for (di <- 0 until 10; dj <- 0 until 10) {
      val (xd, yd) = (200.0 + di * 100, 200.0 + dj * 100)
      assert(math.abs(got((di.toLong, dj.toLong)) - (2 * xd + 3 * yd + 7)) < 1e-8,
        s"linear field at ($di,$dj)")
    }

    // degenerate case: a REGULAR mesh through the curvilinear path must
    // reproduce the regular-grid bilinear weights
    val regSrc = spark.range(100).select(
      expr("id div 10").as("src_i"), (col("id") % 10).as("src_j"))
      .withColumn("x", (col("src_i") + 0.5) * 1.0)
      .withColumn("y", (col("src_j") + 0.5) * 1.0)
    val regDst = spark.range(64).select(
      expr("id div 8").as("dst_i"), (col("id") % 8).as("dst_j"))
      .withColumn("x", lit(2.0) + (col("dst_i") + 0.5) * 0.5)
      .withColumn("y", lit(2.0) + (col("dst_j") + 0.5) * 0.5)
    val wCurv = Regrid.curvilinearBilinearWeights(regSrc, regDst, binSize = 4.0)
      .where(col("w") > 1e-12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap
    val wReg = Regrid.bilinearWeights(spark,
      Regrid.GridDef(0, 1, 10, 0, 1, 10), Regrid.GridDef(2, 0.5, 8, 2, 0.5, 8))
      .where(col("w") > 1e-12)
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong) -> r.getDouble(4)).toMap
    assert(wCurv.keySet == wReg.keySet)
    wCurv.foreach { case (k, v) => assert(math.abs(v - wReg(k)) < 1e-9, s"weight at $k") }
  }

  test("great-circle nearest weights agree with brute-force haversine argmin") {
    val src = spark.range(256).select(
      expr("id div 16").as("src_i"), (col("id") % 16).as("src_j"))
      .withColumn("lat", (col("src_i") - 8) * 0.5 + lit(0.01) * col("src_j"))
      .withColumn("lon", (col("src_j") - 8) * 0.5 + lit(0.02) * col("src_i"))
    val dst = spark.range(25).select(
      expr("id div 5").as("dst_i"), (col("id") % 5).as("dst_j"))
      .withColumn("lat", lit(-3.0) + col("dst_i") * 1.3)
      .withColumn("lon", lit(-3.0) + col("dst_j") * 1.3)
    val got = Regrid.greatCircleNearestWeights(src, dst, binSizeDeg = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // brute force on the driver
    val srcPts = src.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val dstPts = dst.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def havk(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val rad = graft.core.Projection.RadPerDeg
      val sdlat = math.sin((lat2 - lat1) * rad / 2); val sdlon = math.sin((lon2 - lon1) * rad / 2)
      sdlat * sdlat + math.cos(lat1 * rad) * math.cos(lat2 * rad) * sdlon * sdlon
    }
    assert(got.size == 25)
    dstPts.foreach { case (di, dj, dlat, dlon) =>
      val best = srcPts.minBy { case (si, sj, slat, slon) => (havk(dlat, dlon, slat, slon), si, sj) }
      assert(got((di, dj)) == ((best._1, best._2)), s"nearest for ($di,$dj)")
    }
  }

  test("projection round-trips and respects tangent-plane geometry") {
    val pts = Seq((10.0, -60.0), (13.3, -57.5), (15.0, -55.0), (-5.0, -50.0))
      .toDF("lat", "lon")
    val out = pts
      .withColumn("x", Projection.projX(col("lat"), col("lon"), 13.3, -57.5))
      .withColumn("y", Projection.projY(col("lat"), col("lon"), 13.3, -57.5))
      .withColumn("rlat", Projection.invLat(col("x"), col("y"), 13.3, -57.5))
      .withColumn("rlon", Projection.invLon(col("x"), col("y"), 13.3, -57.5))
      .select("lat", "lon", "x", "y", "rlat", "rlon")
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    out.foreach { case (lat, lon, x, y, rlat, rlon) =>
      assert(math.abs(rlat - lat) < 1e-9 && math.abs(rlon - lon) < 1e-9, s"roundtrip ($lat,$lon)")
    }
    val center = out.find(p => p._1 == 13.3).get
    assert(math.abs(center._3) < 1e-6 && math.abs(center._4) < 1e-6)
    // 1 degree of latitude ~ 111.2 km northward
    val north = out.find(p => p._1 == 15.0).get
    assert(north._4 > 180e3 && north._4 < 195e3)
  }

  test("tensor<->long round-trip preserves values incl. NaN") {
    val px = Seq(("s", 0, 0, 1.0), ("s", 0, 1, 2.0), ("s", 1, 0, Double.NaN), ("s", 1, 1, 4.0))
      .toDF("scene_id", "y", "x", "value")
    val t = TensorOps.longToTensor(px)
    val row = t.head()
    assert(row.getAs[Int]("ny") == 2 && row.getAs[Int]("nx") == 2)
    val vals = row.getSeq[Double](row.fieldIndex("values"))
    assert(vals(0) == 1.0 && vals(1) == 2.0 && vals(2).isNaN && vals(3) == 4.0)
    val back = TensorOps.tensorToLong(t).orderBy("y", "x")
      .select("y", "x", "value").as[(Int, Int, Double)].collect()
    assert(back(2)._3.isNaN && back.map(r => (r._1, r._2)).toSeq ==
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("chunked tensor: bounded rows, ragged edges, lossless round-trip at scene scale") {
    // 1000x900 dense scene (ragged vs chunk=256 in both axes) built
    // distributed — the structural claim is that NO row ever exceeds
    // chunk^2 values regardless of total scene size, so a full-disk
    // 21696^2 scene is safe by the same invariant.
    val chunk = 256
    val ny = 1000; val nx = 900
    val px = spark.range(ny.toLong * nx).select(
      lit("s").as("scene_id"),
      expr(s"CAST(id div $nx AS INT)").as("y"),
      expr(s"CAST(id % $nx AS INT)").as("x"),
      (col("id") % 7).cast("double").as("value"))
    val t = TensorOps.longToChunkedTensor(px, chunk)
    val sizes = t.select(org.apache.spark.sql.functions.size(col("values")).as("n"),
      col("cny"), col("cnx")).collect()
    assert(sizes.length == 16) // 4x4 chunk grid for 1000x900 @ 256
    assert(sizes.forall(r => r.getAs[Int]("n") <= chunk * chunk))
    assert(sizes.forall(r => r.getAs[Int]("n") == r.getAs[Int]("cny") * r.getAs[Int]("cnx")))
    // ragged edge chunks: 1000 = 3*256 + 232, 900 = 3*256 + 132
    assert(sizes.exists(r => r.getAs[Int]("cny") == 232))
    assert(sizes.exists(r => r.getAs[Int]("cnx") == 132))
    val back = TensorOps.chunkedTensorToLong(t, chunk)
    // lossless: every (y,x,value) survives; checksum compare, no collect
    // of the full scene
    val a = px.agg(sum(col("value") * (col("y") * nx + col("x"))).cast("long")).head().getLong(0)
    val b = back.agg(sum(col("value") * (col("y") * nx + col("x"))).cast("long")).head().getLong(0)
    assert(px.count() == back.count() && a == b)
    assert(back.select("y", "x").distinct().count() == ny.toLong * nx)
  }

  test("gatherTiles selects exactly the pixels under each tile bbox") {
    val px = (0 until 100).map(i => ("s", (i % 10) * 100.0, (i / 10) * 100.0, i.toDouble))
      .toDF("scene_id", "x", "y", "value")
    val tiles = Seq(("s", 1L, 0.0, 0.0), ("s", 2L, 500.0, 500.0)).toDF("scene_id", "tile_id", "x0", "y0")
    val out = TileCheck.gather(px, tiles)
    assert(out(1L) == 9 && out(2L) == 9) // 3x3 pixels per 300m tile on the 100m grid
  }

  test("triplet sampling is deterministic and repartition-stable") {
    val scenes = (0 until 6).map(i => s"scene_$i").toDF("scene_id")
      .withColumn("collection", Triplets.splitScenes(col("scene_id"), 42,
        Seq("train" -> 0.8, "study" -> 0.2)))
    val triplets = spark.range(0, 10).select(col("id").as("triplet_id"))
      .withColumn("collection", lit("train"))
    val scenesT = scenes.where(col("collection") === "train")
    def run(parts: Int) = {
      val paired = Triplets.pairScenes(scenesT.repartition(parts), triplets.repartition(parts), 42)
      Triplets.tileSpecs(paired, Domain(13.3, -57.5, 400e3, 400e3), 25600, 0.1, 42)
        .orderBy("triplet_id", "tile_type")
        .collect().map(_.toString).toSeq
    }
    val (a, b) = (run(1), run(7))
    assert(a == b && a.nonEmpty)
    // anchor and distant come from distinct scenes for every triplet
    val paired = Triplets.pairScenes(scenesT, triplets, 42)
      .select("anchor_scene", "distant_scene").as[(String, String)].collect()
    assert(paired.length == 10 && paired.forall(p => p._1 != p._2))
    // every tile is inside the margin-shrunk domain
    val specs = Triplets.tileSpecs(paired.toSeq.toDF("anchor_scene", "distant_scene")
        .withColumn("collection", lit("train"))
        .withColumn("triplet_id", monotonically_increasing_id()),
      Domain(13.3, -57.5, 400e3, 400e3), 25600, 0.1, 42)
    val dom = Domain(13.3, -57.5, 400e3, 400e3)
    val bad = specs.where(!dom.containsTile(col("x"), col("y"), 25600)).count()
    assert(bad == 0)
  }
}

private object TileCheck {
  def gather(px: org.apache.spark.sql.DataFrame, tiles: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    TensorOps.gatherTiles(px, tiles, tileSizeM = 300.0, cellSizeM = 300.0)
      .groupBy("tile_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
}
