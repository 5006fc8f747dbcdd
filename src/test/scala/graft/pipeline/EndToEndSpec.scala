package graft.pipeline

import graft.SparkSpec
import graft.core.Domain
import graft.operators.Regrid
import org.apache.spark.sql.functions._

/** The §7.2 slice on FIXTURES.md §3's synthetic field:
  * value = sin(kx·x)·cos(ky·y) + t_idx — hand-checkable under regrid and
  * per-tile mean. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("full slice: catalog -> regrid -> triplets -> gather -> reduce -> as-of aux") {
    val L = 400e3
    val srcDx = 10e3 // 40x40 source grid over [-200km, 200km]
    val n = 40
    val kx = 2 * math.Pi / L
    val ky = 2 * math.Pi / L
    val scenes = Seq(("les__202401010000", 0L), ("les__202401010100", 1L), ("les__202401010200", 2L))

    val pixels = (for {
      (sid, tIdx) <- scenes
      i <- 0 until n; j <- 0 until n
    } yield {
      val x = -L / 2 + (i + 0.5) * srcDx
      val y = -L / 2 + (j + 0.5) * srcDx
      (sid, java.sql.Timestamp.valueOf(s"2024-01-01 0$tIdx:00:00"),
        x, y, math.sin(kx * x) * math.cos(ky * y) + tIdx)
    }).toDF("scene_id", "time", "x", "y", "value")

    val aux = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:05:00"), 11.0),
      (java.sql.Timestamp.valueOf("2024-01-01 02:20:00"), 12.0))
      .toDF("aux_time", "aux_value")

    val cfg = EndToEnd.Config(
      domain = Domain(13.3, -57.5, L, L),
      srcGrid = Regrid.GridDef(-L / 2, srcDx, n, -L / 2, srcDx, n),
      dstGrid = Regrid.GridDef(-L / 2, 5e3, 80, -L / 2, 5e3, 80), // 2x upsample
      tileSizeM = 50e3,
      nTriplets = 4,
      dtAuxUs = 3600L * 1000000)

    val (specs, stats) = EndToEnd.run(spark, pixels, aux, cfg)
    val specRows = specs.collect()
    assert(specRows.length == 12) // 4 triplets x 3 tile types

    val out = stats.collect()
    assert(out.nonEmpty)
    val byTile = stats
      .select("scene_id", "tile_id", "tile_mean", "n_px", "aux_value", "dt_us")
      .as[(String, String, Double, Long, Double, Long)].collect()

    // every gathered tile has the full 10x10 destination pixels
    byTile.foreach { case (_, tid, _, nPx, _, _) => assert(nPx == 100, s"tile $tid has $nPx px") }

    // aux matched to nearest sample: scene at 00:00 -> aux@00:10 (10.0)
    byTile.foreach { case (sid, _, _, _, auxV, dtUs) =>
      val expect = sid match {
        case s if s.endsWith("0000") => (10.0, 600000000L)
        case s if s.endsWith("0100") => (11.0, 300000000L)
        case _ => (12.0, 1200000000L)
      }
      assert((auxV, dtUs) == expect, s"aux match for $sid")
    }

    // hand-check one tile mean: field mean over tile == discrete mean of
    // the bilinear interpolation; verify against direct computation
    val (sid0, tid0, mean0, _, _, _) = byTile.head
    val spec0 = specs.where(col("tile_id") === tid0 && col("scene_id") === sid0).head()
    val (x0, y0) = (spec0.getAs[Double]("x0"), spec0.getAs[Double]("y0"))
    val tIdx = sid0.takeRight(4).take(2).toInt
    // recompute expected mean from the same bilinear weights, driver-side
    val src = (i: Int, j: Int) => {
      val x = -L / 2 + (i + 0.5) * srcDx; val y = -L / 2 + (j + 0.5) * srcDx
      math.sin(kx * x) * math.cos(ky * y) + tIdx
    }
    val dstVals = for {
      di <- 0 until 80; dj <- 0 until 80
      xc = -L / 2 + (di + 0.5) * 5e3; yc = -L / 2 + (dj + 0.5) * 5e3
      if xc >= x0 && xc < x0 + 50e3 && yc >= y0 && yc < y0 + 50e3
    } yield {
      val fx = (xc + L / 2) / srcDx - 0.5; val fy = (yc + L / 2) / srcDx - 0.5
      val i0 = math.max(0, math.min(n - 2, math.floor(fx).toInt))
      val j0 = math.max(0, math.min(n - 2, math.floor(fy).toInt))
      val tx = math.max(0.0, math.min(1.0, fx - i0)); val ty = math.max(0.0, math.min(1.0, fy - j0))
      (1 - tx) * (1 - ty) * src(i0, j0) + tx * (1 - ty) * src(i0 + 1, j0) +
        (1 - tx) * ty * src(i0, j0 + 1) + tx * ty * src(i0 + 1, j0 + 1)
    }
    assert(dstVals.size == 100)
    assert(math.abs(mean0 - dstVals.sum / dstVals.size) < 1e-9, s"tile mean $tid0")

    // image stage: one PNG per tile with the tile's pixel dimensions
    val (_, _, images) = EndToEnd.runWithImages(spark, pixels, aux, cfg)
    val imgRows = images.collect()
    assert(imgRows.length == byTile.length)
    imgRows.foreach { r =>
      assert(r.getAs[Int]("ny") == 10 && r.getAs[Int]("nx") == 10)
      val png = r.getAs[Array[Byte]]("png")
      assert(png.length > 8 && png(1) == 'P'.toByte, "valid PNG magic")
    }
  }

  test("S8/S9: the identical slice driven from a real multi-timestep .nc file") {
    import graft.sources.{NetCDF3, NetCDFIngest}
    val L = 400e3; val srcDx = 10e3; val n = 40
    val kx = 2 * math.Pi / L; val ky = 2 * math.Pi / L
    def field(tIdx: Int, i: Int, j: Int): Double = {
      val x = -L / 2 + (i + 0.5) * srcDx; val y = -L / 2 + (j + 0.5) * srcDx
      math.sin(kx * x) * math.cos(ky * y) + tIdx
    }
    // one classic .nc holding all three timesteps (the FindLESFiles split
    // case, sources/les.py:96-112)
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-nc").toString
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("y", n), NetCDF3.Dim("x", n)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
          Seq(NetCDF3.Attr("units", NetCDF3.NcChar, "hours since 2024-01-01")),
          Array(0.0, 1.0, 2.0)),
        NetCDF3.VarSpec("y", Seq("y"), NetCDF3.NcDouble, Nil,
          Array.tabulate(n)(j => -L / 2 + (j + 0.5) * srcDx)),
        NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcDouble, Nil,
          Array.tabulate(n)(i => -L / 2 + (i + 0.5) * srcDx)),
        NetCDF3.VarSpec("w", Seq("time", "y", "x"), NetCDF3.NcDouble, Nil,
          Array.tabulate(3 * n * n) { f => field(f / (n * n), f % n, f / n % n) })),
      numRecs = 3)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "les.nc"), bytes)

    val ingested = NetCDFIngest.lesScenes(spark, s"$dir/*.nc", "w")
      .withColumn("scene_id",
        concat(lit("les__"), date_format(col("time"), "yyyyMMddHHmm")))

    val inMemory = (for {
      tIdx <- 0 until 3; i <- 0 until n; j <- 0 until n
    } yield ("les__" + f"202401010${tIdx}%d00",
        java.sql.Timestamp.valueOf(s"2024-01-01 0$tIdx:00:00"),
        -L / 2 + (i + 0.5) * srcDx, -L / 2 + (j + 0.5) * srcDx, field(tIdx, i, j)))
      .toDF("scene_id", "time", "x", "y", "value")

    val aux = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:05:00"), 11.0),
      (java.sql.Timestamp.valueOf("2024-01-01 02:20:00"), 12.0))
      .toDF("aux_time", "aux_value")
    val cfg = EndToEnd.Config(
      domain = Domain(13.3, -57.5, L, L),
      srcGrid = Regrid.GridDef(-L / 2, srcDx, n, -L / 2, srcDx, n),
      dstGrid = Regrid.GridDef(-L / 2, 5e3, 80, -L / 2, 5e3, 80),
      tileSizeM = 50e3,
      nTriplets = 4,
      dtAuxUs = 3600L * 1000000)

    // the ingested pixels ARE the in-memory pixels (doubles round-trip
    // bit-exactly through the NcDouble slab)...
    val a = ingested.select("scene_id", "time", "x", "y", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val b = inMemory.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(a == b)

    // ...so the whole pipeline produces the same stats from the file
    // (tile_mean compared with tolerance: the FP sum order differs with
    // the input partitioning, everything else must be identical)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("scene_id", "tile_id", "tile_mean", "n_px", "aux_value", "dt_us")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    val (_, statsNc) = EndToEnd.run(spark, ingested, aux, cfg)
    val (_, statsMem) = EndToEnd.run(spark, inMemory, aux, cfg)
    val (mNc, mMem) = (keyed(statsNc), keyed(statsMem))
    assert(mNc.keySet == mMem.keySet)
    mNc.foreach { case (k, (mean, nPx, auxV, dtUs)) =>
      val (mean2, nPx2, auxV2, dtUs2) = mMem(k)
      assert(math.abs(mean - mean2) < 1e-9 && nPx == nPx2 && auxV == auxV2 && dtUs == dtUs2,
        s"stats mismatch at $k")
    }
  }
}
