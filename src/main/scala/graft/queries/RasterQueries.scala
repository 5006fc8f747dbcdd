package graft.queries

import graft.{QueryDef, Tables}
import graft.core.{Domain, Projection}
import graft.operators.{Regrid, Tiler, Triplets}
import org.apache.spark.sql.functions._

/** Raster/domain operator surface (SURVEY §2.2 P1-P4, §2.5 W1, §2.8 R1,
  * §2.9 T1-T5) exercised relationally over the testdata tables so the
  * DuckDB oracle can hash-check the index math / weights algebra; the
  * gridded-fixture behaviour is covered by ScalaTest specs.
  */
object RasterQueries {
  private val Lat0 = 13.3
  private val Lon0 = -57.5

  def defs: Seq[QueryDef] = Seq(

    // ---- W1: sliding-window Tiler enumeration ---------------------------
    // grids: nx = 60 + nationkey, ny = 40; tile 16, stride 8 (y-flipped j0)
    QueryDef.sqlBacked(
      "q33_tiler",
      """SELECT scene_key, (i0 // 8) * 4 + (js // 8) AS tile_id,
        |       i0 // 8 AS i_idx, js // 8 AS j_idx,
        |       i0, 40 - (js + 16) AS j0
        |FROM (SELECT CAST(n_nationkey AS BIGINT) AS scene_key, 60 + n_nationkey AS nx FROM nation),
        |     generate_series(0, 128, 8) t1(i0),
        |     generate_series(0, 24, 8) t2(js)
        |WHERE i0 <= nx - 16""".stripMargin) { (s, d) =>
      val scenes = Tables.nation(s, d).select(
        col("n_nationkey").cast("long").as("scene_key"),
        (lit(60) + col("n_nationkey")).as("nx"), lit(40).as("ny"))
      Tiler.tileSpecs(scenes, col("nx"), col("ny"), tileN = 16, step = 8)
        .select(col("scene_key"), col("tile_id"), col("i_idx"), col("j_idx"),
          col("i0").cast("long").as("i0"), col("j0").cast("long").as("j0"))
    },

    // ---- P1/P2: projection round-trip invariants + spatial cells --------
    QueryDef.sqlBacked("q34_projection", projectionOracleSql) { (s, d) =>
      val lat = (col("c_custkey") % 120) / 2.0 - 30
      val lon = ((col("c_custkey") * 7) % 240) / 2.0 - 60
      val df = Tables.customer(s, d)
        .withColumn("lat", lat).withColumn("lon", lon)
        .withColumn("x", Projection.projX(col("lat"), col("lon"), Lat0, Lon0))
        .withColumn("y", Projection.projY(col("lat"), col("lon"), Lat0, Lon0))
        .withColumn("rlat", Projection.invLat(col("x"), col("y"), Lat0, Lon0))
        .withColumn("rlon", Projection.invLon(col("x"), col("y"), Lat0, Lon0))
      df.groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_points"),
          sum(when(abs(col("rlat") - col("lat")) < 1e-6
            && abs(col("rlon") - col("lon")) < 1e-6, 1L).otherwise(0L)).as("n_roundtrip_ok"),
          sum(Projection.cellId(col("x"), 1000.0)).as("sum_cell_x"),
          sum(Projection.cellId(col("y"), 1000.0)).as("sum_cell_y"))
    },

    // ---- R1: weights-based bilinear regrid (exact 2x2 downsample) -------
    QueryDef.sqlBacked(
      "q35_regrid",
      """SELECT dst_i, dst_j, CAST(sum(cents) AS BIGINT) * 0.25 AS value FROM (
        |  SELECT CAST(src_i // 2 AS BIGINT) AS dst_i, CAST(src_j // 2 AS BIGINT) AS dst_j,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM (SELECT event_id % 64 AS src_i, (event_id // 64) % 64 AS src_j, value FROM events)
        |  GROUP BY 1, 2)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      // src grid 64x64 (dx=1), dst grid 32x32 (dx=2): the bilinear stencil
      // degenerates to exact 1/4 weights — FP-exact, so oracle-comparable.
      val src = Tables.events(s, d)
        .select((col("event_id") % 64).cast("int").as("src_i"),
          (expr("event_id div 64") % 64).cast("int").as("src_j"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("src_i"), col("src_j"))
        .agg(sum(col("cents")).cast("double").as("value"))
      val weights = Regrid.bilinearWeights(s,
        Regrid.GridDef(0, 1, 64, 0, 1, 64), Regrid.GridDef(0, 2, 32, 0, 2, 32))
      Regrid.applyWeights(src, weights, groupCols = Nil)
        .select(col("dst_i").cast("long").as("dst_i"),
          col("dst_j").cast("long").as("dst_j"), col("value"))
    },

    // ---- §7.2 end-to-end slice over testdata-derived rasters ------------
    // pixels synthesized *from the events table* (scene = day, grid cell =
    // event hash, value = cents) so the full catalog->regrid->triplets->
    // gather->reduce->as-of chain runs against driver data. Rows-only:
    // the chain's pieces are each oracle-checked individually.
    QueryDef.rowsOnly("q48_e2e_slice") { (s, d) =>
      val L = 400e3
      val ev = Tables.events(s, d)
      val pixels = ev.select(
        concat(lit("ev__"), date_format(col("ts"), "yyyyMMdd")).as("scene_id"),
        date_trunc("day", col("ts")).as("time"),
        (lit(-L / 2) + ((col("event_id") % 40) + 0.5) * 10e3).as("x"),
        (lit(-L / 2) + ((expr("event_id div 40") % 40) + 0.5) * 10e3).as("y"),
        round(col("value") * 100).cast("long").cast("double").as("value"))
      val aux = ev.where(col("event_type") === "error")
        .groupBy(date_trunc("day", col("ts")).as("aux_time"))
        .agg(count(lit(1)).cast("double").as("aux_value"))
      val cfg = graft.pipeline.EndToEnd.Config(
        domain = Domain(Lat0, Lon0, L, L),
        srcGrid = graft.operators.Regrid.GridDef(-L / 2, 10e3, 40, -L / 2, 10e3, 40),
        dstGrid = graft.operators.Regrid.GridDef(-L / 2, 10e3, 40, -L / 2, 10e3, 40),
        tileSizeM = 100e3,
        nTriplets = 8,
        dtAuxUs = 24L * 3600 * 1000000)
      val (_, stats) = graft.pipeline.EndToEnd.run(s, pixels, aux, cfg)
      stats
    },

    // ---- T1-T5: deterministic triplet sampling (hash RNG -> rows-only) --
    QueryDef.rowsOnly("q36_triplet_specs") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val scenes = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day")).distinct()
        .select(concat(lit("ev__"), date_format(col("day"), "yyyyMMdd")).as("scene_id"))
        .withColumn("collection",
          Triplets.splitScenes(col("scene_id"), seed = 42,
            fractions = Seq("train" -> 0.8, "study" -> 0.2)))
      val triplets = s.range(0, 40).select(col("id").as("triplet_id"))
        .withColumn("collection", when(col("triplet_id") < 32, "train").otherwise("study"))
      val paired = Triplets.pairScenes(scenes, triplets, seed = 42)
      Triplets.tileSpecs(paired, Domain(Lat0, Lon0, 400e3, 400e3),
        tileSizeM = 25600, neighDistScaling = 0.1, seed = 42)
    }
  )

  /** DuckDB mirror of the azimuthal-equidistant round-trip — identical
    * operation order and the same double literals as [[Projection]]. */
  private def projectionOracleSql: String = {
    val R = Projection.EarthRadiusM
    val rad = Projection.RadPerDeg
    val degc = Projection.DegPerRad
    val sin0 = math.sin(Lat0 * rad)
    val cos0 = math.cos(Lat0 * rad)
    val lon0r = Lon0 * rad
    s"""WITH pts AS (
       |  SELECT c_nationkey,
       |    (c_custkey % 120) / 2.0 - 30 AS lat,
       |    ((c_custkey * 7) % 240) / 2.0 - 60 AS lon
       |  FROM customer),
       |ang AS (
       |  SELECT c_nationkey, lat, lon, lat * $rad AS phi, lon * $rad AS lam FROM pts),
       |cc AS (
       |  SELECT *, acos($sin0 * sin(phi) + $cos0 * cos(phi) * cos(lam - $lon0r)) AS c FROM ang),
       |kk AS (
       |  SELECT *, (CASE WHEN c = 0.0 THEN 1.0 ELSE c / sin(c) END) AS k FROM cc),
       |xy AS (
       |  SELECT c_nationkey, lat, lon,
       |    $R * k * cos(phi) * sin(lam - $lon0r) AS x,
       |    $R * k * ($cos0 * sin(phi) - $sin0 * cos(phi) * cos(lam - $lon0r)) AS y
       |  FROM kk),
       |inv AS (
       |  SELECT c_nationkey, lat, lon, x, y,
       |    sqrt(x * x + y * y) AS rho,
       |    sqrt(x * x + y * y) / $R AS ic
       |  FROM xy),
       |rt AS (
       |  SELECT c_nationkey, lat, lon, x, y,
       |    (CASE WHEN rho = 0.0 THEN $Lat0
       |          ELSE asin(cos(ic) * $sin0 + y * sin(ic) * $cos0 / rho) * $degc END) AS rlat,
       |    (CASE WHEN rho = 0.0 THEN $Lon0
       |          ELSE $Lon0 + atan2(x * sin(ic), rho * $cos0 * cos(ic) - y * $sin0 * sin(ic)) * $degc END) AS rlon
       |  FROM inv)
       |SELECT c_nationkey, count(*) AS n_points,
       |  CAST(sum(CASE WHEN abs(rlat - lat) < 0.000001 AND abs(rlon - lon) < 0.000001
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
       |  CAST(sum(CAST(floor(x / 1000.0) AS BIGINT)) AS BIGINT) AS sum_cell_x,
       |  CAST(sum(CAST(floor(y / 1000.0) AS BIGINT)) AS BIGINT) AS sum_cell_y
       |FROM rt GROUP BY 1""".stripMargin
  }
}
