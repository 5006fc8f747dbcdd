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
    },

    // ---- R1 hard case: curvilinear-grid bilinear weight generation ------
    // Fixture: a sheared + bilinearly-warped 16x16 source mesh (per-cell
    // x,y vary in BOTH indices — the projected-GOES-scene shape) and a
    // 10x10 regular destination grid. The whole inverse-bilinear chain is
    // +,-,*,/ and IEEE sqrt on integer-exact inputs, so weights hash
    // bit-identically against the oracle with NO rounding.
    QueryDef.sqlBacked(
      "q58_curvilinear_regrid",
      """WITH src AS (
        |  SELECT i // 16 AS si, i % 16 AS sj,
        |    CAST((i // 16) * 100 + (i % 16) * 5 AS DOUBLE) + 0.25 * (i // 16) * (i % 16) AS x,
        |    CAST((i % 16) * 100 - (i // 16) * 4 AS DOUBLE) + 0.125 * (i % 16) * (i % 16) AS y
        |  FROM range(0, 256) r(i)),
        |quads AS (
        |  SELECT a.si, a.sj, a.x AS x00, a.y AS y00, b.x AS x10, b.y AS y10,
        |         c.x AS x01, c.y AS y01, d.x AS x11, d.y AS y11
        |  FROM src a JOIN src b ON b.si = a.si + 1 AND b.sj = a.sj
        |             JOIN src c ON c.si = a.si AND c.sj = a.sj + 1
        |             JOIN src d ON d.si = a.si + 1 AND d.sj = a.sj + 1),
        |dst AS (
        |  SELECT k // 10 AS di, k % 10 AS dj,
        |    CAST(200 + (k // 10) * 100 AS DOUBLE) AS x,
        |    CAST(200 + (k % 10) * 100 AS DOUBLE) AS y
        |  FROM range(0, 100) r(k)),
        |geo AS (
        |  SELECT di, dj, si, sj,
        |    dst.x - x00 AS qx, dst.y - y00 AS qy,
        |    x10 - x00 AS bxv, y10 - y00 AS byv,
        |    x01 - x00 AS cxv, y01 - y00 AS cyv,
        |    x11 - x10 - x01 + x00 AS dxv, y11 - y10 - y01 + y00 AS dyv
        |  FROM dst CROSS JOIN quads),
        |co AS (
        |  SELECT *, bxv * dyv - byv * dxv AS aa,
        |    (bxv * cyv - byv * cxv) - (qx * dyv - qy * dxv) AS bb,
        |    -(qx * cyv - qy * cxv) AS cc
        |  FROM geo),
        |dd AS (SELECT *, bb * bb - 4.0 * aa * cc AS disc FROM co WHERE bb * bb - 4.0 * aa * cc >= 0.0),
        |ss AS (
        |  SELECT *, CASE WHEN abs(aa) < 1e-30 THEN -cc / bb
        |      ELSE CASE WHEN (-bb + sqrt(disc)) / (2.0 * aa) >= -1e-9
        |                 AND (-bb + sqrt(disc)) / (2.0 * aa) <= 1.0 + 1e-9
        |            THEN (-bb + sqrt(disc)) / (2.0 * aa)
        |            ELSE (-bb - sqrt(disc)) / (2.0 * aa) END END AS s
        |  FROM dd),
        |tt AS (
        |  SELECT *, CASE WHEN abs(cxv + s * dxv) >= abs(cyv + s * dyv)
        |    THEN (qx - s * bxv) / (cxv + s * dxv)
        |    ELSE (qy - s * byv) / (cyv + s * dyv) END AS t
        |  FROM ss),
        |hit AS (
        |  SELECT di, dj, si, sj, s, t,
        |    row_number() OVER (PARTITION BY di, dj
        |      ORDER BY greatest(abs(s - 0.5), abs(t - 0.5)), si, sj) AS rn
        |  FROM tt
        |  WHERE s >= -1e-9 AND s <= 1.0 + 1e-9 AND t >= -1e-9 AND t <= 1.0 + 1e-9)
        |SELECT di AS dst_i, dj AS dst_j,
        |  si + CASE WHEN k IN (1, 3) THEN 1 ELSE 0 END AS src_i,
        |  sj + CASE WHEN k IN (2, 3) THEN 1 ELSE 0 END AS src_j,
        |  CASE k WHEN 0 THEN (1.0 - s) * (1.0 - t) WHEN 1 THEN s * (1.0 - t)
        |         WHEN 2 THEN (1.0 - s) * t ELSE s * t END AS w
        |FROM hit CROSS JOIN range(0, 4) r(k)
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val src = s.range(256).select(
        expr("id div 16").as("src_i"), (col("id") % 16).as("src_j"))
        .withColumn("x", (col("src_i") * 100 + col("src_j") * 5).cast("double")
          + lit(0.25) * col("src_i") * col("src_j"))
        .withColumn("y", (col("src_j") * 100 - col("src_i") * 4).cast("double")
          + lit(0.125) * col("src_j") * col("src_j"))
      val dst = s.range(100).select(
        expr("id div 10").as("dst_i"), (col("id") % 10).as("dst_j"))
        .withColumn("x", (lit(200) + col("dst_i") * 100).cast("double"))
        .withColumn("y", (lit(200) + col("dst_j") * 100).cast("double"))
      Regrid.curvilinearBilinearWeights(src, dst, binSize = 256.0)
    },

    // ---- R1/R2: great-circle nearest (xESMF nearest_s2d) ----------------
    // Integer indices + w=1.0 out, so argmin selection only has to agree
    // across engines (margins are macroscopic) — exact hash, no rounding.
    QueryDef.sqlBacked(
      "q59_greatcircle_nearest",
      s"""WITH src AS (
         |  SELECT i // 16 AS si, i % 16 AS sj,
         |    (i // 16 - 8) * 0.5 + 0.01 * (i % 16) AS lat,
         |    (i % 16 - 8) * 0.5 + 0.02 * (i // 16) AS lon
         |  FROM range(0, 256) r(i)),
         |dst AS (
         |  SELECT k // 5 AS di, k % 5 AS dj,
         |    -3.0 + (k // 5) * 1.3 AS lat, -3.0 + (k % 5) * 1.3 AS lon
         |  FROM range(0, 25) r(k)),
         |scored AS (
         |  SELECT di, dj, si, sj,
         |    row_number() OVER (PARTITION BY di, dj ORDER BY
         |      sin((src.lat - dst.lat) * ${graft.core.Projection.RadPerDeg / 2})
         |        * sin((src.lat - dst.lat) * ${graft.core.Projection.RadPerDeg / 2})
         |      + cos(dst.lat * ${graft.core.Projection.RadPerDeg})
         |        * cos(src.lat * ${graft.core.Projection.RadPerDeg})
         |        * sin((src.lon - dst.lon) * ${graft.core.Projection.RadPerDeg / 2})
         |        * sin((src.lon - dst.lon) * ${graft.core.Projection.RadPerDeg / 2}),
         |      si, sj) AS rn
         |  FROM dst CROSS JOIN src)
         |SELECT di AS dst_i, dj AS dst_j, si AS src_i, sj AS src_j, 1.0 AS w
         |FROM scored WHERE rn = 1""".stripMargin) { (s, d) =>
      val src = s.range(256).select(
        expr("id div 16").as("src_i"), (col("id") % 16).as("src_j"))
        .withColumn("lat", (col("src_i") - 8) * 0.5 + lit(0.01) * col("src_j"))
        .withColumn("lon", (col("src_j") - 8) * 0.5 + lit(0.02) * col("src_i"))
      val dst = s.range(25).select(
        expr("id div 5").as("dst_i"), (col("id") % 5).as("dst_j"))
        .withColumn("lat", lit(-3.0) + col("dst_i") * 1.3)
        .withColumn("lon", lit(-3.0) + col("dst_j") * 1.3)
      Regrid.greatCircleNearestWeights(src, dst, binSizeDeg = 2.0)
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
