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
    // gather->reduce->as-of chain runs against driver data. Fully
    // oracle-backed: cents are integral doubles (exact FP sums in any
    // order), the identity regrid's weights are exact 0/1, placements are
    // the shared poly-hash, and the day-bucketed as-of reduces to a
    // same-day join — so tile_mean hashes with NO rounding.
    QueryDef.sqlBacked("q48_e2e_slice", e2eOracleSql) { (s, d) =>
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

    // ---- T1-T5: deterministic triplet sampling ---------------------------
    // Fully oracle-backed since the placement hash moved to the shared
    // mod-P polynomial: split, pairing ranks, anchor/distant uniforms and
    // the clamped neighbor ring all mirror token-for-token in DuckDB
    // (coordinates rounded to 6 dp — the cos/sin ring is the only libm).
    QueryDef.sqlBacked("q36_triplet_specs", tripletOracleSql) { (s, d) =>
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
        .select(col("collection"), col("triplet_id"), col("tile_type"), col("scene_id"),
          round(col("x"), 6).as("x_r6"), round(col("y"), 6).as("y_r6"))
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

  /** Hash-unit mirror: poly-hash of a string expression, avalanche-mixed
    * (salt-multiply + square mod P) and divided by P — identical tokens
    * to `Triplets.hashUnit`. Shared with [[SourceQueries]]' q228. */
  private[queries] def huSql(sExpr: String): String = {
    val h = s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"[CAST(ord(substr($sExpr, j, 1)) AS BIGINT) FOR j IN range(1, len($sExpr) + 1)]), " +
      s"(a, b) -> (a * 31 + b) % 1000000007)"
    s"(CAST(((($h) * 2654435761) % 1000000007) * ((($h) * 2654435761) % 1000000007) " +
      s"% 1000000007 AS DOUBLE) / 1000000007.0)"
  }

  /** DuckDB mirror of the FULL §7.2 slice (q48): pixels -> identity
    * regrid (explicit 0/1 weights incl. the zero-weight stencil rows that
    * create empty-cell outputs) -> poly-hash triplet placement -> tile
    * gather (direct bbox predicate; the Spark cell-bucket join is an
    * exact cover) -> per-tile mean (sum/count over integral cents) ->
    * same-day as-of (the 12h half-window can only match the scene's own
    * day on a daily aux timeline). */
  private def e2eOracleSql: String = {
    val tile = 100000.0
    val margin = 2.0 / 3.0 * tile
    val dom = Domain(Lat0, Lon0, 400e3, 400e3)
    val (xl, xh) = (dom.xMin + margin, dom.xMax - margin)
    val (yl, yh) = (dom.yMin + margin, dom.yMax - margin)
    val cut1 = 0.0 + 0.8
    val cut2 = cut1 + 0.2
    val total = Seq(0.8, 0.2).sum
    val r = 0.1 * tile
    def hu(tail: String) = huSql(s"'42|' || CAST(triplet_id AS VARCHAR) || '$tail'")
    s"""WITH cellsum AS (
       |  SELECT 'ev__' || strftime(ts, '%Y%m%d') AS scene_id,
       |    date_trunc('day', ts) AS time,
       |    event_id % 40 AS src_i, (event_id // 40) % 40 AS src_j,
       |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)) AS value
       |  FROM events GROUP BY 1, 2, 3, 4),
       |weights AS (
       |  SELECT di, dj, least(38, di) + ci AS src_i, least(38, dj) + cj AS src_j,
       |    CAST((CASE WHEN ci = 0 THEN 1 - (di - least(38, di)) ELSE di - least(38, di) END)
       |       * (CASE WHEN cj = 0 THEN 1 - (dj - least(38, dj)) ELSE dj - least(38, dj) END)
       |      AS DOUBLE) AS w
       |  FROM range(0, 40) a(di), range(0, 40) b(dj), range(0, 2) c(ci), range(0, 2) d(cj)),
       |regridded AS (
       |  SELECT scene_id, time, di, dj, sum(w * value) AS value,
       |    -200000.0 + (di + 0.5) * 10000.0 AS x, -200000.0 + (dj + 0.5) * 10000.0 AS y
       |  FROM cellsum JOIN weights USING (src_i, src_j)
       |  GROUP BY 1, 2, 3, 4),
       |scenes AS (SELECT DISTINCT scene_id FROM cellsum),
       |split AS (
       |  SELECT scene_id,
       |    CASE WHEN u < $cut1 THEN 'train' WHEN u < $cut2 THEN 'study' ELSE 'study' END AS collection
       |  FROM (SELECT scene_id, ${huSql("'42|' || scene_id")} * $total AS u FROM scenes)),
       |ranked AS (
       |  SELECT scene_id, collection,
       |    row_number() OVER (PARTITION BY collection ORDER BY scene_id) - 1 AS rank
       |  FROM split WHERE collection = 'train'),
       |counts AS (
       |  SELECT collection, count(*) AS n_scenes FROM ranked
       |  GROUP BY 1 HAVING count(*) >= 2),
       |picks AS (
       |  SELECT triplet_id, collection, a_rank,
       |    CASE WHEN d_draw >= a_rank THEN d_draw + 1 ELSE d_draw END AS d_rank
       |  FROM (
       |    SELECT t.triplet_id, c.collection,
       |      CAST(floor(${hu("|anchor")} * c.n_scenes) AS INT) AS a_rank,
       |      CAST(floor(${hu("|distant")} * (c.n_scenes - 1)) AS INT) AS d_draw
       |    FROM range(0, 8) t(triplet_id) CROSS JOIN counts c)),
       |paired AS (
       |  SELECT p.collection, p.triplet_id,
       |    ra.scene_id AS anchor_scene, rd.scene_id AS distant_scene
       |  FROM picks p
       |  JOIN ranked ra ON ra.collection = p.collection AND ra.rank = p.a_rank
       |  JOIN ranked rd ON rd.collection = p.collection AND rd.rank = p.d_rank),
       |placed AS (
       |  SELECT *,
       |    $xl + ${hu("|anchor|x")} * ${xh - xl} AS ax,
       |    $yl + ${hu("|anchor|y")} * ${yh - yl} AS ay,
       |    (${hu("|neighbor|theta")} * 2.0) * ${math.Pi} AS theta,
       |    $xl + ${hu("|distant|x")} * ${xh - xl} AS dx,
       |    $yl + ${hu("|distant|y")} * ${yh - yl} AS dy
       |  FROM paired),
       |specs AS (
       |  SELECT scene_id, lpad(CAST(triplet_id AS VARCHAR), 5, '0') || '_' || tile_type AS tile_id,
       |    x - ${tile / 2} AS x0, y - ${tile / 2} AS y0
       |  FROM (
       |    SELECT triplet_id, 'anchor' AS tile_type, anchor_scene AS scene_id,
       |      ax AS x, ay AS y FROM placed
       |    UNION ALL
       |    SELECT triplet_id, 'neighbor', anchor_scene,
       |      greatest($xl, least($xh, ax + $r * cos(theta))),
       |      greatest($yl, least($yh, ay + $r * sin(theta))) FROM placed
       |    UNION ALL
       |    SELECT triplet_id, 'distant', distant_scene, dx, dy FROM placed)),
       |tilestats AS (
       |  SELECT g.scene_id, g.time, g.tile_id,
       |    sum(g.value) / count(*) AS tile_mean, count(*) AS n_px
       |  FROM (
       |    SELECT r.scene_id, r.time, s.tile_id, r.value
       |    FROM regridded r JOIN specs s ON s.scene_id = r.scene_id
       |      AND r.x >= s.x0 AND r.x < s.x0 + $tile
       |      AND r.y >= s.y0 AND r.y < s.y0 + $tile) g
       |  GROUP BY 1, 2, 3),
       |aux AS (
       |  SELECT date_trunc('day', ts) AS aux_time, CAST(count(*) AS DOUBLE) AS aux_value
       |  FROM events WHERE event_type = 'error' GROUP BY 1)
       |SELECT t.scene_id, t.time, t.tile_id, t.tile_mean, t.n_px,
       |  a.aux_time, a.aux_value, CAST(0 AS BIGINT) AS dt_us
       |FROM tilestats t JOIN aux a ON a.aux_time = t.time""".stripMargin
  }

  /** DuckDB mirror of the T1-T5 chain with the exact Scala-computed
    * double constants interpolated (margins, cuts, ring radius). */
  private def tripletOracleSql: String = {
    val tile = 25600.0
    val margin = 2.0 / 3.0 * tile
    val dom = Domain(Lat0, Lon0, 400e3, 400e3)
    val (xl, xh) = (dom.xMin + margin, dom.xMax - margin)
    val (yl, yh) = (dom.yMin + margin, dom.yMax - margin)
    val total = Seq(0.8, 0.2).sum
    val cut1 = 0.0 + 0.8
    val cut2 = cut1 + 0.2
    val r = 0.1 * tile
    val twoPi = 2.0 * math.Pi // NOTE Scala order is (u * 2.0) * pi
    def hu(tail: String) = huSql(s"'42|' || CAST(triplet_id AS VARCHAR) || '$tail'")
    s"""WITH scenes AS (
       |  SELECT DISTINCT 'ev__' || strftime(date_trunc('day', ts), '%Y%m%d') AS scene_id
       |  FROM events),
       |split AS (
       |  SELECT scene_id,
       |    CASE WHEN u < $cut1 THEN 'train' WHEN u < $cut2 THEN 'study' ELSE 'study' END AS collection
       |  FROM (SELECT scene_id,
       |          ${huSql("'42|' || scene_id")} * $total AS u FROM scenes)),
       |ranked AS (
       |  SELECT scene_id, collection,
       |    row_number() OVER (PARTITION BY collection ORDER BY scene_id) - 1 AS rank
       |  FROM split),
       |counts AS (
       |  SELECT collection, count(*) AS n_scenes FROM ranked
       |  GROUP BY 1 HAVING count(*) >= 2),
       |triplets AS (
       |  SELECT t AS triplet_id, CASE WHEN t < 32 THEN 'train' ELSE 'study' END AS collection
       |  FROM range(0, 40) r(t)),
       |picks AS (
       |  SELECT triplet_id, collection, a_rank,
       |    CASE WHEN d_draw >= a_rank THEN d_draw + 1 ELSE d_draw END AS d_rank
       |  FROM (
       |    SELECT t.triplet_id, t.collection,
       |      CAST(floor(${hu("|anchor")} * c.n_scenes) AS INT) AS a_rank,
       |      CAST(floor(${hu("|distant")} * (c.n_scenes - 1)) AS INT) AS d_draw
       |    FROM triplets t JOIN counts c ON c.collection = t.collection)),
       |paired AS (
       |  SELECT p.collection, p.triplet_id,
       |    ra.scene_id AS anchor_scene, rd.scene_id AS distant_scene
       |  FROM picks p
       |  JOIN ranked ra ON ra.collection = p.collection AND ra.rank = p.a_rank
       |  JOIN ranked rd ON rd.collection = p.collection AND rd.rank = p.d_rank),
       |placed AS (
       |  SELECT *,
       |    $xl + ${hu("|anchor|x")} * ${xh - xl} AS ax,
       |    $yl + ${hu("|anchor|y")} * ${yh - yl} AS ay,
       |    (${hu("|neighbor|theta")} * 2.0) * ${math.Pi} AS theta,
       |    $xl + ${hu("|distant|x")} * ${xh - xl} AS dx,
       |    $yl + ${hu("|distant|y")} * ${yh - yl} AS dy
       |  FROM paired)
       |SELECT collection, triplet_id, tile_type, scene_id,
       |  round(x, 6) AS x_r6, round(y, 6) AS y_r6
       |FROM (
       |  SELECT collection, triplet_id, 'anchor' AS tile_type,
       |    anchor_scene AS scene_id, ax AS x, ay AS y FROM placed
       |  UNION ALL
       |  SELECT collection, triplet_id, 'neighbor', anchor_scene,
       |    greatest($xl, least($xh, ax + $r * cos(theta))),
       |    greatest($yl, least($yh, ay + $r * sin(theta))) FROM placed
       |  UNION ALL
       |  SELECT collection, triplet_id, 'distant', distant_scene, dx, dy FROM placed)""".stripMargin
  }

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
