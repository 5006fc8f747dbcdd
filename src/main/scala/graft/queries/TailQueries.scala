package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.ImageOps
import graft.operators.{Flow, KMeansLloyd, Profiles, TensorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-tail queries: DuckDB-hash coverage for the last SURVEY §2
  * operators that previously carried specs only — W4 (hydrostatic-style
  * bottom-up recurrence), C7/C8 (image math + RGB stacking/resize),
  * J6/T8 (tile gather + shape/checksum assertion), and W2 (pyramidal
  * Lucas-Kanade optical flow on a planted pure translation).
  *
  * Every output cell is engine-exact: integral doubles for all FP sums,
  * IEEE-defined +,-,*,/ and correctly-rounded sqrt in identical token
  * order on both sides, and integer-rounded LK displacements whose
  * analytic value is a planted constant.
  */
object TailQueries {

  // ---- q147 frame fixture: the LucasKanadeSpec blob field -------------
  private val FlowN = 64
  private val FlowCenters =
    Seq((14.0, 18.0), (34.0, 12.0), (22.0, 40.0), (46.0, 44.0), (50.0, 24.0))

  /** Smooth 5-blob field translated by (sx, sy) — structure for
    * Shi-Tomasi, exactly translated so LK's answer is analytic. */
  private def flowField(sx: Double, sy: Double): Array[Double] =
    Array.tabulate(FlowN * FlowN) { k =>
      val x = k % FlowN; val y = k / FlowN
      FlowCenters.map { case (cx, cy) =>
        val dx = x - cx - sx; val dy = y - cy - sy
        math.exp(-(dx * dx + dy * dy) / 18.0)
      }.sum
    }

  def defs: Seq[QueryDef] = Seq(

    // ---- W4: bottom-up hydrostatic-style recurrence ---------------------
    // Reference: convml_data/sources/era5/utils.py:31-154 (geopotential
    // accumulated bottom-up over model levels). The affine recurrence
    // z_k = z_{k+1} + coef(level_k)·v_k is exactly the descending-level
    // cumulative sum, so the DuckDB window mirrors the mapGroups scan
    // term for term; coef·v terms are integral doubles -> exact FP in
    // any association order.
    QueryDef.sqlBacked(
      "q144_hydrostatic_recurrence",
      """SELECT CAST(event_id // 64 AS VARCHAR) AS key,
        |  CAST(event_id % 64 AS INT) AS level,
        |  sum(CAST((event_id % 64) % 7 + 1 AS DOUBLE)
        |      * CAST(round(value * 100) AS DOUBLE))
        |    OVER (PARTITION BY event_id // 64
        |          ORDER BY event_id % 64 DESC) AS z
        |FROM events""".stripMargin) { (s, d) =>
      import s.implicits._
      val levels = Tables.events(s, d).select(
        expr("event_id div 64").cast("string").as("key"),
        (col("event_id") % 64).cast("int").as("level"),
        round(col("value") * 100).cast("double").as("v"))
        .as[Profiles.LevelRow]
      Profiles.bottomUpRecurrence(levels, l => (l % 7 + 1).toDouble)
        .toDF("key", "level", "z")
    },

    // ---- C7/C8: image math chain + RGB stack + nearest resize -----------
    // Reference: convml_data/sources/goes16/utils.py:5-55 (clip, gamma,
    // true-green combo), sources/images.py:12-141 (contrast, uint8
    // quantize, RGB stacking). Channels are synthesized per event as
    // n/1000 doubles (correctly-rounded division -> engine-identical);
    // the chain is true-green -> clip -> gamma 0.5 (IEEE sqrt) ->
    // contrast 1.2 -> clip -> uint8 quantize, then C8: stack three
    // stages interleaved-RGB and nearest-resize 4x4 -> 2x2 (pure index
    // picks). Output sums are exact integer arithmetic.
    QueryDef.sqlBacked("q145_image_math", imageMathOracleSql) { (s, d) =>
      def chan(mulA: Int, mulB: Int) = transform(sequence(lit(0), lit(15)),
        i => ((col("event_id") * mulA + i * mulB) % 1000).cast("double") / 1000.0)
      val df = Tables.events(s, d)
        .withColumn("r", chan(7, 13))
        .withColumn("g", chan(11, 17))
        .withColumn("b", chan(13, 19))
        .withColumn("tg", ImageOps.trueGreen(col("r"), col("b"), col("g")))
        .withColumn("c1", ImageOps.clipArr(col("tg"), 0.02, 0.98))
        .withColumn("gm", ImageOps.gammaArr(col("c1"), 0.5))
        .withColumn("ct", ImageOps.contrastArr(col("gm"), 1.2))
        .withColumn("c2", ImageOps.clipArr(col("ct"), 0.0, 1.0))
        .withColumn("q8", ImageOps.quantizeU8(col("c2")))
        .withColumn("rgb", ImageOps.stackRgb(col("c2"), col("c1"), col("tg")))
        .withColumn("rz",
          ImageOps.quantizeU8(ImageOps.resizeRgbNearest(col("rgb"), 4, 4, 2, 2)))
      df.select(col("event_id"),
        aggregate(col("q8"), lit(0L), (a, v) => a + v).as("sum_q8"),
        aggregate(col("rz"), lit(0L), (a, v) => a + v).as("sum_rz"))
    },

    // ---- J6/T8: spatial-cell tile gather + shape/checksum ---------------
    // Reference: convml_data/pipeline/tiles.py:251-297 (per-tile pixel
    // gather + shape assertion). Pixels derive positions from event ids
    // on a 1 km lattice; 25 nation tiles (8 km) gather via the
    // cell-bucketed equi-join (never a cross join); the oracle states
    // the bbox predicate directly — the cell cover being exact is the
    // claim under test. n_px is T8's shape check; the checksum weights
    // each pixel by its lattice coordinates (half-integer · integer
    // cents -> exact FP in any order).
    QueryDef.sqlBacked(
      "q146_tile_gather",
      """WITH px AS (
        |  SELECT CAST(event_id % 3 AS BIGINT) AS scene_id,
        |    (CAST(event_id % 50 AS DOUBLE) + 0.5) * 1000.0 AS x,
        |    (CAST((event_id // 50) % 50 AS DOUBLE) + 0.5) * 1000.0 AS y,
        |    CAST(round(value * 100) AS DOUBLE) AS value
        |  FROM events),
        |tiles AS (
        |  SELECT CAST(n_nationkey % 3 AS BIGINT) AS scene_id,
        |    CAST(n_nationkey AS BIGINT) AS tile_id,
        |    CAST((n_nationkey * 7) % 43 AS DOUBLE) * 1000.0 AS x0,
        |    CAST((n_nationkey * 11) % 43 AS DOUBLE) * 1000.0 AS y0
        |  FROM nation)
        |SELECT p.scene_id, t.tile_id, CAST(count(*) AS BIGINT) AS n_px,
        |  sum(p.value) AS sum_cents,
        |  sum(p.value * (p.x / 1000.0 + p.y / 1000.0)) AS checksum
        |FROM px p JOIN tiles t ON t.scene_id = p.scene_id
        |  AND p.x >= t.x0 AND p.x < t.x0 + 8000.0
        |  AND p.y >= t.y0 AND p.y < t.y0 + 8000.0
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val px = Tables.events(s, d).select(
        (col("event_id") % 3).cast("long").as("scene_id"),
        ((col("event_id") % 50).cast("double") + 0.5) * 1000.0 as "x",
        ((expr("event_id div 50") % 50).cast("double") + 0.5) * 1000.0 as "y",
        round(col("value") * 100).cast("double").as("value"))
      val tiles = Tables.nation(s, d).select(
        (col("n_nationkey") % 3).cast("long").as("scene_id"),
        col("n_nationkey").cast("long").as("tile_id"),
        ((col("n_nationkey") * 7) % 43).cast("double") * 1000.0 as "x0",
        ((col("n_nationkey") * 11) % 43).cast("double") * 1000.0 as "y0")
      TensorOps.gatherTiles(px, tiles, tileSizeM = 8000.0, cellSizeM = 8000.0)
        .groupBy(col("scene_id"), col("tile_id"))
        .agg(count(lit(1)).as("n_px"), sum(col("value")).as("sum_cents"),
          sum(col("value") * (col("x") / 1000.0 + col("y") / 1000.0)).as("checksum"))
    },

    // ---- W2: pyramidal LK optical flow on planted translation -----------
    // Reference: convml_data/sampling/rect/methods/flow/calc.py:19-207
    // (Shi-Tomasi seeds + frame-to-frame LK chaining). Each region plants
    // a 3-frame scene whose blob field translates by an integer
    // (sx, sy) = (rk%3 - 1, 2·(rk%2) - 1) per step, so every tracked
    // point's per-step displacement rounds to exactly that constant
    // (LK accuracy < 0.1 px on this field — LucasKanadeSpec) and no
    // interior point is ever lost. The oracle restates the planted
    // shifts; corner POSITIONS (not analytic) never reach the output.
    QueryDef.sqlBacked(
      "q147_optical_flow",
      """SELECT 'rg' || CAST(r_regionkey AS VARCHAR) AS grp,
        |  CAST(seq AS INT) AS seq,
        |  CAST(r_regionkey % 3 - 1 AS BIGINT) AS dx_min,
        |  CAST(r_regionkey % 3 - 1 AS BIGINT) AS dx_max,
        |  CAST(2 * (r_regionkey % 2) - 1 AS BIGINT) AS dy_min,
        |  CAST(2 * (r_regionkey % 2) - 1 AS BIGINT) AS dy_max,
        |  CAST(0 AS BIGINT) AS n_lost
        |FROM region, range(1, 3) t(seq)""".stripMargin) { (s, d) =>
      import s.implicits._
      val frames = Tables.region(s, d).select(col("r_regionkey").cast("int")).as[Int]
        .flatMap { rk =>
          val sx = (rk % 3 - 1).toDouble; val sy = (2 * (rk % 2) - 1).toDouble
          (0 until 3).map(t =>
            Flow.Frame(s"rg$rk", t, FlowN, FlowN, flowField(sx * t, sy * t)))
        }
      val tracks = Flow.chainTrajectoriesLK(frames,
        maxCorners = 10, qualityLevel = 0.05, minDistance = 6.0,
        winRadius = 7, levels = 3).toDF()
      val w = Window.partitionBy(col("group"), col("traj_id")).orderBy(col("seq"))
      tracks
        .withColumn("px", lag(col("x"), 1).over(w))
        .withColumn("py", lag(col("y"), 1).over(w))
        .where(col("seq") >= 1)
        .groupBy(col("group").as("grp"), col("seq"))
        .agg(
          min(when(col("x") >= 0 && col("px") >= 0,
            round(col("x") - col("px")))).cast("long").as("dx_min"),
          max(when(col("x") >= 0 && col("px") >= 0,
            round(col("x") - col("px")))).cast("long").as("dx_max"),
          min(when(col("x") >= 0 && col("px") >= 0,
            round(col("y") - col("py")))).cast("long").as("dy_min"),
          max(when(col("x") >= 0 && col("px") >= 0,
            round(col("y") - col("py")))).cast("long").as("dy_max"),
          sum(when(col("x") < 0, 1L).otherwise(0L)).as("n_lost"))
    },

    // ---- M3: from-scratch distributed KMeans fit ------------------------
    // Seeded Lloyd's on planted integral 2-D blobs (4 clusters derived
    // from event ids): hashUnit init, 2 assign+update rounds, final
    // E-step. Every quantity is engine-exact — init ranks on the shared
    // poly-hash, d2 folds in fixed dim order, argmin ties break
    // (d2, cell), and centroid means are exact-integer sums / counts —
    // so the oracle replays the whole fit and the hash pins centroids
    // AND assignment (sum_ids) together. Empty cells keep their
    // previous centroid (duplicate init vectors exercise this).
    QueryDef.sqlBacked("q151_kmeans_fit", kmeansOracleSql) { (s, d) =>
      import s.implicits._
      val pts = Tables.events(s, d).select(
        col("event_id").as("id"),
        array(
          ((col("event_id") % 4) * 100 + (col("event_id") % 7) - 3).cast("double"),
          (lit(50) + (col("event_id") % 4) * 30 + (expr("event_id div 7") % 5) - 2)
            .cast("double")).as("v"))
      val (model, assigned) =
        KMeansLloyd.fit(pts, "id", "v", k = 4, dim = 2, seed = 42, rounds = 2)
      val cdf = model.cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c(0), c(1)) }.toDF("cell", "c0", "c1")
      assigned.groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n_points"), sum(col("id")).as("sum_ids"))
        .join(cdf, "cell")
        .select(col("cell"), col("n_points"), col("c0"), col("c1"), col("sum_ids"))
    }
  )

  /** Poly-hash unit mirror (identical tokens to Triplets.hashUnit —
    * the RasterQueries helper specialized to '42|id'). */
  private def kmHuSql: String = {
    val s = "'42|' || CAST(id AS VARCHAR)"
    val h = s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"[CAST(ord(substr($s, j, 1)) AS BIGINT) FOR j IN range(1, len($s) + 1)]), " +
      s"(a, b) -> (a * 31 + b) % 1000000007)"
    s"(CAST(((($h) * 2654435761) % 1000000007) * ((($h) * 2654435761) % 1000000007) " +
      s"% 1000000007 AS DOUBLE) / 1000000007.0)"
  }

  /** DuckDB replay of the q151 fit: init -> (assign, update) x2 ->
    * final assign, with the same d2 token order, (d2, cell) tie-break
    * and keep-old empty-cell rule. */
  private def kmeansOracleSql: String = {
    def assignCte(name: String, centsRel: String) =
      s"""$name AS (
         |  SELECT id, x0, x1, cell FROM (
         |    SELECT p.id, p.x0, p.x1, c.cell,
         |      row_number() OVER (PARTITION BY p.id ORDER BY
         |        (p.x0 - c.c0) * (p.x0 - c.c0)
         |          + (p.x1 - c.c1) * (p.x1 - c.c1), c.cell) AS rn
         |    FROM pts p CROSS JOIN $centsRel c)
         |  WHERE rn = 1)""".stripMargin
    def updateCte(name: String, assignRel: String, prevRel: String) =
      s"""$name AS (
         |  SELECT i.cell, coalesce(s.c0, i.c0) AS c0, coalesce(s.c1, i.c1) AS c1
         |  FROM $prevRel i LEFT JOIN (
         |    SELECT cell, sum(x0) / count(*) AS c0, sum(x1) / count(*) AS c1
         |    FROM $assignRel GROUP BY 1) s USING (cell))""".stripMargin
    s"""WITH pts AS (
       |  SELECT event_id AS id,
       |    CAST((event_id % 4) * 100 + (event_id % 7) - 3 AS DOUBLE) AS x0,
       |    CAST(50 + (event_id % 4) * 30 + ((event_id // 7) % 5) - 2 AS DOUBLE) AS x1
       |  FROM events),
       |init AS (
       |  SELECT cell, c0, c1 FROM (
       |    SELECT row_number() OVER (ORDER BY $kmHuSql, id) - 1 AS cell,
       |      x0 AS c0, x1 AS c1
       |    FROM pts)
       |  WHERE cell < 4),
       |${assignCte("a1", "init")},
       |${updateCte("c1r", "a1", "init")},
       |${assignCte("a2", "c1r")},
       |${updateCte("c2r", "a2", "c1r")},
       |${assignCte("a3", "c2r")}
       |SELECT CAST(a.cell AS BIGINT) AS cell,
       |  CAST(count(*) AS BIGINT) AS n_points, any_value(c.c0) AS c0,
       |  any_value(c.c1) AS c1, CAST(sum(a.id) AS BIGINT) AS sum_ids
       |FROM a3 a JOIN c2r c USING (cell)
       |GROUP BY a.cell""".stripMargin
  }

  /** DuckDB mirror of the q145 chain — identical token order per FP op:
    * true-green ((r·.4836 + b·.4571) + g·.0604), clip via
    * greatest/least, gamma 0.5 as IEEE sqrt, contrast (1.2·(v-.5))+.5,
    * uint8 quantize round(clip·255); C8 stack interleaves (c2,c1,tg)
    * and the 4x4->2x2 nearest resize picks src (2j,2i). */
  private def imageMathOracleSql: String = {
    def chan(mulA: Int, mulB: Int) =
      s"[CAST((event_id * $mulA + i * $mulB) % 1000 AS DOUBLE) / 1000.0 FOR i IN range(0, 16)]"
    """WITH base AS (
      |  SELECT event_id,
      |    RCH AS r, GCH AS g, BCH AS b
      |  FROM events),
      |tg AS (
      |  SELECT event_id,
      |    [(r[i] * 0.4836 + b[i] * 0.4571) + g[i] * 0.0604 FOR i IN range(1, 17)] AS tg
      |  FROM base),
      |chain AS (
      |  SELECT event_id, tg,
      |    [greatest(0.02, least(0.98, v)) FOR v IN tg] AS c1
      |  FROM tg),
      |chain2 AS (
      |  SELECT event_id, tg, c1,
      |    [greatest(0.0, least(1.0, (1.2 * (sqrt(v) - 0.5)) + 0.5)) FOR v IN c1] AS c2
      |  FROM chain),
      |rgb AS (
      |  SELECT event_id, c2,
      |    flatten([[c2[i], c1[i], tg[i]] FOR i IN range(1, 17)]) AS rgb
      |  FROM chain2),
      |rz AS (
      |  SELECT event_id, c2,
      |    [rgb[((idx // 6) * 2 * 4 + ((idx % 6) // 3) * 2) * 3 + idx % 3 + 1]
      |       FOR idx IN range(0, 12)] AS rz
      |  FROM rgb)
      |SELECT event_id,
      |  CAST(list_sum([CAST(round(greatest(0.0, least(1.0, v)) * 255) AS BIGINT)
      |                 FOR v IN c2]) AS BIGINT) AS sum_q8,
      |  CAST(list_sum([CAST(round(greatest(0.0, least(1.0, v)) * 255) AS BIGINT)
      |                 FOR v IN rz]) AS BIGINT) AS sum_rz
      |FROM rz""".stripMargin
      .replace("RCH", chan(7, 13))
      .replace("GCH", chan(11, 17))
      .replace("BCH", chan(13, 19))
  }
}
