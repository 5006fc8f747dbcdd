package graft.operators

import graft.core.Domain
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Triplet sampling: scene splits, scene pairing, and deterministic random
  * tile placement.
  *
  * Reference: convml_data/pipeline/triplets.py:30-172 (T1 split, T2
  * pairing, T5 assembly) and convml_data/sampling/triplets.py:8-104 (T3
  * random location, T4 neighbor perturbation).
  *
  * The reference's RNG is pid-seeded and non-reproducible (CHANGELOG PR#19;
  * SURVEY §7.4.3); it also drops the rng on rejection retries
  * (sampling/triplets.py:41-44). We replace both wart and bug with
  * *key-derived* randomness: every variate is a pure function of
  * (seed, triplet_id, tile_type, draw_index) via xxhash64 — stable under
  * repartitioning, shuffle order, and retries, because nothing depends on
  * task-local RNG state. Rejection sampling is replaced by direct sampling
  * of the valid region (margin-shrunk box for anchors; clamped ring
  * placement for neighbors), which is bounded by construction.
  */
object Triplets {

  /** Deterministic uniform [0,1) from hashed keys: the distributed-safe
    * replacement for `rand()` (never depends on partitioning). The hash
    * is the shared mod-P polynomial over "seed|k1|k2|..." — computable by
    * any engine (the DuckDB oracle mirrors it token for token), so
    * placement queries hash-match instead of being rows-only. */
  def hashUnit(seed: Long, keys: Column*): Column = {
    val P = graft.functions.TextAnalysis.HashMod
    val h = graft.functions.TextAnalysis.polyHash(
      concat_ws("|", (lit(seed) +: keys.toSeq).map(_.cast("string")): _*))
    // the rolling hash has no avalanche (near-equal strings cluster), so
    // mix: salt-multiply then square, both mod P — every product stays
    // < 2^63 and the arithmetic is engine-exact
    val m1 = (h * lit(2654435761L)) % P
    val m2 = (m1 * m1) % P
    m2.cast("double") / P.toDouble
  }

  /** T1: assign each scene to a collection with hash-split fractions.
    * `fractions` are (name, weight) pairs; weights need not sum to 1. */
  def splitScenes(sceneKey: Column, seed: Long,
      fractions: Seq[(String, Double)]): Column = {
    val total = fractions.map(_._2).sum
    val u = hashUnit(seed, sceneKey) * total
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.zip(cuts).foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), acc) => when(u < cut, lit(name)).otherwise(acc)
    }
  }

  /** T2: for each triplet id, pick two *distinct* scenes from its
    * collection: anchor/neighbor scene and distant scene.
    * Deterministic: scenes are ranked once per collection, and the picks
    * are hash-derived indices (second draw skips the first).
    *
    * Collections with a single scene cannot yield a distinct pair and are
    * dropped explicitly (the reference's rejection loop would spin forever
    * on them) — triplets addressed to such a collection produce no rows. */
  def pairScenes(scenes: DataFrame, triplets: DataFrame, seed: Long): DataFrame = {
    val w = Window.partitionBy(col("collection")).orderBy(col("scene_id"))
    val ranked = scenes
      .withColumn("rank", row_number().over(w) - 1)
      .withColumn("n_scenes", count(lit(1)).over(Window.partitionBy(col("collection"))))
    val counts = ranked.groupBy(col("collection")).agg(max(col("n_scenes")).as("n_scenes"))
      .where(col("n_scenes") >= 2)
    // counts is config-sized (one row per collection) — broadcast
    // explicitly so that even when the key constant-folds (single
    // collection) the plan is a broadcast of the 1-row side, never a
    // shuffled nested loop
    val picks = triplets.join(broadcast(counts), "collection")
      .withColumn("a_rank", floor(hashUnit(seed, col("triplet_id"), lit("anchor")) * col("n_scenes")).cast("int"))
      .withColumn("d_draw", floor(hashUnit(seed, col("triplet_id"), lit("distant")) * (col("n_scenes") - 1)).cast("int"))
      // distant pick skips the anchor scene's rank => always distinct
      .withColumn("d_rank", when(col("d_draw") >= col("a_rank"), col("d_draw") + 1).otherwise(col("d_draw")))
    picks
      .join(ranked.select(col("collection"), col("rank").as("a_rank"), col("scene_id").as("anchor_scene")),
        Seq("collection", "a_rank"))
      .join(ranked.select(col("collection"), col("rank").as("d_rank"), col("scene_id").as("distant_scene")),
        Seq("collection", "d_rank"))
      .select(col("collection"), col("triplet_id"), col("anchor_scene"), col("distant_scene"))
  }

  /** T3/T4/T5: expand paired triplets into tile-spec rows with
    * deterministic placement.
    *
    * anchor: uniform in the margin-shrunk domain box (margin = 2/3·tile,
    * sampling/triplets.py:20-29); neighbor: anchor center offset by
    * `neighDistScaling·tile` at a hash-derived angle, clamped into the
    * valid box (bounded replacement for the reference's unbounded
    * rejection loop); distant: independent uniform draw in the distant
    * scene. Output: (collection, triplet_id, tile_type, scene_id, x, y).
    */
  def tileSpecs(paired: DataFrame, domain: Domain, tileSizeM: Double,
      neighDistScaling: Double, seed: Long): DataFrame = {
    val margin = 2.0 / 3.0 * tileSizeM
    val (xl, xh) = (domain.xMin + margin, domain.xMax - margin)
    val (yl, yh) = (domain.yMin + margin, domain.yMax - margin)
    def uni(lo: Double, hi: Double, tag: String, axis: String): Column =
      lit(lo) + hashUnit(seed, col("triplet_id"), lit(tag), lit(axis)) * (hi - lo)

    val anchorX = uni(xl, xh, "anchor", "x")
    val anchorY = uni(yl, yh, "anchor", "y")
    val theta = hashUnit(seed, col("triplet_id"), lit("neighbor"), lit("theta")) * 2.0 * math.Pi
    val r = neighDistScaling * tileSizeM
    val neighX = greatest(lit(xl), least(lit(xh), anchorX + lit(r) * cos(theta)))
    val neighY = greatest(lit(yl), least(lit(yh), anchorY + lit(r) * sin(theta)))
    val distantX = uni(xl, xh, "distant", "x")
    val distantY = uni(yl, yh, "distant", "y")

    paired.select(col("collection"), col("triplet_id"),
      explode(array(
        struct(lit("anchor").as("tile_type"), col("anchor_scene").as("scene_id"),
          anchorX.as("x"), anchorY.as("y")),
        struct(lit("neighbor").as("tile_type"), col("anchor_scene").as("scene_id"),
          neighX.as("x"), neighY.as("y")),
        struct(lit("distant").as("tile_type"), col("distant_scene").as("scene_id"),
          distantX.as("x"), distantY.as("y")))).as("t"))
      .select(col("collection"), col("triplet_id"),
        col("t.tile_type"), col("t.scene_id"), col("t.x"), col("t.y"))
  }

  /** Reference tile id format `{triplet_id:05d}_{tile_type}`
    * (pipeline/triplets.py:13). */
  def tripletTileId(tripletId: Column, tileType: Column): Column =
    concat(lpad(tripletId.cast("string"), 5, "0"), lit("_"), tileType)
}
