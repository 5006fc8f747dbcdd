package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window tile enumeration ("Tiler").
  *
  * Reference: convml_data/pipeline/rect/tiles.py:103-206 — enumerate all
  * (i0, j0) tile origins with stride `step` over an (nx, ny) pixel grid,
  * with the y-axis flip `j0 = ny - stop` (tiles.py:139-146) and
  * tile_id <-> (i, j) index arithmetic.
  *
  * Spark shape: two `explode(sequence(...))` — pure per-row index math with
  * no shuffle at all; the per-scene loop of the reference disappears into
  * row parallelism. At 100 TB the tile-spec table stays a cheap narrow
  * derivation (never materialize pixels here — J6/Regrid gathers do that
  * against bucketed pixel tables).
  */
object Tiler {

  /** Number of tile origins along an axis of `n` pixels. */
  def nAlong(n: Column, tileN: Int, step: Int): Column =
    floor((n - tileN) / step).cast("long") + 1

  /** Expand each scene row into its sliding-window tile specs.
    *
    * Input: scene rows with pixel-grid size columns `nxCol`, `nyCol`.
    * Output: input columns ++ (i_idx, j_idx, tile_id, i0, j0) where
    * `j0` is y-flipped as in the reference and `tile_id = i_idx * nJ + j_idx`.
    */
  def tileSpecs(scenes: DataFrame, nxCol: Column, nyCol: Column,
      tileN: Int, step: Int): DataFrame = {
    val nJ = nAlong(nyCol, tileN, step)
    // guard: Spark's sequence(0, stop) DESCENDS when stop < 0, so a grid
    // smaller than the tile must yield an empty origin list, not [0, stop]
    def origins(n: Column): Column =
      when(n >= tileN, sequence(lit(0), n - tileN, lit(step)))
        .otherwise(array().cast("array<int>"))
    scenes
      .withColumn("i0", explode(origins(nxCol)))
      .withColumn("__j", explode(origins(nyCol)))
      .withColumn("i_idx", expr(s"i0 div $step"))
      .withColumn("j_idx", expr(s"__j div $step"))
      .withColumn("tile_id", col("i_idx") * nJ + col("j_idx"))
      // y-flip: j0 = ny - (j + tileN)  (rect/tiles.py:139-146)
      .withColumn("j0", nyCol - (col("__j") + tileN))
      .drop("__j")
  }

  /** Global tile id `{scene_id}__{tile_id:05d}` (rect/tiles.py:19-20). */
  def globalTileId(sceneId: Column, tileId: Column): Column =
    concat(sceneId, lit("__"), lpad(tileId.cast("string"), 5, "0"))
}
