package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T6: trajectory-following tiles — for each scene, one tile centered on
  * the trajectory point nearest in time.
  *
  * Reference: convml_data/pipeline/trajectory_tiles.py:25-74 (nearest
  * trajectory sample per scene via utils/time.py argmin — J5 — then a
  * tile spec at that point), trajectories schema FIXTURES.md §6
  * (i=j=-1 marks lost tracks -> dropped here like rect/flow.py:74-83).
  *
  * Spark shape: the J1 bucketed as-of join (scenes probe, trajectory
  * samples build) followed by a tile-spec projection — no new machinery,
  * which is the point: trajectory tiles are an as-of join in disguise.
  */
object TrajectoryTiles {

  /** scenes(scene_id, time) ⨝ traj(time->traj_time, traj_id, x, y) ->
    * (scene_id, traj_id, tile_id, x, y, x0, y0, dt_us). */
  def specs(scenes: DataFrame, traj: DataFrame, tileSizeM: Double,
      halfWindowUs: Long): DataFrame = {
    val live = traj
      .where(col("x").isNotNull && !isnan(col("x")) && col("i") =!= -1)
      .select(col("time").as("traj_time"), col("traj_id"), col("x"), col("y"))
    AsOfJoin.nearestWithin(scenes, live, "time", "traj_time", halfWindowUs,
        probeKey = Seq("scene_id", "traj_id"))
      .select(col("scene_id"), col("traj_id"),
        concat(col("scene_id"), lit("__traj"), lpad(col("traj_id").cast("string"), 5, "0")).as("tile_id"),
        col("x"), col("y"),
        (col("x") - tileSizeM / 2).as("x0"), (col("y") - tileSizeM / 2).as("y0"),
        col("dt_us"))
  }
}
