package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrajectoryTilesSpec extends SparkSpec {
  import spark.implicits._

  test("one tile per (scene, trajectory) at the nearest sample; lost tracks dropped") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val scenes = Seq(("s1", t("2024-01-01 00:00:00")), ("s2", t("2024-01-01 01:00:00")))
      .toDF("scene_id", "time")
    val traj = Seq(
      // traj 1 drifts east; sample at 00:10 is nearest to s1, 00:55 to s2
      (t("2024-01-01 00:10:00"), 1, 0, 0, 1000.0, 0.0),
      (t("2024-01-01 00:55:00"), 1, 1, 0, 5000.0, 0.0),
      // traj 2 is lost (i = -1) -> contributes nothing
      (t("2024-01-01 00:20:00"), 2, -1, -1, Double.NaN, Double.NaN))
      .toDF("time", "traj_id", "i", "j", "x", "y")

    val out = TrajectoryTiles.specs(scenes, traj, tileSizeM = 2000.0,
      halfWindowUs = 3600L * 1000000)
      .select("scene_id", "traj_id", "tile_id", "x", "x0", "dt_us")
      .as[(String, Int, String, Double, Double, Long)].collect().sortBy(r => (r._1, r._2))

    assert(out.map(r => (r._1, r._2)).toSeq == Seq(("s1", 1), ("s2", 1)))
    assert(out(0)._4 == 1000.0 && out(0)._5 == 0.0) // x0 = x - size/2
    assert(out(1)._4 == 5000.0)
    assert(out(0)._3 == "s1__traj00001")
    assert(out(0)._6 == 600L * 1000000) // 10 min to the nearest sample
  }
}
