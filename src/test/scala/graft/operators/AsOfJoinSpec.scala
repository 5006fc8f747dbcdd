package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics from convml_data/pipeline/aux_sources.py:178-241:
  * inclusive tolerance at exactly dt/2, ties -> earlier build row,
  * unmatched probe rows dropped, dt inference = min successive gap.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(name: String, us: Seq[(Long, Long)]) =
    us.toDF("id", "us")
      .select(col("id").as(s"${name}_id"), timestamp_micros(col("us")).as(s"${name}_ts"))

  test("nearest match within tolerance, inclusive at exactly half-window") {
    val probe = tsDf("p", Seq((1L, 1000L), (2L, 5000L), (3L, 9000L)))
    val build = tsDf("b", Seq((10L, 0L), (11L, 2000L), (12L, 20000L)))
    // halfWindow = 1000us: p1@1000 is exactly 1000 from both b10@0 and b11@2000
    val out = AsOfJoin.nearestWithin(probe, build, "p_ts", "b_ts", 1000L, Seq("p_id"))
      .select("p_id", "b_id", "dt_us").as[(Long, Long, Long)].collect().sortBy(_._1)
    // p1: tie at dt=1000 -> earlier build ts wins (b10); p2@5000: nothing
    // within 1000; p3@9000: nothing (b12 is 11000 away)
    assert(out.toSeq == Seq((1L, 10L, 1000L)))
  }

  test("each probe row gets exactly its nearest build row") {
    val probe = tsDf("p", Seq((1L, 100L), (2L, 900L), (3L, 1700L)))
    val build = tsDf("b", Seq((10L, 0L), (11L, 1000L), (12L, 2000L)))
    val out = AsOfJoin.nearestWithin(probe, build, "p_ts", "b_ts", 600L, Seq("p_id"))
      .select("p_id", "b_id", "dt_us").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 10L, 100L), (2L, 11L, 100L), (3L, 12L, 300L)))
  }

  test("bucket boundary: candidates found across adjacent buckets") {
    // probe at bucket edge; build one tick before it, previous bucket
    val probe = tsDf("p", Seq((1L, 10000L)))
    val build = tsDf("b", Seq((10L, 9999L)))
    val out = AsOfJoin.nearestWithin(probe, build, "p_ts", "b_ts", 1000L, Seq("p_id"))
    assert(out.count() == 1)
  }

  test("inferDtMicros = min successive gap, duplicates ignored") {
    val tl = tsDf("t", Seq((1L, 0L), (2L, 5000L), (3L, 5000L), (4L, 7000L), (5L, 20000L)))
    assert(AsOfJoin.inferDtMicros(tl, "t_ts") == 2000L)
  }

  test("strategy asymmetry: single-per-aux vs all-scenes share machinery") {
    val aux = tsDf("aux", Seq((1L, 1000000L)))
    val scenes = tsDf("scene", Seq((10L, 0L), (11L, 1200000L), (12L, 1900000L)))
    val j1 = AsOfJoin.singleScenePerAuxTime(aux, scenes, "aux_ts", "scene_ts",
      dtAuxUs = 2000000L, auxKey = Seq("aux_id"))
    assert(j1.select("scene_id").as[Long].collect().toSeq == Seq(11L))
    val j2 = AsOfJoin.allScenesWithinDtAux(scenes, aux, "scene_ts", "aux_ts",
      dtAuxUs = 2000000L, sceneKey = Seq("scene_id"))
    // scenes at 0 and 1.2s within 1s of aux@1s; scene@1.9s is 0.9s away too
    assert(j2.select("scene_id").as[Long].collect().sorted.toSeq == Seq(10L, 11L, 12L))
  }
}
