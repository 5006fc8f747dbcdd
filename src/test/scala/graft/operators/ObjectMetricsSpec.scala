package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Object-based cloudmetrics kernel: labeling on known masks, I_org
  * endpoints, and Aggregator merge-order invariance (the property that
  * makes map-side partial aggregation safe). */
class ObjectMetricsSpec extends SparkSpec {

  // 8x8 tile, pixel p = j*8 + i
  private def px(i: Int, j: Int): Long = (j * 8 + i).toLong

  test("union-find labeling: counts, sizes, diagonal NOT connected (4-conn)") {
    // two plus-shaped objects and an isolated diagonal pair (= 3 objects
    // under 4-connectivity, the diagonal pixels are SEPARATE objects)
    val blobA = Seq(px(1, 1), px(0, 1), px(2, 1), px(1, 0), px(1, 2))
    val blobB = Seq(px(5, 5), px(6, 5))
    val diag = Seq(px(4, 0), px(5, 1)) // touch only diagonally
    val st = ObjectMetrics.summarize((blobA ++ blobB ++ diag).toArray, 8, 8)
    assert(st.n_objects == 4, s"expected 4 objects, got ${st.n_objects}")
    assert(st.mask_px == 9)
    assert(st.mean_size == 9.0 / 4.0)
    assert(st.iorg.isDefined)
  }

  test("fewer than two objects yields no I_org") {
    assert(ObjectMetrics.summarize(Array(px(3, 3), px(3, 4)), 8, 8).iorg.isEmpty)
    assert(ObjectMetrics.summarize(Array.empty[Long], 8, 8).n_objects == 0)
  }

  test("I_org is bounded in [0,1] and regular grids score below random-like masks") {
    // perfectly regular 4x4 lattice of singleton objects (spacing 4) ->
    // strong inhibition -> low I_org
    val regular = for (i <- Seq(1, 5, 9, 13); j <- Seq(1, 5, 9, 13)) yield (j * 16 + i).toLong
    val stR = ObjectMetrics.summarize(regular.toArray, 16, 16)
    // clustered: singleton objects crammed into one corner of the same
    // 16x16 tile -> I_org above the regular score
    val clustered = Seq((0, 0), (2, 0), (0, 2), (2, 2), (4, 0), (0, 4))
      .map { case (i, j) => (j * 16 + i).toLong }
    val stC = ObjectMetrics.summarize(clustered.toArray, 16, 16)
    for (st <- Seq(stR, stC); v <- st.iorg) assert(v >= 0.0 && v <= 1.0)
    assert(stR.iorg.get < stC.iorg.get,
      s"regular ${stR.iorg.get} should organize below clustered ${stC.iorg.get}")
  }

  test("Aggregator merge is order-invariant (map-side combine safe)") {
    val all = Seq(px(1, 1), px(2, 1), px(5, 5), px(6, 5), px(6, 6), px(0, 7))
    val agg = ObjectMetrics.iorgObjects(8, 8)
    def finishOf(parts: Seq[Seq[Long]]): ObjectMetrics.ObjectStats = {
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      agg.finish(bufs.reduce(agg.merge))
    }
    val a = finishOf(Seq(all.take(2), all.drop(2)))
    val b = finishOf(Seq(all.drop(4), all.slice(2, 4), all.take(2)))
    val c = finishOf(Seq(all.reverse))
    assert(a == b && b == c)
    assert(a.n_objects == 3)
  }

  test("registry dispatches all three mask metrics and rejects unknown") {
    import spark.implicits._
    val df = Seq((1L, px(1, 1)), (1L, px(2, 1)), (1L, px(5, 5))).toDF("t", "p")
    def run(metric: String): org.apache.spark.sql.Row =
      df.as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(ObjectMetrics.maskRegistry(metric, 8, 8))
        .toDF("t", "stats").select("stats.*").head()
    assert(run("mask__iorg_objects").getAs[Long]("n_objects") == 2)
    assert(run("mask__morphology").getAs[Long]("n_objects") == 2)
    assert(run("mask__open_sky").getAs[Long]("mask_px") == 3)
    intercept[IllegalArgumentException](ObjectMetrics.maskRegistry("nope", 8, 8))
  }

  test("morphology: eccentricity of a line is 1, of a square 0; max fraction exact") {
    // 3-pixel horizontal line (ecc 1) + 2x2 square (ecc 0), 8x8 raster
    val line = Seq(px(0, 0), px(1, 0), px(2, 0))
    val square = Seq(px(5, 5), px(6, 5), px(5, 6), px(6, 6))
    val st = ObjectMetrics.morphologyOf((line ++ square).toArray, 8)
    assert(st.n_objects == 2 && st.mask_px == 7)
    assert(st.max_obj_frac == 4.0 / 7.0)
    assert(st.mean_ecc == (1000000L + 0L).toDouble / (2 * 1000000.0)) // (1 + 0) / 2
    // degenerate single pixel: ecc 0, fraction 1
    val single = ObjectMetrics.morphologyOf(Array(px(3, 3)), 8)
    assert(single.mean_ecc == 0.0 && single.max_obj_frac == 1.0)
  }

  test("open sky: per-row max clear runs, borders included, full rows counted") {
    // 4x4 raster; row 0 masked at i=1,2 -> clear runs [0..0] and [3..3]
    // (max 1); rows 1-3 fully clear -> max 4 each; sum 13 -> 13/16
    val masked = Seq(1L, 2L) // p = j*4 + i with j=0
    val st = ObjectMetrics.openSkyOf(masked.toArray, 4, 4)
    assert(st.mask_px == 2)
    assert(st.open_sky == 13.0 / 16.0)
    // fully masked raster: zero open sky
    val full = ObjectMetrics.openSkyOf((0L until 16L).toArray, 4, 4)
    assert(full.open_sky == 0.0)
    // empty mask: whole raster open
    assert(ObjectMetrics.openSkyOf(Array.empty[Long], 4, 4).open_sky == 1.0)
  }

  test("morphology and open-sky merges are order-invariant") {
    val all = Seq(px(1, 1), px(2, 1), px(5, 5), px(6, 5), px(6, 6), px(0, 7))
    def check[B, O](agg: org.apache.spark.sql.expressions.Aggregator[Long, B, O]): Unit = {
      def finishOf(parts: Seq[Seq[Long]]): O = {
        val bufs = parts.map(p => p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        agg.finish(bufs.reduce(agg.merge))
      }
      val a = finishOf(Seq(all.take(2), all.drop(2)))
      val b = finishOf(Seq(all.drop(4), all.slice(2, 4), all.take(2)))
      val c = finishOf(Seq(all.reverse))
      assert(a == b && b == c)
    }
    check(ObjectMetrics.morphology(8, 8))
    check(ObjectMetrics.openSky(8, 8))
  }
}
