package graft.operators

import graft.SparkSpec

/** Pure-JVM pyramidal LK + Shi-Tomasi (the real W2 tracker). */
class LucasKanadeSpec extends SparkSpec {

  private val N = 64
  private val centers = Seq((14.0, 18.0), (34.0, 12.0), (22.0, 40.0), (46.0, 44.0), (50.0, 24.0))
  /** Smooth blob field translated by (sx, sy). */
  private def field(sx: Double, sy: Double): Array[Double] =
    Array.tabulate(N * N) { k =>
      val x = k % N; val y = k / N
      centers.map { case (cx, cy) =>
        val dx = x - cx - sx; val dy = y - cy - sy
        math.exp(-(dx * dx + dy * dy) / 18.0)
      }.sum
    }

  test("LK recovers a known subpixel translation to < 0.1 px") {
    val a = field(0, 0); val b = field(2.3, -1.7)
    val pts = centers.map { case (cx, cy) => (cx, cy) }.toArray
    val tracked = LucasKanade.track(N, N, a, b, pts, winRadius = 7, levels = 2)
    tracked.zip(pts).foreach { case (res, (x0, y0)) =>
      assert(res.isDefined, s"point ($x0,$y0) lost")
      val (x1, y1) = res.get
      assert(math.abs(x1 - x0 - 2.3) < 0.1 && math.abs(y1 - y0 + 1.7) < 0.1,
        f"tracked to ($x1%.2f,$y1%.2f), wanted (${x0 + 2.3}%.2f,${y0 - 1.7}%.2f)")
    }
  }

  test("pyramid levels extend range beyond the window radius") {
    // NARROW blob (sigma^2 = 2): a 9.5 px shift leaves no gradient signal
    // inside a 4 px window at full resolution — only the coarse pyramid
    // level sees the displaced blob
    def narrow(sx: Double): Array[Double] = Array.tabulate(N * N) { k =>
      val x = k % N; val y = k / N
      val dx = x - 22.0 - sx; val dy = y - 40.0
      math.exp(-(dx * dx + dy * dy) / 2.0)
    }
    val a = narrow(0); val b = narrow(9.5)
    val pts = Array((22.0, 40.0))
    val flat = LucasKanade.track(N, N, a, b, pts, winRadius = 4, levels = 1)
    val pyr = LucasKanade.track(N, N, a, b, pts, winRadius = 4, levels = 4)
    assert(pyr.head.isDefined)
    val (px, _) = pyr.head.get
    assert(math.abs(px - 22.0 - 9.5) < 0.5, f"pyramidal track got $px%.2f")
    val flatErr = flat.head.map { case (x, _) => math.abs(x - 22.0 - 9.5) }.getOrElse(99.0)
    assert(flatErr > 1.0, f"single level should not find a 9.5px shift (err $flatErr%.2f)")
  }

  test("Shi-Tomasi finds distinct structure maxima with spacing and cap") {
    val img = LucasKanade.normalize(N, N, field(0, 0))
    val corners = LucasKanade.shiTomasi(img, maxCorners = 10, qualityLevel = 0.05,
      minDistance = 6.0)
    assert(corners.nonEmpty && corners.length <= 10)
    // every corner is near one of the blobs (structure only exists there)
    corners.foreach { case (x, y) =>
      val near = centers.exists { case (cx, cy) =>
        math.abs(x - cx) <= 6 && math.abs(y - cy) <= 6 }
      assert(near, s"corner ($x,$y) far from any blob")
    }
    // pairwise min distance respected
    for (i <- corners.indices; j <- 0 until i) {
      val (x1, y1) = corners(i); val (x2, y2) = corners(j)
      val d2 = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
      assert(d2 >= 36.0, s"corners $i/$j closer than minDistance")
    }
  }

  test("chainTrajectoriesLK follows motion and drops exiting points") {
    import spark.implicits._
    // blobs drifting +3 px/frame in x; the rightmost blob exits by frame 3
    val frames = (0 until 4).map(t =>
      Flow.Frame("g", t, N, N, field(3.0 * t, 0.0))).toDS()
    val out = Flow.chainTrajectoriesLK(frames,
      maxCorners = 8, qualityLevel = 0.05, minDistance = 6.0,
      winRadius = 6, levels = 3)
      .collect().groupBy(_.traj_id)
    assert(out.nonEmpty)
    out.values.foreach { traj =>
      val byT = traj.sortBy(_.seq)
      byT.sliding(2).foreach { case Array(p0, p1) =>
        if (p0.x >= 0 && p1.x >= 0) {
          assert(math.abs(p1.x - p0.x - 3.0) < 0.5, s"dx off for traj ${p0.traj_id}")
          assert(math.abs(p1.y - p0.y) < 0.5, s"dy off for traj ${p0.traj_id}")
        }
        // lost stays lost
        if (p0.x < 0) assert(p1.x < 0)
      }
    }
    // the blob starting at x=50 drifts to 59 by t=3 — still in frame; all
    // trajectories should remain live on this fixture, and every frame
    // carries every trajectory id (sentinel bookkeeping)
    out.values.foreach(traj => assert(traj.map(_.seq).sorted.toSeq == Seq(0, 1, 2, 3)))
  }
}
