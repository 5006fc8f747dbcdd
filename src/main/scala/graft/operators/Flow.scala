package graft.operators

import org.apache.spark.sql.Dataset

/** W2/W5: optical-flow-style trajectory chaining — inherently sequential
  * per scene-group.
  *
  * Reference: convml_data/sampling/rect/methods/flow/calc.py:19-207
  * (Shi-Tomasi corner detect on the first frame, Lucas-Kanade tracking
  * frame-to-frame, -1 for lost points, forward chaining where each frame's
  * points derive from the previous frame's output) grouped by scene date
  * (pipeline/utils.py:80-114).
  *
  * Spark shape (SURVEY §2.5 W2): `groupByKey(group).flatMapGroups` with an
  * in-memory time-sorted scan per group — parallelism across groups
  * (dates), strict ordering within. The tracker is the pure-JVM pyramidal
  * Lucas-Kanade in [[LucasKanade]] ([[chainTrajectoriesLK]], the real W2);
  * [[chainTrajectories]] keeps the cheap global centroid-shift estimator
  * for fields where a single advection vector suffices.
  */
object Flow {

  final case class Frame(group: String, seq: Int, nx: Int, ny: Int, values: Array[Double])
  final case class TrackedPoint(group: String, seq: Int, traj_id: Int, x: Double, y: Double)

  /** Estimate (dx, dy) between two frames as the shift of the
    * intensity-weighted centroid — the pure-JVM stand-in for LK flow. */
  def centroidShift(a: Frame, b: Frame): (Double, Double) = {
    def centroid(f: Frame): (Double, Double) = {
      var sx = 0.0; var sy = 0.0; var s = 0.0
      var i = 0
      while (i < f.values.length) {
        val v = f.values(i)
        if (!v.isNaN) { sx += v * (i % f.nx); sy += v * (i / f.nx); s += v }
        i += 1
      }
      if (s == 0.0) (0.0, 0.0) else (sx / s, sy / s)
    }
    val (ax, ay) = centroid(a); val (bx, by) = centroid(b)
    (bx - ax, by - ay)
  }

  /** Chain trajectories across time-ordered frames within each group.
    * Seed points start on a regular `seedStride` grid in the first frame;
    * each subsequent frame advances every live point by the estimated
    * flow; points leaving the frame become lost (-1 sentinel,
    * flow/calc.py:178). */
  def chainTrajectories(frames: Dataset[Frame], seedStride: Int): Dataset[TrackedPoint] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.group).flatMapGroups { (g, it) =>
      val ordered = it.toArray.sortBy(_.seq)
      if (ordered.isEmpty) Iterator.empty
      else {
        val first = ordered.head
        var pts: Array[(Int, Double, Double)] = {
          val seeds = for {
            j <- seedStride / 2 until first.ny by seedStride
            i <- seedStride / 2 until first.nx by seedStride
          } yield (i.toDouble, j.toDouble)
          seeds.zipWithIndex.map { case ((x, y), id) => (id, x, y) }.toArray
        }
        val out = Array.newBuilder[TrackedPoint]
        pts.foreach { case (id, x, y) => out += TrackedPoint(g, first.seq, id, x, y) }
        var prev = first
        ordered.drop(1).foreach { f =>
          val (dx, dy) = centroidShift(prev, f)
          pts = pts.map { case (id, x, y) =>
            if (x < 0) (id, x, y) // already lost stays lost
            else {
              val (nx2, ny2) = (x + dx, y + dy)
              if (nx2 < 0 || nx2 >= f.nx || ny2 < 0 || ny2 >= f.ny) (id, -1.0, -1.0)
              else (id, nx2, ny2)
            }
          }
          pts.foreach { case (id, x, y) => out += TrackedPoint(g, f.seq, id, x, y) }
          prev = f
        }
        out.result().iterator
      }
    }
  }

  /** The real W2: per-point pyramidal Lucas-Kanade chaining. Seeds come
    * from Shi-Tomasi corners on the first frame (goodFeaturesToTrack,
    * calc.py:19-75); each subsequent frame advances every live point by
    * its own LK track; lost points (degenerate window or out-of-frame)
    * carry the -1 sentinel forever after (calc.py:140). */
  def chainTrajectoriesLK(frames: Dataset[Frame],
      maxCorners: Int = 100, qualityLevel: Double = 0.01, minDistance: Double = 5.0,
      winRadius: Int = 7, levels: Int = 3): Dataset[TrackedPoint] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.group).flatMapGroups { (g, it) =>
      val ordered = it.toArray.sortBy(_.seq)
      if (ordered.isEmpty) Iterator.empty
      else {
        val first = ordered.head
        val seeds = LucasKanade.shiTomasi(
          LucasKanade.normalize(first.nx, first.ny, first.values),
          maxCorners, qualityLevel, minDistance)
        var pts: Array[(Int, Double, Double)] =
          seeds.zipWithIndex.map { case ((x, y), id) => (id, x, y) }
        val out = Array.newBuilder[TrackedPoint]
        pts.foreach { case (id, x, y) => out += TrackedPoint(g, first.seq, id, x, y) }
        var prev = first
        ordered.drop(1).foreach { f =>
          val live = pts.filter(_._2 >= 0)
          val tracked = LucasKanade.track(prev.nx, prev.ny, prev.values, f.values,
            live.map(p => (p._2, p._3)), winRadius, levels)
          val moved = live.map(_._1).zip(tracked).toMap
          pts = pts.map { case (id, x, y) =>
            if (x < 0) (id, x, y)
            else moved(id) match {
              case Some((nx2, ny2)) => (id, nx2, ny2)
              case None => (id, -1.0, -1.0)
            }
          }
          pts.foreach { case (id, x, y) => out += TrackedPoint(g, f.seq, id, x, y) }
          prev = f
        }
        out.result().iterator
      }
    }
  }
}
