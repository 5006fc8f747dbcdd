package graft.operators

/** Pure-JVM pyramidal Lucas-Kanade optical flow + Shi-Tomasi corner
  * detection — the real tracker behind W2, replacing round-1's
  * centroid-shift stand-in. No OpenCV: both algorithms are public
  * (Bouguet, "Pyramidal Implementation of the Lucas Kanade Feature
  * Tracker"; Shi & Tomasi 1994) and small enough to implement directly.
  *
  * Reference behavior mirrored from
  * convml_data/sampling/rect/methods/flow/calc.py:19-140:
  *  - images min-max scaled to [0, 255] before detection/tracking
  *    (we keep them as doubles rather than quantizing to uint8 — the
  *    quantization is an OpenCV interface detail, not algorithm);
  *  - NaNs masked by filling with the image minimum;
  *  - goodFeaturesToTrack(maxCorners, qualityLevel, minDistance,
  *    blockSize) for seeding; calcOpticalFlowPyrLK(winSize, maxLevel,
  *    minEigThreshold) for tracking; lost points -> None (calc.py:140
  *    sets them NaN).
  *
  * Everything here is per-frame-pair driver-free math invoked inside
  * `flatMapGroups` (see [[Flow]]): parallelism comes from the scene
  * group key, frames are O(tile) rasters.
  */
object LucasKanade {

  final case class Img(nx: Int, ny: Int, v: Array[Double]) {
    @inline def at(i: Int, j: Int): Double =
      v(math.min(ny - 1, math.max(0, j)) * nx + math.min(nx - 1, math.max(0, i)))
    /** Clamped bilinear sample. */
    def sample(x: Double, y: Double): Double = {
      val xc = math.min(nx - 1.001, math.max(0.0, x))
      val yc = math.min(ny - 1.001, math.max(0.0, y))
      val i0 = xc.toInt; val j0 = yc.toInt
      val tx = xc - i0; val ty = yc - j0
      (1 - tx) * (1 - ty) * at(i0, j0) + tx * (1 - ty) * at(i0 + 1, j0) +
        (1 - tx) * ty * at(i0, j0 + 1) + tx * ty * at(i0 + 1, j0 + 1)
    }
  }

  /** NaN-fill with the min, then min-max scale to [0, 255]
    * (calc.py:46-57). */
  def normalize(nx: Int, ny: Int, values: Array[Double]): Img = {
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    values.foreach { x => if (!x.isNaN) { if (x < mn) mn = x; if (x > mx) mx = x } }
    if (mn.isInfinity) return Img(nx, ny, Array.fill(values.length)(0.0))
    val out = new Array[Double](values.length)
    val span = mx - mn
    var i = 0
    while (i < values.length) {
      val x = if (values(i).isNaN) mn else values(i)
      out(i) = if (span > 1e-8) (x - mn) / span * 255.0 else x - mn
      i += 1
    }
    Img(nx, ny, out)
  }

  /** 2x2-mean downsample (pyramid level step). */
  def downsample(img: Img): Img = {
    val nx2 = math.max(1, img.nx / 2); val ny2 = math.max(1, img.ny / 2)
    val out = new Array[Double](nx2 * ny2)
    var j = 0
    while (j < ny2) {
      var i = 0
      while (i < nx2) {
        out(j * nx2 + i) = 0.25 * (img.at(2 * i, 2 * j) + img.at(2 * i + 1, 2 * j)
          + img.at(2 * i, 2 * j + 1) + img.at(2 * i + 1, 2 * j + 1))
        i += 1
      }
      j += 1
    }
    Img(nx2, ny2, out)
  }

  def pyramid(img: Img, levels: Int): IndexedSeq[Img] =
    (1 until levels).scanLeft(img)((im, _) => downsample(im)).toIndexedSeq

  /** Min eigenvalue of the structure tensor summed over a (2r+1)² block
    * centered at (i, j) — the Shi-Tomasi corner response. */
  def minEigResponse(img: Img, i: Int, j: Int, r: Int): Double = {
    var gxx = 0.0; var gxy = 0.0; var gyy = 0.0
    var dj = -r
    while (dj <= r) {
      var di = -r
      while (di <= r) {
        val ix = 0.5 * (img.at(i + di + 1, j + dj) - img.at(i + di - 1, j + dj))
        val iy = 0.5 * (img.at(i + di, j + dj + 1) - img.at(i + di, j + dj - 1))
        gxx += ix * ix; gxy += ix * iy; gyy += iy * iy
        di += 1
      }
      dj += 1
    }
    val tr2 = 0.5 * (gxx + gyy)
    val det = gxx * gyy - gxy * gxy
    tr2 - math.sqrt(math.max(0.0, tr2 * tr2 - det))
  }

  /** Shi-Tomasi corner seeding (goodFeaturesToTrack semantics): keep
    * maxima of the min-eig response above qualityLevel × best, greedily
    * strongest-first with a minDistance exclusion radius. */
  def shiTomasi(img: Img, maxCorners: Int, qualityLevel: Double,
      minDistance: Double, blockRadius: Int = 2): Array[(Double, Double)] = {
    val margin = blockRadius + 1
    val cands = for {
      j <- margin until img.ny - margin
      i <- margin until img.nx - margin
    } yield (i, j, minEigResponse(img, i, j, blockRadius))
    if (cands.isEmpty) return Array.empty
    val best = cands.map(_._3).max
    if (best <= 0) return Array.empty
    val thresh = qualityLevel * best
    val kept = Array.newBuilder[(Double, Double)]
    var n = 0
    val d2 = minDistance * minDistance
    val sorted = cands.filter(_._3 >= thresh).sortBy { case (i, j, resp) => (-resp, j, i) }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { case (i, j, _) =>
      if (n < maxCorners &&
        acc.forall { case (pi, pj) =>
          val dx = pi - i; val dy = pj - j; dx * dx + dy * dy >= d2 }) {
        acc += ((i, j)); kept += ((i.toDouble, j.toDouble)); n += 1
      }
    }
    kept.result()
  }

  /** Track one point from `pyrA` to `pyrB` (Bouguet pyramidal LK):
    * coarse-to-fine Newton iterations on the window SSD, gradients from
    * image A, bilinear subpixel sampling. Returns the new position, or
    * None when the structure tensor is degenerate (minEig below
    * threshold, per-pixel normalized like OpenCV) or the point exits the
    * frame. */
  def trackPoint(pyrA: IndexedSeq[Img], pyrB: IndexedSeq[Img],
      x0: Double, y0: Double, winRadius: Int = 7, iters: Int = 10,
      minEigThr: Double = 1e-4): Option[(Double, Double)] = {
    val L = pyrA.length
    var gx = 0.0; var gy = 0.0 // accumulated guess, in the current level's px
    var level = L - 1
    var ok = true
    while (level >= 0 && ok) {
      val a = pyrA(level); val b = pyrB(level)
      val scale = 1.0 / (1 << level)
      val px = x0 * scale; val py = y0 * scale
      // gradients + structure tensor from image A around the point
      var gxx = 0.0; var gxy = 0.0; var gyy = 0.0
      val n = (2 * winRadius + 1) * (2 * winRadius + 1)
      val ixs = new Array[Double](n); val iys = new Array[Double](n)
      var k = 0
      var dj = -winRadius
      while (dj <= winRadius) {
        var di = -winRadius
        while (di <= winRadius) {
          val ix = 0.5 * (a.sample(px + di + 1, py + dj) - a.sample(px + di - 1, py + dj))
          val iy = 0.5 * (a.sample(px + di, py + dj + 1) - a.sample(px + di, py + dj - 1))
          ixs(k) = ix; iys(k) = iy
          gxx += ix * ix; gxy += ix * iy; gyy += iy * iy
          k += 1; di += 1
        }
        dj += 1
      }
      val tr2 = 0.5 * (gxx + gyy)
      val det = gxx * gyy - gxy * gxy
      val minEig = (tr2 - math.sqrt(math.max(0.0, tr2 * tr2 - det))) / n
      // degenerate-window policy mirrors OpenCV: the minEig rejection
      // applies at the FINAL (full-resolution) level only — a coarse
      // level with no structure just passes the guess through (narrow
      // features vanish under downsampling but track fine below)
      if (level == 0 && (minEig / (255.0 * 255.0) < minEigThr || det <= 1e-12)) ok = false
      else if (det <= 1e-12) {
        // no refinement possible at this coarse level; propagate guess
        if (level > 0) { gx *= 2; gy *= 2 }
      } else {
        var vx = 0.0; var vy = 0.0
        var it = 0
        var converged = false
        while (it < iters && !converged) {
          var bx = 0.0; var by = 0.0
          k = 0
          dj = -winRadius
          while (dj <= winRadius) {
            var di = -winRadius
            while (di <= winRadius) {
              val dI = a.sample(px + di, py + dj) -
                b.sample(px + gx + vx + di, py + gy + vy + dj)
              bx += dI * ixs(k); by += dI * iys(k)
              k += 1; di += 1
            }
            dj += 1
          }
          val nvx = (gyy * bx - gxy * by) / det
          val nvy = (gxx * by - gxy * bx) / det
          vx += nvx; vy += nvy
          if (nvx * nvx + nvy * nvy < 1e-4) converged = true
          it += 1
        }
        gx += vx; gy += vy
        if (level > 0) { gx *= 2; gy *= 2 }
      }
      level -= 1
    }
    if (!ok) None
    else {
      val nx = x0 + gx; val ny = y0 + gy
      val base = pyrB.head
      if (nx < 0 || nx >= base.nx || ny < 0 || ny >= base.ny) None
      else Some((nx, ny))
    }
  }

  /** Track a point set between two raw frames (normalize + pyramids once,
    * then per-point LK) — the calcOpticalFlowPyrLK call shape. */
  def track(nx: Int, ny: Int, prev: Array[Double], next: Array[Double],
      points: Array[(Double, Double)], winRadius: Int = 7, levels: Int = 3,
      iters: Int = 10, minEigThr: Double = 1e-4): Array[Option[(Double, Double)]] = {
    val pa = pyramid(normalize(nx, ny, prev), levels)
    val pb = pyramid(normalize(nx, ny, next), levels)
    points.map { case (x, y) => trackPoint(pa, pb, x, y, winRadius, iters, minEigThr) }
  }
}
