package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** M5 depth: object-based cloudmetrics on tile masks.
  *
  * Reference: convml_data/pipeline/embeddings/aux_fields/data.py:82-108 —
  * `tile_reduction_op = "cloud_metrics__mask__iorg_objects"` dynamically
  * imports `cloudmetrics.mask.iorg_objects` and applies it per tile with
  * `periodic_domain=False`. The metric family labels connected objects in
  * the thresholded cloud mask and derives organisation statistics; I_org
  * is the Tompkins & Semie (2017) nearest-neighbour-spacing index.
  *
  * Spark shape: one mergeable typed [[Aggregator]] per tile. The buffer is
  * the set of masked pixel indices — bounded by the tile raster size (the
  * reference's tiles are 256² or smaller), so partial aggregation is safe
  * at any corpus scale: a 100 TB archive is billions of *tiles*, each of
  * bounded pixel count, and the per-tile kernel runs executor-side inside
  * a regular `groupByKey(tile).agg(...)` — never a driver collect.
  *
  * Deterministic by construction, so it is oracle-hashable:
  *  - labeling: 4-connectivity union-find; the component label is the
  *    minimum pixel index it contains (matches a recursive-closure SQL
  *    reproduction exactly);
  *  - I_org: the empirical nearest-neighbour-distance CDF is integrated
  *    against the Poisson (random-placement) CDF
  *    `p(r) = 1 - exp(-lambda * pi * r^2)` by trapezoid. All curve
  *    arithmetic is carried out in scaled integers (CDF values rounded to
  *    1e-6, ranks as integers) so the cross-row sum is exact and
  *    order-independent — the only libm call (`exp`) is rounded to 6 dp
  *    per-row before entering the sum.
  */
object ObjectMetrics {

  /** Per-tile object statistics. `iorg` is None when the tile has fewer
    * than two objects (nearest-neighbour spacing undefined). */
  final case class ObjectStats(
      n_objects: Long,
      mask_px: Long,
      mean_size: Double,
      iorg: Option[Double])

  /** 4-connectivity union-find labeling over the (deduped, sorted) pixel
    * set: returns the root INDEX per pixel; `px(root)` is the component's
    * min-pixel-id label (union always keeps the smaller id as root). */
  private def labelPx(px: Array[Long], nx: Int): Array[Int] = {
    val nPx = px.length
    val idx = new java.util.HashMap[Long, Int](nPx * 2)
    var k = 0
    while (k < nPx) { idx.put(px(k), k); k += 1 }
    val parent = Array.tabulate(nPx)(identity)
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // keep the smaller pixel index as the root => label = min pixel id
        if (px(ra) < px(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    k = 0
    while (k < nPx) {
      val p = px(k)
      val i = (p % nx).toInt
      if (i > 0 && idx.containsKey(p - 1)) union(k, idx.get(p - 1))
      if (p >= nx && idx.containsKey(p - nx)) union(k, idx.get(p - nx))
      k += 1
    }
    Array.tabulate(nPx)(find)
  }

  /** Label + summarise objects in one masked-pixel set.
    * Pixel index p encodes (i, j) as `j * nx + i`, row-major. */
  private[operators] def summarize(maskedPx: Array[Long], nx: Int, ny: Int): ObjectStats = {
    val px = maskedPx.distinct.sorted
    val nPx = px.length
    if (nPx == 0) return ObjectStats(0L, 0L, 0.0, None)
    val roots = labelPx(px, nx)

    // component -> (count, sum_i, sum_j), keyed by min-pixel-id label
    val comps = new java.util.TreeMap[Long, (Long, Long, Long)]()
    var k = 0
    while (k < nPx) {
      val p = px(k)
      val label = px(roots(k))
      val i = p % nx
      val j = p / nx
      val cur = comps.getOrDefault(label, (0L, 0L, 0L))
      comps.put(label, (cur._1 + 1L, cur._2 + i, cur._3 + j))
      k += 1
    }

    val n = comps.size()
    val meanSize = nPx.toDouble / n.toDouble
    if (n < 2) return ObjectStats(n.toLong, nPx.toLong, meanSize, None)

    // centroids in label order (exact: integer sums / integer counts)
    val labels = new Array[Long](n)
    val ci = new Array[Double](n)
    val cj = new Array[Double](n)
    var m = 0
    val it = comps.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      labels(m) = e.getKey
      ci(m) = e.getValue._2.toDouble / e.getValue._1.toDouble
      cj(m) = e.getValue._3.toDouble / e.getValue._1.toDouble
      m += 1
    }

    // nearest-neighbour squared distance per object (min is order-free)
    val r2 = Array.fill(n)(Double.PositiveInfinity)
    var a = 0
    while (a < n) {
      var b = 0
      while (b < n) {
        if (a != b) {
          val d = (ci(a) - ci(b)) * (ci(a) - ci(b)) + (cj(a) - cj(b)) * (cj(a) - cj(b))
          if (d < r2(a)) r2(a) = d
        }
        b += 1
      }
      a += 1
    }

    // Poisson-CDF values, scaled to 1e6 integers (6 dp absorbs libm exp
    // ulp differences across engines); sort by (r2, label) — r2 is
    // bit-identical across engines so the tie-break order matches SQL.
    val area = (nx.toLong * ny.toLong).toDouble
    val order = (0 until n).sortBy(k2 => (r2(k2), labels(k2)))
    var termSum = 0L
    var prevRank = 0L
    var prevP6 = 0L
    var rank = 1L
    for (k2 <- order) {
      val p6 = math.round((1.0 - math.exp(-(n.toDouble / area) * 3.141592653589793 * r2(k2))) * 1000000.0)
      termSum += (rank + prevRank) * (p6 - prevP6)
      prevRank = rank
      prevP6 = p6
      rank += 1
    }
    // close the curve at (p=1, ecdf=1)
    termSum += (prevRank + prevRank) * (1000000L - prevP6)
    val iorg = termSum.toDouble / (2.0 * n.toDouble * 1000000.0)
    ObjectStats(n.toLong, nPx.toLong, meanSize, Some(iorg))
  }

  /** The `cloud_metrics__mask__iorg_objects` analog: feed the masked pixel
    * indices of a tile (filter `value > threshold` upstream, in Catalyst,
    * so pruning/pushdown still apply), get object count / total masked
    * pixels / mean object size / I_org in one pass. */
  def iorgObjects(nx: Int, ny: Int): Aggregator[Long, Buf, ObjectStats] =
    new Aggregator[Long, Buf, ObjectStats] {
      def zero: Buf = Buf.empty
      def reduce(b: Buf, p: Long): Buf = b.add(p)
      def merge(a: Buf, b: Buf): Buf = a ++ b
      def finish(b: Buf): ObjectStats = summarize(b.toPixelArray, nx, ny)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[ObjectStats] = Encoders.product[ObjectStats]
    }

  /** Encoder carrier for the pixel buffer (bounded by the tile size).
    * Primitive growable Array[Long] with amortized doubling — a 256² tile
    * previously churned ~65k boxed cons cells per buffer; this allocates
    * O(log n) arrays and zero boxes. `n` is the live count; spare
    * capacity beyond `n` is at most 2x and only crosses the wire at
    * partial-aggregation shuffle boundaries. The typed Aggregator keeps
    * the buffer as a deserialized object between reduce calls, so `add`
    * reuses the backing array whenever capacity allows. */
  final case class Buf(px: Array[Long], n: Int) {
    def add(p: Long): Buf = {
      val a = if (n < px.length) px
              else java.util.Arrays.copyOf(px, math.max(16, px.length << 1))
      a(n) = p
      Buf(a, n + 1)
    }
    def ++(o: Buf): Buf = {
      val a = java.util.Arrays.copyOf(px, n + o.n)
      System.arraycopy(o.px, 0, a, n, o.n)
      Buf(a, n + o.n)
    }
    def toPixelArray: Array[Long] = java.util.Arrays.copyOf(px, n)
  }
  object Buf { val empty: Buf = Buf(Array.emptyLongArray, 0) }

  // ------------------------------------------------------ morphology (M5)
  /** Per-tile object morphology: the `max_object_fraction` and
    * `mean_eccentricity` plugins of the cloudmetrics mask family.
    * `max_obj_frac` = largest object px / total masked px (exact integer
    * division to double). Eccentricity per object comes from the 2x2
    * pixel-coordinate covariance eigenvalues:
    * ecc = sqrt(1 - lambda2/lambda1), 0 for degenerate (point/line-free)
    * objects; per-object values are rounded to 1e-6 and summed as scaled
    * INTEGERS so the cross-object mean is order-independent and the SQL
    * oracle replays it exactly (sqrt is IEEE correctly-rounded; the only
    * rounding seam is the 6-dp quantization itself). */
  final case class MorphStats(
      n_objects: Long,
      mask_px: Long,
      max_obj_frac: Double,
      mean_ecc: Double)

  private[operators] def morphologyOf(maskedPx: Array[Long], nx: Int): MorphStats = {
    val px = maskedPx.distinct.sorted
    val nPx = px.length
    if (nPx == 0) return MorphStats(0L, 0L, 0.0, 0.0)
    val roots = labelPx(px, nx)
    // component -> [cnt, si, sj, sii, sjj, sij] (all exact integer sums)
    val comps = new java.util.TreeMap[Long, Array[Long]]()
    var k = 0
    while (k < nPx) {
      val p = px(k)
      val label = px(roots(k))
      val i = p % nx
      val j = p / nx
      val s = comps.computeIfAbsent(label, _ => new Array[Long](6))
      s(0) += 1; s(1) += i; s(2) += j
      s(3) += i * i; s(4) += j * j; s(5) += i * j
      k += 1
    }
    val n = comps.size()
    var maxCnt = 0L
    var ecc6Sum = 0L
    val it = comps.values().iterator()
    while (it.hasNext) {
      val s = it.next()
      val cnt = s(0)
      if (cnt > maxCnt) maxCnt = cnt
      val cd = cnt.toDouble
      val ci = s(1).toDouble / cd
      val cj = s(2).toDouble / cd
      val a = s(3).toDouble / cd - ci * ci
      val c = s(4).toDouble / cd - cj * cj
      val b = s(5).toDouble / cd - ci * cj
      val disc = math.sqrt((a - c) / 2.0 * ((a - c) / 2.0) + b * b)
      val l1 = (a + c) / 2.0 + disc
      val l2 = (a + c) / 2.0 - disc
      val ecc = if (l1 <= 0.0) 0.0 else math.sqrt(math.max(0.0, 1.0 - l2 / l1))
      ecc6Sum += math.round(ecc * 1000000.0)
      ()
    }
    MorphStats(n.toLong, nPx.toLong,
      maxCnt.toDouble / nPx.toDouble,
      ecc6Sum.toDouble / (n.toDouble * 1000000.0))
  }

  def morphology(nx: Int, ny: Int): Aggregator[Long, Buf, MorphStats] =
    new Aggregator[Long, Buf, MorphStats] {
      def zero: Buf = Buf.empty
      def reduce(b: Buf, p: Long): Buf = b.add(p)
      def merge(a: Buf, b: Buf): Buf = a ++ b
      def finish(b: Buf): MorphStats = morphologyOf(b.toPixelArray, nx)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[MorphStats] = Encoders.product[MorphStats]
    }

  // -------------------------------------------------------- open sky (M5)
  /** The `open_sky` plugin analog: per raster ROW, the longest contiguous
    * CLEAR (unmasked) run; open_sky = sum of per-row maxima / (nx*ny).
    * Computed from the masked set alone (clear runs are the gaps between
    * consecutive masked i's, plus the borders), integer arithmetic until
    * the single final division — exactly restatable as gaps-and-islands
    * SQL over the clear pixels. */
  final case class OpenSkyStats(mask_px: Long, open_sky: Double)

  private[operators] def openSkyOf(maskedPx: Array[Long], nx: Int, ny: Int): OpenSkyStats = {
    val px = maskedPx.distinct.sorted
    var sumMax = 0L
    var row = 0
    var k = 0
    while (row < ny) {
      // px is sorted, so each row's masked i's are a contiguous slice
      var maxRun = 0L
      var prev = -1L // last masked i seen in this row
      while (k < px.length && px(k) / nx == row) {
        val i = px(k) % nx
        val gap = i - prev - 1
        if (gap > maxRun) maxRun = gap
        prev = i
        k += 1
      }
      val tail = nx - 1 - prev
      if (tail > maxRun) maxRun = tail
      sumMax += maxRun
      row += 1
    }
    OpenSkyStats(px.length.toLong, sumMax.toDouble / (nx.toDouble * ny.toDouble))
  }

  def openSky(nx: Int, ny: Int): Aggregator[Long, Buf, OpenSkyStats] =
    new Aggregator[Long, Buf, OpenSkyStats] {
      def zero: Buf = Buf.empty
      def reduce(b: Buf, p: Long): Buf = b.add(p)
      def merge(a: Buf, b: Buf): Buf = a ++ b
      def finish(b: Buf): OpenSkyStats = openSkyOf(b.toPixelArray, nx, ny)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[OpenSkyStats] = Encoders.product[OpenSkyStats]
    }

  /** Registry hook mirroring TileMetrics.registry for mask-raster metrics
    * (the `a__b__c` dynamic-import analog for object-based metrics). */
  def maskRegistry(name: String, nx: Int, ny: Int): TypedColumn[Long, _ <: Product] = name match {
    case "mask__iorg_objects" => iorgObjects(nx, ny).toColumn.name(name)
    case "mask__morphology"   => morphology(nx, ny).toColumn.name(name)
    case "mask__open_sky"     => openSky(nx, ny).toColumn.name(name)
    case other => throw new IllegalArgumentException(
      s"unknown object metric '$other'; known: mask__iorg_objects, " +
        "mask__morphology, mask__open_sky")
  }
}
