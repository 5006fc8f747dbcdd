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

  /** Label + summarise objects in one masked-pixel set.
    * Pixel index p encodes (i, j) as `j * nx + i`, row-major. */
  private[operators] def summarize(maskedPx: Array[Long], nx: Int, ny: Int): ObjectStats = {
    val px = maskedPx.distinct.sorted
    val nPx = px.length
    if (nPx == 0) return ObjectStats(0L, 0L, 0.0, None)

    // union-find over the raster; roots resolve to the min pixel index
    // of each component because union always keeps the smaller id.
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
      val j = (p / nx).toInt
      if (i > 0 && idx.containsKey(p - 1)) union(k, idx.get(p - 1))
      if (j > 0 && idx.containsKey(p - nx)) union(k, idx.get(p - nx))
      k += 1
    }

    // component -> (count, sum_i, sum_j), keyed by min-pixel-id label
    val comps = new java.util.TreeMap[Long, (Long, Long, Long)]()
    k = 0
    while (k < nPx) {
      val p = px(k)
      val label = px(find(k))
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
      def zero: Buf = Buf(Nil)
      def reduce(b: Buf, p: Long): Buf = Buf(p :: b.px)
      def merge(a: Buf, b: Buf): Buf = Buf(a.px ::: b.px)
      def finish(b: Buf): ObjectStats = summarize(b.px.toArray, nx, ny)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[ObjectStats] = Encoders.product[ObjectStats]
    }

  /** Encoder carrier for the pixel-list buffer (bounded by the tile size). */
  final case class Buf(px: List[Long])

  /** Registry hook mirroring TileMetrics.registry for mask-raster metrics
    * (the `a__b__c` dynamic-import analog for object-based metrics). */
  def maskRegistry(name: String, nx: Int, ny: Int): TypedColumn[Long, ObjectStats] = name match {
    case "mask__iorg_objects" => iorgObjects(nx, ny).toColumn.name(name)
    case other => throw new IllegalArgumentException(
      s"unknown object metric '$other'; known: mask__iorg_objects")
  }
}
