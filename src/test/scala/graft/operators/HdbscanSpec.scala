package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HDBSCAN (min_cluster_size / min_samples): the distributed layers
  * (candidate pairs, core distances, mutual reachability, Boruvka MST)
  * are proven against independent brute-force implementations; the
  * condensed-tree extraction is proven on fixtures whose correct flat
  * clustering is unambiguous — including the variable-density case
  * single-eps DBSCAN cannot solve, which is the whole point of the
  * algorithm. */
class HdbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run2d(pts: Seq[(Long, Double, Double)], mcs: Int, ms: Int,
      epsMax: Double): Map[Long, Long] =
    Hdbscan.cluster(pts.toDF("pid", "x", "y"), "pid", "x", "y",
      minClusterSize = mcs, minSamples = ms, epsMax = epsMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separated blobs cluster whole; stragglers are noise") {
    val rnd = new scala.util.Random(7)
    val blobA = (0L until 10L).map(i =>
      (i, rnd.nextDouble() * 0.8, rnd.nextDouble() * 0.8))
    val blobB = (20L until 30L).map(i =>
      (i, 50.0 + rnd.nextDouble() * 0.8, 50.0 + rnd.nextDouble() * 0.8))
    val noise = Seq((90L, 25.0, -30.0), (91L, -40.0, 70.0))
    val got = run2d(blobA ++ blobB ++ noise, mcs = 5, ms = 3, epsMax = 10.0)
    blobA.foreach { case (id, _, _) => assert(got(id) == 0L, s"pid $id") }
    blobB.foreach { case (id, _, _) => assert(got(id) == 20L, s"pid $id") }
    assert(got(90L) == -1L && got(91L) == -1L)
  }

  test("variable density: tight AND loose blobs both found (single-eps DBSCAN cannot)") {
    val rnd = new scala.util.Random(11)
    // tight blob: 12 points in a 0.4-radius disc; loose blob: 12 points
    // spread over radius 6 at (60, 0)
    val tight = (0L until 12L).map(i =>
      (i, rnd.nextDouble() * 0.4, rnd.nextDouble() * 0.4))
    val loose = (100L until 112L).map(i =>
      (i, 60.0 + rnd.nextDouble() * 6.0, rnd.nextDouble() * 6.0))
    val pts = tight ++ loose
    val got = run2d(pts, mcs = 6, ms = 3, epsMax = 20.0)
    tight.foreach { case (id, _, _) => assert(got(id) == 0L, s"tight pid $id") }
    loose.foreach { case (id, _, _) => assert(got(id) == 100L, s"loose pid $id") }
    // the classic failure of one global eps: eps small enough to keep the
    // blobs apart fragments the loose blob into noise
    val dbscan = Dbscan.cluster(pts.toDF("pid", "x", "y"), "pid", "x", "y",
      eps = 0.5, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose.count { case (id, _, _) => dbscan(id) == -1L } > 6,
      "fixture sanity: single small eps must fragment the loose blob")
  }

  test("n-dim clusterVectors equals the 2-D path on an embedded fixture") {
    val rnd = new scala.util.Random(23)
    val pts = (0L until 24L).map { i =>
      val (cx, cy) = if (i < 12) (0.0, 0.0) else (30.0, 30.0)
      (i, cx + rnd.nextDouble(), cy + rnd.nextDouble())
    }
    val got2d = run2d(pts, mcs = 5, ms = 3, epsMax = 8.0)
    val vecs = pts.map { case (id, x, y) => (id, Seq(x, y, 4.0, -1.0, 0.5)) }
    val gotNd = Hdbscan.clusterVectors(vecs.toDF("pid", "vec"), "pid", "vec",
      minClusterSize = 5, minSamples = 3, epsMax = 8.0, binDims = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNd == got2d)
  }

  test("Boruvka MST equals an independent Kruskal on distinct-weight graphs") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 3) {
      val n = 30 + trial * 10
      val pts = (0L until n.toLong).map(i =>
        (i, rnd.nextDouble() * 20.0, rnd.nextDouble() * 20.0))
      // candidate edges: all pairs within 8.0 (distinct weights w.p. 1)
      val edges = for {
        (a, ax, ay) <- pts; (b, bx, by) <- pts
        if a < b
        d = math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
        if d <= 8.0
      } yield (a, b, d)
      val got = Hdbscan.boruvkaMst(
        edges.toDF("a_id", "b_id", "w"), checkpointDir = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // independent Kruskal with union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def root(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        r
      }
      val kruskal = scala.collection.mutable.Set[(Long, Long, Double)]()
      edges.sortBy(_._3).foreach { case (a, b, d) =>
        val (ra, rb) = (root(a), root(b))
        if (ra != rb) { parent(ra) = rb; kruskal += ((a, b, d)) }
      }
      assert(got == kruskal.toSet, s"trial $trial: MST edge sets diverge")
      Dedup.releaseCaches()
    }
  }

  test("core distances match brute-force kNN through the cluster output") {
    // indirect: a ring where every point has exactly 2 close neighbors;
    // minSamples=4 forces core distances to reach across the ring, so
    // mutual reachability >> pair distance and nothing clusters below
    // the truncation — all noise. With minSamples=2 the ring is one
    // cluster. The flip pins the core-distance rank arithmetic.
    val ring = (0 until 12).map { i =>
      val th = i * math.Pi / 6
      (i.toLong, 10.0 * math.cos(th), 10.0 * math.sin(th))
    }
    val loose = run2d(ring, mcs = 6, ms = 2, epsMax = 6.5)
    assert(ring.forall { case (id, _, _) => loose(id) == 0L },
      "ring with minSamples=2 must form one cluster")
    val strict = run2d(ring, mcs = 6, ms = 6, epsMax = 6.5)
    assert(ring.forall { case (id, _, _) => strict(id) == -1L },
      "minSamples=6 core distances exceed epsMax: all noise")
  }

  test("minSamples = 1 means core distance 0 everywhere, not all-noise") {
    // row_number starts at 1, so the rank filter can never express
    // minSamples=1; the special case must kick in (hdbscan-library
    // semantics: the point itself is its own 1st neighbor)
    val rnd = new scala.util.Random(31)
    val blob = (0L until 10L).map(i =>
      (i, rnd.nextDouble() * 0.5, rnd.nextDouble() * 0.5))
    val far = Seq((50L, 200.0, 200.0))
    val got = run2d(blob ++ far, mcs = 5, ms = 1, epsMax = 10.0)
    blob.foreach { case (id, _, _) => assert(got(id) == 0L, s"pid $id") }
    assert(got(50L) == -1L)
  }

  test("label tail ships no driver-built point->label map") {
    // the round-5 shape collected all pids and broadcast an n-row
    // LocalRelation [pid, cluster]; the distributed tail must have
    // neither a broadcast hint nor any (pid, cluster) LocalRelation
    val rnd = new scala.util.Random(41)
    val pts = (0L until 24L).map { i =>
      val (cx, cy) = if (i < 12) (0.0, 0.0) else (40.0, 0.0)
      (i, cx + rnd.nextDouble(), cy + rnd.nextDouble())
    }
    val df = Hdbscan.cluster(pts.toDF("pid", "x", "y"), "pid", "x", "y",
      minClusterSize = 5, minSamples = 3, epsMax = 8.0)
    val analyzed = df.queryExecution.analyzed
    assert(!analyzed.toString.contains("ResolvedHint"),
      "no broadcast hint in the label tail")
    val locals = analyzed.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.output.map(_.name)
    }
    assert(!locals.exists(_ == Seq("pid", "cluster")),
      "no driver-built label LocalRelation in the plan")
    // and it still labels correctly
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 12L).foreach(i => assert(got(i) == 0L))
    (12L until 24L).foreach(i => assert(got(i) == 12L))
  }

  test("degenerate inputs: everything isolated, empty frame") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 100.0, 0.0), (3L, 0.0, 100.0))
    val got = run2d(pts, mcs = 2, ms = 2, epsMax = 1.0)
    assert(got == Map(1L -> -1L, 2L -> -1L, 3L -> -1L))
    val empty = run2d(Seq.empty, mcs = 2, ms = 2, epsMax = 1.0)
    assert(empty.isEmpty)
  }
}
