package graft.operators

import graft.SparkSpec
import graft.operators.Hdbscan.{MstEdge, SelectedCluster}

import scala.collection.mutable

/** Adversarial HDBSCAN check: an INDEPENDENT naive implementation —
  * all-pairs distances, Kruskal MST, recursively built dendrogram and
  * condensed tree — compared against the production chain on seeded
  * random fixtures with NESTED density hierarchies (a loose
  * super-cluster containing two tight sub-blobs), where excess-of-mass
  * stability selection must sometimes prefer the children and sometimes
  * the parent. 50 seeds exercise the driver-side condensed
  * tree + cut-based membership; a subset runs the full distributed
  * pipeline end-to-end. */
class HdbscanPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---------------- independent naive HDBSCAN -------------------------

  private def lambda(w: Double): Double =
    1.0 / math.max(w, java.lang.Double.MIN_NORMAL)

  private sealed trait Tree { def size: Int; def leaves: Seq[Long] }
  private final case class Leaf(id: Long) extends Tree {
    def size = 1; def leaves = Seq(id)
  }
  private final case class Node(l: Tree, r: Tree, h: Double) extends Tree {
    val size: Int = l.size + r.size
    lazy val leaves: Seq[Long] = l.leaves ++ r.leaves
  }
  /** Condensed cluster in the naive recursion. */
  private final case class Cond(birthW: Double, stability: Double,
    children: Seq[Cond], leaves: Seq[Long])

  /** All-pairs + Kruskal + recursive condensed tree; returns the full
    * point -> label map (noise = -1). */
  private def naiveHdbscan(pts: Seq[(Long, Double, Double)], mcs: Int,
      ms: Int, epsMax: Double): Map[Long, Long] = {
    val arr = pts.toArray
    def d(i: Int, j: Int): Double = {
      val dx = arr(i)._2 - arr(j)._2; val dy = arr(i)._3 - arr(j)._3
      math.sqrt(dx * dx + dy * dy)
    }
    // core distance: (ms-1)-th nearest OTHER point within epsMax; ms=1 -> 0
    val core = mutable.Map[Long, Double]()
    for (i <- arr.indices) {
      if (ms == 1) core(arr(i)._1) = 0.0
      else {
        val ds = arr.indices.filter(_ != i).map(d(i, _)).filter(_ <= epsMax).sorted
        if (ds.size >= ms - 1) core(arr(i)._1) = ds(ms - 2)
      }
    }
    // mutual-reachability edges between core-carrying points within epsMax
    val mr = for {
      i <- arr.indices; j <- arr.indices
      if i < j
      dij = d(i, j)
      if dij <= epsMax
      ca <- core.get(arr(i)._1); cb <- core.get(arr(j)._1)
    } yield {
      val (a, b) = (math.min(arr(i)._1, arr(j)._1), math.max(arr(i)._1, arr(j)._1))
      MstEdge(a, b, math.max(dij, math.max(ca, cb)))
    }
    // Kruskal in (w, a, b) order, dendrogram built as it merges
    val byRank = mr.sortBy(e => (e.w, e.a, e.b))
    val comp = mutable.Map[Long, Tree]()
    val root = mutable.Map[Long, Long]() // union-find: id -> representative
    def find(x: Long): Long = {
      var r = x
      while (root.getOrElse(r, r) != r) r = root.getOrElse(r, r)
      r
    }
    pts.foreach { case (id, _, _) => comp(id) = Leaf(id) }
    val mstEdges = mutable.ArrayBuffer[MstEdge]()
    byRank.foreach { e =>
      val (ra, rb) = (find(e.a), find(e.b))
      if (ra != rb) {
        val merged = Node(comp(ra), comp(rb), e.w)
        root(ra) = rb; comp -= ra; comp(rb) = merged
        mstEdges += e
      }
    }
    // condensed tree per dendrogram top (forest after epsMax truncation)
    def condense(t: Tree, birthW: Double): Cond = t match {
      case Leaf(id) => Cond(birthW, 0.0, Nil, Seq(id))
      case Node(l, r, h) =>
        val bigL = l.size >= mcs; val bigR = r.size >= mcs
        if (bigL && bigR)
          Cond(birthW, t.size * (lambda(h) - lambda(birthW)),
            Seq(condense(l, h), condense(r, h)), t.leaves)
        else if (bigL) {
          val cont = condense(l, birthW)
          Cond(birthW, cont.stability + r.size * (lambda(h) - lambda(birthW)),
            cont.children, t.leaves)
        } else if (bigR) {
          val cont = condense(r, birthW)
          Cond(birthW, cont.stability + l.size * (lambda(h) - lambda(birthW)),
            cont.children, t.leaves)
        } else
          Cond(birthW, t.size * (lambda(h) - lambda(birthW)), Nil, t.leaves)
    }
    def select(c: Cond): (Double, Seq[Cond]) =
      if (c.children.isEmpty) (c.stability, Seq(c))
      else {
        val rs = c.children.map(select)
        val sum = rs.map(_._1).sum
        if (sum > c.stability) (sum, rs.flatMap(_._2)) else (c.stability, Seq(c))
      }
    val out = mutable.Map[Long, Long]() ++ pts.map(_._1 -> -1L)
    comp.values.foreach { top =>
      if (top.size >= mcs)
        select(condense(top, epsMax))._2.foreach { c =>
          val label = c.leaves.min
          c.leaves.foreach(p => out(p) = label)
        }
    }
    out.toMap
  }

  /** Membership recovery the way the distributed tail does it, but with
    * a spec-local union-find: component (over edges lexicographically
    * before the cut) whose min node is the cluster label. */
  private def labelsFromSelection(edges: Seq[MstEdge], allPids: Seq[Long],
      sel: Seq[SelectedCluster]): Map[Long, Long] = {
    def lexLess(x: MstEdge, e: MstEdge): Boolean =
      x.w < e.w || (x.w == e.w && (x.a < e.a || (x.a == e.a && x.b < e.b)))
    val out = mutable.Map[Long, Long]() ++ allPids.map(_ -> -1L)
    sel.groupBy(_.cut).foreach { case (cut, cs) =>
      val keep = cut match {
        case None => edges
        case Some(e) => edges.filter(lexLess(_, e))
      }
      val root = mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (root.getOrElse(r, r) != r) r = root.getOrElse(r, r)
        r
      }
      keep.foreach { e =>
        val (ra, rb) = (find(e.a), find(e.b))
        if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
      (edges.flatMap(e => Seq(e.a, e.b)).distinct).foreach { p =>
        members.getOrElseUpdate(find(p), mutable.ArrayBuffer()) += p
      }
      cs.foreach { c =>
        // component min IS the representative min; label = that min
        members.get(find(c.label)).foreach { ps =>
          assert(ps.min == c.label, s"component min must equal label ${c.label}")
          ps.foreach(p => out(p) = c.label)
        }
      }
    }
    out.toMap
  }

  /** Nested-hierarchy fixture: a loose super-cluster made of two tight
    * sub-blobs plus a halo, a far second cluster, stray noise. Geometry
    * varies with the seed so stability selection flips between
    * children-win and parent-wins across the suite. */
  private def fixture(seed: Int): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(seed * 7919 + 13)
    def gauss(s: Double) = rnd.nextGaussian() * s
    val gap = 1.5 + (seed % 5) * 1.3
    val spread = 0.22 + (seed % 3) * 0.3
    val subA = (0L until 10L).map(i => (i, -gap / 2 + gauss(spread), gauss(spread)))
    val subB = (10L until 20L).map(i => (i, gap / 2 + gauss(spread), gauss(spread)))
    val halo = (20L until 26L).map(i =>
      (i, (rnd.nextDouble() - 0.5) * 3 * gap, (rnd.nextDouble() - 0.5) * 3 * gap))
    val other = (40L until 50L).map(i => (i, 60.0 + gauss(1.0), 60.0 + gauss(1.0)))
    val stray = Seq((70L, -30.0, 40.0), (71L, 90.0, -20.0))
    subA ++ subB ++ halo ++ other ++ stray
  }

  test("condensed tree + cut membership equals naive HDBSCAN over 50 nested-hierarchy seeds") {
    var childrenWin = 0
    var parentWins = 0
    for (seed <- 0 until 50) {
      val pts = fixture(seed)
      val mcs = 4 + seed % 3
      val ms = 2 + seed % 2
      val epsMax = 25.0
      val expected = naiveHdbscan(pts, mcs, ms, epsMax)
      // production driver chain on the SAME mutual-reachability MST the
      // naive Kruskal produced (Boruvka == Kruskal is proven separately)
      val mst = {
        // rebuild the naive MST deterministically
        val got = mutable.ArrayBuffer[MstEdge]()
        val arr = pts.toArray
        def d(i: Int, j: Int): Double = {
          val dx = arr(i)._2 - arr(j)._2; val dy = arr(i)._3 - arr(j)._3
          math.sqrt(dx * dx + dy * dy)
        }
        val core = mutable.Map[Long, Double]()
        for (i <- arr.indices) {
          val ds = arr.indices.filter(_ != i).map(d(i, _)).filter(_ <= epsMax).sorted
          if (ms == 1) core(arr(i)._1) = 0.0
          else if (ds.size >= ms - 1) core(arr(i)._1) = ds(ms - 2)
        }
        val mr = for {
          i <- arr.indices; j <- arr.indices
          if i < j
          dij = d(i, j)
          if dij <= epsMax
          ca <- core.get(arr(i)._1); cb <- core.get(arr(j)._1)
        } yield MstEdge(math.min(arr(i)._1, arr(j)._1),
          math.max(arr(i)._1, arr(j)._1), math.max(dij, math.max(ca, cb)))
        val root = mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (root.getOrElse(r, r) != r) r = root.getOrElse(r, r)
          r
        }
        mr.sortBy(e => (e.w, e.a, e.b)).foreach { e =>
          val (ra, rb) = (find(e.a), find(e.b))
          if (ra != rb) { root(ra) = rb; got += e }
        }
        got.toArray
      }
      val sel = Hdbscan.condensedSelection(mst, mcs, epsMax)
      val got = labelsFromSelection(mst.toSeq, pts.map(_._1), sel)
      assert(got == expected,
        s"seed=$seed mcs=$mcs ms=$ms: driver chain diverges from naive\n" +
          s"  naive: ${expected.toSeq.sorted}\n  chain: ${got.toSeq.sorted}")
      val superLabels = (0L until 20L).map(expected).filter(_ >= 0).distinct
      if (superLabels.size >= 2) childrenWin += 1
      else if (superLabels.size == 1 &&
        (0L until 20L).forall(expected(_) == superLabels.head)) parentWins += 1
    }
    assert(childrenWin > 0, "suite must include seeds where the sub-blobs are split apart")
    assert(parentWins > 0, "suite must include seeds where the parent cluster wins")
  }

  test("full distributed pipeline equals naive HDBSCAN end-to-end") {
    for (seed <- Seq(1, 7, 12, 23, 31, 44)) {
      val pts = fixture(seed)
      val mcs = 4 + seed % 3
      val ms = 2 + seed % 2
      val epsMax = 25.0
      val expected = naiveHdbscan(pts, mcs, ms, epsMax)
      val got = Hdbscan.cluster(pts.toDF("pid", "x", "y"), "pid", "x", "y",
        minClusterSize = mcs, minSamples = ms, epsMax = epsMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed mcs=$mcs ms=$ms: distributed diverges from naive")
      Dedup.releaseCaches()
    }
  }
}
