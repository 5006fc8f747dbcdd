package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DBSCAN vs an independent brute-force implementation (all-pairs
  * neighbors + BFS components + the same deterministic label rules):
  * the bin-join candidate generation must lose NO ε-pair across cell
  * borders, and core/border/noise classification must match exactly. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference with identical conventions: degree includes
    * self; clusters = min core id over core-core components; border =
    * min neighbor cluster; noise = -1. */
  private def brute(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, (Long, Boolean)] = {
    val eps2 = eps * eps
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps2
    val nbrs = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // BFS components over core-core edges
    var labels = Map.empty[Long, Long]
    for (seed <- core.toSeq.sorted if !labels.contains(seed)) {
      var comp = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(nbrs).filter(core).diff(comp)
        comp ++= frontier
      }
      val label = comp.min
      comp.foreach(id => labels += id -> label)
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> (labels(id), true)
      else {
        val coreNbrs = nbrs(id).filter(n => n != id && core(n))
        if (coreNbrs.nonEmpty) id -> (coreNbrs.map(labels).min, false)
        else id -> (-1L, false)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, (Long, Boolean)] =
    Dbscan.cluster(pts.toDF("pid", "x", "y"), "pid", "x", "y", eps, minPts)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("two blobs and a far point: clusters, border, noise") {
    // blob A around (0,0), blob B around (10,10), point C alone
    val a = Seq((0L, 0.0, 0.0), (1L, 0.5, 0.0), (2L, 0.0, 0.5), (3L, 0.4, 0.4))
    val b = Seq((10L, 10.0, 10.0), (11L, 10.5, 10.0), (12L, 10.0, 10.5), (13L, 10.4, 10.4))
    // border: within eps of blob A's cores but with too few neighbors
    val border = Seq((20L, 1.3, 0.0))
    val noise = Seq((30L, 50.0, 50.0))
    val got = run(a ++ b ++ border ++ noise, eps = 1.0, minPts = 4)
    assert(got == brute(a ++ b ++ border ++ noise, 1.0, 4))
    assert(got(0L) == (0L, true) && got(3L) == (0L, true))
    assert(got(10L) == (10L, true))
    assert(got(20L) == (0L, false)) // border adopts blob A's label
    assert(got(30L) == (-1L, false)) // noise
  }

  test("bin-join candidates equal brute-force on seeded random points") {
    // points span many grid cells; pairs straddling cell borders are the
    // regression this guards (a lost candidate shows up as a wrong label)
    val rnd = new scala.util.Random(421)
    val pts = (0L until 150L).map(id =>
      (id, rnd.nextDouble() * 40.0, rnd.nextDouble() * 40.0))
    for ((eps, minPts) <- Seq((2.0, 3), (3.5, 5), (0.7, 2))) {
      assert(run(pts, eps, minPts) == brute(pts, eps, minPts),
        s"mismatch at eps=$eps minPts=$minPts")
    }
  }

  // -------------------------------------------------- n-dim vectors
  /** Brute force for vectors: same conventions, full-dim distance. */
  private def bruteVec(pts: Seq[(Long, Array[Double])], eps: Double, minPts: Int)
      : Map[Long, (Long, Boolean)] = {
    val eps2 = eps * eps
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) - b(i)) * (a(i) - b(i)); i += 1 }
      acc
    }
    val byId = pts.toMap
    val nbrs = pts.map(p => p._1 -> pts.filter(q => d2(p._2, q._2) <= eps2).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    var labels = Map.empty[Long, Long]
    for (seed <- core.toSeq.sorted if !labels.contains(seed)) {
      var comp = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(nbrs).filter(core).diff(comp)
        comp ++= frontier
      }
      val label = comp.min
      comp.foreach(id => labels += id -> label)
    }
    byId.keys.map { id =>
      if (core(id)) id -> (labels(id), true)
      else {
        val coreNbrs = nbrs(id).filter(n => n != id && core(n))
        if (coreNbrs.nonEmpty) id -> (coreNbrs.map(labels).min, false)
        else id -> (-1L, false)
      }
    }.toMap
  }

  private def runVec(pts: Seq[(Long, Array[Double])], eps: Double, minPts: Int,
      binDims: Int): Map[Long, (Long, Boolean)] =
    Dbscan.clusterVectors(pts.map { case (id, v) => (id, v.toSeq) }.toDF("pid", "vec"),
      "pid", "vec", eps, minPts, binDims)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("64-d vectors: clusterVectors equals brute force, all binDims agree") {
    // 10 planted centers in 64-d, 12 members each with +/-1.5 jitter,
    // plus isolated noise points far away
    val rnd = new scala.util.Random(20260812L)
    val centers = Array.fill(10, 64)(rnd.nextDouble() * 60.0)
    val members = (0L until 120L).map { id =>
      val c = centers((id % 10).toInt)
      id -> Array.tabulate(64)(j => c(j) + (rnd.nextDouble() - 0.5) * 3.0)
    }
    val noise = (200L until 208L).map { id =>
      id -> Array.tabulate(64)(j => 1000.0 + id * 17.0 + j)
    }
    val pts = members ++ noise
    // eps must beat the intra-cluster diameter (~sqrt(64*2.25)=12) but
    // not bridge distinct random centers (typical separation ~190)
    val expected = bruteVec(pts, eps = 14.0, minPts = 5)
    for (binDims <- 1 to 3) {
      assert(runVec(pts, 14.0, 5, binDims) == expected,
        s"binDims=$binDims must lose no candidate pair")
    }
  }

  test("n-dim borders and noise classified like the 2-D path") {
    // embed the 2-D blob fixture into 5-d (extra dims constant): labels
    // must match the 2-D operator exactly
    val flat = Seq(
      (0L, 0.0, 0.0), (1L, 0.5, 0.0), (2L, 0.0, 0.5), (3L, 0.4, 0.4),
      (10L, 10.0, 10.0), (11L, 10.5, 10.0), (12L, 10.0, 10.5), (13L, 10.4, 10.4),
      (20L, 1.3, 0.0), (30L, 50.0, 50.0))
    val vecs = flat.map { case (id, x, y) => id -> Array(x, y, 7.0, -3.0, 0.25) }
    val got2d = run(flat, eps = 1.0, minPts = 4)
    assert(runVec(vecs, 1.0, 4, binDims = 2) == got2d)
    assert(runVec(vecs, 1.0, 4, binDims = 3) == got2d)
  }

  test("degenerate inputs: all-identical points, empty frame") {
    val same = (0L until 6L).map(id => (id, 1.0, 1.0))
    val got = run(same, eps = 0.5, minPts = 6)
    // six coincident points: every one core, one cluster labeled 0
    assert(got.values.toSet == Set((0L, true)))
    val empty = run(Seq.empty, eps = 1.0, minPts = 3)
    assert(empty.isEmpty)
  }
}
