package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.sources._

/** Adversarial soundness fuzz for the tree-filter prune
  * ([[MountDsv2.mayMatch]]/[[MountDsv2.boxTreeKeep]]): pruning MUST
  * never drop a box that contains a matching row — a pruned chunk
  * never plans, and residual filters cannot restore rows that were
  * never read. 2,000 seeded random (box, filter-tree) pairs are
  * checked against a brute-force row enumerator; any sound=false
  * discrepancy is a silent-data-loss bug. (The converse — pruning
  * everything prunable — is an optimization, spot-checked only.) */
class TreePruneFuzzSpec extends SparkSpec {

  private val paths = Seq("/cat/s0.zarr", "/cat/s1.zarr", "/cat/s2.zarr")
  private val datasets = Seq("lwp", "t2m")

  /** One synthetic chunk box inside a small array. */
  private case class Box(path: String, dataset: String, origin: Seq[Long],
      box: Seq[Long], dims: Seq[Long]) {
    def rows: Seq[(Long, Seq[Long])] = { // (idx, coords padded to 4)
      val strides = MountDsv2.rowStrides(dims)
      def cells(d: Int, acc: Seq[Long]): Seq[Seq[Long]] =
        if (d == dims.size) Seq(acc)
        else (origin(d) until math.min(origin(d) + box(d), dims(d)))
          .flatMap(c => cells(d + 1, acc :+ c))
      cells(0, Nil).map { cs =>
        val idx = cs.zip(strides).map { case (c, s) => c * s }.sum
        (idx, cs.padTo(4, 0L))
      }
    }
  }

  private def rndBox(rnd: scala.util.Random): Box = {
    val rank = 1 + rnd.nextInt(3)
    val dims = Seq.fill(rank)(1L + rnd.nextInt(6))
    val origin = dims.map(d => rnd.nextInt(d.toInt).toLong)
    val box = dims.map(_ => 1L + rnd.nextInt(3))
    Box(paths(rnd.nextInt(paths.size)), datasets(rnd.nextInt(datasets.size)),
      origin, box, dims)
  }

  private def rndLeaf(rnd: scala.util.Random): Filter = {
    val dimCols = Seq("idx", "d0", "d1", "d2", "d3")
    rnd.nextInt(8) match {
      case 0 => EqualTo("path", paths(rnd.nextInt(paths.size)))
      case 1 => In("path", Array.fill(1 + rnd.nextInt(2))(
        paths(rnd.nextInt(paths.size)): Any))
      case 2 => EqualTo("dataset", datasets(rnd.nextInt(datasets.size)))
      case 3 => EqualTo(dimCols(rnd.nextInt(5)), rnd.nextInt(8).toLong)
      case 4 => GreaterThanOrEqual(dimCols(rnd.nextInt(5)), rnd.nextInt(8).toLong)
      case 5 => LessThanOrEqual(dimCols(rnd.nextInt(5)), rnd.nextInt(8).toLong)
      case 6 => GreaterThan(dimCols(rnd.nextInt(5)), rnd.nextInt(8).toLong)
      case 7 => LessThan(dimCols(rnd.nextInt(5)), rnd.nextInt(8).toLong)
    }
  }

  private def rndTree(rnd: scala.util.Random, depth: Int): Filter =
    if (depth == 0 || rnd.nextInt(3) == 0) rndLeaf(rnd)
    else if (rnd.nextBoolean()) And(rndTree(rnd, depth - 1), rndTree(rnd, depth - 1))
    else Or(rndTree(rnd, depth - 1), rndTree(rnd, depth - 1))

  /** Reference evaluator: does filter f hold on one concrete row? */
  private def eval(f: Filter, b: Box, idx: Long, coords: Seq[Long]): Boolean = {
    def v(c: String): Option[Any] = c match {
      case "path" => Some(b.path)
      case "dataset" => Some(b.dataset)
      case "idx" => Some(idx)
      case "d0" => Some(coords(0))
      case "d1" => Some(coords(1))
      case "d2" => Some(coords(2))
      case "d3" => Some(coords(3))
      case _ => None
    }
    f match {
      case And(x, y) => eval(x, b, idx, coords) && eval(y, b, idx, coords)
      case Or(x, y) => eval(x, b, idx, coords) || eval(y, b, idx, coords)
      case EqualTo(c, w) => v(c).contains(w)
      case In(c, ws) => v(c).exists(ws.contains)
      case GreaterThanOrEqual(c, w: Long) => v(c).exists(_.asInstanceOf[Long] >= w)
      case GreaterThan(c, w: Long) => v(c).exists(_.asInstanceOf[Long] > w)
      case LessThanOrEqual(c, w: Long) => v(c).exists(_.asInstanceOf[Long] <= w)
      case LessThan(c, w: Long) => v(c).exists(_.asInstanceOf[Long] < w)
      case _ => true
    }
  }

  test("mayMatch is SOUND: a box with any matching row is never pruned") {
    val rnd = new scala.util.Random(20260816L)
    var pruned = 0
    var kept = 0
    for (trial <- 1 to 2000) {
      val b = rndBox(rnd)
      val tree = rndTree(rnd, 3)
      val (lo, hi) = MountDsv2.boxBounds(b.origin, b.box, b.dims)
      val keep = MountDsv2.boxTreeKeep(Array(tree), b.path, b.dataset,
        (lo, hi), b.origin, b.box, b.dims)
      val anyRow = b.rows.exists { case (idx, cs) => eval(tree, b, idx, cs) }
      if (keep) kept += 1 else pruned += 1
      assert(!anyRow || keep,
        s"trial $trial: UNSOUND prune of $b under $tree " +
          s"(a row matches but the box was dropped)")
    }
    // the fuzz must actually exercise both outcomes to mean anything
    assert(pruned > 100, s"prune never fired ($pruned) — fuzz too weak")
    assert(kept > 100, s"everything pruned ($kept kept) — fuzz degenerate")
  }

  test("mayMatch prunes the obviously-prunable (spot checks)") {
    val b = Box("/cat/s1.zarr", "lwp", Seq(2, 0), Seq(2, 4), Seq(8, 4))
    val (lo, hi) = MountDsv2.boxBounds(b.origin, b.box, b.dims)
    def keep(f: Filter): Boolean =
      MountDsv2.boxTreeKeep(Array(f), b.path, b.dataset, (lo, hi),
        b.origin, b.box, b.dims)
    assert(!keep(EqualTo("path", "/cat/s0.zarr")))
    assert(!keep(And(EqualTo("path", b.path), GreaterThanOrEqual("d0", 4L))))
    assert(!keep(Or(
      And(EqualTo("path", "/cat/s0.zarr"), LessThanOrEqual("d0", 3L)),
      And(EqualTo("path", b.path), GreaterThanOrEqual("d0", 4L)))))
    assert(keep(Or(
      And(EqualTo("path", "/cat/s0.zarr"), GreaterThanOrEqual("d0", 4L)),
      And(EqualTo("path", b.path), LessThanOrEqual("d0", 3L)))))
    // unknown levels stay conservative
    assert(MountDsv2.ctxKeep(Array(EqualTo("dataset", "lwp")),
      MountDsv2.PruneCtx(path = Some(b.path))))
  }
}
