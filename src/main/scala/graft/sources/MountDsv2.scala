package graft.sources

import org.apache.spark.sql.connector.read.{ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Shared scaffolding for the five DSv2 mounts (HDF5 / Arrow / zarr /
  * netCDF-3 / npy), so sibling behavior can't drift: ONE place defines
  * which filters push into the plan phase, how a pushed filter prunes,
  * how tasks slice into InputPartitions, and the plan-time parallelism
  * rule.
  *
  * Contract (every mount): pushFilters accepts `dataset`/`path`
  * equality + IN for plan-phase task pruning and `idx` range
  * predicates for chunk-grid pruning, but ALL filters stay residual
  * (returned to Spark), so Spark re-evaluates them — a prune can only
  * ever drop tasks the filter provably excludes, never decide
  * correctness. `idx` pruning is the P2-spatial-crop access pattern at
  * mount level: a bbox slice of a 100 TB store must PLAN only its
  * chunks, and since every format's chunk grid is closed-form, the
  * [min, max] global-linear-index window of each task is pure
  * arithmetic.
  */
object MountDsv2 {

  /** Inclusive [lo, hi] bound on `idx` implied by the pushed filters;
    * `full` when none push. `lo > hi` = provably empty. */
  final case class IdxRange(lo: Long, hi: Long) {
    def isEmpty: Boolean = lo > hi
    def isFull: Boolean = lo == Long.MinValue && hi == Long.MaxValue
    /** Does a task whose idx values span [min, max] survive the range? */
    def intersects(min: Long, max: Long): Boolean =
      !isEmpty && max >= lo && min <= hi
  }

  val FullRange: IdxRange = IdxRange(Long.MinValue, Long.MaxValue)

  /** The filters a mount accepts for plan-phase pruning: equality/IN on
    * the string identity columns, range/equality/IN on the Long `idx`
    * column (when the mount exposes one). Everything else is untouched
    * (and even accepted filters stay residual in the caller). */
  def acceptFilters(filters: Array[Filter], stringCols: Set[String],
      idxCol: Option[String]): Array[Filter] =
    filters.filter {
      case EqualTo(c, _: String) if stringCols(c) => true
      case In(c, vs) if stringCols(c) => vs.forall(_.isInstanceOf[String])
      case EqualTo(c, _: Long) if idxCol.contains(c) => true
      case GreaterThan(c, _: Long) if idxCol.contains(c) => true
      case GreaterThanOrEqual(c, _: Long) if idxCol.contains(c) => true
      case LessThan(c, _: Long) if idxCol.contains(c) => true
      case LessThanOrEqual(c, _: Long) if idxCol.contains(c) => true
      case In(c, vs) if idxCol.contains(c) => vs.nonEmpty && vs.forall(_.isInstanceOf[Long])
      case _ => false
    }

  /** Does string value `v` of column `col` survive every pushed filter? */
  def keep(pushed: Array[Filter], col: String, v: String): Boolean =
    pushed.forall {
      case EqualTo(`col`, want: String) => v == want
      case In(`col`, vs) => vs.contains(v)
      case _ => true
    }

  /** Fold the pushed `idx` predicates into one inclusive range.
    * IN folds to [min, max] — a superset, exactness restored by the
    * residual filter. Saturating arithmetic: `idx > Long.MaxValue` is
    * provably empty, never a wrapped bound. */
  def idxRange(pushed: Array[Filter], col: String = "idx"): IdxRange = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    pushed.foreach {
      case EqualTo(`col`, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThanOrEqual(`col`, v: Long) => lo = math.max(lo, v)
      case GreaterThan(`col`, v: Long) =>
        if (v == Long.MaxValue) { lo = 1; hi = 0 } else lo = math.max(lo, v + 1)
      case LessThanOrEqual(`col`, v: Long) => hi = math.min(hi, v)
      case LessThan(`col`, v: Long) =>
        if (v == Long.MinValue) { lo = 1; hi = 0 } else hi = math.min(hi, v - 1)
      case In(`col`, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
        val ls = vs.map(_.asInstanceOf[Long])
        lo = math.max(lo, ls.min); hi = math.min(hi, ls.max)
      case _ => ()
    }
    IdxRange(lo, hi)
  }

  /** Inclusive global-linear-index bounds of one row-major box (a
    * chunk): linearization is monotone in each coordinate, so the box's
    * extreme indexes sit at its corners — min at `origin`, max at the
    * shape-clipped far corner. The box SPANS [lo, hi] but doesn't fill
    * it; pruning on the bound is a superset, exactness restored by the
    * residual filter. */
  def boxBounds(origin: Seq[Long], box: Seq[Long], dims: Seq[Long]): (Long, Long) = {
    require(origin.size == box.size && box.size == dims.size,
      s"box rank mismatch: $origin / $box / $dims")
    val strides = dims.scanRight(1L)(_ * _).tail
    var lo = 0L
    var hi = 0L
    var d = 0
    while (d < dims.size) {
      lo += origin(d) * strides(d)
      hi += math.min(origin(d) + box(d) - 1, dims(d) - 1) * strides(d)
      d += 1
    }
    (lo, hi)
  }

  /** Driver-side (createReaderFactory / pre-mapPartitions): capture the
    * planning session's hadoop-conf deltas so reader factories and
    * ingest closures can [[ByteStore.install]] them on executor JVMs —
    * where no SparkSession exists and driver-set s3a credentials would
    * otherwise be invisible. */
  def confSnapshot(): Map[String, String] =
    ByteStore.confSnapshot(org.apache.spark.sql.SparkSession.active)

  /** Plan-time parallelism: the explicit `partitions` option, else the
    * planning session's defaultParallelism capped by the task count.
    * DRIVER-SIDE ONLY — `SparkSession.active` is the planning session
    * inside `planInputPartitions`, which Spark always runs on the
    * driver; this must never be called from an executor (no session
    * exists there). */
  def parallelism(fmt: String, partitions: Option[Int], total: Int): Int = {
    val par = partitions.getOrElse(math.max(1, math.min(total,
      org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism)))
    require(par > 0, s"$fmt: partitions option must be positive, got $par")
    par
  }

  /** Balanced contiguous slices (at most `par`), preserving task order —
    * tasks arrive (path, offset)-sorted so each slice's positioned reads
    * advance monotonically through one file region. */
  def slice[T](tasks: Seq[T], par: Int): Seq[Seq[T]] =
    if (tasks.isEmpty || par <= 0) Seq.empty
    else {
      val n = math.min(par, tasks.size)
      val sz = (tasks.size + n - 1) / n
      tasks.grouped(sz).toSeq
    }

  /** Read-request coalescing defaults: merge byte-adjacent windows when
    * the junk gap between them is at most [[DefaultMaxGap]] and the
    * merged span stays under [[DefaultMaxSpan]]. The gap trades wasted
    * bytes for saved round-trips — at object-store latency one extra
    * 64 KiB read costs far less than a second GET; the span cap bounds
    * a task's read-buffer memory. */
  val DefaultMaxGap: Long = 64L << 10
  val DefaultMaxSpan: Long = 8L << 20

  /** Coalesce (offset, length) byte windows — IN INPUT ORDER — into
    * read groups: index ranges [start, end) over the input such that
    * one positioned read of [first.offset, last.offset + last.length)
    * covers every window in the group. A new group starts whenever the
    * next window regresses or overlaps (defensive: planners emit
    * monotone non-overlapping windows), the gap to it exceeds `maxGap`,
    * or the merged span would exceed `maxSpan`. Zero-length windows
    * merge freely. This is the mounts' request-count lever on object
    * stores: chunk files written back-to-back (zarr shard inners, HDF5
    * contiguous chunk runs) collapse from one GET per chunk to one GET
    * per span. */
  /** Consecutive runs sharing a key, order preserved (tasks arrive
    * (path, offset)-sorted, so a run = one file's contiguous tasks). */
  def runs[T](ts: Seq[T])(key: T => Any): Seq[IndexedSeq[T]] = {
    if (ts.isEmpty) return Seq.empty
    val out = Seq.newBuilder[IndexedSeq[T]]
    val cur = IndexedSeq.newBuilder[T]
    var k = key(ts.head)
    ts.foreach { t =>
      if (key(t) != k) { out += cur.result(); cur.clear(); k = key(t) }
      cur += t
    }
    out += cur.result()
    out.result()
  }

  def coalesceWindows(windows: IndexedSeq[(Long, Long)],
      maxGap: Long = DefaultMaxGap, maxSpan: Long = DefaultMaxSpan): Seq[Range] = {
    windows.foreach { case (off, len) =>
      require(off >= 0 && len >= 0, s"negative byte window ($off, $len)") }
    if (windows.isEmpty) return Seq.empty
    val groups = Seq.newBuilder[Range]
    var start = 0
    var gStart = windows(0)._1
    var gEnd = windows(0)._1 + windows(0)._2
    var i = 1
    while (i < windows.length) {
      val (off, len) = windows(i)
      val end = off + len
      val ok = off >= gEnd && // monotone, no overlap with the group
        off - gEnd <= maxGap &&
        end - gStart <= maxSpan
      if (ok) gEnd = math.max(gEnd, end)
      else {
        groups += (start until i)
        start = i; gStart = off; gEnd = end
      }
      i += 1
    }
    groups += (start until windows.length)
    groups.result()
  }
}

/** The ScanBuilder shell every mount shares: column pruning into
  * `required`, filter pushdown via [[MountDsv2.acceptFilters]] with all
  * filters kept residual. Subclasses implement only `build()`. */
abstract class MountScanBuilder(defaultSchema: StructType,
    stringCols: Set[String], idxCol: Option[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  protected var required: StructType = defaultSchema
  protected var pushed: Array[Filter] = Array.empty

  final override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = MountDsv2.acceptFilters(filters, stringCols, idxCol)
    filters // ALL residual: pruning is an optimization, never correctness
  }
  final override def pushedFilters(): Array[Filter] = pushed
  final override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
}
