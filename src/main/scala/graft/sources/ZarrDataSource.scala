package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 facade over [[ZarrChunkIngest]] — zarr v2/v3 stores
  * (including ZEP-2 sharded v3 arrays) mount like any other format,
  * the symmetry partner of [[Hdf5DataSource]] and [[ArrowDataSource]]:
  *
  * {{{
  * spark.read.format("graft.sources.ZarrDataSource")
  *   .option("path", "/data/scenes")        // a store, a dir of stores, or a URI
  *   .load()                                // (path, dataset, idx, value)
  *   .where($"dataset" === "grp/lwp")       // FILTER PUSHDOWN prunes chunks
  *   .where($"idx".between(a, b))           // RANGE PUSHDOWN prunes the grid
  *   .select("idx")                         // COLUMN PRUNING: chunk bytes never read
  * }}}
  *
  * Split planning IS the chunk map: phase 1 (plan time, driver) parses
  * only array metadata — and for SHARDED v3 arrays only each shard's
  * crc32c-verified (offset, nbytes) index tail — then slices the task
  * list into InputPartitions, so the scan→filter→project plan carries
  * NO exchange. `dataset`/`path` equality and IN filters push into the
  * PLAN phase (pruned arrays' chunks are never planned), `idx` ranges
  * prune chunks (and shard-inner chunks) on their closed-form
  * [min, max] global-index windows — the spatial-crop access pattern —
  * and every filter stays residual, so pruning is an optimization,
  * never a correctness dependency. Column pruning reaches the byte
  * level: a projection without `value` walks the closed-form grid
  * (`chunkIndexes`/`innerIndexes`) — chunk files are never opened, so
  * existence/count scans over a 100 TB store do metadata-proportional
  * work (proven in ZarrDataSourceSpec by reading a store whose chunk
  * payloads are CORRUPT: index-only projections succeed, value reads
  * reject).
  *
  * Hierarchies NEST: discovery walks groups recursively (v2
  * `.zgroup`/`.zarray` markers, v3 `zarr.json` node_type), and nested
  * arrays are addressed by their group path in the `dataset` column
  * (`grp/sub/arr`) — the layout xarray writes for multi-variable model
  * output. All byte access goes through [[ByteStore]], so
  * `file://`/`hdfs://`/`s3a://` stores mount identically to local
  * paths — zarr's native habitat is exactly the object store.
  *
  * Reference analog: convml_data writes/reads zarr whole-array via
  * xarray (pipeline/embeddings/aux_fields/utils.py:46-53); this is the
  * consolidated-store mount that world lacks.
  */
class ZarrDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZarrTable(properties.get("path"),
      Option(properties.get("dataset")),
      Option(properties.get("partitions")).map(_.toInt),
      Option(properties.get("arrays")).map(ZarrDataSource.parseArrays),
      Option(properties.get("hulls")).map(MountDsv2.parseHulls))
}

object ZarrDataSource {
  /** `d0..d3` are the element's per-dimension coordinates (row-major;
    * 0 past the array's rank) — range predicates on them prune chunks,
    * shards AND shard-inner chunks by per-dim box intersection, the
    * bbox-crop access pattern a linear `idx` range cannot express on
    * non-leading dimensions. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("dataset", StringType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)) ++
    MountDsv2.DimCols.map(StructField(_, LongType, nullable = false)))

  /** An array node = a directory holding `.zarray` (v2) or an array
    * `zarr.json` (v3 — group nodes don't count). */
  private def isArray(dir: String): Boolean = {
    if (ByteStore.isFile(ByteStore.join(dir, ".zarray"))) return true
    val v3 = ByteStore.join(dir, "zarr.json")
    ByteStore.isFile(v3) && {
      // node_type discriminates; parseMeta validates later
      ByteStore.readString(v3).contains("\"array\"")
    }
  }

  /** An explicit zarr node marker at `dir` — how a STORE root announces
    * itself even when all its arrays are nested in groups. */
  private def hasNodeMarker(dir: String): Boolean =
    ByteStore.isFile(ByteStore.join(dir, ".zarray")) ||
      ByteStore.isFile(ByteStore.join(dir, ".zgroup")) ||
      ByteStore.isFile(ByteStore.join(dir, "zarr.json"))

  /** All arrays under each root, RECURSIVELY through group directories,
    * as (root, group-path) pairs sorted by (root, path). The walk is a
    * breadth-first LEVEL SWEEP: every directory at a level is listed
    * and node-probed in one [[ByteStore.parMap]] batch, so plan-time
    * latency on an object store scales with tree DEPTH (≤ maxDepth
    * round-trip waves), not directory count — a mount over thousands
    * of scene stores walks them all concurrently. Depth-bounded so a
    * pathological self-looping mount can't spin the planner. */
  private[sources] def arraysUnder(roots: Seq[String], maxDepth: Int = 8)
      : Seq[(String, String)] = {
    val found = Seq.newBuilder[(String, String)]
    // (root, dir, rel-path-under-root)
    var frontier: Seq[(String, String, String)] = roots.map(r => (r, r, ""))
    var depth = 0
    while (frontier.nonEmpty && depth <= maxDepth) {
      val level = ByteStore.parMap(frontier) { case (root, dir, rel) =>
        ByteStore.list(dir).filter(_.isDir).map { e =>
          val childRel = if (rel.isEmpty) e.name else rel + "/" + e.name
          (root, e.path, childRel, isArray(e.path))
        }
      }.flatten
      found ++= level.collect { case (root, _, rel, true) => (root, rel) }
      frontier = level.collect { case (root, p, rel, false) => (root, p, rel) }
      depth += 1
    }
    found.result().sorted
  }

  private[sources] def arraysIn(store: String, maxDepth: Int = 8): Seq[String] =
    arraysUnder(Seq(store), maxDepth).map(_._2)

  /** Parse an explicit `arrays` option — newline-separated
    * `store<TAB>array` pairs. An EXPLICIT list skips discovery
    * entirely: a catalog planned from a persisted manifest mounts its
    * member arrays with ZERO listing or probing round trips. */
  private[sources] def parseArrays(spec: String): Seq[(String, String)] =
    spec.split('\n').toSeq.map(_.trim).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(s, a) => (s, a)
        case _ => throw new IllegalArgumentException(
          s"graft-zarr: arrays entry '$line' is not store<TAB>array")
      }
    }.sorted

  /** Resolve `path` to (store, array) pairs: a store dir (detected by a
    * node marker at its root or arrays directly under it), or a dir
    * whose child dirs are stores (the one-store-per-scene layout
    * [[ZarrSink]] writes). Arrays nest through groups either way. */
  private[sources] def discover(path: String): Seq[(String, String)] = {
    require(ByteStore.isDirectory(path), s"graft-zarr: $path is not a directory")
    lazy val children = ByteStore.list(path).filter(_.isDir)
    val rootIsStore = hasNodeMarker(path) ||
      ByteStore.parMap(children)(e => isArray(e.path)).exists(identity)
    if (rootIsStore) arraysIn(path).map(a => (path, a))
    else {
      val stores = arraysUnder(children.map(_.path))
      require(stores.nonEmpty,
        s"graft-zarr: no zarr arrays under $path (or its child stores)")
      stores
    }
  }
}

class ZarrTable(path: String, dataset: Option[String], partitions: Option[Int],
    arrays: Option[Seq[(String, String)]] = None,
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Table with SupportsRead {
  require(path != null, "graft-zarr needs a path option")
  override def name(): String = s"graft-zarr[$path]"
  override def schema(): StructType = ZarrDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MountScanBuilder(ZarrDataSource.schema, Set("dataset", "path"),
        Set("idx") ++ MountDsv2.DimCols) {
      override def build(): Scan =
        new ZarrScan(path, dataset, partitions, required, pushed, arrays,
          hulls)
    }
}

/** One partition = a run of whole-chunk tasks or shard-inner tasks
  * (the two phase-1 granularities; an array is one or the other). */
case class ZarrChunkPartition(tasks: Seq[ZarrChunkIngest.ChunkTask])
    extends InputPartition
case class ZarrInnerPartition(tasks: Seq[ZarrChunkIngest.InnerTask])
    extends InputPartition

class ZarrScan(path: String, dataset: Option[String], partitions: Option[Int],
    required: StructType, pushed: Array[Filter],
    explicitArrays: Option[Seq[(String, String)]] = None,
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-zarr scan $path cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val range = MountDsv2.idxRange(pushed)
    val dimRs = MountDsv2.dimRanges(pushed)
    val trees = MountDsv2.treeFilters(pushed)
    // an explicit array list (manifest-planned catalogs) skips the
    // discovery walk: ZERO list/probe round trips at plan time
    val arrays = explicitArrays.getOrElse(ZarrDataSource.discover(path))
      // store-level prune: a store excluded here (path equality/IN, or
      // every branch of a catalog-crop disjunction naming other stores)
      // never has its per-array metadata read, let alone data
      .filter { case (s, _) => MountDsv2.keep(pushed, "path", s) &&
        MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(path = Some(s))) }
      .filter { case (s, a) => dataset.forall(_ == a) &&
        MountDsv2.keep(pushed, "dataset", a) &&
        MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(Some(s), Some(a))) }
    // per-array metadata work (array meta + surviving shards' index
    // tails) is independent round trips — one parMap wave, input order
    // kept so the task lists land (store, array)-sorted as before
    val perArray = ByteStore.parMap(arrays) { case (s, a) =>
      // join-form catalog crop: intersect THIS store's hull into the
      // per-dim ranges so its chunks prune on its own window, not just
      // the catalog-wide union envelope (pruning-only; the broadcast-
      // join residual enforces exactness)
      val effRs = MountDsv2.effDimRanges(hulls, s, dimRs)
      ZarrChunkIngest.metaOf(s, a) match {
        case Right(m) if m.sharding.isDefined =>
          // idx + dK prune at TWO granularities: whole shards whose
          // closed-form window (or per-dim box) misses never have
          // their index tails READ (metadata work proportional to
          // the crop), then surviving shards' inner-chunk windows
          // and boxes prune task-by-task
          (Seq.empty[ZarrChunkIngest.ChunkTask],
            ZarrChunkIngest.shardInnerTasks(s, a, ci => {
              val (lo, hi) = ZarrChunkIngest.shardIdxBounds(ci, m)
              range.intersects(lo, hi) &&
                ZarrChunkIngest.shardBoxKeep(ci, m, effRs) &&
                ZarrChunkIngest.shardTreeKeep(s, a, ci, m, trees)
            }).filter { t =>
              val (lo, hi) = ZarrChunkIngest.innerIdxBounds(t, m)
              range.intersects(lo, hi) &&
                ZarrChunkIngest.innerBoxKeep(t, m, effRs) &&
                ZarrChunkIngest.innerTreeKeep(t, m, trees)
            })
        case m =>
          (ZarrChunkIngest.chunkTasks(s, a).filter { t =>
            val (lo, hi) = ZarrChunkIngest.chunkIdxBounds(t, m)
            range.intersects(lo, hi) &&
              ZarrChunkIngest.chunkBoxKeep(t, m, effRs) &&
              ZarrChunkIngest.chunkTreeKeep(t, m, trees)
          }, Seq.empty[ZarrChunkIngest.InnerTask])
      }
    }
    val chunkTasks = perArray.flatMap(_._1)
    val innerTasks = perArray.flatMap(_._2)
    val total = chunkTasks.size + innerTasks.size
    if (total == 0) return Array.empty
    val par = MountDsv2.parallelism("graft-zarr", partitions, total)
    // proportional split keeps task counts per partition balanced;
    // inner tasks are already (shard, offset)-ordered from phase 1, so
    // each slice's positioned reads advance monotonically
    val cShare = math.max(if (chunkTasks.isEmpty) 0 else 1,
      (par.toLong * chunkTasks.size / total).toInt)
    val iShare = math.max(if (innerTasks.isEmpty) 0 else 1, par - cShare)
    (MountDsv2.slice(chunkTasks, cShare).map(ZarrChunkPartition(_): InputPartition) ++
      MountDsv2.slice(innerTasks, iShare).map(ZarrInnerPartition(_): InputPartition)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(required, MountDsv2.confSnapshot())
}

class ZarrReaderFactory(required: StructType, hadoopOverrides: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    ByteStore.install(hadoopOverrides) // executor JVMs have no session
    val needValue = required.fieldNames.contains("value")

    def shapeOf(meta: Either[Zarr.ArrayMeta, Zarr3.Meta]): Seq[Long] =
      (meta match { case Left(m) => m.shape; case Right(m) => m.shape })
        .map(_.toLong)

    def mkRow(store: UTF8String, ds: UTF8String, dims: Seq[Long],
        strides: Array[Long], gi: Long, x: Double): InternalRow = {
      val out = new Array[Any](required.length)
      var i = 0
      while (i < required.length) {
        out(i) = required.fields(i).name match {
          case "path" => store
          case "dataset" => ds
          case "idx" => gi
          case "value" => x
          case "d0" => MountDsv2.coordOf(gi, strides, dims, 0)
          case "d1" => MountDsv2.coordOf(gi, strides, dims, 1)
          case "d2" => MountDsv2.coordOf(gi, strides, dims, 2)
          case "d3" => MountDsv2.coordOf(gi, strides, dims, 3)
        }
        i += 1
      }
      new GenericInternalRow(out)
    }

    partition match {
      case ZarrChunkPartition(tasks) =>
        new PartitionReader[InternalRow] {
          private var cached: ((String, String), Either[Zarr.ArrayMeta, Zarr3.Meta]) = null
          private val rows: Iterator[InternalRow] = tasks.iterator.flatMap { t =>
            if (cached == null || cached._1 != ((t.store, t.dataset)))
              cached = ((t.store, t.dataset),
                ZarrChunkIngest.metaOf(t.store, t.dataset))
            val storeU = UTF8String.fromString(t.store)
            val dsU = UTF8String.fromString(t.dataset)
            val dims = shapeOf(cached._2)
            val strides = MountDsv2.rowStrides(dims)
            if (!needValue)
              // index-only projection: chunk files are never opened
              ZarrChunkIngest.chunkIndexes(t, cached._2)
                .map(mkRow(storeU, dsU, dims, strides, _, 0.0))
            else
              ZarrChunkIngest.chunkElems(t, cached._2)
                .map { case (g, v) => mkRow(storeU, dsU, dims, strides, g, v) }
          }
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (rows.hasNext) { cur = rows.next(); true } else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }

      case ZarrInnerPartition(tasks) =>
        new PartitionReader[InternalRow] {
          private var in: ByteStore.ReadAt = null
          private def handleFor(p: String): ByteStore.ReadAt = {
            if (in == null || in.path != p) {
              if (in != null) in.close()
              in = ByteStore.open(p)
            }
            in
          }
          private val rows: Iterator[InternalRow] =
            // tasks arrive (shard, offset)-ordered: per (store, dataset)
            // run, segment by shard file and coalesce byte-adjacent
            // inner-chunk windows into ONE positioned read per span —
            // inner chunks are written back-to-back, so a whole shard
            // typically collapses to a single GET on an object store
            MountDsv2.runs(tasks)(t => (t.store, t.dataset)).iterator.flatMap { run =>
              val meta = ZarrChunkIngest.metaOf(run.head.store, run.head.dataset) match {
                case Right(m) => m
                case Left(_) => throw new IllegalArgumentException(
                  "graft-zarr: v2 store planned as shard-inner")
              }
              val storeU = UTF8String.fromString(run.head.store)
              val dsU = UTF8String.fromString(run.head.dataset)
              val dims = meta.shape.map(_.toLong)
              val strides = MountDsv2.rowStrides(dims)
              if (!needValue)
                run.iterator.flatMap(t =>
                  ZarrChunkIngest.innerIndexes(t, meta)
                    .map(mkRow(storeU, dsU, dims, strides, _, 0.0)))
              else
                ZarrChunkIngest.innerElemsRun(run, meta, handleFor)
                  .map { case (g, v) => mkRow(storeU, dsU, dims, strides, g, v) }
            }
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (rows.hasNext) { cur = rows.next(); true } else false
          override def get(): InternalRow = cur
          override def close(): Unit = if (in != null) in.close()
        }
    }
  }
}
