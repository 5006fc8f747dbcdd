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

/** DataSourceV2 facade over [[HDF5ChunkIngest]]'s two-phase
  * consolidated-store read — HDF5/netCDF-4 stores mount like any other
  * format:
  *
  * {{{
  * spark.read.format("graft.sources.Hdf5DataSource")
  *   .option("path", "/data/store/STAR.h5") // file, glob, or s3a://-style URI
  *   .load()                               // (path, dataset, idx, value)
  *   .where($"dataset" === "lwp")          // FILTER PUSHDOWN prunes chunks
  *   .where($"idx".between(a, b))          // RANGE PUSHDOWN prunes the grid
  *   .select("idx")                        // COLUMN PRUNING skips decode
  * }}}
  *
  * Split planning is the chunk map: phase 1 (plan time, driver) walks
  * only metadata pages via [[HDF5.manifest]], then the (path, offset)-
  * sorted chunk tasks are sliced into byte-adjacent InputPartitions —
  * each task's positioned reads advance monotonically through one file
  * region, the access pattern OS readahead helps. `dataset`/`path`
  * equality and IN filters push down into the PLAN phase (pruned chunks
  * are never planned, so `.where(dataset = "lwp")` on a 40-variable
  * store fans out only lwp's chunks), and `idx` range predicates prune
  * on each chunk's closed-form [min, max] global-index window (the
  * spatial-crop access pattern — a bbox slice of a 100 TB store plans
  * only its chunks); the filters are also left in the residual so Spark
  * re-applies them — pruning is an optimization, never a correctness
  * dependency. Column pruning reaches the byte level: a projection
  * without `value` ([[HDF5.chunkGlobalIndexes]]) emits grid indexes
  * straight from the manifest row — chunk payloads are never read, let
  * alone decompressed, so existence/count scans over a 100 TB store do
  * metadata-proportional work. All byte access (metadata walks AND
  * chunk reads) goes through [[ByteStore]], so `file://`/`hdfs://`/
  * `s3a://` URIs mount identically to local paths.
  *
  * Reference analog: convml_data reads granules whole-file via xarray
  * (utils/luigi.py:29-47); this is the consolidated-store shape that
  * world lacks.
  */
class Hdf5DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Hdf5DataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Hdf5Table(properties.get("path"),
      Option(properties.get("variable")),
      Option(properties.get("partitions")).map(_.toInt),
      Option(properties.get("hulls")).map(MountDsv2.parseHulls))
}

object Hdf5DataSource {
  /** `d0..d3` are the element's per-dimension coordinates (row-major;
    * 0 past the array's rank) — range predicates on them prune chunks
    * by per-dim box intersection, the bbox-crop access pattern a linear
    * `idx` range cannot express on non-leading dimensions. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("dataset", StringType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)) ++
    MountDsv2.DimCols.map(StructField(_, LongType, nullable = false)))
}

class Hdf5Table(path: String, variable: Option[String], partitions: Option[Int],
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Table with SupportsRead {
  require(path != null, "graft-hdf5 needs a path option")
  override def name(): String = s"graft-hdf5[$path]"
  override def schema(): StructType = Hdf5DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MountScanBuilder(Hdf5DataSource.schema, Set("dataset", "path"),
        Set("idx") ++ MountDsv2.DimCols) {
      override def build(): Scan =
        new Hdf5Scan(path, variable, partitions, required, pushed, hulls)
    }
}

/** One partition = a byte-adjacent run of chunk tasks (already sorted by
  * (path, offset) at plan time). */
case class Hdf5ChunkPartition(tasks: Seq[HDF5ChunkIngest.ChunkTask])
    extends InputPartition

class Hdf5Scan(path: String, variable: Option[String], partitions: Option[Int],
    required: StructType, pushed: Array[Filter],
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-hdf5 scan $path cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val range = MountDsv2.idxRange(pushed)
    val dimRs = MountDsv2.dimRanges(pushed)
    val trees = MountDsv2.treeFilters(pushed)
    val paths = HDF5ChunkIngest.resolvePaths(path)
      // store-level prune: a file excluded here (path equality/IN, or
      // every branch of a catalog-crop disjunction naming other files)
      // never has its chunk manifest read, let alone data
      .filter(p => MountDsv2.keep(pushed, "path", p) &&
        MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(path = Some(p))))
    val tasks = HDF5ChunkIngest.chunkTasks(paths, variable)
      .filter(t => MountDsv2.keep(pushed, "dataset", t.dataset) &&
        MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(Some(t.path), Some(t.dataset))))
      .filter { t =>
        // chunk-grid prune: the chunk's global indexes span the
        // row-major box [origin, origin + chunkDims); its [min, max]
        // bound is closed-form, so an idx range plans only its chunks,
        // and dK coordinate ranges prune by per-dim box intersection
        // (the bbox crop — exact per dimension, unlike the linear span);
        // tree-shaped filters (the catalog crop's per-store disjunction)
        // prune through the same box via boxTreeKeep
        val (lo, hi) = MountDsv2.boxBounds(t.origin,
          t.chunkDims.map(_.toLong), t.dims)
        // join-form catalog crop: this store's hull intersects into the
        // per-dim box test (pruning-only; the residual stays exact)
        val effRs = MountDsv2.effDimRanges(hulls, t.path, dimRs)
        range.intersects(lo, hi) &&
          MountDsv2.boxKeep(t.origin, t.chunkDims.map(_.toLong), t.dims, effRs) &&
          (trees.isEmpty || MountDsv2.boxTreeKeep(trees, t.path, t.dataset,
            (lo, hi), t.origin, t.chunkDims.map(_.toLong), t.dims))
      }
      .sortBy(t => (t.path, t.offset))
    if (tasks.isEmpty) return Array.empty
    val par = MountDsv2.parallelism("graft-hdf5", partitions, tasks.size)
    MountDsv2.slice(tasks, par)
      .map(Hdf5ChunkPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Hdf5ReaderFactory(required, MountDsv2.confSnapshot())
}

class Hdf5ReaderFactory(required: StructType, hadoopOverrides: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    ByteStore.install(hadoopOverrides) // executor JVMs have no session
    val tasks = partition.asInstanceOf[Hdf5ChunkPartition].tasks
    val needValue = required.fieldNames.contains("value")
    new PartitionReader[InternalRow] {
      private var in: ByteStore.ReadAt = null
      private def rowsOf(t: HDF5ChunkIngest.ChunkTask,
          raw: Array[Byte]): Iterator[InternalRow] = {
        val v = HDF5.H5Var(t.dataset, t.dims, t.chunkDims, t.dtClass,
          t.dtSize, t.bigEndian, t.filters, t.signedInt)
        val pathU = UTF8String.fromString(t.path)
        val dsU = UTF8String.fromString(t.dataset)
        val strides = MountDsv2.rowStrides(t.dims)
        def row(gi: Long, x: Double): InternalRow = {
          val out = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            out(i) = required.fields(i).name match {
              case "path" => pathU
              case "dataset" => dsU
              case "idx" => gi
              case "value" => x
              case "d0" => MountDsv2.coordOf(gi, strides, t.dims, 0)
              case "d1" => MountDsv2.coordOf(gi, strides, t.dims, 1)
              case "d2" => MountDsv2.coordOf(gi, strides, t.dims, 2)
              case "d3" => MountDsv2.coordOf(gi, strides, t.dims, 3)
            }
            i += 1
          }
          new GenericInternalRow(out)
        }
        if (raw == null) HDF5.chunkGlobalIndexes(v, t.origin).map(row(_, 0.0))
        else HDF5.decodeChunk(raw, v, t.origin).map { case (gi, x) => row(gi, x) }
      }
      private val rows: Iterator[InternalRow] =
        if (!needValue)
          // index-only projection: the chunk's bytes are never read
          tasks.iterator.flatMap(rowsOf(_, null))
        else
          // tasks arrive (path, offset)-sorted: coalesce byte-adjacent
          // chunk windows into ONE positioned read per span — the
          // request-count lever on object stores (one GET per span
          // instead of per chunk); the span cap bounds the buffer
          MountDsv2.runs(tasks)(_.path).iterator.flatMap { run =>
            val windows = run.map(t => (t.offset, t.nbytes))
            MountDsv2.coalesceWindows(windows).iterator.flatMap { g =>
              val gStart = run(g.start).offset
              val gEnd = g.map(i => run(i).offset + run(i).nbytes).max
              if (in == null || in.path != run.head.path) {
                if (in != null) in.close()
                in = ByteStore.open(run.head.path)
              }
              val buf = in.readFully(gStart, (gEnd - gStart).toInt)
              g.iterator.flatMap { i =>
                val t = run(i)
                val raw = java.util.Arrays.copyOfRange(buf,
                  (t.offset - gStart).toInt, (t.offset - gStart + t.nbytes).toInt)
                rowsOf(t, raw)
              }
            }
          }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = if (in != null) in.close()
    }
  }
}
