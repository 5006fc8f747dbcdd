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

/** DataSourceV2 facade over [[NetCDF3ChunkIngest]] — the fourth mount
  * sibling (HDF5 / Arrow / zarr / netCDF-3), covering the CLASSIC
  * format's consolidated record stores:
  *
  * {{{
  * spark.read.format("graft.sources.NetCDF3DataSource")
  *   .option("path", "/data/store/STAR.nc")  // file, glob, or s3a://-style URI
  *   .load()                                 // (path, dataset, idx, value)
  *   .where($"dataset" === "flux")           // FILTER PUSHDOWN prunes tasks
  *   .where($"idx" < upTo)                   // RANGE PUSHDOWN prunes records
  *   .select("idx")                          // COLUMN PRUNING: no payload reads
  * }}}
  *
  * Split planning is the header: a bounded prefix read per file (KBs
  * regardless of data volume) yields record-batch tasks whose byte
  * offsets are CLOSED-FORM (record r of variable v starts at
  * v.begin + r * recordStride), sliced into (path, offset)-monotone
  * InputPartitions — no exchange anywhere in scan->filter->project.
  * `dataset`/`path` equality + IN filters push into the PLAN phase
  * (pruned variables' tasks are never planned), `idx` ranges prune
  * record batches on their EXACT contiguous index window
  * [recStart*perRec, (recStart+nRecs)*perRec), and every filter stays
  * residual. Projections without `value` emit indexes straight from the
  * task arithmetic — no payload byte is ever read. Byte access goes
  * through [[ByteStore]]: `file://`/`hdfs://`/`s3a://` URIs mount
  * identically to local paths.
  *
  * Reference analog: convml_data reads LES/ERA5 granules whole-file
  * via xarray (utils/luigi.py:29-47; pipeline/scene_sources.py
  * granule listing); this is the consolidated multi-year-store shape
  * that world lacks.
  */
class NetCDF3DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetCDF3DataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NetCDF3Table(properties.get("path"),
      Option(properties.get("variable")),
      Option(properties.get("partitions")).map(_.toInt),
      Option(properties.get("targetBytes")).map(_.toLong).getOrElse(4L << 20),
      Option(properties.get("hulls")).map(MountDsv2.parseHulls))
}

object NetCDF3DataSource {
  /** `d0..d3` are the element's per-dimension coordinates (row-major;
    * 0 past the variable's rank). `d0` ranges prune record batches the
    * way `idx` does; non-leading `dK` ranges stay residual-only for
    * record variables (every record slab contains all their values)
    * but make the bbox crop expressible without `idx div/mod`
    * reconstruction. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("dataset", StringType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)) ++
    MountDsv2.DimCols.map(StructField(_, LongType, nullable = false)))
}

class NetCDF3Table(path: String, variable: Option[String], partitions: Option[Int],
    targetBytes: Long,
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Table with SupportsRead {
  require(path != null, "graft-netcdf3 needs a path option")
  override def name(): String = s"graft-netcdf3[$path]"
  override def schema(): StructType = NetCDF3DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MountScanBuilder(NetCDF3DataSource.schema, Set("dataset", "path"),
        Set("idx") ++ MountDsv2.DimCols) {
      override def build(): Scan =
        new NetCDF3Scan(path, variable, partitions, targetBytes, required,
          pushed, hulls)
    }
}

/** One partition = a (path, byte-offset)-monotone run of record tasks. */
case class NetCDF3RecPartition(tasks: Seq[NetCDF3ChunkIngest.RecordTask])
    extends InputPartition

class NetCDF3Scan(path: String, variable: Option[String], partitions: Option[Int],
    targetBytes: Long, required: StructType, pushed: Array[Filter],
    hulls: Option[Map[String, IndexedSeq[MountDsv2.IdxRange]]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-netcdf3 scan $path cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val range = MountDsv2.idxRange(pushed)
    val dimRs = MountDsv2.dimRanges(pushed)
    val trees = MountDsv2.treeFilters(pushed)
    val paths = HDF5ChunkIngest.resolvePaths(path)
      // store-level prune: a file excluded here (path equality/IN, or
      // every branch of a catalog-crop disjunction naming other files)
      // never has its header read, let alone data
      .filter(p => MountDsv2.keep(pushed, "path", p) &&
        MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(path = Some(p))))
    val tasks = paths.flatMap { p =>
      val h = NetCDF3ChunkIngest.headerOf(p)
      h.vars.map(_.name)
        .filter(v => variable.forall(_ == v) && MountDsv2.keep(pushed, "dataset", v) &&
          MountDsv2.ctxKeep(trees, MountDsv2.PruneCtx(Some(p), Some(v))))
        .flatMap(v => NetCDF3ChunkIngest.recordTasks(Seq(p), v, targetBytes))
    }.filter { t =>
      // record batches cover EXACTLY [recStart*perRec, +nRecs*perRec)
      // dK prune: a record batch is the box [recStart, +nRecs) on d0
      // x full extent on the rest (a non-record variable's single
      // slab is its whole shape — stride 0 marks it); tree-shaped
      // filters (the catalog crop) prune through the same box
      val idxB = (t.recStart.toLong * t.perRec,
        (t.recStart.toLong + t.nRecs) * t.perRec - 1)
      val origin =
        if (t.stride == 0L) Seq.fill(t.dims.size)(0L)
        else t.recStart.toLong +: Seq.fill(t.dims.size - 1)(0L)
      val box =
        if (t.stride == 0L) t.dims else t.nRecs.toLong +: t.dims.drop(1)
      // join-form catalog crop: this file's hull intersects into the
      // per-dim box test (pruning-only; the residual stays exact)
      range.intersects(idxB._1, idxB._2) &&
        MountDsv2.boxKeep(origin, box, t.dims,
          MountDsv2.effDimRanges(hulls, t.path, dimRs)) &&
        (trees.isEmpty || MountDsv2.boxTreeKeep(trees, t.path, t.dataset,
          idxB, origin, box, t.dims))
    }.map { t =>
      // NARROW a surviving record batch to the pushed d0 / idx window:
      // record r is exactly d0 = r and idx [r*perRec, (r+1)*perRec),
      // so out-of-window records inside an intersecting batch are
      // never read — a 4-of-64-record crop issues a 4-record ranged
      // GET, not the batch's span (S3FsSpec pins the byte counts).
      // Tree-shaped (per-store disjunction) crops narrow through THIS
      // file's d0/idx hull in the tree (colHull — each store's branch
      // yields exactly its pushed range); every filter remains
      // residual either way.
      if (t.stride == 0L) t
      else {
        // the hull narrows the RECORD WINDOW too: a surviving batch of
        // a join-form crop reads only this file's own d0 slab
        val d0 = MountDsv2.effDimRanges(hulls, t.path, dimRs)(0)
        var lo = math.max(math.max(t.recStart.toLong, d0.lo),
          Math.floorDiv(range.lo, t.perRec.toLong))
        var hi = math.min(math.min(t.recStart.toLong + t.nRecs - 1, d0.hi),
          Math.floorDiv(range.hi, t.perRec.toLong))
        trees.foreach { tr =>
          MountDsv2.colHull(tr, "d0", t.path, t.dataset).foreach { h =>
            lo = math.max(lo, h.lo); hi = math.min(hi, h.hi)
          }
          MountDsv2.colHull(tr, "idx", t.path, t.dataset).foreach { h =>
            lo = math.max(lo, Math.floorDiv(h.lo, t.perRec.toLong))
            hi = math.min(hi, Math.floorDiv(h.hi, t.perRec.toLong))
          }
        }
        // the batch survived the filters above, so the window is
        // non-empty; clamp defensively anyway
        if (lo <= hi && (lo > t.recStart || hi < t.recStart + t.nRecs - 1))
          t.copy(recStart = lo.toInt, nRecs = (hi - lo + 1).toInt)
        else t
      }
    }.sortBy(t => (t.path, t.begin, t.recStart))
    if (tasks.isEmpty) return Array.empty
    val par = MountDsv2.parallelism("graft-netcdf3", partitions, tasks.size)
    MountDsv2.slice(tasks, par)
      .map(NetCDF3RecPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetCDF3ReaderFactory(required, MountDsv2.confSnapshot())
}

class NetCDF3ReaderFactory(required: StructType, hadoopOverrides: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    ByteStore.install(hadoopOverrides) // executor JVMs have no session
    val tasks = partition.asInstanceOf[NetCDF3RecPartition].tasks
    val needValue = required.fieldNames.contains("value")
    new PartitionReader[InternalRow] {
      private var in: ByteStore.ReadAt = null
      private val rows: Iterator[InternalRow] = tasks.iterator.flatMap { t =>
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
        if (!needValue) {
          // index-only projection: indexes are task arithmetic, no
          // payload byte is read
          (0 until t.nRecs).iterator.flatMap { r =>
            val rec = t.recStart + r
            (0 until t.perRec).iterator.map(i =>
              row(rec.toLong * t.perRec + i, 0.0))
          }
        } else {
          if (in == null || in.path != t.path) {
            if (in != null) in.close()
            in = ByteStore.open(t.path)
          }
          // per-record reads coalesce into one span read when the
          // variable owns >= half the record stride (taskValues)
          NetCDF3ChunkIngest.taskValues(t, in).map { case (gi, v) => row(gi, v) }
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
