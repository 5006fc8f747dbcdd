package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunk-parallel two-phase ingest for consolidated netCDF-3 record
  * files — the [[HDF5ChunkIngest]] pattern for the classic format. A
  * multi-year LES/ERA5 store concatenated along the unlimited dimension
  * is ONE file whose record offsets are closed-form (record r of
  * variable v starts at v.begin + r·recordStride), so there is no
  * reason to decode it whole-file per task:
  *
  *  - phase 1 (driver): header-only parse — a bounded prefix read, KB
  *    of metadata regardless of data volume — yields record-batch tasks
  *    (path, var, recStart, nRecs) sized to `targetBytes`;
  *  - phase 2: tasks range-partition by (path, recStart) and decode
  *    with positioned reads — one file handle per (path, partition),
  *    byte-monotone access, peak memory one record batch.
  *
  * Output matches [[HDF5ChunkIngest.readValues]]: (path, dataset, idx,
  * value) with idx the global row-major linear element index.
  */
object NetCDF3ChunkIngest {

  /** `dims` is the variable's full shape (record dimension included,
    * as its CURRENT record count) — the mount's per-dimension
    * coordinate columns and bbox prune derive from it. */
  final case class RecordTask(
      path: String, dataset: String, ncType: Int,
      begin: Long, stride: Long, perRec: Int,
      recStart: Int, nRecs: Int, dims: Seq[Long])

  /** Header-only parse: read a growing prefix until the header parses
    * (the classic header is self-delimiting; data begins after it). */
  def headerOf(path: String): NetCDF3.Header = {
    val f = ByteStore.open(path)
    try {
      var n = 8192
      while (true) {
        val take = math.min(n.toLong, f.length).toInt
        val buf = f.readFully(0L, take)
        try return NetCDF3.readHeader(buf)
        catch {
          case _: java.nio.BufferUnderflowException | _: IndexOutOfBoundsException
              if take < f.length => n *= 4
        }
      }
      sys.error("unreachable")
    } finally f.close()
  }

  /** Phase 1: record-batch tasks for `varName` in each path. Non-record
    * variables become a single whole-slab task (stride 0). Per-file
    * headers read in one [[ByteStore.parMap]] wave (KB-scale each);
    * plan-time latency tracks one header's round trips, not file
    * count. Order stays path-sorted. */
  def recordTasks(paths: Seq[String], varName: String,
      targetBytes: Long = 4L << 20): Seq[RecordTask] =
    ByteStore.parMap(paths.sorted) { p =>
      val h = headerOf(p)
      val v = h.vars.find(_.name == varName).getOrElse(
        throw new IllegalArgumentException(
          s"Requested variable `$varName` not found in datafile $p"))
      val shape = NetCDF3.shapeOf(h, v)
      val isRec = v.dimIds.headOption.exists(h.dims(_).isRecord)
      if (!isRec) {
        val total = shape.map(_.toLong).product
        // the whole slab reads as ONE byte buffer: bound the BYTES, not
        // just the element count (total * 8 for doubles must fit an Int)
        require(total * NetCDF3.typeSize(v.ncType) <= Int.MaxValue - 8,
          s"${v.name} too large for one slab")
        Seq(RecordTask(p, v.name, v.ncType, v.begin, 0L, total.toInt, 0, 1,
          shape.map(_.toLong)))
      } else {
        val perRec = shape.drop(1).map(_.toLong).product
        // one record's slab reads as one buffer: bound its BYTES
        require(perRec * NetCDF3.typeSize(v.ncType) <= Int.MaxValue - 8,
          s"${v.name} record too large")
        val stride = NetCDF3.recordStrideOf(h)
        val recBytes = math.max(1L, perRec * NetCDF3.typeSize(v.ncType))
        val recsPerTask = math.max(1L, targetBytes / recBytes).toInt
        (0 until h.numRecs by recsPerTask).map { r0 =>
          RecordTask(p, v.name, v.ncType, v.begin, stride, perRec.toInt,
            r0, math.min(recsPerTask, h.numRecs - r0), shape.map(_.toLong))
        }
      }
    }.flatten

  /** One task's (global idx, value) elements through `in`. The
    * per-record positioned reads coalesce into ONE span read when the
    * task's variable owns at least HALF the record stride (records of
    * one variable are interleaved with every other record variable's,
    * so an unconditional span read could fetch mostly junk; at >= 1/2
    * the junk is bounded by the useful bytes, and one request replaces
    * nRecs — the object-store arithmetic of MountDsv2.coalesceWindows
    * applied to the classic format's strided layout). Shared by the
    * RDD ingest and the [[NetCDF3DataSource]] DSv2 reader. */
  private[sources] def taskValues(t: RecordTask,
      in: ByteStore.ReadAt): Iterator[(Long, Double)] = {
    val elemSize = NetCDF3.typeSize(t.ncType)
    val perRecBytes = t.perRec.toLong * elemSize
    val span =
      if (t.nRecs <= 1 || t.stride <= 0L) -1L
      else (t.nRecs - 1).toLong * t.stride + perRecBytes
    def decodeRec(rec: Int, raw: Array[Byte]): Iterator[(Long, Double)] = {
      val vals = NetCDF3.decodeSlab(raw, t.ncType, t.perRec)
      (0 until t.perRec).iterator.map(i => (rec.toLong * t.perRec + i, vals(i)))
    }
    if (span > 0 && 2 * perRecBytes >= t.stride && span <= Int.MaxValue - 8) {
      val buf = in.readFully(t.begin + t.recStart * t.stride, span.toInt)
      (0 until t.nRecs).iterator.flatMap { r =>
        val off = (r.toLong * t.stride).toInt
        decodeRec(t.recStart + r, java.util.Arrays.copyOfRange(buf, off,
          off + perRecBytes.toInt))
      }
    } else (0 until t.nRecs).iterator.flatMap { r =>
      val rec = t.recStart + r
      decodeRec(rec, in.readFully(t.begin + rec * t.stride, perRecBytes.toInt))
    }
  }

  /** Phase 2 fan-out. */
  def readValues(spark: SparkSession, pathGlob: String, varName: String,
      targetBytes: Long = 4L << 20, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val tasks = recordTasks(HDF5ChunkIngest.resolvePaths(pathGlob), varName,
      targetBytes)
    require(tasks.nonEmpty, s"no netCDF records matched $pathGlob / $varName")
    val par = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val hconf = ByteStore.confSnapshot(spark)
    spark.createDataset(tasks)
      .repartitionByRange(par, $"path", $"recStart")
      .sortWithinPartitions($"path", $"recStart")
      .mapPartitions { it =>
        ByteStore.install(hconf) // executor JVMs have no session
        var cur: ByteStore.ReadAt = null
        def fileFor(p: String): ByteStore.ReadAt = {
          if (cur == null || cur.path != p) {
            if (cur != null) cur.close()
            cur = ByteStore.open(p)
          }
          cur
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (cur != null) cur.close()))
        it.flatMap { t =>
          taskValues(t, fileFor(t.path))
            .map { case (gi, v) => (t.path, t.dataset, gi, v) }
        }
      }
      .toDF("path", "dataset", "idx", "value")
  }
}
