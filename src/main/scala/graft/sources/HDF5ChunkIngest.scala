package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Chunk-parallel HDF5/netCDF-4 ingest — the consolidated-store path.
  *
  * [[NetCDFIngest]] parallelizes per FILE (`binaryFile` -> whole-file
  * decode): right for archives of O(GB) granules (the reference's
  * world — one file per scene, utils/luigi.py:29-47), wrong for one
  * large consolidated store, whose whole-file decode would pin a
  * single task's memory and, past 2 GB, overflow a Java byte array.
  * This source splits the read the way [[Zarr.readScenes]] does:
  *
  *  - phase 1 (driver): [[PagedFileInput]] -> [[HDF5.manifest]] —
  *    superblock, object headers, chunk indexes. Touches only the
  *    pages metadata lives on (HDF5ChunkIngestSpec asserts the
  *    fraction), never chunk payloads, so a manifest of a store far
  *    bigger than driver memory stays cheap;
  *  - phase 2 (executors): the chunk map becomes a Dataset,
  *    range-partitioned on (path, offset) so each task's reads are
  *    byte-adjacent; every task does positioned reads of its chunks'
  *    ranges and decodes them independently (deflate/shuffle are
  *    per-chunk by construction — no cross-chunk state, no shuffle
  *    until the first keyed operator downstream).
  *
  * Executors open the file by path through the [[ByteStore]] seam:
  * plain paths read via java.io (local FS / NFS), scheme'd URIs
  * (`file://`/`hdfs://`/`s3a://`) via `org.apache.hadoop.fs` — object
  * stores mount directly, no fuse layer needed. (The sinks write
  * through the same seam, so the whole interchange family targets URI
  * stores symmetrically.) At 100 TB
  * the same two-phase shape holds: manifests are KB-scale per store,
  * the chunk map is what actually distributes, and byte-adjacent
  * chunks coalesce into one positioned read per span
  * ([[MountDsv2.coalesceWindows]]) so request counts track spans, not
  * chunks.
  */
object HDF5ChunkIngest {

  /** One executor decode task: a chunk plus everything needed to decode
    * it with no further metadata access. */
  final case class ChunkTask(
      path: String, dataset: String, dims: Seq[Long], chunkDims: Seq[Int],
      dtClass: Int, dtSize: Int, bigEndian: Boolean, signedInt: Boolean,
      filters: Seq[HDF5.H5Filter],
      origin: Seq[Long], offset: Long, nbytes: Long)

  /** Phase 1: metadata-only chunk map of every HDF5 file in `paths`.
    * Driver-side work is proportional to metadata size, not file size,
    * and per-file manifests walk in one [[ByteStore.parMap]] wave —
    * plan-time latency on an object store is ~one file's metadata
    * round trips, not file-count × RTT. Order stays path-sorted. */
  def chunkTasks(paths: Seq[String], varName: Option[String] = None): Seq[ChunkTask] =
    ByteStore.parMap(paths.sorted) { p =>
      val in = new PagedFileInput(p)
      try HDF5.manifest(in)
        .filter { case (v, _) => varName.forall(_ == v.name) }
        .flatMap { case (v, refs) =>
          refs.map(r => ChunkTask(p, v.name, v.dims, v.chunkDims, v.dtClass,
            v.dtSize, v.bigEndian, v.signedInt, v.filters,
            r.origin, r.offset, r.nbytes))
        }
      finally in.close()
    }.flatten

  /** Resolve a file-or-`dir/STAR.h5`-style glob; scheme'd URIs go
    * through Hadoop globStatus (see [[ByteStore.resolveGlob]]). */
  def resolvePaths(pathGlob: String): Seq[String] =
    ByteStore.resolveGlob(pathGlob)

  /** Phase 2 fan-out: (path, dataset, idx, value) rows where `idx` is
    * the global row-major linear element index. One task decodes only
    * its own chunks — peak memory per task is one stored chunk. */
  def readValues(spark: SparkSession, pathGlob: String,
      varName: Option[String] = None, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val tasks = chunkTasks(resolvePaths(pathGlob), varName)
    require(tasks.nonEmpty, s"no HDF5 chunks matched $pathGlob / $varName")
    val par = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val hconf = ByteStore.confSnapshot(spark)
    spark.createDataset(tasks)
      .repartitionByRange(par, $"path", $"offset")
      // sort so a partition walks each file once, byte-ascending: ONE
      // open/close per (path, partition) instead of per chunk (a 100k-
      // chunk store would otherwise pay 100k open/close syscalls per
      // executor pass), and the positioned reads advance monotonically —
      // the access pattern OS readahead actually helps
      .sortWithinPartitions($"path", $"offset")
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
        // close the last handle when the task ends (also on failure —
        // the iterator itself has no terminal hook under interruption)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (cur != null) cur.close()))
        // tasks are (path, offset)-sorted: coalesce byte-adjacent chunk
        // windows into ONE positioned read per span (the DSv2 reader's
        // request-count discipline, MountDsv2.coalesceWindows)
        MountDsv2.runs(it.toSeq)(_.path).iterator.flatMap { run =>
          val windows = run.map(t => (t.offset, t.nbytes))
          MountDsv2.coalesceWindows(windows).iterator.flatMap { g =>
            val gStart = run(g.start).offset
            val gEnd = g.map(i => run(i).offset + run(i).nbytes).max
            val buf = fileFor(run.head.path).readFully(gStart, (gEnd - gStart).toInt)
            g.iterator.flatMap { i =>
              val t = run(i)
              val raw = java.util.Arrays.copyOfRange(buf,
                (t.offset - gStart).toInt, (t.offset - gStart + t.nbytes).toInt)
              val v = HDF5.H5Var(t.dataset, t.dims, t.chunkDims, t.dtClass,
                t.dtSize, t.bigEndian, t.filters, t.signedInt)
              HDF5.decodeChunk(raw, v, t.origin)
                .map { case (gi, x) => (t.path, t.dataset, gi, x) }
            }
          }
        }
      }
      .toDF("path", "dataset", "idx", "value")
  }
}
