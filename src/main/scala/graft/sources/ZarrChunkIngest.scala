package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunk-parallel ingest for ONE consolidated zarr store (v2 or v3) —
  * the third sibling of [[HDF5ChunkIngest]]/[[NetCDF3ChunkIngest]], and
  * the easiest of the three: the chunk grid is CLOSED-FORM from the
  * array metadata (no B-trees, no record strides — chunk (i,j,…) lives
  * in its own file), so phase 1 is just a metadata parse (KBs) and the
  * key enumeration, and phase 2 decodes one chunk file per task row
  * with pad-region skipping and absent files as fill_value. The chunk
  * grid IS zarr's designed unit of parallelism; this operator simply
  * hands it to Spark.
  *
  * All byte access (metadata, chunk files, shard index tails) goes
  * through the [[ByteStore]] seam, so a store addressed by
  * `file://`/`hdfs://`/`s3a://` URI reads identically to a local path —
  * zarr-over-object-store being the format's native habitat.
  *
  * Output matches the other ingests: (path, dataset, idx, value) with
  * idx the global row-major linear element index. Absent chunks emit
  * their fill_value elements (a dense raster contract, same as the
  * whole-array readers). Dataset names may be group paths
  * (`grp/sub/arr`) — chunk keys resolve under the array's directory.
  */
object ZarrChunkIngest {

  /** One chunk task: store path, array name (possibly a group path),
    * zarr version, and the chunk's grid index. */
  final case class ChunkTask(store: String, dataset: String, version: Int,
      ci: Seq[Int])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zarr chunk ingest: $msg")

  /** Detect version + parse metadata for `store/name`. */
  private[sources] def metaOf(store: String, name: String): Either[Zarr.ArrayMeta, Zarr3.Meta] = {
    val d = ByteStore.join(store, name)
    val v2 = ByteStore.join(d, ".zarray")
    val v3 = ByteStore.join(d, "zarr.json")
    if (ByteStore.exists(v3)) Right(Zarr3.parseMeta(ByteStore.readString(v3)))
    else if (ByteStore.exists(v2)) Left(Zarr.parseMeta(ByteStore.readString(v2)))
    else fail(s"no .zarray or zarr.json under $d")
  }

  private def gridOf(shape: Seq[Int], chunks: Seq[Int]): Seq[Seq[Int]] = {
    val nChunks = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def walk(idx: List[Int], dim: Int): Seq[List[Int]] =
      if (dim == shape.size) Seq(idx.reverse)
      else (0 until nChunks(dim)).flatMap(i => walk(i :: idx, dim + 1))
    walk(Nil, 0)
  }

  /** Phase 1: the chunk-task list — a metadata-only driver step. */
  def chunkTasks(store: String, name: String): Seq[ChunkTask] =
    metaOf(store, name) match {
      case Left(m) => gridOf(m.shape, m.chunks).map(ci => ChunkTask(store, name, 2, ci))
      case Right(m) => gridOf(m.shape, m.chunks).map(ci => ChunkTask(store, name, 3, ci))
    }

  /** The chunk file's path for task `t` (v2 dotted keys, v3 nested
    * `c/…` keys — both join under the array directory). */
  private def chunkPath(t: ChunkTask, meta: Either[Zarr.ArrayMeta, Zarr3.Meta]): String = {
    val d = ByteStore.join(t.store, t.dataset)
    meta match {
      case Left(_) => ByteStore.join(d, t.ci.mkString("."))
      case Right(m) => Zarr3.chunkKey(m, t.ci).split('/')
        .foldLeft(d)(ByteStore.join)
    }
  }

  /** One chunk task's (global idx, value) elements, pad regions
    * skipped; the chunk file is read + decoded here. Shared by the RDD
    * ingest below and the [[ZarrDataSource]] DSv2 reader. */
  private[sources] def chunkElems(t: ChunkTask,
      meta: Either[Zarr.ArrayMeta, Zarr3.Meta]): Iterator[(Long, Double)] = {
    val (shape, chunks, fill) = meta match {
      case Left(m) => (m.shape, m.chunks, m.fill)
      case Right(m) => (m.shape, m.chunks, m.fill)
    }
    val chunkFile = chunkPath(t, meta)
    val decoded: Option[Array[Double]] =
      if (!ByteStore.exists(chunkFile)) None
      else Some(meta match {
        case Left(m) => Zarr.decodeChunkBytes(ByteStore.readAllBytes(chunkFile), m)
        case Right(m) => Zarr3.decodeChunkBytes(ByteStore.readAllBytes(chunkFile), m)
      })
    chunkIndexValues(shape, chunks, t.ci).map { case (g, k) =>
      (g, decoded.map(_(k)).getOrElse(fill))
    }
  }

  /** Index-only walk of one chunk task: the chunk file's BYTES ARE
    * NEVER READ — the grid is closed-form from metadata, so projections
    * without `value` do metadata-proportional work. */
  private[sources] def chunkIndexes(t: ChunkTask,
      meta: Either[Zarr.ArrayMeta, Zarr3.Meta]): Iterator[Long] = {
    val (shape, chunks) = meta match {
      case Left(m) => (m.shape, m.chunks)
      case Right(m) => (m.shape, m.chunks)
    }
    chunkIndexValues(shape, chunks, t.ci).map(_._1)
  }

  /** Inclusive [min, max] global-linear-index bounds of one chunk task
    * (closed-form — used by the mount's idx-range prune). */
  private[sources] def chunkIdxBounds(t: ChunkTask,
      meta: Either[Zarr.ArrayMeta, Zarr3.Meta]): (Long, Long) = {
    val (shape, chunks) = meta match {
      case Left(m) => (m.shape, m.chunks)
      case Right(m) => (m.shape, m.chunks)
    }
    MountDsv2.boxBounds(
      t.ci.zip(chunks).map { case (c, w) => c.toLong * w },
      chunks.map(_.toLong), shape.map(_.toLong))
  }

  /** In-bounds (global linear index, within-chunk index) pairs of one
    * chunk at grid position `ci`. */
  private def chunkIndexValues(shape: Seq[Int], chunks: Seq[Int],
      ci: Seq[Int]): Iterator[(Long, Int)] = {
    val strides = shape.scanRight(1)(_ * _).tail
    val cStrides = chunks.scanRight(1)(_ * _).tail
    (0 until chunks.product).iterator.flatMap { k =>
      var g = 0L; var inBounds = true; var dim = 0
      while (dim < shape.size && inBounds) {
        val local = (k / cStrides(dim)) % chunks(dim)
        val global = ci(dim) * chunks(dim) + local
        if (global >= shape(dim)) inBounds = false
        else g += global.toLong * strides(dim)
        dim += 1
      }
      if (!inBounds) None else Some((g, k))
    }
  }

  /** Phase 2 fan-out: decode each chunk independently. The per-task
    * metadata re-parse is a KB-sized read (zarr has no shared file
    * handle to manage — every chunk is its own file). */
  def readValues(spark: SparkSession, store: String, name: String,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val tasks = chunkTasks(store, name)
    require(tasks.nonEmpty, s"no chunks for $store/$name")
    val par = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val hconf = ByteStore.confSnapshot(spark)
    spark.createDataset(tasks)
      .repartition(par)
      .mapPartitions { it =>
        ByteStore.install(hconf) // executor JVMs have no session
        var cached: ((String, String), Either[Zarr.ArrayMeta, Zarr3.Meta]) = null
        it.flatMap { t =>
          val key = (t.store, t.dataset)
          if (cached == null || cached._1 != key)
            cached = (key, metaOf(t.store, t.dataset))
          chunkElems(t, cached._2).map { case (g, v) => (t.store, t.dataset, g, v) }
        }
      }
      .toDF("path", "dataset", "idx", "value")
  }

  /** One inner-chunk task inside one shard file: byte window [offset,
    * offset+length); length == -1 marks an ABSENT inner chunk (emit
    * fill). `ci` is the shard's grid index, `gi` the inner chunk's
    * index within the shard. */
  final case class InnerTask(store: String, dataset: String, ci: Seq[Int],
      gi: Seq[Int], offset: Long, length: Long)

  private def shardPath(store: String, dataset: String, meta: Zarr3.Meta,
      ci: Seq[Int]): String =
    Zarr3.chunkKey(meta, ci).split('/')
      .foldLeft(ByteStore.join(store, dataset))(ByteStore.join)

  /** Phase 1 for SHARDED v3 arrays: read only each shard's
    * (offset, nbytes) index tail — KBs per shard regardless of shard
    * size, crc32c-verified — and enumerate one task per INNER chunk.
    * This is what makes sharding the 100 TB shape: shard files keep the
    * object count low while the task granularity stays the inner grid,
    * and phase 2 reads only each task's byte window, never a whole
    * shard.
    *
    * `shardKeep` prunes WHOLE SHARDS before their index tails are read
    * (the shard grid is closed-form, so e.g. an idx-range crop decides
    * from pure arithmetic): the metadata walk is then proportional to
    * the CROP, not the store — under a bbox slice of a 100 TB store,
    * out-of-range shards cost nothing, not even a tail GET. */
  def shardInnerTasks(store: String, name: String,
      shardKeep: Seq[Int] => Boolean = _ => true): Seq[InnerTask] = {
    val meta = metaOf(store, name) match {
      case Right(m) if m.sharding.isDefined => m
      case Right(_) => fail(s"$store/$name is not sharded — use chunkTasks")
      case Left(_) => fail(s"$store/$name is zarr v2 — sharding is v3-only")
    }
    val sh = meta.sharding.get
    val innerGrid = gridOf(meta.chunks, sh.innerChunks)
    // one exists-probe + one index-tail read per SURVIVING shard — a
    // 10k-shard array would pay 10k serial round trips at plan time,
    // so the tails read in one parMap wave (input order kept)
    ByteStore.parMap(gridOf(meta.shape, meta.chunks).filter(shardKeep)) { ci =>
      val shardFile = shardPath(store, name, meta, ci)
      if (!ByteStore.exists(shardFile))
        innerGrid.map(gi => InnerTask(store, name, ci, gi, -1L, -1L))
      else {
        val index = Zarr3.readShardIndex(shardFile, meta, sh)
        innerGrid.zipWithIndex.map { case (gi, g) =>
          val (off, len) = index(g)
          InnerTask(store, name, ci, gi, off, len)
        }
      }
    }.flatten
  }

  /** Inclusive [min, max] global-linear-index bounds of one SHARD (the
    * outer chunk box) — decidable before its index tail is read. */
  private[sources] def shardIdxBounds(ci: Seq[Int], meta: Zarr3.Meta): (Long, Long) =
    MountDsv2.boxBounds(
      ci.zip(meta.chunks).map { case (c, w) => c.toLong * w },
      meta.chunks.map(_.toLong), meta.shape.map(_.toLong))

  /** Per-dimension box test of one whole-chunk task against pushed
    * `dK` coordinate ranges (the bbox-crop prune — exact per dim where
    * the linear idx window is only a span). */
  private[sources] def chunkBoxKeep(t: ChunkTask,
      meta: Either[Zarr.ArrayMeta, Zarr3.Meta],
      ranges: IndexedSeq[MountDsv2.IdxRange]): Boolean = {
    val (shape, chunks) = meta match {
      case Left(m) => (m.shape, m.chunks)
      case Right(m) => (m.shape, m.chunks)
    }
    MountDsv2.boxKeep(
      t.ci.zip(chunks).map { case (c, w) => c.toLong * w },
      chunks.map(_.toLong), shape.map(_.toLong), ranges)
  }

  /** Same test for a whole SHARD (outer chunk) of a sharded array —
    * failing shards never even have their index tails read. */
  private[sources] def shardBoxKeep(ci: Seq[Int], meta: Zarr3.Meta,
      ranges: IndexedSeq[MountDsv2.IdxRange]): Boolean =
    MountDsv2.boxKeep(
      ci.zip(meta.chunks).map { case (c, w) => c.toLong * w },
      meta.chunks.map(_.toLong), meta.shape.map(_.toLong), ranges)

  /** Same test for one inner chunk of a sharded array. */
  private[sources] def innerBoxKeep(t: InnerTask, meta: Zarr3.Meta,
      ranges: IndexedSeq[MountDsv2.IdxRange]): Boolean = {
    val inner = meta.sharding.getOrElse(fail("meta lost its sharding")).innerChunks
    MountDsv2.boxKeep(
      t.ci.zip(meta.chunks).zip(t.gi.zip(inner)).map {
        case ((c, w), (g, iw)) => c.toLong * w + g.toLong * iw
      },
      inner.map(_.toLong), meta.shape.map(_.toLong), ranges)
  }

  /** Tree-filter prune ([[MountDsv2.boxTreeKeep]]) for one whole-chunk
    * task — the catalog crop's per-store disjunction at chunk level. */
  private[sources] def chunkTreeKeep(t: ChunkTask,
      meta: Either[Zarr.ArrayMeta, Zarr3.Meta],
      trees: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    trees.isEmpty || {
      val (shape, chunks) = meta match {
        case Left(m) => (m.shape, m.chunks)
        case Right(m) => (m.shape, m.chunks)
      }
      MountDsv2.boxTreeKeep(trees, t.store, t.dataset, chunkIdxBounds(t, meta),
        t.ci.zip(chunks).map { case (c, w) => c.toLong * w },
        chunks.map(_.toLong), shape.map(_.toLong))
    }

  /** Same prune for a whole SHARD — failing shards never have their
    * index tails read. */
  private[sources] def shardTreeKeep(store: String, dataset: String,
      ci: Seq[Int], meta: Zarr3.Meta,
      trees: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    trees.isEmpty ||
      MountDsv2.boxTreeKeep(trees, store, dataset, shardIdxBounds(ci, meta),
        ci.zip(meta.chunks).map { case (c, w) => c.toLong * w },
        meta.chunks.map(_.toLong), meta.shape.map(_.toLong))

  /** Same prune for one inner chunk of a sharded array. */
  private[sources] def innerTreeKeep(t: InnerTask, meta: Zarr3.Meta,
      trees: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    trees.isEmpty || {
      val inner = meta.sharding.getOrElse(fail("meta lost its sharding")).innerChunks
      MountDsv2.boxTreeKeep(trees, t.store, t.dataset, innerIdxBounds(t, meta),
        t.ci.zip(meta.chunks).zip(t.gi.zip(inner)).map {
          case ((c, w), (g, iw)) => c.toLong * w + g.toLong * iw
        },
        inner.map(_.toLong), meta.shape.map(_.toLong))
    }

  /** ABSENT inner chunk (index sentinel or missing shard file)? */
  private[sources] def innerMissing(t: InnerTask): Boolean =
    t.offset == -1L && t.length == -1L

  /** The shard file holding inner task `t`. */
  private[sources] def shardPathOf(t: InnerTask, meta: Zarr3.Meta): String =
    shardPath(t.store, t.dataset, meta, t.ci)

  /** Decode one inner task from its raw byte window (None = absent ->
    * fill). The decode half of [[innerElems]], split out so callers
    * holding a coalesced multi-window buffer can slice and decode. */
  private[sources] def innerDecode(t: InnerTask, meta: Zarr3.Meta,
      raw: Option[Array[Byte]]): Iterator[(Long, Double)] = {
    val sh = meta.sharding.getOrElse(fail("meta lost its sharding"))
    val vals = raw.map(Zarr3.decodeInnerChunk(_, meta, sh))
    innerIndexValues(meta, t.ci, t.gi).map { case (g, k) =>
      (g, vals.map(_(k)).getOrElse(meta.fill))
    }
  }

  /** Validate task `t`'s byte window against the shard length
    * (subtraction form: offset + length can wrap past Long.MaxValue). */
  private[sources] def checkInnerWindow(t: InnerTask, shardLen: Long,
      shardFile: String): Unit =
    require(t.offset >= 0 && t.length >= 0 &&
      t.offset <= shardLen && t.length <= shardLen - t.offset,
      s"inner window (${t.offset}, ${t.length}) outside $shardFile")

  /** One inner-chunk task's (global idx, value) elements: a positioned
    * byte-range read through `handleFor` (caller manages handle reuse)
    * + inner-pipeline decode; absent inner chunks emit fill. */
  private[sources] def innerElems(t: InnerTask, meta: Zarr3.Meta,
      handleFor: String => ByteStore.ReadAt): Iterator[(Long, Double)] =
    if (innerMissing(t)) innerDecode(t, meta, None)
    else {
      val shardFile = shardPathOf(t, meta)
      val h = handleFor(shardFile)
      checkInnerWindow(t, h.length, shardFile)
      innerDecode(t, meta, Some(h.readFully(t.offset, t.length.toInt)))
    }

  /** Coalesced decode of a run of inner tasks sharing (store, dataset),
    * ideally (shard, offset)-ordered: segments by shard file, merges
    * byte-adjacent windows ([[MountDsv2.coalesceWindows]]), one span
    * read per group — inner chunks are written back-to-back, so a whole
    * shard typically collapses to a single ranged read on an object
    * store. Absent inner chunks emit fill without any read. Shared by
    * the RDD ingest and the [[ZarrDataSource]] DSv2 reader. */
  private[sources] def innerElemsRun(run: IndexedSeq[InnerTask], meta: Zarr3.Meta,
      handleFor: String => ByteStore.ReadAt): Iterator[(Long, Double)] =
    MountDsv2.runs(run)(t =>
        if (innerMissing(t)) null else shardPathOf(t, meta)).iterator.flatMap { seg =>
      if (innerMissing(seg.head))
        seg.iterator.flatMap(innerDecode(_, meta, None))
      else {
        val shardFile = shardPathOf(seg.head, meta)
        val h = handleFor(shardFile)
        seg.foreach(checkInnerWindow(_, h.length, shardFile))
        val windows = seg.map(t => (t.offset, t.length))
        MountDsv2.coalesceWindows(windows).iterator.flatMap { g =>
          val gStart = seg(g.start).offset
          val gEnd = g.map(i => seg(i).offset + seg(i).length).max
          val buf = handleFor(shardFile).readFully(gStart, (gEnd - gStart).toInt)
          g.iterator.flatMap { i =>
            val t = seg(i)
            innerDecode(t, meta, Some(java.util.Arrays.copyOfRange(buf,
              (t.offset - gStart).toInt, (t.offset - gStart + t.length).toInt)))
          }
        }
      }
    }

  /** Index-only walk of one inner-chunk task: no shard bytes read. */
  private[sources] def innerIndexes(t: InnerTask, meta: Zarr3.Meta): Iterator[Long] =
    innerIndexValues(meta, t.ci, t.gi).map(_._1)

  /** Inclusive [min, max] global-linear-index bounds of one inner-chunk
    * task (closed-form — used by the mount's idx-range prune). */
  private[sources] def innerIdxBounds(t: InnerTask, meta: Zarr3.Meta): (Long, Long) = {
    val inner = meta.sharding.getOrElse(fail("meta lost its sharding")).innerChunks
    MountDsv2.boxBounds(
      t.ci.zip(meta.chunks).zip(t.gi.zip(inner)).map {
        case ((c, w), (g, iw)) => c.toLong * w + g.toLong * iw
      },
      inner.map(_.toLong), meta.shape.map(_.toLong))
  }

  private def innerIndexValues(meta: Zarr3.Meta, ci: Seq[Int],
      gi: Seq[Int]): Iterator[(Long, Int)] = {
    val inner = meta.sharding.getOrElse(fail("meta lost its sharding")).innerChunks
    val iStrides = inner.scanRight(1)(_ * _).tail
    val strides = meta.shape.scanRight(1)(_ * _).tail
    (0 until inner.product).iterator.flatMap { k =>
      var g = 0L; var inBounds = true; var dim = 0
      while (dim < meta.shape.size && inBounds) {
        val local = (k / iStrides(dim)) % inner(dim)
        val global = ci(dim) * meta.chunks(dim) + gi(dim) * inner(dim) + local
        if (global >= meta.shape(dim)) inBounds = false
        else g += global.toLong * strides(dim)
        dim += 1
      }
      if (!inBounds) None else Some((g, k))
    }
  }

  /** Phase 2 fan-out for sharded arrays: one positioned byte-range read
    * + inner-pipeline decode per task; absent inner chunks (index
    * sentinel or missing shard file) emit fill. Same output contract as
    * [[readValues]]. */
  def readValuesShardInner(spark: SparkSession, store: String, name: String,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val tasks = shardInnerTasks(store, name)
    require(tasks.nonEmpty, s"no inner chunks for $store/$name")
    val par = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    import org.apache.spark.sql.functions.col
    val hconf = ByteStore.confSnapshot(spark)
    spark.createDataset(tasks)
      .repartition(par)
      // (store, dataset, shard, offset)-sort each partition so handle
      // reuse AND window coalescing see contiguous shard runs
      // (repartition alone scatters tasks round-robin; without `ci` in
      // the key, inner-chunk offsets — which restart near 0 in every
      // shard file — interleave tasks from different shards and the
      // per-shard runs degenerate to single tasks)
      .sortWithinPartitions(col("store"), col("dataset"), col("ci"), col("offset"))
      .mapPartitions { it =>
        ByteStore.install(hconf) // executor JVMs have no session
        var in: ByteStore.ReadAt = null
        def handleFor(p: String): ByteStore.ReadAt = {
          // one handle per shard file per run (HDF5ChunkIngest's
          // handle-reuse discipline)
          if (in == null || in.path != p) {
            if (in != null) in.close()
            in = ByteStore.open(p)
          }
          in
        }
        val out = MountDsv2.runs(it.toSeq)(t => (t.store, t.dataset))
          .iterator.flatMap { run =>
            val meta = metaOf(run.head.store, run.head.dataset) match {
              case Right(m) => m
              case Left(_) => fail("v2 store in shard-inner read")
            }
            innerElemsRun(run, meta, handleFor)
              .map { case (g, v) => (run.head.store, run.head.dataset, g, v) }
          }
        // close the last handle when the partition iterator drains
        new Iterator[(String, String, Long, Double)] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          def next(): (String, String, Long, Double) = out.next()
        }
      }
      .toDF("path", "dataset", "idx", "value")
  }
}
