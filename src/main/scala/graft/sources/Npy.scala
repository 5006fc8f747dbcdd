package graft.sources

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` source/sink (format spec v1.0, numpy/lib/format.py
  * public docs): magic `\\x93NUMPY`, version, a python-dict header
  * (`descr`, `fortran_order`, `shape`) padded so data starts 64-byte
  * aligned, then raw little-endian values — the lingua franca for
  * embedding dumps (faiss/np workflows ship id + vector arrays as
  * paired .npy files).
  *
  * Write: one aligned PAIR of shards per partition (`part-i.ids.npy`
  * int64 [n], `part-i.vec.npy` float32 [n, dim]) — rows sorted by id
  * within the shard so the pairing is deterministic. Read: per-file
  * parallel zip of each pair. For one CONSOLIDATED array bigger than a
  * task, [[readRows]] fans out closed-form row ranges (offset = header
  * + row·dim·4 — the q129/q153/q159 chunk-parallel shape with zero
  * metadata walk).
  *
  * Supported dtypes on read: `<f4`, `<f8`, `<i8` (C order). Everything
  * else — fortran order, big endian, pickled objects — rejects loudly.
  * Independence: tools/make_fixtures.py writes golden .npy pairs from
  * the same public spec (NpySpec proves exact decode). */
object Npy {

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Header bytes for a C-order little-endian array. */
  def header(descr: String, shape: Seq[Long]): Array[Byte] = {
    val shapeStr = shape.mkString("(", ", ", if (shape.size == 1) ",)" else ")")
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    // pad with spaces + trailing \n so magic(6)+ver(2)+len(2)+header ≡ 0 (mod 64)
    val base = 6 + 2 + 2 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val full = dict + (" " * pad) + "\n"
    val bb = ByteBuffer.allocate(10 + full.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(1.toByte).put(0.toByte)
    bb.putShort(full.length.toShort)
    bb.put(full.getBytes(StandardCharsets.US_ASCII))
    bb.array()
  }

  final case class Meta(descr: String, shape: Seq[Long], dataOffset: Long)

  /** Parse magic + header; loud-reject anything outside the supported
    * surface. Positioned reads through the [[ByteStore]] seam so URI
    * stores (file://, s3a://) mount identically. */
  def readMeta(in: ByteStore.ReadAt): Meta = {
    require(in.length >= 10, s"npy: ${in.length}-byte file shorter than a header")
    val head = in.readFully(0L, 10)
    require(head.take(6).sameElements(Magic), "npy: bad magic")
    require(head(6) == 1 && head(7) == 0,
      s"npy: unsupported version ${head(6)}.${head(7)}")
    val hlen = ByteBuffer.wrap(head, 8, 2).order(ByteOrder.LITTLE_ENDIAN)
      .getShort & 0xFFFF
    require(10L + hlen <= in.length, s"npy: $hlen-byte header past EOF")
    val h = new String(in.readFully(10L, hlen), StandardCharsets.US_ASCII)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(sys.error("npy: no descr"))
    require(Set("<f4", "<f8", "<i8")(descr), s"npy: unsupported descr $descr")
    val fortran = "'fortran_order':\\s*(\\w+)".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse("False")
    require(fortran == "False", "npy: fortran order unsupported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(sys.error("npy: no shape"))
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    Meta(descr, shape, 10L + hlen)
  }

  def itemSize(descr: String): Int = descr match {
    case "<f4" => 4; case "<f8" => 8; case "<i8" => 8
    case d => sys.error(s"npy: unsupported descr $d")
  }

  /** Write one aligned (ids, vectors) shard pair per partition. The
    * shard materializes its partition in memory (the header needs the
    * row count up front and rows sort by id) — size partitions so a
    * shard fits an executor, the same contract as the whole-file
    * HDF5/zarr writers. */
  def write(df: DataFrame, dir: String, idCol: String, vecCol: String,
      dim: Int): Unit = {
    ByteStore.mkdirs(dir)
    ByteStore.list(dir).filter(e => !e.isDir && e.name.endsWith(".npy"))
      .foreach(e => ByteStore.deleteFile(e.path))
    val hconf = ByteStore.confSnapshot(df.sparkSession)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .rdd.mapPartitionsWithIndex { (pi, it) =>
        ByteStore.install(hconf) // executor JVMs have no session
        val rows = it.map { r =>
          (r.getLong(0), r.getSeq[Float](1).toArray)
        }.toArray.sortBy(_._1)
        rows.foreach(r => require(r._2.length == dim,
          s"npy: row ${r._1} has ${r._2.length} dims, expected $dim"))
        val ids = new BufferedOutputStream(ByteStore.create(
          ByteStore.join(dir, f"part-$pi%05d.ids.npy")))
        ids.write(header("<i8", Seq(rows.length.toLong)))
        val ib = ByteBuffer.allocate(8 * rows.length).order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach(r => ib.putLong(r._1))
        ids.write(ib.array()); ids.close()
        val vec = new BufferedOutputStream(ByteStore.create(
          ByteStore.join(dir, f"part-$pi%05d.vec.npy")))
        vec.write(header("<f4", Seq(rows.length.toLong, dim.toLong)))
        val vb = ByteBuffer.allocate(4 * dim * rows.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach(_._2.foreach(vb.putFloat))
        vec.write(vb.array()); vec.close()
        Iterator.single(rows.length)
      }.count()
    ()
  }

  /** Read every shard pair in `dir`: (vec_id long, embedding array<float>),
    * per-file parallel. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val stems = ByteStore.list(dir)
      .filter(e => !e.isDir && e.name.endsWith(".ids.npy"))
      .map(_.path.stripSuffix(".ids.npy")).sorted
    require(stems.nonEmpty, s"no .ids.npy shards in $dir")
    import spark.implicits._
    spark.createDataset(stems).flatMap { stem =>
      val ids = readAll(stem + ".ids.npy")
      val vecs = readAll(stem + ".vec.npy")
      val (im, ib) = ids; val (vm, vb) = vecs
      require(im.descr == "<i8" && im.shape.size == 1, s"npy: bad ids shard $stem")
      require(vm.descr == "<f4" && vm.shape.size == 2 &&
        vm.shape.head == im.shape.head, s"npy: misaligned pair $stem")
      val dim = vm.shape(1).toInt
      val ibb = ByteBuffer.wrap(ib).order(ByteOrder.LITTLE_ENDIAN)
      val vbb = ByteBuffer.wrap(vb).order(ByteOrder.LITTLE_ENDIAN)
      (0 until im.shape.head.toInt).iterator.map { r =>
        val id = ibb.getLong(r * 8)
        val v = Array.tabulate(dim)(j => vbb.getFloat((r * dim + j) * 4))
        (id, v)
      }
    }.toDF("vec_id", "embedding")
  }

  private def readAll(path: String): (Meta, Array[Byte]) = {
    val in = ByteStore.open(path)
    try {
      val m = readMeta(in)
      val b = in.readFully(m.dataOffset, (in.length - m.dataOffset).toInt)
      (m, b)
    } finally in.close()
  }

  /** Chunk-parallel read of ONE consolidated 2-D `<f4` array: row
    * ranges fan out (range-partitioned on rowStart), each task does one
    * positioned read at the closed-form offset — no metadata walk at
    * all. Returns (row long, embedding array<float>). */
  def readRows(spark: SparkSession, path: String,
      rowsPerTask: Int = 4096): DataFrame = {
    val meta = {
      val in = ByteStore.open(path)
      try readMeta(in) finally in.close()
    }
    require(meta.descr == "<f4" && meta.shape.size == 2,
      s"readRows expects a 2-D <f4 array, got ${meta.descr} ${meta.shape}")
    val nRows = meta.shape.head
    val dim = meta.shape(1).toInt
    require(dim > 0, s"npy: $path has a zero-width row")
    val off0 = meta.dataOffset
    // clamp so a task's byte count (rows * dim * 4) always fits one Int
    // buffer — wide matrices would overflow the default 4096-row grain
    val maxRows = math.max(1L, (Int.MaxValue.toLong - 8) / (dim.toLong * 4))
    val step = math.min(rowsPerTask.toLong, maxRows)
    val ranges = (0L until nRows by step)
      .map(s => (s, math.min(s + step, nRows)))
    import spark.implicits._
    spark.createDataset(ranges)
      .repartitionByRange(math.max(1, math.min(ranges.size, 64)), col("_1"))
      .flatMap { case (rs, re) =>
        val in = ByteStore.open(path)
        try {
          val b = in.readFully(off0 + rs * dim * 4, ((re - rs) * dim * 4).toInt)
          val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
          (rs until re).map { r =>
            val base = ((r - rs) * dim).toInt
            (r, Array.tabulate(dim)(j => bb.getFloat((base + j) * 4)))
          }
        } finally in.close()
      }.toDF("row", "embedding")
  }
}
