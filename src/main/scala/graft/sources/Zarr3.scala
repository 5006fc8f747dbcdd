package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Zarr v3 source/sink — the CURRENT zarr core spec (v3.0), the format
  * new xarray/zarr-python deployments write, next to the v2 pair
  * ([[Zarr]]/[[ZarrSink]]). Pure-JVM from the public spec:
  *
  *  - per-node `zarr.json` (node_type group|array); array metadata
  *    carries shape, string data_type, `chunk_grid {regular,
  *    chunk_shape}`, `chunk_key_encoding` (default `c/…` with
  *    configurable separator, or the v2-style dotted keys), fill_value
  *    (number or NaN/±Infinity strings), and a codec PIPELINE that
  *    must contain exactly one array->bytes codec;
  *  - codecs supported: `bytes` (endian little|big) + optional `gzip`
  *    (RFC 1952 — NOT v2's raw zlib). Blosc/zstd/crc32c/sharding/
  *    transpose reject LOUDLY, never a silent misread;
  *  - data types float64/float32/int8..int64/uint8/uint16/uint32
  *    (uint64 rejects: not losslessly representable as Double);
  *  - missing chunk files read as fill_value; edge chunks are stored
  *    full-size with pad regions skipped (same rule as v2).
  *
  * Scale shape identical to the v2 pair: store discovery lists PATHS
  * on the driver, decode is executor-parallel one task per store; a
  * huge single store parallelizes per chunk (the grid is zarr's unit
  * of parallelism). Independence check: `tools/make_fixtures.py
  * write_zarr3` emits a Python-stdlib v3 store ForeignFixturesSpec
  * decodes exactly.
  */
object Zarr3 {

  final case class Meta(shape: Seq[Int], chunks: Seq[Int], dtype: String,
      bigEndian: Boolean, gzipped: Boolean, fill: Double,
      keySep: String, v2Keys: Boolean)

  private implicit val formats: Formats = DefaultFormats

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zarr v3 decode: $msg")

  private val DtypeSizes = Map(
    "float64" -> 8, "float32" -> 4, "int64" -> 8, "int32" -> 4,
    "int16" -> 2, "int8" -> 1, "uint32" -> 4, "uint16" -> 2, "uint8" -> 1)

  def parseMeta(json: String): Meta = {
    val j = JsonMethods.parse(json)
    if ((j \ "zarr_format").extractOpt[Int] != Some(3))
      fail(s"zarr_format ${JsonMethods.compact(j \ "zarr_format")} (v3 only here; v2 -> sources.Zarr)")
    if ((j \ "node_type").extractOpt[String] != Some("array"))
      fail("node_type must be 'array'")
    val dtype = (j \ "data_type").extractOpt[String].getOrElse(fail("missing data_type"))
    if (dtype == "uint64") fail("uint64 not losslessly representable as Double")
    if (!DtypeSizes.contains(dtype)) fail(s"data_type '$dtype' unsupported")
    val grid = j \ "chunk_grid"
    if ((grid \ "name").extractOpt[String] != Some("regular"))
      fail(s"chunk_grid ${JsonMethods.compact(grid \ "name")} unsupported (regular only)")
    val chunks = (grid \ "configuration" \ "chunk_shape").extract[Seq[Int]]
    val shape = (j \ "shape").extract[Seq[Int]]
    if (shape.isEmpty || chunks.size != shape.size)
      fail(s"chunk rank ${chunks.size} != shape rank ${shape.size}")
    if (chunks.exists(_ <= 0) || shape.exists(_ < 0)) fail("non-positive chunk dims")
    val (keySep, v2Keys) = (j \ "chunk_key_encoding") match {
      case JNothing | JNull => ("/", false)
      case e => (e \ "name").extractOpt[String] match {
        case Some("default") =>
          ((e \ "configuration" \ "separator").extractOpt[String].getOrElse("/"), false)
        case Some("v2") =>
          ((e \ "configuration" \ "separator").extractOpt[String].getOrElse("."), true)
        case other => fail(s"chunk_key_encoding $other unsupported")
      }
    }
    val codecs = (j \ "codecs") match {
      case JArray(cs) => cs
      case _ => fail("codecs must be a non-empty array")
    }
    var bigEndian = false; var sawBytes = false; var gz = false
    codecs.foreach { c =>
      (c \ "name").extractOpt[String] match {
        case Some("bytes") =>
          if (sawBytes) fail("multiple array->bytes codecs")
          sawBytes = true
          bigEndian = (c \ "configuration" \ "endian").extractOpt[String] match {
            case Some("little") | None => false
            case Some("big") => true
            case Some(e) => fail(s"endian '$e' unsupported")
          }
          if (gz) fail("bytes codec must precede bytes->bytes codecs")
        case Some("gzip") =>
          if (!sawBytes) fail("gzip before the array->bytes codec")
          gz = true
        case other => fail(s"codec $other unsupported (bytes + gzip only)")
      }
    }
    if (!sawBytes) fail("codec pipeline lacks the required array->bytes codec")
    val fill = (j \ "fill_value") match {
      case JString("NaN") => Double.NaN
      case JString("Infinity") => Double.PositiveInfinity
      case JString("-Infinity") => Double.NegativeInfinity
      case JNothing | JNull => fail("fill_value is required in v3")
      case JString(s) => fail(s"fill_value '$s' unsupported")
      case v => v.extract[Double]
    }
    Meta(shape, chunks, dtype, bigEndian, gz, fill, keySep, v2Keys)
  }

  private def gunzip(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    try in.readAllBytes()
    catch { case e: java.io.IOException => fail(s"corrupt gzip chunk: ${e.getMessage}") }
    finally in.close()
  }

  private def decodeElem(bb: java.nio.ByteBuffer, dtype: String, k: Int): Double =
    dtype match {
      case "float64" => bb.getDouble(k * 8)
      case "float32" => bb.getFloat(k * 4).toDouble
      case "int64" => bb.getLong(k * 8).toDouble
      case "int32" => bb.getInt(k * 4).toDouble
      case "int16" => bb.getShort(k * 2).toDouble
      case "int8" => bb.get(k).toDouble
      case "uint32" => (bb.getInt(k * 4).toLong & 0xFFFFFFFFL).toDouble
      case "uint16" => (bb.getShort(k * 2) & 0xFFFF).toDouble
      case "uint8" => (bb.get(k) & 0xFF).toDouble
    }

  /** Decode ONE chunk file's raw bytes to its full chunk-sized value
    * array (pad regions included) — the [[ZarrChunkIngest]] unit. */
  private[sources] def decodeChunkBytes(raw: Array[Byte], meta: Meta): Array[Double] = {
    val bytes = if (meta.gzipped) gunzip(raw) else raw
    val es = DtypeSizes(meta.dtype)
    val expect = meta.chunks.product * es
    if (bytes.length != expect)
      fail(s"chunk has ${bytes.length} bytes, expected $expect")
    val order = if (meta.bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
    Array.tabulate(meta.chunks.product)(k => decodeElem(bb, meta.dtype, k))
  }

  /** Chunk file name under the array dir for chunk index `ci`. */
  def chunkKey(meta: Meta, ci: Seq[Int]): String =
    if (meta.v2Keys) ci.mkString(meta.keySep)
    else ("c" +: ci.map(_.toString)).mkString(meta.keySep)

  /** Decode one v3 array of any rank from `store/name`. */
  def readArray(store: java.io.File, name: String): (Seq[Int], Array[Double]) = {
    val d = new java.io.File(store, name)
    val metaFile = new java.io.File(d, "zarr.json")
    if (!metaFile.exists()) fail(s"no zarr.json under ${d.getPath}")
    val meta = parseMeta(java.nio.file.Files.readString(metaFile.toPath))
    val rank = meta.shape.size
    val out = Array.fill(meta.shape.product)(meta.fill)
    val nChunks = meta.shape.zip(meta.chunks).map { case (s, c) => (s + c - 1) / c }
    val strides = meta.shape.scanRight(1)(_ * _).tail
    val cStrides = meta.chunks.scanRight(1)(_ * _).tail
    val es = DtypeSizes(meta.dtype)
    val order = if (meta.bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN

    def walk(idx: List[Int], dim: Int): Seq[List[Int]] =
      if (dim == rank) Seq(idx.reverse)
      else (0 until nChunks(dim)).flatMap(i => walk(i :: idx, dim + 1))

    walk(Nil, 0).foreach { ci =>
      // the default "/" separator nests chunk files in subdirectories —
      // resolve through File so both layouts work
      val f = chunkKey(meta, ci).split('/')
        .foldLeft(d)((acc, part) => new java.io.File(acc, part))
      if (f.exists()) {
        val raw = java.nio.file.Files.readAllBytes(f.toPath)
        val bytes = if (meta.gzipped) gunzip(raw) else raw
        val expect = meta.chunks.product * es
        if (bytes.length != expect)
          fail(s"chunk ${f.getName} has ${bytes.length} bytes, expected $expect")
        val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
        val within = meta.chunks.product
        var k = 0
        while (k < within) {
          var g = 0L; var inBounds = true; var dim = 0
          while (dim < rank && inBounds) {
            val local = (k / cStrides(dim)) % meta.chunks(dim)
            val global = ci(dim) * meta.chunks(dim) + local
            if (global >= meta.shape(dim)) inBounds = false
            else g += global.toLong * strides(dim)
            dim += 1
          }
          if (inBounds) out(g.toInt) = decodeElem(bb, meta.dtype, k)
          k += 1
        }
      }
    }
    (meta.shape, out)
  }

  /** Read every `<scene_id>.zarr` v3 store under `dir` — the same
    * contract as [[Zarr.readScenes]]. */
  def readScenes(spark: SparkSession, dir: String, varName: String): DataFrame = {
    import spark.implicits._
    val stores = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.endsWith(".zarr"))
      .map(_.getAbsolutePath).sorted.toSeq
    spark.createDataset(stores)
      .repartition(math.max(1, math.min(stores.size, 32)))
      .flatMap { path =>
        val store = new java.io.File(path)
        val sid = store.getName.stripSuffix(".zarr")
        val (shape, v) = readArray(store, varName)
        if (shape.size != 2) fail(s"$varName has rank ${shape.size}, expected 2")
        val (yShape, ys) = readArray(store, "y")
        val (xShape, xs) = readArray(store, "x")
        if (yShape != Seq(shape(0)) || xShape != Seq(shape(1)))
          fail(s"coordinate shapes ($yShape, $xShape) disagree with grid $shape")
        for (j <- 0 until shape(0); i <- 0 until shape(1))
          yield (sid, xs(i), ys(j), v(j * shape(1) + i))
      }
      .toDF("scene_id", "x", "y", "value")
  }

  // ------------------------------------------------------------------
  // Writer (the v3 sibling of ZarrSink)
  // ------------------------------------------------------------------

  private def metaJson(shape: Seq[Int], chunks: Seq[Int], dims: Seq[String],
      gzipLevel: Option[Int]): String = {
    val codecs = Seq(Some("""{"name": "bytes", "configuration": {"endian": "little"}}"""),
      gzipLevel.map(l => s"""{"name": "gzip", "configuration": {"level": $l}}"""))
      .flatten.mkString("[", ", ", "]")
    s"""{"zarr_format": 3, "node_type": "array",
       | "shape": [${shape.mkString(", ")}],
       | "data_type": "float64",
       | "chunk_grid": {"name": "regular",
       |   "configuration": {"chunk_shape": [${chunks.mkString(", ")}]}},
       | "chunk_key_encoding": {"name": "default",
       |   "configuration": {"separator": "/"}},
       | "fill_value": "NaN",
       | "codecs": $codecs,
       | "dimension_names": [${dims.map("\"" + _ + "\"").mkString(", ")}]}""".stripMargin
  }

  private def gzip(bytes: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gos = new java.util.zip.GZIPOutputStream(bos) {
      this.`def`.setLevel(level)
    }
    gos.write(bytes); gos.close()
    bos.toByteArray
  }

  private def writeArray(dir: java.io.File, name: String, shape: Seq[Int],
      dims: Seq[String], values: Array[Double], chunks: Seq[Int],
      gzipLevel: Option[Int]): Unit = {
    val d = new java.io.File(dir, name); d.mkdirs()
    java.nio.file.Files.writeString(d.toPath.resolve("zarr.json"),
      metaJson(shape, chunks, dims, gzipLevel))
    val meta = Meta(shape, chunks, "float64", bigEndian = false,
      gzipped = gzipLevel.isDefined, fill = Double.NaN, keySep = "/", v2Keys = false)
    val nChunks = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    val strides = shape.scanRight(1)(_ * _).tail
    val cStrides = chunks.scanRight(1)(_ * _).tail
    def emit(ci: List[Int], dim: Int): Unit =
      if (dim < shape.size) (0 until nChunks(dim)).foreach(i => emit(ci :+ i, dim + 1))
      else {
        val chunk = Array.fill(chunks.product)(Double.NaN)
        var k = 0
        while (k < chunk.length) {
          var g = 0L; var inBounds = true; var dd = 0
          while (dd < shape.size && inBounds) {
            val global = ci(dd) * chunks(dd) + (k / cStrides(dd)) % chunks(dd)
            if (global >= shape(dd)) inBounds = false else g += global.toLong * strides(dd)
            dd += 1
          }
          if (inBounds) chunk(k) = values(g.toInt)
          k += 1
        }
        val buf = java.nio.ByteBuffer.allocate(chunk.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        chunk.foreach(buf.putDouble)
        val bytes = gzipLevel.map(gzip(buf.array(), _)).getOrElse(buf.array())
        val f = chunkKey(meta, ci).split('/')
          .foldLeft(d)((acc, part) => new java.io.File(acc, part))
        f.getParentFile.mkdirs()
        val fos = new java.io.FileOutputStream(f)
        try fos.write(bytes) finally fos.close()
      }
    emit(Nil, 0)
  }

  /** One v3 store per scene — same input/output contract as
    * [[ZarrSink.writeScenes]]. */
  def writeScenes(df: DataFrame, outDir: String, varName: String,
      chunkRows: Option[Int] = None, gzipLevel: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    df.select("scene_id", "time", "x", "y", "value").as[NetCDFIngest.ScenePixel]
      .groupByKey(_.scene_id)
      .mapGroups { (sid, it) =>
        val rows = it.toArray
        val xs = rows.map(_.x).distinct.sorted
        val ys = rows.map(_.y).distinct.sorted
        val xi = xs.zipWithIndex.toMap; val yi = ys.zipWithIndex.toMap
        val grid = Array.fill(xs.length * ys.length)(Double.NaN)
        rows.foreach(r => grid(yi(r.y) * xs.length + xi(r.x)) = r.value)
        val store = new java.io.File(outDir, s"$sid.zarr")
        store.mkdirs()
        java.nio.file.Files.writeString(store.toPath.resolve("zarr.json"),
          """{"zarr_format": 3, "node_type": "group"}""")
        writeArray(store, varName, Seq(ys.length, xs.length), Seq("y", "x"),
          grid, Seq(chunkRows.getOrElse(ys.length), xs.length), gzipLevel)
        writeArray(store, "y", Seq(ys.length), Seq("y"), ys,
          Seq(chunkRows.getOrElse(ys.length)), gzipLevel)
        writeArray(store, "x", Seq(xs.length), Seq("x"), xs,
          Seq(xs.length), gzipLevel)
        (sid, store.getAbsolutePath, rows.length.toLong)
      }.toDF("scene_id", "path", "n_px")
  }
}
