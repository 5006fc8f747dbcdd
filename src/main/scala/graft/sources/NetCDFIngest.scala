package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Spark-side netCDF ingest/export over the pure-JVM [[NetCDF3]] codec.
  *
  * Ingest is `binaryFile` scan -> per-file decode -> long-format rows
  * (scene_id, time, x, y, value): the parallelism unit is the file
  * (matching the reference, where each file is one luigi task —
  * sources/les.py:11-16) and every downstream operator works on the
  * long format. Multi-timestep files split into one scene per timestep
  * with the reference's `{fn_root}_{isoformat minus colons}` naming
  * (sources/les.py:103-112, FindLESFiles.run).
  *
  * Scale: `binaryFile` plans one partition per file (up to
  * maxPartitionBytes), so a 100 TB archive of O(GB) files decodes with
  * per-file parallelism and no shuffle until the first keyed operator.
  * Decode never materializes more than one file per task.
  */
object NetCDFIngest {

  final case class ScenePixel(
      scene_id: String, time: java.sql.Timestamp, x: Double, y: Double, value: Double)

  /** Microseconds per unit for CF-style "UNIT since EPOCH" time axes. */
  private def unitUs(unit: String): Long = unit.toLowerCase match {
    case u if u.startsWith("second") => 1000000L
    case u if u.startsWith("minute") => 60L * 1000000L
    case u if u.startsWith("hour") => 3600L * 1000000L
    case u if u.startsWith("day") => 86400L * 1000000L
    case other => throw new IllegalArgumentException(s"unsupported time unit '$other'")
  }

  /** Parse a CF time units attribute ("seconds since 1970-01-01[ 00:00:00]")
    * into (epochMicros, microsPerUnit). Absent units = epoch seconds. */
  def parseTimeUnits(units: Option[String]): (Long, Long) = units match {
    case None => (0L, 1000000L)
    case Some(s) =>
      val parts = s.split("\\s+since\\s+")
      require(parts.length == 2, s"unparseable time units '$s'")
      val base = parts(1).trim.replace(" ", "T") match {
        case d if d.length == 10 => d + "T00:00:00"
        case dt => dt
      }
      val ldt = java.time.LocalDateTime.parse(base)
      (ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000L, unitUs(parts(0).trim))
  }

  /** Python datetime.isoformat().replace(":","") — the reference's scene
    * timestep string (sources/les.py:104-105). */
  def timestepString(epochUs: Long): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      math.floorDiv(epochUs, 1000000L), (math.floorMod(epochUs, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d${ldt.getMinute}%02d${ldt.getSecond}%02d"
    if (ldt.getNano == 0) base else base + f".${ldt.getNano / 1000}%06d"
  }

  /** Decode one classic .nc file holding `varName` over dims
    * ([time,] y, x) into per-timestep scene rows. Coordinate variables
    * are matched by dimension name; a dimension with no coordinate
    * variable coordinates as 0..n-1 (xarray default-index semantics). */
  def decodeLesFile(path: String, bytes: Array[Byte], varName: String): Iterator[ScenePixel] = {
    val h = NetCDF3.readHeader(bytes)
    val v = h.vars.find(_.name == varName).getOrElse(throw new IllegalArgumentException(
      s"Requested variable `$varName` not found in datafile $path"))
    val dimNames = v.dimIds.map(h.dims(_).name)
    val shape = NetCDF3.shapeOf(h, v)
    require(dimNames.size == 2 || dimNames.size == 3,
      s"$varName: expected ([time,] y, x) dims, got $dimNames")
    def coord(dimName: String, n: Int): (Array[Double], Option[String]) =
      h.vars.find(cv => cv.name == dimName && cv.dimIds == Seq(h.dims.indexWhere(_.name == dimName))) match {
        case Some(cv) => (NetCDF3.readValues(bytes, h, cv),
          cv.attrs.find(_.name == "units").map(_.value.toString))
        case None => (Array.tabulate(n)(_.toDouble), None)
      }
    val values = NetCDF3.readValues(bytes, h, v)
    val fnRoot = path.split('/').last.stripSuffix(".nc")

    val (spatialDims, nT) =
      if (dimNames.size == 3) (dimNames.drop(1).zip(shape.drop(1)), shape.head)
      else (dimNames.zip(shape), 1)
    val Seq((yName, ny), (xName, nx)) = spatialDims.toSeq
    val (ys, _) = coord(yName, ny)
    val (xs, _) = coord(xName, nx)
    val timesUs: Array[Long] =
      if (dimNames.size == 3) {
        val (tv, tu) = coord(dimNames.head, nT)
        val (epoch, perUnit) = parseTimeUnits(tu)
        tv.map(t => epoch + math.round(t * perUnit))
      } else Array(0L)

    timesUs.iterator.zipWithIndex.flatMap { case (tUs, ti) =>
      val sceneId = s"${fnRoot}_${timestepString(tUs)}"
      val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        math.floorDiv(tUs, 1000000L), math.floorMod(tUs, 1000000L) * 1000L))
      for { j <- (0 until ny).iterator; i <- (0 until nx).iterator }
        yield ScenePixel(sceneId, ts, xs(i), ys(j), values((ti * ny + j) * nx + i))
    }
  }

  /** S8/S9: ingest every classic .nc file matching `pathGlob` into the
    * long pixel format, one scene per timestep. */
  def lesScenes(spark: SparkSession, pathGlob: String, varName: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, b) => decodeLesFile(p, b, varName) }
      .toDF()
  }

  /** The FindLESFiles catalog itself: (scene_id, time, path) — the
    * timestep split manifest without decoding pixel data (header-only
    * read of the time axis). */
  def sceneCatalog(spark: SparkSession, pathGlob: String, varName: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val h = NetCDF3.readHeader(bytes)
        val v = h.vars.find(_.name == varName).getOrElse(throw new IllegalArgumentException(
          s"Requested variable `$varName` not found in datafile $p"))
        val dimNames = v.dimIds.map(h.dims(_).name)
        val fnRoot = p.split('/').last.stripSuffix(".nc")
        val timesUs: Array[Long] = if (dimNames.size == 3) {
          val tDim = dimNames.head
          val tv = h.vars.find(_.name == tDim).get
          val raw = NetCDF3.readValues(bytes, h, tv)
          val (epoch, perUnit) = parseTimeUnits(
            tv.attrs.find(_.name == "units").map(_.value.toString))
          raw.map(t => epoch + math.round(t * perUnit))
        } else Array(0L)
        timesUs.iterator.map { tUs =>
          (s"${fnRoot}_${timestepString(tUs)}",
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
              math.floorDiv(tUs, 1000000L), math.floorMod(tUs, 1000000L) * 1000L)), p)
        }
      }.toDF("scene_id", "time", "path")
  }

  /** S12 netCDF export: one classic .nc per scene under `outDir`, each a
    * (y, x) grid of `varName` with coordinate variables — what a
    * reference user feeds back into xarray tooling
    * (pipeline/embeddings/aux_fields/utils.py:43-68 writes per-scene
    * aux netCDFs the same way). Executors write files directly through
    * the [[ByteStore]] seam, so `outDir` may be a local/NFS path or a
    * `file://`/`hdfs://`/`s3a://` URI. Returns one row per written
    * scene. */
  def writeScenes(df: DataFrame, outDir: String, varName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ByteStore.mkdirs(outDir)
    val hconf = ByteStore.confSnapshot(spark)
    df.select("scene_id", "time", "x", "y", "value").as[ScenePixel]
      .groupByKey(_.scene_id)
      .mapGroups { (sid, it) =>
        ByteStore.install(hconf) // executor JVMs have no session
        val rows = it.toArray
        val xs = rows.map(_.x).distinct.sorted
        val ys = rows.map(_.y).distinct.sorted
        val xi = xs.zipWithIndex.toMap; val yi = ys.zipWithIndex.toMap
        val grid = new Array[Double](xs.length * ys.length)
        rows.foreach(r => grid(yi(r.y) * xs.length + xi(r.x)) = r.value)
        val inst = rows.head.time.toInstant
        val tUs = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        val bytes = NetCDF3.write(
          dims = Seq(NetCDF3.Dim("time", 1), NetCDF3.Dim("y", ys.length), NetCDF3.Dim("x", xs.length)),
          gattrs = Seq(NetCDF3.Attr("source", NetCDF3.NcChar, "graft")),
          vars = Seq(
            NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
              Seq(NetCDF3.Attr("units", NetCDF3.NcChar, "seconds since 1970-01-01 00:00:00")),
              Array(tUs / 1e6)),
            NetCDF3.VarSpec("y", Seq("y"), NetCDF3.NcDouble, Nil, ys),
            NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcDouble, Nil, xs),
            NetCDF3.VarSpec(varName, Seq("time", "y", "x"), NetCDF3.NcDouble, Nil, grid)))
        val out = ByteStore.absolute(ByteStore.join(outDir, s"$sid.nc"))
        ByteStore.writeAllBytes(out, bytes)
        (sid, out, rows.length.toLong)
      }.toDF("scene_id", "path", "n_px")
  }
}
