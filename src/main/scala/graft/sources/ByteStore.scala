package graft.sources

import java.io.RandomAccessFile

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem seam for the mount family (HDF5 / Arrow / zarr /
  * netCDF-3 / npy DSv2 sources and their chunk ingests): positioned
  * reads plus the tiny metadata operations the planners need (listings,
  * existence, small whole-file reads, globs).
  *
  * Dispatch is by URI scheme:
  *  - a plain path (`/data/store.h5`) keeps the zero-dependency
  *    `java.io` fast path — RandomAccessFile positioned reads, File
  *    listings;
  *  - a scheme'd URI (`file:///...`, `hdfs://...`, `s3a://...`) routes
  *    through `org.apache.hadoop.fs.FileSystem` (already on Spark's
  *    classpath), whose `FSDataInputStream.readFully(pos, ...)` is the
  *    positioned-read contract object-store connectors implement.
  *
  * This is what makes the mounts' metadata-proportional planning real
  * at 100 TB: the reference's own catalog is an S3 bucket
  * (convml-data sources/goes16/pipeline.py:21-70), and every byte the
  * planners and readers touch goes through here, so an `s3a://` store
  * mounts identically to a local one. Hadoop configuration is resolved
  * per call (never frozen at first touch) from the SparkContext when a
  * session exists in this JVM, and on sessionless executor JVMs from
  * classpath config + the executor SparkConf's `spark.hadoop.*` + a
  * driver-captured [[confSnapshot]] the mount reader factories
  * [[install]] at task start — so s3a credentials set on the driver
  * reach executor reads and writes.
  *
  * Reads AND writes: the sinks create shard/chunk/scene files through
  * [[create]]/[[writeAllBytes]], so the whole interchange family targets
  * URI stores symmetrically.
  */
object ByteStore {

  /** Positioned-read handle. Implementations are NOT thread-safe — one
    * handle per reader, the usage pattern of every mount. */
  trait ReadAt extends AutoCloseable {
    def path: String
    def length: Long
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit
    final def readFully(pos: Long, len: Int): Array[Byte] = {
      val a = new Array[Byte](len)
      readFully(pos, a, 0, len)
      a
    }
  }

  // ---- I/O instrumentation (test scope) --------------------------------
  // When a recorder is installed, every handle open, positioned read and
  // stream open through the seam is counted per path. This is how the
  // specs assert EXECUTED request counts — the object-store cost model —
  // not just plan arithmetic: a coalesced span = ONE read, a pruned
  // shard = ZERO opens, and any future reader that bypasses the
  // coalesced windows fails the count. Production cost: one volatile
  // load per operation (recorder null). Local mode runs executors in
  // this JVM, so the counts include executor-side I/O.

  /** Per-path open/read/byte counters (thread-safe — tasks run
    * concurrently). `reads` counts REQUESTS (one positioned read or one
    * whole-file read), the unit that becomes a GET on an object store. */
  final class IoRecorder {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Array[java.util.concurrent.atomic.AtomicLong]]()
    // Plain paths absolutize so relative-path readers and absolute-path
    // asserts meet on one key; scheme'd URIs are already canonical.
    private def norm(path: String): String =
      if (hasScheme(path)) path else new java.io.File(path).getAbsolutePath
    private def at(path: String) =
      m.computeIfAbsent(norm(path), _ => Array.fill(3)(new java.util.concurrent.atomic.AtomicLong()))
    private[ByteStore] def open(path: String): Unit = { at(path)(0).incrementAndGet(); () }
    private[ByteStore] def read(path: String, n: Long): Unit = {
      val a = at(path); a(1).incrementAndGet(); a(2).addAndGet(n); ()
    }
    // metadata round trips (list / exists / isFile / isDirectory) —
    // one LIST or HEAD each on an object store; global because the
    // interesting claim is the WALK's total, not a per-path figure
    private val meta = new java.util.concurrent.atomic.AtomicLong()
    private[ByteStore] def metaOp(): Unit = { meta.incrementAndGet(); () }
    def metaOps: Long = meta.get
    def opens(path: String): Long = Option(m.get(norm(path))).fold(0L)(_(0).get)
    def reads(path: String): Long = Option(m.get(norm(path))).fold(0L)(_(1).get)
    def bytes(path: String): Long = Option(m.get(norm(path))).fold(0L)(_(2).get)
    def pathsTouched: Set[String] = {
      import scala.jdk.CollectionConverters._
      m.keySet.asScala.toSet
    }
  }

  @volatile private var recorder: IoRecorder = _

  /** Install (and return) a fresh recorder; counts accumulate until
    * [[stopRecording]]. Test scope — one recorder per JVM at a time. */
  def startRecording(): IoRecorder = { val r = new IoRecorder; recorder = r; r }
  def stopRecording(): Unit = recorder = null

  private def recOpen(path: String): Unit = {
    val r = recorder; if (r != null) r.open(path)
  }
  private def recRead(path: String, n: Long): Unit = {
    val r = recorder; if (r != null) r.read(path, n)
  }
  private def recMeta(): Unit = {
    val r = recorder; if (r != null) r.metaOp()
  }

  private final class LocalReadAt(val path: String) extends ReadAt {
    private val raf = new RandomAccessFile(path, "r")
    recOpen(path)
    val length: Long = raf.length()
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit = {
      recRead(path, len)
      raf.seek(pos)
      raf.readFully(dst, off, len)
    }
    override def close(): Unit = raf.close()
  }

  private final class HadoopReadAt(val path: String) extends ReadAt {
    private val p = new Path(path)
    private val fs = fileSystem(path)
    recOpen(path)
    val length: Long = fs.getFileStatus(p).getLen
    private val in = fs.open(p)
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit = {
      recRead(path, len)
      in.readFully(pos, dst, off, len)
    }
    override def close(): Unit = in.close()
  }

  /** One directory entry from [[list]]. `path` round-trips into every
    * other ByteStore call (scheme preserved). */
  final case class Entry(path: String, name: String, isDir: Boolean)

  /** True when `path` is a URI with a scheme (`file:/...`, `s3a://...`);
    * false for plain POSIX paths. */
  private[sources] def hasScheme(path: String): Boolean =
    path.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:/.*")

  // ---- Hadoop configuration resolution ---------------------------------
  // Resolved PER CALL (never frozen in a lazy): a session created after
  // the first ByteStore touch, or a `hadoopConfiguration.set(...)` made
  // after startup, is honored by the next call. Order:
  //  1. a SparkSession in this JVM (driver, and local mode's task
  //     threads via the default session) -> its sparkContext's
  //     hadoopConfiguration — the canonical driver-side object,
  //     including spark.hadoop.* and direct post-startup mutation;
  //  2. no session (executor JVM on a real cluster): classpath config
  //     overlaid with (a) spark.hadoop.* from the executor's SparkConf
  //     (SparkEnv — how --conf / builder settings reach executors) and
  //     (b) a driver-captured [[confSnapshot]] installed by the mount
  //     reader factories at task start, which also carries direct
  //     hadoopConfiguration mutations made on the driver after startup.
  // Branch 2's Configuration is cached (XML parse is not per-read work);
  // FileSystem.get additionally caches instances per scheme+authority.

  /** Driver-side: the entries of the planning session's
    * hadoopConfiguration that differ from classpath defaults — the
    * small serializable snapshot the DSv2 reader factories ship to
    * executors (plain Map: a Configuration is not Java-serializable). */
  def confSnapshot(spark: org.apache.spark.sql.SparkSession): Map[String, String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Configuration()
    val out = Map.newBuilder[String, String]
    val it = conf.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (base.get(e.getKey) != e.getValue) out += e.getKey -> e.getValue
    }
    out.result()
  }

  /** Executor-side (idempotent): install a driver-captured snapshot for
    * JVMs with no SparkSession. One Spark app per JVM, one conf.
    * Dedup is by VALUE: every task deserializes its own Map instance,
    * so reference equality would rebuild the Configuration (classpath
    * XML parse) once per task on a long-lived executor. */
  def install(overrides: Map[String, String]): Unit =
    if (overrides.nonEmpty && installed != overrides) {
      installed = overrides
      cachedExecutorConf = null // rebuild with the new overlay
    }

  @volatile private var installed: Map[String, String] = Map.empty
  @volatile private var cachedExecutorConf: Configuration = _

  private[sources] def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse {
        var c = cachedExecutorConf
        if (c == null) {
          c = new Configuration()
          Option(org.apache.spark.SparkEnv.get).foreach { env =>
            env.conf.getAllWithPrefix("spark.hadoop.")
              .foreach { case (k, v) => c.set(k, v) }
          }
          installed.foreach { case (k, v) => c.set(k, v) }
          cachedExecutorConf = c
        }
        c
      }

  private def fileSystem(path: String): FileSystem =
    FileSystem.get(new Path(path).toUri, hadoopConf) // Hadoop caches per scheme+authority

  def open(path: String): ReadAt =
    if (hasScheme(path)) new HadoopReadAt(path) else new LocalReadAt(path)

  def exists(path: String): Boolean = {
    recMeta()
    if (hasScheme(path)) fileSystem(path).exists(new Path(path))
    else new java.io.File(path).exists()
  }

  def isFile(path: String): Boolean = {
    recMeta()
    if (hasScheme(path)) {
      val fs = fileSystem(path); val p = new Path(path)
      fs.exists(p) && fs.getFileStatus(p).isFile
    } else new java.io.File(path).isFile
  }

  def isDirectory(path: String): Boolean = {
    recMeta()
    if (hasScheme(path)) {
      val fs = fileSystem(path); val p = new Path(path)
      fs.exists(p) && fs.getFileStatus(p).isDirectory
    } else new java.io.File(path).isDirectory
  }

  /** Whole small file (array metadata, chunk files — KB-to-MB scale by
    * the callers' contracts; big payloads go through [[open]]). */
  def readAllBytes(path: String): Array[Byte] =
    if (hasScheme(path)) {
      val in = open(path)
      try in.readFully(0L, math.toIntExact(in.length)) finally in.close()
    } else {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      recOpen(path); recRead(path, a.length.toLong)
      a
    }

  def readString(path: String): String =
    new String(readAllBytes(path), java.nio.charset.StandardCharsets.UTF_8)

  /** Direct children of a directory, name-sorted. */
  def list(path: String): Seq[Entry] = {
    recMeta()
    if (hasScheme(path)) {
      val fs = fileSystem(path)
      fs.listStatus(new Path(path)).toSeq
        .map(st => Entry(st.getPath.toString, st.getPath.getName, st.isDirectory))
        .sortBy(_.name)
    } else {
      // absolute paths: entries ship to executors, whose cwd may differ
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty).toSeq
        .map(f => Entry(f.getAbsolutePath, f.getName, f.isDirectory))
        .sortBy(_.name)
    }
  }

  /** Sequential stream over the whole file — the shape the container
    * codecs (Avro blocks, TFRecord frames) consume. Caller closes.
    * Counted as one open + one read: a sequential drain is one GET. */
  def openStream(path: String): java.io.InputStream = {
    if (recorder != null) { recOpen(path); recRead(path, length(path)) }
    if (hasScheme(path)) fileSystem(path).open(new Path(path))
    else new java.io.FileInputStream(path)
  }

  // ---- write side (the sinks' seam) -----------------------------------
  // Executors write shard/chunk/scene files directly; routing creation
  // through here makes every sink target file://, hdfs:// or s3a:// URIs
  // like the readers do. Semantics everywhere: CREATE OVERWRITES, and
  // parent directories are created implicitly (the Hadoop create()
  // contract; the local branch mkdirs first).

  /** Create (overwrite) a file for writing; parents auto-created. */
  def create(path: String): java.io.OutputStream =
    if (hasScheme(path)) fileSystem(path).create(new Path(path), true)
    else {
      val f = new java.io.File(path)
      Option(f.getParentFile).foreach(_.mkdirs())
      new java.io.FileOutputStream(f)
    }

  def writeAllBytes(path: String, bytes: Array[Byte]): Unit = {
    val out = create(path)
    try out.write(bytes) finally out.close()
  }

  def writeString(path: String, s: String): Unit =
    writeAllBytes(path, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Ensure a directory exists (no-op when it already does). */
  def mkdirs(path: String): Unit = {
    if (hasScheme(path)) { fileSystem(path).mkdirs(new Path(path)); () }
    else { new java.io.File(path).mkdirs(); () }
  }

  /** Delete one file (not recursive); false when absent. */
  def deleteFile(path: String): Boolean =
    if (hasScheme(path)) fileSystem(path).delete(new Path(path), false)
    else new java.io.File(path).delete()

  /** File length without opening a stream. */
  def length(path: String): Long =
    if (hasScheme(path)) fileSystem(path).getFileStatus(new Path(path)).getLen
    else new java.io.File(path).length()

  /** (modification time ms, length) of one FILE — one HEAD on an
    * object store; the unit of change detection. */
  def stat(path: String): (Long, Long) = {
    recMeta()
    if (hasScheme(path)) {
      val st = fileSystem(path).getFileStatus(new Path(path))
      (st.getModificationTime, st.getLen)
    } else {
      val f = new java.io.File(path)
      (f.lastModified(), f.length())
    }
  }

  /** FNV-1a 64 of one file's change-relevant identity. */
  private def fileFp(rel: String, mt: Long, len: Long): Long = {
    var h = 0xcbf29ce484222325L
    def mix(b: Int): Unit = { h ^= (b & 0xff); h *= 0x100000001b3L }
    rel.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach(b => mix(b))
    (0 until 8).foreach(i => mix((mt >>> (8 * i)).toInt))
    (0 until 8).foreach(i => mix((len >>> (8 * i)).toInt))
    h
  }

  /** Change-detection fingerprint of a file or directory tree:
    * (max mtime, total bytes, file count, per-file hash), walked
    * breadth-first with one LIST per directory — the cheap "did this
    * store change?" probe a manifest refresh runs instead of
    * re-reading metadata. The 4th component XOR-combines a 64-bit hash
    * of every file's (root-relative path, mtime, length), so changes
    * the aggregates cancel out on — one file grew while another shrank
    * by the same amount, a rename at equal size, an mtime change below
    * the current max — still flip the fingerprint. The remaining blind
    * spot is inherent to LIST-level probing: a same-length in-place
    * rewrite within the filesystem's mtime granularity (commonly 1 s
    * on local FS, finer on object stores) changes NO listed attribute
    * and passes undetected; writers who need that detected must touch
    * some attribute (the specs grow a metadata file's byte count).
    * Depth-bounded like the discovery walks. */
  def treeStat(path: String, maxDepth: Int = 8): (Long, Long, Long, Long) = {
    val root = if (path.endsWith("/")) path else path + "/"
    def rel(p: String): String = if (p.startsWith(root)) p.drop(root.length) else p
    if (!isDirectory(path)) {
      val (mt, len) = stat(path)
      return (mt, len, 1L, fileFp("", mt, len))
    }
    var maxMtime = 0L; var bytes = 0L; var count = 0L; var hash = 0L
    var frontier = Seq(path)
    var depth = 0
    while (frontier.nonEmpty && depth <= maxDepth) {
      val level = parMap(frontier) { d =>
        recMeta()
        if (hasScheme(d))
          fileSystem(d).listStatus(new Path(d)).toSeq.map(st =>
            (st.getPath.toString, st.isDirectory, st.getModificationTime, st.getLen))
        else
          Option(new java.io.File(d).listFiles()).getOrElse(Array.empty).toSeq
            .map(f => (f.getAbsolutePath, f.isDirectory, f.lastModified(), f.length()))
      }.flatten
      level.foreach { case (p, isDir, mt, len) =>
        if (mt > maxMtime) maxMtime = mt
        if (!isDir) { bytes += len; count += 1; hash ^= fileFp(rel(p), mt, len) }
      }
      frontier = level.collect { case (p, true, _, _) => p }
      depth += 1
    }
    // a truncated walk would UNDER-fingerprint: an in-place change below
    // the bound would go undetected, which for a manifest means serving
    // stale data — exactly what the fingerprint exists to refuse
    if (frontier.nonEmpty)
      throw new IllegalArgumentException(s"byte store: tree at $path is " +
        s"deeper than $maxDepth levels — raise maxDepth for a complete " +
        "fingerprint")
    (maxMtime, bytes, count, hash)
  }

  /** URIs pass through; plain paths normalize to absolute (results
    * ship to executors and into user-visible path columns, where a
    * relative path would depend on cwd). */
  def absolute(path: String): String =
    if (hasScheme(path)) path else new java.io.File(path).getAbsolutePath

  /** Scheme-preserving child join (both branches use `/`; this runs on
    * Linux paths and URIs only). */
  def join(dir: String, child: String): String =
    if (dir.endsWith("/")) dir + child else dir + "/" + child

  /** Resolve a file-or-`dir/STAR.ext` glob to name-sorted FILE paths.
    * Hadoop URIs use FileSystem.globStatus (so `s3a://bucket/a/STAR.h5`
    * works); plain paths keep the local regex walk: literal segments
    * between `*`s are Pattern.quote'd, so names containing regex
    * metacharacters (`+`, `(`, `[`, ...) match literally, and a bare
    * pattern with no directory part (`STAR.h5`) lists the cwd.
    * A NEWLINE-separated value is an EXPLICIT file list, returned
    * sorted with ZERO storage round trips — how a manifest-planned
    * catalog mounts its surviving members without re-listing the dir. */
  def resolveGlob(pathGlob: String): Seq[String] =
    if (pathGlob.contains('\n'))
      // same normalize as every walking branch: a relative entry would
      // leak cwd-dependent paths into user-visible path columns
      pathGlob.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
        .map(absolute).sorted
    else if (hasScheme(pathGlob)) {
      val fs = fileSystem(pathGlob)
      Option(fs.globStatus(new Path(pathGlob))).getOrElse(Array.empty).toSeq
        .filter(_.isFile).map(_.getPath.toString).sorted
    } else {
      val f = new java.io.File(pathGlob)
      val dir = Option(f.getParentFile).getOrElse(new java.io.File("."))
      // -1 keeps trailing empty segments: "a*" -> ("a", "") -> "\Qa\E.*"
      val rx = java.util.regex.Pattern.compile(
        f.getName.split("\\*", -1).map {
          case "" => ""
          case lit => java.util.regex.Pattern.quote(lit)
        }.mkString(".*"))
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && rx.matcher(x.getName).matches())
        .map(_.getAbsolutePath).sorted.toSeq
    }

  // ---- bounded-parallel driver-side metadata I/O ------------------------

  /** Bounded-parallel, order-preserving map — the planners' discovery
    * helper. Listings, existence probes and KB-scale metadata reads are
    * latency-bound round trips (~0.4 ms even on checksummed `file://`,
    * worse on s3a), so a mount over thousands of scene stores walked
    * serially pays store-count × RTT at PLAN time. This runs `f` on a
    * per-call pool of up to `par` threads and returns results in input
    * order; the first failure rethrows its cause and interrupts the
    * rest. The pool is per call (not shared), so nested use cannot
    * deadlock — it only costs threads, which is why the mount walks are
    * breadth-first single-level sweeps. Plain CPU work gains nothing
    * here; use it only around storage round trips. */
  def parMap[A, B](items: Seq[A], par: Int = 16)(f: A => B): Seq[B] =
    if (items.sizeIs <= 1 || par <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(par, items.size))
      try {
        val futs = items.map(a => pool.submit(
          new java.util.concurrent.Callable[B] { def call(): B = f(a) }))
        try futs.map(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      } finally pool.shutdownNow()
    }
}
