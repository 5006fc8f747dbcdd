package graft.sources

import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-scope Hadoop FileSystem (`s3test:/...`) with S3-CONTRACT
  * semantics layered over RawLocal — the quirks [[SlowFs]]'s pure
  * latency model doesn't cover:
  *
  *  - **No rename.** Object stores have no atomic rename; s3a emulates
  *    it as copy+delete. Here it THROWS, so any sink or committer that
  *    relies on rename fails loudly instead of silently depending on a
  *    POSIX-ism (our sinks write final objects directly through
  *    [[ByteStore.create]] — the spec proves zero rename calls).
  *  - **Delayed LIST visibility.** While [[S3Fs.armInconsistency]] is
  *    set, objects created through this FS are INVISIBLE to
  *    listStatus/globStatus (classic list-after-write eventual
  *    consistency) but fully visible to getFileStatus/open — S3's
  *    strong read-after-write on direct keys. [[S3Fs.settle]] makes
  *    them listable. Explicit-path flows (the manifest-planned opens,
  *    which never LIST) must be unaffected; listing-based discovery is
  *    honestly eventual.
  */
class S3Fs extends RawLocalFileSystem {
  override def getScheme: String = "s3test"
  override def getUri: URI = URI.create("s3test:///")

  private def log(op: String, p: Path): Unit = {
    S3Fs.log.add(op + " " + p.toUri.getPath); ()
  }

  private def noteCreate(f: Path): Unit = {
    log("create", f)
    if (S3Fs.inconsistent) { S3Fs.pending.add(f.toUri.getPath); () }
  }

  // RawLocal's two public create overloads do NOT funnel through one
  // another — intercept both
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    noteCreate(f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    noteCreate(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    log("rename", src)
    throw new java.io.IOException(
      s"s3test: rename($src, $dst) — object stores have no rename; " +
        "write final objects directly")
  }

  // every positioned read is recorded as (path, offset, length) — the
  // unit that becomes a ranged GET on S3. A reader that slurps whole
  // objects instead of issuing bounded ranges shows up here.
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    new org.apache.hadoop.fs.FSDataInputStream(
      new S3Fs.RangeLoggingStream(inner, f.toUri.getPath))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    log("list", f)
    val all = super.listStatus(f)
    if (!S3Fs.inconsistent && S3Fs.pending.isEmpty) all
    else all.filterNot(st => S3Fs.isPending(st.getPath.toUri.getPath))
  }
}

object S3Fs {

  /** Delegating stream recording each positioned read's (path, offset,
    * length) into [[rangedReads]]. Wraps the RawLocal FSDataInputStream
    * (which is Seekable + PositionedReadable, exactly what s3a's
    * stream implements). */
  private[sources] final class RangeLoggingStream(
      inner: org.apache.hadoop.fs.FSDataInputStream, path: String)
      extends java.io.InputStream
      with org.apache.hadoop.fs.Seekable
      with org.apache.hadoop.fs.PositionedReadable {
    override def read(): Int = inner.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      inner.read(b, off, len)
    override def close(): Unit = inner.close()
    def seek(pos: Long): Unit = inner.seek(pos)
    def getPos: Long = inner.getPos
    def seekToNewSource(targetPos: Long): Boolean =
      inner.seekToNewSource(targetPos)
    def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      rangedReads.add((path, position, length.toLong))
      inner.read(position, buffer, offset, length)
    }
    def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      rangedReads.add((path, position, length.toLong))
      inner.readFully(position, buffer, offset, length)
    }
    def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  /** Every positioned read issued through this FS: (path, offset,
    * length) — the byte-level sibling of the open/list op log. */
  val rangedReads =
    new ConcurrentLinkedQueue[(String, Long, Long)]()

  @volatile var inconsistent: Boolean = false
  private[sources] val pending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val log = new ConcurrentLinkedQueue[String]()

  private[sources] def isPending(path: String): Boolean =
    pending.contains(path)

  /** Start the eventual-consistency window: objects created from now
    * on are invisible to listings until [[settle]]. */
  def armInconsistency(): Unit = { inconsistent = true }

  /** All pending objects become listable; the window closes. */
  def settle(): Unit = { inconsistent = false; pending.clear() }

  def reset(): Unit = { settle(); log.clear(); rangedReads.clear() }

  def ranges: Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    rangedReads.forEach(r => out += r)
    out.result()
  }

  def ops: Seq[String] = {
    val out = Seq.newBuilder[String]
    log.forEach(s => out += s)
    out.result()
  }
}
