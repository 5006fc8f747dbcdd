package graft.sources

import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, Path, RawLocalFileSystem}

/** Test-scope Hadoop FileSystem (`slowfs:/...`) wrapping RawLocal with
  * injected per-op latency and an op log — the object-store stand-in
  * the `file://` tests can't be: every metadata call and open costs a
  * real RTT, so an accidentally SERIAL walk or a per-chunk open storm
  * shows up as wall-clock, and a missing `fs.slowfs.impl` in a
  * sessionless JVM's conf is a loud resolution failure instead of the
  * silent success RawLocal's classpath default gives `file://`. */
class SlowFs extends RawLocalFileSystem {
  override def getScheme: String = "slowfs"
  override def getUri: URI = URI.create("slowfs:///")

  private def tick(op: String, p: Path): Unit = {
    SlowFs.log.add(op + " " + p.toUri.getPath)
    SlowFs.opCount.incrementAndGet()
    val l = SlowFs.latencyMs
    if (l > 0) Thread.sleep(l)
  }

  override def getFileStatus(f: Path): FileStatus = {
    tick("stat", f); super.getFileStatus(f)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    tick("list", f); super.listStatus(f)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    tick("open", f); super.open(f, bufferSize)
  }
}

object SlowFs {
  @volatile var latencyMs: Long = 0
  val opCount = new AtomicLong(0)
  val log = new ConcurrentLinkedQueue[String]()

  def reset(latency: Long): Unit = {
    latencyMs = latency
    opCount.set(0)
    log.clear()
  }

  def ops: Seq[String] = {
    val out = Seq.newBuilder[String]
    log.forEach(s => out += s)
    out.result()
  }

  /** Ops of one kind touching `pathSuffix`. */
  def count(op: String, pathSuffix: String): Int =
    ops.count(s => s.startsWith(op + " ") && s.endsWith(pathSuffix))
}
