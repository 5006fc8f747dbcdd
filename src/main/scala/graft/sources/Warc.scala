package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/1.0 codec (ISO 28500, the Common Crawl container — THE
  * interchange format 100 TB-scale web corpora ship in).
  *
  * Layout implemented: each record is `WARC/1.0\r\n`, header lines
  * (`Name: value\r\n`), an empty line, `Content-Length` payload bytes,
  * and a `\r\n\r\n` record separator. Response records carry a full
  * HTTP response as payload; [[httpBody]] strips the HTTP header block.
  * The .warc.gz form compresses EVERY RECORD AS ITS OWN GZIP MEMBER
  * (the Common Crawl layout — it makes records independently seekable);
  * `java.util.zip.GZIPInputStream` decodes concatenated members
  * transparently, so [[readGz]] inflates the whole file and parses
  * sequentially.
  *
  * Scale shape: one WARC file parses as a stream inside one executor
  * task (records are sequential by design — the format has no interior
  * index), and files parallelize across the cluster via `binaryFile` —
  * exactly how Common Crawl segments (~1 GB x ~10^5 files per crawl)
  * are processed. Truncated or malformed records reject LOUDLY, never
  * silently misread.
  *
  * The independent [[write]]/[[writeGz]] encode path generates every
  * fixture, so decode is provable without external files — the
  * NetCDF3/HDF4/HDF5/ONNX strategy.
  */
object Warc {

  final case class WarcRecord(
      warcType: String, targetUri: String, date: String,
      headers: Map[String, String], payload: Array[Byte])

  /** Parse an uncompressed WARC buffer into records. */
  def read(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    while (p < bytes.length) {
      // tolerate trailing CRLF padding between records
      while (p < bytes.length &&
        (bytes(p) == '\r'.toByte || bytes(p) == '\n'.toByte)) p += 1
      if (p < bytes.length) {
        val (headers, bodyStart) = parseHeaderBlock(bytes, p)
        require(headers.getOrElse("__version__", "") == "WARC/1.0",
          s"expected WARC/1.0 record header at offset $p")
        val len = headers.getOrElse("content-length",
          sys.error(s"record at $p missing Content-Length")).trim.toInt
        require(len >= 0 && bodyStart + len <= bytes.length,
          s"record at $p: truncated payload (need $len bytes)")
        out += WarcRecord(
          warcType = headers.getOrElse("warc-type", ""),
          targetUri = headers.getOrElse("warc-target-uri", ""),
          date = headers.getOrElse("warc-date", ""),
          headers = headers - "__version__",
          payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len))
        p = bodyStart + len
      }
    }
    out.result()
  }

  /** Parse a .warc.gz buffer (concatenated per-record gzip members). */
  def readGz(bytes: Array[Byte]): Seq[WarcRecord] = read(gunzipAll(bytes))

  /** Strip the HTTP response header block from a response payload
    * (Common Crawl response records embed the full HTTP message);
    * non-HTTP payloads pass through untouched. */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val head = new String(payload, 0, math.min(5, payload.length), "US-ASCII")
    if (!head.startsWith("HTTP/")) payload
    else {
      val sep = indexOfBlankLine(payload, 0)
      require(sep >= 0, "HTTP payload without header terminator")
      java.util.Arrays.copyOfRange(payload, sep, payload.length)
    }
  }

  /** Encode records as uncompressed WARC/1.0. */
  def write(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach { r =>
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: ${r.warcType}\r\n")
      if (r.targetUri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      if (r.date.nonEmpty) sb.append(s"WARC-Date: ${r.date}\r\n")
      r.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
        if (!Set("warc-type", "warc-target-uri", "warc-date", "content-length")(k.toLowerCase))
          sb.append(s"$k: $v\r\n")
      }
      sb.append(s"Content-Length: ${r.payload.length}\r\n\r\n")
      bos.write(sb.toString.getBytes("US-ASCII"))
      bos.write(r.payload)
      bos.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    bos.toByteArray
  }

  /** Encode as .warc.gz: one gzip member per record (Common Crawl). */
  def writeGz(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(bos)
      gz.write(write(Seq(r)))
      gz.finish()
    }
    bos.toByteArray
  }

  /** Wrap a body as the HTTP response payload of a WARC response
    * record, the way Common Crawl stores fetched pages. */
  def httpResponsePayload(body: Array[Byte], contentType: String): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes("US-ASCII") ++ body
  }

  // ---- internals -----------------------------------------------------

  /** Headers from `start` to the blank line; returns (map with
    * lowercased keys + "__version__", offset just past the blank line). */
  private def parseHeaderBlock(bytes: Array[Byte], start: Int): (Map[String, String], Int) = {
    val end = indexOfBlankLine(bytes, start)
    require(end >= 0, s"header block at $start has no terminating blank line")
    val lines = new String(bytes, start, end - 4 - start, "US-ASCII").split("\r\n")
    require(lines.nonEmpty, s"empty header block at $start")
    val hdrs = Map.newBuilder[String, String]
    hdrs += ("__version__" -> lines.head.trim)
    lines.tail.foreach { ln =>
      val i = ln.indexOf(':')
      require(i > 0, s"malformed WARC header line: '$ln'")
      hdrs += (ln.substring(0, i).trim.toLowerCase -> ln.substring(i + 1).trim)
    }
    (hdrs.result(), end)
  }

  /** Offset just past the first CRLFCRLF at/after `from`, or -1. */
  private def indexOfBlankLine(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i + 4
      i += 1
    }
    -1
  }

  /** Inflate concatenated gzip members into one buffer. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }
}
