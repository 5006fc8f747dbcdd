package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** LZ4 decompression (block + frame formats), pure JVM, written from the
  * public format specifications (lz4/lz4 repo: doc/lz4_Block_format.md
  * and doc/lz4_Frame_format.md). Decode-only: this engine never needs
  * to *produce* LZ4 — it needs to ingest what foreign writers produce:
  *   - Arrow IPC record batches with `compression="lz4"` (pyarrow's
  *     LZ4_FRAME body buffers, [[ArrowIpc]]),
  *   - zarr v2/v3 chunks under the blosc container (whose internal
  *     streams are LZ4 BLOCK format, [[Blosc]]).
  *
  * Proven against two independent compressors in Lz4Spec: lz4-java
  * (net.jpountz, ships with Spark) for both formats, and pyarrow's
  * C-level frames via the ArrowIpcSpec compressed-batch fixture.
  *
  * Scale shape: both entry points are pure byte-array functions with no
  * shared state, called executor-side per chunk/buffer — embarrassingly
  * parallel, allocation bounded by the declared decompressed size, and
  * every malformed input path rejects loudly (never silently misreads).
  */
object Lz4 {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"lz4 decode: $msg")

  /** Decompress one LZ4 BLOCK (raw sequences, no framing) of known
    * decompressed size. `dstLen` must be exact: producing fewer or more
    * bytes rejects loudly. */
  def decompressBlock(src: Array[Byte], srcOff: Int, srcLen: Int,
      dstLen: Int): Array[Byte] = {
    require(srcOff >= 0 && srcLen >= 0 && srcOff + srcLen <= src.length,
      s"lz4 decode: bad src window ($srcOff, $srcLen) for ${src.length} bytes")
    require(dstLen >= 0, s"lz4 decode: negative dstLen $dstLen")
    val out = decompressBlockUnknown(src, srcOff, srcLen, dstLen)
    if (out.length != dstLen)
      fail(s"decompressed ${out.length} bytes, declared $dstLen")
    out
  }

  /** Decompress one LZ4 FRAME starting at `srcOff`. Returns the content
    * bytes. Checksums (xxHash32) are skipped positionally, not verified
    * — framing errors still reject loudly via block structure.
    *
    * Handles BOTH frame linkage modes (FLG bit 5): block-INDEPENDENT
    * frames decode each block against its own history only, while
    * block-LINKED frames (the lz4frame/pyarrow default) let match
    * offsets reach back across block boundaries into up to 64 KB of
    * previously decoded content — so all blocks decode sequentially
    * into one shared output buffer, and the per-block history floor is
    * the block start only when the independence bit is set. */
  def decompressFrame(src: Array[Byte], srcOff: Int = 0,
      srcLen: Int = -1): Array[Byte] = {
    val end = if (srcLen < 0) src.length else srcOff + srcLen
    require(srcOff >= 0 && end <= src.length, "lz4 decode: bad frame window")
    val bb = ByteBuffer.wrap(src, srcOff, end - srcOff).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.remaining() < 7) fail("frame shorter than minimal header")
    val magic = bb.getInt()
    if (magic != 0x184d2204) fail(f"bad frame magic 0x$magic%08x")
    val flg = bb.get() & 0xff
    if ((flg >>> 6) != 1) fail(s"unsupported frame version ${flg >>> 6}")
    val blockIndependent = (flg & 0x20) != 0
    val blockChecksum = (flg & 0x10) != 0
    val contentSizeFlag = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    val dictId = (flg & 0x01) != 0
    if (dictId) fail("frames with DictID not supported")
    val bd = bb.get() & 0xff
    // block max (uncompressed) size: BD bits 6-4, 4=64KB 5=256KB 6=1MB 7=4MB
    val blockMax = ((bd >>> 4) & 0x7) match {
      case 4 => 64 << 10
      case 5 => 256 << 10
      case 6 => 1 << 20
      case 7 => 4 << 20
      case b => fail(s"invalid block max size code $b")
    }
    val declared: Long = if (contentSizeFlag) bb.getLong() else -1L
    if (declared > Int.MaxValue - 8) fail(s"content size $declared over 2 GiB")
    bb.get() // HC header checksum byte (not verified)
    // One shared output buffer for the whole frame: linked-mode matches
    // need the previous blocks' bytes addressable at d-offset. Grown
    // geometrically when no content size is declared.
    var dst = new Array[Byte](
      if (declared >= 0) declared.toInt else math.min(blockMax, 1 << 16))
    var d = 0
    def ensure(extra: Int): Unit =
      if (extra > dst.length - d) {
        if (extra > Int.MaxValue - 8 - d) fail("frame content over 2 GiB")
        val want = d.toLong + extra
        val grown = math.min(math.max(dst.length * 2L, want), (Int.MaxValue - 8).toLong)
        dst = java.util.Arrays.copyOf(dst, grown.toInt)
      }
    var done = false
    while (!done) {
      if (bb.remaining() < 4) fail("truncated block size")
      val raw = bb.getInt()
      if (raw == 0) done = true
      else {
        val uncompressed = (raw & 0x80000000) != 0
        val size = raw & 0x7fffffff
        if (size < 0 || size > bb.remaining()) fail("block size past input end")
        val pos = bb.position()
        // per-block decompressed size is not stored: allocation is
        // bounded by the header's block max (and the declared content
        // size when present)
        val cap = if (declared >= 0) {
          val left = declared - d
          if (left < 0) fail("content exceeds declared size")
          math.min(left, blockMax.toLong).toInt
        } else blockMax
        if (uncompressed) {
          if (size > cap) fail("uncompressed block over block max / declared size")
          ensure(size)
          System.arraycopy(src, pos, dst, d, size)
          d += size
        } else {
          ensure(cap)
          d = decompressInto(src, pos, size, dst, d, d + cap,
            floor = if (blockIndependent) d else 0)
        }
        bb.position(pos + size)
        if (blockChecksum) {
          if (bb.remaining() < 4) fail("truncated block checksum")
          bb.getInt()
        }
      }
    }
    if (contentChecksum) {
      if (bb.remaining() < 4) fail("truncated content checksum")
      bb.getInt()
    }
    if (declared >= 0 && d != declared)
      fail(s"content size $d != declared $declared")
    if (d == dst.length) dst else java.util.Arrays.copyOf(dst, d)
  }

  /** Block decode when the exact output size is unknown (frame blocks):
    * decode into a `cap`-sized buffer and return the produced prefix. */
  private def decompressBlockUnknown(src: Array[Byte], srcOff: Int,
      srcLen: Int, cap: Int): Array[Byte] = {
    val dst = new Array[Byte](cap)
    val d = decompressInto(src, srcOff, srcLen, dst, 0, cap, floor = 0)
    if (d == cap) dst else java.util.Arrays.copyOf(dst, d)
  }

  /** Decode one block's sequences into `dst` starting at `dstOff`,
    * writing at most up to `dstCap`. Match offsets may reach back to
    * `floor` (0 for linked-frame blocks = full frame history; the block
    * start for independent blocks and the raw BLOCK format). Returns
    * the write position after the block. Lengths accumulate in Longs:
    * a crafted ~8.4 MB run of 0xFF extension bytes overflows an Int
    * accumulator negative, which would skip the bounds checks and move
    * the write cursor backwards (silent corruption). */
  private def decompressInto(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstCap: Int, floor: Int): Int = {
    var s = srcOff
    val end = srcOff + srcLen
    var d = dstOff
    while (s < end) {
      val token = src(s) & 0xff
      s += 1
      var litLen: Long = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (s >= end) fail("truncated literal-length extension")
          b = src(s) & 0xff; s += 1
          litLen += b
        }
      }
      if (litLen > end - s) fail("literal run past input end")
      if (litLen > dstCap - d) fail("literal run past output capacity")
      val litLenI = litLen.toInt
      System.arraycopy(src, s, dst, d, litLenI)
      s += litLenI; d += litLenI
      if (s < end) {
        if (s + 2 > end) fail("truncated match offset")
        val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
        s += 2
        if (offset == 0) fail("match offset 0 is invalid")
        if (offset > d - floor)
          fail(s"match offset $offset reaches before output start")
        var matchLen: Long = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var b = 255
          while (b == 255) {
            if (s >= end) fail("truncated match-length extension")
            b = src(s) & 0xff; s += 1
            matchLen += b
          }
        }
        if (matchLen > dstCap - d) fail("match run past output capacity")
        val matchLenI = matchLen.toInt
        var i = 0
        val m = d - offset
        while (i < matchLenI) { dst(d + i) = dst(m + i); i += 1 }
        d += matchLenI
      }
    }
    d
  }
}
