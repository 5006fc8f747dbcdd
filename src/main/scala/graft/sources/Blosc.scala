package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Blosc1 container decode, pure JVM, written from the public c-blosc
  * 1.x format documentation (Blosc/c-blosc README_HEADER.rst and the
  * blosc.h flag constants). Blosc(lz4, shuffle) is zarr-python's
  * DEFAULT compressor, so any v2 store written with `zarr.save()`
  * defaults — the single most likely real-world ingest — lands here.
  *
  * Frame layout (16-byte header, all ints little-endian):
  *   0 version | 1 versionlz | 2 flags | 3 typesize
  *   4 nbytes (uncompressed) | 8 blocksize | 12 cbytes (total frame)
  * flags: bit0 byte-shuffle, bit1 memcpyed, bit2 bit-shuffle,
  *        bit4 dont_split (recorded by c-blosc >= 1.14 so the decoder
  *        need not re-derive the split decision), bits5-7 codec
  *        (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd).
  * Body (when not memcpyed): nblocks int32 absolute block offsets
  * (bstarts), then per block `nstreams` streams, each an int32
  * compressed size + payload; a stream whose csize equals its
  * decompressed size is stored raw. Blocks split into `typesize`
  * streams unless dont_split or the leftover (short, final) block.
  * Byte-shuffle is applied per block and undone after stream decode.
  *
  * Supported: lz4/lz4hc codec (via the from-scratch [[Lz4]] block
  * decoder) and zstd (zstd-jni, the same codec layer the Arrow bodies
  * use — `Blosc(cname="zstd")` is a common zarr-python tuning),
  * memcpyed frames, byte-shuffle AND bit-shuffle (the Masui bitshuffle
  * scalar algorithm c-blosc bundles: per block, the largest multiple
  * of 8 elements is bit-transposed, trailing bytes stay raw), split +
  * non-split streams, leftover blocks. The blosclz/snappy/zlib codecs
  * REJECT LOUDLY (named in the error), never a silent misread.
  *
  * Scale shape: one pure function per chunk, called executor-side from
  * the zarr chunk-parallel ingest — no shared state, allocation
  * bounded by the header's declared nbytes.
  */
object Blosc {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"blosc decode: $msg")

  private val CodecNames =
    Map(0 -> "blosclz", 1 -> "lz4", 2 -> "snappy", 3 -> "zlib", 4 -> "zstd")

  /** Decompress one blosc1 frame to its full `nbytes` payload. */
  def decompress(src: Array[Byte]): Array[Byte] = {
    if (src.length < 16) fail(s"frame shorter than the 16-byte header (${src.length})")
    val bb = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
    val version = src(0) & 0xff
    if (version < 1 || version > 2) fail(s"unsupported format version $version")
    val flags = src(2) & 0xff
    val typesize = src(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    val cbytes = bb.getInt(12)
    if (nbytes < 0) fail(s"negative nbytes $nbytes")
    if (cbytes < 16 || cbytes > src.length)
      fail(s"declared frame size $cbytes vs ${src.length} available")
    if (nbytes == 0) return Array.emptyByteArray

    val memcpyed = (flags & 0x2) != 0
    if (memcpyed) {
      if (16 + nbytes > src.length) fail("memcpyed frame shorter than nbytes")
      return java.util.Arrays.copyOfRange(src, 16, 16 + nbytes)
    }

    val codec = (flags >>> 5) & 0x7
    if (codec != 1 && codec != 4)
      fail(s"codec '${CodecNames.getOrElse(codec, codec.toString)}' " +
        "not supported (lz4/lz4hc/zstd only)")
    // Corrupt-frame guard, CODEC-AWARE (the cap must be parsed after the
    // flags byte): a tiny frame declaring a huge nbytes is corrupt, not
    // compressed — reject before allocating the nbytes output buffer.
    //  - lz4: worst-case expansion is ~255x (one extension byte extends
    //    a match by 255), so >300x is impossible output.
    //  - zstd: routinely exceeds 300x on constant data (zero- or
    //    fill-valued zarr chunks); its format ceiling is one RLE block
    //    (3-byte header + 1 payload byte) expanding to the 128 KiB block
    //    max, ~32768x per 4 bytes — cap at 40000x, far above any real
    //    ratio but still a bound. Per-block output is additionally
    //    length-checked against neblock below, so a lying header fails
    //    loudly after at most one bounded allocation.
    val maxRatio = if (codec == 4) 40000L else 300L
    if (nbytes.toLong > maxRatio * src.length)
      fail(s"declared nbytes $nbytes absurd for a ${src.length}-byte " +
        s"${CodecNames(codec)} frame")
    val shuffle = (flags & 0x1) != 0 && typesize > 1
    val bitshuffle = (flags & 0x4) != 0
    if (shuffle && bitshuffle) fail("byte-shuffle and bit-shuffle flags both set")
    if (bitshuffle && typesize < 1)
      fail("bit-shuffle flag with typesize 0 (would silently skip the filter)")
    val dontSplit = (flags & 0x10) != 0
    if (blocksize <= 0) fail(s"non-positive blocksize $blocksize")

    val nblocks = (nbytes + blocksize - 1) / blocksize
    val leftover = nbytes % blocksize
    if (16 + 4 * nblocks > src.length) fail("bstarts past frame end")
    val out = new Array[Byte](nbytes)
    var j = 0
    while (j < nblocks) {
      val bstart = bb.getInt(16 + 4 * j)
      if (bstart < 16 || bstart > src.length) fail(s"block $j offset $bstart out of frame")
      val leftoverBlock = j == nblocks - 1 && leftover != 0
      val bsize = if (leftoverBlock) leftover else blocksize
      val nstreams =
        if (!dontSplit && !leftoverBlock && typesize > 0 && bsize % typesize == 0)
          typesize
        else 1
      val neblock = bsize / nstreams
      val block = new Array[Byte](bsize)
      var pos = bstart
      var s = 0
      while (s < nstreams) {
        if (pos + 4 > src.length) fail(s"block $j stream $s: truncated size prefix")
        val csize = bb.getInt(pos); pos += 4
        if (csize < 0 || pos + csize > src.length)
          fail(s"block $j stream $s: stream size $csize past frame end")
        if (csize == neblock) // stored raw (compression didn't reduce)
          System.arraycopy(src, pos, block, s * neblock, neblock)
        else {
          val dec =
            if (codec == 1) Lz4.decompressBlock(src, pos, csize, neblock)
            else {
              val d = try com.github.luben.zstd.Zstd.decompress(
                java.util.Arrays.copyOfRange(src, pos, pos + csize), neblock)
              catch {
                case e: Exception =>
                  fail(s"block $j stream $s: zstd: ${e.getMessage}")
              }
              if (d.length != neblock)
                fail(s"block $j stream $s: zstd produced ${d.length}, declared $neblock")
              d
            }
          System.arraycopy(dec, 0, block, s * neblock, neblock)
        }
        pos += csize
        s += 1
      }
      val dst = j * blocksize
      if (shuffle) unshuffle(block, typesize, out, dst)
      else if (bitshuffle && typesize >= 1) {
        val ub = bitUnshuffle(block, typesize)
        System.arraycopy(ub, 0, out, dst, bsize)
      }
      else System.arraycopy(block, 0, out, dst, bsize)
      j += 1
    }
    out
  }

  /** Compress into one blosc1 frame the way c-blosc >= 1.14 lays it out
    * (dont_split recorded in flags bit 4, raw streams when lz4 doesn't
    * shrink, memcpy fallback when the whole frame doesn't). The LZ4
    * streams come from lz4-java — the reference JVM compressor that
    * ships with Spark — while the container framing is this module's;
    * [[decompress]] above shares no code with either, so round-trips
    * are a real two-implementation check. */
  def compress(data: Array[Byte], typesize: Int, blocksize: Int,
      shuffle: Boolean = true, bitshuffle: Boolean = false,
      codec: String = "lz4"): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize out of [1,255]")
    require(blocksize > 0, s"non-positive blocksize $blocksize")
    require(codec == "lz4" || codec == "zstd", s"codec '$codec' (lz4/zstd)")
    val nbytes = data.length
    require(nbytes <= Int.MaxValue - 16, "frame too large for blosc1 int32 sizes")
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val leftover = nbytes % blocksize
    // c-blosc splits only blosclz/lz4 streams, never zstd
    val split = codec == "lz4" && typesize > 1 && typesize <= 16 &&
      blocksize / typesize >= 128 && blocksize % typesize == 0
    var flags = (if (codec == "zstd") 4 else 1) << 5
    val doBitShuffle = bitshuffle && typesize >= 1
    val doShuffle = !doBitShuffle && shuffle && typesize > 1
    if (doShuffle) flags |= 0x1
    if (doBitShuffle) flags |= 0x4
    if (!split) flags |= 0x10
    val blocks = (0 until nblocks).map { j =>
      val leftoverBlock = j == nblocks - 1 && leftover != 0
      val bsize = if (leftoverBlock) leftover else blocksize
      val block0 = java.util.Arrays.copyOfRange(data, j * blocksize, j * blocksize + bsize)
      val block =
        if (doShuffle) shuffleBytes(block0, typesize)
        else if (doBitShuffle) bitShuffle(block0, typesize)
        else block0
      val nstreams = if (split && !leftoverBlock) typesize else 1
      val neblock = bsize / nstreams
      val bos = new java.io.ByteArrayOutputStream(bsize + 4 * nstreams)
      var s = 0
      while (s < nstreams) {
        val (cbuf, clen) = if (codec == "lz4") {
          val max = comp.maxCompressedLength(neblock)
          val buf = new Array[Byte](max)
          (buf, comp.compress(block, s * neblock, neblock, buf, 0, max))
        } else {
          val buf = com.github.luben.zstd.Zstd.compress(
            java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock), 5)
          (buf, buf.length)
        }
        val storeRaw = clen >= neblock // like c-blosc: raw when not smaller
        val lb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(if (storeRaw) neblock else clen)
        bos.write(lb.array())
        if (storeRaw) bos.write(block, s * neblock, neblock)
        else bos.write(cbuf, 0, clen)
        s += 1
      }
      bos.toByteArray
    }
    val total = 16 + 4 * nblocks + blocks.map(_.length).sum
    if (nbytes == 0 || total >= 16 + nbytes) { // memcpy fallback
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte).put(0x2.toByte).put(typesize.toByte)
      out.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      out.put(data)
      return out.array()
    }
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    out.putInt(nbytes).putInt(blocksize).putInt(total)
    var off = 16 + 4 * nblocks
    blocks.foreach { b => out.putInt(off); off += b.length }
    blocks.foreach(out.put)
    out.array()
  }

  /** The byte-wise shuffle: group all 0th bytes of each element, then
    * all 1st bytes, … (per block; odd tail stored unshuffled). */
  private def shuffleBytes(block: Array[Byte], typesize: Int): Array[Byte] = {
    val n = block.length
    val nElems = n / typesize
    val out = new Array[Byte](n)
    var b = 0
    while (b < typesize) {
      val base = b * nElems
      var i = 0
      while (i < nElems) { out(base + i) = block(i * typesize + b); i += 1 }
      b += 1
    }
    var t = nElems * typesize
    while (t < n) { out(t) = block(t); t += 1 }
    out
  }

  /** Undo the byte-wise shuffle of one block: shuffled layout stores
    * all 0th bytes of each element, then all 1st bytes, … The tail that
    * doesn't fill a whole element (only possible on odd-sized leftover
    * blocks) is stored unshuffled, matching c-blosc. */
  private def unshuffle(block: Array[Byte], typesize: Int,
      out: Array[Byte], outOff: Int): Unit = {
    val n = block.length
    val nElems = n / typesize
    val shuffled = nElems * typesize
    var b = 0
    while (b < typesize) {
      val base = b * nElems
      var i = 0
      while (i < nElems) {
        out(outOff + i * typesize + b) = block(base + i)
        i += 1
      }
      b += 1
    }
    var t = shuffled
    while (t < n) { out(outOff + t) = block(t); t += 1 }
  }

  /** The classic 8x8 bit-matrix transpose (Hacker's Delight 7-3; the
    * TRANS_BIT_8X8 macro in Masui's bitshuffle). An involution. */
  private def transBit8x8(x0: Long): Long = {
    var x = x0
    var t = (x ^ (x >>> 7)) & 0x00AA00AA00AA00AAL
    x = x ^ t ^ (t << 7)
    t = (x ^ (x >>> 14)) & 0x0000CCCC0000CCCCL
    x = x ^ t ^ (t << 14)
    t = (x ^ (x >>> 28)) & 0x00000000F0F0F0F0L
    x = x ^ t ^ (t << 28)
    x
  }

  /** c-blosc bit-shuffle of ONE block (flags bit 2) — the scalar
    * bshuf_trans_bit_elem pipeline from Masui's bitshuffle library as
    * bundled by c-blosc 1.x: the largest multiple of 8 elements is
    * transformed, trailing bytes are copied raw (c-blosc's
    * `size -= size % 8; memcpy leftovers` convention). Three steps:
    *  1. byte-transpose within elements (all 0th bytes, all 1st, ...)
    *  2. 8x8 bit-transpose of each aligned 8-byte group, byte k of the
    *     transposed word landing in bit-row k at group position
    *  3. regroup rows of size/8 bytes: row (k, plane j) -> row (j*8+k),
    * so the output is, per element-byte-plane, 8 consecutive bit-planes
    * of size/8 bytes each. */
  private[sources] def bitShuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val n = block.length
    val out = block.clone() // trailing bytes stay raw
    val elems = n / typesize
    val size = elems - (elems % 8)
    if (size == 0) return out
    val nb = size * typesize
    val a = new Array[Byte](nb)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < size) { a(j * size + i) = block(i * typesize + j); i += 1 }
      j += 1
    }
    val nbr = nb / 8
    val bArr = new Array[Byte](nb)
    var g = 0
    while (g < nbr) {
      var x = 0L
      var k = 0
      while (k < 8) { x |= (a(g * 8 + k) & 0xffL) << (8 * k); k += 1 }
      x = transBit8x8(x)
      k = 0
      while (k < 8) { bArr(k * nbr + g) = ((x >>> (8 * k)) & 0xff).toByte; k += 1 }
      g += 1
    }
    val nbr2 = size / 8
    j = 0
    while (j < typesize) {
      var k = 0
      while (k < 8) {
        System.arraycopy(bArr, (k * typesize + j) * nbr2, out, (j * 8 + k) * nbr2, nbr2)
        k += 1
      }
      j += 1
    }
    out
  }

  /** Inverse of [[bitShuffle]]: the three steps inverted in reverse
    * order (the 8x8 bit-transpose is an involution, so step 2 reapplies
    * itself at the regathered positions). */
  private[sources] def bitUnshuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val n = block.length
    val out = block.clone()
    val elems = n / typesize
    val size = elems - (elems % 8)
    if (size == 0) return out
    val nb = size * typesize
    val nbr = nb / 8
    val nbr2 = size / 8
    val bArr = new Array[Byte](nb)
    var j = 0
    while (j < typesize) {
      var k = 0
      while (k < 8) {
        System.arraycopy(block, (j * 8 + k) * nbr2, bArr, (k * typesize + j) * nbr2, nbr2)
        k += 1
      }
      j += 1
    }
    val a = new Array[Byte](nb)
    var g = 0
    while (g < nbr) {
      var x = 0L
      var k = 0
      while (k < 8) { x |= (bArr(k * nbr + g) & 0xffL) << (8 * k); k += 1 }
      x = transBit8x8(x)
      k = 0
      while (k < 8) { a(g * 8 + k) = ((x >>> (8 * k)) & 0xff).toByte; k += 1 }
      g += 1
    }
    j = 0
    while (j < typesize) {
      var i = 0
      while (i < size) { out(i * typesize + j) = a(j * size + i); i += 1 }
      j += 1
    }
    out
  }
}
