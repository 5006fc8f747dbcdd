package graft.sources

/** Szip (CCSDS 121.0-B extended-Rice) DECODER for HDF5 filter id 4 —
  * the compression NASA HDF-EOS archives (MODIS/AIRS-era granules)
  * commonly ship, previously the codec's one loud-reject filter.
  *
  * Written from the public CCSDS 121.0-B-2 recommendation and the szlib
  * parameter conventions HDF5's H5Zszip.c exposes (reference semantics:
  * convml-data reads such granules through xarray/netCDF4,
  * e.g. sources/ceres.py's granule open path). Scope — the shapes the
  * HDF5 filter actually produces:
  *
  *  - entropy-coded (EC) and nearest-neighbor preprocessed (NN) modes;
  *  - option IDs per block: low-entropy (zero-block runs incl. the
  *    remainder-of-segment marker, second extension), sample-splitting
  *    k = 0..2^idLen-3 (k = 0 is the fundamental sequence), and
  *    uncompressed;
  *  - reference samples at each reference-sample-interval start (one
  *    scanline: rsi = ceil(pixelsPerScanline / pixelsPerBlock) blocks);
  *  - 8/16/32-bit samples, LSB or MSB storage order (the bitstream
  *    itself is always MSB-first).
  *
  * Out of scope, rejected loudly: sample counts that don't fill whole
  * blocks (the filter pads only when a chunk's element count isn't a
  * multiple of pixels-per-block — reject rather than guess the padding
  * convention), and bits-per-pixel below 4 (different ID geometry).
  *
  * The golden fixture (`golden_szip.h5`) is emitted by an INDEPENDENT
  * Python-stdlib encoder in tools/make_fixtures.py — both sides written
  * from the spec, sharing no code, asserting exact decoded values.
  */
object Szip {

  // szlib option-mask bits (public szlib.h constants)
  private val AllowK13 = 1
  private val Ec = 4
  private val Lsb = 8
  private val Msb = 16
  private val Nn = 32
  private val Raw = 128

  /** MSB-first bit reader over the compressed stream. */
  private final class BitReader(buf: Array[Byte], name: String) {
    private var bitPos = 0L
    private val nBits = buf.length.toLong * 8

    def bits(n: Int): Long = {
      require(bitPos + n <= nBits, s"dataset $name: truncated szip stream")
      var v = 0L
      var k = 0
      while (k < n) {
        val b = bitPos + k
        val bit = (buf((b >> 3).toInt) >> (7 - (b & 7)).toInt) & 1
        v = (v << 1) | bit
        k += 1
      }
      bitPos += n
      v
    }

    /** Fundamental-sequence codeword: count of 0s before the next 1. */
    def fs(): Int = {
      var z = 0
      while ({
        require(bitPos < nBits, s"dataset $name: truncated szip stream (FS)")
        val b = bitPos
        bitPos += 1
        ((buf((b >> 3).toInt) >> (7 - (b & 7)).toInt) & 1) == 0
      }) {
        z += 1
        require(z <= (1 << 16), s"dataset $name: runaway szip FS codeword — corrupt stream")
      }
      z
    }
  }

  /** Decode one H5Zszip-framed chunk: uint32 LE original byte count,
    * then the raw szip stream. Client words are the pipeline message's
    * [options mask, bits per pixel, pixels per block, pixels per
    * scanline]. Returns the chunk's raw bytes (LSB/MSB per the mask). */
  def decodeH5Chunk(name: String, comp: Array[Byte], options: Int,
      bitsPerPixel: Int, pixelsPerBlock: Int, pixelsPerScanline: Int): Array[Byte] = {
    require(comp.length >= 4, s"dataset $name: szip chunk shorter than its length prefix")
    val origLen = (comp(0) & 0xffL) | ((comp(1) & 0xffL) << 8) |
      ((comp(2) & 0xffL) << 16) | ((comp(3) & 0xffL) << 24)
    require((options & Raw) != 0,
      s"dataset $name: szip without SZ_RAW (header streams) unsupported")
    val preprocess = (options & Nn) != 0
    require(preprocess || (options & Ec) != 0,
      s"dataset $name: szip options mask $options selects neither NN nor EC")
    val msb = (options & Msb) != 0 && (options & Lsb) == 0
    val n = bitsPerPixel
    require(n >= 4 && n <= 32, s"dataset $name: szip bits-per-pixel $n out of the 4..32 scope")
    val bytesPerSample = if (n <= 8) 1 else if (n <= 16) 2 else 4
    require(origLen % bytesPerSample == 0,
      s"dataset $name: szip original size $origLen not a multiple of $bytesPerSample")
    val total = (origLen / bytesPerSample).toInt
    val blockSize = pixelsPerBlock
    require(blockSize > 0 && blockSize <= 64 && blockSize % 2 == 0,
      s"dataset $name: szip pixels-per-block $blockSize unsupported")
    require(pixelsPerScanline > 0,
      s"dataset $name: szip pixels-per-scanline $pixelsPerScanline invalid")
    val idLen = if (n > 16) 5 else if (n > 8) 4 else 3
    val idUncomp = (1 << idLen) - 1
    val xmax = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1

    val in = new BitReader(java.util.Arrays.copyOfRange(comp, 4, comp.length), name)
    val out = new Array[Long](total)
    var pos = 0
    while (pos < total) {
      // a scanline RETAINS min(ppsl, remaining) samples but ENCODES whole
      // blocks: szlib pads the last block of a short scanline (padded
      // samples are real coded samples — decoded, unmapped, discarded)
      val retained = math.min(pixelsPerScanline, total - pos)
      val nBlocks = (retained + blockSize - 1) / blockSize
      val seg = new Array[Long](nBlocks * blockSize)
      var b = 0
      var i = 0 // sample index within this RSI (padded coordinates)
      while (b < nBlocks) {
        val isRef = preprocess && b == 0
        val id = in.bits(idLen).toInt
        if (id == 0) {
          val sub = in.bits(1).toInt
          if (isRef) seg(i) = in.bits(n) // reference sample, raw
          if (sub == 0) {
            // zero-block run: FS count; raw 5 marks remainder-of-segment
            val raw = in.fs() + 1
            val zb =
              if (raw == 5) math.min(nBlocks - b, 64 - (b % 64))
              else if (raw > 5) raw - 1
              else raw
            require(b + zb <= nBlocks && 64 - (b % 64) >= zb,
              s"dataset $name: szip zero-block run $zb overruns its segment")
            val from = i + (if (isRef) 1 else 0)
            java.util.Arrays.fill(seg, from, i + zb * blockSize, 0L)
            i += zb * blockSize
            b += zb
          } else {
            // second extension: joint FS codes over sample pairs; a
            // reference block starts mid-pair (its first code carries
            // only the second element)
            var j = if (isRef) 1 else 0
            while (j < blockSize) {
              val m = in.fs()
              var q = 0
              while ((q + 1) * (q + 2) / 2 <= m) q += 1
              val d1 = m - q * (q + 1) / 2
              val d0 = q - d1
              if ((j & 1) == 0) {
                seg(i + j) = d0.toLong
                j += 1
                require(j < blockSize, s"dataset $name: szip SE pair overruns its block")
              }
              seg(i + j) = d1.toLong
              j += 1
            }
            i += blockSize
            b += 1
          }
        } else if (id == idUncomp) {
          // uncompressed: blockSize raw samples (a reference sample is
          // simply the first of them — no separate emission)
          var j = 0
          while (j < blockSize) { seg(i + j) = in.bits(n); j += 1 }
          i += blockSize
          b += 1
        } else {
          // sample splitting, k = id - 1 (k = 0: fundamental sequence):
          // all FS high parts first, then each sample's k low bits
          val k = id - 1
          if (isRef) seg(i) = in.bits(n)
          val count = blockSize - (if (isRef) 1 else 0)
          val base = i + (if (isRef) 1 else 0)
          var j = 0
          while (j < count) { seg(base + j) = in.fs().toLong << k; j += 1 }
          if (k > 0) {
            j = 0
            while (j < count) { seg(base + j) |= in.bits(k); j += 1 }
          }
          i += blockSize
          b += 1
        }
      }
      // NN unmap: reconstruct from the reference sample forward (over the
      // full padded segment — pads chain like any other sample)
      if (preprocess) {
        var pred = seg(0)
        var j = 1
        while (j < seg.length) {
          val d = seg(j)
          val theta = math.min(pred, xmax - pred)
          val x =
            if (d <= 2 * theta) {
              if ((d & 1) == 0) pred + d / 2 else pred - (d + 1) / 2
            } else if (theta == pred) pred + (d - theta) // nearer min: go up
            else pred - (d - theta) // nearer max: go down
          require(x >= 0 && x <= xmax,
            s"dataset $name: szip NN unmap out of range — corrupt stream")
          seg(j) = x
          pred = x
          j += 1
        }
      }
      System.arraycopy(seg, 0, out, pos, retained)
      pos += retained
    }

    // pack samples in the mask's storage order (HDF5 sets LSB for LE data)
    val bytes = new Array[Byte](origLen.toInt)
    var s = 0
    while (s < total) {
      val v = out(s)
      var k = 0
      while (k < bytesPerSample) {
        val shift = if (msb) 8 * (bytesPerSample - 1 - k) else 8 * k
        bytes(s * bytesPerSample + k) = ((v >> shift) & 0xff).toByte
        k += 1
      }
      s += 1
    }
    bytes
  }
}
