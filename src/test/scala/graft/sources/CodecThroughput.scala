package graft.sources

/** One-shot single-thread codec throughput measurement backing the
  * SCALE.md round-12 note (`sbt "Test/runMain graft.sources.CodecThroughput"`).
  * The decode paths here run once per chunk executor-side with no shared
  * state, so per-core MB/s × cores is the ingest ceiling the codec layer
  * imposes; the numbers recorded in SCALE.md came from this harness on
  * the build host. */
object CodecThroughput {

  private def time[A](reps: Int)(f: => A): Double = {
    f // warmup
    val t0 = System.nanoTime()
    (0 until reps).foreach(_ => f)
    (System.nanoTime() - t0) / 1e9 / reps
  }

  def main(args: Array[String]): Unit = {
    val mb = 64
    val n = mb * 1024 * 1024 / 8
    // QUANTIZED doubles — the decoded-satellite-product shape (physical
    // fields stored at fixed precision): few distinct mantissas, so
    // shuffle + LZ4 bite. The full-entropy contrast is reported too.
    val data = new Array[Byte](n * 8)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i =>
      bb.putDouble(math.rint(math.sin(i / 100.0) * 500) / 4.0))
    val hard = new Array[Byte](n * 8)
    val hb = java.nio.ByteBuffer.wrap(hard).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => hb.putDouble(math.sin(i / 100.0) * 1000))
    val hardFrame = Blosc.compress(hard, 8, 256 * 1024)
    val tHardD = time(3)(Blosc.decompress(hardFrame))

    val bloscFrame = Blosc.compress(data, 8, 256 * 1024)
    val tBloscC = time(3)(Blosc.compress(data, 8, 256 * 1024))
    val tBloscD = time(3)(Blosc.decompress(bloscFrame))

    val lzBos = new java.io.ByteArrayOutputStream()
    val lzFs = new net.jpountz.lz4.LZ4FrameOutputStream(lzBos,
      net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_4MB, data.length.toLong,
      net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
      net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.CONTENT_SIZE)
    lzFs.write(data); lzFs.close()
    val lzFrame = lzBos.toByteArray
    val tLz4D = time(3)(Lz4.decompressFrame(lzFrame))

    val zFrame = com.github.luben.zstd.Zstd.compress(data, 3)
    val tZstdD = time(3)(Zarr.zstdInflate(zFrame))

    def gz(bytes: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val gzFrame = gz(data)
    val tGzD = time(3) {
      val inf = new java.util.zip.Inflater()
      inf.setInput(gzFrame)
      val out = new java.io.ByteArrayOutputStream(data.length)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
      inf.end(); out.toByteArray
    }

    // scale-offset D-scale (the HDF5 sink's lossy-at-D-decimals mode):
    // the quantized payload is 0.25-quantized, exact at D=2
    val soFrame = HDF5.soEncodeF64(data, 2)
    val tSoC = time(3)(HDF5.soEncodeF64(data, 2))
    val soFilters = Seq(HDF5.H5Filter(6, Seq(0, 2, n, 1, 8, 0, 0, 0, 0, 0)))
    val tSoD = time(3)(HDF5.defilter("so", soFrame, soFilters, 8, signedInt = true))
    val soGzFrame = gz(soFrame)
    // on CONTINUOUS (mantissa-dense) floats — where lossless codecs get
    // ~1x — D-scale is the only lever: 64 bits -> minbits at D decimals
    val soHard = HDF5.soEncodeF64(hard, 2)
    val soHardGz = gz(soHard)
    val hardGz = gz(hard)

    // round 13: blosc inner-zstd and the bitshuffle filter — the
    // zarr-python cname=zstd / shuffle=2 tunings — plus the raw
    // bit-transpose cost in isolation
    val zsFrame = Blosc.compress(data, 8, 256 * 1024, codec = "zstd")
    val tZsC = time(3)(Blosc.compress(data, 8, 256 * 1024, codec = "zstd"))
    val tZsD = time(3)(Blosc.decompress(zsFrame))
    val zbFrame = Blosc.compress(data, 8, 256 * 1024,
      shuffle = false, bitshuffle = true, codec = "zstd")
    val tZbD = time(3)(Blosc.decompress(zbFrame))
    val lbFrame = Blosc.compress(data, 8, 256 * 1024,
      shuffle = false, bitshuffle = true, codec = "lz4")
    val tLbD = time(3)(Blosc.decompress(lbFrame))
    val tBitF = time(3)(Blosc.bitShuffle(data, 8))
    val bitData = Blosc.bitShuffle(data, 8)
    val tBitI = time(3)(Blosc.bitUnshuffle(bitData, 8))

    def mbs(t: Double) = f"${mb / t}%.0f MB/s"
    println(f"payload: $mb MB smooth doubles")
    println(f"blosc(zstd,shuffle) compress ${mbs(tZsC)}  ratio ${data.length.toDouble / zsFrame.length}%.1fx")
    println(f"blosc(zstd,shuffle) decomp   ${mbs(tZsD)}")
    println(f"blosc(zstd,bitshuf) decomp   ${mbs(tZbD)}  ratio ${data.length.toDouble / zbFrame.length}%.1fx")
    println(f"blosc(lz4,bitshuf) decomp    ${mbs(tLbD)}  ratio ${data.length.toDouble / lbFrame.length}%.1fx")
    println(f"bitshuffle transform alone   fwd ${mbs(tBitF)} / inv ${mbs(tBitI)}")
    println(f"scale-offset(D=2) encode     ${mbs(tSoC)}  ratio ${data.length.toDouble / soFrame.length}%.1fx")
    println(f"scale-offset(D=2) decode     ${mbs(tSoD)}")
    println(f"scale-offset + deflate       ratio ${data.length.toDouble / soGzFrame.length}%.1fx")
    println(f"CONTINUOUS: deflate alone    ratio ${hard.length.toDouble / hardGz.length}%.1fx")
    println(f"CONTINUOUS: so(D=2)          ratio ${hard.length.toDouble / soHard.length}%.1fx (lossy 2dp)")
    println(f"CONTINUOUS: so(D=2)+deflate  ratio ${hard.length.toDouble / soHardGz.length}%.1fx (lossy 2dp)")
    println(f"blosc(lz4,shuffle) compress  ${mbs(tBloscC)}  ratio ${data.length.toDouble / bloscFrame.length}%.1fx")
    println(f"blosc(lz4,shuffle) decomp    ${mbs(tBloscD)}")
    println(f"blosc full-entropy decomp    ${mbs(tHardD)}  ratio ${hard.length.toDouble / hardFrame.length}%.1fx")
    println(f"lz4-frame decomp (from-scratch decoder) ${mbs(tLz4D)}  ratio ${data.length.toDouble / lzFrame.length}%.1fx")
    println(f"zstd decomp (zstd-jni)       ${mbs(tZstdD)}  ratio ${data.length.toDouble / zFrame.length}%.1fx")
    println(f"zlib decomp (contrast)       ${mbs(tGzD)}  ratio ${data.length.toDouble / gzFrame.length}%.1fx")
  }
}
