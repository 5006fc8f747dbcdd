package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch LZ4 decoder vs lz4-java (net.jpountz, the JVM reference
  * implementation that ships with Spark) as the FOREIGN compressor —
  * the two share no code. pyarrow's C-level frames are additionally
  * proven in ArrowIpcSpec via the compressed-batch fixture. */
class Lz4Spec extends AnyFunSuite {

  private val factory = net.jpountz.lz4.LZ4Factory.safeInstance()
  private val rng = new scala.util.Random(42)

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array[Byte](7),
    "all zero (max RLE)" -> new Array[Byte](100000),
    "repetitive text" -> ("the quick brown fox " * 3000).getBytes("UTF-8"),
    "random (incompressible)" -> {
      val a = new Array[Byte](65536); rng.nextBytes(a); a
    },
    "mixed" -> {
      val a = new Array[Byte](200000)
      rng.nextBytes(a)
      java.util.Arrays.fill(a, 50000, 150000, 0x41.toByte)
      a
    },
    "short overlap-heavy" -> "abababababababababababab".getBytes("UTF-8"))

  test("block format: lz4-java compressed bytes decode exactly") {
    val comp = factory.fastCompressor()
    payloads.foreach { case (name, data) =>
      val max = comp.maxCompressedLength(data.length)
      val out = new Array[Byte](max)
      val clen = comp.compress(data, 0, data.length, out, 0, max)
      val back = Lz4.decompressBlock(out, 0, clen, data.length)
      assert(back.sameElements(data), name)
    }
    // high-compression variant emits different sequences; decode must agree
    val hc = factory.highCompressor()
    payloads.foreach { case (name, data) =>
      val max = hc.maxCompressedLength(data.length)
      val out = new Array[Byte](max)
      val clen = hc.compress(data, 0, data.length, out, 0, max)
      val back = Lz4.decompressBlock(out, 0, clen, data.length)
      assert(back.sameElements(data), s"hc $name")
    }
  }

  test("frame format: lz4-java frames decode exactly (all block sizes)") {
    import net.jpountz.lz4.LZ4FrameOutputStream
    import net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE
    for {
      (name, data) <- payloads
      bs <- Seq(BLOCKSIZE.SIZE_64KB, BLOCKSIZE.SIZE_4MB)
    } {
      val bos = new java.io.ByteArrayOutputStream()
      val fs = new LZ4FrameOutputStream(bos, bs, data.length.toLong,
        LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
        LZ4FrameOutputStream.FLG.Bits.CONTENT_SIZE)
      fs.write(data); fs.close()
      val back = Lz4.decompressFrame(bos.toByteArray)
      assert(back.sameElements(data), s"$name @ $bs")
      // without content size in the header (size-unknown path)
      val bos2 = new java.io.ByteArrayOutputStream()
      val fs2 = new LZ4FrameOutputStream(bos2, bs)
      fs2.write(data); fs2.close()
      assert(Lz4.decompressFrame(bos2.toByteArray).sameElements(data),
        s"$name @ $bs, no content size")
    }
  }

  test("malformed inputs reject loudly") {
    // bad magic
    val e1 = intercept[IllegalArgumentException] {
      Lz4.decompressFrame(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    assert(e1.getMessage.contains("magic"))
    // block: offset 0
    val e2 = intercept[IllegalArgumentException] {
      Lz4.decompressBlock(Array[Byte](0x12, 0x41, 0x00, 0x00, 0x10, 0x41), 0, 6, 20)
    }
    assert(e2.getMessage.contains("offset 0") ||
      e2.getMessage.contains("invalid"))
    // block: match offset before output start
    val e3 = intercept[IllegalArgumentException] {
      // 1 literal 'A', then match at offset 5 with only 1 byte produced
      Lz4.decompressBlock(Array[Byte](0x12, 0x41, 0x05, 0x00, 0x10, 0x42), 0, 6, 20)
    }
    assert(e3.getMessage.contains("before output start"))
    // block: declared size mismatch
    val comp = factory.fastCompressor()
    val data = "hello world hello world".getBytes
    val out = new Array[Byte](comp.maxCompressedLength(data.length))
    val clen = comp.compress(data, 0, data.length, out, 0, out.length)
    val e4 = intercept[IllegalArgumentException] {
      Lz4.decompressBlock(out, 0, clen, data.length + 3)
    }
    assert(e4.getMessage.contains("declared"))
    // frame: truncated mid-block
    val bos = new java.io.ByteArrayOutputStream()
    val fs = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    fs.write(("abc" * 1000).getBytes); fs.close()
    val whole = bos.toByteArray
    val e5 = intercept[IllegalArgumentException] {
      Lz4.decompressFrame(whole, 0, whole.length - 6)
    }
    assert(e5.getMessage.contains("truncated") ||
      e5.getMessage.contains("past input"))
  }

  test("block-LINKED frame from pyarrow's lz4frame decodes (matches cross " +
      "the 64KB block boundary)") {
    // tools/make_arrow_fixtures.py wrote this with pa.Codec("lz4") —
    // Arrow C++ zero-inits LZ4F preferences, so the frame is
    // block-LINKED with 64KB blocks (verified structurally by the
    // generator); content = the same formula as below. The round-12
    // decoder failed here with "match offset reaches before output
    // start" because it decoded each block into a fresh buffer.
    val f = new java.io.File("src/test/resources/fixtures/lz4_linked.frame")
    assert(f.isFile, "fixture missing — run tools/make_arrow_fixtures.py")
    val frame = java.nio.file.Files.readAllBytes(f.toPath)
    val expect = (0 until 12000).map(i =>
      f"block$i%06d-the-quick-brown-fox|").mkString.getBytes("UTF-8")
    assert(expect.length > 5 * 65536) // spans many 64KB blocks
    val back = Lz4.decompressFrame(frame)
    assert(back.sameElements(expect))
  }

  test("match-length extension over 2^31 rejects loudly (Int overflow " +
      "cannot move the write cursor backwards)") {
    // one literal 'A', a match at offset 1, then ~8.5M 0xFF extension
    // bytes: an Int accumulator wraps negative, skips the bounds
    // check, and corrupts output silently; the Long accumulator must
    // reject against the output capacity instead.
    val ext = 8500000
    val src = new Array[Byte](5 + ext + 1)
    src(0) = 0x1f // litLen 1, matchLen 15(+ext)
    src(1) = 'A'
    src(2) = 1; src(3) = 0 // offset 1
    java.util.Arrays.fill(src, 4, 4 + ext, 0xff.toByte)
    src(4 + ext) = 0x00 // final extension byte
    val e = intercept[IllegalArgumentException] {
      Lz4.decompressBlock(src, 0, src.length, 1 << 20)
    }
    assert(e.getMessage.contains("past output capacity"))
    // same shape on the literal side: huge literal length rejects
    // against the INPUT end, loudly
    val lit = new Array[Byte](1 + ext + 1)
    lit(0) = 0xf0.toByte
    java.util.Arrays.fill(lit, 1, 1 + ext, 0xff.toByte)
    lit(ext + 1) = 0x00
    val e2 = intercept[IllegalArgumentException] {
      Lz4.decompressBlock(lit, 0, lit.length, 1 << 20)
    }
    assert(e2.getMessage.contains("past input end") ||
      e2.getMessage.contains("past output capacity"))
  }

  test("linked vs independent history floors: an offset reaching into " +
      "the previous block decodes linked, rejects independent") {
    // hand-assembled 2-block frames sharing the same payload: block 1
    // holds 8 literals, block 2 is one sequence with 0 literals and a
    // match at offset 8 — legal only with cross-block history
    def frame(flg: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >>> (8 * i)) & 0xff))
      le32(0x184d2204)
      bos.write(flg); bos.write(0x40) // BD: 64KB block max
      bos.write(0) // header checksum (not verified)
      val b1 = "ABCDEFGH".getBytes("UTF-8")
      le32(0x80000000 | b1.length) // uncompressed block
      bos.write(b1)
      // compressed block: token litLen=0 matchLen=4+4=8, offset 8
      val b2 = Array[Byte](0x04, 0x08, 0x00)
      le32(b2.length)
      bos.write(b2)
      le32(0) // end mark
      bos.toByteArray
    }
    // FLG 0x40: version 01, linked (bit5 clear) -> decodes
    val linked = Lz4.decompressFrame(frame(0x40))
    assert(new String(linked, "UTF-8") == "ABCDEFGH" + "ABCDEFGH")
    // FLG 0x60: block-independent -> the same offset is illegal
    val e = intercept[IllegalArgumentException] {
      Lz4.decompressFrame(frame(0x60))
    }
    assert(e.getMessage.contains("before output start"))
  }
}
