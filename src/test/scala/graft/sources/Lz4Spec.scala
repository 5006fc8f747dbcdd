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
}
