package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Blosc container decode vs frames assembled HERE per the public
  * c-blosc 1.x header spec, with the internal LZ4 streams produced by
  * lz4-java (the foreign reference compressor) — the builder below and
  * graft.sources.Blosc share no code. The Python-stdlib writer in
  * tools/make_blosc_fixtures.py is the second, cross-language
  * independence proof (ForeignFixturesSpec). */
class BloscSpec extends AnyFunSuite {

  private val comp = net.jpountz.lz4.LZ4Factory.safeInstance().fastCompressor()
  private val rng = new scala.util.Random(7)

  private def shuffleBytes(b: Array[Byte], t: Int): Array[Byte] = {
    val n = b.length
    val nElems = n / t
    val out = new Array[Byte](n)
    var bi = 0
    while (bi < t) {
      var i = 0
      while (i < nElems) { out(bi * nElems + i) = b(i * t + bi); i += 1 }
      bi += 1
    }
    var k = nElems * t
    while (k < n) { out(k) = b(k); k += 1 }
    out
  }

  /** Assemble one blosc1 frame the way c-blosc >= 1.14 does. */
  private def buildFrame(data: Array[Byte], typesize: Int, blocksize: Int,
      shuffle: Boolean, memcpy: Boolean = false): Array[Byte] = {
    val nbytes = data.length
    if (memcpy) {
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte).put(0x2.toByte).put(typesize.toByte)
      out.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      out.put(data)
      return out.array()
    }
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val leftover = nbytes % blocksize
    val split = typesize <= 16 && typesize > 1 && blocksize / typesize >= 128
    var flags = 1 << 5 // lz4
    if (shuffle && typesize > 1) flags |= 0x1
    if (!split) flags |= 0x10
    val blockBytes = (0 until nblocks).map { j =>
      val leftoverBlock = j == nblocks - 1 && leftover != 0
      val bsize = if (leftoverBlock) leftover else blocksize
      val block0 = java.util.Arrays.copyOfRange(data, j * blocksize, j * blocksize + bsize)
      val block = if (shuffle && typesize > 1) shuffleBytes(block0, typesize) else block0
      val nstreams = if (split && !leftoverBlock) typesize else 1
      val neblock = bsize / nstreams
      val bos = new java.io.ByteArrayOutputStream()
      (0 until nstreams).foreach { s =>
        val sub = java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock)
        val max = comp.maxCompressedLength(neblock)
        val cbuf = new Array[Byte](max)
        val clen = comp.compress(sub, 0, neblock, cbuf, 0, max)
        val (len, payload) =
          if (clen >= neblock) (neblock, sub) // raw store, like c-blosc
          else (clen, java.util.Arrays.copyOf(cbuf, clen))
        val lenB = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(len)
        bos.write(lenB.array()); bos.write(payload)
      }
      bos.toByteArray
    }
    val bstartsBase = 16 + 4 * nblocks
    val offsets = blockBytes.scanLeft(bstartsBase)((acc, b) => acc + b.length)
    val total = offsets.last
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    out.putInt(nbytes).putInt(blocksize).putInt(total)
    offsets.init.foreach(out.putInt)
    blockBytes.foreach(out.put)
    out.array()
  }

  private def doublesLE(vs: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble)
    bb.array()
  }

  test("memcpyed frame round-trips") {
    val data = ("raw payload " * 10).getBytes("UTF-8")
    assert(Blosc.decompress(buildFrame(data, 1, 256, shuffle = false,
      memcpy = true)).sameElements(data))
  }

  test("split + byte-shuffle frame (f8, the zarr-python default shape)") {
    // typesize 8, blocksize 2048 (>= 128*8), 3.5 blocks -> leftover block
    val vs = Array.tabulate(896)(i => math.sin(i / 10.0) * 100)
    val data = doublesLE(vs)
    assert(data.length == 7168)
    val frame = buildFrame(data, 8, 2048, shuffle = true)
    // split path taken: compressed frame must actually be smaller
    assert(frame.length < data.length, "shuffled doubles should compress")
    assert(Blosc.decompress(frame).sameElements(data))
  }

  test("non-split frame (typesize 32 > MAX_SPLITS)") {
    val data = new Array[Byte](4096)
    (0 until 4096).foreach(i => data(i) = (i % 97).toByte)
    val frame = buildFrame(data, 32, 1024, shuffle = true)
    assert((frame(2) & 0x10) != 0, "dont_split bit must be set")
    assert(Blosc.decompress(frame).sameElements(data))
  }

  test("incompressible streams store raw (csize == neblock)") {
    val data = new Array[Byte](2048)
    rng.nextBytes(data)
    val frame = buildFrame(data, 4, 1024, shuffle = false)
    assert(Blosc.decompress(frame).sameElements(data))
  }

  test("single short block, noshuffle") {
    val data = "tiny".getBytes("UTF-8")
    assert(Blosc.decompress(buildFrame(data, 1, 1024,
      shuffle = false)).sameElements(data))
  }

  test("production compress round-trips through the from-scratch decoder") {
    // Blosc.compress (lz4-java streams + container writer) and
    // Blosc.decompress (from-scratch container + Lz4 block decoder)
    // share no framing code
    val cases = Seq(
      ("doubles split", doublesLE(Array.tabulate(2048)(i => (i % 37) * 0.5)), 8, 2048, true),
      ("doubles leftover", doublesLE(Array.tabulate(300)(_ * 1.25)), 8, 2048, true),
      ("shorts non-split", Array.tabulate(200)(i => (i % 11).toByte), 2, 64, true),
      ("noshuffle", ("blosc " * 500).getBytes("UTF-8"), 1, 1024, false),
      ("incompressible", { val a = new Array[Byte](777); rng.nextBytes(a); a }, 8, 256, true),
      ("empty", Array.emptyByteArray, 8, 256, true))
    cases.foreach { case (name, data, t, bs, sh) =>
      val frame = Blosc.compress(data, t, bs, sh)
      assert(Blosc.decompress(frame).sameElements(data), name)
    }
  }

  test("corruption sweep: seeded mutations fail loudly, never an Error") {
    val base = Blosc.compress(doublesLE(Array.tabulate(1024)(i => (i % 53) * 0.5)),
      8, 2048)
    val mrng = new scala.util.Random(99)
    var rejects = 0
    for (_ <- 0 until 200) {
      val mutated =
        if (mrng.nextBoolean()) java.util.Arrays.copyOf(base, 1 + mrng.nextInt(base.length))
        else {
          val m = base.clone()
          val at = mrng.nextInt(m.length)
          m(at) = (m(at) ^ (1 << mrng.nextInt(8))).toByte
          m
        }
      try { Blosc.decompress(mutated); () }
      catch {
        case _: Exception => rejects += 1
        case e: Error => fail(s"corruption escalated to ${e.getClass}: $e")
      }
    }
    assert(rejects > 80, s"only $rejects/200 mutations rejected")
  }

  test("unsupported codec / bitshuffle / truncation reject loudly") {
    val ok = buildFrame(doublesLE(Array.tabulate(512)(_.toDouble)), 8, 2048,
      shuffle = true)
    // rewrite codec bits to zstd (4)
    val zstd = ok.clone()
    zstd(2) = ((zstd(2) & 0x1f) | (4 << 5)).toByte
    val e1 = intercept[IllegalArgumentException] { Blosc.decompress(zstd) }
    assert(e1.getMessage.contains("zstd"))
    // bitshuffle flag
    val bit = ok.clone()
    bit(2) = (bit(2) | 0x4).toByte
    val e2 = intercept[IllegalArgumentException] { Blosc.decompress(bit) }
    assert(e2.getMessage.contains("bit-shuffle"))
    // truncated frame
    val e3 = intercept[IllegalArgumentException] {
      Blosc.decompress(java.util.Arrays.copyOf(ok, ok.length - 10))
    }
    assert(e3.getMessage.nonEmpty)
    // header shorter than 16 bytes
    val e4 = intercept[IllegalArgumentException] {
      Blosc.decompress(Array[Byte](2, 1, 0))
    }
    assert(e4.getMessage.contains("header"))
  }
}
