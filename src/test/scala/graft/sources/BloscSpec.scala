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

  test("unsupported codec / conflicting filters / truncation reject loudly") {
    val ok = buildFrame(doublesLE(Array.tabulate(512)(_.toDouble)), 8, 2048,
      shuffle = true)
    // rewrite codec bits to snappy (2) -> named reject
    val snappy = ok.clone()
    snappy(2) = ((snappy(2) & 0x1f) | (2 << 5)).toByte
    val e1 = intercept[IllegalArgumentException] { Blosc.decompress(snappy) }
    assert(e1.getMessage.contains("snappy"))
    // byte-shuffle AND bit-shuffle flags both set is nonsense
    val bit = ok.clone()
    bit(2) = (bit(2) | 0x4).toByte
    val e2 = intercept[IllegalArgumentException] { Blosc.decompress(bit) }
    assert(e2.getMessage.contains("both set"))
    // codec bits flipped to zstd over an LZ4 stream -> loud zstd reject
    val zs = ok.clone()
    zs(2) = ((zs(2) & 0x1f.toByte) | (4 << 5) | 0x1).toByte
    val e5 = intercept[IllegalArgumentException] { Blosc.decompress(zs) }
    assert(e5.getMessage.contains("zstd"))
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

  // ---- bitshuffle (round 13) --------------------------------------------

  test("bitshuffle: hand-derived bit-plane vectors (LSB plane first)") {
    // typesize 1, pattern 0x81 0x42 0x24 0x18 x4: plane k collects bit
    // k of each element, planes of 16 bits = 2 bytes. Derived by hand
    // from the bit-plane semantics (bit 0 of elements 0,4,8,12 set ->
    // plane 0 = 0x11 0x11, etc.), independently of both transliterations.
    val in1 = Array.fill(4)(Array[Byte](0x81.toByte, 0x42, 0x24, 0x18)).flatten
    assert(Blosc.bitShuffle(in1, 1).map(_ & 0xff).toSeq ==
      Seq(0x11, 0x11, 0x22, 0x22, 0x44, 0x44, 0x88, 0x88,
        0x88, 0x88, 0x44, 0x44, 0x22, 0x22, 0x11, 0x11))
    // typesize 2, bytes 0..15: byte-plane 0 = even bytes, plane 1 = odd
    val in2 = Array.tabulate(16)(_.toByte)
    assert(Blosc.bitShuffle(in2, 2).map(_ & 0xff).toSeq ==
      Seq(0, 170, 204, 240, 0, 0, 0, 0, 255, 170, 204, 240, 0, 0, 0, 0))
  }

  test("bitshuffle: inverse round-trips every (typesize, length) shape") {
    for {
      ts <- Seq(1, 2, 4, 8, 3)
      nElems <- Seq(8, 16, 64, 19, 7) // 19, 7: raw-tail convention
    } {
      val data = new Array[Byte](ts * nElems)
      rng.nextBytes(data)
      val f = Blosc.bitShuffle(data, ts)
      assert(Blosc.bitUnshuffle(f, ts).sameElements(data), s"ts=$ts n=$nElems")
      // trailing (< 8 elements) bytes stay raw under the c-blosc
      // size -= size % 8 convention
      val kept = (nElems - nElems % 8) * ts
      assert(f.drop(kept).sameElements(data.drop(kept)), s"tail ts=$ts n=$nElems")
    }
  }

  test("zstd codec + bitshuffle frames round-trip through compress/decompress") {
    val vals = doublesLE(Array.tabulate(512)(i => i * 0.25 - 8.0))
    for {
      codec <- Seq("lz4", "zstd")
      (sh, bsh) <- Seq((true, false), (false, false), (false, true))
    } {
      val frame = Blosc.compress(vals, typesize = 8, blocksize = 1024,
        shuffle = sh, bitshuffle = bsh, codec = codec)
      assert(Blosc.decompress(frame).sameElements(vals), s"$codec sh=$sh bsh=$bsh")
    }
    // leftover block + raw tail: 77 i4 elements, blocksize 160 (40/block)
    val odd = {
      val bb = ByteBuffer.allocate(77 * 4).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 77).foreach(i => bb.putInt(i * 7 - 100))
      bb.array()
    }
    val f2 = Blosc.compress(odd, typesize = 4, blocksize = 160,
      shuffle = false, bitshuffle = true, codec = "zstd")
    assert(Blosc.decompress(f2).sameElements(odd))
  }

  test("zstd frames past lz4's 300x expansion ceiling decode (constant " +
      "chunks); the corrupt-frame cap still fires, just codec-aware") {
    // a zero/fill-valued zarr chunk: zstd routinely exceeds 300x here,
    // so the old lz4-derived ratio cap rejected VALID frames
    val zeros = new Array[Byte](1 << 20)
    val frame = Blosc.compress(zeros, typesize = 8, blocksize = 1 << 17,
      shuffle = false, bitshuffle = false, codec = "zstd")
    assert(zeros.length.toLong > 300L * frame.length,
      s"fixture not extreme enough to pin the fix (${frame.length} B frame)")
    assert(Blosc.decompress(frame).sameElements(zeros))
    // a header lying past zstd's own format ceiling (~40000x) still
    // rejects BEFORE allocating the declared nbytes
    val lying = frame.clone()
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, Int.MaxValue)
    val e = intercept[IllegalArgumentException](Blosc.decompress(lying))
    assert(e.getMessage.contains("absurd"))
    // lz4 keeps the tight 300x cap: same lie on an lz4 frame, lower bar
    val lz4Frame = Blosc.compress(zeros.take(4096), typesize = 8,
      blocksize = 1024, shuffle = false, bitshuffle = false, codec = "lz4")
    val lying4 = lz4Frame.clone()
    ByteBuffer.wrap(lying4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 400 * lz4Frame.length)
    val e4 = intercept[IllegalArgumentException](Blosc.decompress(lying4))
    assert(e4.getMessage.contains("absurd"))
  }
}
