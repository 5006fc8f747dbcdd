package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Seeded corruption sweeps for the tensor-interchange pair: mutated
  * files (truncations + byte flips across header AND payload regions)
  * must fail loudly with an Exception — never an Error (a lying length
  * or offset must not trigger a giant allocation) and never a hang.
  * Flips inside raw payload bytes can legitimately decode (both
  * formats carry no payload checksum); the assertions are on the
  * headers' reject rate and the no-Error invariant. */
class NpySafetensorsFuzzSpec extends AnyFunSuite {

  private def writeGoldenSt(dir: java.nio.file.Path): java.nio.file.Path = {
    val p = dir.resolve("g.safetensors")
    val header =
      """{"a":{"dtype":"F32","shape":[2,3],"data_offsets":[0,24]},
        |"b":{"dtype":"F32","shape":[4],"data_offsets":[24,40]}}""".stripMargin
        .replace("\n", "")
    val hb = header.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    val lb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(hb.length.toLong)
    out.write(lb.array()); out.write(hb)
    val data = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 10).foreach(i => data.putFloat(i * 0.5f))
    out.write(data.array())
    java.nio.file.Files.write(p, out.toByteArray)
    p
  }

  private def writeGoldenNpy(dir: java.nio.file.Path): java.nio.file.Path = {
    // minimal v1.0 .npy: magic, header dict, f8 C-order payload
    val p = dir.resolve("g.npy")
    val dict = "{'descr': '<f8', 'fortran_order': False, 'shape': (3, 2), }"
    val padLen = (10 + dict.length + 1 + 63) / 64 * 64 - 10
    val header = dict + (" " * (padLen - dict.length - 1)) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
    val hl = java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(header.length.toShort)
    out.write(hl.array()); out.write(header.getBytes("ASCII"))
    val data = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(i => data.putDouble(i * 1.25))
    out.write(data.array())
    java.nio.file.Files.write(p, out.toByteArray)
    p
  }

  test("safetensors corruption sweep fails loudly, never an Error") {
    val dir = java.nio.file.Files.createTempDirectory("st-fuzz")
    val golden = writeGoldenSt(dir)
    assert(Safetensors.decode(golden.toString).keySet == Set("a", "b"))
    val orig = java.nio.file.Files.readAllBytes(golden)
    val rng = new scala.util.Random(31)
    var rejects = 0
    for (k <- 0 until 150) {
      val mutated =
        if (rng.nextBoolean()) java.util.Arrays.copyOf(orig, 1 + rng.nextInt(orig.length - 1))
        else {
          val m = orig.clone()
          val at = rng.nextInt(m.length)
          m(at) = (m(at) ^ (1 << rng.nextInt(8))).toByte
          m
        }
      val p = dir.resolve(s"m$k.safetensors")
      java.nio.file.Files.write(p, mutated)
      try { Safetensors.decode(p.toString); () }
      catch {
        case _: Exception => rejects += 1
        case e: Error => fail(s"corruption escalated to ${e.getClass}: $e")
      }
    }
    assert(rejects > 60, s"only $rejects/150 mutations rejected")
  }

  test("npy corruption sweep fails loudly, never an Error") {
    val dir = java.nio.file.Files.createTempDirectory("npy-fuzz")
    val golden = writeGoldenNpy(dir)
    val rng = new scala.util.Random(47)
    val orig = java.nio.file.Files.readAllBytes(golden)
    var rejects = 0
    for (k <- 0 until 150) {
      val mutated =
        if (rng.nextBoolean()) java.util.Arrays.copyOf(orig, 1 + rng.nextInt(orig.length - 1))
        else {
          val m = orig.clone()
          val at = rng.nextInt(m.length)
          m(at) = (m(at) ^ (1 << rng.nextInt(8))).toByte
          m
        }
      val p = dir.resolve(s"m$k.npy")
      java.nio.file.Files.write(p, mutated)
      try {
        val in = ByteStore.open(p.toString)
        try Npy.readMeta(in) finally in.close()
        ()
      } catch {
        case _: Exception => rejects += 1
        case e: Error => fail(s"corruption escalated to ${e.getClass}: $e")
      }
    }
    assert(rejects > 40, s"only $rejects/150 mutations rejected")
  }
}
