package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** .npy and safetensors codecs: foreign-fixture exact decode, Spark
  * shard round-trips, the chunk-parallel consolidated read, and loud
  * rejects for the unsupported surface. */
class NpySafetensorsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String = {
    val f = new java.io.File(s"src/test/resources/fixtures/$name")
    require(f.isFile || f.getParentFile.isDirectory,
      s"fixture $name missing — run tools/make_fixtures.py")
    f.getAbsolutePath
  }

  test("npy foreign fixture pair decodes exactly (incl. f4 rounding, -0.0)") {
    val dir = java.nio.file.Files.createTempDirectory("npy-foreign")
    Seq("ids", "vec").foreach { k =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixture(s"golden.$k.npy")),
        dir.resolve(s"part-00000.$k.npy"))
    }
    val got = Npy.read(spark, dir.toString)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val want = Seq(
      (-3L, Seq(3.0f, -0.5f, 0.75f)),
      (0L, Seq(0.0f, -0.0f, 42.0f)),
      (7L, Seq(1.5f, -2.25f, 0.125f)),
      (123456789012345L, Seq(0.1f, -1e30f, 2.5f)))
    assert(got.map(r => (r._1, r._2.toSeq)).toSeq === want)
    // -0.0 preserved bit-for-bit
    val z = got.find(_._1 == 0L).get._2
    assert(java.lang.Float.floatToIntBits(z(1)) ===
      java.lang.Float.floatToIntBits(-0.0f))
  }

  test("safetensors foreign fixture decodes exactly; __metadata__ skipped") {
    val m = Safetensors.decode(fixture("golden.safetensors"))
    assert(m.keySet === Set("ids", "emb"))
    val (im, ib) = m("ids")
    assert(im.dtype === "I64" && im.shape === Seq(3L))
    val ibb = java.nio.ByteBuffer.wrap(ib)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((0 until 3).map(i => ibb.getLong(i * 8)) ===
      Seq(11L, -5L, 1L << 50))
    val (vm, vb) = m("emb")
    assert(vm.dtype === "F32" && vm.shape === Seq(3L, 2L))
    val vbb = java.nio.ByteBuffer.wrap(vb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((0 until 6).map(i => vbb.getFloat(i * 4)) ===
      Seq(0.5f, -1.25f, 3.5f, 0.1f, -0.0f, 1e30f))
  }

  test("npy Spark shard round-trip across partitions") {
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(6)(j => (i * 7 + j).toFloat / 4.0f)))
    val dir = java.nio.file.Files.createTempDirectory("npy-rt").toString
    Npy.write(rows.toDF("vec_id", "embedding").repartition(3), dir,
      "vec_id", "embedding", dim = 6)
    val back = Npy.read(spark, dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(back.map(r => (r._1, r._2.toSeq)).toSeq ===
      rows.map(r => (r._1, r._2.toSeq)))
  }

  test("safetensors Spark shard round-trip across partitions") {
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(6)(j => (i * 13 + j).toFloat / 8.0f)))
    val dir = java.nio.file.Files.createTempDirectory("st-rt").toString
    Safetensors.write(rows.toDF("vec_id", "embedding").repartition(3), dir,
      "vec_id", "embedding", dim = 6)
    val back = Safetensors.read(spark, dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(back.map(r => (r._1, r._2.toSeq)).toSeq ===
      rows.map(r => (r._1, r._2.toSeq)))
  }

  test("npy readRows: closed-form row ranges reassemble the full array") {
    val dir = java.nio.file.Files.createTempDirectory("npy-rows")
    val path = dir.resolve("big.npy").toString
    val (n, dim) = (333, 5)
    val out = new java.io.FileOutputStream(path)
    out.write(Npy.header("<f4", Seq(n.toLong, dim.toLong)))
    val bb = java.nio.ByteBuffer.allocate(4 * n * dim)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n * dim).foreach(i => bb.putFloat(i * 0.5f))
    out.write(bb.array()); out.close()
    val got = Npy.readRows(spark, path, rowsPerTask = 50)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(got.length === n)
    got.foreach { case (r, v) =>
      assert(v.toSeq === (0 until dim).map(j => (r * dim + j) * 0.5f), s"row $r")
    }
  }

  test("unsupported npy surfaces reject loudly") {
    val dir = java.nio.file.Files.createTempDirectory("npy-bad")
    def writeRaw(name: String, descr: String, fortran: String): String = {
      val p = dir.resolve(name).toString
      val d = s"{'descr': '$descr', 'fortran_order': $fortran, 'shape': (2,), }"
      val full = d + "\n"
      val out = new java.io.FileOutputStream(p)
      out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      out.write(Array[Byte]((full.length & 0xFF).toByte, (full.length >> 8).toByte))
      out.write(full.getBytes("ASCII"))
      out.write(new Array[Byte](16)); out.close()
      p
    }
    val be = writeRaw("be.npy", ">f4", "False")
    val e1 = intercept[Exception] {
      val in = ByteStore.open(be)
      try Npy.readMeta(in) finally in.close()
    }
    assert(e1.getMessage.contains("unsupported descr"))
    val ft = writeRaw("ft.npy", "<f4", "True")
    val e2 = intercept[Exception] {
      val in = ByteStore.open(ft)
      try Npy.readMeta(in) finally in.close()
    }
    assert(e2.getMessage.contains("fortran"))
  }

  test("safetensors offset lies reject loudly") {
    val dir = java.nio.file.Files.createTempDirectory("st-bad")
    val p = dir.resolve("bad.safetensors").toString
    val hdr = """{"t":{"dtype":"F32","shape":[4],"data_offsets":[0,999]}}"""
      .getBytes("UTF-8")
    val out = new java.io.FileOutputStream(p)
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(hdr.length.toLong)
    out.write(bb.array()); out.write(hdr)
    out.write(new Array[Byte](16)); out.close()
    val e = intercept[Exception] { Safetensors.decode(p) }
    assert(e.getMessage.contains("offsets") || e.getMessage.contains("mismatch"))
  }

  test("safetensors header length inside the (len-8, len) window rejects loudly") {
    // hlen < fileLen but 8 + hlen > fileLen: the old check admitted this
    // window and died with a bare EOFException mid-header.
    val dir = java.nio.file.Files.createTempDirectory("st-hlen")
    val p = dir.resolve("short.safetensors").toString
    val fileLen = 32
    val out = new java.io.FileOutputStream(p)
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong((fileLen - 4).toLong)
    out.write(bb.array()); out.write(new Array[Byte](fileLen - 8)); out.close()
    val e = intercept[IllegalArgumentException] { Safetensors.decode(p) }
    assert(e.getMessage.contains("absurd header length"))
    // hlen > Int.MaxValue rejects without allocating
    val p2 = dir.resolve("huge.safetensors").toString
    val out2 = new java.io.FileOutputStream(p2)
    val bb2 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(Long.MaxValue / 2)
    out2.write(bb2.array()); out2.write(new Array[Byte](16)); out2.close()
    val e2 = intercept[IllegalArgumentException] { Safetensors.decode(p2) }
    assert(e2.getMessage.contains("absurd header length"))
  }
}
