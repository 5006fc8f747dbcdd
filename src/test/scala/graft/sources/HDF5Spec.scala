package graft.sources

import graft.SparkSpec

/** Minimal HDF5 codec: lossless round-trip of the netCDF-4-classic-model
  * LES layout (contiguous float64 datasets under the root group), plus the
  * loud-rejection contracts for everything outside the subset. */
class HDF5Spec extends SparkSpec {

  private def lesFixture: Seq[HDF5.DsSpec] = Seq(
    HDF5.DsSpec("time", Seq(3), Array(0.0, 1.0, 2.0)),
    HDF5.DsSpec("y", Seq(4), Array.tabulate(4)(_ * 50.0)),
    HDF5.DsSpec("x", Seq(4), Array.tabulate(4)(_ * 50.0)),
    HDF5.DsSpec("lwp", Seq(3, 4, 4), Array.tabulate(48)(_ * 0.25 - 1.0)))

  test("write/read round-trips the LES dataset layout losslessly") {
    val bytes = HDF5.write(lesFixture)
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"))
    val lwp = back.find(_.name == "lwp").get
    assert(lwp.dims == Seq(3L, 4L, 4L))
    assert(lwp.data.toSeq == lesFixture.last.data.toSeq)
    val t = back.find(_.name == "time").get
    assert(t.dims == Seq(3L) && t.data.toSeq == Seq(0.0, 1.0, 2.0))
    // NaN survives (bit-level copy)
    val withNan = HDF5.write(Seq(HDF5.DsSpec("v", Seq(2), Array(1.5, Double.NaN))))
    val v = HDF5.read(withNan).head
    assert(v.data(0) == 1.5 && v.data(1).isNaN)
  }

  test("ingests through the Spark binaryFile path like q56/q61") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "les.h5"), HDF5.write(lesFixture))
    val rows = spark.read.format("binaryFile").load(s"$dir/*.h5")
      .select("content").as[Array[Byte]]
      .flatMap(b => HDF5.read(b).map(d => (d.name, d.dims.mkString("x"), d.data.sum)))
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("lwp", "time", "x", "y"))
    assert(rows.find(_._1 == "lwp").get._2 == "3x4x4")
  }

  test("chunked storage round-trips, including deflate and ragged edge chunks") {
    // chunk (2,3,3) over (3,4,4): ragged in every dimension
    val chunky = lesFixture.map {
      case s if s.name == "lwp" => s.copy(chunkDims = Some(Seq(2, 3, 3)))
      case s => s.copy(chunkDims = Some(Seq(2)))
    }
    for (deflate <- Seq(false, true)) {
      val bytes = HDF5.write(chunky, deflate = deflate)
      val back = HDF5.read(bytes)
      assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"), s"deflate=$deflate")
      val lwp = back.find(_.name == "lwp").get
      assert(lwp.dims == Seq(3L, 4L, 4L))
      assert(lwp.data.toSeq == lesFixture.last.data.toSeq, s"deflate=$deflate")
      assert(back.find(_.name == "time").get.data.toSeq == Seq(0.0, 1.0, 2.0))
    }
    // deflate actually compresses: constant field shrinks below raw size
    val big = Seq(HDF5.DsSpec("c", Seq(32, 32), Array.fill(1024)(1.5),
      chunkDims = Some(Seq(16, 16))))
    assert(HDF5.write(big, deflate = true).length < HDF5.write(big, deflate = false).length - 4000)
  }

  test("non-deflate filters are rejected loudly, not misread") {
    val chunky = Seq(lesFixture.last.copy(chunkDims = Some(Seq(1, 4, 4))))
    val bytes = HDF5.write(chunky, deflate = true)
    // byte surgery: flip the deflate filter id (1) to shuffle (2) in the
    // filter-pipeline message (0x000B, size 24, ver 1, nf 1, reserved)
    val pat = Array[Byte](0x0B, 0x00, 24, 0x00, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0)
    val idx = bytes.indices.find(i =>
      i + pat.length <= bytes.length && pat.indices.forall(j => bytes(i + j) == pat(j)))
    assert(idx.isDefined, "filter message not found in written bytes")
    bytes(idx.get + 16) = 2
    val e = intercept[IllegalArgumentException](HDF5.read(bytes))
    assert(e.getMessage.contains("filter id 2"))
  }

  test("new-format superblocks are rejected loudly") {
    val v2 = HDF5.write(lesFixture)
    v2(8) = 2 // superblock version
    val e2 = intercept[IllegalArgumentException](HDF5.read(v2))
    assert(e2.getMessage.contains("version-0 superblocks"))
  }
}
