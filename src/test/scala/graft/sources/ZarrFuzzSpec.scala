package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign zarr-v2 sweep: 20 seeded python-written stores
  * (tools/make_fixtures.py `write_zarr_fuzz`) covering all 11 supported
  * dtypes (both byte orders + |i1), zlib/null compressors, rank 1-3 with
  * edge chunks whose overhang carries a sentinel the reader must skip,
  * and randomly MISSING chunk files that must read back as fill_value.
  * Stores are read from the source tree (sbt's resource copier drops the
  * .zarray dot-files); expectations come from zarr_manifest.txt. */
class ZarrFuzzSpec extends AnyFunSuite {

  private val dir = new java.io.File("src/test/resources/fixtures/fuzz")

  private case class Case(name: String, dtype: String, comp: String,
      fill: String, nMissing: Int, shape: Seq[Int], vals: Seq[Double])

  private lazy val cases: Seq[Case] = {
    val mf = new java.io.File(dir, "zarr_manifest.txt")
    require(mf.isFile, "zarr_manifest.txt missing — run tools/make_fixtures.py")
    java.nio.file.Files.readString(mf.toPath).linesIterator.map { line =>
      val f = line.split(";", -1)
      Case(f(0), f(1), f(2), f(3), f(4).toInt,
        f(5).split(",").toSeq.map(_.toInt),
        f(7).split(",").toSeq.map(_.toDouble))
    }.toSeq
  }

  test("manifest covers the intended parameter space") {
    assert(cases.size == 20)
    assert(cases.map(_.dtype).distinct.size == 11) // every supported dtype
    assert(cases.map(_.comp).distinct.sorted == Seq("null", "zlib"))
    assert(cases.exists(_.nMissing > 0)) // fill_value path exercised
    assert(cases.map(_.shape.size).distinct.sorted == Seq(1, 2, 3))
  }

  for (c <- cases) {
    test(s"${c.name}: ${c.dtype}/${c.comp}/fill=${c.fill}" +
        s"/missing=${c.nMissing} shape=${c.shape.mkString("x")} decodes exactly") {
      val (shape, data) =
        Zarr.readArray(new java.io.File(dir, s"${c.name}.zarr"), "data")
      assert(shape == c.shape)
      assert(data.toSeq == c.vals)
    }
  }
}
