package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign HDF4/DFSD sweep: 14 seeded python-written files
  * (tools/make_fixtures.py `write_hdf4_fuzz`) cycling all eight numeric
  * DFNT types (u32 values past 2^31 prove the unsigned decode), rank
  * 1-3, plain data elements and deflate special elements, 1-2 SDSs per
  * file. Expectations ride h4_manifest.txt. */
class HDF4FuzzSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/fuzz/$name")
    require(in != null, s"fixture fuzz/$name missing — run tools/make_fixtures.py")
    try in.readAllBytes() finally in.close()
  }

  private case class Case(file: String, label: String, dfnt: Int,
      storage: String, dims: Seq[Int], vals: Seq[Double])

  private lazy val cases: Seq[Case] =
    new String(resource("h4_manifest.txt"), "UTF-8").linesIterator.map { line =>
      val f = line.split(";", -1)
      Case(f(0), f(1), f(2).toInt, f(3),
        f(4).split(",").toSeq.map(_.toInt),
        f(5).split(",").toSeq.map(_.toDouble))
    }.toSeq

  test("manifest covers the intended parameter space") {
    assert(cases.map(_.file).distinct.size == 14)
    assert(cases.map(_.dfnt).distinct.size == 8) // all numeric DFNT types
    assert(cases.map(_.storage).distinct.sorted == Seq("deflate", "plain"))
    assert(cases.exists(c => c.dfnt == 25 && c.vals.exists(_ > math.pow(2, 31))))
  }

  for (c <- cases) {
    test(s"${c.file}/${c.label}: dfnt=${c.dfnt}/${c.storage} " +
        s"[${c.dims.mkString("x")}] decodes exactly") {
      val sds = HDF4.readSds(resource(s"${c.file}.hdf"))
        .find(_.label == c.label)
        .getOrElse(fail(s"${c.file}: SDS ${c.label} not found"))
      assert(sds.dims == c.dims)
      assert(sds.ntType == c.dfnt)
      assert(sds.data.toSeq == c.vals)
    }
  }
}
