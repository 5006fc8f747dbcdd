package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign NetCDF-classic sweep: 15 seeded python-written
  * files (tools/make_fixtures.py `write_netcdf3_fuzz`) covering CDF-1
  * and CDF-2 (64-bit begins), all five numeric nc_types, fixed
  * variables with slab padding, the single-record-variable no-padding
  * special case (byte/short), and two interleaved record variables with
  * per-record vsize padding. Expectations ride nc_manifest.txt. */
class NetCDF3FuzzSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/fuzz/$name")
    require(in != null, s"fixture fuzz/$name missing — run tools/make_fixtures.py")
    try in.readAllBytes() finally in.close()
  }

  private case class Case(file: String, version: Int, varName: String,
      dimNames: Seq[String], shape: Seq[Int], vals: Seq[Double])

  private lazy val cases: Seq[Case] =
    new String(resource("nc_manifest.txt"), "UTF-8").linesIterator.map { line =>
      val f = line.split(";", -1)
      Case(f(0), f(1).toInt, f(2), f(3).split(",").toSeq,
        f(4).split(",").toSeq.map(_.toInt),
        f(5).split(",").toSeq.map(_.toDouble))
    }.toSeq

  test("manifest covers the intended parameter space") {
    assert(cases.map(_.file).distinct.size == 15)
    assert(cases.map(_.version).distinct.sorted == Seq(1, 2))
    assert(cases.exists(_.varName == "r1")) // two-record-var interleave
    assert(cases.map(_.shape.size).distinct.sorted == Seq(1, 2, 3))
  }

  for (c <- cases) {
    test(s"${c.file} v${c.version}: ${c.varName} " +
        s"[${c.shape.mkString("x")}] decodes exactly") {
      val (dimNames, shape, vals) =
        NetCDF3.readValues(resource(s"${c.file}.nc"), c.varName)
      assert(dimNames == c.dimNames)
      assert(shape == c.shape)
      assert(vals.toSeq == c.vals)
    }
  }
}
