package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign NetCDF-classic sweep: 24 seeded python-written
  * files (tools/make_fixtures.py `write_netcdf3_fuzz`) covering CDF-1,
  * CDF-2 (64-bit begins), and CDF-5 (8-byte NON_NEG fields + the
  * extended unsigned/64-bit integer types), all numeric nc_types, fixed
  * variables with slab padding, the single-record-variable no-padding
  * special case (sub-4-byte types), and two interleaved record
  * variables with per-record vsize padding. Expectations ride
  * nc_manifest.txt. */
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
    assert(cases.map(_.file).distinct.size == 24)
    assert(cases.map(_.version).distinct.sorted == Seq(1, 2, 5))
    assert(cases.exists(_.varName == "r1")) // two-record-var interleave
    assert(cases.map(_.shape.size).distinct.sorted == Seq(1, 2, 3))
    // CDF-5 files must actually exercise the extended types: values
    // above the int32 range appear only through uint/int64 decode
    assert(cases.exists(c => c.version == 5 && c.vals.exists(_ > 3.0e9)))
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
