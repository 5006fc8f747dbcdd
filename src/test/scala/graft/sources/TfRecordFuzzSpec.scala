package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign TFRecord fixtures: 12 seeded python-written files
  * sweeping feature kinds, packed/unpacked numeric lists, empty lists,
  * full-range int64, raw bytes, and float32 bit patterns — every value
  * compared exactly against tfr_manifest.txt. */
class TfRecordFuzzSpec extends AnyFunSuite {
  import TfRecord._

  private val dir = new java.io.File("src/test/resources/fixtures/fuzz")

  private case class Exp(file: String, rec: Int, feat: String,
      kind: String, raw: String)

  private lazy val manifest: Seq[Exp] = {
    val f = new java.io.File(dir, "tfr_manifest.txt")
    require(f.isFile, "tfr_manifest.txt missing — run tools/make_fixtures.py")
    scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
      val parts = l.split("\\|", 5)
      Exp(parts(0), parts(1).toInt, parts(2), parts(3),
        if (parts.length > 4) parts(4) else "")
    }.toSeq
  }

  private def hexToBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  manifest.groupBy(_.file).toSeq.sortBy(_._1).foreach { case (file, exps) =>
    test(s"$file decodes every feature exactly") {
      val f = new java.io.File(dir, s"$file.tfrecord")
      require(f.isFile, s"$file.tfrecord missing")
      val in = new java.io.DataInputStream(new java.io.FileInputStream(f))
      val recs = readFramed(in).map(decodeExample).toIndexedSeq
      assert(recs.length === exps.map(_.rec).max + 1)
      exps.foreach { e =>
        val got = recs(e.rec).getOrElse(e.feat,
          fail(s"${e.file} rec ${e.rec}: feature ${e.feat} missing"))
        (e.kind, got) match {
          case ("i64", I64s(vs)) =>
            val want = if (e.raw.isEmpty) Seq.empty
              else e.raw.split(",").map(_.toLong).toSeq
            assert(vs === want, s"${e.file}/${e.rec}/${e.feat}")
          case ("bytes", Bs(vs)) =>
            val want = if (e.raw.isEmpty) Seq.empty
              else e.raw.split(",", -1).map {
                case "-" => Seq.empty[Byte] // zero-length byte string
                case h => hexToBytes(h).toSeq
              }.toSeq
            assert(vs.map(_.toSeq) === want, s"${e.file}/${e.rec}/${e.feat}")
          case ("f32", F32s(vs)) =>
            val want = if (e.raw.isEmpty) Seq.empty
              else e.raw.split(",").map { h =>
                java.lang.Float.intBitsToFloat(
                  java.nio.ByteBuffer.wrap(hexToBytes(h))
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
              }.toSeq
            assert(vs.map(java.lang.Float.floatToIntBits) ===
              want.map(java.lang.Float.floatToIntBits),
              s"${e.file}/${e.rec}/${e.feat}")
          case (k, other) =>
            fail(s"${e.file}/${e.rec}/${e.feat}: wanted $k, got $other")
        }
      }
    }
  }
}
