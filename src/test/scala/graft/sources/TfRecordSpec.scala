package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord codec: framing CRCs (golden vector + corruption rejects),
  * Example proto round-trips (negatives, unicode, binary, floats),
  * unpacked-list decode, and the Spark shard round-trip. */
class TfRecordSpec extends SparkSpec {
  import TfRecord._

  test("masked CRC32C matches the published test vector") {
    // crc32c("123456789") = 0xe3069283 (RFC 3720 / iSCSI test vector);
    // masked = rotr15(crc) + 0xa282ead8
    val crc = {
      val c = new java.util.zip.CRC32C()
      c.update("123456789".getBytes("ASCII"))
      c.getValue
    }
    assert(crc === 0xe3069283L)
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    assert(maskedCrc32c("123456789".getBytes("ASCII")) ===
      ((rot + 0xa282ead8L) & 0xFFFFFFFFL))
  }

  test("framing round-trips multiple records and rejects corruption") {
    val recs = Seq("first".getBytes, Array[Byte](), "третий 漢字".getBytes("UTF-8"))
    val framed = recs.flatMap(r => frameRecord(r).toSeq).toArray
    val back = readFramed(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(framed))).toSeq
    assert(back.map(_.toSeq) === recs.map(_.toSeq))
    // flip one payload byte -> payload CRC reject
    val corrupt = framed.clone()
    corrupt(12) = (corrupt(12) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      readFramed(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(corrupt))).toSeq
    }
    assert(e.getMessage.contains("CRC mismatch"))
    // truncate mid-record -> loud reject, not silent EOF
    val trunc = framed.dropRight(3)
    val e2 = intercept[IllegalArgumentException] {
      readFramed(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(trunc))).toSeq
    }
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("CRC"))
  }

  test("truncated unpacked fixed32 in a FloatList rejects loudly") {
    // Hand-built Example whose FloatList carries an unpacked fixed32 tag
    // (field 1, wire 5) followed by only 2 of its 4 payload bytes. Every
    // enclosing length is consistent, so the truncation is visible only
    // to the fixed32 bounds check.
    val floatList = Array[Byte](0x0d, 0x00, 0x00)           // tag + 2 bytes
    val feature = Array[Byte](0x12, floatList.length.toByte) ++ floatList
    val entry = Array[Byte](0x0a, 1, 'x'.toByte,            // key = "x"
      0x12, feature.length.toByte) ++ feature                // value = Feature
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0a, features.length.toByte) ++ features
    val e = intercept[IllegalArgumentException] { decodeExample(example) }
    assert(e.getMessage.contains("truncated fixed32"))
  }

  test("Example proto round-trips all three list kinds") {
    val feats = Seq(
      "ids" -> I64s(Seq(0L, -1L, Long.MaxValue, Long.MinValue, 300L)),
      "words" -> Bs(Seq("héllo".getBytes("UTF-8"), Array[Byte](0, -1, 127))),
      "scores" -> F32s(Seq(1.5f, -0.0f, Float.NaN, 3.4e38f)),
      "empty" -> I64s(Seq.empty))
    val m = decodeExample(encodeExample(feats))
    assert(m("ids") === I64s(Seq(0L, -1L, Long.MaxValue, Long.MinValue, 300L)))
    m("words") match {
      case Bs(vs) => assert(vs.map(_.toSeq) ===
        Seq("héllo".getBytes("UTF-8").toSeq, Seq[Byte](0, -1, 127)))
      case other => fail(other.toString)
    }
    m("scores") match {
      case F32s(Seq(a, b, c, d)) =>
        assert(a === 1.5f); assert(b === -0.0f)
        assert(c.isNaN); assert(d === 3.4e38f)
      case other => fail(other.toString)
    }
    assert(m("empty") === I64s(Seq.empty))
  }

  test("decoder accepts UNPACKED numeric lists (proto2-style writers)") {
    // hand-build a Feature with unpacked int64s: Int64List{value: 5, value: -2}
    val il = new java.io.ByteArrayOutputStream()
    def varint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
      var v = value
      while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(il, 8); varint(il, 5L) // field 1 wire 0
    varint(il, 8); varint(il, -2L)
    val feature = new java.io.ByteArrayOutputStream()
    varint(feature, (3 << 3) | 2); varint(feature, il.size().toLong)
    feature.write(il.toByteArray)
    val entry = new java.io.ByteArrayOutputStream()
    varint(entry, (1 << 3) | 2); varint(entry, 1L); entry.write('k')
    varint(entry, (2 << 3) | 2); varint(entry, feature.size().toLong)
    entry.write(feature.toByteArray)
    val feats = new java.io.ByteArrayOutputStream()
    varint(feats, (1 << 3) | 2); varint(feats, entry.size().toLong)
    feats.write(entry.toByteArray)
    val ex = new java.io.ByteArrayOutputStream()
    varint(ex, (1 << 3) | 2); varint(ex, feats.size().toLong)
    ex.write(feats.toByteArray)
    assert(decodeExample(ex.toByteArray) === Map("k" -> I64s(Seq(5L, -2L))))
  }

  test("foreign fixture: python-stdlib writer decodes exactly") {
    val f = new java.io.File("src/test/resources/fixtures/golden.tfrecord")
    require(f.isFile, "fixture missing — run tools/make_fixtures.py")
    // codec level: CRC verify + proto decode (incl. the unpacked record 2)
    val in = new java.io.DataInputStream(new java.io.FileInputStream(f))
    val recs = readFramed(in).map(decodeExample).toSeq
    assert(recs.length === 3)
    assert(recs(0)("id") === I64s(Seq(7L)))
    assert(recs(0)("txt").asInstanceOf[Bs].v.head.toSeq ===
      "héllo wörld".getBytes("UTF-8").toSeq)
    assert(recs(0)("vec") === F32s(Seq(1.5f, -2.25f, 0.5f)))
    assert(recs(1)("id") === I64s(Seq(-3L))) // unpacked + negative varint
    assert(recs(1)("txt").asInstanceOf[Bs].v.head.toSeq ===
      "漢字テキスト".getBytes("UTF-8").toSeq)
    assert(recs(2)("id") === I64s(Seq(123456789012345L)))
    assert(recs(2)("vec") === F32s(Seq.empty))
    // DataFrame level: copy the shard into a dir and read with a schema
    val dir = java.nio.file.Files.createTempDirectory("tfr-foreign")
    java.nio.file.Files.copy(f.toPath, dir.resolve("part-00000.tfrecord"))
    val df = TfRecord.read(spark, dir.toString,
      StructType(Seq(StructField("id", LongType), StructField("txt", StringType))))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((-3L, "漢字テキスト"), (7L, "héllo wörld"),
      (123456789012345L, "")))
  }

  test("Spark shard round-trip: values, nulls, multiple partitions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfr-rt").toString
    val df = Seq(
      (1L, "plain", -7L),
      (2L, "κλμ 漢字 🌍", 0L),
      (3L, null.asInstanceOf[String], Long.MinValue),
      (4L, "comma, \"quote\"\nnewline", 42L))
      .toDF("id", "text", "v").repartition(3)
    TfRecord.write(df, dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tfrecord")) === 3)
    val back = TfRecord.read(s, dir,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType),
        StructField("v", LongType))))
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, Some("plain"), -7L),
      (2L, Some("κλμ 漢字 🌍"), 0L),
      (3L, None, Long.MinValue),
      (4L, Some("comma, \"quote\"\nnewline"), 42L)))
  }

  test("property: random Example maps and framed streams round-trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val nameGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('κ', '漢', 'é', '_'))).map(_.mkString)
    val fvGen: Gen[FeatureVal] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(I64s(_)),
      Gen.listOf(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray)).map(Bs(_)),
      Gen.listOf(Gen.chooseNum(-3.4e38f, 3.4e38f)).map(F32s(_)))
    val exampleGen = Gen.listOf(Gen.zip(nameGen, fvGen))
      .map(_.distinctBy(_._1))
    val prop = Prop.forAll(Gen.listOfN(5, exampleGen)) { examples =>
      val payloads = examples.map(encodeExample)
      val framed = payloads.flatMap(p => frameRecord(p).toSeq).toArray
      val back = readFramed(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(framed))).map(decodeExample).toSeq
      back.length == examples.length && back.zip(examples).forall {
        case (m, feats) =>
          // empty lists are kind-ambiguous on the wire only in that the
          // LIST field is present but empty; kind is preserved
          feats.forall { case (name, fv) =>
            (m.get(name), fv) match {
              case (Some(I64s(a)), I64s(b)) => a == b
              case (Some(F32s(a)), F32s(b)) =>
                a.length == b.length && a.zip(b).forall { case (x, y) =>
                  (x.isNaN && y.isNaN) || x == y
                }
              case (Some(Bs(a)), Bs(b)) =>
                a.length == b.length && a.zip(b).forall { case (x, y) =>
                  x.toSeq == y.toSeq
                }
              case _ => false
            }
          }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("unsupported column types reject loudly") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      TfRecord.write(Seq((1L, 2.5)).toDF("id", "d"), "/tmp/tfr-bad")
    }
    assert(e.getMessage.contains("unsupported column type"))
  }
}
