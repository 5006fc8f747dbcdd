package graft.embeddings

import org.scalatest.funsuite.AnyFunSuite

/** External-data initializers + half precision: the model fixture and
  * its weight blob are written by the INDEPENDENT Python stdlib writer
  * (tools/make_fixtures.py, protobuf wire format + struct '<e'), and
  * the expected outputs were computed in Python with its own binary16
  * round-trip — so a shared Scala-side fp16 or offset bug cannot pass.
  * Lives in package graft.embeddings to reach the private[embeddings]
  * half-precision primitives. */
class OnnxExternalFp16Spec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"$name fixture missing — run tools/make_fixtures.py")
    try in.readAllBytes() finally in.close()
  }

  private def jsonArray(js: String, key: String): Array[Double] = {
    val m = ("\"" + key + "\": \\[([^\\]]*)\\]").r.findFirstMatchIn(js)
      .getOrElse(fail(s"key $key missing in expected json"))
    m.group(1).split(",").map(_.trim.toDouble)
  }

  test("binary16 round trip is the identity on every finite half pattern") {
    (0 until 0x10000).foreach { h =>
      val e = (h >>> 10) & 0x1f
      if (e != 31) { // finite values (inf/NaN carry payload semantics)
        val back = Onnx.f16Bits(Onnx.f16ToDouble(h).toFloat)
        assert(back == h, f"half 0x$h%04x -> ${Onnx.f16ToDouble(h)} -> 0x$back%04x")
      }
    }
  }

  test("known binary16 encodings and round-to-nearest-even") {
    assert(Onnx.f16Bits(1.0f) == 0x3c00)
    assert(Onnx.f16Bits(-2.0f) == 0xc000)
    assert(Onnx.f16Bits(65504.0f) == 0x7bff) // max finite half
    assert(Onnx.f16Bits(65520.0f) == 0x7c00) // overflow -> +inf
    assert(Onnx.f16Bits(5.9604645e-8f) == 0x0001) // min subnormal
    assert(Onnx.f16Bits(0.0f) == 0x0000)
    assert(Onnx.f16Bits(-0.0f) == 0x8000)
    assert(Onnx.f16Bits(1.0f / 3.0f) == 0x3555) // nearest half to 1/3
    assert(Onnx.f16ToDouble(0x3555) == 0.333251953125)
    // ties round to even: 2049 is exactly between 2048 and 2050 -> 2048
    assert(Onnx.f16RoundTrip(2049.0) == 2048.0)
    assert(Onnx.f16RoundTrip(2051.0) == 2052.0)
    // inf/NaN decode
    assert(Onnx.f16ToDouble(0x7c00).isPosInfinity)
    assert(Onnx.f16ToDouble(0x7e00).isNaN)
  }

  test("external-data fp16 model executes bit-for-bit vs the Python oracle") {
    val model = res("ext_fp16.onnx")
    val blob = res("pool_weights.bin")
    val js = new String(res("ext_fp16_expected.json"), "UTF-8")
    val x = jsonArray(js, "x")
    val expected = jsonArray(js, "expected")
    val g = Onnx.parseModel(model, Map("pool_weights.bin" -> blob))
    // the fp16 weight widened exactly: every value is a binary16 value
    val w = g.initializers("w")
    assert(w.dims == Seq(4, 4))
    w.data.foreach(v => assert(Onnx.f16ToDouble(Onnx.f16Bits(v)).toFloat == v))
    val out = Onnx.runNd(g, Map("x" -> Onnx.Nd(Seq(3, 4), x)))
    assert(out.dims == Seq(3, 4))
    out.a.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got == want, s"element $i: got $got, want $want")
    }
  }

  test("missing external file rejects loudly, never silently zeroes") {
    val model = res("ext_fp16.onnx")
    val e = intercept[IllegalArgumentException](Onnx.parseModel(model))
    assert(e.getMessage.contains("external data file"), e.getMessage)
  }
}
