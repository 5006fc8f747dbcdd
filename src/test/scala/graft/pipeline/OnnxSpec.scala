package graft.pipeline

import graft.SparkSpec
import graft.embeddings.{Inference, Onnx, OnnxWriter}
import org.apache.spark.sql.functions._

/** M1 closure: the pure-JVM ONNX reader loads a REAL serialized
  * ModelProto (written byte-for-byte by the independent OnnxWriter
  * encoder) and its executor matches a brute-force MLP coded separately
  * here — plus loud-rejection byte surgery for everything outside the
  * declared subset. */
class OnnxSpec extends SparkSpec {

  private val (d, h, e) = (6, 4, 3)
  private val bytes = OnnxWriter.mlpModelBytes(d, h, e)

  /** Independent reference MLP: plain nested loops over the same
    * deterministic weights, no shared code with the executor. */
  private def reference(x: Array[Double]): Array[Float] = {
    val w1 = OnnxWriter.w1(d, h); val b1 = OnnxWriter.b1(h)
    val w2 = OnnxWriter.w2(h, e); val b2 = OnnxWriter.b2(e)
    val hid = Array.tabulate(h) { j =>
      var acc = 0.0
      for (i <- 0 until d) acc += x(i) * w1(i * h + j)
      val v = acc + b1(j)
      if (v > 0) v else 0.0
    }
    Array.tabulate(e) { k =>
      var acc = 0.0
      for (j <- 0 until h) acc += hid(j) * w2(j * e + k)
      (acc + b2(k)).toFloat
    }
  }

  test("parse: graph structure, both tensor encodings, attributes") {
    val g = Onnx.parseModel(bytes)
    assert(g.nodes.map(_.opType) == Seq("Gemm", "Relu", "MatMul", "Add"))
    assert(g.dataInputs == Seq("x"))
    assert(g.outputNames == Seq("emb"))
    // w1 rode raw_data, b1 rode packed float_data — both must decode
    assert(g.initializers("w1").dims == Seq(d, h))
    assert(g.initializers("w1").data.toSeq == OnnxWriter.w1(d, h).toSeq)
    assert(g.initializers("b1").data.toSeq == OnnxWriter.b1(h).toSeq)
    assert(g.nodes.head.attrF("alpha") == 1.0f)
    assert(g.nodes.head.attrI("transB") == 0L)
  }

  test("executor matches the independent brute-force MLP bit-for-bit") {
    val model = new Onnx.OnnxModel(bytes)
    assert(model.inputDim == d && model.embDim == e)
    val tiles = Seq(
      Array.tabulate(d)(i => i * 0.25 - 0.5),
      Array.fill(d)(0.0),
      Array.tabulate(d)(i => math.sin(i).abs))
    val got = model.embedBatch(tiles)
    tiles.zip(got).foreach { case (x, emb) =>
      assert(emb.toSeq == reference(x).toSeq)
    }
  }

  test("Gemm transB and alpha/beta are honored") {
    // y = 2 * x * W^T  with W stored [e, d] and transB=1
    val w = Array.tabulate(e * d)(i => ((i % 5) - 2) / 8.0f)
    val m = OnnxWriter.model(
      nodes = Seq(OnnxWriter.NodeSpec("Gemm", Seq("x", "w"), Seq("y"),
        attrI = Seq("transB" -> 1L), attrF = Seq("alpha" -> 2.0f))),
      initializers = Seq(("w", Seq(e, d), w, true)),
      inputName = "x", outputName = "y")
    val g = Onnx.parseModel(m)
    val x = Array.tabulate(d)(_.toDouble)
    val out = Onnx.run(g, Onnx.Mat(1, d, x))
    for (k <- 0 until e) {
      var acc = 0.0
      for (i <- 0 until d) acc += x(i) * w(k * d + i)
      assert(out.a(k) == 2.0 * acc)
    }
  }

  test("rejects loudly: unsupported op, non-float tensor, missing graph") {
    val atan = OnnxWriter.model(
      nodes = Seq(OnnxWriter.NodeSpec("Atan", Seq("x"), Seq("y"))),
      initializers = Seq(("w", Seq(1), Array(1.0f), true)),
      inputName = "x", outputName = "y")
    val ex = intercept[IllegalArgumentException] {
      Onnx.run(Onnx.parseModel(atan), Onnx.Mat(1, 1, Array(0.0)))
    }
    assert(ex.getMessage.contains("Atan"))

    // byte surgery: flip w1's data_type varint (FLOAT=1 -> DOUBLE=11).
    // Nodes precede initializers and contain no field-2 varint records,
    // so the FIRST `0x10 0x01` byte pair in the file is w1's data_type.
    val mutated = bytes.clone()
    val typeIdx = mutated.indices.find(i =>
      mutated(i) == 0x10 && mutated(i + 1) == 0x01).get + 1
    mutated(typeIdx) = 11
    val ex2 = intercept[IllegalArgumentException] { Onnx.parseModel(mutated) }
    assert(ex2.getMessage.contains("float32"))

    intercept[IllegalArgumentException] { Onnx.parseModel(Array[Byte](0x08, 1)) }
  }

  // ------------------------------------------------------ conv family
  /** Independent conv-chain reference: materializes a zero-PADDED image
    * (structurally different from the executor's bounds-checked loops;
    * adding the 0.0 padding terms is bit-identical because x + 0.0 == x
    * for every non-negative-zero x and +0 never flips sign mid-sum),
    * same accumulation ORDER (c_in, ky, kx) since float addition is
    * order-sensitive. */
  private def convReference(x: Array[Double], c: Int, h: Int, w: Int,
      m: Int, e: Int, pads: Seq[Int], strides: Seq[Int]): Array[Float] = {
    val cw = OnnxWriter.convW(m, c); val cb = OnnxWriter.convB(m)
    val Seq(pt, pl, pb, pr) = pads
    val Seq(sh, sw) = strides
    val ph = h + pt + pb; val pw = w + pl + pr
    val padded = Array.ofDim[Double](c, ph * pw)
    for (ci <- 0 until c; y <- 0 until h; xx <- 0 until w)
      padded(ci)((y + pt) * pw + (xx + pl)) = x((ci * h + y) * w + xx)
    val oh = (ph - 3) / sh + 1; val ow = (pw - 3) / sw + 1
    // conv + relu
    val act = Array.ofDim[Double](m, oh * ow)
    for (co <- 0 until m; oy <- 0 until oh; ox <- 0 until ow) {
      var acc = 0.0
      for (ci <- 0 until c; ky <- 0 until 3; kx <- 0 until 3)
        acc += padded(ci)((oy * sh + ky) * pw + (ox * sw + kx)) *
               cw(((co * c + ci) * 3 + ky) * 3 + kx)
      val v = acc + cb(co)
      act(co)(oy * ow + ox) = if (v > 0) v else 0.0
    }
    // max pool 2x2, stride = kernel
    val qh = (oh - 2) / 2 + 1; val qw = (ow - 2) / 2 + 1
    val pooled = Array.ofDim[Double](m, qh * qw)
    for (co <- 0 until m; y <- 0 until qh; xx <- 0 until qw)
      pooled(co)(y * qw + xx) = Seq(
        act(co)(2 * y * ow + 2 * xx), act(co)(2 * y * ow + 2 * xx + 1),
        act(co)((2 * y + 1) * ow + 2 * xx), act(co)((2 * y + 1) * ow + 2 * xx + 1)).max
    // batch norm + global average pool
    val bs = OnnxWriter.bnScale(m); val bb = OnnxWriter.bnBias(m)
    val bm = OnnxWriter.bnMean(m); val bv = OnnxWriter.bnVar(m)
    val g = Array.tabulate(m) { co =>
      val std = math.sqrt(bv(co) + OnnxWriter.BnEps.toDouble)
      var acc = 0.0
      for (i <- 0 until qh * qw)
        acc += (pooled(co)(i) - bm(co)) * bs(co) / std + bb(co)
      acc / (qh * qw)
    }
    // gemm
    val gw = OnnxWriter.gemmW(m, e); val gb = OnnxWriter.gemmB(e)
    Array.tabulate(e) { k =>
      var acc = 0.0
      for (co <- 0 until m) acc += g(co) * gw(co * e + k)
      (acc + gb(k)).toFloat
    }
  }

  test("conv model parses: packed AND unpacked repeated-ints attributes") {
    val g = Onnx.parseModel(OnnxWriter.convModelBytes(c = 1, m = 2, e = 4,
      pads = Seq(1L, 1L, 1L, 1L), strides = Seq(2L, 2L)))
    assert(g.nodes.map(_.opType) == Seq("Conv", "Relu", "MaxPool",
      "BatchNormalization", "GlobalAveragePool", "Flatten", "Gemm"))
    val conv = g.nodes.head
    assert(conv.attrIs("pads") == Seq(1L, 1L, 1L, 1L))        // packed encoding
    assert(conv.attrIs("strides") == Seq(2L, 2L))              // unpacked
    assert(conv.attrIs("kernel_shape") == Seq(3L, 3L))
    assert(g.initializers("cw").dims == Seq(2, 1, 3, 3))
    assert(g.nodes(3).attrF("epsilon") == OnnxWriter.BnEps)
  }

  test("conv executor matches the independent padded-image reference bit-for-bit") {
    val (c, h, w, m, e) = (2, 8, 8, 3, 4)
    val model = new Onnx.OnnxModel(OnnxWriter.convModelBytes(c, m, e),
      tileDims = Some(Seq(c, h, w)))
    assert(model.inputDim == c * h * w && model.embDim == e)
    val tiles = Seq(
      Array.tabulate(c * h * w)(i => (i % 17) * 0.25 - 2.0),
      Array.fill(c * h * w)(0.0),
      Array.tabulate(c * h * w)(i => math.cos(i * 0.7)))
    model.embedBatch(tiles).zip(tiles).foreach { case (emb, x) =>
      assert(emb.toSeq ==
        convReference(x, c, h, w, m, e, Seq(0, 0, 0, 0), Seq(1, 1)).toSeq)
    }
  }

  test("conv pads and strides are honored (padded + strided variant)") {
    val (c, h, w, m, e) = (1, 7, 9, 2, 3)
    val model = new Onnx.OnnxModel(
      OnnxWriter.convModelBytes(c, m, e, pads = Seq(1L, 1L, 1L, 1L),
        strides = Seq(2L, 2L)),
      tileDims = Some(Seq(c, h, w)))
    val x = Array.tabulate(c * h * w)(i => ((i * 13) % 29) / 8.0 - 1.5)
    val got = model.embedBatch(Seq(x)).head
    assert(got.toSeq ==
      convReference(x, c, h, w, m, e, Seq(1, 1, 1, 1), Seq(2, 2)).toSeq)
  }

  // one-node helper graphs over input "x" with optional weight tensors
  private def oneNode(op: String, inputs: Seq[String],
      inits: Seq[(String, Seq[Int], Array[Float])],
      attrI: Seq[(String, Long)] = Nil, attrIs: Seq[(String, Seq[Long])] = Nil,
      attrS: Seq[(String, String)] = Nil, attrF: Seq[(String, Float)] = Nil,
      i64Inits: Seq[(String, Seq[Int], Array[Long], Boolean)] = Nil): Onnx.Graph =
    Onnx.parseModel(OnnxWriter.model(
      nodes = Seq(OnnxWriter.NodeSpec(op, inputs, Seq("y"),
        attrI = attrI, attrF = attrF, attrIs = attrIs, attrS = attrS)),
      initializers = inits.map { case (n, d, a) => (n, d, a, true) } ++
        (if (inits.isEmpty && i64Inits.isEmpty)
          Seq(("unused", Seq(1), Array(0.0f), true)) else Nil),
      inputName = "x", outputName = "y",
      int64Initializers = i64Inits))

  test("grouped conv matches a brute-force group-sliced reference") {
    val (c, h, w, m, g) = (4, 5, 6, 6, 2)
    val cg = c / g; val mPerG = m / g
    val wts = Array.tabulate(m * cg * 9)(i => (((i * 5) % 13) - 6) / 8.0f)
    val x = Array.tabulate(c * h * w)(i => ((i * 11) % 23) / 8.0 - 1.0)
    val graph = oneNode("Conv", Seq("x", "w"), Seq(("w", Seq(m, cg, 3, 3), wts)),
      attrI = Seq("group" -> g.toLong),
      attrIs = Seq("kernel_shape" -> Seq(3L, 3L)))
    val got = Onnx.runNd(graph, Onnx.Nd(Seq(1, c, h, w), x))
    val (oh, ow) = (h - 2, w - 2)
    assert(got.dims == Seq(1, m, oh, ow))
    for (m0 <- 0 until m; oy <- 0 until oh; ox <- 0 until ow) {
      var acc = 0.0
      val cBase = (m0 / mPerG) * cg
      for (ci <- 0 until cg; ky <- 0 until 3; kx <- 0 until 3)
        acc += x((cBase + ci) * h * w + (oy + ky) * w + (ox + kx)) *
          wts(((m0 * cg + ci) * 3 + ky) * 3 + kx).toDouble
      assert(got.a((m0 * oh + oy) * ow + ox) == acc, s"m=$m0 oy=$oy ox=$ox")
    }
  }

  test("dilated conv matches a brute-force spread-tap reference") {
    val (h, w, d) = (7, 8, 2)
    val wts = Array.tabulate(9)(i => ((i % 5) - 2) / 8.0f)
    val x = Array.tabulate(h * w)(i => ((i * 3) % 17) / 8.0 - 0.5)
    val graph = oneNode("Conv", Seq("x", "w"), Seq(("w", Seq(1, 1, 3, 3), wts)),
      attrIs = Seq("kernel_shape" -> Seq(3L, 3L), "dilations" -> Seq(d.toLong, d.toLong)))
    val got = Onnx.runNd(graph, Onnx.Nd(Seq(1, 1, h, w), x))
    val oh = h - 2 * d; val ow = w - 2 * d
    assert(got.dims == Seq(1, 1, oh, ow))
    for (oy <- 0 until oh; ox <- 0 until ow) {
      var acc = 0.0
      for (ky <- 0 until 3; kx <- 0 until 3)
        acc += x((oy + ky * d) * w + (ox + kx * d)) * wts((ky * 3 + kx)).toDouble
      assert(got.a(oy * ow + ox) == acc, s"oy=$oy ox=$ox")
    }
  }

  test("AveragePool: padded, strided, both count_include_pad modes") {
    val (c, h, w) = (2, 5, 5)
    val x = Array.tabulate(c * h * w)(i => ((i * 7) % 19) / 4.0 - 2.0)
    for (includePad <- Seq(0L, 1L)) {
      val graph = oneNode("AveragePool", Seq("x"), Nil,
        attrI = Seq("count_include_pad" -> includePad),
        attrIs = Seq("kernel_shape" -> Seq(3L, 3L), "pads" -> Seq(1L, 1L, 1L, 1L),
          "strides" -> Seq(2L, 2L)))
      val got = Onnx.runNd(graph, Onnx.Nd(Seq(1, c, h, w), x))
      val oh = (h + 2 - 3) / 2 + 1
      assert(got.dims == Seq(1, c, oh, oh))
      for (ci <- 0 until c; oy <- 0 until oh; ox <- 0 until oh) {
        var acc = 0.0; var cnt = 0
        for (ky <- 0 until 3; kx <- 0 until 3) {
          val iy = oy * 2 - 1 + ky; val ix = ox * 2 - 1 + kx
          if (iy >= 0 && iy < h && ix >= 0 && ix < w) {
            acc += x(ci * h * w + iy * w + ix); cnt += 1
          }
        }
        val expect = acc / (if (includePad == 1L) 9 else cnt)
        assert(got.a((ci * oh + oy) * oh + ox) == expect,
          s"ci=$ci oy=$oy ox=$ox include=$includePad")
      }
    }
  }

  test("Concat merges channel blocks in argument order (positive and negative axis)") {
    val a = Array.tabulate(2 * 2 * 3)(i => i * 0.5)
    val bW = Array.tabulate(3 * 2 * 3)(i => -i * 0.25f)
    for (axis <- Seq(1L, -3L)) {
      val graph = oneNode("Concat", Seq("x", "w"), Seq(("w", Seq(1, 3, 2, 3), bW)),
        attrI = Seq("axis" -> axis))
      val got = Onnx.runNd(graph, Onnx.Nd(Seq(1, 2, 2, 3), a))
      assert(got.dims == Seq(1, 5, 2, 3))
      assert(got.a.toSeq == a.toSeq ++ bW.map(_.toDouble).toSeq, s"axis=$axis")
    }
  }

  test("elementwise ops match math references: Sigmoid, Tanh, LeakyRelu") {
    val x = Array.tabulate(24)(i => (i - 12) * 0.5)
    val nd = Onnx.Nd(Seq(2, 3, 4), x)
    val sig = Onnx.runNd(oneNode("Sigmoid", Seq("x"), Nil), nd)
    assert(sig.dims == Seq(2, 3, 4))
    x.indices.foreach(i => assert(sig.a(i) == 1.0 / (1.0 + math.exp(-x(i)))))
    val th = Onnx.runNd(oneNode("Tanh", Seq("x"), Nil), nd)
    x.indices.foreach(i => assert(th.a(i) == math.tanh(x(i))))
    val lr = Onnx.runNd(oneNode("LeakyRelu", Seq("x"), Nil,
      attrF = Seq("alpha" -> 0.1f)), nd)
    x.indices.foreach(i =>
      assert(lr.a(i) == (if (x(i) >= 0) x(i) else 0.1f.toDouble * x(i))))
    // default alpha is 0.01, not 0
    val lrDef = Onnx.runNd(oneNode("LeakyRelu", Seq("x"), Nil), nd)
    assert(lrDef.a(0) == 0.01f.toDouble * x(0))
  }

  test("Clip honors attr form (opset<11) and scalar-input form (opset>=11)") {
    val x = Array.tabulate(10)(i => i - 5.0)
    val nd = Onnx.Nd(Seq(10), x)
    val byAttr = Onnx.runNd(oneNode("Clip", Seq("x"), Nil,
      attrF = Seq("min" -> 0.0f, "max" -> 3.0f)), nd)
    assert(byAttr.a.toSeq == x.map(v => math.min(3.0, math.max(0.0, v))).toSeq)
    // Relu6 as exporters emit it: min/max ride as scalar initializers
    val byInput = Onnx.runNd(oneNode("Clip", Seq("x", "lo", "hi"),
      Seq(("lo", Seq(1), Array(0.0f)), ("hi", Seq(1), Array(6.0f)))), nd)
    assert(byInput.a.toSeq == x.map(v => math.min(6.0, math.max(0.0, v))).toSeq)
    // one-sided: only min bound
    val loOnly = Onnx.runNd(oneNode("Clip", Seq("x"), Nil,
      attrF = Seq("min" -> -2.0f)), nd)
    assert(loOnly.a.toSeq == x.map(v => math.max(-2.0, v)).toSeq)
  }

  test("Transpose matches an index-remap reference (explicit and default perm)") {
    val dims = Seq(2, 3, 4)
    val x = Array.tabulate(24)(_ * 1.0)
    val nd = Onnx.Nd(dims, x)
    val got = Onnx.runNd(oneNode("Transpose", Seq("x"), Nil,
      attrIs = Seq("perm" -> Seq(2L, 0L, 1L))), nd)
    assert(got.dims == Seq(4, 2, 3))
    for (a <- 0 until 4; b <- 0 until 2; c <- 0 until 3)
      assert(got.a((a * 2 + b) * 3 + c) == x((b * 3 + c) * 4 + a), s"$a $b $c")
    // empty perm = full reverse
    val rev = Onnx.runNd(oneNode("Transpose", Seq("x"), Nil), nd)
    assert(rev.dims == Seq(4, 3, 2))
    for (a <- 0 until 4; b <- 0 until 3; c <- 0 until 2)
      assert(rev.a((a * 3 + b) * 2 + c) == x((c * 3 + b) * 4 + a))
  }

  test("Reshape: int64 shape input in both encodings, -1 and 0 conventions") {
    val x = Array.tabulate(24)(_ * 0.5)
    val nd = Onnx.Nd(Seq(2, 3, 4), x)
    // raw_data int64 shape with an inferred dim
    val g1 = oneNode("Reshape", Seq("x", "shp"), Nil,
      i64Inits = Seq(("shp", Seq(2), Array(6L, -1L), true)))
    val r1 = Onnx.runNd(g1, nd)
    assert(r1.dims == Seq(6, 4) && r1.a.toSeq == x.toSeq)
    // packed-varint int64 shape with a copied (0) dim
    val g2 = oneNode("Reshape", Seq("x", "shp"), Nil,
      i64Inits = Seq(("shp", Seq(3), Array(0L, 4L, 3L), false)))
    val r2 = Onnx.runNd(g2, nd)
    assert(r2.dims == Seq(2, 4, 3) && r2.a.toSeq == x.toSeq)
    // incompatible shape rejects
    val g3 = oneNode("Reshape", Seq("x", "shp"), Nil,
      i64Inits = Seq(("shp", Seq(2), Array(5L, 5L), true)))
    val e = intercept[IllegalArgumentException](Onnx.runNd(g3, nd))
    assert(e.getMessage.contains("Reshape"))
  }

  test("Pad (constant mode): attr form and int64-input form, nonzero value") {
    val (h, w) = (2, 3)
    val x = Array.tabulate(h * w)(_ + 1.0)
    val nd = Onnx.Nd(Seq(1, 1, h, w), x)
    def reference(pads: Seq[Int], v: Double): Seq[Double] = {
      val (oh, ow) = (h + pads(2) + pads(6), w + pads(3) + pads(7))
      (for (oy <- 0 until oh; ox <- 0 until ow) yield {
        val iy = oy - pads(2); val ix = ox - pads(3)
        if (iy >= 0 && iy < h && ix >= 0 && ix < w) x(iy * w + ix) else v
      })
    }
    val pads = Seq(0, 0, 1, 2, 0, 0, 1, 2)
    val byAttr = Onnx.runNd(oneNode("Pad", Seq("x"), Nil,
      attrIs = Seq("pads" -> pads.map(_.toLong)),
      attrF = Seq("value" -> 9.0f)), nd)
    assert(byAttr.dims == Seq(1, 1, 4, 7))
    assert(byAttr.a.toSeq == reference(pads, 9.0))
    val byInput = Onnx.runNd(oneNode("Pad", Seq("x", "p"), Nil,
      i64Inits = Seq(("p", Seq(8), pads.map(_.toLong).toArray, true))), nd)
    assert(byInput.a.toSeq == reference(pads, 0.0))
    // reflect mode rejects loudly
    val e = intercept[IllegalArgumentException](Onnx.runNd(
      oneNode("Pad", Seq("x"), Nil,
        attrIs = Seq("pads" -> pads.map(_.toLong)),
        attrS = Seq("mode" -> "reflect")), nd))
    assert(e.getMessage.contains("mode=reflect"))
  }

  test("Softmax matches a max-subtracted reference on the given axis") {
    val dims = Seq(2, 3, 4)
    val x = Array.tabulate(24)(i => ((i * 7) % 11) * 0.3 - 1.0)
    val nd = Onnx.Nd(dims, x)
    def reference(axis: Int): Array[Double] = {
      val out = new Array[Double](24)
      val n = dims(axis)
      val inner = dims.drop(axis + 1).product
      val outer = dims.take(axis).product
      for (o <- 0 until outer; in0 <- 0 until inner) {
        val base = o * n * inner + in0
        val vs = (0 until n).map(k => x(base + k * inner))
        val mx = vs.max
        val es = vs.map(v => math.exp(v - mx))
        val sum = es.sum
        (0 until n).foreach(k => out(base + k * inner) = es(k) / sum)
      }
      out
    }
    // default axis is -1 (the last)
    val last = Onnx.runNd(oneNode("Softmax", Seq("x"), Nil), nd)
    assert(last.a.toSeq == reference(2).toSeq)
    val mid = Onnx.runNd(oneNode("Softmax", Seq("x"), Nil,
      attrI = Seq("axis" -> 1L)), nd)
    assert(mid.a.toSeq == reference(1).toSeq)
  }

  test("ReduceMean matches a scan-order reference (axes, keepdims, GAP form)") {
    val dims = Seq(2, 3, 4, 5)
    val x = Array.tabulate(dims.product)(i => ((i * 13) % 31) * 0.25 - 3.0)
    val nd = Onnx.Nd(dims, x)
    // the GAP replacement exporters emit: mean over spatial, keepdims
    val gap = Onnx.runNd(oneNode("ReduceMean", Seq("x"), Nil,
      attrIs = Seq("axes" -> Seq(2L, 3L))), nd)
    assert(gap.dims == Seq(2, 3, 1, 1))
    for (n0 <- 0 until 2; c <- 0 until 3) {
      var acc = 0.0
      for (i <- 0 until 20) acc += x((n0 * 3 + c) * 20 + i)
      assert(gap.a(n0 * 3 + c) == acc / 20, s"n=$n0 c=$c")
    }
    // negative axis + dropped dim
    val drop = Onnx.runNd(oneNode("ReduceMean", Seq("x"), Nil,
      attrIs = Seq("axes" -> Seq(-1L)), attrI = Seq("keepdims" -> 0L)), nd)
    assert(drop.dims == Seq(2, 3, 4))
    assert(drop.a(0) == (0 until 5).map(x(_)).sum / 5)
    // all axes -> scalar-ish [1]
    val all = Onnx.runNd(oneNode("ReduceMean", Seq("x"), Nil,
      attrI = Seq("keepdims" -> 0L)), nd)
    assert(all.dims == Seq(1) && all.a(0) == x.sum / x.length)
  }

  test("MaxPool omitted strides means stride 1 (the ONNX default), not the kernel") {
    val (h, w) = (4, 4)
    val x = Array.tabulate(h * w)(i => ((i * 13) % 11).toDouble)
    val graph = oneNode("MaxPool", Seq("x"), Nil,
      attrIs = Seq("kernel_shape" -> Seq(2L, 2L))) // strides deliberately omitted
    val got = Onnx.runNd(graph, Onnx.Nd(Seq(1, 1, h, w), x))
    assert(got.dims == Seq(1, 1, 3, 3), "overlapping stride-1 windows")
    for (oy <- 0 until 3; ox <- 0 until 3) {
      val expect = Seq(x(oy * w + ox), x(oy * w + ox + 1),
        x((oy + 1) * w + ox), x((oy + 1) * w + ox + 1)).max
      assert(got.a(oy * 3 + ox) == expect)
    }
  }

  test("auto_pad SAME_UPPER/SAME_LOWER/VALID resolve to the TF-style pads") {
    // 5x5 input, 3x3 kernel, stride 2: out = ceil(5/2) = 3, total pad =
    // (3-1)*2 + 3 - 5 = 2 -> UPPER (1,1)... symmetric; stride 1 total =
    // 2 -> also symmetric; use kernel 2 for the asymmetric split:
    // total = 1 -> UPPER pads (0,1), LOWER pads (1,0)
    val (h, w) = (5, 5)
    val x = Array.tabulate(h * w)(i => ((i * 7) % 13) * 0.5 - 2.0)
    val nd = Onnx.Nd(Seq(1, 1, h, w), x)
    val wts = Array.tabulate(4)(i => (i + 1) * 0.25f)
    def conv(attrS: Seq[(String, String)], attrIs: Seq[(String, Seq[Long])]) =
      Onnx.runNd(oneNode("Conv", Seq("x", "w"), Seq(("w", Seq(1, 1, 2, 2), wts)),
        attrS = attrS, attrIs = Seq("kernel_shape" -> Seq(2L, 2L)) ++ attrIs), nd)
    val upper = conv(Seq("auto_pad" -> "SAME_UPPER"), Nil)
    val lower = conv(Seq("auto_pad" -> "SAME_LOWER"), Nil)
    val explUp = conv(Nil, Seq("pads" -> Seq(0L, 0L, 1L, 1L)))
    val explLo = conv(Nil, Seq("pads" -> Seq(1L, 1L, 0L, 0L)))
    assert(upper.dims == Seq(1, 1, 5, 5) && lower.dims == Seq(1, 1, 5, 5))
    assert(upper.a.toSeq == explUp.a.toSeq, "SAME_UPPER == explicit (0,0,1,1)")
    assert(lower.a.toSeq == explLo.a.toSeq, "SAME_LOWER == explicit (1,1,0,0)")
    assert(upper.a.toSeq != lower.a.toSeq, "the split must be visible")
    // VALID == no pads; stride-2 SAME pool keeps ceil(in/stride)
    val valid = conv(Seq("auto_pad" -> "VALID"), Nil)
    assert(valid.a.toSeq == conv(Nil, Nil).a.toSeq)
    val pool = Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
      attrIs = Seq("kernel_shape" -> Seq(3L, 3L), "strides" -> Seq(2L, 2L)),
      attrS = Seq("auto_pad" -> "SAME_UPPER")), nd)
    assert(pool.dims == Seq(1, 1, 3, 3), "out = ceil(5/2)")
  }

  test("ceil_mode pools: extra tail window, pad-start clamp, avg over real cells") {
    // 1x1x5x5, k=2, s=2: floor gives 2 windows/axis, ceil gives 3 — the
    // tail window sees only the last row/column (PyTorch ceil semantics)
    val (h, w) = (5, 5)
    val x = Array.tabulate(h * w)(i => ((i * 13) % 17).toDouble)
    val nd = Onnx.Nd(Seq(1, 1, h, w), x)
    val mp = Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
      attrI = Seq("ceil_mode" -> 1L),
      attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L))), nd)
    assert(mp.dims == Seq(1, 1, 3, 3))
    for (oy <- 0 until 3; ox <- 0 until 3) {
      val ys = Seq(oy * 2, oy * 2 + 1).filter(_ < h)
      val xs = Seq(ox * 2, ox * 2 + 1).filter(_ < w)
      val expect = (for (iy <- ys; ix <- xs) yield x(iy * w + ix)).max
      assert(mp.a(oy * 3 + ox) == expect, s"($oy,$ox)")
    }
    // average over REAL cells only in the tail window
    val ap = Onnx.runNd(oneNode("AveragePool", Seq("x"), Nil,
      attrI = Seq("ceil_mode" -> 1L),
      attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L))), nd)
    assert(ap.dims == Seq(1, 1, 3, 3))
    assert(ap.a(8) == x(4 * w + 4), "tail window = single real cell")
    // clamp: with end-pad 2 the ceil-extra window would START in pure
    // end-padding ((o-1)*s = in + padT) and must be dropped
    val clamped = Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
      attrI = Seq("ceil_mode" -> 1L),
      attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L),
        "pads" -> Seq(0L, 0L, 2L, 2L)),
      ), Onnx.Nd(Seq(1, 1, 4, 4), Array.tabulate(16)(_.toDouble)))
    assert(clamped.dims == Seq(1, 1, 2, 2),
      s"pad-start window must be clamped, got ${clamped.dims}")
  }

  test("conv/pool rejections: kernel_shape, auto_pad, ceil_mode, pool dilations, bad group") {
    val x = Onnx.Nd(Seq(1, 1, 4, 4), new Array[Double](16))
    val exK = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil), x)
    }
    assert(exK.getMessage.contains("kernel_shape"))
    val exA = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
        attrIs = Seq("kernel_shape" -> Seq(2L, 2L)),
        attrS = Seq("auto_pad" -> "SAME_BOGUS")), x)
    }
    assert(exA.getMessage.contains("auto_pad=SAME_BOGUS"))
    // SAME_* contradicting an explicit pads attr rejects
    val exP = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
        attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "pads" -> Seq(1L, 1L, 1L, 1L)),
        attrS = Seq("auto_pad" -> "SAME_UPPER")), x)
    }
    assert(exP.getMessage.contains("contradicts"))
    // auto_pad=NOTSET is explicitly fine
    Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
      attrIs = Seq("kernel_shape" -> Seq(2L, 2L)),
      attrS = Seq("auto_pad" -> "NOTSET")), x)
    // ceil_mode now executes; only the cross-runtime-ambiguous
    // combination with count_include_pad=1 still rejects
    val exC = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("AveragePool", Seq("x"), Nil,
        attrI = Seq("ceil_mode" -> 1L, "count_include_pad" -> 1L),
        attrIs = Seq("kernel_shape" -> Seq(2L, 2L))), x)
    }
    assert(exC.getMessage.contains("ceil_mode=1 with count_include_pad=1"))
    val exD = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("MaxPool", Seq("x"), Nil,
        attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "dilations" -> Seq(2L, 2L))), x)
    }
    assert(exD.getMessage.contains("dilation"))
    val exG = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("Conv", Seq("x", "w"),
        Seq(("w", Seq(1, 1, 3, 3), Array.fill(9)(0.125f))),
        attrI = Seq("group" -> 3L),
        attrIs = Seq("kernel_shape" -> Seq(3L, 3L))), x)
    }
    assert(exG.getMessage.contains("group"))
  }

  /** Independent residual-block reference: padded-image convs, BN, the
    * skip Add, GAP, Gemm — same accumulation orders, separate code. */
  private def resnetReference(x0: Array[Double], c: Int, h: Int, w: Int,
      e: Int): Array[Float] = {
    def conv3x3(src: Array[Double], cw: Array[Float], cb: Array[Float]): Array[Double] = {
      val ph = h + 2; val pw = w + 2
      val padded = Array.ofDim[Double](c, ph * pw)
      for (ci <- 0 until c; y <- 0 until h; xx <- 0 until w)
        padded(ci)((y + 1) * pw + (xx + 1)) = src((ci * h + y) * w + xx)
      val out = new Array[Double](c * h * w)
      for (co <- 0 until c; oy <- 0 until h; ox <- 0 until w) {
        var acc = 0.0
        for (ci <- 0 until c; ky <- 0 until 3; kx <- 0 until 3)
          acc += padded(ci)((oy + ky) * pw + (ox + kx)) *
                 cw(((co * c + ci) * 3 + ky) * 3 + kx)
        out((co * h + oy) * w + ox) = acc + cb(co)
      }
      out
    }
    val bs = OnnxWriter.bnScale(c); val bb = OnnxWriter.bnBias(c)
    val bm = OnnxWriter.bnMean(c); val bv = OnnxWriter.bnVar(c)
    val c1 = conv3x3(x0, OnnxWriter.convW(c, c), OnnxWriter.convB(c))
    val n1 = Array.tabulate(c * h * w) { i =>
      val ci = i / (h * w)
      val std = math.sqrt(bv(ci) + OnnxWriter.BnEps.toDouble)
      (c1(i) - bm(ci)) * bs(ci) / std + bb(ci)
    }
    val r1 = n1.map(v => if (v > 0) v else 0.0)
    val c2 = conv3x3(r1, OnnxWriter.convW(c, c, seed = 5), OnnxWriter.convB(c))
    val r2 = Array.tabulate(c * h * w) { i =>
      val v = c2(i) + x0(i) // the skip connection
      if (v > 0) v else 0.0
    }
    val g = Array.tabulate(c) { ci =>
      var acc = 0.0
      for (i <- 0 until h * w) acc += r2(ci * h * w + i)
      acc / (h * w)
    }
    val gw = OnnxWriter.gemmW(c, e); val gb = OnnxWriter.gemmB(e)
    Array.tabulate(e) { k =>
      var acc = 0.0
      for (ci <- 0 until c) acc += g(ci) * gw(ci * e + k)
      (acc + gb(k)).toFloat
    }
  }

  test("residual block (skip-connection Add on NCHW) matches the reference bit-for-bit") {
    val (c, h, w, e) = (3, 5, 7, 4)
    val model = new Onnx.OnnxModel(OnnxWriter.resnetBlockBytes(c, e),
      tileDims = Some(Seq(c, h, w)))
    assert(model.inputDim == c * h * w && model.embDim == e)
    val tiles = Seq(
      Array.tabulate(c * h * w)(i => ((i * 11) % 23) / 8.0 - 1.25),
      Array.fill(c * h * w)(0.5),
      Array.tabulate(c * h * w)(i => math.sin(i * 0.3) * 2.0))
    model.embedBatch(tiles).zip(tiles).foreach { case (emb, x) =>
      assert(emb.toSeq == resnetReference(x, c, h, w, e).toSeq)
    }
  }

  test("embedTiles runs the conv model end-to-end through the batch path") {
    import spark.implicits._
    val (c, h, w, m, e) = (1, 6, 6, 2, 4)
    val rows = (0 until 23).map(i =>
      (i.toLong, Array.tabulate(c * h * w)(j => ((i * 31 + j * 7) % 19) / 8.0 - 1.0)))
    val out = Inference.embedTiles(rows.toDF("tile_id", "values"), "tile_id", "values",
      new Onnx.OnnxModel(OnnxWriter.convModelBytes(c, m, e), tileDims = Some(Seq(c, h, w))),
      batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, x) =>
      assert(out(id) ==
        convReference(x, c, h, w, m, e, Seq(0, 0, 0, 0), Seq(1, 1)).toSeq, s"tile $id")
    }
  }

  // --------------------------------------------- transformer-encoder ops
  test("elementwise binary ops broadcast numpy-style: Sub, Mul, Div, Pow, Add") {
    val x = Array.tabulate(24)(i => (i + 1) * 0.5)
    val nd = Onnx.Nd(Seq(2, 3, 4), x)
    // [2,3,4] op [4]: per-last-dim vector
    val v4 = Array.tabulate(4)(i => (i + 1) * 0.25f)
    def run1(op: String, w: (String, Seq[Int], Array[Float])) =
      Onnx.runNd(oneNode(op, Seq("x", w._1), Seq(w)), nd)
    val sub = run1("Sub", ("w", Seq(4), v4))
    x.indices.foreach(i => assert(sub.a(i) == x(i) - v4(i % 4).toDouble))
    val mul = run1("Mul", ("w", Seq(4), v4))
    x.indices.foreach(i => assert(mul.a(i) == x(i) * v4(i % 4).toDouble))
    val div = run1("Div", ("w", Seq(4), v4))
    x.indices.foreach(i => assert(div.a(i) == x(i) / v4(i % 4).toDouble))
    val pow = run1("Pow", ("w", Seq(1), Array(2.0f)))
    x.indices.foreach(i => assert(pow.a(i) == math.pow(x(i), 2.0)))
    // [2,3,4] op [3,1]: right-aligned rank promotion + size-1 stretch —
    // the LayerNorm-centering shape ([B,S,H] - [B,S,1] in miniature)
    val m31 = Array.tabulate(3)(i => (i - 1).toFloat)
    val sub2 = Onnx.runNd(oneNode("Sub", Seq("x", "w"), Seq(("w", Seq(3, 1), m31))), nd)
    for (b <- 0 until 2; s <- 0 until 3; h <- 0 until 4)
      assert(sub2.a((b * 3 + s) * 4 + h) == x((b * 3 + s) * 4 + h) - m31(s).toDouble)
    // incompatible shapes reject loudly
    val bad = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("Sub", Seq("x", "w"), Seq(("w", Seq(5), v4 ++ Array(0f)))), nd)
    }
    assert(bad.getMessage.contains("broadcast"))
  }

  test("unary ops match math references: Sqrt, Exp, Neg, Erf (known table values)") {
    val x = Array(0.0, 0.25, 1.0, 2.25, 4.0, 0.5625)
    val nd = Onnx.Nd(Seq(6), x)
    val sq = Onnx.runNd(oneNode("Sqrt", Seq("x"), Nil), nd)
    assert(sq.a.toSeq == Seq(0.0, 0.5, 1.0, 1.5, 2.0, 0.75))
    val ex = Onnx.runNd(oneNode("Exp", Seq("x"), Nil), nd)
    x.indices.foreach(i => assert(ex.a(i) == math.exp(x(i))))
    val ng = Onnx.runNd(oneNode("Neg", Seq("x"), Nil), nd)
    x.indices.foreach(i => assert(ng.a(i) == -x(i)))
    // erf against published table values (Abramowitz & Stegun)
    val ev = Onnx.runNd(oneNode("Erf", Seq("x"), Nil),
      Onnx.Nd(Seq(5), Array(0.0, 0.5, 1.0, -1.0, 2.0)))
    val table = Seq(0.0, 0.5204998778130465, 0.8427007929497149,
      -0.8427007929497149, 0.9953222650189527)
    ev.a.toSeq.zip(table).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-15, s"erf: $got vs $want")
    }
  }

  test("Gelu: exact-erf and tanh variants match their published formulas") {
    val x = Array.tabulate(11)(i => (i - 5) * 0.7)
    val nd = Onnx.Nd(Seq(11), x)
    val exact = Onnx.runNd(oneNode("Gelu", Seq("x"), Nil), nd)
    x.indices.foreach { i =>
      val want = 0.5 * x(i) * (1.0 + Onnx.erf(x(i) * 0.7071067811865476))
      assert(exact.a(i) == want, s"exact gelu at ${x(i)}")
    }
    val tanh = Onnx.runNd(oneNode("Gelu", Seq("x"), Nil,
      attrS = Seq("approximate" -> "tanh")), nd)
    x.indices.foreach { i =>
      val v = x(i)
      val want = 0.5 * v * (1.0 + math.tanh(0.7978845608028654 * (v + 0.044715 * (v * v * v))))
      assert(tanh.a(i) == want, s"tanh gelu at $v")
    }
    val bad = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("Gelu", Seq("x"), Nil,
        attrS = Seq("approximate" -> "sigmoid")), nd)
    }
    assert(bad.getMessage.contains("sigmoid"))
  }

  test("batched MatMul: [B,S,H]x[H,N] and [B,S,H]x[B,H,S] match loop references") {
    val (b, s, h, n) = (2, 3, 4, 5)
    val x = Array.tabulate(b * s * h)(i => ((i * 7) % 11) * 0.25 - 1.0)
    val nd = Onnx.Nd(Seq(b, s, h), x)
    // shared projection: rank-3 x rank-2 broadcasts the weight
    val w = Array.tabulate(h * n)(i => (((i * 3) % 9) - 4) / 8.0f)
    val got = Onnx.runNd(oneNode("MatMul", Seq("x", "w"), Seq(("w", Seq(h, n), w))), nd)
    assert(got.dims == Seq(b, s, n))
    for (b0 <- 0 until b; i <- 0 until s; j <- 0 until n) {
      var acc = 0.0
      for (k <- 0 until h) acc += x((b0 * s + i) * h + k) * w(k * n + j).toDouble
      assert(got.a((b0 * s + i) * n + j) == acc, s"b=$b0 i=$i j=$j")
    }
    // attention scores: rank-3 x rank-3 (same batch), via in-graph Transpose
    val g2 = Onnx.parseModel(OnnxWriter.model(
      nodes = Seq(
        OnnxWriter.NodeSpec("Transpose", Seq("x"), Seq("xt"),
          attrIs = Seq("perm" -> Seq(0L, 2L, 1L))),
        OnnxWriter.NodeSpec("MatMul", Seq("x", "xt"), Seq("y"))),
      initializers = Seq(("unused", Seq(1), Array(0.0f), true)),
      inputName = "x", outputName = "y"))
    val sc = Onnx.runNd(g2, nd)
    assert(sc.dims == Seq(b, s, s))
    for (b0 <- 0 until b; i <- 0 until s; j <- 0 until s) {
      var acc = 0.0
      for (k <- 0 until h) acc += x((b0 * s + i) * h + k) * x((b0 * s + j) * h + k)
      assert(sc.a((b0 * s + i) * s + j) == acc, s"b=$b0 i=$i j=$j")
    }
  }

  test("LayerNormalization (fused) matches a loop reference; optional bias; bad axis rejects") {
    val (b, s, h) = (2, 3, 4)
    val x = Array.tabulate(b * s * h)(i => ((i * 13) % 17) * 0.5 - 3.0)
    val nd = Onnx.Nd(Seq(b, s, h), x)
    val scale = Array.tabulate(h)(i => (i + 2) / 8.0f)
    val bias = Array.tabulate(h)(i => (i - 1) / 8.0f)
    val got = Onnx.runNd(oneNode("LayerNormalization", Seq("x", "sc", "bi"),
      Seq(("sc", Seq(h), scale), ("bi", Seq(h), bias)),
      attrF = Seq("epsilon" -> 0.25f)), nd)
    assert(got.dims == Seq(b, s, h))
    for (o <- 0 until b * s) {
      var sum = 0.0
      for (i <- 0 until h) sum += x(o * h + i)
      val mu = sum / h
      var vs = 0.0
      for (i <- 0 until h) { val c = x(o * h + i) - mu; vs += c * c }
      val sd = math.sqrt(vs / h + 0.25)
      for (i <- 0 until h)
        assert(got.a(o * h + i) == (x(o * h + i) - mu) / sd * scale(i).toDouble + bias(i).toDouble,
          s"row $o dim $i")
    }
    // no-bias form (two-input export): reference recomputed directly —
    // (v + bias) - bias is NOT a float identity
    val nb = Onnx.runNd(oneNode("LayerNormalization", Seq("x", "sc"),
      Seq(("sc", Seq(h), scale)), attrF = Seq("epsilon" -> 0.25f)), nd)
    for (o <- 0 until b * s) {
      var sum = 0.0
      for (i <- 0 until h) sum += x(o * h + i)
      val mu = sum / h
      var vs = 0.0
      for (i <- 0 until h) { val c = x(o * h + i) - mu; vs += c * c }
      val sd = math.sqrt(vs / h + 0.25)
      for (i <- 0 until h)
        assert(nb.a(o * h + i) == (x(o * h + i) - mu) / sd * scale(i).toDouble + 0.0)
    }
    val bad = intercept[IllegalArgumentException] {
      Onnx.runNd(oneNode("LayerNormalization", Seq("x", "sc"),
        Seq(("sc", Seq(h), scale)), attrI = Seq("axis" -> 5L)), nd)
    }
    assert(bad.getMessage.contains("axis"))
  }

  /** Independent transformer-encoder reference: plain nested loops over
    * the OnnxWriter fixture weights, no shared code with the executor,
    * same accumulation ORDER at every reduction (float addition is
    * order-sensitive). Mirrors the q123 oracle's SQL restatement. */
  private def transformerReference(x: Array[Double]): Array[Float] = {
    import OnnxWriter._
    val (sT, hT, fT, eT) = (4, 4, 8, 4)
    val g1 = tfGamma(hT, 0); val be1 = tfBeta(hT, 0)
    val g2 = tfGamma(hT, 1); val be2 = tfBeta(hT, 1)
    val wq = tfW(hT, hT, 1); val wk = tfW(hT, hT, 2)
    val wv = tfW(hT, hT, 3); val wo = tfW(hT, hT, 4)
    val w1 = tfW(hT, fT, 5); val b1 = tfBeta(fT, 2)
    val w2 = tfW(fT, hT, 6); val b2 = tfBeta(hT, 3)
    val wh = tfW(hT, eT, 7); val bh = tfBeta(eT, 4)
    def layerNorm(src: Array[Double], g: Array[Float], be: Array[Float]) =
      Array.tabulate(sT * hT) { idx =>
        val i = idx / hT; val j = idx % hT
        var sum = 0.0
        for (d <- 0 until hT) sum += src(i * hT + d)
        val mu = sum / hT
        var vs = 0.0
        for (d <- 0 until hT) { val c = src(i * hT + d) - mu; vs += c * c }
        val sd = math.sqrt(vs / hT + 0.25)
        (src(i * hT + j) - mu) / sd * g(j).toDouble + be(j).toDouble
      }
    def mm(src: Array[Double], w: Array[Float], rows: Int, inner: Int, cols: Int) =
      Array.tabulate(rows * cols) { idx =>
        val i = idx / cols; val j = idx % cols
        var acc = 0.0
        for (d <- 0 until inner) acc += src(i * inner + d) * w(d * cols + j).toDouble
        acc
      }
    val ln1 = layerNorm(x, g1, be1)
    val q = mm(ln1, wq, sT, hT, hT); val k = mm(ln1, wk, sT, hT, hT)
    val v = mm(ln1, wv, sT, hT, hT)
    val attn = Array.tabulate(sT * sT) { idx =>
      val i = idx / sT; val j = idx % sT
      var acc = 0.0
      for (d <- 0 until hT) acc += q(i * hT + d) * k(j * hT + d)
      acc * 0.5
    }
    val soft = new Array[Double](sT * sT)
    for (i <- 0 until sT) {
      var mx = Double.NegativeInfinity
      for (j <- 0 until sT) if (attn(i * sT + j) > mx) mx = attn(i * sT + j)
      var sum = 0.0
      for (j <- 0 until sT) {
        val e = math.exp(attn(i * sT + j) - mx)
        soft(i * sT + j) = e; sum += e
      }
      for (j <- 0 until sT) soft(i * sT + j) /= sum
    }
    val ctx = Array.tabulate(sT * hT) { idx =>
      val i = idx / hT; val j = idx % hT
      var acc = 0.0
      for (d <- 0 until sT) acc += soft(i * sT + d) * v(d * hT + j)
      acc
    }
    val r1 = Array.tabulate(sT * hT) { idx =>
      val proj = {
        val i = idx / hT; val j = idx % hT
        var acc = 0.0
        for (d <- 0 until hT) acc += ctx(i * hT + d) * wo(d * hT + j).toDouble
        acc
      }
      x(idx) + proj
    }
    val ln2 = layerNorm(r1, g2, be2)
    val h1 = Array.tabulate(sT * fT) { idx =>
      val i = idx / fT; val m = idx % fT
      var acc = 0.0
      for (d <- 0 until hT) acc += ln2(i * hT + d) * w1(d * fT + m).toDouble
      acc + b1(m).toDouble
    }
    val gl = h1.map { vv =>
      0.5 * vv * (1.0 + math.tanh(0.7978845608028654 * (vv + 0.044715 * (vv * vv * vv))))
    }
    val r2 = Array.tabulate(sT * hT) { idx =>
      val i = idx / hT; val j = idx % hT
      var acc = 0.0
      for (m <- 0 until fT) acc += gl(i * fT + m) * w2(m * hT + j).toDouble
      r1(idx) + (acc + b2(j).toDouble)
    }
    val pool = Array.tabulate(hT) { j =>
      var acc = 0.0
      for (i <- 0 until sT) acc += r2(i * hT + j)
      acc / sT
    }
    Array.tabulate(eT) { kk =>
      var acc = 0.0
      for (j <- 0 until hT) acc += pool(j) * wh(j * eT + kk).toDouble
      (1.0 * acc + 1.0 * bh(kk).toDouble).toFloat
    }
  }

  test("transformer encoder end-to-end matches the independent reference bit-for-bit") {
    val model = new Onnx.OnnxModel(OnnxWriter.transformerModelBytes(),
      tileDims = Some(Seq(16)))
    assert(model.inputDim == 16 && model.embDim == 4)
    val tiles = Seq(
      Array.tabulate(16)(i => (i % 7) * 0.25 - 0.75),
      Array.fill(16)(0.5),
      Array.tabulate(16)(i => math.sin(i * 1.3) * 2.0),
      Array.tabulate(16)(i => ((i * 11) % 13) / 8.0 - 0.5))
    model.embedBatch(tiles).zip(tiles).foreach { case (emb, x) =>
      assert(emb.toSeq == transformerReference(x).toSeq)
    }
  }

  test("embedTiles runs the ONNX model through the partition/batch path") {
    import spark.implicits._
    val rows = (0 until 37).map(i => (i.toLong, Array.tabulate(d)(j => (i * j % 13) / 4.0)))
    val df = rows.toDF("tile_id", "values")
    val out = Inference.embedTiles(df, "tile_id", "values",
      new Onnx.OnnxModel(bytes), batchSize = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, x) =>
      assert(out(id) == reference(x).toSeq, s"tile $id")
    }
  }
}
