package graft.embeddings

/** Minimal ONNX writer: serializes a fully-connected MLP
  * (Gemm -> Relu -> MatMul -> Add) as a protobuf ModelProto, byte-for-byte
  * per the public wire-format spec — the export side of [[Onnx]], used by
  * specs and the q82 oracle query to produce REAL .onnx files the reader
  * then loads (independent encode/decode paths, the HDF5 round-trip
  * pattern).
  *
  * Weight tensors are written through BOTH public encodings — raw_data
  * (field 9, little-endian bytes) and packed float_data (field 4) — so a
  * round-trip exercises each decode branch.
  */
object OnnxWriter {

  // ------------------------------------------------------------- encoder
  final class Pb {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v: Long): Pb = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    private def tag(field: Int, wire: Int): Pb = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Pb = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Pb = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def str(field: Int, s: String): Pb = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int)(f: Pb => Unit): Pb = {
      val sub = new Pb; f(sub); bytes(field, sub.bytes)
    }
    def float32(field: Int, v: Float): Pb = {
      tag(field, 5)
      val bits = java.lang.Float.floatToIntBits(v)
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
      this
    }
  }

  private def leFloats(vs: Array[Float]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(vs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat)
    b.array()
  }

  /** TensorProto: dims=1, data_type=2 (FLOAT=1), name=8, and the data via
    * raw_data (field 9) or packed float_data (field 4). */
  private def tensor(p: Pb, field: Int, name: String, dims: Seq[Int],
      data: Array[Float], raw: Boolean): Unit =
    p.msg(field) { t =>
      dims.foreach(d => t.int(1, d.toLong))
      t.int(2, 1L) // FLOAT
      t.str(8, name)
      if (raw) t.bytes(9, leFloats(data))
      else t.bytes(4, leFloats(data)) // packed repeated float
    }

  /** INT64 TensorProto (data_type 7) — the shape/pads side inputs of
    * Reshape/Pad/Clip-era graphs: raw_data 8-byte LE, or packed
    * int64_data varints (field 7) — the two encodings exporters emit. */
  private def tensorI64(p: Pb, field: Int, name: String, dims: Seq[Int],
      data: Array[Long], raw: Boolean): Unit =
    p.msg(field) { t =>
      dims.foreach(d => t.int(1, d.toLong))
      t.int(2, 7L) // INT64
      t.str(8, name)
      if (raw) {
        val b = java.nio.ByteBuffer.allocate(data.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        data.foreach(b.putLong)
        t.bytes(9, b.array())
      } else {
        val packed = new Pb
        data.foreach(packed.varint)
        t.bytes(7, packed.bytes)
      }
    }

  private def valueInfo(p: Pb, field: Int, name: String): Unit =
    p.msg(field)(_.str(1, name))

  final case class NodeSpec(opType: String, inputs: Seq[String],
      outputs: Seq[String], attrI: Seq[(String, Long)] = Nil,
      attrF: Seq[(String, Float)] = Nil,
      attrIs: Seq[(String, Seq[Long])] = Nil,
      attrS: Seq[(String, String)] = Nil)

  /** Serialize a ModelProto holding one graph of `nodes` over
    * `initializers` (name -> (dims, data, useRawEncoding)). */
  def model(nodes: Seq[NodeSpec], initializers: Seq[(String, Seq[Int], Array[Float], Boolean)],
      inputName: String, outputName: String,
      int64Initializers: Seq[(String, Seq[Int], Array[Long], Boolean)] = Nil): Array[Byte] = {
    val p = new Pb
    p.int(1, 8L) // ir_version
    p.msg(7) { g => // ModelProto.graph
      nodes.foreach { n =>
        g.msg(1) { np => // GraphProto.node
          n.inputs.foreach(np.str(1, _))
          n.outputs.foreach(np.str(2, _))
          np.str(4, n.opType)
          n.attrI.foreach { case (an, av) =>
            np.msg(5)(a => { a.str(1, an); a.int(3, av) })
          }
          n.attrF.foreach { case (an, av) =>
            np.msg(5)(a => { a.str(1, an); a.float32(2, av) })
          }
          n.attrS.foreach { case (an, av) =>
            np.msg(5)(a => { a.str(1, an); a.str(4, av) }) // AttributeProto.s
          }
          // repeated int64 (AttributeProto.ints, field 8): "pads" written
          // PACKED (one wire-2 record of concatenated varints), everything
          // else unpacked (one wire-0 record per value) — both public
          // encodings, so the reader's two branches are each exercised by
          // any conv model round-trip
          n.attrIs.foreach { case (an, avs) =>
            np.msg(5) { a =>
              a.str(1, an)
              if (an == "pads") {
                val packed = new Pb
                avs.foreach(packed.varint)
                a.bytes(8, packed.bytes)
              } else avs.foreach(a.int(8, _))
            }
          }
        }
      }
      g.str(2, "graft-mlp")
      initializers.foreach { case (nm, dims, data, raw) =>
        tensor(g, 5, nm, dims, data, raw)
      }
      int64Initializers.foreach { case (nm, dims, data, raw) =>
        tensorI64(g, 5, nm, dims, data, raw)
      }
      valueInfo(g, 11, inputName)
      initializers.foreach { case (nm, _, _, _) => valueInfo(g, 11, nm) }
      int64Initializers.foreach { case (nm, _, _, _) => valueInfo(g, 11, nm) }
      valueInfo(g, 12, outputName)
    }
    p.bytes
  }

  // ------------------------------------------- deterministic fixture MLP
  /** Exact-in-float32 weights (multiples of 1/8: integer numerators over a
    * power of two survive float->double widening bit-identically, so the
    * DuckDB oracle can restate them as `int/8.0` double literals). */
  def w1(d: Int, h: Int): Array[Float] =
    Array.tabulate(d * h) { idx =>
      val i = idx / h; val j = idx % h
      (((i * 7 + j * 3) % 11) - 5) / 8.0f
    }
  def b1(h: Int): Array[Float] = Array.tabulate(h)(j => ((j % 5) - 2) / 8.0f)
  def w2(h: Int, e: Int): Array[Float] =
    Array.tabulate(h * e) { idx =>
      val j = idx / e; val k = idx % e
      (((j * 5 + k * 2) % 9) - 4) / 8.0f
    }
  def b2(e: Int): Array[Float] = Array.tabulate(e)(k => ((k % 3) - 1) / 8.0f)

  // ------------------------------------------ deterministic fixture CNN
  /** Conv-family fixture weights, exact eighths like the MLP's (so oracle
    * SQL restates them as exact double literals). Conv weight is
    * [m, c, 3, 3] row-major; Gemm weight is [gIn, gOut]. */
  def convW(m: Int, c: Int, seed: Int = 0): Array[Float] =
    Array.tabulate(m * c * 9)(idx => (((idx * 7 + seed * 3) % 11) - 5) / 8.0f)
  def convB(m: Int): Array[Float] = Array.tabulate(m)(i => ((i % 5) - 2) / 8.0f)
  def bnScale(c: Int): Array[Float] = Array.tabulate(c)(i => (4 + (i * 3) % 7) / 8.0f)
  def bnBias(c: Int): Array[Float] = Array.tabulate(c)(i => ((i % 7) - 3) / 8.0f)
  /** BN mean: exact eighths. */
  def bnMean(c: Int): Array[Float] = Array.tabulate(c)(i => ((i % 3) - 1) / 8.0f)
  /** BN var chosen so var + epsilon(=0.25) is an exact square (1.0 or
    * 2.25): sqrt is then EXACT, not merely correctly-rounded, and the
    * whole BN step is exact rational double arithmetic on both engines. */
  def bnVar(c: Int): Array[Float] = Array.tabulate(c)(i => if (i % 2 == 0) 0.75f else 2.0f)
  val BnEps: Float = 0.25f
  def gemmW(gIn: Int, gOut: Int): Array[Float] =
    Array.tabulate(gIn * gOut)(idx => (((idx * 5) % 9) - 4) / 8.0f)
  def gemmB(gOut: Int): Array[Float] = Array.tabulate(gOut)(k => ((k % 3) - 1) / 8.0f)

  /** The conv fixture: x[N,c,h,w] -> Conv(m filters, 3x3) -> Relu ->
    * MaxPool(2x2, strides EXPLICITLY 2x2 — the ONNX default is stride 1,
    * so non-overlapping pooling must say so) -> BatchNormalization
    * (eps=0.25) -> GlobalAveragePool -> Flatten(axis default, attr
    * omitted) -> Gemm(m -> e). Mirrors the reference's actual model
    * family (a CNN backbone + projection head,
    * pipeline/embeddings/sampling.py:46-66). `pads`/`strides`
    * parameterize the Conv for spec coverage; pads uses the packed ints
    * encoding, strides/kernel_shape the unpacked one. */
  def convModelBytes(c: Int, m: Int, e: Int,
      pads: Seq[Long] = Seq(0L, 0L, 0L, 0L),
      strides: Seq[Long] = Seq(1L, 1L)): Array[Byte] =
    model(
      nodes = Seq(
        NodeSpec("Conv", Seq("x", "cw", "cb"), Seq("c_pre"),
          attrI = Seq("group" -> 1L),
          attrIs = Seq("kernel_shape" -> Seq(3L, 3L), "pads" -> pads,
            "strides" -> strides, "dilations" -> Seq(1L, 1L))),
        NodeSpec("Relu", Seq("c_pre"), Seq("c_act")),
        NodeSpec("MaxPool", Seq("c_act"), Seq("pooled"),
          attrIs = Seq("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L))),
        NodeSpec("BatchNormalization",
          Seq("pooled", "bn_s", "bn_b", "bn_m", "bn_v"), Seq("normed"),
          attrF = Seq("epsilon" -> BnEps)),
        NodeSpec("GlobalAveragePool", Seq("normed"), Seq("gap")),
        NodeSpec("Flatten", Seq("gap"), Seq("flat")),
        NodeSpec("Gemm", Seq("flat", "gw", "gb"), Seq("emb"),
          attrI = Seq("transA" -> 0L, "transB" -> 0L),
          attrF = Seq("alpha" -> 1.0f, "beta" -> 1.0f))),
      initializers = Seq(
        ("cw", Seq(m, c, 3, 3), convW(m, c), true),
        ("cb", Seq(m), convB(m), false),
        ("bn_s", Seq(m), bnScale(m), true),
        ("bn_b", Seq(m), bnBias(m), false),
        ("bn_m", Seq(m), bnMean(m), true),
        ("bn_v", Seq(m), bnVar(m), false),
        ("gw", Seq(m, e), gemmW(m, e), true),
        ("gb", Seq(e), gemmB(e), false)),
      inputName = "x", outputName = "emb")

  /** A full RESIDUAL block — the structural element of the reference's
    * actual backbone family (a ResNet-style CNN,
    * pipeline/embeddings/sampling.py:46-66): two pad-1 3x3 convs with a
    * BatchNorm and Relus, the skip-connection Add(conv_out, x) on the
    * rank-4 NCHW tensors, then the GAP -> Flatten -> Gemm head. */
  def resnetBlockBytes(c: Int, e: Int): Array[Byte] = {
    val convAttrs = Seq("kernel_shape" -> Seq(3L, 3L), "pads" -> Seq(1L, 1L, 1L, 1L),
      "strides" -> Seq(1L, 1L), "dilations" -> Seq(1L, 1L))
    model(
      nodes = Seq(
        NodeSpec("Conv", Seq("x", "w1", "c1b"), Seq("c1"), attrIs = convAttrs),
        NodeSpec("BatchNormalization",
          Seq("c1", "bn_s", "bn_b", "bn_m", "bn_v"), Seq("n1"),
          attrF = Seq("epsilon" -> BnEps)),
        NodeSpec("Relu", Seq("n1"), Seq("r1")),
        NodeSpec("Conv", Seq("r1", "w2", "c2b"), Seq("c2"), attrIs = convAttrs),
        NodeSpec("Add", Seq("c2", "x"), Seq("res")), // the skip connection
        NodeSpec("Relu", Seq("res"), Seq("r2")),
        NodeSpec("GlobalAveragePool", Seq("r2"), Seq("gap")),
        NodeSpec("Flatten", Seq("gap"), Seq("flat")),
        NodeSpec("Gemm", Seq("flat", "gw", "gb"), Seq("emb"),
          attrI = Seq("transA" -> 0L, "transB" -> 0L),
          attrF = Seq("alpha" -> 1.0f, "beta" -> 1.0f))),
      initializers = Seq(
        ("w1", Seq(c, c, 3, 3), convW(c, c), true),
        ("c1b", Seq(c), convB(c), false),
        ("bn_s", Seq(c), bnScale(c), true),
        ("bn_b", Seq(c), bnBias(c), false),
        ("bn_m", Seq(c), bnMean(c), true),
        ("bn_v", Seq(c), bnVar(c), false),
        ("w2", Seq(c, c, 3, 3), convW(c, c, seed = 5), true),
        ("c2b", Seq(c), convB(c), false),
        ("gw", Seq(c, e), gemmW(c, e), true),
        ("gb", Seq(e), gemmB(e), false)),
      inputName = "x", outputName = "emb")
  }

  // ------------------------------- deterministic transformer fixture
  /** Transformer weights, exact eighths (seed varies the cycle phase so
    * every projection matrix differs). */
  def tfW(rows: Int, cols: Int, seed: Int): Array[Float] =
    Array.tabulate(rows * cols)(idx => (((idx * 5 + seed * 7) % 9) - 4) / 8.0f)
  /** LayerNorm scale: strictly positive eighths (0.25 .. 0.75). */
  def tfGamma(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (((i * 3 + seed) % 5) + 2) / 8.0f)
  /** LayerNorm / MLP bias: signed eighths. */
  def tfBeta(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (((i * 5 + seed) % 7) - 3) / 8.0f)
  /** LN epsilon: an exact quarter, so var + eps is exact rational double
    * arithmetic on both engines (sqrt is then IEEE correctly rounded of
    * the SAME argument — bit-identical cross-engine). */
  val TfEps: Float = 0.25f

  /** A one-block transformer ENCODER over S=4 tokens of H=4 dims (input
    * x[N,16], reshaped in-graph), the architecture of a sentence-embedding
    * export (reference analog pipeline/embeddings/sampling.py:46-66 loads
    * the trained embedding model; the text-embedding equivalent is a
    * BERT-family encoder):
    *
    *   x3   = Reshape(x, [-1,4,4])
    *   ln1  = LayerNorm decomposed to primitives — ReduceMean / Sub /
    *          Mul / Add(eps) / Sqrt / Div / Mul(scale) / Add(bias) —
    *          exactly the op chain a PyTorch opset<17 export emits
    *   attn = Softmax(MatMul(q, k^T) * 0.5) @ v with q/k/v = ln1 @ W,
    *          batched rank-3 MatMuls, Transpose perm [0,2,1]
    *   r1   = x3 + attn @ Wo                  (pre-LN residual)
    *   ln2  = fused LayerNormalization(r1)    (the opset-17 form)
    *   mlp  = (Gelu_tanh(ln2 @ W1 + b1)) @ W2 + b2
    *   r2   = r1 + mlp
    *   emb  = Gemm(ReduceMean(r2, axis=1), Wh, bh)   [N,4]
    *
    * Both LayerNorm forms (decomposed + fused) and the tanh Gelu are
    * exercised; weights are exact eighths so the q123 oracle restates
    * every sum term-by-term. */
  def transformerModelBytes(): Array[Byte] =
    model(
      nodes = Seq(
        NodeSpec("Reshape", Seq("x", "shape3"), Seq("x3")),
        // --- ln1: the decomposed (opset < 17) LayerNorm ---
        NodeSpec("ReduceMean", Seq("x3"), Seq("mu1"),
          attrI = Seq("keepdims" -> 1L), attrIs = Seq("axes" -> Seq(-1L))),
        NodeSpec("Sub", Seq("x3", "mu1"), Seq("c1")),
        NodeSpec("Mul", Seq("c1", "c1"), Seq("c1sq")),
        NodeSpec("ReduceMean", Seq("c1sq"), Seq("v1"),
          attrI = Seq("keepdims" -> 1L), attrIs = Seq("axes" -> Seq(-1L))),
        NodeSpec("Add", Seq("v1", "eps"), Seq("v1e")),
        NodeSpec("Sqrt", Seq("v1e"), Seq("sd1")),
        NodeSpec("Div", Seq("c1", "sd1"), Seq("n1")),
        NodeSpec("Mul", Seq("n1", "g1"), Seq("n1s")),
        NodeSpec("Add", Seq("n1s", "be1"), Seq("ln1")),
        // --- single-head self-attention, batched matmuls ---
        NodeSpec("MatMul", Seq("ln1", "wq"), Seq("qm")),
        NodeSpec("MatMul", Seq("ln1", "wk"), Seq("km")),
        NodeSpec("MatMul", Seq("ln1", "wv"), Seq("vm")),
        NodeSpec("Transpose", Seq("km"), Seq("kt"),
          attrIs = Seq("perm" -> Seq(0L, 2L, 1L))),
        NodeSpec("MatMul", Seq("qm", "kt"), Seq("s0")),
        NodeSpec("Mul", Seq("s0", "half"), Seq("s1")), // 1/sqrt(d)=0.5 exact
        NodeSpec("Softmax", Seq("s1"), Seq("at"), attrI = Seq("axis" -> -1L)),
        NodeSpec("MatMul", Seq("at", "vm"), Seq("ao")),
        NodeSpec("MatMul", Seq("ao", "wo"), Seq("pj")),
        NodeSpec("Add", Seq("x3", "pj"), Seq("r1")),
        // --- fused (opset 17) LayerNorm ---
        NodeSpec("LayerNormalization", Seq("r1", "g2", "be2"), Seq("ln2"),
          attrI = Seq("axis" -> -1L), attrF = Seq("epsilon" -> TfEps)),
        // --- MLP with tanh Gelu ---
        NodeSpec("MatMul", Seq("ln2", "w1"), Seq("h0")),
        NodeSpec("Add", Seq("h0", "b1"), Seq("h1")),
        NodeSpec("Gelu", Seq("h1"), Seq("gl"),
          attrS = Seq("approximate" -> "tanh")),
        NodeSpec("MatMul", Seq("gl", "w2"), Seq("m0")),
        NodeSpec("Add", Seq("m0", "b2"), Seq("m1")),
        NodeSpec("Add", Seq("r1", "m1"), Seq("r2")),
        // --- mean pooling + projection head ---
        NodeSpec("ReduceMean", Seq("r2"), Seq("pool"),
          attrI = Seq("keepdims" -> 0L), attrIs = Seq("axes" -> Seq(1L))),
        NodeSpec("Gemm", Seq("pool", "wh", "bh"), Seq("emb"),
          attrI = Seq("transA" -> 0L, "transB" -> 0L),
          attrF = Seq("alpha" -> 1.0f, "beta" -> 1.0f))),
      initializers = Seq(
        ("eps", Seq(1), Array(TfEps), true),
        ("half", Seq(1), Array(0.5f), false),
        ("g1", Seq(4), tfGamma(4, 0), true),
        ("be1", Seq(4), tfBeta(4, 0), false),
        ("g2", Seq(4), tfGamma(4, 1), true),
        ("be2", Seq(4), tfBeta(4, 1), false),
        ("wq", Seq(4, 4), tfW(4, 4, 1), true),
        ("wk", Seq(4, 4), tfW(4, 4, 2), false),
        ("wv", Seq(4, 4), tfW(4, 4, 3), true),
        ("wo", Seq(4, 4), tfW(4, 4, 4), false),
        ("w1", Seq(4, 8), tfW(4, 8, 5), true),
        ("b1", Seq(8), tfBeta(8, 2), false),
        ("w2", Seq(8, 4), tfW(8, 4, 6), true),
        ("b2", Seq(4), tfBeta(4, 3), false),
        ("wh", Seq(4, 4), tfW(4, 4, 7), true),
        ("bh", Seq(4), tfBeta(4, 4), false)),
      inputName = "x", outputName = "emb",
      int64Initializers = Seq(
        ("shape3", Seq(3), Array(-1L, 4L, 4L), true)))

  /** The canonical fixture: x[N,d] -> Gemm(+bias) -> Relu -> MatMul -> Add.
    * Uses both tensor encodings and both FC forms (Gemm with fused bias,
    * MatMul with a separate Add). */
  def mlpModelBytes(d: Int, h: Int, e: Int): Array[Byte] =
    model(
      nodes = Seq(
        NodeSpec("Gemm", Seq("x", "w1", "b1"), Seq("h_pre"),
          attrI = Seq("transA" -> 0L, "transB" -> 0L),
          attrF = Seq("alpha" -> 1.0f, "beta" -> 1.0f)),
        NodeSpec("Relu", Seq("h_pre"), Seq("h")),
        NodeSpec("MatMul", Seq("h", "w2"), Seq("o_mm")),
        NodeSpec("Add", Seq("o_mm", "b2"), Seq("emb"))),
      initializers = Seq(
        ("w1", Seq(d, h), w1(d, h), true),   // raw_data encoding
        ("b1", Seq(h), b1(h), false),        // packed float_data encoding
        ("w2", Seq(h, e), w2(h, e), false),
        ("b2", Seq(e), b2(e), true)),
      inputName = "x", outputName = "emb")
}
