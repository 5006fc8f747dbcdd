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
