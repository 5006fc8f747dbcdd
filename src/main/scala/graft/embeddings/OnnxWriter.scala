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

  private def valueInfo(p: Pb, field: Int, name: String): Unit =
    p.msg(field)(_.str(1, name))

  final case class NodeSpec(opType: String, inputs: Seq[String],
      outputs: Seq[String], attrI: Seq[(String, Long)] = Nil,
      attrF: Seq[(String, Float)] = Nil)

  /** Serialize a ModelProto holding one graph of `nodes` over
    * `initializers` (name -> (dims, data, useRawEncoding)). */
  def model(nodes: Seq[NodeSpec], initializers: Seq[(String, Seq[Int], Array[Float], Boolean)],
      inputName: String, outputName: String): Array[Byte] = {
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
        }
      }
      g.str(2, "graft-mlp")
      initializers.foreach { case (nm, dims, data, raw) =>
        tensor(g, 5, nm, dims, data, raw)
      }
      valueInfo(g, 11, inputName)
      initializers.foreach { case (nm, _, _, _) => valueInfo(g, 11, nm) }
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
