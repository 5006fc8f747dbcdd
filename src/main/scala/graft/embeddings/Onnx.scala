package graft.embeddings

/** Pure-JVM reader + executor for a subset of ONNX (the public open
  * interchange format, onnx.ai/onnx/repo-docs/IR.html) — closes the M1
  * seam: `Inference.embedTiles` can now run an ACTUAL exported model
  * file instead of the LinearStubModel, with no native runtime in the
  * container.
  *
  * Reference behavior: convml_data/pipeline/embeddings/sampling.py:46-66
  * loads a trained triplet CNN and maps tiles -> embedding vectors; the
  * portable export format for such a model is ONNX, whose file is a
  * protobuf-serialized ModelProto. This reader walks the protobuf WIRE
  * FORMAT directly (varint / 64-bit / length-delimited / 32-bit records —
  * public encoding spec) so no protobuf library is needed, then executes
  * the graph with plain matrix loops.
  *
  * Supported: float tensors (raw_data or packed float_data); ops MatMul,
  * Add (row-broadcast or same-shape), Relu, Gemm (alpha/beta/transA/
  * transB) — the fully-connected MLP family — plus the convolutional
  * family the reference's actual tile model needs (a ResNet-style CNN,
  * pipeline/embeddings/sampling.py:46-66): Conv (group=1, dilation=1,
  * arbitrary strides/pads), MaxPool, BatchNormalization (inference-mode
  * affine), GlobalAveragePool, Flatten — all over NCHW rank-4 tensors.
  * Anything else is rejected LOUDLY with the op name, never silently
  * misread. Accumulation is in double, cast to float at extraction — the
  * deterministic cross-engine arithmetic the oracle recomputes
  * (Conv accumulates c_in-major then ky then kx, left to right, so the
  * SQL restatement can replay it term-by-term).
  *
  * Field numbers below are from the public onnx.proto3 schema:
  * ModelProto.graph=7; GraphProto.node=1/.initializer=5/.input=11/
  * .output=12; NodeProto.input=1/.output=2/.op_type=4/.attribute=5;
  * TensorProto.dims=1/.data_type=2/.float_data=4/.name=8/.raw_data=9;
  * AttributeProto.name=1/.f=2/.i=3/.ints=8; ValueInfoProto.name=1.
  */
object Onnx {

  // ---------------------------------------------------------------- wire
  /** One pass over a length-delimited protobuf message: invokes `f` with
    * (fieldNumber, wireType, varintValue, bytesValue) per record. Exactly
    * one of varintValue/bytesValue is meaningful per wire type. */
  private def walk(buf: Array[Byte], from: Int, to: Int)(
      f: (Int, Int, Long, (Int, Int)) => Unit): Unit = {
    var p = from
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        require(p < to, "truncated varint")
        b = buf(p) & 0xff; p += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    while (p < to) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 0 => f(field, 0, varint(), (0, 0))
        case 1 => require(p + 8 <= to, "truncated fixed64"); f(field, 1, 0L, (p, p + 8)); p += 8
        case 2 =>
          val len = varint().toInt
          require(len >= 0 && p + len <= to, s"bad length $len at $p")
          f(field, 2, 0L, (p, p + len)); p += len
        case 5 => require(p + 4 <= to, "truncated fixed32"); f(field, 5, 0L, (p, p + 4)); p += 4
        case w => throw new IllegalArgumentException(s"unsupported protobuf wire type $w (field $field)")
      }
    }
  }

  private def utf8(buf: Array[Byte], s: (Int, Int)): String =
    new String(buf, s._1, s._2 - s._1, "UTF-8")

  private def leFloat(buf: Array[Byte], at: Int): Float =
    java.lang.Float.intBitsToFloat(
      (buf(at) & 0xff) | (buf(at + 1) & 0xff) << 8 |
      (buf(at + 2) & 0xff) << 16 | (buf(at + 3) & 0xff) << 24)

  // --------------------------------------------------------------- model
  final case class Tensor(name: String, dims: Seq[Int], data: Array[Float]) {
    require(dims.product == data.length || (dims.isEmpty && data.length == 1),
      s"tensor $name: dims $dims != ${data.length} values")
  }
  final case class Node(opType: String, inputs: Seq[String], outputs: Seq[String],
      attrF: Map[String, Float], attrI: Map[String, Long],
      attrIs: Map[String, Seq[Long]] = Map.empty)
  final case class Graph(nodes: Seq[Node], initializers: Map[String, Tensor],
      inputNames: Seq[String], outputNames: Seq[String]) {
    /** Graph inputs that are not bound by an initializer = the data inputs. */
    def dataInputs: Seq[String] = inputNames.filterNot(initializers.contains)
  }

  def parseModel(bytes: Array[Byte]): Graph = {
    var graph: Option[Graph] = None
    walk(bytes, 0, bytes.length) { (field, wire, _, span) =>
      if (field == 7 && wire == 2) graph = Some(parseGraph(bytes, span))
    }
    graph.getOrElse(throw new IllegalArgumentException(
      "not an ONNX ModelProto: no graph (field 7) found"))
  }

  private def parseGraph(buf: Array[Byte], span: (Int, Int)): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    walk(buf, span._1, span._2) { (field, wire, _, s) =>
      (field, wire) match {
        case (1, 2)  => nodes += parseNode(buf, s)
        case (5, 2)  => val t = parseTensor(buf, s); inits += (t.name -> t)
        case (11, 2) => ins += valueInfoName(buf, s)
        case (12, 2) => outs += valueInfoName(buf, s)
        case _       => () // names/docs/value_info: irrelevant to execution
      }
    }
    Graph(nodes.result(), inits.result(), ins.result(), outs.result())
  }

  private def valueInfoName(buf: Array[Byte], span: (Int, Int)): String = {
    var name = ""
    walk(buf, span._1, span._2) { (field, wire, _, s) =>
      if (field == 1 && wire == 2) name = utf8(buf, s)
    }
    name
  }

  private def parseNode(buf: Array[Byte], span: (Int, Int)): Node = {
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""
    val af = Map.newBuilder[String, Float]; val ai = Map.newBuilder[String, Long]
    val ais = Map.newBuilder[String, Seq[Long]]
    walk(buf, span._1, span._2) { (field, wire, v, s) =>
      (field, wire) match {
        case (1, 2) => ins += utf8(buf, s)
        case (2, 2) => outs += utf8(buf, s)
        case (4, 2) => op = utf8(buf, s)
        case (5, 2) =>
          var aname = ""; var fOpt: Option[Float] = None; var iOpt: Option[Long] = None
          val isB = Seq.newBuilder[Long]
          walk(buf, s._1, s._2) { (f2, w2, v2, s2) =>
            (f2, w2) match {
              case (1, 2) => aname = utf8(buf, s2)
              case (2, 5) => fOpt = Some(leFloat(buf, s2._1))
              case (3, 0) => iOpt = Some(v2)
              case (8, 0) => isB += v2 // repeated int64, unpacked
              case (8, 2) => // repeated int64, packed varints
                var p2 = s2._1
                while (p2 < s2._2) {
                  var shift = 0; var v3 = 0L; var b3 = 0
                  do { b3 = buf(p2) & 0xff; p2 += 1
                       v3 |= (b3 & 0x7fL) << shift; shift += 7 } while ((b3 & 0x80) != 0)
                  isB += v3
                }
              case _      => ()
            }
          }
          fOpt.foreach(x => af += (aname -> x))
          iOpt.foreach(x => ai += (aname -> x))
          val ints = isB.result()
          if (ints.nonEmpty) ais += (aname -> ints)
        case _ => ()
      }
    }
    Node(op, ins.result(), outs.result(), af.result(), ai.result(), ais.result())
  }

  private def parseTensor(buf: Array[Byte], span: (Int, Int)): Tensor = {
    val dims = Seq.newBuilder[Int]
    var dtype = 0L; var name = ""
    var raw: Option[(Int, Int)] = None
    var packed: Option[(Int, Int)] = None
    walk(buf, span._1, span._2) { (field, wire, v, s) =>
      (field, wire) match {
        case (1, 0) => dims += v.toInt
        case (2, 0) => dtype = v
        case (8, 2) => name = utf8(buf, s)
        case (9, 2) => raw = Some(s)
        case (4, 2) => packed = Some(s)          // packed float_data
        case (4, 5) => packed = Some(s)          // unpacked single float
        case _      => ()
      }
    }
    require(dtype == 1, // TensorProto.DataType.FLOAT
      s"tensor $name: only float32 initializers supported, got data_type=$dtype")
    val data = (raw, packed) match {
      case (Some((a, b)), _) =>
        require((b - a) % 4 == 0, s"tensor $name: raw_data not 4-byte aligned")
        Array.tabulate((b - a) / 4)(i => leFloat(buf, a + 4 * i))
      case (_, Some((a, b))) =>
        Array.tabulate((b - a) / 4)(i => leFloat(buf, a + 4 * i))
      case _ => throw new IllegalArgumentException(s"tensor $name: no data")
    }
    Tensor(name, dims.result(), data)
  }

  // ------------------------------------------------------------ executor
  /** Row-major matrix with double accumulation. */
  final case class Mat(rows: Int, cols: Int, a: Array[Double])

  private def toMat(t: Tensor): Mat = t.dims match {
    case Seq(r, c) => Mat(r, c, t.data.map(_.toDouble))
    case Seq(n)    => Mat(1, n, t.data.map(_.toDouble))
    case d => throw new IllegalArgumentException(
      s"tensor ${t.name}: rank ${d.size} unsupported (MLP subset is rank <= 2)")
  }

  private def matmul(x: Mat, y: Mat, transA: Boolean, transB: Boolean,
      alpha: Double): Mat = {
    val (ar, ac) = if (transA) (x.cols, x.rows) else (x.rows, x.cols)
    val (br, bc) = if (transB) (y.cols, y.rows) else (y.rows, y.cols)
    require(ac == br, s"matmul shape mismatch: ($ar,$ac) x ($br,$bc)")
    val out = new Array[Double](ar * bc)
    var i = 0
    while (i < ar) {
      var j = 0
      while (j < bc) {
        var acc = 0.0
        var k = 0
        while (k < ac) {
          val av = if (transA) x.a(k * x.cols + i) else x.a(i * x.cols + k)
          val bv = if (transB) y.a(j * y.cols + k) else y.a(k * y.cols + j)
          acc += av * bv
          k += 1
        }
        out(i * bc + j) = alpha * acc
        j += 1
      }
      i += 1
    }
    Mat(ar, bc, out)
  }

  /** Add with ONNX-style row broadcast: same shape, or a [1,cols] /
    * [cols]-shaped bias added to every row, scaled by beta (Gemm's C). */
  private def addBias(x: Mat, b: Mat, beta: Double): Mat = {
    val out = new Array[Double](x.a.length)
    if (b.rows == x.rows && b.cols == x.cols) {
      var i = 0
      while (i < out.length) { out(i) = x.a(i) + beta * b.a(i); i += 1 }
    } else {
      require(b.rows == 1 && b.cols == x.cols,
        s"add broadcast mismatch: (${x.rows},${x.cols}) + (${b.rows},${b.cols})")
      var i = 0
      while (i < x.rows) {
        var j = 0
        while (j < x.cols) {
          out(i * x.cols + j) = x.a(i * x.cols + j) + beta * b.a(j); j += 1
        }
        i += 1
      }
    }
    Mat(x.rows, x.cols, out)
  }

  /** Execute the graph on one dense [batch, dim] input. ONNX requires
    * nodes in SSA topological order, so a single forward pass suffices. */
  def run(g: Graph, input: Mat): Mat = {
    require(g.dataInputs.size == 1,
      s"expected exactly one data input, got ${g.dataInputs}")
    val env = scala.collection.mutable.Map[String, Mat](g.dataInputs.head -> input)
    g.initializers.foreach { case (n, t) => env(n) = toMat(t) }
    def in(node: Node, i: Int): Mat = env.getOrElse(node.inputs(i),
      throw new IllegalArgumentException(s"${node.opType}: unbound input '${node.inputs(i)}'"))
    g.nodes.foreach { n =>
      val out = n.opType match {
        case "MatMul" => matmul(in(n, 0), in(n, 1), transA = false, transB = false, 1.0)
        case "Add"    => addBias(in(n, 0), in(n, 1), 1.0)
        case "Relu"   =>
          val x = in(n, 0)
          Mat(x.rows, x.cols, x.a.map(v => if (v > 0) v else 0.0))
        case "Gemm" =>
          val mm = matmul(in(n, 0), in(n, 1),
            transA = n.attrI.getOrElse("transA", 0L) != 0L,
            transB = n.attrI.getOrElse("transB", 0L) != 0L,
            alpha = n.attrF.getOrElse("alpha", 1.0f).toDouble)
          if (n.inputs.size >= 3)
            addBias(mm, in(n, 2), n.attrF.getOrElse("beta", 1.0f).toDouble)
          else mm
        case other => throw new IllegalArgumentException(
          s"unsupported ONNX op '$other' (subset: MatMul, Add, Relu, Gemm)")
      }
      env(n.outputs.head) = out
    }
    val outName = g.outputNames.headOption.getOrElse(
      throw new IllegalArgumentException("graph has no declared output"))
    env.getOrElse(outName,
      throw new IllegalArgumentException(s"graph output '$outName' never produced"))
  }

  /** [[Inference.TileModel]] backed by a parsed ONNX file: the real M1
    * path (LinearStubModel remains the zero-dependency fallback). The
    * serialized form ships the raw bytes to executors; each partition
    * parses once in init() — the same amortization the reference gets
    * from loading the torch checkpoint once per worker. */
  final class OnnxModel(modelBytes: Array[Byte]) extends Inference.TileModel {
    @transient private var graph: Graph = _
    // parsed eagerly on the driver too: surface a malformed model at
    // plan-build time, and expose input/emb dims for validation
    private val (inDim, outDim) = {
      val g = Onnx.parseModel(modelBytes)
      val probe = Onnx.run(g, Mat(1, firstWeightRows(g), new Array[Double](firstWeightRows(g))))
      (firstWeightRows(g), probe.cols)
    }
    private def firstWeightRows(g: Graph): Int = {
      val firstOp = g.nodes.headOption.getOrElse(
        throw new IllegalArgumentException("empty ONNX graph"))
      val w = firstOp.inputs.collectFirst {
        case n if g.initializers.contains(n) => g.initializers(n)
      }.getOrElse(throw new IllegalArgumentException(
        s"first node ${firstOp.opType} has no initializer input"))
      w.dims.head
    }
    def inputDim: Int = inDim
    override def embDim: Int = outDim
    override def init(): Unit = { graph = Onnx.parseModel(modelBytes) }
    override def embedBatch(tiles: Seq[Array[Double]]): Seq[Array[Float]] = {
      if (graph == null) graph = Onnx.parseModel(modelBytes) // driver-side use
      if (tiles.isEmpty) return Seq.empty
      tiles.foreach(t => require(t.length == inDim,
        s"tile length ${t.length} != model input dim $inDim"))
      val in = new Array[Double](tiles.size * inDim)
      tiles.zipWithIndex.foreach { case (t, i) =>
        System.arraycopy(t, 0, in, i * inDim, inDim)
      }
      val out = Onnx.run(graph, Mat(tiles.size, inDim, in))
      (0 until out.rows).map { i =>
        Array.tabulate(out.cols)(j => out.a(i * out.cols + j).toFloat)
      }
    }
  }
}
