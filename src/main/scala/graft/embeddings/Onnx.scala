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
  * Supported: float tensors (raw_data or packed float_data) and int64
  * shape/pads tensors (raw_data or int64_data, packed or not); ops
  * MatMul, Add (row-broadcast or same-shape), Relu, Gemm (alpha/beta/
  * transA/transB) — the fully-connected MLP family — plus the
  * convolutional family the reference's actual tile model needs (a
  * ResNet-style CNN, pipeline/embeddings/sampling.py:46-66): Conv
  * (grouped, dilated, arbitrary strides/pads), MaxPool, AveragePool,
  * Concat, BatchNormalization (inference-mode affine),
  * GlobalAveragePool, Flatten over NCHW rank-4 tensors — plus the
  * supporting ops the MobileNet/ShuffleNet export families carry:
  * Sigmoid, Tanh, LeakyRelu, Clip (attr or scalar-input bounds),
  * Transpose, Reshape (-1/0 conventions), constant Pad (attr or input
  * pads), Softmax (opset-13 axis semantics), ReduceMean — plus the
  * transformer-encoder family a sentence-embedding export (the model an
  * LLM-data pipeline runs for SemDeDup/ANN, reference analog
  * pipeline/embeddings/sampling.py:46-66) decomposes to: element-wise
  * Sub/Mul/Div/Pow (numpy multidirectional broadcast, as Add too),
  * Sqrt/Exp/Neg/Erf, batched rank>=3 MatMul with broadcast batch dims,
  * fused LayerNormalization (opset 17), and Gelu (exact-erf and tanh
  * variants) — plus the real-export surface a genuine HF
  * sentence-transformer ONNX file additionally carries: MULTIPLE int64
  * data inputs (input_ids + attention_mask), Gather (token-embedding
  * lookup), Cast, Equal/Greater/Less/Not/Where (the attention-mask
  * path), Slice/Unsqueeze/Squeeze/Expand/Shape (both the opset >= 10
  * input-carried and the legacy attr-carried parameter forms),
  * ReduceSum (opset-13 axes-as-input), Constant (tensor attr), and
  * Identity.
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

  private def leLong(buf: Array[Byte], at: Int): Long = {
    var x = 0L
    var i = 0
    while (i < 8) { x |= (buf(at + i) & 0xffL) << (8 * i); i += 1 }
    x
  }

  // --------------------------------------------------------------- model
  final case class Tensor(name: String, dims: Seq[Int], data: Array[Float]) {
    require(dims.product == data.length || (dims.isEmpty && data.length == 1),
      s"tensor $name: dims $dims != ${data.length} values")
  }
  final case class Node(opType: String, inputs: Seq[String], outputs: Seq[String],
      attrF: Map[String, Float], attrI: Map[String, Long],
      attrIs: Map[String, Seq[Long]] = Map.empty,
      attrS: Map[String, String] = Map.empty,
      attrT: Map[String, Tensor] = Map.empty)
  final case class Graph(nodes: Seq[Node], initializers: Map[String, Tensor],
      inputNames: Seq[String], outputNames: Seq[String]) {
    /** Graph inputs that are not bound by an initializer = the data inputs. */
    def dataInputs: Seq[String] = inputNames.filterNot(initializers.contains)
  }

  def parseModel(bytes: Array[Byte]): Graph = parseModel(bytes, Map.empty)

  /** Parse a ModelProto whose initializers may live OUTSIDE the model
    * file (TensorProto.data_location = EXTERNAL — how exporters ship
    * checkpoints past protobuf's 2 GB limit). `external` maps each
    * `location` key to that sibling file's bytes; on a cluster the
    * caller fetches them next to the model (same storage contract as
    * the model bytes themselves). Missing locations reject loudly. */
  def parseModel(bytes: Array[Byte], external: Map[String, Array[Byte]]): Graph = {
    var graph: Option[Graph] = None
    walk(bytes, 0, bytes.length) { (field, wire, _, span) =>
      if (field == 7 && wire == 2) graph = Some(parseGraph(bytes, span, external))
    }
    graph.getOrElse(throw new IllegalArgumentException(
      "not an ONNX ModelProto: no graph (field 7) found"))
  }

  private def parseGraph(buf: Array[Byte], span: (Int, Int),
      external: Map[String, Array[Byte]]): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    walk(buf, span._1, span._2) { (field, wire, _, s) =>
      (field, wire) match {
        case (1, 2)  => nodes += parseNode(buf, s)
        case (5, 2)  => val t = parseTensor(buf, s, external); inits += (t.name -> t)
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
    val as = Map.newBuilder[String, String]
    val at = Map.newBuilder[String, Tensor]
    walk(buf, span._1, span._2) { (field, wire, v, s) =>
      (field, wire) match {
        case (1, 2) => ins += utf8(buf, s)
        case (2, 2) => outs += utf8(buf, s)
        case (4, 2) => op = utf8(buf, s)
        case (5, 2) =>
          var aname = ""; var fOpt: Option[Float] = None; var iOpt: Option[Long] = None
          var sOpt: Option[String] = None; var tOpt: Option[Tensor] = None
          val isB = Seq.newBuilder[Long]
          walk(buf, s._1, s._2) { (f2, w2, v2, s2) =>
            (f2, w2) match {
              case (1, 2) => aname = utf8(buf, s2)
              case (2, 5) => fOpt = Some(leFloat(buf, s2._1))
              case (3, 0) => iOpt = Some(v2)
              case (4, 2) => sOpt = Some(utf8(buf, s2)) // AttributeProto.s
              case (5, 2) => tOpt = Some(parseTensor(buf, s2, Map.empty)) // AttributeProto.t
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
          sOpt.foreach(x => as += (aname -> x))
          tOpt.foreach(x => at += (aname -> x))
          val ints = isB.result()
          if (ints.nonEmpty) ais += (aname -> ints)
        case _ => ()
      }
    }
    Node(op, ins.result(), outs.result(), af.result(), ai.result(), ais.result(),
      as.result(), at.result())
  }

  private def parseTensor(buf: Array[Byte], span: (Int, Int),
      external: Map[String, Array[Byte]]): Tensor = {
    val dims = Seq.newBuilder[Int]
    var dtype = 0L; var name = ""
    var raw: Option[(Int, Int)] = None
    var packed: Option[(Int, Int)] = None
    var dataLocation = 0L // field 14: 0 = DEFAULT (inline), 1 = EXTERNAL
    val extKv = scala.collection.mutable.Map[String, String]() // field 13 entries
    val int64s = Seq.newBuilder[Long] // unpacked int64_data (field 7)
    val int32s = Seq.newBuilder[Long] // int32_data (field 5; also bool/fp16)
    walk(buf, span._1, span._2) { (field, wire, v, s) =>
      (field, wire) match {
        case (1, 0) => dims += v.toInt
        case (2, 0) => dtype = v
        case (8, 2) => name = utf8(buf, s)
        case (9, 2) => raw = Some(s)
        case (14, 0) => dataLocation = v
        case (13, 2) => // external_data: StringStringEntryProto (key, value)
          var k = ""; var vv = ""
          walk(buf, s._1, s._2) { (f2, w2, _, s2) =>
            if (f2 == 1 && w2 == 2) k = utf8(buf, s2)
            else if (f2 == 2 && w2 == 2) vv = utf8(buf, s2)
          }
          extKv += (k -> vv)
        case (4, 2) => packed = Some(s)          // packed float_data
        case (4, 5) => packed = Some(s)          // unpacked single float
        case (7, 0) => int64s += v               // unpacked int64_data
        case (7, 2) =>                           // packed int64_data varints
          var at = s._1
          while (at < s._2) {
            var x = 0L; var shift = 0; var b = 0
            do { b = buf(at) & 0xff; x |= (b & 0x7fL) << shift; shift += 7; at += 1 }
            while ((b & 0x80) != 0)
            int64s += x
          }
        case (5, 0) => int32s += v               // unpacked int32_data
        case (5, 2) =>                           // packed int32_data varints
          var at = s._1
          while (at < s._2) {
            var x = 0L; var shift = 0; var b = 0
            do { b = buf(at) & 0xff; x |= (b & 0x7fL) << shift; shift += 7; at += 1 }
            while ((b & 0x80) != 0)
            int32s += x
          }
        case _      => ()
      }
    }
    // FLOAT(1), FLOAT16(10), INT64(7) shape/pads/index tensors, INT32(6),
    // BOOL(9) — integer values ride the float32-backed Tensor, which is
    // exact only up to 2^24; larger magnitudes (a huge Gather index or
    // Slice bound) would round SILENTLY, so they reject loudly here at
    // parse time. fp16 halves widen to float exactly (binary16 is a
    // subset of binary32).
    require(dtype == 1 || dtype == 7 || dtype == 6 || dtype == 9 || dtype == 10,
      s"tensor $name: only float32/float16/int64/int32/bool initializers " +
        s"supported, got data_type=$dtype")
    def exactF(v: Long): Float = {
      require(math.abs(v) <= (1L << 24),
        s"tensor $name: integer value $v exceeds 2^24 — not exactly " +
          "representable in the float32-backed Tensor")
      v.toFloat
    }
    // the byte payload: inline raw_data, or a range of a sibling
    // external-data file (data_location = EXTERNAL) resolved by name
    val src: Option[(Array[Byte], Int, Int)] =
      if (dataLocation == 1L) {
        val loc = extKv.getOrElse("location", throw new IllegalArgumentException(
          s"tensor $name: external data without a location entry"))
        val blob = external.getOrElse(loc, throw new IllegalArgumentException(
          s"tensor $name: external data file '$loc' not provided " +
            s"(have: ${external.keys.mkString(",")})"))
        val off = extKv.get("offset").map(_.toLong).getOrElse(0L)
        val len = extKv.get("length").map(_.toLong).getOrElse(blob.length - off)
        require(off >= 0 && len >= 0 && off + len <= blob.length,
          s"tensor $name: external range [$off, +$len) outside '$loc' " +
            s"(${blob.length} bytes)")
        Some((blob, off.toInt, (off + len).toInt))
      } else raw.map { case (a, b) => (buf, a, b) }
    val data =
      if (dtype == 7) (src, int64s.result()) match {
        case (Some((db, a, b)), _) =>
          require((b - a) % 8 == 0, s"tensor $name: raw_data not 8-byte aligned")
          Array.tabulate((b - a) / 8)(i => exactF(leLong(db, a + 8 * i)))
        case (_, vs) if vs.nonEmpty => vs.map(exactF).toArray
        case _ => throw new IllegalArgumentException(s"tensor $name: no data")
      } else if (dtype == 6) (src, int32s.result()) match {
        case (Some((db, a, b)), _) =>
          require((b - a) % 4 == 0, s"tensor $name: raw_data not 4-byte aligned")
          Array.tabulate((b - a) / 4)(i => exactF(
            ((db(a + 4 * i) & 0xff) | (db(a + 4 * i + 1) & 0xff) << 8 |
             (db(a + 4 * i + 2) & 0xff) << 16 | (db(a + 4 * i + 3) & 0xff) << 24).toLong))
        case (_, vs) if vs.nonEmpty => vs.map(exactF).toArray
        case _ => throw new IllegalArgumentException(s"tensor $name: no data")
      } else if (dtype == 9) (src, int32s.result()) match {
        case (Some((db, a, b)), _) => // bool raw_data: one byte per element
          Array.tabulate(b - a)(i => if (db(a + i) != 0) 1.0f else 0.0f)
        case (_, vs) if vs.nonEmpty => vs.map(v => if (v != 0) 1.0f else 0.0f).toArray
        case _ => throw new IllegalArgumentException(s"tensor $name: no data")
      } else if (dtype == 10) (src, int32s.result()) match {
        case (Some((db, a, b)), _) => // fp16 raw_data: 2-byte LE halves
          require((b - a) % 2 == 0, s"tensor $name: fp16 raw_data not 2-byte aligned")
          Array.tabulate((b - a) / 2)(i => f16ToDouble(
            (db(a + 2 * i) & 0xff) | (db(a + 2 * i + 1) & 0xff) << 8).toFloat)
        case (_, vs) if vs.nonEmpty => // fp16 in int32_data: one uint16 each
          vs.map(v => f16ToDouble(v.toInt & 0xffff).toFloat).toArray
        case _ => throw new IllegalArgumentException(s"tensor $name: no data")
      } else (src, packed) match {
        case (Some((db, a, b)), _) =>
          require((b - a) % 4 == 0, s"tensor $name: raw_data not 4-byte aligned")
          Array.tabulate((b - a) / 4)(i => leFloat(db, a + 4 * i))
        case (_, Some((a, b))) =>
          Array.tabulate((b - a) / 4)(i => leFloat(buf, a + 4 * i))
        case _ => throw new IllegalArgumentException(s"tensor $name: no data")
      }
    Tensor(name, dims.result(), data)
  }

  // ------------------------------------------------------------ executor
  /** Row-major matrix with double accumulation. */
  final case class Mat(rows: Int, cols: Int, a: Array[Double])

  /** Row-major n-dim tensor (NCHW for the conv ops), double values. */
  final case class Nd(dims: Seq[Int], a: Array[Double]) {
    require(dims.nonEmpty && dims.product == a.length,
      s"Nd dims $dims != ${a.length} values")
  }

  private def toNd(t: Tensor): Nd =
    Nd(if (t.dims.isEmpty) Seq(1) else t.dims, t.data.map(_.toDouble))

  private def asMat(name: String, x: Nd): Mat = x.dims match {
    case Seq(r, c) => Mat(r, c, x.a)
    case Seq(n)    => Mat(1, n, x.a)
    case d => throw new IllegalArgumentException(
      s"$name: rank ${d.size} where a rank <= 2 tensor is required (dims $d)")
  }
  private def asNd(m: Mat): Nd = Nd(Seq(m.rows, m.cols), m.a)

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

  // ------------------------------------------------------ conv-family ops
  /** 2-D convolution, NCHW x [N,C,H,W] * w [M,C,kH,kW] (group=1,
    * dilation=1). Accumulation order per output element: c_in-major, then
    * ky, then kx, left to right, bias added LAST — the order an oracle SQL
    * restatement replays term-by-term. Out-of-bounds taps (zero padding)
    * are skipped, which is arithmetic-identical to adding 0.0 terms. */
  private def conv2d(x: Nd, w: Nd, bias: Option[Nd],
      pads: Seq[Int], strides: Seq[Int], group: Int, dilations: Seq[Int]): Nd = {
    val Seq(n, c, h, wi) = x.dims: @unchecked
    val Seq(m, cg, kh, kw) = w.dims: @unchecked
    require(x.dims.size == 4 && w.dims.size == 4,
      s"Conv: need rank-4 NCHW input and weight, got ${x.dims} and ${w.dims}")
    require(group >= 1 && c % group == 0 && m % group == 0,
      s"Conv: group $group must divide input channels $c and filters $m")
    require(cg == c / group,
      s"Conv: weight channels $cg != ${c / group} (input channels / group)")
    val Seq(padT, padL, padB, padR) = pads: @unchecked
    val Seq(sH, sW) = strides: @unchecked
    val Seq(dH, dW) = dilations: @unchecked
    require(dH >= 1 && dW >= 1, s"Conv: dilations must be >= 1, got $dilations")
    // dilated kernel extent: (k-1)*d + 1 taps spread d apart
    val oh = (h + padT + padB - ((kh - 1) * dH + 1)) / sH + 1
    val ow = (wi + padL + padR - ((kw - 1) * dW + 1)) / sW + 1
    require(oh > 0 && ow > 0, s"Conv: non-positive output dims ($oh,$ow)")
    bias.foreach(b => require(b.a.length == m,
      s"Conv: bias length ${b.a.length} != $m output channels"))
    val mPerG = m / group
    val out = new Array[Double](n * m * oh * ow)
    var n0 = 0
    while (n0 < n) {
      var m0 = 0
      while (m0 < m) {
        val cBase = (m0 / mPerG) * cg // first input channel of m0's group
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var acc = 0.0
            var ci = 0
            while (ci < cg) {
              var ky = 0
              while (ky < kh) {
                val iy = oy * sH - padT + ky * dH
                if (iy >= 0 && iy < h) {
                  var kx = 0
                  while (kx < kw) {
                    val ix = ox * sW - padL + kx * dW
                    if (ix >= 0 && ix < wi)
                      acc += x.a(((n0 * c + cBase + ci) * h + iy) * wi + ix) *
                             w.a(((m0 * cg + ci) * kh + ky) * kw + kx)
                    kx += 1
                  }
                }
                ky += 1
              }
              ci += 1
            }
            out(((n0 * m + m0) * oh + oy) * ow + ox) =
              acc + bias.map(_.a(m0)).getOrElse(0.0)
            ox += 1
          }
          oy += 1
        }
        m0 += 1
      }
      n0 += 1
    }
    Nd(Seq(n, m, oh, ow), out)
  }

  /** 2-D max pooling over NCHW; taps outside the (zero-)padded region are
    * simply excluded from the max (ONNX pads with -inf for MaxPool). */
  private def maxPool2d(x: Nd, kernel: Seq[Int], pads: Seq[Int],
      strides: Seq[Int], ceilMode: Boolean = false): Nd = {
    require(x.dims.size == 4, s"MaxPool: need rank-4 NCHW input, got ${x.dims}")
    val Seq(n, c, h, w) = x.dims: @unchecked
    val Seq(kh, kw) = kernel: @unchecked
    val Seq(padT, padL, padB, padR) = pads: @unchecked
    val Seq(sH, sW) = strides: @unchecked
    val oh = poolOutDim(h, padT, padB, kh, sH, ceilMode)
    val ow = poolOutDim(w, padL, padR, kw, sW, ceilMode)
    require(oh > 0 && ow > 0, s"MaxPool: non-positive output dims ($oh,$ow)")
    val out = new Array[Double](n * c * oh * ow)
    var p = 0
    var n0 = 0
    while (n0 < n) {
      var ci = 0
      while (ci < c) {
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var mx = Double.NegativeInfinity
            var ky = 0
            while (ky < kh) {
              val iy = oy * sH - padT + ky
              if (iy >= 0 && iy < h) {
                var kx = 0
                while (kx < kw) {
                  val ix = ox * sW - padL + kx
                  if (ix >= 0 && ix < w) {
                    val v = x.a(((n0 * c + ci) * h + iy) * w + ix)
                    if (v > mx) mx = v
                  }
                  kx += 1
                }
              }
              ky += 1
            }
            out(p) = mx; p += 1
            ox += 1
          }
          oy += 1
        }
        ci += 1
      }
      n0 += 1
    }
    Nd(Seq(n, c, oh, ow), out)
  }

  /** 2-D average pooling over NCHW. `countIncludePad = false` (the ONNX
    * default) divides by the number of taps inside the image;
    * `true` divides by the full kernel size, counting pad zeros. */
  private def avgPool2d(x: Nd, kernel: Seq[Int], pads: Seq[Int],
      strides: Seq[Int], countIncludePad: Boolean,
      ceilMode: Boolean = false): Nd = {
    require(x.dims.size == 4, s"AveragePool: need rank-4 NCHW input, got ${x.dims}")
    val Seq(n, c, h, w) = x.dims: @unchecked
    val Seq(kh, kw) = kernel: @unchecked
    val Seq(padT, padL, padB, padR) = pads: @unchecked
    val Seq(sH, sW) = strides: @unchecked
    val oh = poolOutDim(h, padT, padB, kh, sH, ceilMode)
    val ow = poolOutDim(w, padL, padR, kw, sW, ceilMode)
    require(oh > 0 && ow > 0, s"AveragePool: non-positive output dims ($oh,$ow)")
    val out = new Array[Double](n * c * oh * ow)
    var p = 0
    var n0 = 0
    while (n0 < n) {
      var ci = 0
      while (ci < c) {
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var acc = 0.0
            var cnt = 0
            var ky = 0
            while (ky < kh) {
              val iy = oy * sH - padT + ky
              if (iy >= 0 && iy < h) {
                var kx = 0
                while (kx < kw) {
                  val ix = ox * sW - padL + kx
                  if (ix >= 0 && ix < w) {
                    acc += x.a(((n0 * c + ci) * h + iy) * w + ix)
                    cnt += 1
                  }
                  kx += 1
                }
              }
              ky += 1
            }
            out(p) = acc / (if (countIncludePad) kh * kw else cnt); p += 1
            ox += 1
          }
          oy += 1
        }
        ci += 1
      }
      n0 += 1
    }
    Nd(Seq(n, c, oh, ow), out)
  }

  /** n-ary concatenation along `axis` (negative = from the end): equal
    * dims everywhere else; per outer index the inputs' inner blocks are
    * laid out in argument order — the Inception-style channel merge. */
  private def concat(xs: Seq[Nd], axis0: Int): Nd = {
    require(xs.nonEmpty, "Concat: no inputs")
    val rank = xs.head.dims.size
    val axis = if (axis0 < 0) axis0 + rank else axis0
    require(axis >= 0 && axis < rank,
      s"Concat: axis $axis0 out of range for rank $rank")
    xs.foreach(x => require(x.dims.size == rank &&
      x.dims.zipWithIndex.forall { case (d, i) => i == axis || d == xs.head.dims(i) },
      s"Concat: dims ${x.dims} incompatible with ${xs.head.dims} off axis $axis"))
    val outDims = xs.head.dims.updated(axis, xs.map(_.dims(axis)).sum)
    val outer = xs.head.dims.take(axis).product
    val inners = xs.map(_.dims.drop(axis).product)
    val out = new Array[Double](outDims.product)
    var p = 0
    var o = 0
    while (o < outer) {
      var xi = 0
      while (xi < xs.size) {
        System.arraycopy(xs(xi).a, o * inners(xi), out, p, inners(xi))
        p += inners(xi)
        xi += 1
      }
      o += 1
    }
    Nd(outDims, out)
  }

  /** Inference-mode batch norm over NCHW: per channel
    * y = (x - mean_c) * scale_c / sqrt(var_c + eps) + B_c — that exact
    * operation order (subtract, multiply, DIVIDE by the sqrt, add), so an
    * oracle replays it with the same IEEE-correctly-rounded steps. */
  private def batchNorm(x: Nd, scale: Nd, b: Nd, mean: Nd, varr: Nd,
      eps: Double): Nd = {
    require(x.dims.size == 4, s"BatchNormalization: need rank-4 NCHW input, got ${x.dims}")
    val Seq(n, c, h, w) = x.dims: @unchecked
    Seq("scale" -> scale, "B" -> b, "mean" -> mean, "var" -> varr).foreach {
      case (nm, t) => require(t.a.length == c,
        s"BatchNormalization: $nm length ${t.a.length} != $c channels")
    }
    val std = Array.tabulate(c)(ci => math.sqrt(varr.a(ci) + eps))
    val out = new Array[Double](x.a.length)
    val hw = h * w
    var n0 = 0
    while (n0 < n) {
      var ci = 0
      while (ci < c) {
        val base = (n0 * c + ci) * hw
        var i = 0
        while (i < hw) {
          out(base + i) = (x.a(base + i) - mean.a(ci)) * scale.a(ci) / std(ci) + b.a(ci)
          i += 1
        }
        ci += 1
      }
      n0 += 1
    }
    Nd(x.dims, out)
  }

  /** Mean over the spatial dims of NCHW -> [N,C,1,1]; summation in scan
    * order then one division, the order an oracle restates. */
  private def globalAveragePool(x: Nd): Nd = {
    require(x.dims.size == 4, s"GlobalAveragePool: need rank-4 NCHW input, got ${x.dims}")
    val Seq(n, c, h, w) = x.dims: @unchecked
    val hw = h * w
    val out = new Array[Double](n * c)
    var j = 0
    while (j < n * c) {
      var acc = 0.0
      var i = 0
      while (i < hw) { acc += x.a(j * hw + i); i += 1 }
      out(j) = acc / hw
      j += 1
    }
    Nd(Seq(n, c, 1, 1), out)
  }

  private def flatten(x: Nd, axis: Int): Nd = {
    require(axis >= 0 && axis <= x.dims.size,
      s"Flatten: axis $axis out of range for dims ${x.dims}")
    val d0 = x.dims.take(axis).product
    Nd(Seq(d0, x.a.length / d0), x.a)
  }

  /** Row-major strides of a dims vector (innermost stride 1). */
  private def stridesOf(dims: Seq[Int]): Array[Long] = {
    val nd = dims.size
    val s = new Array[Long](nd)
    var acc = 1L
    var k = nd - 1
    while (k >= 0) { s(k) = acc; acc *= dims(k); k -= 1 }
    s
  }

  /** Element-wise binary op with full numpy-style multidirectional
    * broadcasting (the ONNX Add/Sub/Mul/Div/Pow contract): shapes are
    * right-aligned, size-1 axes stretch. The transformer-encoder
    * decomposition a sentence-embedding export carries leans on this —
    * [B,S,H] - [B,S,1] (LayerNorm centering), [B,S,H] * [H] (scale). */
  private def broadcastBinary(name: String, x: Nd, y: Nd,
      f: (Double, Double) => Double): Nd = {
    val nd = math.max(x.dims.size, y.dims.size)
    val xd = Seq.fill(nd - x.dims.size)(1) ++ x.dims
    val yd = Seq.fill(nd - y.dims.size)(1) ++ y.dims
    val od = xd.zip(yd).map { case (a, b) =>
      require(a == b || a == 1 || b == 1,
        s"$name: cannot broadcast ${x.dims} with ${y.dims}")
      math.max(a, b)
    }
    // stride 0 along stretched axes: the loop then reads the same source
    // element for every output index on that axis
    val xs = stridesOf(xd).zip(xd).map { case (s, d) => if (d == 1) 0L else s }
    val ys = stridesOf(yd).zip(yd).map { case (s, d) => if (d == 1) 0L else s }
    val out = new Array[Double](od.product)
    val idx = new Array[Int](nd)
    var o = 0
    while (o < out.length) {
      var sx = 0L; var sy = 0L
      var k = 0
      while (k < nd) { sx += idx(k) * xs(k); sy += idx(k) * ys(k); k += 1 }
      out(o) = f(x.a(sx.toInt), y.a(sy.toInt))
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == od(d) }) { idx(d) = 0; d -= 1 }
      o += 1
    }
    Nd(od, out)
  }

  /** Batched MatMul with numpy semantics for rank >= 3: the trailing two
    * axes multiply, leading (batch) axes broadcast — [B,S,H] x [H,H]
    * (shared projection) and [B,h,S,d] x [B,h,d,S] (attention scores),
    * the two shapes every transformer encoder produces. Accumulation
    * order over k is identical to the rank-2 path, so an oracle restates
    * the sum left to right. */
  private def matmulNd(x: Nd, y: Nd): Nd = {
    require(x.dims.size >= 2 && y.dims.size >= 2,
      s"MatMul: rank-1 operands unsupported (dims ${x.dims} x ${y.dims})")
    if (x.dims.size == 2 && y.dims.size == 2)
      return asNd(matmul(asMat("MatMul a", x), asMat("MatMul b", y),
        transA = false, transB = false, 1.0))
    val (m, kx) = (x.dims(x.dims.size - 2), x.dims.last)
    val (ky, n) = (y.dims(y.dims.size - 2), y.dims.last)
    require(kx == ky, s"MatMul: inner dims differ (${x.dims} x ${y.dims})")
    val nb = math.max(x.dims.size, y.dims.size) - 2
    val xb = Seq.fill(nb - (x.dims.size - 2))(1) ++ x.dims.dropRight(2)
    val yb = Seq.fill(nb - (y.dims.size - 2))(1) ++ y.dims.dropRight(2)
    val ob = xb.zip(yb).map { case (a, b) =>
      require(a == b || a == 1 || b == 1,
        s"MatMul: cannot broadcast batch dims ${x.dims} with ${y.dims}")
      math.max(a, b)
    }
    val xbs = stridesOf(xb).zip(xb).map { case (s, d) => if (d == 1) 0L else s * (m.toLong * kx) }
    val ybs = stridesOf(yb).zip(yb).map { case (s, d) => if (d == 1) 0L else s * (ky.toLong * n) }
    val out = new Array[Double](ob.product * m * n)
    val idx = new Array[Int](nb)
    var b = 0
    val nBatch = ob.product
    while (b < nBatch) {
      var xOff = 0L; var yOff = 0L
      var d0 = 0
      while (d0 < nb) { xOff += idx(d0) * xbs(d0); yOff += idx(d0) * ybs(d0); d0 += 1 }
      val oOff = b * m * n
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) {
          var acc = 0.0
          var k = 0
          while (k < kx) {
            acc += x.a((xOff + i * kx + k).toInt) * y.a((yOff + k.toLong * n + j).toInt)
            k += 1
          }
          out(oOff + i * n + j) = acc
          j += 1
        }
        i += 1
      }
      var d = nb - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == ob(d) }) { idx(d) = 0; d -= 1 }
      b += 1
    }
    Nd(ob ++ Seq(m, n), out)
  }

  /** Fused LayerNormalization (opset 17): normalize over axes
    * [axis, rank), y = (x - mean) / sqrt(var + eps) * scale + bias with
    * var the biased estimator. Arithmetic order per row: scan-order sum
    * then one division (mean), scan-order sum of centered squares then
    * one division (var), then per element (c / sd) * scale + bias — each
    * step restatable left-to-right in oracle SQL. */
  private def layerNorm(x: Nd, scale: Nd, bias: Option[Nd], axis0: Int,
      eps: Double): Nd = {
    val nd = x.dims.size
    val axis = if (axis0 < 0) axis0 + nd else axis0
    require(axis >= 0 && axis < nd,
      s"LayerNormalization: axis $axis0 out of range for ${x.dims}")
    val inner = x.dims.drop(axis).product
    val outer = x.a.length / inner
    require(scale.a.length == inner,
      s"LayerNormalization: scale length ${scale.a.length} != $inner")
    bias.foreach(b => require(b.a.length == inner,
      s"LayerNormalization: bias length ${b.a.length} != $inner"))
    val out = new Array[Double](x.a.length)
    var o = 0
    while (o < outer) {
      val base = o * inner
      var sum = 0.0
      var i = 0
      while (i < inner) { sum += x.a(base + i); i += 1 }
      val mu = sum / inner
      var vs = 0.0
      i = 0
      while (i < inner) { val c = x.a(base + i) - mu; vs += c * c; i += 1 }
      val sd = math.sqrt(vs / inner + eps)
      i = 0
      while (i < inner) {
        out(base + i) = (x.a(base + i) - mu) / sd * scale.a(i) +
          bias.map(_.a(i)).getOrElse(0.0)
        i += 1
      }
      o += 1
    }
    Nd(x.dims, out)
  }

  /** Gauss error function (double precision, via the commons-math3 the
    * Spark runtime already ships) — the exact-Gelu building block a
    * PyTorch sentence-embedding export decomposes to. */
  def erf(x: Double): Double = org.apache.commons.math3.special.Erf.erf(x)

  private val GeluTanhK = 0.7978845608028654 // sqrt(2/pi), the spec constant
  private val InvSqrt2 = 0.7071067811865476  // 1/sqrt(2)

  /** Gelu, both published variants. Exact: 0.5*x*(1+erf(x/sqrt(2))).
    * Tanh approximation (the "gelu_new"/BERT form):
    * 0.5*x*(1+tanh(sqrt(2/pi)*(x + 0.044715*x^3))) with x^3 = (x*x)*x —
    * the grouping an oracle must parenthesize to replay. */
  private def gelu(v: Double, tanhApprox: Boolean): Double =
    if (tanhApprox) 0.5 * v * (1.0 + math.tanh(GeluTanhK * (v + 0.044715 * (v * v * v))))
    else 0.5 * v * (1.0 + erf(v * InvSqrt2))

  /** n-dim transpose by permutation (empty perm = reverse, the ONNX
    * default). Output scan order with input strides permuted. */
  private def transpose(x: Nd, perm0: Seq[Int]): Nd = {
    val nd = x.dims.size
    val perm = if (perm0.isEmpty) Seq.range(nd - 1, -1, -1) else perm0
    require(perm.sorted == Seq.range(0, nd),
      s"Transpose: perm $perm0 is not a permutation of 0..${nd - 1}")
    val outDims = perm.map(x.dims)
    val inStr = stridesOf(x.dims)
    val permStr = perm.map(inStr).toArray
    val out = new Array[Double](x.a.length)
    val idx = new Array[Int](nd)
    var o = 0
    while (o < out.length) {
      var src = 0L
      var k = 0
      while (k < nd) { src += idx(k) * permStr(k); k += 1 }
      out(o) = x.a(src.toInt)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == outDims(d) }) { idx(d) = 0; d -= 1 }
      o += 1
    }
    Nd(outDims, out)
  }

  /** Constant-mode Pad; `pads` in ONNX order (all leading, then all
    * trailing). Negative pads (cropping) rejected. */
  private def padConst(x: Nd, pads: Seq[Int], value: Double): Nd = {
    val nd = x.dims.size
    require(pads.size == 2 * nd, s"Pad: ${pads.size} pad entries for rank $nd")
    require(pads.forall(_ >= 0), s"Pad: negative pads (cropping) unsupported")
    val outDims = x.dims.zipWithIndex.map { case (d, k) => d + pads(k) + pads(nd + k) }
    val out = Array.fill(outDims.product)(value)
    val outStr = stridesOf(outDims)
    val idx = new Array[Int](nd)
    var i = 0
    while (i < x.a.length) {
      var dst = 0L
      var k = 0
      while (k < nd) { dst += (idx(k) + pads(k)) * outStr(k); k += 1 }
      out(dst.toInt) = x.a(i)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == x.dims(d) }) { idx(d) = 0; d -= 1 }
      i += 1
    }
    Nd(outDims, out)
  }

  /** Reshape with the ONNX -1 (inferred) and 0 (copy input dim unless
    * allowzero) conventions. */
  private def reshape(x: Nd, shape: Seq[Long], allowZero: Boolean): Nd = {
    var inferAt = -1
    val dims = shape.zipWithIndex.map { case (v, k) =>
      if (v == -1L) {
        require(inferAt < 0, "Reshape: more than one -1 in shape")
        inferAt = k; 1
      } else if (v == 0L && !allowZero) {
        require(k < x.dims.size, s"Reshape: 0 at axis $k beyond input rank")
        x.dims(k)
      } else {
        require(v > 0 || (v == 0 && allowZero), s"Reshape: bad dim $v")
        v.toInt
      }
    }
    val known = dims.product
    val outDims =
      if (inferAt >= 0) {
        require(known > 0 && x.a.length % known == 0,
          s"Reshape: ${x.a.length} values not divisible by $known")
        dims.updated(inferAt, x.a.length / known)
      } else dims
    require(outDims.product == x.a.length,
      s"Reshape: shape $shape incompatible with ${x.dims}")
    Nd(outDims, x.a)
  }

  /** Softmax over one axis (opset-13 semantics; default axis -1), with
    * the standard max-subtraction for stability. */
  private def softmax(x: Nd, axis0: Int): Nd = {
    val nd = x.dims.size
    val axis = if (axis0 < 0) axis0 + nd else axis0
    require(axis >= 0 && axis < nd, s"Softmax: axis $axis0 out of range for ${x.dims}")
    val n = x.dims(axis)
    val inner = x.dims.drop(axis + 1).product
    val outer = x.dims.take(axis).product
    val out = new Array[Double](x.a.length)
    var o = 0
    while (o < outer) {
      var in0 = 0
      while (in0 < inner) {
        val base = o * n * inner + in0
        var mx = Double.NegativeInfinity
        var k = 0
        while (k < n) { val v = x.a(base + k * inner); if (v > mx) mx = v; k += 1 }
        var sum = 0.0
        k = 0
        while (k < n) {
          val e = math.exp(x.a(base + k * inner) - mx)
          out(base + k * inner) = e; sum += e; k += 1
        }
        k = 0
        while (k < n) { out(base + k * inner) /= sum; k += 1 }
        in0 += 1
      }
      o += 1
    }
    Nd(x.dims, out)
  }

  /** Mean over `axes` (empty = all), keepdims per the attribute.
    * Summation in input scan order, then one division. */
  private def reduceMean(x: Nd, axes0: Seq[Int], keepdims: Boolean): Nd = {
    val nd = x.dims.size
    val axes = (if (axes0.isEmpty) Seq.range(0, nd)
                else axes0.map(a => if (a < 0) a + nd else a)).sorted
    require(axes.forall(a => a >= 0 && a < nd) && axes == axes.distinct,
      s"ReduceMean: bad axes $axes0 for rank $nd")
    val isRed = Array.tabulate(nd)(axes.contains)
    val keptDims = (0 until nd).filterNot(isRed).map(x.dims)
    val outDims =
      if (keepdims) x.dims.zipWithIndex.map { case (d, k) => if (isRed(k)) 1 else d }
      else if (keptDims.isEmpty) Seq(1)
      else keptDims
    val redN = axes.map(x.dims).product
    val out = new Array[Double](x.a.length / redN)
    val keptStr = {
      val s = new Array[Long](nd)
      var acc = 1L
      var k = nd - 1
      while (k >= 0) { if (!isRed(k)) { s(k) = acc; acc *= x.dims(k) }; k -= 1 }
      s
    }
    val idx = new Array[Int](nd)
    var i = 0
    while (i < x.a.length) {
      var dst = 0L
      var k = 0
      while (k < nd) { dst += idx(k) * keptStr(k); k += 1 }
      out(dst.toInt) += x.a(i)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == x.dims(d) }) { idx(d) = 0; d -= 1 }
      i += 1
    }
    var j = 0
    while (j < out.length) { out(j) /= redN; j += 1 }
    Nd(outDims, out)
  }

  // --------------------------------------------- real-export (encoder) ops
  /** Gather along `axis`: out dims = data[:axis] ++ indices.dims ++
    * data[axis+1:]; negative indices count from the end of the axis — the
    * token-embedding lookup shape every transformer export carries
    * (embTable[V,H] gathered by input_ids[B,S] -> [B,S,H]). */
  private def gather(data: Nd, indices: Nd, axis0: Int): Nd = {
    val nd = data.dims.size
    val axis = if (axis0 < 0) axis0 + nd else axis0
    require(axis >= 0 && axis < nd, s"Gather: axis $axis0 out of range for ${data.dims}")
    val dAxis = data.dims(axis)
    val outer = data.dims.take(axis).product
    val inner = data.dims.drop(axis + 1).product
    val nIdx = indices.a.length
    // out rank = data.rank - 1 + indices.rank; the Nd representation has
    // no rank-0, so a scalar index arrives as [1] and keeps its axis (a
    // consumer Reshape/Squeeze flattens it — shape-input consumers only
    // read the values)
    val outDims = data.dims.take(axis) ++ indices.dims ++ data.dims.drop(axis + 1)
    val out = new Array[Double](outer * nIdx * inner)
    var o = 0
    while (o < outer) {
      var j = 0
      while (j < nIdx) {
        val raw = indices.a(j).toLong
        val k = (if (raw < 0) raw + dAxis else raw).toInt
        require(k >= 0 && k < dAxis, s"Gather: index ${indices.a(j).toLong} out of range [0,$dAxis)")
        System.arraycopy(data.a, (o * dAxis + k) * inner, out, (o * nIdx + j) * inner, inner)
        j += 1
      }
      o += 1
    }
    Nd(if (outDims.isEmpty) Seq(1) else outDims, out)
  }

  /** Three-way broadcast (Where's contract): cond != 0 selects x, else y. */
  private def whereOp(cond: Nd, x: Nd, y: Nd): Nd = {
    val nd = Seq(cond, x, y).map(_.dims.size).max
    def pad(t: Nd) = Seq.fill(nd - t.dims.size)(1) ++ t.dims
    val (cd, xd, yd) = (pad(cond), pad(x), pad(y))
    val od = (0 until nd).map { k =>
      val m = Seq(cd(k), xd(k), yd(k)).max
      require(Seq(cd(k), xd(k), yd(k)).forall(d => d == m || d == 1),
        s"Where: cannot broadcast ${cond.dims} / ${x.dims} / ${y.dims}")
      m
    }
    def str0(dims: Seq[Int]) = stridesOf(dims).zip(dims).map { case (s, d) => if (d == 1) 0L else s }
    val (cs, xs, ys) = (str0(cd), str0(xd), str0(yd))
    val out = new Array[Double](od.product)
    val idx = new Array[Int](nd)
    var o = 0
    while (o < out.length) {
      var sc = 0L; var sx = 0L; var sy = 0L
      var k = 0
      while (k < nd) { sc += idx(k) * cs(k); sx += idx(k) * xs(k); sy += idx(k) * ys(k); k += 1 }
      out(o) = if (cond.a(sc.toInt) != 0.0) x.a(sx.toInt) else y.a(sy.toInt)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == od(d) }) { idx(d) = 0; d -= 1 }
      o += 1
    }
    Nd(od, out)
  }

  /** Slice (opset >= 10 semantics): negative starts/ends count from the
    * axis end, both are clamped to [0, dim], positive steps only. */
  private def sliceOp(x: Nd, starts: Seq[Long], ends: Seq[Long],
      axes0: Seq[Long], steps0: Seq[Long]): Nd = {
    val nd = x.dims.size
    val axes = (if (axes0.isEmpty) Seq.range(0L, starts.size.toLong) else axes0)
      .map(a => if (a < 0) a + nd else a)
    require(axes.forall(a => a >= 0 && a < nd), s"Slice: axes $axes0 out of range for rank $nd")
    require(starts.size == ends.size && axes.size == starts.size,
      s"Slice: starts/ends/axes sizes differ")
    val steps = if (steps0.isEmpty) Seq.fill(starts.size)(1L) else steps0
    require(steps.forall(_ > 0), s"Slice: non-positive steps $steps0 unsupported")
    val begin = Array.tabulate(nd)(_ => 0)
    val step = Array.tabulate(nd)(_ => 1)
    val outDims = x.dims.toArray
    axes.indices.foreach { i =>
      val ax = axes(i).toInt
      val dim = x.dims(ax)
      def clamp(v: Long): Int = {
        val w = if (v < 0) v + dim else v
        math.max(0, math.min(dim, w)).toInt
      }
      val b = clamp(starts(i)); val e = clamp(ends(i)); val st = steps(i).toInt
      begin(ax) = b; step(ax) = st
      outDims(ax) = math.max(0, (e - b + st - 1) / st)
    }
    require(outDims.forall(_ > 0), s"Slice: empty output ${outDims.toSeq}")
    val inStr = stridesOf(x.dims)
    val out = new Array[Double](outDims.product)
    val idx = new Array[Int](nd)
    var o = 0
    while (o < out.length) {
      var src = 0L
      var k = 0
      while (k < nd) { src += (begin(k) + idx(k) * step(k)) * inStr(k); k += 1 }
      out(o) = x.a(src.toInt)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == outDims(d) }) { idx(d) = 0; d -= 1 }
      o += 1
    }
    Nd(outDims.toSeq, out)
  }

  /** Insert size-1 axes at `axes` (positions in the OUTPUT shape). */
  private def unsqueeze(x: Nd, axes0: Seq[Long]): Nd = {
    val outRank = x.dims.size + axes0.size
    val axes = axes0.map(a => if (a < 0) a + outRank else a)
    require(axes.distinct.size == axes.size && axes.forall(a => a >= 0 && a < outRank),
      s"Unsqueeze: bad axes $axes0 for input rank ${x.dims.size}")
    val axSet = axes.toSet
    var in = 0
    val outDims = (0 until outRank).map { k =>
      if (axSet(k.toLong)) 1 else { val d = x.dims(in); in += 1; d }
    }
    Nd(outDims, x.a)
  }

  /** Drop size-1 axes (all of them when `axes` is empty, per spec). */
  private def squeeze(x: Nd, axes0: Seq[Long]): Nd = {
    val nd = x.dims.size
    val axes = axes0.map(a => if (a < 0) a + nd else a)
    require(axes.forall(a => a >= 0 && a < nd && x.dims(a.toInt) == 1),
      s"Squeeze: axes $axes0 do not name size-1 dims of ${x.dims}")
    val drop = if (axes.isEmpty) x.dims.zipWithIndex.filter(_._1 == 1).map(_._2.toLong).toSet
               else axes.toSet
    val outDims = x.dims.zipWithIndex.collect { case (d, k) if !drop(k.toLong) => d }
    Nd(if (outDims.isEmpty) Seq(1) else outDims, x.a)
  }

  /** Expand: bidirectional broadcast of the input against `shape` (the
    * spec allows the shape to be SMALLER along an axis, meaning "keep"). */
  private def expand(x: Nd, shape: Seq[Long]): Nd =
    broadcastBinary("Expand", x, Nd(shape.map(_.toInt), new Array[Double](
      math.max(1, shape.map(_.toInt).product))), (a, _) => a)

  /** Sum over `axes` (empty = all axes), keepdims per attr — the masked
    * mean-pooling reduction of a sentence-embedding export. Summation in
    * input scan order, restatable left-to-right. */
  private def reduceSum(x: Nd, axes0: Seq[Int], keepdims: Boolean): Nd = {
    val nd = x.dims.size
    val axes = (if (axes0.isEmpty) Seq.range(0, nd)
                else axes0.map(a => if (a < 0) a + nd else a)).sorted
    require(axes.forall(a => a >= 0 && a < nd) && axes == axes.distinct,
      s"ReduceSum: bad axes $axes0 for rank $nd")
    val isRed = Array.tabulate(nd)(axes.contains)
    val keptDims = (0 until nd).filterNot(isRed).map(x.dims)
    val outDims =
      if (keepdims) x.dims.zipWithIndex.map { case (d, k) => if (isRed(k)) 1 else d }
      else if (keptDims.isEmpty) Seq(1)
      else keptDims
    val redN = axes.map(x.dims).product
    val out = new Array[Double](x.a.length / redN)
    val keptStr = {
      val s = new Array[Long](nd)
      var acc = 1L
      var k = nd - 1
      while (k >= 0) { if (!isRed(k)) { s(k) = acc; acc *= x.dims(k) }; k -= 1 }
      s
    }
    val idx = new Array[Int](nd)
    var i = 0
    while (i < x.a.length) {
      var dst = 0L
      var k = 0
      while (k < nd) { dst += idx(k) * keptStr(k); k += 1 }
      out(dst.toInt) += x.a(i)
      var d = nd - 1
      while (d >= 0 && { idx(d) += 1; idx(d) == x.dims(d) }) { idx(d) = 0; d -= 1 }
      i += 1
    }
    Nd(outDims, out)
  }

  /** Cast in a double-backed engine: float/double targets are identity,
    * float16 quantizes through real half precision (round-to-nearest-
    * even — an fp16 Cast node must not silently run as identity),
    * integer targets truncate toward zero (the C conversion the spec
    * prescribes), bool maps nonzero -> 1. */
  private def castOp(x: Nd, to: Long): Nd = to match {
    case 1 | 11 => x                                        // float/double
    case 10 => Nd(x.dims, x.a.map(f16RoundTrip))            // float16
    case 6 | 7 | 12 | 13 | 3 | 2 | 4 | 5 =>                 // int32/64, u32/64, i8/u8, u16/i16
      Nd(x.dims, x.a.map(v => if (v < 0) math.ceil(v) else math.floor(v)))
    case 9 => Nd(x.dims, x.a.map(v => if (v != 0.0) 1.0 else 0.0)) // bool
    case other => throw new IllegalArgumentException(s"Cast: to=$other unsupported")
  }

  // ------------------------------------------------------ half precision

  /** IEEE 754 binary16 bit pattern of `f`, round-to-nearest-even —
    * the conversion onnxruntime applies for fp16 Casts and fp16
    * initializers (no JDK intrinsic on Java 17; Float.floatToFloat16
    * arrives in 20). Overflow goes to infinity, subnormals round in
    * the shifted mantissa, NaN keeps a quiet payload bit. */
  private[embeddings] def f16Bits(f: Float): Int = {
    val x = java.lang.Float.floatToIntBits(f)
    val sign = (x >>> 16) & 0x8000
    val absx = x & 0x7fffffff
    if (absx >= 0x7f800000) // inf / nan
      sign | 0x7c00 | (if (absx > 0x7f800000) 0x200 else 0)
    else {
      val e = (absx >>> 23) - 127 + 15 // re-biased exponent
      if (e >= 31) sign | 0x7c00 // overflow -> inf
      else if (e <= 0) {
        if (e < -10) sign // underflow -> signed zero
        else {
          // subnormal: implicit bit becomes explicit, round in the shift
          val m = (absx & 0x7fffff) | 0x800000
          val shift = 14 - e
          val half = 1 << (shift - 1)
          val rounded = (m + half - 1 + ((m >>> shift) & 1)) >>> shift
          sign | rounded
        }
      } else {
        val m = absx & 0x7fffff
        val rounded = m + 0xfff + ((m >>> 13) & 1) // RNE in the dropped 13 bits
        if ((rounded & 0x800000) != 0) { // mantissa carry bumps the exponent
          if (e + 1 >= 31) sign | 0x7c00 else sign | ((e + 1) << 10)
        } else sign | (e << 10) | (rounded >>> 13)
      }
    }
  }

  /** Exact double value of an IEEE 754 binary16 bit pattern. */
  private[embeddings] def f16ToDouble(h: Int): Double = {
    val e = (h >>> 10) & 0x1f
    val m = h & 0x3ff
    val mag =
      if (e == 0) m * 5.9604644775390625e-8 // m * 2^-24 (subnormal)
      else if (e == 31) { if (m == 0) Double.PositiveInfinity else Double.NaN }
      else (1.0 + m / 1024.0) * math.pow(2.0, e - 15)
    if ((h & 0x8000) != 0) -mag else mag
  }

  /** Round through half precision and back — the numeric effect of an
    * fp16 Cast in this double-backed engine. */
  private[embeddings] def f16RoundTrip(v: Double): Double = f16ToDouble(f16Bits(v.toFloat))

  private def intsAttr(n: Node, name: String, default: Seq[Long]): Seq[Int] = {
    val v = n.attrIs.getOrElse(name, default)
    v.map(_.toInt)
  }

  /** Resolve per-axis (begin..., end...) pads honoring the legacy
    * auto_pad attribute: NOTSET reads the pads attr, VALID is zero,
    * SAME_UPPER/SAME_LOWER compute the TF-style padding that makes
    * out = ceil(in / stride) (extra pad at the end for UPPER, the
    * beginning for LOWER). Unknown values reject loudly — a silently
    * ignored auto_pad would shift every tap. */
  private def resolvePads(n: Node, inDims: Seq[Int], kernel: Seq[Int],
      strides: Seq[Int], dilations: Seq[Int]): Seq[Int] = {
    val zeros = Seq.fill(2 * inDims.size)(0L)
    n.attrS.getOrElse("auto_pad", "NOTSET") match {
      case "NOTSET" => intsAttr(n, "pads", zeros)
      case "VALID" =>
        require(intsAttr(n, "pads", zeros).forall(_ == 0),
          s"${n.opType}: auto_pad=VALID contradicts nonzero pads")
        zeros.map(_.toInt)
      case ap @ ("SAME_UPPER" | "SAME_LOWER") =>
        require(!n.attrIs.contains("pads"),
          s"${n.opType}: auto_pad=$ap contradicts an explicit pads attr")
        val (begin, end) = inDims.indices.map { k =>
          val eff = (kernel(k) - 1) * dilations(k) + 1
          val out = (inDims(k) + strides(k) - 1) / strides(k)
          val total = math.max(0, (out - 1) * strides(k) + eff - inDims(k))
          if (ap == "SAME_UPPER") (total / 2, total - total / 2)
          else (total - total / 2, total / 2)
        }.unzip
        begin ++ end
      case other => throw new IllegalArgumentException(
        s"${n.opType}: auto_pad=$other unsupported")
    }
  }

  private def rejectPoolDilation(n: Node): Unit =
    require(n.attrIs.getOrElse("dilations", Seq(1L, 1L)).forall(_ == 1L),
      s"${n.opType}: only dilation=1 pooling supported")

  /** Pooled output extent along one axis. ceil_mode=1 rounds the window
    * count up (the GoogLeNet-family export shape), with the standard
    * PyTorch/onnxruntime clamp: a window that would START at or beyond
    * input + begin-pad is dropped (it could only see end-padding). */
  private def poolOutDim(in: Int, padB: Int, padE: Int, k: Int, s: Int,
      ceil: Boolean): Int = {
    val num = in + padB + padE - k
    var o = (if (ceil) (num + s - 1) / s else num / s) + 1
    if (ceil && (o - 1) * s >= in + padB) o -= 1
    o
  }

  /** Execute the graph on one dense input (rank-2 [batch, dim] for MLPs,
    * rank-4 NCHW for conv nets). ONNX requires nodes in SSA topological
    * order, so a single forward pass suffices. */
  def run(g: Graph, input: Mat): Mat =
    asMat("graph output", runNd(g, asNd(input)))

  def runNd(g: Graph, input: Nd): Nd = {
    require(g.dataInputs.size == 1,
      s"expected exactly one data input, got ${g.dataInputs}")
    runNd(g, Map(g.dataInputs.head -> input))
  }

  /** Execute with named data inputs — the multi-input surface a real
    * sentence-embedding export needs (input_ids + attention_mask, both
    * int64 [batch, seq]; integer values ride the double-backed Nd
    * losslessly below 2^53). */
  def runNd(g: Graph, inputs: Map[String, Nd]): Nd = {
    val missing = g.dataInputs.filterNot(inputs.contains)
    require(missing.isEmpty, s"unbound data inputs: $missing")
    val env = scala.collection.mutable.Map[String, Nd](inputs.toSeq: _*)
    g.initializers.foreach { case (n, t) => env(n) = toNd(t) }
    def in(node: Node, i: Int): Nd = env.getOrElse(node.inputs(i),
      throw new IllegalArgumentException(s"${node.opType}: unbound input '${node.inputs(i)}'"))
    def mat(node: Node, i: Int): Mat = asMat(s"${node.opType} input $i", in(node, i))
    g.nodes.foreach { n =>
      val out: Nd = n.opType match {
        case "MatMul" => matmulNd(in(n, 0), in(n, 1))
        case "Add" =>
          val (x, y) = (in(n, 0), in(n, 1))
          if (x.dims == y.dims) {
            // same-shape element-wise add at ANY rank — the residual
            // ("skip connection") add every ResNet-family block performs
            // on NCHW tensors
            val o = new Array[Double](x.a.length)
            var i = 0
            while (i < o.length) { o(i) = x.a(i) + y.a(i); i += 1 }
            Nd(x.dims, o)
          } else broadcastBinary("Add", x, y, _ + _)
        case "Sub" => broadcastBinary("Sub", in(n, 0), in(n, 1), _ - _)
        case "Mul" => broadcastBinary("Mul", in(n, 0), in(n, 1), _ * _)
        case "Div" => broadcastBinary("Div", in(n, 0), in(n, 1), _ / _)
        case "Pow" => broadcastBinary("Pow", in(n, 0), in(n, 1), math.pow)
        case "Sqrt" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(math.sqrt))
        case "Exp" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(math.exp))
        case "Neg" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => -v))
        case "Erf" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(erf))
        case "Gelu" =>
          val approx = n.attrS.getOrElse("approximate", "none")
          require(approx == "none" || approx == "tanh",
            s"Gelu: approximate=$approx unsupported")
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => gelu(v, approx == "tanh")))
        case "LayerNormalization" =>
          layerNorm(in(n, 0), in(n, 1),
            if (n.inputs.size >= 3 && n.inputs(2).nonEmpty) Some(in(n, 2)) else None,
            axis0 = n.attrI.getOrElse("axis", -1L).toInt,
            eps = n.attrF.getOrElse("epsilon", 1e-5f).toDouble)

        case "Relu"   =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => if (v > 0) v else 0.0))
        case "Gemm" =>
          val mm = matmul(mat(n, 0), mat(n, 1),
            transA = n.attrI.getOrElse("transA", 0L) != 0L,
            transB = n.attrI.getOrElse("transB", 0L) != 0L,
            alpha = n.attrF.getOrElse("alpha", 1.0f).toDouble)
          asNd(if (n.inputs.size >= 3)
            addBias(mm, mat(n, 2), n.attrF.getOrElse("beta", 1.0f).toDouble)
          else mm)
        case "Conv" =>
          val x = in(n, 0); val w = in(n, 1)
          val strides = intsAttr(n, "strides", Seq(1L, 1L))
          val dil = intsAttr(n, "dilations", Seq(1L, 1L))
          conv2d(x, w,
            if (n.inputs.size >= 3) Some(in(n, 2)) else None,
            pads = resolvePads(n, x.dims.drop(2), w.dims.drop(2), strides, dil),
            strides = strides,
            group = n.attrI.getOrElse("group", 1L).toInt,
            dilations = dil)
        case "MaxPool" =>
          rejectPoolDilation(n)
          val kernel = n.attrIs.getOrElse("kernel_shape",
            throw new IllegalArgumentException("MaxPool: kernel_shape required")).map(_.toInt)
          // the ONNX spec default is stride 1 along each axis, NOT the
          // kernel shape (a model omitting strides means overlapping taps)
          val x = in(n, 0)
          val strides = intsAttr(n, "strides", Seq(1L, 1L))
          maxPool2d(x, kernel,
            pads = resolvePads(n, x.dims.drop(2), kernel, strides, Seq(1, 1)),
            strides = strides,
            ceilMode = n.attrI.getOrElse("ceil_mode", 0L) != 0L)
        case "AveragePool" =>
          rejectPoolDilation(n)
          val kernel = n.attrIs.getOrElse("kernel_shape",
            throw new IllegalArgumentException("AveragePool: kernel_shape required")).map(_.toInt)
          val x = in(n, 0)
          val strides = intsAttr(n, "strides", Seq(1L, 1L))
          val ceil = n.attrI.getOrElse("ceil_mode", 0L) != 0L
          val incPad = n.attrI.getOrElse("count_include_pad", 0L) != 0L
          // a ceil-extra window's pad-cell count differs across runtimes;
          // reject the ambiguous combination loudly
          require(!(ceil && incPad),
            "AveragePool: ceil_mode=1 with count_include_pad=1 unsupported")
          avgPool2d(x, kernel,
            pads = resolvePads(n, x.dims.drop(2), kernel, strides, Seq(1, 1)),
            strides = strides, countIncludePad = incPad, ceilMode = ceil)
        case "Concat" =>
          val axis = n.attrI.getOrElse("axis",
            throw new IllegalArgumentException("Concat: axis required"))
          concat(n.inputs.indices.map(i => in(n, i)), axis.toInt)
        case "BatchNormalization" =>
          batchNorm(in(n, 0), in(n, 1), in(n, 2), in(n, 3), in(n, 4),
            eps = n.attrF.getOrElse("epsilon", 1e-5f).toDouble)
        case "GlobalAveragePool" => globalAveragePool(in(n, 0))
        case "Flatten" => flatten(in(n, 0), n.attrI.getOrElse("axis", 1L).toInt)
        case "Sigmoid" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => 1.0 / (1.0 + math.exp(-v))))
        case "Tanh" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(math.tanh))
        case "LeakyRelu" =>
          val alpha = n.attrF.getOrElse("alpha", 0.01f).toDouble
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => if (v >= 0) v else alpha * v))
        case "Clip" =>
          // opset < 11 carries min/max as float attrs; >= 11 as optional
          // scalar inputs (MobileNet's Relu6 is Clip(0, 6))
          def scalarIn(i: Int): Option[Double] =
            if (n.inputs.size > i && n.inputs(i).nonEmpty) Some {
              val t = in(n, i)
              require(t.a.length == 1, s"Clip: input $i is not a scalar")
              t.a(0)
            } else None
          val lo = n.attrF.get("min").map(_.toDouble).orElse(scalarIn(1))
            .getOrElse(Double.NegativeInfinity)
          val hi = n.attrF.get("max").map(_.toDouble).orElse(scalarIn(2))
            .getOrElse(Double.PositiveInfinity)
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => math.min(hi, math.max(lo, v))))
        case "Transpose" => transpose(in(n, 0), intsAttr(n, "perm", Nil))
        case "Reshape" =>
          require(n.inputs.size >= 2, "Reshape: shape input required")
          reshape(in(n, 0), in(n, 1).a.map(_.toLong).toSeq,
            allowZero = n.attrI.getOrElse("allowzero", 0L) != 0L)
        case "Pad" =>
          val mode = n.attrS.getOrElse("mode", "constant")
          require(mode == "constant", s"Pad: mode=$mode unsupported (constant only)")
          // opset < 11: pads/value attrs; >= 11: pads (and optional
          // constant_value) inputs
          val pads =
            if (n.attrIs.contains("pads")) intsAttr(n, "pads", Nil)
            else {
              require(n.inputs.size >= 2, "Pad: pads attr or input required")
              in(n, 1).a.map(_.toInt).toSeq
            }
          val value = n.attrF.get("value").map(_.toDouble)
            .orElse(if (n.inputs.size > 2 && n.inputs(2).nonEmpty) Some {
              val t = in(n, 2)
              require(t.a.length == 1, "Pad: constant_value is not a scalar")
              t.a(0)
            } else None)
            .getOrElse(0.0)
          padConst(in(n, 0), pads, value)
        case "Softmax" =>
          softmax(in(n, 0), n.attrI.getOrElse("axis", -1L).toInt)
        case "ReduceMean" =>
          reduceMean(in(n, 0), intsAttr(n, "axes", Nil),
            keepdims = n.attrI.getOrElse("keepdims", 1L) != 0L)
        case "ReduceSum" =>
          // opset 13 carries axes as an optional INPUT; opset <= 11 as attr
          val axes: Seq[Int] =
            if (n.inputs.size >= 2 && n.inputs(1).nonEmpty) in(n, 1).a.map(_.toInt).toSeq
            else intsAttr(n, "axes", Nil)
          val noopEmpty = n.attrI.getOrElse("noop_with_empty_axes", 0L) != 0L
          if (axes.isEmpty && noopEmpty) in(n, 0)
          else reduceSum(in(n, 0), axes,
            keepdims = n.attrI.getOrElse("keepdims", 1L) != 0L)
        case "Gather" =>
          gather(in(n, 0), in(n, 1), n.attrI.getOrElse("axis", 0L).toInt)
        case "Cast" =>
          castOp(in(n, 0), n.attrI.getOrElse("to",
            throw new IllegalArgumentException("Cast: 'to' attr required")))
        case "Equal" => broadcastBinary("Equal", in(n, 0), in(n, 1),
          (a, b) => if (a == b) 1.0 else 0.0)
        case "Greater" => broadcastBinary("Greater", in(n, 0), in(n, 1),
          (a, b) => if (a > b) 1.0 else 0.0)
        case "Less" => broadcastBinary("Less", in(n, 0), in(n, 1),
          (a, b) => if (a < b) 1.0 else 0.0)
        case "Not" =>
          val x = in(n, 0)
          Nd(x.dims, x.a.map(v => if (v == 0.0) 1.0 else 0.0))
        case "Where" => whereOp(in(n, 0), in(n, 1), in(n, 2))
        case "Slice" =>
          // opset >= 10: starts/ends/[axes]/[steps] inputs; opset 1: attrs
          if (n.inputs.size >= 3) {
            def optIn(i: Int): Seq[Long] =
              if (n.inputs.size > i && n.inputs(i).nonEmpty) in(n, i).a.map(_.toLong).toSeq
              else Seq.empty
            sliceOp(in(n, 0), in(n, 1).a.map(_.toLong).toSeq,
              in(n, 2).a.map(_.toLong).toSeq, optIn(3), optIn(4))
          } else sliceOp(in(n, 0),
            n.attrIs.getOrElse("starts", throw new IllegalArgumentException(
              "Slice: starts attr or input required")),
            n.attrIs.getOrElse("ends", Nil),
            n.attrIs.getOrElse("axes", Nil), Seq.empty)
        case "Unsqueeze" =>
          val axes = if (n.inputs.size >= 2 && n.inputs(1).nonEmpty)
            in(n, 1).a.map(_.toLong).toSeq else n.attrIs.getOrElse("axes", Nil)
          require(axes.nonEmpty, "Unsqueeze: axes attr or input required")
          unsqueeze(in(n, 0), axes)
        case "Squeeze" =>
          val axes = if (n.inputs.size >= 2 && n.inputs(1).nonEmpty)
            in(n, 1).a.map(_.toLong).toSeq else n.attrIs.getOrElse("axes", Nil)
          squeeze(in(n, 0), axes)
        case "Expand" =>
          require(n.inputs.size >= 2, "Expand: shape input required")
          expand(in(n, 0), in(n, 1).a.map(_.toLong).toSeq)
        case "Shape" =>
          val x = in(n, 0)
          Nd(Seq(x.dims.size), x.dims.map(_.toDouble).toArray)
        case "Constant" =>
          val t = n.attrT.getOrElse("value", throw new IllegalArgumentException(
            "Constant: only the tensor-valued 'value' attr is supported"))
          toNd(t)
        case "Identity" => in(n, 0)
        case other => throw new IllegalArgumentException(
          s"unsupported ONNX op '$other' (subset: MatMul, Add, Sub, Mul, " +
            "Div, Pow, Sqrt, Exp, Neg, Erf, Gelu, LayerNormalization, " +
            "Relu, Gemm, Conv, MaxPool, AveragePool, Concat, " +
            "BatchNormalization, GlobalAveragePool, Flatten, Sigmoid, " +
            "Tanh, LeakyRelu, Clip, Transpose, Reshape, Pad, Softmax, " +
            "ReduceMean, ReduceSum, Gather, Cast, Equal, Greater, Less, " +
            "Not, Where, Slice, Unsqueeze, Squeeze, Expand, Shape, " +
            "Constant, Identity)")
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
    * from loading the torch checkpoint once per worker.
    *
    * `tileDims`: per-tile input shape. None = MLP model, the input is
    * [batch, d] where d is inferred from the first weight tensor.
    * Some(Seq(c, h, w)) = conv net, each flat tile is a row-major CHW
    * image and the input tensor is [batch, c, h, w] (the model's first op
    * is a Conv whose weight can't reveal the spatial dims, so the caller
    * declares them — same contract as the reference's tile loader, which
    * knows its tile_N from config). */
  final class OnnxModel(modelBytes: Array[Byte],
      tileDims: Option[Seq[Int]] = None) extends Inference.TileModel {
    @transient private var graph: Graph = _
    // parsed eagerly on the driver too: surface a malformed model at
    // plan-build time, and expose input/emb dims for validation
    private val (inDim, outDim) = {
      val g = Onnx.parseModel(modelBytes)
      val d = tileDims.map(_.product).getOrElse(firstWeightRows(g))
      val probe = runBatch(g, 1, new Array[Double](d))
      (d, probe.dims.last)
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
    private def runBatch(g: Graph, batch: Int, flat: Array[Double]): Nd = {
      val dims = tileDims match {
        case Some(chw) => batch +: chw
        case None      => Seq(batch, flat.length / batch)
      }
      val out = Onnx.runNd(g, Nd(dims, flat))
      require(out.dims.size == 2 && out.dims.head == batch,
        s"model output dims ${out.dims}: expected [batch=$batch, embDim] " +
          "(conv nets must end in Flatten/Gemm/MatMul)")
      out
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
      val out = runBatch(graph, tiles.size, in)
      val e = out.dims.last
      (0 until tiles.size).map { i =>
        Array.tabulate(e)(j => out.a(i * e + j).toFloat)
      }
    }
  }
}
