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
    val sigmoid = OnnxWriter.model(
      nodes = Seq(OnnxWriter.NodeSpec("Sigmoid", Seq("x"), Seq("y"))),
      initializers = Seq(("w", Seq(1), Array(1.0f), true)),
      inputName = "x", outputName = "y")
    val ex = intercept[IllegalArgumentException] {
      Onnx.run(Onnx.parseModel(sigmoid), Onnx.Mat(1, 1, Array(0.0)))
    }
    assert(ex.getMessage.contains("Sigmoid"))

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
