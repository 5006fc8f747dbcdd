package graft.pipeline

import graft.embeddings.{Onnx, OnnxWriter}
import graft.embeddings.OnnxWriter.NodeSpec
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the real-export op surface (Gather/Cast/Equal/
  * Where/Slice/Unsqueeze/Squeeze/Expand/Shape/ReduceSum and multi-input
  * execution) — each op exercised through a serialized model round-trip,
  * including the spec edge cases: negative indices/axes, slice clamping,
  * truncation toward zero, bidirectional Expand broadcast. The foreign
  * fixture (ForeignFixturesSpec) proves the same surface against
  * independently-written bytes; these tests pin the edge semantics. */
class OnnxRealExportSpec extends AnyFunSuite {

  private def nd(dims: Int*)(vals: Double*) = Onnx.Nd(dims, vals.toArray)

  private def run1(node: NodeSpec,
      i64: Seq[(String, Seq[Int], Array[Long], Boolean)] = Nil,
      f32: Seq[(String, Seq[Int], Array[Float], Boolean)] = Nil)(x: Onnx.Nd): Onnx.Nd = {
    val bytes = OnnxWriter.model(Seq(node), f32, "x", node.outputs.head,
      int64Initializers = i64)
    Onnx.runNd(Onnx.parseModel(bytes), x)
  }

  test("Gather: axis-0 lookup, negative indices count from the end") {
    // data [4,2]; indices [3] = [2, -1, 0] -> rows 2, 3, 0
    val out = run1(NodeSpec("Gather", Seq("t", "x"), Seq("y"),
      attrI = Seq("axis" -> 0L)),
      f32 = Seq(("t", Seq(4, 2), Array.tabulate(8)(_.toFloat), true)))(
      nd(3)(2, -1, 0))
    assert(out.dims == Seq(3, 2))
    assert(out.a.toSeq == Seq(4.0, 5.0, 6.0, 7.0, 0.0, 1.0))
  }

  test("Gather: axis 1 and out-of-range index rejects") {
    val out = run1(NodeSpec("Gather", Seq("t", "x"), Seq("y"),
      attrI = Seq("axis" -> 1L)),
      f32 = Seq(("t", Seq(2, 3), Array.tabulate(6)(_.toFloat), true)))(
      nd(1)(2))
    assert(out.dims == Seq(2, 1) && out.a.toSeq == Seq(2.0, 5.0))
    val e = intercept[IllegalArgumentException] {
      run1(NodeSpec("Gather", Seq("t", "x"), Seq("y")),
        f32 = Seq(("t", Seq(2, 3), Array.tabulate(6)(_.toFloat), true)))(nd(1)(5))
    }
    assert(e.getMessage.contains("out of range"))
  }

  test("Cast: integer targets truncate toward zero, bool maps nonzero to 1") {
    val toI64 = run1(NodeSpec("Cast", Seq("x"), Seq("y"), attrI = Seq("to" -> 7L)))(
      nd(4)(1.9, -1.9, 0.2, -0.2))
    assert(toI64.a.toSeq == Seq(1.0, -1.0, 0.0, -0.0))
    val toBool = run1(NodeSpec("Cast", Seq("x"), Seq("y"), attrI = Seq("to" -> 9L)))(
      nd(3)(0.0, -2.5, 7.0))
    assert(toBool.a.toSeq == Seq(0.0, 1.0, 1.0))
    val toF = run1(NodeSpec("Cast", Seq("x"), Seq("y"), attrI = Seq("to" -> 1L)))(
      nd(2)(1.5, -2.5))
    assert(toF.a.toSeq == Seq(1.5, -2.5))
  }

  test("Equal + Where: scalar broadcast selects per element") {
    // where(x == 0, -1, x) over [2,3]
    val bytes = OnnxWriter.model(Seq(
      NodeSpec("Equal", Seq("x", "zero"), Seq("eq")),
      NodeSpec("Where", Seq("eq", "neg", "x"), Seq("y"))),
      Seq(("zero", Seq(1), Array(0.0f), true), ("neg", Seq(1), Array(-1.0f), true)),
      "x", "y")
    val out = Onnx.runNd(Onnx.parseModel(bytes), nd(2, 3)(0, 2, 0, 3, 0, 4))
    assert(out.dims == Seq(2, 3))
    assert(out.a.toSeq == Seq(-1.0, 2.0, -1.0, 3.0, -1.0, 4.0))
  }

  test("Where: three-way broadcast across distinct shapes") {
    // cond [2,1], x [1,3], y scalar -> [2,3]
    val bytes = OnnxWriter.model(Seq(
      NodeSpec("Where", Seq("c", "a", "x"), Seq("y"))),
      Seq(("c", Seq(2, 1), Array(1.0f, 0.0f), true),
          ("a", Seq(1, 3), Array(10f, 20f, 30f), true)),
      "x", "y")
    val out = Onnx.runNd(Onnx.parseModel(bytes), nd(1)(7))
    assert(out.dims == Seq(2, 3))
    assert(out.a.toSeq == Seq(10.0, 20.0, 30.0, 7.0, 7.0, 7.0))
  }

  test("Slice: negative starts/ends, end clamping, step 2; attr form") {
    // input [6]: starts=[-4] ends=[100] axes=[0] steps=[2] -> idx 2,4
    val out = run1(NodeSpec("Slice", Seq("x", "st", "en", "ax", "sp"), Seq("y")),
      i64 = Seq(("st", Seq(1), Array(-4L), true), ("en", Seq(1), Array(100L), true),
                ("ax", Seq(1), Array(0L), false), ("sp", Seq(1), Array(2L), false)))(
      nd(6)(0, 1, 2, 3, 4, 5))
    assert(out.dims == Seq(2) && out.a.toSeq == Seq(2.0, 4.0))
    // legacy attr form (opset 1): starts/ends/axes attrs
    val out2 = run1(NodeSpec("Slice", Seq("x"), Seq("y"),
      attrIs = Seq("starts" -> Seq(1L), "ends" -> Seq(3L), "axes" -> Seq(1L))))(
      nd(2, 4)(0, 1, 2, 3, 4, 5, 6, 7))
    assert(out2.dims == Seq(2, 2) && out2.a.toSeq == Seq(1.0, 2.0, 5.0, 6.0))
    // negative steps reject loudly
    val e = intercept[IllegalArgumentException] {
      run1(NodeSpec("Slice", Seq("x", "st", "en", "ax", "sp"), Seq("y")),
        i64 = Seq(("st", Seq(1), Array(5L), true), ("en", Seq(1), Array(0L), true),
                  ("ax", Seq(1), Array(0L), false), ("sp", Seq(1), Array(-1L), false)))(
        nd(6)(0, 1, 2, 3, 4, 5))
    }
    assert(e.getMessage.contains("steps"))
  }

  test("Unsqueeze/Squeeze: axes-as-input and attr forms, negative axes") {
    val u = run1(NodeSpec("Unsqueeze", Seq("x", "ax"), Seq("y")),
      i64 = Seq(("ax", Seq(2), Array(0L, -1L), true)))(nd(2, 3)(1, 2, 3, 4, 5, 6))
    assert(u.dims == Seq(1, 2, 3, 1))
    val s = run1(NodeSpec("Squeeze", Seq("x"), Seq("y"),
      attrIs = Seq("axes" -> Seq(0L))))(Onnx.Nd(Seq(1, 4), Array(1.0, 2, 3, 4)))
    assert(s.dims == Seq(4))
    // empty axes: drop every size-1 dim
    val s2 = run1(NodeSpec("Squeeze", Seq("x"), Seq("y")))(
      Onnx.Nd(Seq(1, 2, 1, 2), Array(1.0, 2, 3, 4)))
    assert(s2.dims == Seq(2, 2))
    // squeezing a non-1 dim rejects
    val e = intercept[IllegalArgumentException] {
      run1(NodeSpec("Squeeze", Seq("x"), Seq("y"),
        attrIs = Seq("axes" -> Seq(1L))))(Onnx.Nd(Seq(1, 4), Array(1.0, 2, 3, 4)))
    }
    assert(e.getMessage.contains("size-1"))
  }

  test("Expand: bidirectional broadcast (input larger along an axis than shape)") {
    // x [2,1] expanded by shape [1,3] -> [2,3] (max per axis, per spec)
    val out = run1(NodeSpec("Expand", Seq("x", "sh"), Seq("y")),
      i64 = Seq(("sh", Seq(2), Array(1L, 3L), true)))(nd(2, 1)(5, 9))
    assert(out.dims == Seq(2, 3))
    assert(out.a.toSeq == Seq(5.0, 5.0, 5.0, 9.0, 9.0, 9.0))
  }

  test("Shape feeds Gather: the dynamic-shape chain every HF export carries") {
    // Shape(x) -> [2,3]; Gather(shape, [1]) -> [3]
    val bytes = OnnxWriter.model(Seq(
      NodeSpec("Shape", Seq("x"), Seq("sh")),
      NodeSpec("Gather", Seq("sh", "idx"), Seq("y"), attrI = Seq("axis" -> 0L))),
      Nil, "x", "y",
      int64Initializers = Seq(("idx", Seq(1), Array(1L), true)))
    val out = Onnx.runNd(Onnx.parseModel(bytes), nd(2, 3)(0, 0, 0, 0, 0, 0))
    assert(out.a.toSeq == Seq(3.0))
  }

  test("ReduceSum: axes input, keepdims both ways, noop_with_empty_axes") {
    val x = nd(2, 3)(1, 2, 3, 4, 5, 6)
    val k0 = run1(NodeSpec("ReduceSum", Seq("x", "ax"), Seq("y"),
      attrI = Seq("keepdims" -> 0L)),
      i64 = Seq(("ax", Seq(1), Array(1L), true)))(x)
    assert(k0.dims == Seq(2) && k0.a.toSeq == Seq(6.0, 15.0))
    val k1 = run1(NodeSpec("ReduceSum", Seq("x", "ax"), Seq("y"),
      attrI = Seq("keepdims" -> 1L)),
      i64 = Seq(("ax", Seq(1), Array(0L), true)))(x)
    assert(k1.dims == Seq(1, 3) && k1.a.toSeq == Seq(5.0, 7.0, 9.0))
    val noop = run1(NodeSpec("ReduceSum", Seq("x"), Seq("y"),
      attrI = Seq("noop_with_empty_axes" -> 1L)))(x)
    assert(noop.dims == Seq(2, 3) && noop.a.toSeq == x.a.toSeq)
    val all = run1(NodeSpec("ReduceSum", Seq("x"), Seq("y"),
      attrI = Seq("keepdims" -> 0L)))(x)
    assert(all.dims == Seq(1) && all.a.toSeq == Seq(21.0))
  }

  test("multi-input runNd: missing input rejects with the input name") {
    val bytes = OnnxWriter.model(
      Seq(NodeSpec("Add", Seq("x", "x"), Seq("y"))), Nil, "x", "y")
    val g = Onnx.parseModel(bytes)
    val e = intercept[IllegalArgumentException] {
      Onnx.runNd(g, Map("wrong" -> nd(1)(1)))
    }
    assert(e.getMessage.contains("x"))
  }
}
