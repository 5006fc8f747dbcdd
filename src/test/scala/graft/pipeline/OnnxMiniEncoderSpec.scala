package graft.pipeline

import graft.embeddings.Onnx
import org.scalatest.funsuite.AnyFunSuite

/** The PYTHON-written mini_encoder.onnx fixture — a MiniLM-shaped
  * one-block encoder carrying the FULL real-export graph (token Gather +
  * position Add, single-head attention with the additive (1-mask)*-1e4
  * bias, Softmax, residual, fused LayerNormalization, masked mean
  * pooling) — executed through the multi-input path and matched
  * bit-for-bit against an independent loop reference implemented here
  * from the published formulas (no shared code with the executor). */
class OnnxMiniEncoderSpec extends AnyFunSuite {

  private val V = 32; private val H = 8; private val S = 6

  // the fixture writer's weight formulas (exact eighths)
  private def emb(t: Int, h: Int) = ((t * 31 + h * 7) % 13 - 6) / 8.0
  private def pos(s: Int, h: Int) = ((s * 11 + h * 3) % 9 - 4) / 8.0
  private def wq(i: Int, j: Int) = ((i * 3 + j * 5) % 11 - 5) / 8.0
  private def wk(i: Int, j: Int) = ((i * 5 + j * 3) % 13 - 6) / 8.0
  private def wv(i: Int, j: Int) = ((i * 7 + j * 2) % 7 - 3) / 8.0
  private def wo(i: Int, j: Int) = ((i * 2 + j * 7) % 9 - 4) / 8.0
  private def gamma(h: Int) = ((h % 3) + 1) / 4.0
  private def beta(h: Int) = ((h % 5) - 2) / 8.0

  /** Independent reference: plain loops in the executor's documented
    * accumulation orders (left-to-right k sums, scan-order reductions). */
  private def reference(ids: Seq[Int], mask: Seq[Int]): Array[Double] = {
    val x0 = Array.tabulate(S, H)((s, h) => emb(ids(s), h) + pos(s, h))
    def proj(w: (Int, Int) => Double) =
      Array.tabulate(S, H)((s, j) => (0 until H).map(d => x0(s)(d) * w(d, j)).sum)
    val q = proj(wq); val k = proj(wk); val v = proj(wv)
    val bias = mask.map(m => (1.0 - m) * -10000.0)
    val scores = Array.tabulate(S, S)((i, j) =>
      (0 until H).map(d => q(i)(d) * k(j)(d)).sum * 0.25 + bias(j))
    val att = scores.map { row =>
      val mx = row.max
      val ex = row.map(z => math.exp(z - mx))
      val sum = ex.sum
      ex.map(_ / sum)
    }
    val ctx = Array.tabulate(S, H)((i, j) =>
      (0 until S).map(d => att(i)(d) * v(d)(j)).sum)
    val res = Array.tabulate(S, H)((i, j) =>
      x0(i)(j) + (0 until H).map(d => ctx(i)(d) * wo(d, j)).sum)
    val ln = res.map { row =>
      val mu = row.sum / H
      val va = row.map(c => (c - mu) * (c - mu)).sum / H
      val sd = math.sqrt(va + 0.25)
      Array.tabulate(H)(j => (row(j) - mu) / sd * gamma(j) + beta(j))
    }
    val n = mask.sum.toDouble
    Array.tabulate(H)(j =>
      (0 until S).map(s => if (mask(s) == 1) ln(s)(j) else 0.0).sum / n)
  }

  test("foreign mini-encoder matches the loop reference bit-for-bit") {
    val f = new java.io.File("src/test/resources/fixtures/mini_encoder.onnx")
    require(f.exists, "mini_encoder.onnx missing — run tools/make_fixtures.py")
    val g = Onnx.parseModel(java.nio.file.Files.readAllBytes(f.toPath))
    assert(g.dataInputs.toSet == Set("input_ids", "attention_mask"))
    val docs = Seq(
      (Seq(3, 17, 9, 0, 0, 0), Seq(1, 1, 1, 0, 0, 0)),
      (Seq(1, 2, 3, 4, 5, 6), Seq(1, 1, 1, 1, 1, 1)),
      (Seq(31, 0, 0, 0, 0, 0), Seq(1, 0, 0, 0, 0, 0)))
    val b = docs.size
    val out = Onnx.runNd(g, Map(
      "input_ids" -> Onnx.Nd(Seq(b, S),
        docs.flatMap(_._1).map(_.toDouble).toArray),
      "attention_mask" -> Onnx.Nd(Seq(b, S),
        docs.flatMap(_._2).map(_.toDouble).toArray)))
    assert(out.dims == Seq(b, H))
    docs.zipWithIndex.foreach { case ((ids, mask), i) =>
      val want = reference(ids, mask)
      (0 until H).foreach { j =>
        assert(math.abs(out.a(i * H + j) - want(j)) < 1e-12,
          s"doc $i dim $j: ${out.a(i * H + j)} vs ${want(j)}")
      }
    }
    // padded positions must not leak: identical unmasked prefix, different
    // padding tokens -> identical embeddings
    val out2 = Onnx.runNd(g, Map(
      "input_ids" -> Onnx.Nd(Seq(1, S), Array(3.0, 17, 9, 30, 29, 28)),
      "attention_mask" -> Onnx.Nd(Seq(1, S), Array(1.0, 1, 1, 0, 0, 0))))
    val base = reference(Seq(3, 17, 9, 0, 0, 0), Seq(1, 1, 1, 0, 0, 0))
    (0 until H).foreach { j =>
      // the -1e4 softmax bias leaves ~e^-10000 = 0 (underflow) attention
      // on pads, so pad token IDENTITY cannot affect the output beyond
      // double ulps
      assert(math.abs(out2.a(j) - base(j)) < 1e-9,
        s"pad leak at dim $j: ${out2.a(j)} vs ${base(j)}")
    }
  }
}
