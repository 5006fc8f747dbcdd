package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ (double)a[i]·(double)b[i] over two Array[Float] columns — the
  * embedding dot product as one codegen'd loop.
  *
  * Why native (SURVEY §4 tier b): `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * materializes the product array and walks it with non-codegen lambda
  * calls; the similarity operators evaluate dots once per (probe,
  * candidate) PAIR, so the allocation cost multiplies by the candidate
  * count (measured ~6x on the label-blocked cosine join). Zero-allocation
  * loop, stays inside whole-stage codegen.
  *
  * Bit-parity (equal-length arrays with non-null elements — every
  * embedding column in the engine): identical to the HOF form — a strict
  * left-to-right fold starting from +0.0 with each term cast to double
  * before multiply — so DuckDB's `list_reduce` comprehension oracle keeps
  * matching (DedupSimilaritySpec asserts native == HOF on the real
  * table). Off that path the two diverge by design: unequal lengths
  * truncate to the shorter here (zip_with pads with null and the HOF
  * fold returns NULL), and a null element reads as 0.0f via getFloat
  * (the HOF returns NULL). */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
