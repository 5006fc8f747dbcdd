package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED Array[Long] columns as a single merge walk —
  * no per-row HashSet, no materialized intersection array.
  *
  * Why a native Catalyst Expression (SURVEY §4 "custom" tier b): the
  * Jaccard verify step of the dedup suite evaluates set intersection once
  * per candidate pair; `size(array_intersect(...))` allocates a hash set
  * and an output array per call and gets evaluated twice when the same
  * expression feeds both a Filter and a Project. This expression is a
  * zero-allocation O(n+m) scan with `doGenCode`, so it stays inside
  * whole-stage codegen. Inputs must be sorted ascending and deduplicated
  * (see Dedup.shingleHashes) — that sort is paid once per document, not
  * once per pair.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0;
         |final int $n = $a.numElements(); final int $m = $b.numElements();
         |long ${ev.value}_cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i); final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}_cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
