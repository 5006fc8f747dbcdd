package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin cell assignment against a plan-embedded centroid table:
  * struct(d2, cell) of the nearest centroid by squared L2, with the
  * (d2, cell) lexicographic tie-break — the kernel behind IVF corpus
  * assignment, SemDeDup blocking, prototype pruning, and every KMeans
  * E-step.
  *
  * Why native (SURVEY §4 tier b): the HOF form
  * (`array_min(Similarity.cellDists(...))`) materializes a K-element
  * struct array per ROW and walks K·dim interpreted lambda evals —
  * measured ~310 µs/row at K=8, dim=64 on the x10 rehearsal (and the
  * KMeans fit pays it once per round per row at K=N/500). This is the
  * same math as one codegen'd double loop over the referenced table.
  *
  * Bit-parity with the HOF form (equal-length non-null arrays): d2 is
  * the identical left-to-right fold from +0.0 of (cast(x) − c)², and
  * keep-strictly-less over ascending cells IS the lexicographic
  * (d2, cell) minimum. Spec-pinned native == HOF on float and double
  * inputs; the q73/q96/q151/q162 oracles keep matching. Off-path:
  * length truncates to min(vec, centroid) where zip_with would
  * null-pad, and null elements read as 0 via the primitive getters. */
case class CellArgmin(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "empty centroid table")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))
  override def prettyName: String = "cell_argmin"

  private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    var bestD = 0.0
    var bestC = -1
    var c = 0
    while (c < centsArr.length) {
      val cv = centsArr(c)
      val n = math.min(xs.numElements(), cv.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) xs.getFloat(j).toDouble else xs.getDouble(j)
        val d = x - cv(j)
        acc = acc + d * d
        j += 1
      }
      if (c == 0 || acc < bestD) { bestD = acc; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.addReferenceObj("cells", centsArr, "double[][]")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val getter = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |double $bestD = 0.0;
         |int $bestC = -1;
         |for (int $c = 0; $c < $tbl.length; $c++) {
         |  final double[] $cv = $tbl[$c];
         |  final int $n = Math.min($a.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final double $d = $getter - $cv[$j];
         |    $acc = $acc + $d * $d;
         |  }
         |  if ($c == 0 || $acc < $bestD) { $bestD = $acc; $bestC = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $bestD, $bestC });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellArgmin {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column form: struct(d2 double, cell int) of the nearest centroid. */
  def cellArgminCol(vec: Column, cents: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      CellArgmin(GraftColumnBridge.expression(vec), cents))
}
