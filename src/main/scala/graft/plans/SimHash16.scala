package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 16-bit SimHash majority vote over an array of token hashes in ONE
  * pass — the native form of the HOF chain that filters the array once
  * per bit (16 walks/row). Bit j of the result is set iff strictly more
  * than half the hashes have bit j set (`2*cnt > n`, ties clear — same
  * contract as the HOF form and the DuckDB oracle). */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash16 needs array<long>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(v: Any): Any =
    SimHash16.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.plans.SimHash16.compute($xs);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash16 {
  def compute(xs: ArrayData): Long = {
    val n = xs.numElements()
    val cnt = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i) & 0xffffL // % 65536 of the non-negative hash
      var j = 0
      while (j < 16) {
        if (((h >> j) & 1L) == 1L) cnt(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (2 * cnt(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }
}
