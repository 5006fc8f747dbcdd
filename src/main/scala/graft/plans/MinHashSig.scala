package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature — k per-row minima of (a_i·x + b_i) mod P over a
  * hashed-shingle set — in ONE pass over the input array.
  *
  * The HOF form (`array_min(transform(xs, ...))` × k) walks and
  * materializes the array k times per row; at corpus scale the signature
  * stage is per-row work over every document, so the k-accumulator loop
  * matters. Coefficients are the same deterministic schedule as
  * `Dedup.aCoef/bCoef` (spec-asserted), so signatures are bit-identical
  * to the HOF form and the DuckDB oracle.
  *
  * Returns NULL for an empty input set (array_min of an empty transform
  * is null — same contract as the HOF form).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<long>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sigRes")
    nullSafeCodeGen(ctx, ev, xs =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.plans.MinHashSig.compute($xs, $k);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  val P = 1000000007L
  def aCoef(i: Int): Long = (i.toLong * 2654435761L) % P + 1
  def bCoef(i: Int): Long = (i.toLong * 40503L * 65537L) % P

  /** Null for empty input (the HOF form's array_min-of-empty). */
  def compute(xs: ArrayData, k: Int): ArrayData = {
    val n = xs.numElements()
    if (n == 0) return null
    val as = Array.tabulate(k)(aCoef)
    val bs = Array.tabulate(k)(bCoef)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < k) {
        val h = (as(j) * x + bs(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
