package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash fold((acc*31 + byte) % 1e9+7, seed 7) computed
  * directly over the UTF8String bytes — the native form of
  * TextAnalysis.polyHash.
  *
  * Why native (SURVEY §4 tier b): the HOF form
  * (`aggregate(transform(split(c,""), ascii), ...)`) materializes a
  * one-char UTF8String per character per row; this expression is a
  * zero-allocation byte loop with `doGenCode`, so fingerprinting and
  * shingle hashing stay at memory-bandwidth speed inside whole-stage
  * codegen. Byte-identical to the HOF form (and the DuckDB oracle's
  * `ord(substr(...))` fold) for ASCII input — which the tokenized/
  * shingled corpus is; for non-ASCII the HOF form remains the
  * codepoint-exact reference.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash needs a string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 7L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + (s.getByte(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |final int $n = $s.numBytes();
         |long $acc = 7L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31L + ($s.getByte($i) & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
