package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Position-ordered poly-hashes of all `n`-token grams of a token array
  * — the native one-pass form of
  * `transform(sequence(0, m-n), i -> polyHash(concat_ws(" ", slice(toks, i+1, n))))`.
  *
  * Why native (SURVEY §4 tier b): the HOF chain materializes a joined
  * string per position (O(m·n·len) bytes of allocation per row); this
  * expression folds the same byte sequence — token bytes with a single
  * 0x20 between them, concat_ws null-skipping included — straight out
  * of the array's UTF8Strings with zero allocation. It feeds the
  * exact-substring span dedup (the 2nd-heaviest headline query) and
  * benchmark decontamination.
  *
  * Exactness: byte-identical to the HOF form (and the oracle's
  * `array_to_string(toks[i:i+n-1], ' ')` fold) for EVERY input —
  * the fold is over UTF-8 bytes, so no ASCII fast/slow split is
  * needed. Output index IS the gram's 0-based token position. */
case class TokenNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_ngram_hashes needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ngram_hashes"

  override def nullSafeEval(v: Any): Any =
    TokenNgramHashes.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.TokenNgramHashes.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenNgramHashes {
  private val P = 1000000007L

  /** Static kernel shared by eval and codegen. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    var g = 0
    while (g <= m - n) {
      var acc = 7L
      var wrote = false // concat_ws skips nulls AND their separators
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(g + j)) {
          if (wrote) acc = (acc * 31 + 0x20) % P
          val t: UTF8String = arr.getUTF8String(g + j)
          val nb = t.numBytes()
          var b = 0
          while (b < nb) {
            acc = (acc * 31 + (t.getByte(b) & 0xff)) % P
            b += 1
          }
          wrote = true
        }
        j += 1
      }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }
}
