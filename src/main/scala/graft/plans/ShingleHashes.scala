package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct poly-hashes of all `n`-character grams of a string —
  * the native one-pass form of `Dedup.shingleHashes`
  * (`sort_array(array_distinct(transform(charNgrams(c,n), polyHash)))`).
  *
  * Why native (SURVEY §4 tier b): the HOF chain materializes every gram
  * as its own UTF8String, distincts them as strings, hashes, distincts
  * again and sorts — five array passes with O(len·n) allocation per row.
  * This expression hashes each gram with a 3-multiply window directly
  * over the input bytes, then sorts + dedups one primitive long[] in
  * place. It feeds every MinHash/LSH/Jaccard query, which makes it the
  * hottest per-row kernel in the dedup suite.
  *
  * Exactness: for ASCII input (the shingled corpus, same contract as
  * [[PolyHash]]) this is byte-identical to the HOF form and the DuckDB
  * oracle. Inputs containing any non-ASCII byte take a slow path that
  * reproduces the HOF semantics exactly (codepoint windows, hashed over
  * their UTF-8 bytes).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.ShingleHashes.compute($s, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  private val P = 1000000007L

  /** Static kernel shared by eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (i < nb && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    val hs: Array[Long] =
      if (ascii) {
        if (nb < n) return new GenericArrayData(Array.empty[Long])
        val out = new Array[Long](nb - n + 1)
        var g = 0
        while (g <= nb - n) {
          var acc = 7L
          var j = 0
          while (j < n) { acc = (acc * 31 + (s.getByte(g + j) & 0xff)) % P; j += 1 }
          out(g) = acc
          g += 1
        }
        out
      } else slowPath(s.toString, n)
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Non-ASCII: n-CODEPOINT windows hashed over their UTF-8 bytes —
    * exactly `polyHash(substr(c, i, n))`. */
  private def slowPath(str: String, n: Int): Array[Long] = {
    val cps = str.codePoints().toArray
    if (cps.length < n) return Array.empty[Long]
    Array.tabulate(cps.length - n + 1) { g =>
      val bytes = new String(cps, g, n).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var acc = 7L
      bytes.foreach(b => acc = (acc * 31 + (b & 0xff)) % P)
      acc
    }
  }
}
