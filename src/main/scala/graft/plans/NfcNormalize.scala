package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen'd expression — the text-pipeline step every tokenizer-bound
  * corpus runs first: decomposed sequences (e + U+0301) and their
  * precomposed forms (U+00E9) are the SAME text to a reader but
  * different byte streams to hashing, dedup keys, BPE merges and
  * blocklist matches, so normalization must happen before any of them.
  *
  * Why native (SURVEY §4 tier b): there is no builtin Spark function for
  * this (the usual route is a Scala UDF, which boxes String per row and
  * blocks codegen fusion). This expression stays inside whole-stage
  * codegen and takes the zero-copy fast path for already-normalized
  * input: `Normalizer.isNormalized` runs the NFC quick-check, which for
  * ASCII — the overwhelming bulk of web text — is a single pass that
  * allocates nothing and returns the input UTF8String as-is. Only rows
  * that actually contain decomposable sequences pay the
  * String-roundtrip normalization.
  *
  * Engine parity: NFC is a Unicode-defined bijection-free canonical
  * form; the JVM Normalizer and DuckDB's `nfc_normalize` both implement
  * UAX #15, so q181 hashes agree byte-for-byte.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = graft.plans.NfcUtil.nfc($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NfcUtil {
  /** NFC-normalize a UTF8String; returns the INPUT object untouched when
    * the quick-check passes (no allocation on the already-normalized
    * hot path, which includes all pure-ASCII rows). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
