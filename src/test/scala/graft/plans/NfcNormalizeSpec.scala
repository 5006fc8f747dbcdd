package graft.plans

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native NFC normalization: equality with java.text.Normalizer across
  * composition classes, zero-copy fast path, null/empty edges, and the
  * SQL registration. Every fixture string is built from explicit
  * codepoint escapes (never literal glyphs), so the decomposed/composed
  * distinction survives any editor or toolchain normalization. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val DecomposedEAcute = "e\u0301"   // -> U+00E9
  private val ComposedEAcute = "\u00e9"
  private val DecomposedARing = "A\u030a"    // -> U+00C5
  private val ComposedARing = "\u00c5"
  // dot-below (ccc 220) typed AFTER dot-above (ccc 230): NFC must
  // canonically REORDER the marks (below before above) even though no
  // precomposed form exists for the pair
  private val MarksOutOfOrder = "q\u0307\u0323"
  private val MarksReordered = "q\u0323\u0307"
  private val Astral = new String(Character.toChars(0x1F600)) + " ok"
  private val CompatLigature = "ffi " + "\ufb03"  // NFC keeps U+FB03

  private val cases = Seq(
    "plain ascii only",
    "",
    DecomposedEAcute,
    ComposedEAcute,
    DecomposedARing,
    MarksOutOfOrder,
    MarksReordered,
    "d\u0323\u0307x",  // d+dot-below+dot-above -> U+1E0D + dot-above
    "g\u0308\u0304b",  // double-mark stack on one base
    Astral,
    "A\u0300\u0316mix",  // above + below marks on one base
    CompatLigature)

  private def refNfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  test("matches java.text.Normalizer on every composition class") {
    val got = cases.zipWithIndex.toDF("s", "i").orderBy("i")
      .select(TextAnalysis.nfcNormalize(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(got == cases.map(refNfc))
  }

  test("specific semantics: compose, reorder, keep ligatures and astral") {
    assert(refNfc(DecomposedEAcute) == ComposedEAcute) // sanity of ref
    val m = cases.zipWithIndex.toDF("s", "i")
      .select(col("i"), TextAnalysis.nfcNormalize(col("s")).as("n"))
      .as[(Int, String)].collect().toMap
    assert(m(2) == ComposedEAcute)
    assert(m(4) == ComposedARing)
    assert(m(5) == MarksReordered)     // reordering without composition
    assert(m(9) == Astral)             // surrogate pair untouched
    assert(m(11) == CompatLigature)    // NFKC would rewrite; NFC keeps
  }

  test("fast path returns the input object untouched for normalized text") {
    val in = UTF8String.fromString("nothing to do here")
    assert(NfcUtil.nfc(in) eq in)
    val empty = UTF8String.fromString("")
    assert(NfcUtil.nfc(empty) eq empty)
    val dirty = UTF8String.fromString(DecomposedEAcute)
    assert(NfcUtil.nfc(dirty).toString == ComposedEAcute)
  }

  test("null propagates; SQL registration exposes nfc_normalize") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)) AS a, " +
        // the Scala-level escape embeds the combining mark into the SQL
        // text itself (Spark SQL chr() is mod-256 ASCII, unusable here)
        "nfc_normalize('e\u0301') AS b").collect().head
    assert(r.isNullAt(0) && r.getString(1) == ComposedEAcute)
  }

  test("interpreted eval agrees with the reference on all cases") {
    // collect() above runs whole-stage codegen; eval the expression
    // directly for the interpreted side
    import org.apache.spark.sql.catalyst.expressions.Literal
    cases.foreach { s =>
      val interp = NfcNormalize(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null)
      assert(interp.toString == refNfc(s),
        s"case: ${s.codePoints.toArray.toSeq}")
    }
  }
}
