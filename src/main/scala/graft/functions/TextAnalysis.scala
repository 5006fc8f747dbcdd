package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for large-scale training-data pipelines:
  * tokenization, n-gram shingling, rolling-hash fingerprinting, language-ID
  * heuristics and quality scoring.
  *
  * All functions are built from Spark's higher-order array functions and
  * codegen'd built-ins — no UDFs — so they stay inside whole-stage codegen
  * and distribute trivially (pure per-row work, no shuffle).
  *
  * Cross-engine determinism notes (the DuckDB oracle recomputes these):
  * integer arithmetic only in hashes (mod 1e9+7 keeps products < 2^63),
  * and ratio outputs are int/int single divisions (bit-stable IEEE).
  */
object TextAnalysis {
  val HashMod = 1000000007L

  def normText(c: Column): Column = lower(trim(c))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Distinct character n-grams (shingles) of the raw text; empty array if
    * the text is shorter than n (guards Spark's descending `sequence`). */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Polynomial rolling-hash fingerprint: fold (acc*31 + codepoint) % p over
    * characters, seed 7. Deterministic across engines (pure int64 ops).
    * At 100 TB prefer [[fingerprint64]] (xxhash64, one codegen'd call);
    * this form exists because the oracle must reproduce it exactly.
    *
    * Default implementation: the native byte-loop expression
    * (graft.plans.PolyHash, zero-allocation, codegen'd) — byte-identical
    * to [[polyHashHof]] and the DuckDB oracle for ASCII text.
    */
  def polyHash(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.plans.PolyHash(expression(c)))
  }

  /** Reference HOF form (codepoint-exact for any input): `split(c, "")`
    * yields the char array in one O(n) pass — per-index `substring` would
    * re-seek the UTF8String every call (O(n²)/row, measured 5x slower). */
  def polyHashHof(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(7L),
      (acc, x) => (acc * 31 + x) % HashMod)

  /** Production-path fingerprint: single codegen'd 64-bit hash. */
  def fingerprint64(c: Column): Column = xxhash64(normText(c))

  /** Count of tokens present in `markers` (with multiplicity). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** Marker-word language-ID heuristic: argmax of per-language stopword
    * hits, priority-ordered on ties, 'und' when nothing matches. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "le", "shi", "zai", "he"))

  def langGuess(toksCol: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHits(toksCol, ms) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && h > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Approximate BPE-ish token count: alpha runs + digit runs + isolated
    * non-alnum glyphs each count as one token. */
  def subwordCount(c: Column): Column =
    regexp_count(normText(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Simple quality score in [0,1]: mix of stopword ratio, alpha ratio and
    * a length band — deterministic arithmetic over int counts. */
  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    val nTok = size(toks).cast("double")
    val stopRatio = markerHits(toks, Seq("the", "a", "of", "and", "is")).cast("double") / nTok
    val alphaRatio = regexp_count(normText(c), lit("[a-z]")).cast("double") / length(normText(c)).cast("double")
    val lengthOk = when(length(c) >= 100 && length(c) <= 10000, 1.0).otherwise(0.0)
    stopRatio * 0.4 + alphaRatio * 0.4 + lengthOk * 0.2
  }
}
