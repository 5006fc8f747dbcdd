package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table TRAINING — the tokenizer-training loop
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units", §3.2) that connects the q120 pair statistics to the
  * q122 merge application: each round recomputes occurrence-weighted
  * adjacent-symbol pair counts over the distinct-word vocabulary, takes
  * the top pair, and merges it everywhere.
  *
  * Scale shape: the corpus is touched ONCE (the word-count aggregation);
  * every round after that runs on the VOCABULARY frame — the
  * word-frequency-dict formulation production BPE trainers use (a vocab
  * is orders of magnitude smaller than its corpus, and pair counts
  * weighted by word frequency are identical to counting over the raw
  * corpus). Per round: one pair explode + one map-side-combinable sum +
  * a 1-row collect (the argmax — bounded driver state, the q112/HDBSCAN
  * pattern), then one projection applying the merge. Lineage truncates
  * every round ([[Checkpointing]]; pass `checkpointDir` for the reliable
  * cluster mode).
  *
  * Determinism: the round winner is (count DESC, left, right) — fully
  * ordered, so the learned table is independent of partitioning. The
  * merge itself is applied as TWO boundary-anchored leftmost-
  * non-overlapping plain replaces on the space-joined symbol string
  * (' a b ' -> ' ab '): pass 1 can consume the leading space of an
  * adjacent occurrence, pass 2 catches the now-isolated rest —
  * equivalent to the canonical symbol-list merge (spec-proven against
  * one) and the identical algorithm in both engines (q122's documented
  * convention).
  */
object BpeTrainer {

  /** One learned merge: 1-based rank, the merged symbol pair, and the
    * occurrence-weighted pair count that won the round. */
  final case class Merge(rnk: Long, l: String, r: String, pcnt: Long)

  /** Spaced symbol string of a word: " w o r d " (each char a symbol,
    * space-separated, boundary spaces so merges anchor on ' a b '). */
  private[operators] def spaced(tok: Column): Column =
    concat(lit(" "), trim(regexp_replace(tok, "(.)", "$1 ")), lit(" "))

  /** GPT-2-style pre-tokenizer regex, lookahead-free so an oracle can
    * replay it under RE2: letter runs, digit runs, and punctuation runs,
    * each with an optional leading space (the space RIDES THE TOKEN —
    * the GPT-2 convention that lets merges learn word boundaries). The
    * contraction alternates and the trailing-whitespace lookahead of the
    * exact GPT-2 pattern are dropped; they only matter for whitespace-
    * preserving decode, not for merge learning. */
  val ByteLevelPretokenRegex = """ ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""

  /** GPT-2 visible-space symbol: byte 0x20 prints as U+0120 'Ġ' so every
    * symbol is non-blank and the spaced-seg representation stays valid. */
  val VisibleSpace = "Ġ"

  /** Learn the first `nMerges` BPE merges over the word vocabulary of
    * `textCol` (tokens = TextAnalysis.tokens: lower, trim, split \s+).
    * Returns fewer merges only if the vocabulary runs out of adjacent
    * pairs (every word reduced to a single symbol). */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
      checkpointDir: Option[String] = None): Seq[Merge] = {
    val vocab = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    mergeLoop(vocab.select(spaced(col("tok")).as("seg"), col("cnt")),
      nMerges, checkpointDir)
  }

  /** BYTE-LEVEL variant (the GPT-2 recipe, Radford et al. 2019 §2.2):
    * pre-tokens come from [[ByteLevelPretokenRegex]] over the lowercased
    * text (leading space attached), and the initial symbols are the
    * pre-token's BYTES with 0x20 mapped to the visible 'Ġ'. For ASCII
    * corpora — asserted below, rejected loudly otherwise — chars ARE the
    * UTF-8 bytes, so the per-char split IS the byte split and the only
    * byte that needs the GPT-2 printable mapping is the space. (Full
    * non-ASCII byte-level needs a per-byte explode of multi-byte UTF-8
    * sequences; out of scope until a non-ASCII corpus needs it.) */
  def learnByteMerges(df: DataFrame, textCol: String, nMerges: Int,
      checkpointDir: Option[String] = None): Seq[Merge] = {
    val vocab = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(ByteLevelPretokenRegex), lit(0))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val nonAscii = vocab.where(col("tok").rlike("[^\\x00-\\x7F]")).limit(1).count()
    require(nonAscii == 0,
      "byte-level BPE: non-ASCII pre-token found — per-byte UTF-8 split not implemented")
    mergeLoop(vocab.select(
      spaced(translate(col("tok"), " ", VisibleSpace)).as("seg"), col("cnt")),
      nMerges, checkpointDir)
  }

  /** The shared round loop: pair-count argmax + double boundary-anchored
    * replace over a (seg, cnt) vocabulary frame. */
  private def mergeLoop(segInit: DataFrame, nMerges: Int,
      checkpointDir: Option[String]): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var seg = Checkpointing.truncate(segInit, checkpointDir)
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val syms = split(trim(col("seg")), " ")
      // adjacent pairs: CaseWhen evaluates branches lazily, so the
      // sequence() never sees a single-symbol word's 0..-1 range
      val prs = when(size(syms) >= 2,
        transform(sequence(lit(0), size(syms) - lit(2)),
          i => struct(element_at(syms, (i + lit(1)).cast("int")).as("l"),
            element_at(syms, (i + lit(2)).cast("int")).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val top = seg
        .select(explode(prs).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly one row — the round's argmax
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, r, pcnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(round + 1L, l, r, pcnt)
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l$r ")
        def applied(c: Column): Column = call_function("replace", c, pat, rep)
        seg = Checkpointing.truncate(
          seg.select(applied(applied(col("seg"))).as("seg"), col("cnt")),
          checkpointDir)
        round += 1
      }
    }
    merges.result()
  }
}
