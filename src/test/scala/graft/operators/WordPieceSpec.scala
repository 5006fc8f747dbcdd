package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece greedy longest-match segmentation and the corpus encode. */
class WordPieceSpec extends SparkSpec {

  private val vocab = Seq(
    "the", "a", "un", "b", "ab", "abc", // plain (word-initial)
    "##le", "##e", "##c", "##able", "##bc") // continuation

  private def seg(words: String*): Map[String, Seq[String]] = {
    val s = spark
    import s.implicits._
    words.toDF("w")
      .select(col("w"), WordPiece.segment(col("w"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
  }

  test("greedy longest-match with continuation pieces") {
    val got = seg("the", "able", "unable", "abc", "abce", "zq", "a", "thee")
    assert(got("the") == Seq("the"))
    // at pos 1 the longest plain match is "ab" (not "a"); then "##le"
    assert(got("able") == Seq("ab", "##le"))
    // "##able" (len 4) beats shorter continuations
    assert(got("unable") == Seq("un", "##able"))
    assert(got("abc") == Seq("abc"))
    assert(got("abce") == Seq("abc", "##e"))
    assert(got("a") == Seq("a"))
    assert(got("thee") == Seq("the", "##e"))
    // no match at position 1 -> whole word is [UNK]
    assert(got("zq") == Seq("[UNK]"))
  }

  test("mid-word failure and boundary guards") {
    val got = seg("abz", "ablee", "", "t")
    // "ab" matches, then no continuation for "z" -> [UNK] (whole word)
    assert(got("abz") == Seq("[UNK]"))
    // greedy is NOT optimal: ab + ##le + ##e
    assert(got("ablee") == Seq("ab", "##le", "##e"))
    // empty word -> empty piece list (the caller's pretokenizer never
    // emits one; the guard keeps the fold total)
    assert(got("") == Seq())
    // a 1-char word must not match a longer piece via substr truncation
    assert(got("t") == Seq("[UNK]"))
  }

  test("corpus encode: ordered id stream, unk accounting") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the unable zq"),
      (2L, "Abce THE")).toDF("doc_id", "text")
    val got = WordPiece.encodeCorpus(df, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ids = WordPiece.vocabIds(vocab)
    val unk = vocab.size.toLong
    def fp(xs: Seq[Long]) = xs.foldLeft(7L)((a, x) => (a * 31 + x) % 1000000007L)
    // doc 1: the | un ##able | [UNK]
    val ids1 = Seq(ids("the"), ids("un"), ids("##able"), unk)
    assert(got(1L) == ((3L, 4L, 1L, fp(ids1))))
    // doc 2 lowercases: abc ##e | the
    val ids2 = Seq(ids("abc"), ids("##e"), ids("the"))
    assert(got(2L) == ((2L, 3L, 0L, fp(ids2))))
  }

  test("production-vocab membership compiles to hash-set INSET, and a " +
    "1k-piece vocab still segments correctly") {
    val s = spark
    import s.implicits._
    // a 30k-entry production vocab needs O(1) membership per candidate
    // length. Catalyst already provides it: In(literals) rewrites to
    // InSet (a hash set) past spark.sql.optimizer.inSetConversionThreshold
    // — INCLUDING inside the aggregate-fold lambda body. A typedlit-map
    // probe would be WORSE (GetMapValue on a literal map is a linear
    // key scan), so the when-chain + isInCollection formulation IS the
    // production shape; this test pins the InSet rewrite so a Spark
    // upgrade cannot silently regress membership to a linear In.
    val bigVocab = (0 until 1000).map(i => f"w$i%04d") ++
      Seq("zq", "##zq", "##a", "a")
    // the frame must be parquet-backed: over a local Seq,
    // ConvertToLocalRelation folds the whole projection away and no
    // expression survives to inspect
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val planDf = docs.select(col("text").as("tok"))
      .withColumn("pieces", WordPiece.segment(col("tok"), bigVocab))
    val optimized = planDf.queryExecution.optimizedPlan.toString
    assert(optimized.contains("INSET"),
      s"membership did not rewrite to InSet:\n${optimized.take(800)}")
    val df = Seq("w0007", "zqzq", "nope!").toDF("tok")
      .withColumn("pieces", WordPiece.segment(col("tok"), bigVocab))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("w0007") == Seq("w0007"))
    assert(got("zqzq") == Seq("zq", "##zq"))
    assert(got("nope!") == Seq("[UNK]"))
  }
}
