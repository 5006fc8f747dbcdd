package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE corpus encode: hand-checked segmentations under an
  * ordered merge table, and the fewer-merges ⇒ more-tokens monotonicity. */
class ByteBpeEncodeSpec extends SparkSpec {

  private val merges = Seq(
    ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("e", "r"),
    ("a", "n"), ("r", "e"), ("o", "n"), ("Ġ", "a"), ("s", "t"))

  private def segOf(tok: String): String = {
    val s = spark
    import s.implicits._
    Seq(tok).toDF("tok")
      .select(trim(BpeTrainer.byteSegment(col("tok"), merges)).as("seg"))
      .head().getString(0)
  }

  test("byteSegment applies merges in order, chaining across outputs") {
    // " the": Ġ t h e -> (Ġ,t) Ġt h e -> (h,e) Ġt he -> (Ġt,he) Ġthe
    assert(segOf(" the") == "Ġthe")
    // "the" (no leading space): t h e -> (h,e) t he; (Ġt,he) can't fire
    assert(segOf("the") == "t he")
    // " stone": Ġ s t o n e -> (o,n) then (s,t), listed order
    assert(segOf(" stone") == "Ġ st on e")
  }

  private def polyRef(s: String): Long =
    s.codePoints().toArray.foldLeft(7L)((a, c) => (a * 31 + c) % 1000000007L)

  test("byteEncodeStats: hand document totals and fingerprint") {
    val s = spark
    import s.implicits._
    val got = BpeTrainer.byteEncodeStats(
      Seq((1L, "the stone")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .head()
    assert(got.getLong(0) == 1L)
    assert(got.getLong(1) == 2L) // pre-tokens: "the", " stone"
    assert(got.getLong(2) == 2L + 4L) // "t he" + "Ġ st on e"
    assert(got.getLong(3) == polyRef("t he") + polyRef("Ġ st on e"))
  }

  test("byteVocabIds follows the GPT-2 recipe: byte value, then 256+rank") {
    val ids = BpeTrainer.byteVocabIds(merges)
    assert(ids("t") == 116L && ids("e") == 101L) // ASCII bytes keep their value
    assert(ids("Ġ") == 32L)                      // visible space IS byte 0x20
    assert(ids("Ġt") == 256L && ids("he") == 257L && ids("Ġthe") == 258L)
    assert(ids("st") == 265L)                    // last merge
    assert(ids.size == 256 + merges.size)
  }

  test("round trip: ordered id stream, full decode, lossless flag") {
    val s = spark
    import s.implicits._
    val got = BpeTrainer.byteEncodeRoundTrip(
      Seq((1L, "the stone"), (2L, "a  b")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: "t he" ++ "Ġ st on e" -> ids [116, 257, 32, 265, 263, 101]
    val expIds = Seq(116L, 257L, 32L, 265L, 263L, 101L)
    val fp = expIds.foldLeft(7L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(got(1L) == ((6L, fp, 1L)))
    // doc 2: the double space is dropped by the pre-tokenizer, so the
    // decode cannot reproduce the input — the flag must say so
    assert(got(2L)._3 == 0L)
  }

  test("more merges never increase the token count") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the rain in spain stays on the plain"),
      (2L, "a stone on a throne")).toDF("doc_id", "text")
    val counts = (0 to merges.length).map { k =>
      BpeTrainer.byteEncodeStats(docs, "doc_id", "text", merges.take(k))
        .agg(sum("n_tok")).head().getLong(0)
    }
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(counts.last < counts.head) // the table actually merges something
  }
}
