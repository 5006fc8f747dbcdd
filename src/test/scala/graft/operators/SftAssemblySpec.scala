package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SFT chat-template assembly: exact rendered bytes + loss-span
  * offsets on a hand-checked conversation, and the slice property —
  * substring(text, start, end) over every span must reproduce the
  * assistant content EXACTLY (the invariant a loss mask relies on),
  * including multi-byte characters (offsets are CHARACTER offsets). */
class SftAssemblySpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked conversation renders with exact span offsets") {
    val turns = Seq(
      (1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", "hello!"),
      (1L, 2L, "user", "bye"),
      (1L, 3L, "assistant", "ok")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val out = SftAssembly.renderChatML(turns).collect()
    assert(out.length == 1)
    val r = out.head
    val text = r.getAs[String]("text")
    assert(text ==
      "<|im_start|>user\nhi<|im_end|>\n" +
      "<|im_start|>assistant\nhello!<|im_end|>\n" +
      "<|im_start|>user\nbye<|im_end|>\n" +
      "<|im_start|>assistant\nok<|im_end|>\n")
    assert(r.getAs[Long]("n_turns") == 4L)
    assert(r.getAs[Long]("loss_chars") == 8L) // "hello!" + "ok"
    val spans = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("spans")
      .map(s => (s.getLong(0).toInt, s.getLong(1).toInt))
    // turn 0 renders to 30 chars, turn 1 to 39, turn 2 to 31; the
    // assistant header "<|im_start|>assistant\n" is 22 chars
    assert(spans == Seq((30 + 22, 30 + 22 + 6), (100 + 22, 100 + 22 + 2)))
    spans.foreach { case (s, e) =>
      assert(Set("hello!", "ok")(text.substring(s, e)))
    }
  }

  test("slice property holds across many conversations incl. unicode") {
    val docs = Seq(
      (0L, "héllo wörld"), (1L, "日本語のテキスト"), (2L, "plain"),
      (3L, "mixed ασδ 漢字"), (4L, "a"), (5L, ""), (6L, "tail user"),
      (7L, "final ünïcode answer")
    ).toDF("doc_id", "content")
    val turns = docs.select(
      expr("doc_id div 4").as("conv_id"),
      expr("doc_id % 4").as("turn_idx"),
      when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"),
      col("content"))
    val contents = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    SftAssembly.renderChatML(turns).collect().foreach { r =>
      val convId = r.getAs[Long]("conv_id")
      val text = r.getAs[String]("text")
      val spans = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("spans")
      // assistant turns of this conversation, in order
      val expect = (0L until 4L).map(t => convId * 4 + t)
        .filter(_ % 2 == 1).flatMap(contents.get)
      assert(spans.length == expect.length, s"conv $convId span count")
      spans.map(s => text.substring(s.getLong(0).toInt, s.getLong(1).toInt))
        .zip(expect).foreach { case (got, want) =>
          assert(got == want, s"conv $convId")
        }
    }
  }
}
