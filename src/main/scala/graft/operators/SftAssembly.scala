package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT sample assembly: render conversation turns into ONE templated
  * training sample per conversation plus the assistant-content span
  * offsets a loss mask needs. The ChatML-style template is the
  * de-facto instruction-data shape:
  *
  *   <|im_start|>{role}\n{content}<|im_end|>\n   per turn, concatenated
  *
  * Loss spans cover assistant CONTENT only (not the role header or the
  * end marker) as [start, end) character offsets into the rendered
  * sample — the piece SFT computes loss on.
  *
  * Scale shape: one window cumsum + one groupBy, both keyed on
  * conv_id — a single shuffle over (conv_id)-sized rows; the rendered
  * text is assembled once in the aggregation, never re-shuffled. Every
  * expression is a codegen'd builtin (no UDFs).
  */
object SftAssembly {

  private val StartTok = "<|im_start|>"
  private val EndTok = "<|im_end|>"

  /** `turns`: (conv_id, turn_idx, role, content). Returns one row per
    * conversation: (conv_id, n_turns, text, spans, loss_chars) where
    * `spans` is an array of (start, end) structs over assistant
    * content and `loss_chars` their total width. */
  def renderChatML(turns: DataFrame): DataFrame = {
    val rendered = turns.select(
      col("conv_id"), col("turn_idx"), col("role"), col("content"),
      concat(lit(StartTok), col("role"), lit("\n"), col("content"),
        lit(EndTok), lit("\n")).as("rendered"),
      (lit(StartTok.length) + length(col("role")) + lit(1)).as("hlen"),
      length(col("content")).as("clen"))
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = rendered.withColumn("off",
      coalesce(sum(length(col("rendered"))).over(w), lit(0)))
    withOff
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        concat_ws("", array_sort(collect_list(struct(col("turn_idx"),
          col("rendered").as("r")))).getField("r")).as("text"),
        array_sort(collect_list(when(col("role") === "assistant",
          struct(col("turn_idx"),
            (col("off") + col("hlen")).as("start"),
            (col("off") + col("hlen") + col("clen")).as("end")))))
          .as("spans0"),
        sum(when(col("role") === "assistant", col("clen")).otherwise(0L))
          .as("loss_chars"))
      .withColumn("spans", expr("transform(spans0, s -> struct(s.start, s.end))"))
      .drop("spans0")
  }
}
