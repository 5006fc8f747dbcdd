package graft.streaming

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation rule stack on a STREAM: the Gopher counters and keep
  * decision are pure per-row projections, so the identical Column
  * expressions run unchanged on a streaming frame and must produce
  * byte-identical decisions to the batch run — the filter-at-ingest
  * shape (gate documents as they arrive off the crawl, before anything
  * is persisted). */
class StreamQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private def gate(df: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    df.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      TextAnalysis.gopherStopHits(toks).cast("long").as("n_stop"),
      TextAnalysis.gopherSymbolWords(toks).cast("long").as("n_sym"),
      TextAnalysis.gopherAlphaWords(toks).cast("long").as("n_alpha"))
  }

  test("streamed gate decisions == batch decisions on the same documents") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0 until 120).map { i =>
      val words = (0 until (i % 60) + 1).map {
        case j if j % 7 == 0 => "the"
        case j if j % 11 == 0 => "#"
        case j => s"word$j"
      }
      (i.toLong, words.mkString(" "))
    }
    val batch = gate(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val ms = MemoryStream[(Long, String)]
    val streamed = gate(ms.toDF().select(col("_1").as("doc_id"),
      col("_2").as("text")))
    val q = streamed.writeStream.outputMode("append").format("memory")
      .queryName("qgate").start()
    try {
      docs.grouped(37).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("qgate")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === batch.toSeq)
  }
}
