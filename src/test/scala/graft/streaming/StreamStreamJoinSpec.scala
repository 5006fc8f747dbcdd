package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: the streamed attribution result equals
  * the batch interval join on the same data, across micro-batch splits
  * and interleaved arrival of the two sides. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val WindowSec = 300L

  // (user, id, tsSec); impressions and clicks share users, clicks land
  // inside/outside the 300s attribution window deterministically.
  // Base offset keeps every event ABOVE Spark's initial watermark
  // (epoch 0): a row at exactly t=0 is dropped as late by the engine.
  private val Base = 10000L
  private def impressions: Seq[(Long, Long, Long)] =
    (0 until 60).map(i => ((i % 5).toLong, i.toLong, Base + i.toLong * 97))
  private def clicks: Seq[(Long, Long, Long)] =
    (0 until 40).map(i => ((i % 5).toLong, 1000L + i, Base + i.toLong * 151 + 13))

  private def batchRef: Set[(Long, Long, Long)] =
    (for {
      (u, ii, it) <- impressions
      (cu, ci, ct) <- clicks
      if cu == u && ct >= it && ct <= it + WindowSec
    } yield (u, ii, ci)).toSet

  test("streamed interval join == batch join across interleaved batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msI = MemoryStream[(Long, Long, Long)]
    val msC = MemoryStream[(Long, Long, Long)]
    val imp = msI.toDF().select(col("_1").as("user_id"), col("_2").as("imp_id"),
      expr("timestamp_seconds(_3)").as("ts"))
    val clk = msC.toDF().select(col("_1").as("user_id"), col("_2").as("click_id"),
      expr("timestamp_seconds(_3)").as("ts"))
    // watermark covers the arrival slack between the two sides'
    // interleaved chunks; parity with batch is then exact (a tighter
    // watermark legitimately DROPS matches whose partner arrives after
    // eviction — the engine's documented contract)
    val joined = StreamOps.clickAttribution(imp, clk, WindowSec, "3 hours")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin").start()
    try {
      // interleaved time-ordered arrival on both sides
      val iChunks = impressions.grouped(20).toSeq
      val cChunks = clicks.grouped(14).toSeq
      (0 until math.max(iChunks.size, cChunks.size)).foreach { i =>
        if (i < iChunks.size) msI.addData(iChunks(i))
        if (i < cChunks.size) msC.addData(cChunks(i))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("ssjoin")
      .select("user_id", "imp_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    val want = batchRef
    assert(want.nonEmpty, "fixture produced no attributed pairs")
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
