package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered-funnel state machine: hand event streams exercising every
  * transition (arm, re-arm, strict order, window expiry, reset after
  * conversion), plus a 4-step funnel and tie-break determinism. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def run(evs: Seq[(Long, Long, Long, String)], windowSec: Long,
      steps: Seq[String] = Seq("view", "click", "purchase")) =
    Sessionize.funnel(
      evs.map { case (u, id, t, ty) => (u, id, ts(t), ty) }
        .toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowSec)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("conversions, re-arm, window expiry, strict order") {
    val evs = Seq(
      // user 1: clean conversion then a second one
      (1L, 1L, 0L, "view"), (1L, 2L, 10L, "click"), (1L, 3L, 20L, "purchase"),
      (1L, 4L, 100L, "view"), (1L, 5L, 110L, "click"), (1L, 6L, 120L, "purchase"),
      // user 2: click before view (strict order) -> no conversion
      (2L, 1L, 0L, "click"), (2L, 2L, 10L, "view"), (2L, 3L, 20L, "purchase"),
      // user 3: window expires between view and click
      (3L, 1L, 0L, "view"), (3L, 2L, 200L, "click"), (3L, 3L, 210L, "purchase"),
      // user 4: re-arm view resets t0, making the conversion fit
      (4L, 1L, 0L, "view"), (4L, 2L, 150L, "view"), (4L, 3L, 160L, "click"),
      (4L, 4L, 170L, "purchase"),
      // user 5: purchase at stage 1 (skipped click) -> no conversion
      (5L, 1L, 0L, "view"), (5L, 2L, 10L, "purchase"))
    val got = run(evs, windowSec = 60L)
    assert(got(1L) === ((6L, 2L, 0L)))
    assert(got(2L) === ((3L, 0L, 1L))) // armed by the late view, never advanced
    assert(got(3L) === ((3L, 0L, 1L)))
    assert(got(4L) === ((4L, 1L, 0L)))
    assert(got(5L) === ((2L, 0L, 1L)))
  }

  test("streaming funnel == batch funnel across micro-batch splits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(20260814L)
    val types = Seq("view", "click", "purchase", "other")
    val evs = (0 until 300).map { i =>
      ((i % 7).toLong, i.toLong, i.toLong * 40, types(rnd.nextInt(4)))
    }
    val batchRef = run(evs, windowSec = 600L)
    Seq(300, 71, 20).foreach { chunkSize =>
      val ms = MemoryStream[(Long, Long, Long, String)]
      val df = ms.toDF().select(col("_1").as("user_id"), col("_2").as("event_id"),
        expr("timestamp_seconds(_3)").as("ts"), col("_4").as("event_type"))
      val q = graft.streaming.StreamOps.streamingFunnel(df,
        Seq("view", "click", "purchase"), windowSec = 600L)
        .writeStream.outputMode("update").format("memory")
        .queryName(s"sfun_$chunkSize").start()
      try {
        // time-ordered arrival (the ingest contract)
        evs.grouped(chunkSize).foreach { c => ms.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val fin = spark.table(s"sfun_$chunkSize")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("n_events").desc)))
        .where(col("rn") === 1)
        .as[(Long, Long, Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(fin === batchRef, s"chunk $chunkSize")
    }
  }

  test("4-step funnel and same-timestamp tie-break by event_id") {
    val evs = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 1L, "b"), (1L, 3L, 1L, "c"), (1L, 4L, 2L, "d"),
      // user 2: c and b share ts but ids order them b-then-c via tie-break
      (2L, 1L, 0L, "a"), (2L, 2L, 5L, "b"), (2L, 3L, 5L, "c"), (2L, 4L, 9L, "d"))
    val got = run(evs, windowSec = 60L, steps = Seq("a", "b", "c", "d"))
    assert(got(1L) === ((4L, 1L, 0L)))
    assert(got(2L) === ((4L, 1L, 0L)))
  }
}
