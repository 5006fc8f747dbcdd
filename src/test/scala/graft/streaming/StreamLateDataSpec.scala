package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Adversarial arrival-order tests for the streaming operators (r8
  * verdict order #5): the oracle queries replay ordered data, so these
  * specs shuffle arrival WITHIN the watermark bound across many seeds
  * and assert batch-equivalence, then pin the drop semantics for rows
  * arriving BEYOND the watermark at the exact boundary.
  *
  * Disorder model: events sorted by time are shuffled within
  * `disorder`-second buckets and fed in chunks, so any row's lateness
  * relative to the already-seen max stays under `disorder` < the
  * watermark delay — the contract under which Structured Streaming
  * guarantees no drops and therefore exact batch equivalence. */
class StreamLateDataSpec extends SparkSpec {

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Bounded-disorder arrival order: shuffle within `disorder`-second
    * buckets (bucket order preserved). */
  private def boundedShuffle[T](rnd: scala.util.Random, evts: Seq[T],
      tsSec: T => Long, disorder: Long): Seq[T] =
    evts.groupBy(e => tsSec(e) / disorder).toSeq.sortBy(_._1)
      .flatMap { case (_, g) => rnd.shuffle(g) }

  /** In-memory gap sessionizer (the batch dual, independent code).
    * Boundary pinned BY THIS SPEC (seed 8 exposed it): Spark's
    * `session_window` MERGES an event exactly `gap` after the previous
    * one — the per-event window is [t, t+gap] for merging purposes, so
    * only a delta STRICTLY greater than the gap splits. (The production
    * event tables carry microsecond-real timestamps where exact-gap
    * deltas don't occur, which is why q41/q98's >=-split oracles agree
    * there.) */
  private def batchSessions(evts: Seq[(Long, Long)], gap: Long): Set[(Long, Long, Long, Long)] =
    evts.groupBy(_._1).flatMap { case (k, rows) =>
      val tss = rows.map(_._2).sorted
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      var start = tss.head; var last = tss.head; var n = 0L
      tss.foreach { t =>
        if (t - last > gap) { out += ((k, n, start, last)); start = t; n = 0L }
        n += 1; last = t
      }
      out += ((k, n, start, last))
      out.result()
    }.toSet

  test("session windows: shuffled arrival within the watermark bound is batch-equivalent (20 seeds)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 300L; val delaySec = 600L; val disorder = 240L
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val evts = Seq.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
        .sortBy(_._2)
      val arrival = boundedShuffle[(Long, Long)](rnd, evts, _._2, disorder)
      val maxTs = evts.map(_._2).max
      val sentinel = (999L, maxTs + gap + delaySec + 100L)

      val ms = MemoryStream[(Long, Long)]
      val df = ms.toDF().select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"))
      val sess = StreamOps.sessionWindows(df, "user_id", "ts",
        gap = s"$gap seconds", watermark = s"$delaySec seconds")
      val sink = s"latedata_sess_$seed"
      val q = sess.writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try {
        arrival.grouped(12).foreach { chunk =>
          ms.addData(chunk); q.processAllAvailable()
        }
        ms.addData(Seq(sentinel)); q.processAllAvailable()
      } finally q.stop()

      val got = spark.table(sink).where(col("user_id") =!= 999L)
        .select(col("user_id"), col("n_events"),
          unix_timestamp(col("t_start")), unix_timestamp(col("t_end")))
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = batchSessions(evts, gap)
      assert(got == want,
        s"seed $seed diverged:\n got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    }
  }

  test("session windows: a row below the watermark drops, boundary-exclusive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // delay 600, gap 300. Batch 1 max ts = 5000 -> batch-2 watermark 4400.
    val ms = MemoryStream[(Long, Long)]
    val df = ms.toDF().select(col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("ts"))
    val sess = StreamOps.sessionWindows(df, "user_id", "ts",
      gap = "300 seconds", watermark = "600 seconds")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("latedata_sess_drop").start()
    try {
      ms.addData(Seq((1L, 1000L), (1L, 5000L))); q.processAllAvailable()
      // now watermark = 4400:
      //  (1, 1100): candidate window [1100, 1400) ends below 4400 -> DROP
      //             (would have extended the t=1000 session to n=2)
      //  (1, 4100): candidate window end 4400 == watermark -> DROP
      //             (the boundary is exclusive: end must exceed the mark)
      //  (1, 4500): window end 4800 > 4400 -> KEPT, its own session
      ms.addData(Seq((1L, 1100L), (1L, 4100L), (1L, 4500L))); q.processAllAvailable()
      ms.addData(Seq((999L, 20000L))); q.processAllAvailable() // flush
    } finally q.stop()
    val got = spark.table("latedata_sess_drop").where(col("user_id") =!= 999L)
      .select(col("n_events"), unix_timestamp(col("t_start")), unix_timestamp(col("t_end")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1000L, 1000L), (1L, 4500L, 4500L), (1L, 5000L, 5000L)),
      s"late-drop semantics changed: $got")
  }

  test("session windows: events exactly one gap apart MERGE (strict-split boundary)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val df = ms.toDF().select(col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("ts"))
    val sess = StreamOps.sessionWindows(df, "user_id", "ts",
      gap = "300 seconds", watermark = "0 seconds")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("latedata_sess_gap").start()
    try {
      // 1000, 1300 (= +gap: merges), 1601 (= +gap+1: splits)
      ms.addData(Seq((1L, 1000L), (1L, 1300L), (1L, 1601L)))
      q.processAllAvailable()
      ms.addData(Seq((999L, 20000L))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("latedata_sess_gap").where(col("user_id") =!= 999L)
      .select(col("n_events"), unix_timestamp(col("t_start")), unix_timestamp(col("t_end")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1000L, 1300L), (1L, 1601L, 1601L)),
      s"session gap boundary semantics changed: $got")
  }

  test("windowed counts: a closed window rejects late rows; an open one admits them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().select(col("_1").as("event_type"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("value"))
    val counts = StreamOps.windowedCounts(df, "1 hour", "600 seconds")
    val q = counts.writeStream.outputMode("append").format("memory")
      .queryName("latedata_counts").start()
    try {
      // hour-0 events + an hour-3 event (ts 11800 -> watermark 11200)
      ms.addData(Seq(("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 11800L, 3.0)))
      q.processAllAvailable()
      // hour-0 window [0, 3600) closed (3600 < 11200): late row DROPPED;
      // hour-3 window [10800, 14400) still open: disordered row ADMITTED
      ms.addData(Seq(("a", 300L, 4.0), ("a", 10900L, 5.0)))
      q.processAllAvailable()
      ms.addData(Seq(("z", 40000L, 0.0))); q.processAllAvailable() // flush
    } finally q.stop()
    val got = spark.table("latedata_counts").where(col("event_type") === "a")
      .select(unix_timestamp(col("window.start")), col("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L), (10800L, 2L)),
      s"tumbling-window late semantics changed: $got")
  }

  test("streaming as-of: shuffled arrival on both streams is batch-equivalent (8 seeds)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val halfSec = 120L; val delaySec = 600L; val disorder = 240L
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val probes = Seq.fill(25)((rnd.nextInt(50).toLong, rnd.nextInt(4000).toLong))
        .distinct.sortBy(_._2)
      val builds = Seq.fill(35)(rnd.nextInt(4000).toLong).sorted
      val maxAll = (probes.map(_._2) ++ builds).max
      val pArr = boundedShuffle[(Long, Long)](rnd, probes, _._2, disorder)
      val bArr = boundedShuffle[Long](rnd, builds, identity, disorder)

      val pms = MemoryStream[(Long, Long)]
      val bms = MemoryStream[Long]
      val probe = pms.toDF().select(col("_1").as("probe_key"),
        timestamp_seconds(col("_2")).as("pts"))
      val build = bms.toDF().select(timestamp_seconds(col("value")).as("bts"))
      val joined = StreamAsOf.nearestWithin(probe, build, "probe_key", "pts", "bts",
        halfWindowUs = halfSec * 1000000L, watermark = s"$delaySec seconds")
      val sink = s"latedata_asof_$seed"
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try {
        val pChunks = pArr.grouped(7).toSeq
        val bChunks = bArr.grouped(9).toSeq
        (0 until math.max(pChunks.size, bChunks.size)).foreach { i =>
          if (i < pChunks.size) pms.addData(pChunks(i))
          if (i < bChunks.size) bms.addData(bChunks(i))
          q.processAllAvailable()
        }
        // advance BOTH watermarks past every probe + window + delay
        pms.addData(Seq((-1L, maxAll + 10000L)))
        bms.addData(Seq(maxAll + 10000L))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table(sink).where(col("probe_key") >= 0)
        .select(col("probe_key"), unix_timestamp(col("pts")),
          unix_timestamp(col("matched_ts")), col("dt_us"))
        .as[(Long, Long, Long, Long)].collect().toSet
      // independent batch oracle: nearest build within the half window,
      // ties -> earlier build ts (min_by struct(dt, bts) order)
      val want = probes.distinct.flatMap { case (k, pt) =>
        val in = builds.filter(b => math.abs(b - pt) <= halfSec)
        if (in.isEmpty) None
        else {
          val best = in.minBy(b => (math.abs(b - pt), b))
          Some((k, pt, best, math.abs(best - pt) * 1000000L))
        }
      }.toSet
      assert(got == want,
        s"seed $seed diverged:\n got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    }
  }
}
