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
