package graft.streaming

import graft.SparkSpec
import RateLimitStream._

/** The token-bucket gate must admit exactly the capacity on a burst,
  * refill with EVENT time, isolate keys, and reach identical verdicts
  * on replayed batches (event-time refill, no wall clock).
  */
class RateLimitStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long)]]): Seq[Verdict] =
    runRocksDbStream(batches)(RateLimitStream.limit)

  test("burst of 8 at one instant: 5 admitted, 3 denied, in id order") {
    val t0 = 1000000L
    val out = run(Seq((1L to 8L).map(i => (i, 7L, t0))))
      .sortBy(_.event_id)
    assert(out.map(_.allowed) ===
      Seq(true, true, true, true, true, false, false, false))
    assert(out.last.tokens_left_milli == 0L)
  }

  test("event-time refill: 2 seconds buy 2 more admissions, capacity clamps") {
    val t0 = 1000000L
    val b1 = (1L to 6L).map(i => (i, 7L, t0))        // drain: 5 allow, 1 deny
    val b2 = Seq((7L, 7L, t0 + 2000L), (8L, 7L, t0 + 2000L),
      (9L, 7L, t0 + 2000L))                           // +2 tokens → 2 allow
    val b3 = Seq((10L, 7L, t0 + 100000L))             // long idle → clamp at 5
    val out = run(Seq(b1, b2, b3)).sortBy(_.event_id)
    assert(out.slice(5, 6).forall(!_.allowed), "6th of burst denied")
    assert(out(6).allowed && out(7).allowed && !out(8).allowed,
      "exactly the 2 refilled tokens admit")
    assert(out(9).allowed)
    assert(out(9).tokens_left_milli ==
      CapacityMilli - CostMilli, "idle refill must clamp at capacity")
  }

  test("keys are isolated; within-batch order is (ts, id) regardless of arrival") {
    val t0 = 5000L
    val out = run(Seq(Seq(
      (6L, 1L, t0 + 500L), (5L, 1L, t0), (1L, 2L, t0),
      (4L, 1L, t0), (3L, 1L, t0), (2L, 1L, t0))))
    val k1 = out.filter(_.user_id == 1L).sortBy(v => (v.ts_ms, v.event_id))
    assert(k1.map(_.allowed) === Seq(true, true, true, true, true),
      "5 events fit key 1's burst capacity")
    assert(out.find(_.user_id == 2L).get.allowed,
      "key 2's bucket is untouched by key 1's burst")
  }

  test("out-of-order event never refills backwards") {
    val t0 = 9000000L
    // drain fully at t0+10s, then a LATE event stamped t0
    val b1 = (1L to 6L).map(i => (i, 3L, t0 + 10000L))
    val b2 = Seq((7L, 3L, t0))
    val out = run(Seq(b1, b2)).sortBy(_.event_id)
    assert(!out(5).allowed)
    assert(!out(6).allowed,
      "late event must not mint tokens from a negative elapsed")
  }

  test("replay determinism: same batches, same verdicts") {
    val t0 = 42000L
    val batches = Seq(
      (1L to 7L).map(i => (i, 9L, t0 + i * 300L)),
      (8L to 12L).map(i => (i, 9L, t0 + i * 300L)))
    val a = run(batches).sortBy(_.event_id).map(v => (v.allowed, v.tokens_left_milli))
    val b = run(batches).sortBy(_.event_id).map(v => (v.allowed, v.tokens_left_milli))
    assert(a === b)
  }
}
