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

  test("batch twin parity: dq_rate_limit_audit equals the streaming gate per (user, day)") {
    // planted DENSE fixture (the real testdata never exceeds the
    // burst budget, which would make this pin vacuous): bursts, exact
    // refills, a midnight boundary and two users — written as a temp
    // events.parquet so the batch query runs its real path
    val dayMs = 86400000L
    val rows = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Double, String)]
    var id = 0L
    def ev(user: Long, ms: Long): Unit = {
      id += 1
      rows += ((id, new java.sql.Timestamp(ms), user, "click", 1.0, "{}"))
    }
    val base = 400L * dayMs
    for (i <- 0L until 8L) ev(1L, base + i)            // burst: 5 allow, 3 deny
    ev(1L, base + 2000L); ev(1L, base + 2001L)          // +2 tok → 2 allow... minus
    for (i <- 0L until 7L) ev(2L, base + i)             // user 2 isolated
    for (i <- 0L until 6L) ev(1L, base + dayMs + i)     // next day: reset
    val dir = java.nio.file.Files.createTempDirectory("graft_rl").toString
    rows.result().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")

    val stream = run(Seq(rows.result().map(r =>
      (r._1, r._3 * 100000L + r._2.getTime / dayMs, r._2.getTime))))
    val streamByDay = stream.groupBy(_.ts_ms / dayMs)
      .map { case (d, vs) => d -> vs.count(_.allowed).toLong }
    val batch = graft.analytics.ExtendedQueries
      .queries("dq_rate_limit_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.map(b => b._2 - b._3).sum > 0L,
      "fixture produced no denials — parity test is vacuous")
    for ((day, _, allowed) <- batch) {
      assert(streamByDay(day) == allowed,
        s"day $day: stream ${streamByDay(day)} vs batch $allowed")
    }
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
