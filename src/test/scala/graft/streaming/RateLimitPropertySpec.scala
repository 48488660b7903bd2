package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import RateLimitStream.{advance, Bucket, Event, CapacityMilli, CostMilli, RefillMilliPerMs}

/** Property tests for the token-bucket transition
  * ([[RateLimitStream.advance]] is pure — the
  * TrailingDistinctPropertySpec pattern): over seeded-random event
  * streams and batch splits, the verdicts are split-invariant, token
  * levels stay inside [0, capacity], and admissions obey the
  * implementation-independent token-bucket LAW — in any event-time
  * window [t₁, t₂], spend ≤ capacity + refill·(t₂−t₁) — the algebraic
  * statement no transcription of the fold can fake. The Spark-harness
  * spec (RateLimitStreamSpec) pins the operator wiring.
  */
class RateLimitPropertySpec extends AnyFunSuite {

  private val Fresh = Bucket(CapacityMilli, Long.MinValue)

  private def runSplit(evs: Seq[Event],
      cuts: Seq[Int]): Seq[RateLimitStream.Verdict] = {
    val sorted = evs.sortBy(e => (e.ts_ms, e.event_id))
    val bounds = (0 +: cuts :+ sorted.size).distinct.sorted
    var st = Fresh
    val out = scala.collection.mutable.ArrayBuffer.empty[RateLimitStream.Verdict]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) = advance(9L, st, sorted.slice(a, b))
      out ++= emitted
      st = st1
    }
    out.toSeq
  }

  private def randomEvents(rnd: scala.util.Random, n: Int): Seq[Event] =
    (1 to n).map(i =>
      Event(i.toLong, 9L, 1000000L + rnd.nextInt(20000).toLong))

  test("random streams: verdicts are split-invariant") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val evs = randomEvents(rnd, 2 + rnd.nextInt(40))
      val cuts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(evs.size + 1))
      assert(runSplit(evs, cuts) == runSplit(evs, Nil),
        s"seed=$seed cuts=$cuts")
    }
  }

  test("token levels bounded; the token-bucket admission law holds on every window") {
    for (seed <- 1 to 200) {
      val rnd = new scala.util.Random(400 + seed)
      val evs = randomEvents(rnd, 2 + rnd.nextInt(40))
      val vs = runSplit(evs, Nil)
      for (v <- vs)
        assert(v.tokens_left_milli >= 0L &&
          v.tokens_left_milli <= CapacityMilli, s"seed=$seed level $v")
      val admitted = vs.filter(_.allowed).sortBy(_.ts_ms)
      for (i <- admitted.indices; j <- i until admitted.size) {
        val spend = (j - i + 1).toLong * CostMilli
        val supply = CapacityMilli +
          (admitted(j).ts_ms - admitted(i).ts_ms) * RefillMilliPerMs
        assert(spend <= supply,
          s"seed=$seed window [${admitted(i).ts_ms},${admitted(j).ts_ms}] " +
            s"admitted ${j - i + 1} — over the bucket law")
      }
    }
  }

  test("closed forms: slow producers always pass, a same-instant burst passes exactly capacity/cost") {
    val slow = (1 to 20).map(i =>
      Event(i.toLong, 9L, 1000000L + i * (CostMilli / RefillMilliPerMs)))
    assert(runSplit(slow, Nil).forall(_.allowed),
      "a producer at exactly the refill rate must never be throttled")
    val burst = (1 to 12).map(i => Event(i.toLong, 9L, 2000000L))
    val verdicts = runSplit(burst, Nil)
    assert(verdicts.count(_.allowed) == (CapacityMilli / CostMilli).toInt,
      "a same-instant burst from a fresh bucket admits exactly the burst capacity")
    // verdicts resolve in event_id order at equal timestamps
    assert(verdicts.takeWhile(_.allowed).map(_.event_id) ==
      (1L to CapacityMilli / CostMilli))
  }

  test("out-of-order events never refill backwards (elapsed clamps at 0)") {
    // drain the bucket at t, then present an EARLIER event: it must
    // see the drained level, not a rewound clock's refill
    val (_, drained) = advance(9L, Fresh,
      (1 to 5).map(i => Event(i.toLong, 9L, 3000000L)))
    assert(drained.tokens_milli == 0L)
    val (late, st2) = advance(9L, drained,
      Seq(Event(99L, 9L, 2999000L))) // 1s earlier — no refund
    assert(!late.head.allowed && late.head.tokens_left_milli == 0L)
    assert(st2.last_ms == 3000000L, "the clock high-water mark must hold")
  }
}
