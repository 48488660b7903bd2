package graft.streaming

import graft.SparkSpec
import EwmaStream._

/** The streaming EWMA must equal the batch ts_ewma_user fold under
  * in-order delivery (bit-exactly), repair intra-batch disorder, and
  * absorb replays / count genuine late arrivals without corrupting
  * the recursion.
  */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Obs]]): Seq[Feat] =
    runRocksDbStream(batches)(EwmaStream.features(_))

  private def batchFold(vs: Seq[Double]): Double =
    vs.tail.foldLeft(vs.head)((acc, v) => 0.5 * v + 0.5 * acc)

  private def finalPerKey(out: Seq[Feat]): Map[Long, Feat] =
    out.groupBy(_.user_id).map { case (k, fs) => k -> fs.maxBy(_.version) }

  test("in-order batches reproduce the batch fold bit-exactly") {
    val vals = Seq(18522.0, 10603.0, 964.0, 777.0, 123.0)
    val obs = vals.zipWithIndex.map { case (v, i) =>
      Obs(1L, 100L + i, i.toLong, v) }
    val out = run(Seq(obs.take(2), obs.slice(2, 4), obs.drop(4)))
    val f = finalPerKey(out)(1L)
    assert(f.ewma_cents === batchFold(vals))
    assert(f.n_applied === 5L && f.n_stale === 0L)
    assert(out.count(_.user_id == 1L) === 3, "one emission per advancing batch")
  }

  test("intra-batch disorder is repaired by the per-batch sort") {
    val vals = Seq(5.0, 7.0, 11.0, 13.0)
    val obs = vals.zipWithIndex.map { case (v, i) =>
      Obs(2L, 100L + i, i.toLong, v) }
    val shuffled = Seq(obs(3), obs(0), obs(2), obs(1))
    val f = finalPerKey(run(Seq(shuffled)))(2L)
    assert(f.ewma_cents === batchFold(vals))
    assert(f.n_applied === 4L && f.n_stale === 0L)
  }

  test("redelivery never emits; stale rows are counted, never folded") {
    val b1 = Seq(Obs(3L, 10L, 0L, 100.0), Obs(3L, 20L, 1L, 50.0))
    val replay = Seq(Obs(3L, 20L, 1L, 50.0))    // exact replay of the last row
    val old = Seq(Obs(3L, 10L, 0L, 100.0))      // redelivered OLDER applied row
    val late = Seq(Obs(3L, 15L, 9L, 999.0))     // genuinely late arrival
    val advance = Seq(Obs(3L, 30L, 2L, 10.0))   // frontier advances again
    val out = run(Seq(b1, replay, old, late, advance))
    val f = finalPerKey(out)(3L)
    assert(f.ewma_cents === batchFold(Seq(100.0, 50.0, 10.0)),
      "stale rows must not alter the smoothed value")
    // exact-last replay absorbed without a count; the older redelivery
    // and the late arrival are indistinguishable with O(1) state and
    // both land in n_stale — surfaced by the advancing emission
    assert(f.n_applied === 3L && f.n_stale === 2L)
    // only the two ADVANCING batches emitted; redelivery/late did not
    assert(out.count(_.user_id == 3L) === 2)
  }

  test("random in-order stream equals the batch query's fold per user") {
    val rnd = new scala.util.Random(42)
    val obs = (0 until 200).map { i =>
      Obs((i % 7).toLong, i.toLong, i.toLong,
        (rnd.nextInt(20000) + 1).toDouble) }
    // split into arbitrary in-order chunks
    val batches = obs.grouped(37).map(_.toSeq).toSeq
    val got = finalPerKey(run(batches))
    val expect = obs.groupBy(_.user_id).map { case (k, os) =>
      k -> batchFold(os.sortBy(o => (o.ts, o.event_id)).map(_.v)) }
    expect.foreach { case (k, e) =>
      assert(got(k).ewma_cents === e, s"user $k diverged from batch fold") }
  }

  test("TTL expires idle entity state; a returning entity restarts its fold") {
    // Safe direction only: after sleeping well past the TTL the state
    // must be gone, so the second observation starts a FRESH fold
    // (e = x, n_applied = 1, version back to 1) — scheduler delays can
    // only lengthen the sleep, never resurrect state, so no flake.
    val out = runTtlFileStream(
      Seq(Seq(Obs(9L, 100L, 1L, 10.0)), Seq(Obs(9L, 200L, 2L, 20.0))),
      sleepBetweenMs = 3000)(
      EwmaStream.features(_, Some(java.time.Duration.ofMillis(500))))
    val second = out.find(_.last_ts == 200L).get
    assert(second.ewma_cents === 20.0)
    assert(second.n_applied === 1L && second.version === 1L)
  }

  test("long TTL retains the fold across immediate batches") {
    val out = runTtlFileStream(
      Seq(Seq(Obs(9L, 100L, 1L, 10.0)), Seq(Obs(9L, 200L, 2L, 20.0))),
      sleepBetweenMs = 0)(
      EwmaStream.features(_, Some(java.time.Duration.ofHours(1))))
    val second = out.find(_.last_ts == 200L).get
    assert(second.ewma_cents === 15.0) // 0.5*20 + 0.5*10: state survived
    assert(second.n_applied === 2L && second.version === 2L)
  }
}
