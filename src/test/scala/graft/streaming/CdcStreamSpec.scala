package graft.streaming

import graft.SparkSpec
import CdcStream._

/** The streaming latest-state view must equal the batch
  * cdc_latest_state window rank over everything seen, at every version
  * boundary, under out-of-order and replayed delivery.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Change]]): Seq[Snapshot] =
    runRocksDbStream(batches)(CdcStream.latestState(_))

  private def latestPerKey(out: Seq[Snapshot]): Map[Long, (Long, Long, String, Double)] =
    out.groupBy(_.user_id).map { case (k, ss) =>
      val b = ss.maxBy(_.version)
      k -> (b.last_ts, b.last_event, b.last_type, b.last_value)
    }

  test("latest version equals the batch keep-last over everything seen") {
    val out = run(Seq(
      Seq(Change(1L, 10L, 100L, "click", 1.0),
        Change(1L, 20L, 101L, "view", 2.0),
        Change(2L, 5L, 102L, "buy", 9.0)),
      Seq(Change(1L, 15L, 103L, "scroll", 3.0), // older than current: absorbed
        Change(2L, 6L, 104L, "refund", 4.0))))
    assert(latestPerKey(out) == Map(
      1L -> (20L, 101L, "view", 2.0),
      2L -> (6L, 104L, "refund", 4.0)))
    // key 1's second batch carried nothing newer → no new version
    assert(out.count(_.user_id == 1L) == 1)
  }

  test("ties on ts resolve by event_id, replay is silent") {
    val b1 = Seq(Change(7L, 10L, 100L, "a", 1.0))
    val b2 = Seq(Change(7L, 10L, 101L, "b", 2.0)) // same ts, higher event
    val b3 = Seq(Change(7L, 10L, 101L, "b", 2.0)) // exact replay
    val out = run(Seq(b1, b2, b3))
    assert(latestPerKey(out)(7L) == (10L, 101L, "b", 2.0))
    assert(out.count(_.user_id == 7L) == 2, "replay must not emit or bump")
  }

  test("streaming result equals the batch window twin on a random stream") {
    val rnd = new scala.util.Random(7)
    val changes = (0 until 200).map { i =>
      Change(rnd.nextInt(10).toLong, rnd.nextInt(40).toLong, i.toLong,
        s"t${rnd.nextInt(4)}", rnd.nextInt(100).toDouble)
    }
    val out = run(changes.grouped(50).toSeq)
    val want = changes.groupBy(_.user_id).map { case (k, cs) =>
      val b = cs.maxBy(c => (c.ts, c.event_id))
      k -> (b.ts, b.event_id, b.event_type, b.value)
    }
    assert(latestPerKey(out) == want)
  }

  test("TTL expires idle entity state; a reappearing entity restarts at version 1") {
    // Safe direction only (see EwmaStreamSpec): expiry cannot be
    // resurrected by scheduler delay, so asserting the restart is
    // flake-free. Downstream max(version) reconstruction still picks
    // the newer row because it is the only row for the key post-expiry.
    val out = runTtlFileStream(
      Seq(Seq(Change(5L, 100L, 1L, "a", 1.0)),
        Seq(Change(5L, 200L, 2L, "b", 2.0))),
      sleepBetweenMs = 3000)(
      CdcStream.latestState(_, Some(java.time.Duration.ofMillis(500))))
    val second = out.find(_.last_ts == 200L).get
    assert(second.version === 1L, "state should have expired between batches")
  }

  test("long TTL retains latest-state across immediate batches") {
    val out = runTtlFileStream(
      Seq(Seq(Change(5L, 100L, 1L, "a", 1.0)),
        Seq(Change(5L, 200L, 2L, "b", 2.0))),
      sleepBetweenMs = 0)(
      CdcStream.latestState(_, Some(java.time.Duration.ofHours(1))))
    val second = out.find(_.last_ts == 200L).get
    assert(second.version === 2L, "state should have survived")
  }
}
