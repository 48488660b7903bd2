package graft.streaming

import graft.SparkSpec
import StreamingTopK._

/** The streaming leaderboard must equal the batch top-k over the same
  * events at every version boundary, keep O(k) state, and stay silent
  * on batches that cannot change the board.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[ValueEvent]], k: Int): Seq[LeaderRow] =
    runRocksDbStream(batches)(StreamingTopK.leaderboard(_, k))

  test("latest version equals the batch top-k over everything seen") {
    val b1 = Seq(ValueEvent("ch", 1L, 5.0), ValueEvent("ch", 2L, 9.0),
      ValueEvent("ch", 3L, 7.0))
    val b2 = Seq(ValueEvent("ch", 4L, 8.0), ValueEvent("ch", 5L, 1.0))
    val rows = run(Seq(b1, b2), k = 3)
    val latestV = rows.map(_.version).max
    val latest = rows.filter(_.version == latestV).sortBy(_.rank)
      .map(r => (r.rank, r.event_id, r.value))
    // all five seen: top-3 by value desc = 9.0(2), 8.0(4), 7.0(3)
    assert(latest == Seq((1L, 2L, 9.0), (2L, 4L, 8.0), (3L, 3L, 7.0)))
    // the first batch's board was emitted too (version 1)
    val v1 = rows.filter(_.version == 1L).sortBy(_.rank).map(_.event_id)
    assert(v1 == Seq(2L, 3L, 1L))
  }

  test("a batch that cannot enter the board emits nothing") {
    val b1 = Seq(ValueEvent("ch", 1L, 9.0), ValueEvent("ch", 2L, 8.0))
    val b2 = Seq(ValueEvent("ch", 3L, 1.0)) // below the worst kept
    val rows = run(Seq(b1, b2), k = 2)
    assert(rows.map(_.version).max == 1L, "no second emission expected")
  }

  test("ties break toward the lower event id, channels are independent") {
    val rows = run(Seq(Seq(
      ValueEvent("a", 10L, 5.0), ValueEvent("a", 9L, 5.0),
      ValueEvent("b", 1L, 1.0))), k = 1)
    val a = rows.filter(_.channel == "a")
    assert(a.map(r => (r.rank, r.event_id)) == Seq((1L, 9L)))
    assert(rows.exists(_.channel == "b"))
  }

  test("a re-delivered event occupies one slot; a worse replay is ignored") {
    // at-least-once source: event 1 arrives twice on an underfull board.
    // Pre-fix it was inserted twice, displacing the genuine event 2.
    val b1 = Seq(ValueEvent("ch", 1L, 9.0), ValueEvent("ch", 1L, 9.0),
      ValueEvent("ch", 2L, 5.0))
    val rows = run(Seq(b1), k = 2)
    val latestV = rows.map(_.version).max
    val latest = rows.filter(_.version == latestV).sortBy(_.rank)
      .map(r => (r.event_id, r.value))
    assert(latest == Seq((1L, 9.0), (2L, 5.0)))
    // a replay with a WORSE value must not change the board either
    val rows2 = run(Seq(b1, Seq(ValueEvent("ch", 1L, 3.0))), k = 2)
    assert(rows2.map(_.version).max == 1L, "worse replay must emit nothing")
  }

  test("an updated value for a boarded event replaces, never duplicates") {
    val rows = run(Seq(
      Seq(ValueEvent("ch", 1L, 4.0), ValueEvent("ch", 2L, 3.0)),
      Seq(ValueEvent("ch", 1L, 8.0))), k = 2)
    val latestV = rows.map(_.version).max
    val latest = rows.filter(_.version == latestV).sortBy(_.rank)
      .map(r => (r.event_id, r.value))
    assert(latest == Seq((1L, 8.0), (2L, 3.0)))
  }

  test("NaN values never enter the board") {
    val rows = run(Seq(Seq(
      ValueEvent("ch", 1L, Double.NaN), ValueEvent("ch", 2L, 1.0))), k = 2)
    val latestV = rows.map(_.version).max
    val latest = rows.filter(_.version == latestV).map(_.event_id)
    assert(latest == Seq(2L), s"NaN must be rejected, got $latest")
  }
}
