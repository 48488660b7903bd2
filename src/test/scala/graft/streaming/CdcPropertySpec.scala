package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import CdcStream.{advance, Change, Snapshot}

/** Property tests for the CDC keep-last transition ([[CdcStream.advance]]
  * is pure — the TrailingDistinctPropertySpec pattern): over
  * seeded-random change streams (ties, duplicates, out-of-order) and
  * batch splits, the final snapshot always equals the argmax under the
  * (ts, event_id) total order — insensitive to arrival order BY
  * CONSTRUCTION, so the splits here are arbitrary, not time-ordered —
  * replays are idempotent, and emissions version strictly and equal
  * the state they record. The Spark-harness spec (CdcStreamSpec) pins
  * the operator wiring.
  */
class CdcPropertySpec extends AnyFunSuite {

  private def runSplit(cs: Seq[Change],
      cuts: Seq[Int]): (Seq[Snapshot], Option[Snapshot]) = {
    val bounds = (0 +: cuts :+ cs.size).distinct.sorted
    var st: Option[Snapshot] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) = advance(3L, st, cs.slice(a, b))
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  /** ts collide freely; event_id is unique (as in reality — duplicate
    * COORDINATES with different payloads would make argmax ill-defined
    * in any engine). Exact redeliveries are modeled by the replay
    * test, which re-feeds identical rows. */
  private def randomChanges(rnd: scala.util.Random, n: Int): Seq[Change] =
    rnd.shuffle((1 to n).map(i => Change(3L, 100L + rnd.nextInt(20),
      i.toLong, s"t${rnd.nextInt(3)}", rnd.nextInt(100) / 4.0)))

  test("random streams: final snapshot ≡ argmax(ts, event_id), ANY split or shuffle") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val cs = randomChanges(rnd, 1 + rnd.nextInt(40))
      val cuts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(cs.size + 1))
      val want = cs.maxBy(c => (c.ts, c.event_id))
      val (_, st) = runSplit(rnd.shuffle(cs), cuts)
      assert(st.isDefined)
      val s = st.get
      assert((s.last_ts, s.last_event) == (want.ts, want.event_id),
        s"seed=$seed")
      assert(s.last_type == want.event_type && s.last_value == want.value)
    }
  }

  test("replaying any prefix emits nothing and never moves the state") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(600 + seed)
      val cs = randomChanges(rnd, 2 + rnd.nextInt(30))
      val (_, st) = runSplit(cs, Nil)
      val prefix = cs.take(1 + rnd.nextInt(cs.size))
      val (emitted, st2) = advance(3L, st, prefix)
      assert(emitted.isEmpty && st2 == st, s"seed=$seed")
    }
  }

  test("emissions: strict versioning, each emission IS the state it recorded") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(1200 + seed)
      val cs = randomChanges(rnd, 2 + rnd.nextInt(40))
      val cuts = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(cs.size + 1))
      val (rows, st) = runSplit(cs, cuts)
      assert(rows.map(_.version) == (1L to rows.size.toLong),
        s"seed=$seed versions must be 1..k")
      // each emission strictly advances the total order
      for (Seq(a, b) <- rows.sliding(2) if rows.size >= 2)
        assert(b.last_ts > a.last_ts ||
          (b.last_ts == a.last_ts && b.last_event > a.last_event))
      assert(rows.lastOption.forall(r => st.contains(r)),
        s"seed=$seed last emission must equal the final state")
    }
  }
}
