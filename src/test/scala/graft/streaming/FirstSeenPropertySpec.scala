package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import FirstSeenStream.{advance, FirstSeen, Obs}

/** Property tests for the first-seen transition
  * ([[FirstSeenStream.advance]] is pure — the
  * TrailingDistinctPropertySpec pattern): over seeded-random activity
  * and batch splits, each key emits EXACTLY ONE row ever — the min
  * (day, ts) of its first batch, insensitive to arrival order within
  * the batch — later batches absorb silently, an earlier-coordinate
  * late arrival increments n_corrections (once per violating batch),
  * and replays emit nothing. The Spark-harness spec
  * (FirstSeenStreamSpec) pins the operator wiring.
  */
class FirstSeenPropertySpec extends AnyFunSuite {

  private def runSplit(obs: Seq[Obs],
      cuts: Seq[Int]): (Seq[FirstSeen], Option[FirstSeen]) = {
    val bounds = (0 +: cuts :+ obs.size).distinct.sorted
    var st: Option[FirstSeen] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[FirstSeen]
    for ((a, b) <- bounds.zip(bounds.tail) if a < b) {
      val (emitted, st1) = advance(5L, st, obs.slice(a, b))
      out ++= emitted
      st = Some(st1)
    }
    (out.toSeq, st)
  }

  private def randomObs(rnd: scala.util.Random, n: Int): Seq[Obs] =
    (1 to n).map(_ => Obs(5L, 10L + rnd.nextInt(6), rnd.nextInt(1000).toLong))

  test("exactly one emission ever: the first batch's min coordinate, any shuffle") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val obs = randomObs(rnd, 1 + rnd.nextInt(30))
      val cuts = Seq.fill(rnd.nextInt(4))(1 + rnd.nextInt(obs.size))
      val bounds = (0 +: cuts :+ obs.size).distinct.sorted
      val firstBatch = obs.slice(bounds(0), bounds(1))
      val want = firstBatch.map(o => (o.day, o.ts)).min
      val (rows, st) = runSplit(obs, cuts)
      assert(rows.size == 1, s"seed=$seed must emit exactly once")
      assert((rows.head.first_day, rows.head.first_ts) == want, s"seed=$seed")
      // shuffling within the first batch cannot change the emission
      val shuffled = rnd.shuffle(firstBatch) ++ obs.drop(bounds(1))
      assert(runSplit(shuffled, cuts)._1.map(r =>
        (r.first_day, r.first_ts)) == Seq(want), s"seed=$seed shuffle")
      // time-ordered delivery ⇒ the emission is the GLOBAL min and no
      // corrections accrue
      val tape = obs.sortBy(o => (o.day, o.ts))
      val (oneRow, stOrdered) = runSplit(tape, cuts)
      assert((oneRow.head.first_day, oneRow.head.first_ts) ==
        obs.map(o => (o.day, o.ts)).min)
      assert(stOrdered.get.n_corrections == 0L)
      assert(st.get.n_corrections >= 0L)
    }
  }

  test("earlier-coordinate late batches count corrections; replays emit nothing") {
    val (rows1, st1) = runSplit(Seq(Obs(5L, 12L, 100L)), Nil)
    assert(rows1.size == 1)
    // a genuinely earlier day arrives late: absorbed + counted
    val (rows2, st2) = advance(5L, st1, Seq(Obs(5L, 11L, 500L)))
    assert(rows2.isEmpty && st2.n_corrections == 1L)
    assert((st2.first_day, st2.first_ts) == (12L, 100L),
      "the original emission's coordinate must stand (no retraction)")
    // replay of the original row: absorbed, NOT a correction
    val (rows3, st3) = advance(5L, Some(st2), Seq(Obs(5L, 12L, 100L)))
    assert(rows3.isEmpty && st3 == st2)
  }
}
