package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import TrailingDistinctStream.{advance, Delta, Seg}

/** Property tests for the trailing-distinct segment transition
  * ([[TrailingDistinctStream.advance]] is pure — the
  * ChannelPropertySpec pattern): over seeded-random activity sets,
  * window widths, and batch splits, the emitted ±1 deltas always
  * prefix-sum to the brute-force sliding COUNT(DISTINCT), the split
  * placement never matters, and per-user delta algebra stays
  * conservative (every +1 has a matching −1 at W days' reach).
  * 200 random corpora × a random split each; the Spark-harness spec
  * (TrailingDistinctStreamSpec) pins the same law through the real
  * transformWithState operator.
  */
class TrailingDistinctPropertySpec extends AnyFunSuite {

  import TrailingDistinctTestAlgebra.{bruteSliding, prefixDeltas}

  private def runSplit(obs: Seq[(Long, Long)], w: Long,
      cuts: Seq[Int]): Seq[Delta] = {
    // feed day-ordered batches (the stream's ordering contract),
    // carrying each user's Seg across batches like the state store
    val sorted = obs.sortBy(_._2)
    val bounds = (0 +: cuts :+ sorted.size).distinct.sorted
    val batches = bounds.zip(bounds.tail).map { case (a, b) =>
      sorted.slice(a, b) }
    var state = Map.empty[Long, Seg]
    val out = scala.collection.mutable.ArrayBuffer.empty[Delta]
    for (b <- batches; (u, ds) <- b.groupBy(_._1)) {
      val st0 = state.getOrElse(u, Seg(Long.MinValue, 0L))
      val (emitted, st1) = advance(u, st0, ds.map(_._2).sorted, w)
      out ++= emitted
      state += u -> st1
    }
    out.toSeq
  }

  private def prefix(ds: Seq[Delta], obs: Seq[(Long, Long)]): Map[Long, Long] =
    prefixDeltas(ds.map(d => (d.day, d.delta)), obs)

  test("random corpora: deltas ≡ brute force under any batch split") {
    for (seed <- 1 to 200) {
      val rnd = new scala.util.Random(seed)
      val w = 1L + rnd.nextInt(10)
      val nUsers = 1 + rnd.nextInt(6)
      val obs = Seq.fill(3 + rnd.nextInt(40))(
        (rnd.nextInt(nUsers).toLong, 100L + rnd.nextInt(40)))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(obs.size + 1))
      val want = bruteSliding(obs, w)
      assert(prefix(runSplit(obs, w, cuts), obs) == want,
        s"seed=$seed w=$w cuts=$cuts")
      // split-invariance directly: one batch ≡ the random split
      assert(prefix(runSplit(obs, w, Nil), obs) == want, s"seed=$seed")
    }
  }

  test("delta algebra: conservative and W-bounded per user") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(1000 + seed)
      val w = 1L + rnd.nextInt(10)
      val obs = Seq.fill(2 + rnd.nextInt(30))(
        (rnd.nextInt(4).toLong, 50L + rnd.nextInt(30)))
      val ds = runSplit(obs, w, Seq(obs.size / 2))
      for ((u, dd) <- ds.groupBy(_.user_id)) {
        // net zero: every opened cover is eventually closed
        assert(dd.map(_.delta).sum == 0L, s"seed=$seed user=$u leaks")
        // the running cover count is always 0 or 1 (disjoint
        // segments); at a correction day the −1 cancels BEFORE the
        // re-emitted +1 (delta-ascending tiebreak), mirroring how the
        // pair nets out in the day aggregate
        var cover = 0L
        for (x <- dd.sortBy(d => (d.day, d.delta))) {
          cover += x.delta
          assert(cover == 0L || cover == 1L,
            s"seed=$seed user=$u overlapping segments")
        }
        assert(cover == 0L)
      }
    }
  }
}
