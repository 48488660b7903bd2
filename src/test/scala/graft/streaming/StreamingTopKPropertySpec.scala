package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import StreamingTopK.{advance, Board, Entry, ValueEvent}

/** Property tests for the leaderboard transition
  * ([[StreamingTopK.advance]] is pure — the
  * TrailingDistinctPropertySpec pattern): over seeded-random event
  * streams (duplicate event_ids, ties, NaNs) and batch splits, the
  * board always equals the top-k of PER-ID MAXIMA under the
  * (value desc, event_id asc) total order — the set-algebra
  * formulation, deliberately different from the incremental ordered
  * insert — the split placement never matters, replays are idempotent,
  * and emissions re-version strictly and reconstruct the board. The
  * Spark-harness spec (StreamingTopKSpec) pins the operator wiring.
  */
class StreamingTopKPropertySpec extends AnyFunSuite {

  private def beats(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Set-algebra reference: best value per event_id (NaN discarded),
    * then the k first under the total order. */
  private def brute(evs: Seq[ValueEvent], k: Int): Seq[Entry] =
    evs.filterNot(_.value.isNaN)
      .groupBy(_.event_id)
      .map { case (id, g) => (id, g.map(_.value).max) }
      .toSeq.sortWith(beats).take(k)
      .map { case (id, v) => Entry(id, v) }

  private def runSplit(evs: Seq[ValueEvent], k: Int,
      cuts: Seq[Int]): (Seq[StreamingTopK.LeaderRow], Board) = {
    val bounds = (0 +: cuts :+ evs.size).distinct.sorted
    var st = Board(0L, Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[StreamingTopK.LeaderRow]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) = advance("ch", st, evs.slice(a, b), k)
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  private def randomEvents(rnd: scala.util.Random, n: Int): Seq[ValueEvent] =
    (1 to n).map { _ =>
      val v = rnd.nextInt(12) match {
        case 0 => Double.NaN            // poison candidates
        case x => (x % 6).toDouble      // heavy ties
      }
      ValueEvent("ch", rnd.nextInt(8).toLong, v) // heavy id collisions
    }

  test("random streams: board ≡ top-k of per-id maxima under any split") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(5)
      val evs = randomEvents(rnd, 1 + rnd.nextInt(40))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(evs.size + 1))
      val want = brute(evs, k)
      assert(runSplit(evs, k, cuts)._2.entries == want,
        s"seed=$seed k=$k cuts=$cuts")
      assert(runSplit(evs, k, Nil)._2.entries == want, s"seed=$seed one-batch")
    }
  }

  test("replaying any prefix changes nothing and emits nothing") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(900 + seed)
      val k = 1 + rnd.nextInt(5)
      val evs = randomEvents(rnd, 2 + rnd.nextInt(30))
      val (_, st) = runSplit(evs, k, Nil)
      val prefix = evs.take(1 + rnd.nextInt(evs.size))
      val (emitted, st2) = advance("ch", st, prefix, k)
      assert(emitted.isEmpty, s"seed=$seed replay emitted")
      assert(st2 == st, s"seed=$seed replay moved the board")
    }
  }

  test("emissions: strict versioning, each emission reconstructs its board, no NaN ever ranks") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(1800 + seed)
      val k = 1 + rnd.nextInt(5)
      val evs = randomEvents(rnd, 2 + rnd.nextInt(40))
      val cuts = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(evs.size + 1))
      val (rows, st) = runSplit(evs, k, cuts)
      assert(rows.forall(!_.value.isNaN), s"seed=$seed NaN ranked")
      val byVersion = rows.groupBy(_.version)
      assert(byVersion.keySet.toSeq.sorted ==
        (1L to byVersion.size.toLong), s"seed=$seed version gaps")
      for ((_, g) <- byVersion) {
        assert(g.map(_.rank).sorted == (1L to g.size.toLong))
        // within a version, rank order IS the total order
        val ordered = g.sortBy(_.rank).map(r => (r.event_id, r.value))
        assert(ordered.zip(ordered.tail).forall { case (a, b) => beats(a, b) })
      }
      // the last version's rows are exactly the final board
      if (st.version > 0L) {
        val last = byVersion(st.version).sortBy(_.rank)
          .map(r => Entry(r.event_id, r.value))
        assert(last == st.entries, s"seed=$seed final emission != board")
      }
    }
  }
}
