package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import KmvStream.{advance, HashEvent, Sketch}

/** Property tests for the KMV sketch transition ([[KmvStream.advance]]
  * is pure — the TrailingDistinctPropertySpec pattern): over
  * seeded-random hash streams and batch splits, the sketch always
  * equals the k smallest distinct MASKED hashes seen (the pure
  * k-minima algebra — a different formulation than the incremental
  * ordered insert), the split placement never matters, replays are
  * idempotent on the sketch, and every emitted summary row obeys the
  * batch twin's estimator formula. The Spark-harness spec
  * (KmvStreamSpec) pins the same laws through transformWithState.
  */
class KmvStreamPropertySpec extends AnyFunSuite {

  private val Empty = Sketch(0L, 0L, Seq.empty)

  private def runSplit(hs: Seq[Long], k: Int,
      cuts: Seq[Int]): (Seq[KmvStream.SketchRow], Sketch) = {
    val bounds = (0 +: cuts :+ hs.size).distinct.sorted
    var st = Empty
    val out = scala.collection.mutable.ArrayBuffer.empty[KmvStream.SketchRow]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) =
        advance("ch", st, hs.slice(a, b).map(HashEvent("ch", _)), k)
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  /** The pure k-minima reference. */
  private def brute(hs: Seq[Long], k: Int): Seq[Long] =
    hs.map(_ & Long.MaxValue).distinct.sorted.take(k)

  test("random streams: sketch ≡ k smallest distinct masked hashes, any split") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(8)
      // negatives exercise the masking; a small value range forces dups
      val hs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() % 64L)
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(hs.size + 1))
      val want = brute(hs, k)
      val (_, split) = runSplit(hs, k, cuts)
      val (_, one) = runSplit(hs, k, Nil)
      assert(split.hashes == want, s"seed=$seed k=$k cuts=$cuts")
      assert(one.hashes == want, s"seed=$seed k=$k one-batch")
      assert(split.n_distinct_est_input == hs.size.toLong,
        "input counter must count every row, duplicates included")
    }
  }

  test("replaying any prefix never changes the sketch and emits nothing") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(700 + seed)
      val k = 1 + rnd.nextInt(6)
      val hs = Seq.fill(2 + rnd.nextInt(30))(rnd.nextLong() % 128L)
      val (_, st) = runSplit(hs, k, Nil)
      val prefix = hs.take(1 + rnd.nextInt(hs.size))
      val (emitted, st2) =
        advance("ch", st, prefix.map(HashEvent("ch", _)), k)
      assert(emitted.isEmpty, s"seed=$seed replay emitted")
      assert(st2.hashes == st.hashes && st2.version == st.version,
        s"seed=$seed replay moved the sketch")
      // the replay IS visible on the input counter (documented)
      assert(st2.n_distinct_est_input ==
        st.n_distinct_est_input + prefix.size)
    }
  }

  test("emissions: version monotone, summary rows reconstruct the sketch") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(1400 + seed)
      val k = 1 + rnd.nextInt(6)
      val hs = Seq.fill(2 + rnd.nextInt(40))(rnd.nextLong() % 256L)
      val cuts = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(hs.size + 1))
      val (rows, st) = runSplit(hs, k, cuts)
      assert(rows.map(_.version) == rows.map(_.version).sorted &&
        rows.map(_.version).distinct.size == rows.size,
        s"seed=$seed versions must strictly increase")
      for (r <- rows) {
        if (r.n_in_sketch >= k) {
          assert(r.kth_min >= 0L)
          if (r.kth_min == 0L)
            // a kth-minimum of literal 0 only happens at k = 1 with
            // hash 0 — the degenerate the batch twin NULLs; doubles
            // have no NULL, so the stream's honest spelling is NaN
            assert(r.estimate.isNaN, s"seed=$seed kth=0 must be NaN")
          else assert(r.estimate ==
            (k - 1).toDouble * 9223372036854775808.0 / r.kth_min.toDouble,
            s"seed=$seed estimator formula")
        } else {
          assert(r.kth_min == -1L &&
            r.estimate == r.n_in_sketch.toDouble,
            s"seed=$seed below-k sketches are exact")
        }
      }
      // the last emission (if any) is the final sketch's summary
      for (last <- rows.lastOption) {
        assert(last.version == st.version)
        assert(last.n_in_sketch == st.hashes.size.toLong)
      }
    }
  }
}
