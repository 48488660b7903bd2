package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import LshStream.{advance, BandEvent, BandHit, BucketState, MaxBucket}

/** Property tests for the LSH bucket-gate transition
  * ([[LshStream.advance]] is pure — the TrailingDistinctPropertySpec
  * pattern): over seeded-random bucket traffic and batch splits, the
  * canonical is the smallest doc of the first batch, every hit names
  * it, no doc is ever emitted twice (replays absorb), distinct
  * occupancy never exceeds MaxBucket and the bucket stops emitting —
  * prospectively, never retroactively — at the cap. The Spark-harness
  * spec (LshStreamSpec) pins the operator wiring.
  */
class LshPropertySpec extends AnyFunSuite {

  private val Empty = BucketState(-1L, Seq.empty)

  private def runSplit(docs: Seq[Long],
      cuts: Seq[Int]): (Seq[BandHit], BucketState) = {
    val bounds = (0 +: cuts :+ docs.size).distinct.sorted
    var st = Empty
    val out = scala.collection.mutable.ArrayBuffer.empty[BandHit]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      // handler contract: rows sorted by doc_id within the batch
      val batch = docs.slice(a, b).sorted.map(BandEvent(_, 0, 77L))
      val (emitted, st1) = advance(st, batch)
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  test("random buckets: canonical stable, no double emission, cap prospective") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val docs = Seq.fill(1 + rnd.nextInt(200))(rnd.nextInt(120).toLong)
      val cuts = Seq.fill(rnd.nextInt(5))(1 + rnd.nextInt(docs.size))
      val bounds = (0 +: cuts :+ docs.size).distinct.sorted
      val want = docs.slice(bounds(0), bounds(1)).min
      val (hits, st) = runSplit(docs, cuts)
      assert(st.canonical == want, s"seed=$seed")
      assert(hits.forall(_.candidate_of == want))
      val emittedDocs = hits.map(_.doc_id)
      assert(emittedDocs.distinct.size == emittedDocs.size,
        s"seed=$seed a doc must never be emitted twice")
      assert(!emittedDocs.contains(want), "the canonical is never a hit")
      // distinct occupancy (canonical + members) never exceeds the cap
      assert(st.members.size + 1 <= MaxBucket)
      assert(emittedDocs.toSet == st.members.toSet,
        "every member was emitted exactly when it joined")
      // past the cap the bucket is silent but the state stands
      if (docs.distinct.size > MaxBucket) {
        assert(st.members.size + 1 == MaxBucket,
          s"seed=$seed hot bucket must saturate at MaxBucket")
        val (more, st2) = advance(st, Seq(BandEvent(999999L, 0, 77L)))
        assert(more.isEmpty && st2 == st, "saturated bucket stays silent")
      }
    }
  }

  test("replaying any prefix absorbs: no emissions, state unchanged") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(900 + seed)
      val docs = Seq.fill(2 + rnd.nextInt(60))(rnd.nextInt(40).toLong)
      val (_, st) = runSplit(docs, Nil)
      val prefix = docs.take(1 + rnd.nextInt(docs.size))
        .sorted.map(BandEvent(_, 0, 77L))
      val (emitted, st2) = advance(st, prefix)
      assert(emitted.isEmpty, s"seed=$seed replay emitted")
      assert(st2 == st, s"seed=$seed replay moved the bucket")
    }
  }
}
