package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import DedupStream.{advance, Decision, DocEvent}

/** Property tests for the exact-dedup gate transition
  * ([[DedupStream.advance]] is pure — the TrailingDistinctPropertySpec
  * pattern): over seeded-random doc streams and batch splits, the
  * canonical is always the smallest doc_id of the FIRST batch carrying
  * the digest (arrival order inside the batch is irrelevant), every
  * row's decision is kept ⇔ doc == canonical, redeliveries re-derive
  * the IDENTICAL decision (idempotence), and exactly one distinct doc
  * is ever kept per digest. The Spark-harness spec (DedupStreamSpec)
  * pins the operator wiring.
  */
class DedupPropertySpec extends AnyFunSuite {

  private def runSplit(docs: Seq[Long],
      cuts: Seq[Int]): (Seq[Decision], Option[Long]) = {
    val bounds = (0 +: cuts :+ docs.size).distinct.sorted
    var canonical: Option[Long] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Decision]
    for ((a, b) <- bounds.zip(bounds.tail) if a < b) {
      val batch = docs.slice(a, b).map(DocEvent(_, "d"))
      val (emitted, c) = advance("d", canonical, batch)
      out ++= emitted
      canonical = Some(c)
    }
    (out.toSeq, canonical)
  }

  test("random streams: canonical = min doc of the FIRST batch, any split/shuffle") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val docs = Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(20).toLong)
      val cuts = Seq.fill(rnd.nextInt(4))(1 + rnd.nextInt(docs.size))
      val bounds = (0 +: cuts :+ docs.size).distinct.sorted
      val firstBatch = docs.slice(bounds(0), bounds(1))
      val want = firstBatch.min
      val (decisions, canonical) = runSplit(docs, cuts)
      assert(canonical.contains(want), s"seed=$seed")
      // shuffling WITHIN the first batch must not move the canonical
      val shuffled = rnd.shuffle(firstBatch) ++ docs.drop(bounds(1))
      assert(runSplit(shuffled, cuts)._2.contains(want), s"seed=$seed shuffle")
      assert(decisions.size == docs.size, "one decision per row")
      for (d <- decisions) {
        assert(d.canonical == want)
        assert(d.kept == (d.doc_id == want), s"seed=$seed $d")
      }
      assert(decisions.filter(_.kept).map(_.doc_id).distinct.size <= 1,
        "at most one distinct doc is ever kept per digest")
    }
  }

  test("redelivery re-derives the identical decision (idempotent gate)") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(700 + seed)
      val docs = Seq.fill(2 + rnd.nextInt(20))(rnd.nextInt(12).toLong)
      val (first, canonical) = runSplit(docs, Nil)
      val prefix = docs.take(1 + rnd.nextInt(docs.size))
      val (replayed, c2) = advance("d", canonical,
        prefix.map(DocEvent(_, "d")))
      assert(c2 == canonical.get, s"seed=$seed canonical moved")
      assert(replayed == first.take(prefix.size),
        s"seed=$seed replay decisions must be identical")
    }
  }
}
