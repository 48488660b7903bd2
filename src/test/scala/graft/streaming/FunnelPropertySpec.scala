package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import FunnelProcessor.{advance, FunnelEvent, StageAdvance, StageState, Stages}

/** Property tests for the funnel transition ([[FunnelProcessor.advance]]
  * is pure — the TrailingDistinctPropertySpec pattern): over
  * seeded-random event sets and batch splits, the emitted stage
  * advances always equal the batch query's conditional-MIN chain (a
  * deliberately different algorithm: t₁ = min view sec, t₂ = min click
  * sec > t₁, t₃ = min purchase sec > t₂ — agreement pins semantics,
  * not implementation), the split placement never matters, and replays
  * of already-processed prefixes are idempotent. The Spark-harness
  * spec (FunnelStreamSpec) pins the same laws through the real
  * transformWithState operator.
  */
class FunnelPropertySpec extends AnyFunSuite {

  /** The batch twin's conditional-min chain, recursively: stage i+1
    * enters at the earliest event of that type STRICTLY after stage
    * i's entry (stage 1 unconditionally earliest). */
  private def minChain(user: Long, evs: Seq[FunnelEvent]): Seq[StageAdvance] = {
    var prev = Long.MinValue
    Stages.zipWithIndex.iterator.map { case (tp, i) =>
      val cand = evs.filter(e =>
        e.event_type == tp && (i == 0 || e.sec > prev)).map(_.sec)
      if (cand.isEmpty) None
      else { prev = cand.min; Some(StageAdvance(user, i + 1L, tp, prev)) }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  /** Feed time-ordered batches, carrying state like the state store. */
  private def runSplit(user: Long, evs: Seq[FunnelEvent],
      cuts: Seq[Int]): (Seq[StageAdvance], StageState) = {
    val sorted = evs.sortBy(e => (e.sec, e.event_id))
    val bounds = (0 +: cuts :+ sorted.size).distinct.sorted
    var st = StageState(0, Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) = advance(user, st, sorted.slice(a, b))
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  private def randomEvents(rnd: scala.util.Random, n: Int): Seq[FunnelEvent] = {
    val types = Stages :+ "other" :+ "refund"
    (1 to n).map(i => FunnelEvent(7L, i.toLong,
      types(rnd.nextInt(types.size)), 100L + rnd.nextInt(25)))
  }

  test("random corpora: advances ≡ the conditional-min chain under any split") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val evs = randomEvents(rnd, 2 + rnd.nextInt(30))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(evs.size + 1))
      val want = minChain(7L, evs)
      assert(runSplit(7L, evs, cuts)._1 == want, s"seed=$seed cuts=$cuts")
      assert(runSplit(7L, evs, Nil)._1 == want, s"seed=$seed one-batch")
    }
  }

  test("replaying any already-processed prefix advances nothing") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(500 + seed)
      val evs = randomEvents(rnd, 3 + rnd.nextInt(20))
      val sorted = evs.sortBy(e => (e.sec, e.event_id))
      val (_, st) = runSplit(7L, evs, Nil)
      val prefix = sorted.take(1 + rnd.nextInt(sorted.size))
      val (replayed, st2) = advance(7L, st, prefix)
      assert(replayed.isEmpty, s"seed=$seed replay emitted $replayed")
      assert(st2 == st, s"seed=$seed replay moved state")
    }
  }

  test("non-funnel types and out-of-order stage jumps never advance") {
    val (out, st) = advance(7L, StageState(0, Long.MinValue), Seq(
      FunnelEvent(7L, 1L, "refund", 100L),
      FunnelEvent(7L, 2L, "purchase", 101L), // stage 3 before 1-2: no
      FunnelEvent(7L, 3L, "click", 102L)))   // stage 2 before 1: no
    assert(out.isEmpty && st == StageState(0, Long.MinValue))
    // equal-sec click cannot follow the view (strictly-after rule)
    val (out2, _) = advance(7L, StageState(0, Long.MinValue), Seq(
      FunnelEvent(7L, 1L, "view", 100L),
      FunnelEvent(7L, 2L, "click", 100L)))
    assert(out2.map(_.stage) == Seq(1L))
  }
}
