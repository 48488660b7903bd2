package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import PatternProcessor.{advance, Empty, PatternEvent, PatternMatch}

/** Property tests for the CEP transition ([[PatternProcessor.advance]]
  * is pure — the TrailingDistinctPropertySpec pattern): over
  * seeded-random event tapes and batch splits, the emitted matches are
  * exactly java.util.regex's non-overlapping `v[^p]*p` matches over
  * the time-sorted tape (span coordinates included), the split
  * placement never matters, replays of already-processed prefixes
  * emit nothing (the frontier gate — an at-least-once redelivery must
  * not re-arm the machine), and the MaxSeqEvents budget truncates the
  * stream exactly like the batch query. The Spark-harness spec
  * (PatternProcessorSpec) pins the operator wiring on real data.
  */
class PatternPropertySpec extends AnyFunSuite {

  private val Types = Vector("view", "click", "purchase", "error")

  private def runSplit(evs: Seq[PatternEvent],
      cuts: Seq[Int]): Seq[PatternMatch] = {
    val tape = evs.sortBy(e => (e.sec, e.event_id))
    val bounds = (0 +: cuts :+ tape.size).distinct.sorted
    var st = Empty
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val (emitted, st1) = advance(8L, st, tape.slice(a, b))
      out ++= emitted
      st = st1
    }
    out.toSeq
  }

  /** the batch twin: regex over the (capped) time-sorted type string. */
  private def brute(evs: Seq[PatternEvent]): Seq[(Long, Long)] = {
    val tape = evs.sortBy(e => (e.sec, e.event_id))
      .take(graft.analytics.BehaviorQueries.MaxSeqEvents)
    val str = tape.map(e => e.event_type match {
      case "view" => 'v'; case "purchase" => 'p'; case _ => 'x'
    }).mkString
    val m = java.util.regex.Pattern.compile("v[^p]*p").matcher(str)
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (m.find())
      spans += ((tape(m.start).sec, tape(m.end - 1).sec))
    spans.toSeq
  }

  private def randomEvents(rnd: scala.util.Random, n: Int): Seq[PatternEvent] =
    (1 to n).map(i => PatternEvent(8L, i.toLong,
      Types(rnd.nextInt(Types.size)), 200L + rnd.nextInt(40)))

  test("random tapes: matches ≡ java.util.regex v[^p]*p, spans included, any split") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val evs = randomEvents(rnd, 1 + rnd.nextInt(50))
      val cuts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(evs.size + 1))
      val want = brute(evs)
      val got = runSplit(evs, cuts)
      assert(got.map(m => (m.start_sec, m.end_sec)) == want,
        s"seed=$seed cuts=$cuts")
      assert(got.map(_.n_matches) == (1L to got.size.toLong),
        s"seed=$seed running count must be 1..k")
      assert(runSplit(evs, Nil).map(m => (m.start_sec, m.end_sec)) == want)
    }
  }

  test("replaying any already-processed prefix emits nothing (frontier gate)") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(1000 + seed)
      val evs = randomEvents(rnd, 3 + rnd.nextInt(30))
      val tape = evs.sortBy(e => (e.sec, e.event_id))
      var st = Empty
      val (_, st1) = advance(8L, st, tape)
      val prefix = tape.take(1 + rnd.nextInt(tape.size))
      val (replayed, st2) = advance(8L, st1, prefix)
      assert(replayed.isEmpty, s"seed=$seed redelivery fabricated a match")
      assert(st2 == st1, s"seed=$seed redelivery moved state")
    }
  }

  test("the MaxSeqEvents budget truncates exactly like the batch query") {
    val cap = graft.analytics.BehaviorQueries.MaxSeqEvents
    // cap-1 filler clicks, then a view+purchase pair that straddles the
    // budget boundary: the view (event cap) fits, the purchase (cap+1)
    // must be ignored — regex over the capped string finds no match
    val filler = (1 to cap - 1).map(i =>
      PatternEvent(8L, i.toLong, "click", 100L + i))
    val straddle = Seq(
      PatternEvent(8L, cap.toLong, "view", 100L + cap),
      PatternEvent(8L, cap + 1L, "purchase", 101L + cap))
    val evs = filler ++ straddle
    assert(brute(evs).isEmpty)
    assert(runSplit(evs, Seq(cap / 2)).isEmpty,
      "the stream must spend the same budget as the batch truncation")
  }
}
