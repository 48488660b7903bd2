package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import PatternProcessor._

/** The streaming browse-to-buy detector must emit exactly the
  * non-overlapping `v[^p]*p` matches the batch regex counts: planted
  * state-machine cases, batch-split invariance on time-ordered input,
  * and full equivalence against java.util.regex on the sf0.001 event
  * stream.
  */
class PatternProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[PatternEvent]]): Seq[PatternMatch] =
    runRocksDbStream(batches)(PatternProcessor.matches)

  private def ev(u: Long, id: Long, t: String, sec: Long) =
    PatternEvent(u, id, t, sec)

  test("open matches cross non-purchase noise and close on purchase") {
    val out = run(Seq(Seq(
      ev(1, 1, "view", 10), ev(1, 2, "click", 11), ev(1, 3, "error", 12),
      ev(1, 4, "purchase", 13), // first match 10→13
      ev(1, 5, "purchase", 14), // disarmed: no open view
      ev(1, 6, "view", 15), ev(1, 7, "view", 16), // second view swallowed
      ev(1, 8, "purchase", 17)))) // second match 15→17
    assert(out.sortBy(_.n_matches).map(m =>
      (m.start_sec, m.end_sec, m.n_matches)) ==
      Seq((10L, 13L, 1L), (15L, 17L, 2L)))
  }

  test("matches spanning micro-batch boundaries equal the single-batch run") {
    val all = Seq(
      ev(1, 1, "view", 10), ev(1, 2, "click", 20),
      ev(1, 3, "purchase", 30), ev(1, 4, "view", 40),
      ev(1, 5, "purchase", 50))
    val whole = run(Seq(all)).sortBy(_.n_matches)
    for (cut <- 1 until all.length) {
      val split = run(Seq(all.take(cut), all.drop(cut))).sortBy(_.n_matches)
      assert(split == whole, s"split at $cut diverges")
    }
  }

  test("redelivered old rows are absorbed, not re-armed") {
    // an at-least-once source redelivers the already-consumed view@10
    // after the match closed; without the (sec, event_id) frontier it
    // would RE-ARM the machine and fabricate a (10, 30) match
    val out = run(Seq(
      Seq(ev(1, 1, "view", 10), ev(1, 2, "purchase", 20)),
      Seq(ev(1, 1, "view", 10), ev(1, 3, "purchase", 30))))
    assert(out.map(m => (m.start_sec, m.end_sec, m.n_matches)) ==
      Seq((10L, 20L, 1L)),
      s"replay fabricated a match: $out")
  }

  test("per-user budget matches the batch MaxSeqEvents truncation") {
    // batch behavior_pattern_regex truncates each user at its first
    // MaxSeqEvents events BY (sec, event_id); a match completing past
    // the cap must not be counted by the stream either
    val cap = graft.analytics.BehaviorQueries.MaxSeqEvents
    val noise = (1 to cap - 1).map(i =>
      ev(7, i.toLong, "click", 100L + i))
    val out = run(Seq(
      noise :+ ev(7, cap.toLong, "view", 100L + cap),
      // the closing purchase is event cap+1: PAST the budget —
      // the batch symbol string never contains it
      Seq(ev(7, cap + 1L, "purchase", 200L + cap))))
    assert(out.isEmpty,
      s"stream counted a match the batch truncation never sees: $out")
  }

  test("stream equals the batch regex on the sf0.001 event table") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .as[PatternEvent].collect().toSeq
      .sortBy(e => (e.sec, e.event_id))
    val got = run(Seq(events))
      .groupBy(_.user_id).map { case (u, ms) => u -> ms.length.toLong }
    val p = java.util.regex.Pattern.compile("v[^p]*p")
    val want = events.groupBy(_.user_id).flatMap { case (u, es) =>
      val sq = es.sortBy(e => (e.sec, e.event_id))
        .map(_.event_type.head).mkString
      val m = p.matcher(sq)
      var c = 0L
      while (m.find()) c += 1
      if (c > 0) Some(u -> c) else None
    }
    assert(got == want,
      s"stream/batch divergence: ${got.toSet.diff(want.toSet)} vs ${
        want.toSet.diff(got.toSet)}")
  }
}
