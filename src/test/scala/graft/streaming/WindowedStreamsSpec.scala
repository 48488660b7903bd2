package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Windowed-stream semantics over MemoryStream: tumbling counts,
  * session merge, and watermark-driven late-data drop.
  */
class WindowedStreamsSpec extends SparkSpec {
  import spark.implicits._

  case class E(ts: Timestamp, event_type: String, user_id: Long,
      value: Double, event_id: Long = 0L)
  private def t(minutes: Int) = new Timestamp(minutes * 60000L)

  private var n = 0
  private def run(df: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[E]], mode: OutputMode): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    n += 1
    val name = s"winstream_$n"
    val q = df(input.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      for (b <- batches) { input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling window counts per channel finalize after watermark") {
    val rows = run(WindowedStreams.tumblingThroughput, Seq(
      Seq(E(t(1), "news", 1, 1.0), E(t(2), "news", 2, 1.0),
          E(t(11), "news", 1, 1.0)),
      // advance event time far enough to close earlier windows
      Seq(E(t(120), "news", 3, 1.0))),
      OutputMode.Append)
    val counts = rows.map(r =>
      (r.getAs[Timestamp]("win_start").getTime / 60000, r.getAs[Long]("n_events")))
      .toMap
    assert(counts(0L) == 2)   // [0,10): 2 events
    assert(counts(10L) == 1)  // [10,20): 1 event
  }

  test("late event beyond watermark is dropped") {
    val rows = run(WindowedStreams.tumblingThroughput, Seq(
      Seq(E(t(1), "news", 1, 1.0)),
      Seq(E(t(120), "news", 2, 1.0)),   // watermark -> 90min
      Seq(E(t(2), "news", 3, 1.0)),     // late by 88min: dropped
      Seq(E(t(240), "news", 4, 1.0))),  // flush
      OutputMode.Append)
    val w0 = rows.filter(_.getAs[Timestamp]("win_start").getTime == 0L)
    assert(w0.map(_.getAs[Long]("n_events")).sum == 1) // late row not counted
  }

  test("watermark-drop parity: the batch lateness predictor reproduces streaming drops event-for-event") {
    // The rule dq_watermark_lateness models — an event is dropped iff
    // its window end ≤ (watermark at the batch it arrives in), where
    // the watermark is max-event-time-so-far − delay carried over
    // from the PREVIOUS micro-batch. This test replays that exact
    // recurrence in plain Scala over a planted arrival schedule and
    // asserts the streaming query keeps/drops the identical events.
    // Fixture avoids boundary equality (no window end exactly ON a
    // watermark) so parity is not a <=-vs-< accident.
    import org.apache.spark.sql.functions.{col, count, lit, window}
    val delaySec = 60L
    val winSec = 300L
    val batches: Seq[Seq[E]] = Seq(
      Seq(E(t(1), "a", 1, 1.0), E(t(4), "a", 2, 1.0)),
      Seq(E(t(10), "a", 3, 1.0), E(t(2), "a", 4, 1.0)),  // 2min: kept (wm 3min < wend 5min)
      Seq(E(t(20), "a", 5, 1.0), E(t(3), "a", 6, 1.0)),  // 3min: dropped (wm 9min ≥ wend 5min)
      Seq(E(t(21), "a", 7, 1.0), E(t(16), "a", 8, 1.0)), // 16min: kept (wm 19min < wend 20min)
      Seq(E(t(90), "flush", 9, 1.0)))
    val rows = run(df => df.withWatermark("ts", "60 seconds")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n")),
      batches, OutputMode.Append)
    val streamed = rows.map(r =>
      (r.getAs[Timestamp]("win_start").getTime / 1000, r.getAs[Long]("n")))
      .toMap
    // batch replay of the same recurrence
    var wm = Long.MinValue
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long] // window starts
    for (b <- batches) {
      for (e <- b) {
        val sec = e.ts.getTime / 1000
        val wend = (sec / winSec + 1) * winSec
        if (wend > wm) kept += wend - winSec
      }
      wm = math.max(wm, b.map(_.ts.getTime / 1000).max - delaySec)
    }
    val predicted = kept.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .filter { case (ws, _) => ws + winSec <= wm } // only finalized windows emit
    assert(streamed == predicted,
      s"streamed=$streamed predicted=$predicted")
    // and the planted intent holds: of the 8 data events exactly one
    // (user 6, the 3-min straggler behind a 9-min watermark) dropped,
    // and the flush event's own unfinalized window never emitted
    assert(streamed.values.sum == 7L)
    assert(streamed(0L) == 3L) // [0,5min): users 1, 2, 4 — straggler gone
  }

  test("dedup within watermark drops in-horizon duplicates, re-admits after expiry") {
    val rows = run(WindowedStreams.dedupedIngest, Seq(
      // duplicate payload twice inside the horizon -> one survivor
      Seq(E(t(1), "news", 1, 5.0), E(t(2), "news", 1, 5.0)),
      Seq(E(t(3), "news", 1, 5.0), E(t(4), "other", 2, 1.0)),
      // advance watermark far past the digest's state TTL...
      Seq(E(t(200), "flush", 9, 0.0)),
      // ...the same payload is new again (state was evicted)
      Seq(E(t(210), "news", 1, 5.0)),
      Seq(E(t(500), "flush2", 8, 0.0))),
      OutputMode.Append)
    val newsDups = rows.filter(r => r.getAs[String]("event_type") == "news" &&
      r.getAs[Double]("value") == 5.0)
    assert(newsDups.length == 2,
      s"one survivor per horizon, got ${newsDups.map(_.toString)}")
    assert(rows.exists(_.getAs[String]("event_type") == "other"))
  }

  test("streaming OHLC bars: open/close by event time, extremes exact, channels isolated") {
    val rows = run(WindowedStreams.ohlcBars, Seq(
      Seq(E(t(1), "px", 1, 5.0), E(t(10), "px", 2, 1.0),
          E(t(20), "px", 1, 9.0), E(t(59), "px", 3, 3.0),
          E(t(15), "other", 1, 7.5)),
      Seq(E(t(130), "px", 9, 2.0))), // advances watermark past the bar
      OutputMode.Append)
    val px = rows.filter(_.getAs[String]("event_type") == "px")
      .filter(_.getAs[Timestamp]("win_start").getTime == 0L)
    assert(px.length == 1, s"exactly one finalized bar: $rows")
    val b = px.head
    assert(b.getAs[Long]("n_events") == 4L)
    assert(b.getAs[Double]("open") == 5.0, "first event by time opens")
    assert(b.getAs[Double]("high") == 9.0)
    assert(b.getAs[Double]("low") == 1.0)
    assert(b.getAs[Double]("close") == 3.0, "last event by time closes")
    val other = rows.filter(_.getAs[String]("event_type") == "other").head
    assert(other.getAs[Double]("open") == 7.5 &&
      other.getAs[Double]("close") == 7.5,
      "single-event channel: open = close")
  }

  test("OHLC same-timestamp ties resolve by event_id — the batch convention") {
    // two events share the opening second and two share the closing
    // second, with VALUES ordered against the ids, so a (tu, value)
    // struct — the pre-fix tie-break — picks 3.0/7.0 while the batch
    // window_ohlc_hourly convention struct(tu, event_id, xc) picks
    // 9.0/5.0; this pins the stream to the batch convention
    val rows = run(WindowedStreams.ohlcBars, Seq(
      Seq(E(t(1), "px", 1, 9.0, event_id = 1),
          E(t(1), "px", 2, 3.0, event_id = 2),
          E(t(50), "px", 3, 7.0, event_id = 3),
          E(t(50), "px", 4, 5.0, event_id = 4)),
      Seq(E(t(130), "px", 9, 2.0, event_id = 9))), // closes the bar
      OutputMode.Append)
    val b = rows.filter(_.getAs[String]("event_type") == "px")
      .filter(_.getAs[Timestamp]("win_start").getTime == 0L).head
    assert(b.getAs[Double]("open") == 9.0,
      "tie at the open must resolve by MIN event_id, not min value")
    assert(b.getAs[Double]("close") == 5.0,
      "tie at the close must resolve by MAX event_id, not max value")
    assert(b.getAs[Double]("high") == 9.0 && b.getAs[Double]("low") == 3.0)
  }

  test("session window merges events within gap and splits across it") {
    val rows = run(WindowedStreams.userSessions, Seq(
      Seq(E(t(0), "x", 1, 1.0), E(t(10), "x", 1, 1.0),   // one session
          E(t(100), "x", 1, 1.0)),                        // second session
      Seq(E(t(500), "x", 9, 1.0))),                       // flush watermark
      OutputMode.Append)
    val sessions = rows.filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Timestamp]("sess_start").getTime / 60000,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(sessions == Seq((0L, 2L), (100L, 1L)))
  }
}
