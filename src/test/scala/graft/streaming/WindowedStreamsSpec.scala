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

  case class E(ts: Timestamp, event_type: String, user_id: Long, value: Double)
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
