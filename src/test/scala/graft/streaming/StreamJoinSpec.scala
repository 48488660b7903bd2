package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream and stream-static joins with watermarks (SURVEY §2.2
  * joins row: "stream-static and stream-stream joins with watermarks").
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Msg(ts: Timestamp, channel: String, message: String)
  case class Sub(ts: Timestamp, channel: String, cid: Long)
  // offset a day past the epoch: event time 0 sits exactly on Spark's
  // initial watermark and gets edge-dropped
  private def t(s: Int) = new Timestamp((86400 + s) * 1000L)

  test("stream-stream interval join: messages meet recent subscriptions") {
    implicit val sqlCtx = spark.sqlContext
    val msgs = MemoryStream[Msg]
    val subs = MemoryStream[Sub]
    val joined = msgs.toDF().withWatermark("ts", "1 minute").as("m")
      .join(subs.toDF().withWatermark("ts", "1 minute").as("s"),
        expr("""m.channel = s.channel AND
                s.ts BETWEEN m.ts - INTERVAL 2 MINUTES AND m.ts"""))
      .select(col("m.channel"), col("s.cid"), col("m.message"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      subs.addData(Sub(t(0), "news", 1L), Sub(t(10), "news", 2L))
      msgs.addData(Msg(t(60), "news", "hello"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").as[(String, Long, String)].collect()
      assert(rows.toSet == Set(("news", 1L, "hello"), ("news", 2L, "hello")))
      // a message 3 minutes later only joins subs within its 2-min window
      msgs.addData(Msg(t(240), "news", "later"))
      q.processAllAvailable()
      val later = spark.table("ssjoin").as[(String, Long, String)].collect()
        .filter(_._3 == "later")
      assert(later.isEmpty) // both subs are older than ts-2min
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched rows emit nulls after the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val msgs = MemoryStream[Msg]
    val subs = MemoryStream[Sub]
    val joined = msgs.toDF().withWatermark("ts", "1 minute").as("m")
      .join(subs.toDF().withWatermark("ts", "1 minute").as("s"),
        expr("""m.channel = s.channel AND
                s.ts BETWEEN m.ts - INTERVAL 2 MINUTES AND m.ts"""),
        "left_outer")
      .select(col("m.channel"), col("s.cid"), col("m.message"))
    val q = joined.writeStream.format("memory").queryName("ssleft")
      .outputMode(OutputMode.Append).start()
    try {
      // one message with no subscriber, one with a match
      msgs.addData(Msg(t(0), "lonely", "nobody-home"))
      subs.addData(Sub(t(0), "news", 1L))
      msgs.addData(Msg(t(30), "news", "hello"))
      q.processAllAvailable()
      val early = spark.table("ssleft")
        .as[(String, Option[Long], String)].collect()
      // the matched row may emit immediately; the unmatched one must
      // NOT have emitted yet — its join window is still open
      assert(!early.exists(_._1 == "lonely"))
      // advance BOTH watermarks (global watermark = min) past the
      // unmatched row's window
      msgs.addData(Msg(t(600), "news", "advance"))
      subs.addData(Sub(t(600), "news", 9L))
      q.processAllAvailable()
      val rows = spark.table("ssleft")
        .as[(String, Option[Long], String)].collect()
      assert(rows.contains(("lonely", None, "nobody-home")),
        s"expected the null-padded outer row in: ${rows.toSeq}")
      assert(rows.contains(("news", Some(1L), "hello")))
    } finally q.stop()
  }

  test("stream-static join: stream enriched against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    val msgs = MemoryStream[Msg]
    val dim = Seq(("news", "World News"), ("sport", "Sports")).toDF("channel", "title")
    val joined = msgs.toDF().join(broadcast(dim), Seq("channel"))
      .select(col("channel"), col("title"), col("message"))
    val q = joined.writeStream.format("memory").queryName("stjoin")
      .outputMode(OutputMode.Append).start()
    try {
      msgs.addData(Msg(t(1), "news", "a"), Msg(t(2), "ghost", "b"))
      q.processAllAvailable()
      val rows = spark.table("stjoin").as[(String, String, String)].collect()
      assert(rows.toSeq == Seq(("news", "World News", "a"))) // ghost dropped
    } finally q.stop()
  }
}
