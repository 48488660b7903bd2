package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import ChannelStream._

/** Streaming semantics from SURVEY §5.2: subscribe→message→delivered;
  * unknown channel → no delivery; unsubscribe→message→not delivered;
  * kick removes; state evicted when channel empties.
  */
class ChannelStreamSpec extends SparkSpec {
  import spark.implicits._

  private var nextId = 0
  private def runBatches(batches: Seq[Seq[ChannelEvent]]): Seq[Delivery] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChannelEvent]
    nextId += 1
    val sinkName = s"chanstream_$nextId"
    val q = deliveries(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append).start()
    try {
      for (b <- batches) { input.addData(b); q.processAllAvailable() }
      spark.table(sinkName).as[Delivery].collect().toSeq
    } finally q.stop()
  }

  private def ev(t: Long, op: String, ch: String, cid: Long = -1,
      sid: String = "", msg: String = ""): ChannelEvent =
    ChannelEvent(t, op, ch, cid, sid, "publisher", msg)

  test("subscribe then message delivers to all subscribers") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "news", 1, "n1"), ev(2, "J", "news", 2, "n2")),
      Seq(ev(3, "M", "news", msg = "hello"))))
    assert(out.map(d => (d.cid, d.message)).toSet ==
      Set((1L, "hello"), (2L, "hello")))
  }

  test("message to unknown channel delivers nothing") {
    val out = runBatches(Seq(Seq(ev(1, "M", "ghost", msg = "lost"))))
    assert(out.isEmpty)
  }

  test("unsubscribe stops delivery; remaining members still receive") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "news", 1, "n1"), ev(2, "J", "news", 2, "n1")),
      Seq(ev(3, "L", "news", 1)),
      Seq(ev(4, "M", "news", msg = "later"))))
    assert(out.map(_.cid).toSet == Set(2L))
  }

  test("kick behaves like unsubscribe within the channel") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "news", 1, "n1")),
      Seq(ev(2, "K", "news", 1)),
      Seq(ev(3, "M", "news", msg = "after-kick"))))
    assert(out.isEmpty)
  }

  test("within-batch ordering is event-time: J before M in same batch") {
    val out = runBatches(Seq(
      Seq(ev(5, "M", "news", msg = "m1"), ev(1, "J", "news", 7, "n1"))))
    assert(out.map(_.cid) == Seq(7L)) // J(ts=1) applied before M(ts=5)
  }

  test("duplicate join is idempotent (single delivery per client)") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "news", 1, "n1"), ev(2, "J", "news", 1, "n1")),
      Seq(ev(3, "M", "news", msg = "once"))))
    assert(out.size == 1)
  }
}
