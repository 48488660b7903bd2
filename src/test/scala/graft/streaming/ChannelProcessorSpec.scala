package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import ChannelStream._

/** transformWithState path over RocksDB: must match the
  * flatMapGroupsWithState semantics exactly. */
class ChannelProcessorSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def runBatches(batches: Seq[Seq[ChannelEvent]]): Seq[Delivery] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ChannelEvent]
      n += 1
      val name = s"tws_$n"
      val q = ChannelProcessor.deliveries(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        for (b <- batches) { input.addData(b); q.processAllAvailable() }
        spark.table(name).as[Delivery].collect().toSeq
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def ev(t: Long, op: String, ch: String, cid: Long = -1,
      sid: String = "", msg: String = ""): ChannelEvent =
    ChannelEvent(t, op, ch, cid, sid, "publisher", msg)

  test("join/message/leave semantics match the flatMapGroupsWithState path") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "news", 1, "n1"), ev(2, "J", "news", 2, "n2")),
      Seq(ev(3, "M", "news", msg = "hello")),
      Seq(ev(4, "L", "news", 1)),
      Seq(ev(5, "M", "news", msg = "again"))))
    assert(out.map(d => (d.cid, d.message)).toSet ==
      Set((1L, "hello"), (2L, "hello"), (2L, "again")))
  }

  test("state persists across micro-batches and channel empties cleanly") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "ch", 9, "n1")),
      Seq(ev(2, "K", "ch", 9)),
      Seq(ev(3, "M", "ch", msg = "nobody"))))
    assert(out.isEmpty)
  }
}
