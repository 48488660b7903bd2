package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end ingestion pipeline over the Kafka wire shape: raw frame
  * bytes → parse → channel events → stateful routing → deliveries.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  case class KafkaRecord(key: Array[Byte], value: Array[Byte],
      topic: String, partition: Int, offset: Long, timestamp: Timestamp)

  private def rec(offset: Long, frame: String, tsMillis: Long = 1000L) =
    KafkaRecord(null, frame.getBytes("UTF-8"), "quty-frames", 0, offset,
      new Timestamp(tsMillis))

  private var n = 0
  private def runPipeline(batches: Seq[Seq[KafkaRecord]]): Seq[ChannelStream.Delivery] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    n += 1
    val name = s"ingest_$n"
    val q = ChannelStream.deliveries(
        Ingest.channelEvents(Ingest.parseFrames(input.toDF())))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      for (b <- batches) { input.addData(b); q.processAllAvailable() }
      spark.table(name).as[ChannelStream.Delivery].collect().toSeq
    } finally q.stop()
  }

  test("frames flow end-to-end: join then message then delivery") {
    val out = runPipeline(Seq(
      Seq(rec(0, """J|{"c":"news","cid":"41","s":"node-1"}""", 1000),
          rec(1, """J|{"c":"news","cid":"42","s":"node-2"}""", 2000)),
      Seq(rec(2, """M|{"c":"news","m":"breaking","s":"pub-1"}""", 3000))))
    assert(out.map(d => (d.cid, d.message)).toSet ==
      Set((41L, "breaking"), (42L, "breaking")))
    assert(out.forall(_.origin == "publisher"))
  }

  test("malformed frames are filtered, valid ones still deliver") {
    val out = runPipeline(Seq(
      Seq(rec(0, """J|{"c":"news","cid":"7","s":"node-1"}"""),
          rec(1, "garbage-no-pipe"),
          rec(2, """|{"c":"news"}""")),
      Seq(rec(3, """M|{"c":"news","m":"ok"}""", 5000))))
    assert(out.map(_.cid) == Seq(7L))
  }

  test("node-originated messages are tagged for loop prevention") {
    val out = runPipeline(Seq(
      Seq(rec(0, """J|{"c":"ch","cid":"1","s":"node-1"}""")),
      Seq(rec(1, """M|{"c":"ch","m":"relay","s":"node-9"}""", 2000))))
    assert(out.map(_.origin) == Seq("node"))
  }

  test("unsubscribe frame stops subsequent delivery") {
    val out = runPipeline(Seq(
      Seq(rec(0, """J|{"c":"ch","cid":"1","s":"node-1"}""", 1000)),
      Seq(rec(1, """L|{"c":"ch","cid":"1"}""", 2000)),
      Seq(rec(2, """M|{"c":"ch","m":"gone"}""", 3000))))
    assert(out.isEmpty)
  }

  test("parquet sink: a replayed micro-batch overwrites itself, never duplicates") {
    // foreachBatch is at-least-once — a crash between the parquet and
    // checkpoint commits re-runs the batch. The sink keys the write on
    // batch_id with dynamic partition overwrite, so the replay must
    // leave the table IDENTICAL, not doubled.
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("ingest_sink").toString + "/deliveries"
    def d(cid: Long, ch: String, msg: String) =
      ChannelStream.Delivery(ch, cid, "node-1", msg, 1000L, "publisher")
    val b0 = Seq(d(1, "news", "a"), d(2, "news", "a"), d(3, "sport", "b"))
    val b1 = Seq(d(1, "news", "c"))
    Ingest.writeDeliveryBatch(b0.toDS(), 0L, path)
    Ingest.writeDeliveryBatch(b1.toDS(), 1L, path)
    Ingest.writeDeliveryBatch(b0.toDS(), 0L, path) // the replay
    val rows = spark.read.parquet(path)
      .select("cid", "channel", "message").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.sorted == (b0 ++ b1)
      .map(x => (x.cid, x.channel, x.message)).sorted,
      s"replay duplicated or lost rows: $rows")
  }
}
