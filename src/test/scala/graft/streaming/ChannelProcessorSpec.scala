package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode
import ChannelStream._

/** transformWithState path over RocksDB: must match the
  * flatMapGroupsWithState semantics exactly. */
class ChannelProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[ChannelEvent]],
      systemMessages: Boolean = false): Seq[Delivery] =
    runRocksDbStream(batches)(
      ChannelProcessor.deliveries(_, systemMessages = systemMessages))

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

  test("system-message enrichment (O40) matches the flatMapGroupsWithState path") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "hub", 1, "n1")),
      Seq(ev(2, "J", "hub", 2, "n2")),
      Seq(ev(3, "M", "hub", msg = "hello")),
      Seq(ev(4, "L", "hub", 1))),
      systemMessages = true)
    assert(out.map(d => (d.cid, d.message, d.origin)) == Seq(
      (1L, "system:welcome:1", "system"),
      (2L, "system:welcome:2", "system"),
      (1L, "system:join:2", "system"),
      (1L, "hello", "publisher"),
      (2L, "hello", "publisher"),
      (2L, "system:leave:1", "system")))
  }

  test("state persists across micro-batches and channel empties cleanly") {
    val out = runBatches(Seq(
      Seq(ev(1, "J", "ch", 9, "n1")),
      Seq(ev(2, "K", "ch", 9)),
      Seq(ev(3, "M", "ch", msg = "nobody"))))
    assert(out.isEmpty)
  }

  /** TTL needs TimeMode.ProcessingTime, under which neither
    * processAllAvailable nor Trigger.AvailableNow ever settles (timer
    * batches keep the stream "busy") — so TTL runs use a file source
    * with a restart per batch and a bounded progress-watch: wait until
    * the run has PROVABLY ingested its rows (recentProgress
    * numInputRows), then stop. */
  private def runTtlBatches(ttl: java.time.Duration, sleepBetweenMs: Long,
      batches: Seq[Seq[ChannelEvent]]): Seq[Delivery] = {
    import java.nio.file.Files
    val root = Files.createTempDirectory("tws_ttl").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[ChannelEvent]].schema
    withRocksDbProvider {
      for ((b, i) <- batches.zipWithIndex) {
        if (i > 0) Thread.sleep(sleepBetweenMs)
        b.toDS().repartition(1).write.mode("append").json(s"$root/in")
        val src = spark.readStream.schema(schema).json(s"$root/in")
          .as[ChannelEvent]
        val q = ChannelProcessor.deliveries(src, Some(ttl))
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode(OutputMode.Append)
          .start()
        try {
          val deadline = System.currentTimeMillis() + 120000
          def ingested: Long = q.recentProgress.map(_.numInputRows).sum
          while (ingested < b.size && System.currentTimeMillis() < deadline)
            Thread.sleep(200)
          assert(ingested >= b.size,
            s"run $i never ingested its ${b.size} rows (not a vacuous pass)")
        } finally q.stop()
      }
      try spark.read.parquet(s"$root/out").as[Delivery].collect().toSeq
      catch { case _: Exception => Seq.empty }
    }
  }

  test("TTL expires idle channel state (the auto-destroy analog)") {
    // Only the SAFE direction is asserted: after sleeping well past the
    // TTL, the membership must be gone — scheduler delays can only make
    // the sleep longer, never resurrect state, so this cannot flake.
    val out = runTtlBatches(java.time.Duration.ofMillis(500), sleepBetweenMs = 3000,
      Seq(Seq(ev(1, "J", "ttlch", 1, "n1")),
        Seq(ev(2, "M", "ttlch", msg = "after-expiry"))))
    assert(out.isEmpty, s"state should have expired, got $out")
  }

  test("long TTL retains state across immediate restarts") {
    val out = runTtlBatches(java.time.Duration.ofHours(1), sleepBetweenMs = 0,
      Seq(Seq(ev(1, "J", "keepch", 1, "n1")),
        Seq(ev(2, "M", "keepch", msg = "kept"))))
    assert(out.map(d => (d.cid, d.message)) == Seq((1L, "kept")))
  }
}
