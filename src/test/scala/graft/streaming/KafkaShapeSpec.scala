package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The Kafka wire contract, tested without a broker (VERDICT r12
  * task 4): BASELINE's "Structured Streaming ingestion + Kafka
  * semantics" as executable specs instead of a mapping note.
  *
  * The fixture schema below is the EXACT relation
  * `spark.readStream.format("kafka")` produces with
  * includeHeaders=true — column names, types, and order per the
  * Structured Streaming + Kafka integration guide: key BINARY,
  * value BINARY, topic STRING, partition INT, offset LONG,
  * timestamp TIMESTAMP, timestampType INT,
  * headers ARRAY<STRUCT<key STRING, value BINARY>>. If
  * [[Ingest.parseFrames]] consumes this relation, the connector jar
  * plugs in unchanged; the MemoryStream is the transport stand-in,
  * never the semantics.
  */
case class KafkaHeader(key: String, value: Array[Byte])
case class KafkaFullRecord(key: Array[Byte], value: Array[Byte],
    topic: String, partition: Int, offset: Long, timestamp: Timestamp,
    timestampType: Int, headers: Array[KafkaHeader])

class KafkaShapeSpec extends SparkSpec {
  import spark.implicits._

  private def rec(partition: Int, offset: Long, frame: String,
      tsMillis: Long = 1000L, topic: String = "quty-frames") =
    KafkaFullRecord(s"k$offset".getBytes("UTF-8"),
      frame.getBytes("UTF-8"), topic, partition, offset,
      new Timestamp(tsMillis), 0 /* CreateTime */,
      Array(KafkaHeader("origin", "edge-7".getBytes("UTF-8"))))

  test("parseFrames consumes the full connector relation (headers + timestampType present)") {
    val df = Seq(
      rec(0, 0L, """J|{"c":"news","cid":"41","s":"node-1"}"""),
      rec(1, 7L, """M|{"c":"news","m":"breaking","s":"pub-1"}""", 2000L),
      rec(0, 1L, "garbage-no-pipe")).toDF()
    // pin the fixture against the documented connector schema FIRST —
    // if this line drifts, the test is no longer testing the contract
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "key" -> "binary", "value" -> "binary", "topic" -> "string",
      "partition" -> "int", "offset" -> "bigint",
      "timestamp" -> "timestamp", "timestampType" -> "int",
      "headers" -> "array<struct<key:string,value:binary>>"))
    val parsed = Ingest.parseFrames(df)
    val rows = parsed.orderBy("partition", "offset").collect()
    assert(rows.length == 3)
    assert(parsed.columns.toSeq == Seq("topic", "partition", "offset",
      "kafka_ts", "key", "op", "seq", "channel", "message", "sender",
      "cid"))
    val joinRow = rows(0)
    assert(joinRow.getAs[String]("op") == "J")
    assert(joinRow.getAs[String]("channel") == "news")
    assert(joinRow.getAs[String]("key") == "k0") // binary key → string
    val msgRow = rows(2)
    assert(msgRow.getAs[String]("op") == "M")
    assert(msgRow.getAs[String]("message") == "breaking")
    // the malformed frame survives the parse with a null op (the
    // filter lives downstream in channelEvents)
    assert(rows(1).isNullAt(rows(1).fieldIndex("op")))
  }

  test("dedupeByOffset: broker re-delivery of (topic, partition, offset) is dropped within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaFullRecord]
    val name = s"kafka_dedup_${graft.SparkSpec.streamCounter.incrementAndGet()}"
    val q = Ingest.dedupeByOffset(Ingest.parseFrames(input.toDF()))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val m1 = rec(0, 0L, """M|{"c":"a","m":"x"}""", 1000L)
      val m2 = rec(0, 1L, """M|{"c":"a","m":"y"}""", 2000L)
      input.addData(Seq(m1, m2))
      q.processAllAvailable()
      // the at-least-once case: the broker (or a restarted source)
      // hands the SAME records again, plus one genuinely new one —
      // same topic+partition+offset must not re-emit
      val m3 = rec(1, 0L, """M|{"c":"a","m":"z"}""", 3000L)
      input.addData(Seq(m1, m2, m3))
      q.processAllAvailable()
      val out = spark.table(name).select("topic", "partition", "offset")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSeq.sorted
      assert(out == Seq(("quty-frames", 0, 0L), ("quty-frames", 0, 1L),
        ("quty-frames", 1, 0L)),
        s"re-delivered offsets must be dropped exactly once: $out")
    } finally q.stop()
  }

  test("toKafkaRecords emits the exact kafka SINK relation (topic/key/value/headers, value is a parseable O2 frame)") {
    // the sink-side contract (VERDICT r13 task 6): the relation
    // writeStream.format("kafka") consumes — topic STRING, key BINARY,
    // value BINARY, headers ARRAY<STRUCT<key STRING, value BINARY>>;
    // partition INT deliberately absent (key-hash partitioner)
    val deliveries = Seq(
      ChannelStream.Delivery("news", 5L, "pub-1", "hello", 1000L,
        "publisher"),
      ChannelStream.Delivery("sport", 9L, "node-2", "goal", 2042L,
        "node")).toDS()
    val recs = Ingest.toKafkaRecords(deliveries, "quty-out")
    assert(recs.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "topic" -> "string", "key" -> "binary", "value" -> "binary",
      "headers" -> "array<struct<key:string,value:binary>>"))

    // loopback through the SOURCE contract: dress the producer rows as
    // broker records and re-parse — both directions of the wire
    // contract must compose to the identity on the envelope
    import org.apache.spark.sql.functions._
    val brokerShaped = recs.select(col("key"), col("value"), col("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      lit(new Timestamp(5000L)).as("timestamp"),
      lit(0).as("timestampType"), col("headers"))
    val back = Ingest.parseFrames(brokerShaped)
      .orderBy("channel").collect()
    assert(back.length == 2)
    assert(back.map(_.getAs[String]("op")).toSeq == Seq("M", "M"))
    assert(back.map(_.getAs[String]("channel")).toSeq ==
      Seq("news", "sport"))
    assert(back.map(_.getAs[String]("message")).toSeq ==
      Seq("hello", "goal"))
    assert(back.map(_.getAs[String]("sender")).toSeq ==
      Seq("pub-1", "node-2"))
    // the key routes by channel (per-channel broker ordering) and the
    // default _q is the tsMillis mod-100 streaming-safe counter
    assert(back.map(_.getAs[String]("key")).toSeq == Seq("news", "sport"))
    val seqs = back.map(_.getAs[Int]("seq")).toSeq
    assert(seqs == Seq(0, 42), s"mod-100 _q expected: $seqs")
  }

  test("toKafkaRecords is streaming-safe end-to-end (no batch-only expressions in the sink path)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChannelStream.Delivery]
    val name = s"kafka_sink_${graft.SparkSpec.streamCounter.incrementAndGet()}"
    // format("kafka") itself needs the connector jar + broker; memory
    // sink consumes the SAME relation, proving every expression in the
    // sink path plans under streaming (a window function here would
    // throw AnalysisException at start())
    val q = Ingest.toKafkaRecords(input.toDS(), "quty-out")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(ChannelStream.Delivery("news", 5L, "pub-1",
        "hello", 1100L, "publisher")))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length == 1)
      val frame = new String(rows(0).getAs[Array[Byte]]("value"), "UTF-8")
      assert(frame.startsWith("M|{"), s"wire frame expected: $frame")
      assert(frame.contains("\"_q\":0"), s"mod-100 _q expected: $frame")
    } finally q.stop()
  }

  test("wire round-trip: re-delivered frames produce exactly one delivery each (dedupe → route → idempotent sink)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("kafka_shape_sink").toString
    val input = MemoryStream[KafkaFullRecord]
    // full pipeline: parse → offset-dedupe → channel events → stateful
    // routing → the batchId-idempotent parquet sink
    val deliveries = ChannelStream.deliveries(Ingest.channelEvents(
      Ingest.dedupeByOffset(Ingest.parseFrames(input.toDF()))))
    val q = Ingest.deliverToParquet(deliveries,
        s"$root/out", s"$root/ckpt").start()
    try {
      val join = rec(0, 0L, """J|{"c":"news","cid":"5","s":"node-1"}""",
        1000L)
      input.addData(Seq(join))
      q.processAllAvailable()
      val msg = rec(0, 1L, """M|{"c":"news","m":"hello","s":"pub-1"}""",
        2000L)
      // the message arrives TWICE in one batch (broker re-delivery)…
      input.addData(Seq(msg, msg))
      q.processAllAvailable()
      // …and AGAIN in the next batch
      input.addData(Seq(msg))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$root/out")
        .select("cid", "message").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((5L, "hello")),
        s"exactly one delivery expected across re-deliveries: $rows")
    } finally q.stop()
  }
}
