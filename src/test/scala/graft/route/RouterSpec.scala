package graft.route

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Router truth table from `lib/ChannelHub.js:251-279` (targeted send
  * vs broadcast fallback) and the delivery gate
  * (`example/engine-io.server.js:51-64`).
  */
class RouterSpec extends SparkSpec {
  import spark.implicits._

  private val nodeChannels = Seq(("news", "n1"), ("news", "n2"))
    .toDF("channel", "sid")
  private val allNodes = Seq("n1", "n2", "n3").toDF("sid")
  private val clientChannels = Seq(("news", 1L, "n1"), ("news", 2L, "n2"))
    .toDF("channel", "cid", "sid")

  test("known channel fans out only to subscribed nodes, b=false") {
    val msgs = Seq((100L, "news")).toDF("event_id", "channel")
    val out = Router.nodeFanout(msgs, nodeChannels, allNodes).collect()
    assert(out.length == 2)
    assert(out.forall(!_.getAs[Boolean]("b")))
    assert(out.map(_.getAs[String]("sid")).toSet == Set("n1", "n2"))
  }

  test("unknown channel broadcasts to ALL nodes with b=true") {
    val msgs = Seq((101L, "mystery")).toDF("event_id", "channel")
    val out = Router.nodeFanout(msgs, nodeChannels, allNodes).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Boolean]("b")))
  }

  test("client fanout delivers one row per subscribed client") {
    val msgs = Seq((102L, "news")).toDF("event_id", "channel")
    val out = Router.clientFanout(msgs, clientChannels).collect()
    assert(out.map(_.getAs[Long]("cid")).toSet == Set(1L, 2L))
  }

  test("delivery gate drops clients no longer subscribed") {
    val msgs = Seq((103L, "news")).toDF("event_id", "channel")
    val deliveries = Router.clientFanout(msgs, clientChannels)
      .select("event_id", "channel", "cid")
    val remaining = clientChannels.filter(col("cid") =!= 1L)
    val out = Router.deliveryGate(deliveries, remaining).collect()
    assert(out.map(_.getAs[Long]("cid")).toSeq == Seq(2L))
  }

  test("sender echo truth table: echo iff sender still subscribed") {
    // lib/ChannelHub.js:275-277 — channel.message back to the sender
    // only while the sender remains in the membership map.
    val msgs = Seq(
      (200L, "news", 1L),   // sender subscribed -> echo
      (201L, "news", 2L),   // sender subscribed -> echo
      (202L, "news", 9L),   // sender never subscribed -> no echo
      (203L, "ghost", 1L))  // channel unknown to cc -> no echo
      .toDF("event_id", "channel", "cid")
    val out = Router.senderEcho(msgs, clientChannels).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSet == Set(200L, 201L))
    // sender unsubscribed between send and delivery -> echo disappears
    val afterLeave = clientChannels.filter(col("cid") =!= 1L)
    val out2 = Router.senderEcho(msgs, afterLeave).collect()
    assert(out2.map(_.getAs[Long]("event_id")).toSet == Set(201L))
  }

  test("excludeSelf removes only the sender node") {
    val msgs = Seq((104L, "news")).toDF("event_id", "channel")
    val out = Router.excludeSelf(
      Router.nodeFanout(msgs, nodeChannels, allNodes), "n1").collect()
    assert(out.map(_.getAs[String]("sid")).toSet == Set("n2"))
  }

  test("excludeSelf keeps NULL-sid deliveries (3VL — they are not the sender)") {
    // round-12 review: =!= evaluated NULL on a NULL-sid fan-out row
    // (a sid derived from a NULL user) and silently dropped the
    // delivery; NULL is not self, so the row must survive
    val fanout = Seq((1L, "news", "n1"), (2L, "news", null),
      (3L, "news", "n2")).toDF("event_id", "channel", "sid")
    val out = Router.excludeSelf(fanout, "n1").collect()
    assert(out.map(_.getAs[Long]("event_id")).toSet == Set(2L, 3L))
  }

  test("provenance split: node-originated messages skip node fan-out") {
    val msgs = Seq((1L, "news", "publisher"), (2L, "news", "node"))
      .toDF("event_id", "channel", "origin")
    val (pub, node) = Router.withProvenance(msgs)
    assert(pub.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(node.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("provenance split PARTITIONS the input: NULL origin is a publisher") {
    // under three-valued logic a NULL origin fails === AND =!= — the
    // naive filter pair dropped such rows from BOTH frames, silently
    // losing the message from the delivery pipeline entirely
    val msgs = Seq((1L, "news", Some("publisher")), (2L, "news", None),
      (3L, "news", Some("node")))
      .toDF("event_id", "channel", "origin")
    val (pub, node) = Router.withProvenance(msgs)
    val pubIds = pub.collect().map(_.getLong(0)).toSet
    val nodeIds = node.collect().map(_.getLong(0)).toSet
    assert(pubIds == Set(1L, 2L), s"NULL origin lost: $pubIds")
    assert(nodeIds == Set(3L))
    assert((pubIds ++ nodeIds).size == 3, "frames must partition the input")
  }
}
