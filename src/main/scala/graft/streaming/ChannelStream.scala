package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's live pub/sub core as a Structured Streaming stateful
  * operator: `ChannelHub`'s membership maps (`lib/ChannelHub.js:28-29`)
  * become keyed `GroupState` per channel, and `sendMessage`
  * (`lib/ChannelHub.js:251-279`) becomes the per-group flatMap emitting
  * delivery rows.
  *
  * Replaces the reference's gossip replication entirely: state lives in
  * Spark's checkpointed StateStore (eventual consistency → exactly-once
  * on replay), so NODE_STATE/CHANNEL_JOIN mesh traffic
  * (`lib/QutyCluster.js:521-577`) has no equivalent here by design.
  *
  * Scale design: keyed BY CHANNEL (bounded cardinality), not by client —
  * state size is O(channels × avg subscribers), and a hot channel's
  * subscriber set stays one state row. Empty channels remove their state
  * row (the auto-destroy of `lib/ChannelHub.js:85-89,168-172`). For
  * production the state store would be RocksDB-backed
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
object ChannelStream {

  /** Control/message event, pre-keyed by channel (a K kick event is
    * exploded to one row per channel upstream — the reference's
    * removeClient-everywhere, `lib/ChannelHub.js:192-199`). */
  case class ChannelEvent(
      tsMillis: Long,
      op: String,          // J subscribe | L/U unsubscribe | K kick | M message
      channel: String,
      cid: Long,
      sid: String,
      origin: String,      // publisher | node | local — loop-prevention flags
      message: String)

  /** Per-channel membership: cid -> owning sid. */
  case class ChannelState(members: Map[Long, String])

  /** One delivery row per (message, subscribed client) — the
    * `client.message` emit of `lib/ChannelHub.js:267-273`. */
  case class Delivery(channel: String, cid: Long, sid: String,
      message: String, tsMillis: Long, origin: String)

  /** Order within a micro-batch follows event time then op (the
    * reference processes frames in arrival order; a batch has no
    * arrival order, so we impose a deterministic one). */
  private def ordered(events: Iterator[ChannelEvent]): Seq[ChannelEvent] =
    events.toSeq.sortBy(e => (e.tsMillis, e.op, e.cid))

  /** The per-group transition function. */
  def processChannel(channel: String, events: Iterator[ChannelEvent],
      state: GroupState[ChannelState]): Iterator[Delivery] = {
    var members: Map[Long, String] =
      state.getOption.map(_.members).getOrElse(Map.empty)
    val out = Seq.newBuilder[Delivery]
    for (e <- ordered(events)) e.op match {
      case "J" =>
        // idempotent add (duplicate join is a no-op, lib/ChannelHub.js:65-69)
        members = members.updated(e.cid, e.sid)
      case "L" | "U" | "K" =>
        members = members - e.cid
      case "M" =>
        // fan-out to current members; sender echo included iff sender
        // subscribed — matches channel.message emit (lib/ChannelHub.js:275-277)
        out ++= members.toSeq.sortBy(_._1).map { case (cid, sid) =>
          Delivery(channel, cid, sid, e.message, e.tsMillis, e.origin)
        }
      case _ => // unknown opcode: ignored (defensive, like the handlers)
    }
    if (members.isEmpty) state.remove()           // channel auto-destroy
    else state.update(ChannelState(members))
    out.result().iterator
  }

  /** Wire the operator onto a stream of [[ChannelEvent]]. */
  def deliveries(events: Dataset[ChannelEvent]): Dataset[Delivery] = {
    implicit val stateEnc = Encoders.product[ChannelState]
    implicit val outEnc = Encoders.product[Delivery]
    events
      .groupByKey(_.channel)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processChannel)
  }
}
