package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import ChannelStream.{ChannelEvent, ChannelState, Delivery}

/** Spark-4-native variant of [[ChannelStream]] on the
  * `transformWithState` API (SURVEY §7.4: "use transformWithState
  * (Spark 4) / RocksDB state store; key by channel; TTL for empty
  * channels"): same transition semantics, but state lives in a
  * RocksDB-backed `ValueState` — the production path at 100 TB, where
  * membership state must survive executor loss and exceed heap.
  *
  * Semantics are shared with the flatMapGroupsWithState path through
  * the same ordered-replay logic, so both implementations are covered
  * by the same expectations (see ChannelProcessorSpec).
  */
class ChannelProcessor(ttl: Option[java.time.Duration] = None,
    systemMessages: Boolean = false)
    extends StatefulProcessor[String, ChannelEvent, Delivery] {
  import ChannelProcessor.TwsState

  @transient private var members: ValueState[TwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getValueState[TwsState](
      "members", Encoders.product[TwsState],
      // TTL (SURVEY §7.4): an idle channel's membership expires from
      // the store without an explicit teardown frame — the state-store
      // analog of the reference's channel auto-destroy, and the
      // mechanism that bounds state size under churn at 100 TB.
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(channel: String, rows: Iterator[ChannelEvent],
      timers: TimerValues): Iterator[Delivery] = {
    val initial: Map[Long, String] =
      if (members.exists()) members.get().entries.toMap else Map.empty
    // Same transition core as the flatMapGroupsWithState path — shared
    // so the two state backends cannot drift (incl. the explicit S/I
    // gossip-frame ignore and the O40 system-message enrichment).
    val (m, out) = ChannelStream.applyEvents(channel, initial, rows,
      systemMessages)
    if (m.isEmpty) members.clear()         // channel auto-destroy
    else members.update(TwsState(m.toSeq.sortBy(_._1)))
    out.iterator
  }
}

object ChannelProcessor {
  /** State row for the Avro state encoder, which supports arrays of
    * structs but not MapType — membership as sorted (cid, sid) pairs. */
  case class TwsState(entries: Seq[(Long, String)])

  /** Wire the processor onto an event stream. Requires the RocksDB
    * state store provider (set in the session conf; see spec).
    * A `ttl` expires idle channel state (needs processing-time mode);
    * `systemMessages` switches on the O40 join/leave enrichment, same
    * as the flatMapGroupsWithState path. */
  def deliveries(events: Dataset[ChannelEvent],
      ttl: Option[java.time.Duration] = None,
      systemMessages: Boolean = false): Dataset[Delivery] = {
    implicit val outEnc = Encoders.product[Delivery]
    val timeMode = TtlModes.timeModeFor(ttl)
    events
      .groupByKey(_.channel)(Encoders.STRING)
      .transformWithState(new ChannelProcessor(ttl, systemMessages),
        timeMode, OutputMode.Append())
  }
}
