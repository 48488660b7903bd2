package graft.route

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's core computation: `ChannelHub.sendMessage`
  * (`lib/ChannelHub.js:251-279`) — given a message on a channel, compute
  * the exact delivery set:
  *
  *   - node fan-out: one `node.message` per sid subscribed to the
  *     channel (`:258-261`); if the channel is unknown locally, a
  *     `node.broadcast` to EVERY node with `b:true` (`:263-266`);
  *   - client fan-out: one `client.message` per cid subscribed
  *     (`:267-273`);
  *   - delivery gate (O41, `example/engine-io.server.js:51-64`): a
  *     client must still be subscribed at delivery time.
  *
  * In the reference this is a single-threaded O(subscribers) loop per
  * message; here it is an equi-join stream x membership on `channel`.
  * Membership is small relative to the event stream, so the join is a
  * broadcast-hash join (hinted explicitly) — at 100 TB the event side
  * never shuffles for routing.
  */
object Router {

  /** Client fan-out (`lib/ChannelHub.js:267-273`): one delivery row per
    * (message, subscribed client). */
  def clientFanout(messages: DataFrame, clientChannels: DataFrame): DataFrame =
    messages.join(broadcast(clientChannels), Seq("channel"))

  /** Delivery gate (O41): only deliver to (channel, cid) pairs still in
    * the membership map — a left-semi join, no row multiplication. */
  def deliveryGate(deliveries: DataFrame, clientChannels: DataFrame): DataFrame =
    deliveries.join(
      broadcast(clientChannels.select("channel", "cid")),
      Seq("channel", "cid"), "left_semi")

  /** Node fan-out with unknown-channel broadcast fallback
    * (`lib/ChannelHub.js:255-266`): a message on a channel with node
    * subscribers goes only to those sids (`b = false`); a message on a
    * channel unknown to the node map goes to ALL nodes with `b = true`.
    *
    * Truth table replicated from `:255-266` + return logic `:274-278`:
    * left join against node_channels; null sid => explode all nodes.
    */
  def nodeFanout(messages: DataFrame, nodeChannels: DataFrame, allNodes: DataFrame): DataFrame = {
    val known = messages
      .join(broadcast(nodeChannels), Seq("channel"))
      .withColumn("b", lit(false))
    val unknown = messages
      .join(broadcast(nodeChannels.select("channel")), Seq("channel"), "left_anti")
      .crossJoin(broadcast(allNodes))
      .withColumn("b", lit(true))
    known.unionByName(unknown)
  }

  /** Sender echo (`lib/ChannelHub.js:275-277`): after the fan-out, the
    * hub emits `channel.message` back to the SENDER — but only if the
    * sender is still subscribed to the channel at delivery time. Input
    * messages carry (channel, cid=sender); output is the echo set — a
    * broadcast left-semi membership probe, no row multiplication. */
  def senderEcho(messages: DataFrame, clientChannels: DataFrame): DataFrame =
    messages.join(
      broadcast(clientChannels.select("channel", "cid")),
      Seq("channel", "cid"), "left_semi")

  /** Self-exclusion of `Cluster.broadcast(event, data, excludeSelf)`
    * (`lib/QutyCluster.js:95-102`). */
  def excludeSelf(fanout: DataFrame, selfSid: String): DataFrame =
    fanout.filter(col("sid") =!= selfSid)

  /** Loop prevention (`lib/QutyCluster.js:600-616`): messages arriving
    * FROM another node are re-delivered with `{nodes:false,
    * broadcast:false}` — only the local client fan-out runs. Modeled as
    * a provenance predicate on an `origin` column. */
  def withProvenance(messages: DataFrame): (DataFrame, DataFrame) = {
    // null-safe split: a NULL origin fails BOTH === and =!= under
    // three-valued logic, so the naive pair of filters would silently
    // drop the row from both partitions — the two frames must
    // PARTITION the input (a NULL/unknown origin is a publisher:
    // only node-relayed frames carry the node marker)
    val isNode = coalesce(col("origin") === "node", lit(false))
    val nodeOriginated = messages.filter(isNode)
    val publisherOriginated = messages.filter(!isNode)
    (publisherOriginated, nodeOriginated)
  }
}
