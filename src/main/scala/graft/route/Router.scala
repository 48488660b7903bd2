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
  *
  * Broadcast stance (revised, round 12): the membership side is small
  * relative to the event stream but NOT schema-bounded — it grows with
  * users × channels, and a hard `broadcast()` hint past Spark's
  * 8 GB / 512M-row broadcast ceiling ABORTS the job instead of falling
  * back to a shuffle join. The joins therefore carry NO hint: with
  * `spark.sql.autoBroadcastJoinThreshold` (and AQE's runtime
  * re-planning) Spark broadcasts the membership side whenever it
  * actually fits — the same plan as before at every tested sf — and
  * degrades to a sort-merge join instead of an abort when a 100 TB
  * deployment's membership outgrows the ceiling. The genuinely
  * schema-bounded side (`allNodes`, one row per cluster node) keeps
  * its explicit hint.
  */
object Router {

  /** Client fan-out (`lib/ChannelHub.js:267-273`): one delivery row per
    * (message, subscribed client). */
  def clientFanout(messages: DataFrame, clientChannels: DataFrame): DataFrame =
    messages.join(clientChannels, Seq("channel"))

  /** Delivery gate (O41): only deliver to (channel, cid) pairs still in
    * the membership map — a left-semi join, no row multiplication. */
  def deliveryGate(deliveries: DataFrame, clientChannels: DataFrame): DataFrame =
    deliveries.join(
      clientChannels.select("channel", "cid"),
      Seq("channel", "cid"), "left_semi")

  /** Node fan-out with unknown-channel broadcast fallback
    * (`lib/ChannelHub.js:255-266`): a message on a channel with node
    * subscribers goes only to those sids (`b = false`); a message on a
    * channel unknown to the node map goes to ALL nodes with `b = true`.
    *
    * Truth table replicated from `:255-266` + return logic `:274-278`:
    * left join against node_channels; null sid => explode all nodes.
    * node_channels is distinct (channel, sid) — bounded by channels ×
    * cluster size, a genuinely broadcastable domain — but carries no
    * hint either: AQE picks broadcast while it fits. `allNodes` is one
    * row per NODE (schema-bounded) and keeps the explicit hint. */
  def nodeFanout(messages: DataFrame, nodeChannels: DataFrame, allNodes: DataFrame): DataFrame = {
    val known = messages
      .join(nodeChannels, Seq("channel"))
      .withColumn("b", lit(false))
    val unknown = messages
      .join(nodeChannels.select("channel"), Seq("channel"), "left_anti")
      .crossJoin(broadcast(allNodes))
      .withColumn("b", lit(true))
    known.unionByName(unknown)
  }

  /** Sender echo (`lib/ChannelHub.js:275-277`): after the fan-out, the
    * hub emits `channel.message` back to the SENDER — but only if the
    * sender is still subscribed to the channel at delivery time. Input
    * messages carry (channel, cid=sender); output is the echo set.
    * Semantically IDENTICAL to [[deliveryGate]] (same membership probe,
    * different input role) — delegates so the two can never fork. */
  def senderEcho(messages: DataFrame, clientChannels: DataFrame): DataFrame =
    deliveryGate(messages, clientChannels)

  /** Self-exclusion of `Cluster.broadcast(event, data, excludeSelf)`
    * (`lib/QutyCluster.js:95-102`). Null-safe: `=!=` is NULL on a
    * NULL-sid fan-out row (e.g. a sid derived from a NULL user), which
    * would silently drop a delivery to a NON-self node — the same 3VL
    * trap [[withProvenance]] documents. */
  def excludeSelf(fanout: DataFrame, selfSid: String): DataFrame =
    fanout.filter(!(col("sid") <=> selfSid))

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
