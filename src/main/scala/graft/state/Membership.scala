package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Channel-membership state, the reference's only "tables"
  * (`lib/ChannelHub.js:28-29`: `nodeChannels {channel:[sid]}`,
  * `clientChannels {channel:[cid]}`), re-expressed as two DataFrames:
  *
  *   client_channels(channel STRING, cid BIGINT, sid STRING)
  *   node_channels(channel STRING, sid STRING)
  *
  * `sid` on client rows models the implicit node-subscribe that
  * `subscribeClient` performs (`lib/ChannelHub.js:143-154`: a client
  * subscribe always subscribes the owning node first).
  *
  * For oracle-differential testing the membership is DERIVED
  * deterministically from the `events` table (a user "subscribes" to an
  * event_type-channel once they have >= 15 events of that type — heavy
  * users only, giving a realistic subscriber density; the owning
  * node is `node-{cid % 4}`), so DuckDB can rebuild the exact same state
  * from the same parquet. The point-wise operations (O3-O13,
  * `lib/ChannelHub.js:60-238`) are pure transforms over these frames.
  */
object Membership {

  /** Minimum events of a type before a user counts as subscribed. */
  val SubscribeThreshold = 15

  /** Number of synthetic cluster nodes clients are sharded onto. */
  val NumNodes = 4

  /** client_channels derived from the events log.
    * SQL twin (keep in sync with [[MembershipSql.clientChannels]]):
    * group events by (event_type, user_id), HAVING count >= 15.
    */
  def clientChannels(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type").as("channel"), col("user_id").as("cid"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= SubscribeThreshold)
      .select(
        col("channel"),
        col("cid"),
        concat(lit("node-"), col("cid") % NumNodes).as("sid"))

  /** node_channels = distinct projection of client ownership — the
    * implicit node subscribe of `lib/ChannelHub.js:144`. */
  def nodeChannels(clientChannels: DataFrame): DataFrame =
    clientChannels.select("channel", "sid").distinct()

  /** All known cluster nodes (the `nodes` registry,
    * `lib/QutyCluster.js:49`). */
  def allNodes(clientChannels: DataFrame): DataFrame =
    clientChannels.select("sid").distinct()

  // ---- point-wise state transitions (O3-O13) as pure transforms ----

  /** O3 subscribeNode (`lib/ChannelHub.js:60-70`): idempotent add —
    * duplicate join is a no-op (`:65-69`). */
  def subscribeNode(nc: DataFrame, sid: String, channel: String): DataFrame = {
    val one = nc.sparkSession
      .createDataFrame(Seq((channel, sid)))
      .toDF("channel", "sid")
    nc.unionByName(one).dropDuplicates("channel", "sid")
  }

  /** O4 unsubscribeNode (`lib/ChannelHub.js:78-89`): remove one (sid,
    * channel) pair; empty channels disappear for free (no group row). */
  def unsubscribeNode(nc: DataFrame, sid: String, channel: String): DataFrame =
    // null-safe <=>: under three-valued logic !(a === x && ...) is
    // NULL for a NULL-keyed row and the filter would silently drop an
    // UNRELATED subscription instead of keeping it
    nc.filter(!(col("sid") <=> sid && col("channel") <=> channel))

  /** O5 isNodeSubscribed (`lib/ChannelHub.js:97-101`). */
  def isNodeSubscribed(nc: DataFrame, sid: String, channel: String): Boolean =
    !nc.filter(col("sid") === sid && col("channel") === channel).isEmpty

  /** O6 getNodeSubscriptions (`lib/ChannelHub.js:108-118`). */
  def nodeSubscriptions(nc: DataFrame, sid: String): DataFrame =
    nc.filter(col("sid") === sid).select("channel")

  /** O7 removeNode (`lib/ChannelHub.js:125-132`): drop sid everywhere. */
  def removeNode(nc: DataFrame, sid: String): DataFrame =
    nc.filter(!(col("sid") <=> sid)) // null-safe: keep NULL-sid rows

  /** O8 subscribeClient (`lib/ChannelHub.js:143-154`): add client row
    * (idempotent) — node row is implied by the sid column. A client
    * already subscribed under a DIFFERENT sid is deterministically
    * REASSIGNED to the new one (latest-wins, the reference's
    * `clients[cid] = socket` overwrite): anti-join the old row out,
    * then add — `dropDuplicates` on (channel, cid) would keep an
    * ARBITRARY survivor, flipping the sid between runs/partitionings. */
  def subscribeClient(cc: DataFrame, sid: String, cid: Long, channel: String): DataFrame = {
    val one = cc.sparkSession
      .createDataFrame(Seq((channel, cid, sid)))
      .toDF("channel", "cid", "sid")
    cc.join(broadcast(one.select("channel", "cid")),
        Seq("channel", "cid"), "left_anti")
      .unionByName(one)
  }

  /** O9 unsubscribeClient (`lib/ChannelHub.js:162-173`): remove the
    * client row. The cascade (channel with zero clients is torn down
    * from the NODE map too, `:168-172` -> `removeChannel` `:221-238`)
    * is [[cascadeEmptyChannels]]. */
  def unsubscribeClient(cc: DataFrame, cid: Long, channel: String): DataFrame =
    cc.filter(!(col("cid") <=> cid && col("channel") <=> channel))

  /** O10 isClientSubscribed (`lib/ChannelHub.js:181-185`). */
  def isClientSubscribed(cc: DataFrame, cid: Long, channel: String): Boolean =
    !cc.filter(col("cid") === cid && col("channel") === channel).isEmpty

  /** O11 removeClient (`lib/ChannelHub.js:192-199`): kick — drop cid
    * from every channel. */
  def removeClient(cc: DataFrame, cid: Long): DataFrame =
    cc.filter(!(col("cid") <=> cid)) // null-safe: keep NULL-cid rows

  /** O12 getClientSubscriptions (`lib/ChannelHub.js:206-216`). */
  def clientSubscriptions(cc: DataFrame, cid: Long): DataFrame =
    cc.filter(col("cid") === cid).select("channel")

  /** O13 removeChannel (`lib/ChannelHub.js:221-238`): tear a channel out
    * of both maps. Null-safe like its siblings (O4/O7/O9/O11): `=!=`
    * is NULL on a NULL-channel row and would silently drop UNRELATED
    * subscriptions instead of keeping them. */
  def removeChannel(nc: DataFrame, cc: DataFrame, channel: String): (DataFrame, DataFrame) =
    (nc.filter(!(col("channel") <=> channel)),
      cc.filter(!(col("channel") <=> channel)))

  /** The cascade of `unsubscribeClient` (`lib/ChannelHub.js:168-172`):
    * node subscriptions survive only for channels that still have at
    * least one client. Implemented as a left-semi join with a
    * NULL-SAFE key (a plain equi-join never matches NULL to NULL, so
    * a NULL-channel node row would be torn down even while NULL-channel
    * client rows survive — the opposite of the contract). No broadcast
    * hint: the distinct channel set is usually dictionary-small and AQE
    * broadcasts it on its own; hard-hinting would ABORT past Spark's
    * 8 GB/512M-row broadcast ceiling instead of falling back to a
    * shuffle join. */
  def cascadeEmptyChannels(nc: DataFrame, cc: DataFrame): DataFrame = {
    val live = cc.select(col("channel").as("live_channel")).distinct()
    nc.join(live, nc("channel") <=> live("live_channel"), "left_semi")
  }

  /** O14 `channels` getter (`lib/ChannelHub.js:33-51`): distinct union
    * of channel names across both maps — the one genuine set-op in the
    * reference. */
  def channels(nc: DataFrame, cc: DataFrame): DataFrame =
    nc.select("channel").union(cc.select("channel")).distinct()
}

/** SQL twins of the derived membership, spliced into oracle queries so
  * DuckDB rebuilds identical state from the same parquet. */
object MembershipSql {
  /** Must stay in lockstep with [[Membership.clientChannels]] — the
    * constants are INTERPOLATED from the same vals so a tuning change
    * cannot silently fork the twins. */
  val clientChannels: String =
    s"""SELECT event_type AS channel, user_id AS cid,
      |       'node-' || (user_id % ${Membership.NumNodes}) AS sid
      |FROM events GROUP BY event_type, user_id
      |HAVING COUNT(*) >= ${Membership.SubscribeThreshold}""".stripMargin

  // (The node_channels / all_nodes twins were dead code: every oracle
  // inlines SELECT DISTINCT over the cc CTE instead, so an unused
  // "canonical" spelling could silently rot outside the driver gate.)
}
