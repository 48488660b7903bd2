package graft.state

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Membership semantics replicated from `lib/ChannelHub.js`:
  * idempotent subscribe (`:65-69`), removal cascade (`:168-172` →
  * `:221-238`), distinct-union channels getter (`:33-51`).
  */
class MembershipSpec extends SparkSpec {
  import spark.implicits._

  private def nc(rows: (String, String)*): DataFrame =
    rows.toDF("channel", "sid")
  private def cc(rows: (String, Long, String)*): DataFrame =
    rows.toDF("channel", "cid", "sid")

  test("subscribeNode is idempotent (duplicate join is a no-op)") {
    val base = nc("news" -> "n1")
    val twice = Membership.subscribeNode(
      Membership.subscribeNode(base, "n1", "news"), "n1", "news")
    assert(twice.count() == 1)
  }

  test("unsubscribeNode removes exactly the one pair") {
    val base = nc("news" -> "n1", "news" -> "n2", "sport" -> "n1")
    val after = Membership.unsubscribeNode(base, "n1", "news")
    assert(after.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("news", "n2"), ("sport", "n1")))
  }

  test("removeNode drops the sid from every channel") {
    val base = nc("news" -> "n1", "sport" -> "n1", "news" -> "n2")
    assert(Membership.removeNode(base, "n1").count() == 1)
  }

  test("cascade: channels with zero clients lose their node rows") {
    val nodes = nc("news" -> "n1", "ghost" -> "n1")
    val clients = cc(("news", 1L, "n1"))
    val surviving = Membership.cascadeEmptyChannels(nodes, clients)
    assert(surviving.collect().map(_.getString(0)).toSeq == Seq("news"))
  }

  test("channels getter = distinct union of both maps") {
    val nodes = nc("news" -> "n1", "internal" -> "n1")
    val clients = cc(("news", 1L, "n1"), ("chat", 2L, "n1"))
    val all = Membership.channels(nodes, clients).collect().map(_.getString(0))
    assert(all.toSet == Set("news", "internal", "chat"))
    assert(all.length == 3) // distinct
  }

  test("unsubscribe/remove keep UNRELATED rows with NULL keys") {
    // !(a === x && b === y) is NULL for a NULL-keyed row under
    // three-valued logic — the pre-fix filters silently dropped a
    // subscription to a DIFFERENT (null) channel on every unsubscribe
    val withNull = Seq(("news", "n1"), (null, "n1"), ("sport", null))
      .toDF("channel", "sid")
    val after = Membership.unsubscribeNode(withNull, "n1", "news")
    assert(after.count() == 2, "null-keyed rows must survive unsubscribe")
    assert(Membership.removeNode(withNull, "n9").count() == 3)
    val ccNull = Seq(("news", 1L, "n1"), (null, 2L, "n1"))
      .toDF("channel", "cid", "sid")
    assert(Membership.unsubscribeClient(ccNull, 1L, "news").count() == 1)
    assert(Membership.removeClient(ccNull, 9L).count() == 2)
  }

  test("removeChannel keeps UNRELATED NULL-channel rows; cascade matches NULL to NULL") {
    // round-12 review: removeChannel used =!= (drops NULL-channel rows
    // from BOTH maps) and the cascade's equi-join never matched a
    // NULL-channel node row to its surviving NULL-channel clients
    val nodes = Seq(("news", "n1"), (null, "n3")).toDF("channel", "sid")
    val clients = Seq(("news", 1L, "n1"), (null, 7L, "n3"))
      .toDF("channel", "cid", "sid")
    val (nc2, cc2) = Membership.removeChannel(nodes, clients, "news")
    assert(nc2.count() == 1 && cc2.count() == 1,
      "NULL-channel subscriptions must survive removing a named channel")
    val surviving = Membership.cascadeEmptyChannels(nodes, clients)
    assert(surviving.count() == 2,
      "a NULL channel that still has a client keeps its node row")
    val gone = Membership.cascadeEmptyChannels(nodes,
      clients.filter("channel IS NOT NULL"))
    assert(gone.collect().map(_.getString(0)).toSeq == Seq("news"),
      "a NULL channel with no clients left is torn down")
  }

  test("subscribeClient reassigns an existing client deterministically (latest sid wins)") {
    val base = cc(("news", 5L, "node-1"))
    val after = Membership.subscribeClient(base, "node-2", 5L, "news")
    val rows = after.collect().map(r =>
      (r.getAs[String]("channel"), r.getAs[Long]("cid"),
        r.getAs[String]("sid")))
    assert(rows.toSeq == Seq(("news", 5L, "node-2")),
      "the NEW sid must win — dropDuplicates kept an arbitrary survivor")
    // idempotent when the sid is unchanged
    assert(Membership.subscribeClient(after, "node-2", 5L, "news")
      .count() == 1)
  }

  test("isClientSubscribed / isNodeSubscribed membership probes") {
    val clients = cc(("news", 1L, "n1"))
    assert(Membership.isClientSubscribed(clients, 1L, "news"))
    assert(!Membership.isClientSubscribed(clients, 2L, "news"))
    val nodes = nc("news" -> "n1")
    assert(Membership.isNodeSubscribed(nodes, "n1", "news"))
    assert(!Membership.isNodeSubscribed(nodes, "n1", "sport"))
  }
}
