package graft.route

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 12 removed the hard `broadcast()` hints from the routing
  * joins (a hint past Spark's 8 GB/512M-row ceiling ABORTS instead of
  * falling back to a shuffle join). The scale contract is two-sided
  * and this spec pins both directions:
  *   - while the membership side FITS, the executed plan still uses a
  *     broadcast join (AQE/threshold picks it without the hint — the
  *     event side does not shuffle for routing);
  *   - the choice is size-driven, so a session whose broadcast
  *     threshold is 0 (modeling a membership side too big to ship)
  *     plans the same join as a non-broadcast join instead of dying.
  */
class RouterPlanSpec extends SparkSpec {

  private def fixtures(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val msgs = (1L to 1000L).map(i => (i, s"ch${i % 5}"))
      .toDF("event_id", "channel")
    val members = (1L to 50L).map(i => (s"ch${i % 5}", i, s"node-${i % 4}"))
      .toDF("channel", "cid", "sid")
    (msgs, members)
  }

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    // AdaptiveSparkPlanExec is a LEAF for collect()-style traversal;
    // toString renders the final inner plan (house note)
    df.queryExecution.executedPlan.toString
  }

  test("small membership side still broadcasts without the hint") {
    val (msgs, members) = fixtures(spark)
    val plan = executedPlanString(Router.clientFanout(msgs, members))
    assert(plan.contains("BroadcastHashJoin"),
      s"membership side should broadcast while it fits:\n$plan")
    val gate = executedPlanString(Router.deliveryGate(
      msgs.withColumn("cid", col("event_id") % 50L), members))
    assert(gate.contains("BroadcastHashJoin"), "gate should broadcast too")
  }

  test("membership side too big to broadcast degrades to a shuffle join, not an abort") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (msgs, members) = fixtures(s2)
    val out = Router.clientFanout(msgs, members)
    val plan = executedPlanString(out)
    assert(!plan.contains("BroadcastHashJoin"),
      s"with broadcasting off the join must re-plan, not hint-force:\n$plan")
    assert(out.count() == Router.clientFanout(msgs, members).count())
  }
}
