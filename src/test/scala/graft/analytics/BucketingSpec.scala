package graft.analytics


import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join (the 100 TB fact⋈fact answer, SURVEY §2.2
  * joins row): both sides bucketed on the join key join WITHOUT a
  * shuffle exchange — the physical plan proof that the partitioning
  * strategy holds.
  *
  * Conf hygiene: both tests need non-default SQLConf (broadcast off /
  * a different shuffle partition count), taken on a CLONED session
  * (`newSession()` — isolated SQLConf, shared context+catalog) so a
  * concurrently-planning suite never observes the toggle — the
  * MomentGuardSpec discipline; set-then-restore on the SHARED session
  * is the cross-suite race the round-12 ADVICE closed in PcaPowerSpec.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val orders = (1L to 1000L).map(k => (k, s"O$k")).toDF("o_orderkey", "o_tag")
    val lineitem = (1L to 1000L).flatMap(k => Seq((k, k * 2.0), (k, k * 3.0)))
      .toDF("l_orderkey", "l_val")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // disable broadcast so the join must pick sort-merge — the point is
    // that bucketing removes the Exchange, not that broadcast hides it
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = s2.table("b_lineitem")
        .join(s2.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // the runtime re-plan the engine leans on at scale: tiny shuffle
    // outputs collapse below the configured partition count instead of
    // scheduling near-empty reducers
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "64")
    val df = s2.range(1000).groupBy(expr("id % 7").as("k")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"expected a runtime-coalesced shuffle read in:\n$plan")
  }
}
