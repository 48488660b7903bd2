package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Executable guards for the scale shape of the decomposed rank
  * queries: `window_ntile_orders` and `window_dist_ranks` must never
  * funnel the fact table through a single-partition Exchange or an
  * unpartitioned/low-cardinality window — their global ranks come
  * from a range-partitioned parallel sort + zipWithIndex instead
  * (correctness is separately pinned by the DuckDB ntile/percent_rank
  * oracle, so these assertions can't drift from the answers).
  *
  * The final user-facing `orderBy("o_orderkey")` is a RANGE exchange
  * (parallel), not a single partition — the assertions distinguish
  * the two. The sort feeding zipWithIndex lives in an upstream job
  * (RDD lineage), itself range-partitioned by Spark's orderBy.
  */
class WindowPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Executed plan with AQE off (it hides nodes behind QueryStageExec)
    * on a CLONED session — the MomentGuardSpec discipline: a
    * shared-session toggle races concurrently-planning shape-sensitive
    * suites. */
  private def executedPlan(name: String): SparkPlan = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = WindowQueries.queries(name)(s2, sf)
    df.collect()
    df.queryExecution.executedPlan
  }

  /** Shared across both shape tests (ADVICE r15: the check was
    * duplicated inline). */
  private def assertNoSinglePartitionExchange(plan: SparkPlan,
      name: String): Unit = {
    val singles = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singles.isEmpty,
      s"$name funnels through a single-partition Exchange:\n$plan")
  }

  private def assertScaleShape(name: String): Unit = {
    val plan = executedPlan(name)
    assertNoSinglePartitionExchange(plan, name)
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"$name still contains a window operator:\n$plan")
  }

  test("window_ntile_orders has no single-partition exchange and no window operator") {
    assertScaleShape("window_ntile_orders")
  }

  // window_dist_ranks was re-spelled in the r15 optimization round:
  // the global ranks now come from the agg_percentiles_disc two-level
  // VALUE-COUNT decomposition instead of zipWithIndex, so windows ARE
  // present again — but every one is either over the bucketed
  // value-count table (partitioned by (status, bucket) / by status
  // over BUCKET rows, both bounded by the price DOMAIN) or over exact
  // (status, price) tie groups (peer-group-sized). The scale property
  // to pin is therefore: no single-partition exchange, and no window
  // whose partition spec could funnel the raw fact table — i.e. no
  // UNPARTITIONED window, and no fact-table window partitioned by the
  // 3-value status alone.
  test("window_dist_ranks has no single-partition exchange and no " +
      "fact-table funnel window") {
    val plan = executedPlan("window_dist_ranks")
    assertNoSinglePartitionExchange(plan, "window_dist_ranks")
    val windows = plan.collect { case w: WindowExec => w }
    // no unpartitioned window anywhere => no single task over
    // everything
    assert(!windows.exists(_.partitionSpec.isEmpty),
      s"window_dist_ranks has an unpartitioned window:\n$plan")
    // POSITIVE pin (ADVICE r15: the old name-based *exclusion* went
    // vacuous under a rename instead of failing): exactly one window
    // runs over fact-table rows (they carry o_orderkey), and it is
    // partitioned by BOTH o_orderstatus and o_totalprice — the exact
    // tie group, never the 3-value status alone. A renamed or
    // re-derived column now breaks this test loudly.
    val factWindows = windows.filter(
      _.child.output.exists(_.name == "o_orderkey"))
    assert(factWindows.size == 1,
      s"expected exactly one fact-table window, got:\n$windows")
    val partNames = factWindows.head.partitionSpec
      .flatMap(_.references.toSeq).map(_.name).toSet
    assert(partNames == Set("o_orderstatus", "o_totalprice"),
      s"fact-table window must partition by (o_orderstatus, " +
        s"o_totalprice), got $partNames:\n${factWindows.head}")
    // every other window runs over the bucketed value-count table —
    // domain-bounded by construction — and says so by partitioning on
    // the price or bucket axis
    val vcWindows = windows.filterNot(factWindows.contains)
    assert(vcWindows.nonEmpty,
      s"expected value-count-table windows in the decomposition:\n$plan")
    vcWindows.foreach { w =>
      val partNs = w.partitionSpec.flatMap(_.references.toSeq)
        .map(_.name).toSet
      val childNs = w.child.output.map(_.name).toSet
      // either partitioned on the bucket/price axis (per-value pass)
      // or running over bucket-census rows (carry `b`, one row per
      // (status, bucket)) — both bounded by the price DOMAIN
      assert(partNs.contains("b") || partNs.contains("o_totalprice") ||
          childNs.contains("b"),
        s"window neither bucket-partitioned nor over the bucket " +
          s"census (partition=$partNs, child=$childNs):\n$w")
    }
  }

  test("decomposed quartiles equal the window-function spelling on sf0.001") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.Tables.orders(spark, sf).select(
      col("o_orderkey"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("pr"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = WindowQueries.queries("window_ntile_orders")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("decomposed dist ranks equal the window-function spelling on sf0.001") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wCd = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wDr = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"))
    val want = graft.Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderstatus"),
      cume_dist().over(wCd).as("cd"),
      dense_rank().over(wDr).cast("long").as("dr"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val got = WindowQueries.queries("window_dist_ranks")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }
}
