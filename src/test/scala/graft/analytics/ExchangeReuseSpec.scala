package graft.analytics

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Pins the exchange-reuse property that makes the self-referencing
  * graph queries single-pass WITHOUT explicit caching: coSupplyEdges
  * consumes its pair-count aggregate twice (threshold broadcast +
  * main filter) and graph_common_neighbors consumes its distinct
  * (customer, part) projection three times (degrees, fan-cap, the
  * capped collect) — Catalyst dedupes the identical exchange subtrees
  * into ReusedExchange, so the expensive shuffle is produced once and
  * READ many times. A measured A/B confirmed an explicit .persist()
  * is strictly worse here (adds cache serialization and splits the
  * plan at the cache boundary): min 8.4 s vs 13.0 s for
  * graph_triangles at sf0.1. This spec fails if a refactor breaks the
  * subtree identity that reuse depends on.
  */
class ExchangeReuseSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // AQE off on a CLONED session (the MomentGuardSpec discipline — a
  // shared-session toggle races concurrently-planning suites): under
  // AQE, reuse happens at runtime as query-stage reuse on the same
  // canonicalized-exchange identity; the static ReuseExchange rule
  // (AQE off) checks the identical property deterministically at plan
  // time, so pin it that way.
  private def aqeOffSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }

  private def reusedCount(name: String): Int = {
    val plan = SparkEntry.queries(name)(aqeOffSession, sf)
      .queryExecution.executedPlan
    assert(!plan.isInstanceOf[AdaptiveSparkPlanExec])
    plan.collectWithSubqueries { case r: ReusedExchangeExec => r }.size
  }

  test("coSupplyEdges reuses the pair-count exchange (threshold + filter)") {
    // graph_triangles eagerly localCheckpoints the edge list, so the
    // reuse lives inside that materialization; probe the builder
    // directly (same plan the checkpoint executes)
    val plan = GraphQueries.coSupplyEdges(aqeOffSession, sf)
      .queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case r: ReusedExchangeExec => r }.nonEmpty)
  }

  test("graph_common_neighbors reuses the (customer, part) projection exchange") {
    assert(reusedCount("graph_common_neighbors") >= 1)
  }

  test("wedge/pair generation is a map-side explode, not a pair self-join") {
    // the capped combination-explode rewrites (coSupplyEdges,
    // graph_common_neighbors, graph_resource_alloc) must keep their
    // C(k,2) fan inside a Generate — a regression back to a k² join
    // shows up as the Generate disappearing from the plan
    for (q <- Seq("graph_degree_census", "graph_common_neighbors",
        "graph_resource_alloc")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"),
        s"$q lost its combination-explode wedge stage:\n$plan")
    }
  }
}
