package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Pins exchange reuse on the prefix-filter candidate self-join: the
  * capped prefix index ends in the posting-list window's shuffle
  * exchange, and both self-join sides reference that identical
  * subtree, so Catalyst produces the index ONCE (static ReuseExchange
  * here; stage reuse under AQE). This is what made the round-7 removal
  * of the index's persist + eager count() safe AND faster (warm
  * minima at sf0.1: dedup_ngram_jaccard_pairs 3.4 → 2.8 s,
  * dedup_components 7.0 → 4.6 s) — a refactor that breaks the subtree
  * identity would silently double the index build, so fail CI instead.
  */
class JaccardReuseSpec extends SparkSpec {

  test("prefix-filter self-join reuses the posting-index exchange") {
    // AQE off on a CLONED session (the MomentGuardSpec discipline —
    // a shared-session toggle races concurrently-planning suites)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = SparkEntry.queries("dedup_ngram_jaccard_pairs")(
      s2, "/root/testdata/sf0.001").queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case r: ReusedExchangeExec => r }.nonEmpty)
  }
}
