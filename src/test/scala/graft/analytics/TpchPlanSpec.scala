package graft.analytics

import graft.SparkSpec

/** Plan-shape sweep over the full TPC-H suite: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin may appear ONLY in
  * the queries that deliberately cross-join a broadcast 1-row scalar
  * (Q11's total, Q15's max, Q22's average) — the executable form of
  * "every join in the relational suite is keyed or a bounded scalar
  * broadcast", the property that makes the suite survive a 100×
  * scale-up.
  */
class TpchPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val scalarBroadcast = Set("q11_part_value_concentration",
    "q15_top_supplier", "q22_dormant_customers")

  test("no cartesian products; nested-loop joins only for 1-row scalars") {
    val qs = (RelationalQueries.queries ++ TpchQueries.queries)
      .filter(_._1.matches("q\\d+_.*"))
    assert(qs.size === 22)
    for ((name, fn) <- qs) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!scalarBroadcast(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin but is not a " +
            "known 1-row-scalar cross join")
    }
  }
}
