package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable slice of the round-13 scaling-curve harness (VERDICT
  * r12 task 1): family representatives measured at sf0.01 → sf0.1
  * with [[ScalingCurve.rowVolumes]] (total operator output rows vs
  * scan rows — deterministic, so this spec carries no timing flake),
  * asserting the log-log growth exponent stays inside each family's
  * documented budget. A regression that re-introduces a quadratic
  * candidate stage (the class the full ladder caught in
  * srpPairs/sim_knn_graph, exponents 1.96–1.98 before their
  * hot-bucket caps) fails here on the next `sbt test`.
  *
  * The full four-scale ladder (plus the ×10 amplified clone) runs out
  * of band via `graft.ScalingCurve`; its round-13 exponent table is
  * in BENCH_NOTES.md. The SRP-capped families are excluded HERE
  * because their small-decade exponent is legitimately >1.5 while
  * the cap is not yet binding (the cap makes them asymptotically
  * CONSTANT — ShuffleVolumeSpec pins that worst case on clones);
  * route_client_fanout is included at its documented OUTPUT-BOUND
  * budget of 2 (deliveries = messages × subscribers/channel — the
  * reference's per-message subscriber loop emits the same rows).
  */
class ScalingCurveSpec extends AnyFunSuite {
  private val Lo = "/root/testdata/sf0.01"
  private val Hi = "/root/testdata/sf0.1"

  private case class Rep(name: String, budget: Double, note: String)

  // budgets = measured middle-decade exponent (BENCH_NOTES r13) + a
  // noise margin for partial-agg partitioning differences; "linear"
  // families measured 0.98–1.07
  private val Reps = Seq(
    Rep("q1_pricing_summary", 1.15, "scan-linear aggregate"),
    Rep("agg_two_stage_user_day", 1.15, "two-stage agg"),
    Rep("window_sessionize", 1.15, "keyed window"),
    Rep("dedup_exact_groups", 1.15, "hash-groupBy dedup"),
    Rep("text_tfidf_top_terms", 1.15, "explode → partial agg"),
    Rep("text_winnowing", 1.15, "rolling-hash fingerprints"),
    Rep("sample_pps_systematic", 1.15, "bucketed prefix axis"),
    Rep("member_client_channels", 1.15, "membership derivation"),
    Rep("asof_nearest_click", 1.15, "as-of join"),
    Rep("sketch_kmv_users", 1.15, "KMV sketch"),
    Rep("dedup_minhash_signatures", 1.15, "map-only signatures"),
    Rep("dedup_lsh_candidates", 1.25, "capped banded buckets"),
    Rep("dedup_ngram_jaccard_pairs", 1.25, "prefix-filtered join"),
    Rep("text_gopher_filter", 1.15, "per-row gates"),
    Rep("text_decontaminate", 1.30, "shingle join, hit-count output"),
    // iterative family: loop rounds execute at build time and are
    // captured by the measure() sub-execution listener (wave-2 fix) —
    // this rep pins that an added quadratic term INSIDE a round fails
    // the budget, the blind spot the r13 review found
    Rep("graph_kcore", 1.30, "peel-to-fixpoint; loop rounds counted"),
    Rep("route_client_fanout", 2.05,
      "OUTPUT-BOUND fan-out: msgs × subscribers/channel"),
    // r14: the bounded fuzzy twin must stay staged — a regression to
    // a match-census-sized DISTINCT shuffle measures ~1.9 here (the
    // census's exponent) and fails the budget
    Rep("dedup_fuzzy_names_topk", 1.15,
      "staged-escalation top-k; no census-sized distinct"),
  )

  test("family representatives hold their documented row-volume exponents (sf0.01 → sf0.1)", org.scalatest.tagobjects.Slow) {
    val spark = SparkSpec.session
    val failures = Reps.flatMap { rep =>
      val fn = SparkEntry.queries(rep.name)
      val (_, totLo, scanLo, _) = ScalingCurve.measure(spark, fn, Lo)
      val (_, totHi, scanHi, _) = ScalingCurve.measure(spark, fn, Hi)
      val e = ScalingCurve.lastPairSlope(
        Seq(scanLo, scanHi), Seq(totLo, totHi))
      if (e.isNaN)
        Some(s"${rep.name}: no signal (scan $scanLo -> $scanHi)")
      else if (e > rep.budget)
        Some(f"${rep.name}: exponent $e%.3f exceeds budget " +
          f"${rep.budget} (${rep.note}; vol $totLo -> $totHi, " +
          s"scan $scanLo -> $scanHi)")
      else None
    }
    assert(failures.isEmpty,
      s"${failures.size} families exceed their scaling budgets:\n" +
        failures.mkString("\n"))
  }

  test("exponent fitting: slopes recover known growth laws") {
    val xs = Seq(1000L, 10000L, 100000L)
    val lin = xs
    val quad = xs.map(x => x * x / 1000)
    assert(math.abs(ScalingCurve.logSlope(xs, lin) - 1.0) < 1e-9)
    assert(math.abs(ScalingCurve.logSlope(xs, quad) - 2.0) < 1e-9)
    assert(math.abs(ScalingCurve.lastPairSlope(xs, quad) - 2.0) < 1e-9)
    // no signal when x doesn't grow
    assert(ScalingCurve.lastPairSlope(Seq(5L, 5L), Seq(1L, 100L)).isNaN)
    // under-determined
    assert(ScalingCurve.logSlope(Seq(5L), Seq(1L)).isNaN)
  }
}
