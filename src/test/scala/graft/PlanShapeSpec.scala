package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Surface-wide executable plan gate (VERDICT r6 item 7): no query on
  * the driver surface may plan a single-partition ShuffleExchange over
  * data that grows with the corpus. The TPC-H sweep (TpchPlanSpec)
  * pins cartesian/nested-loop shapes and WindowPlanSpec pins the two
  * decomposed rank queries; this spec closes the gap by sweeping EVERY
  * `SparkEntry.queries` entry, so a regression that funnels a
  * corpus-sized frame through one task fails CI instead of needing a
  * human to read plans.
  *
  * A single-partition exchange fed directly by a PARTIAL aggregate is
  * exempt by construction: map-side combine ran, so the exchange moves
  * one row per upstream partition (the global no-key aggregate
  * finalization every engine does) — bounded at any data volume.
  *
  * Queries in [[boundedSinglePartition]] are audited exceptions: each
  * one's single-partition stage runs over a frame bounded BY
  * CONSTRUCTION (a ≤ ~100-row checkpoint/bucket/source table, never
  * raw rows), documented at the query site. The allowlist is asserted
  * exact in both directions — an entry that stops planning a
  * single-partition exchange must be removed, so the list can't rot.
  */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Exchange moves ≤ one row per upstream partition: its input is a
    * partial (or partial-merge — the distinct-agg two-phase form)
    * aggregate, i.e. map-side combine already collapsed the data. */
  private def partialFed(e: ShuffleExchangeExec): Boolean = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan):
        org.apache.spark.sql.execution.SparkPlan = p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        unwrap(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
      case other => other
    }
    unwrap(e.child) match {
      case a: BaseAggregateExec => a.aggregateExpressions.nonEmpty &&
        a.aggregateExpressions.forall(ae =>
          ae.mode == Partial || ae.mode == PartialMerge)
      case _ => false
    }
  }

  private val boundedSinglePartition: Set[String] = Set(
    // cumulative window over ≤ ~Checkpoints (100) id-bucket rows —
    // bounded by MiningQueries.Checkpoints, never corpus size
    "text_heaps_law",
    // two-level prefix sum: global window only over the per-(source,
    // doc-id bucket) base table (~√N rows via ppsBucketWidth); the
    // doc-level cumsum is (source, bucket)-partitioned — round-12
    // wave 6 re-planned it off the per-SOURCE window whose partitions
    // were corpus-fraction-sized
    "text_pack_sequences",
    // lag over the already-aggregated month table — bounded by
    // calendar span, never data volume (WindowQueries.scala:106)
    "window_month_growth",
    // per-bucket CDF base offsets: global window over one row per
    // VALUE-RANGE bucket (~60 — bounded by the price domain divided
    // by the bucket width, never the row count; StatQueries KS doc)
    "stat_ks_segments",
    // running max over the per-DAY max table — bounded by calendar
    // span, never data volume (InsightQueries pareto doc)
    "agg_pareto_orders",
    // running sum over the per-DAY new-user table — calendar-bounded
    "behavior_cumulative_users",
    // quartile rank selection: global window only over each
    // dimension's bucket table (day span / order-count domain /
    // lifetime-spend domain ÷ bucket width — InsightQueries doc)
    "behavior_rfm_segments",
    // two-level prefix sum: global window only over the price-domain
    // bucket table (~price range / $10k), within-bucket cumulative is
    // bucket-partitioned (InsightQueries stat_mann_whitney doc)
    "stat_mann_whitney",
    // same two-level prefix sum over the cents-domain bucket table
    // (~domain/1000 rows; InsightQueries stat_auc_roc doc)
    "stat_auc_roc",
    // same two-level prefix sum over the cents-domain bucket table
    // (ProfileQueries stat_kruskal_wallis doc)
    "stat_kruskal_wallis",
    // same two-level prefix sum, shared with stat_kruskal_wallis
    // (ProfileQueries stat_dunn_test doc)
    "stat_dunn_test",
    // mid-rank windows over the per-DAY click/purchase total table —
    // calendar-bounded (InsightQueries stat_spearman_daily doc)
    "stat_spearman_daily",
    // centered 7-day moving sum over the DAY table — calendar-bounded
    // (InsightQueries ts_classical_decompose doc)
    "ts_classical_decompose",
    // rank window over the BootB (200) resample means — bounded by
    // the bootstrap constant, never data (stat_bootstrap_ci doc)
    "stat_bootstrap_ci",
    // lag windows over the DAY table — calendar-bounded
    // (InsightQueries stat_runs_test doc)
    "stat_runs_test",
    // prefix sum over the distinct-LOAD value-count table (≪ client
    // count — the mann_whitney discipline; RoutingQueries gini doc)
    "route_delivery_gini",
    // prefix sum over the distinct order-total value-count table
    // (ScaleQueries layout_equidepth_hist doc)
    "layout_equidepth_hist",
    // descending cumulative over the lifetime-count table — bounded
    // by the calendar span in days (BehaviorQueries survival doc)
    "behavior_lifetime_survival",
    // centered 7-day MA window over the DAY table — calendar-bounded
    // (InsightQueries ts_anomaly_residual doc, same frame as
    // ts_classical_decompose)
    "ts_anomaly_residual",
    // two-level prefix sum: global window only over the term-FREQUENCY
    // bucket table (distinct frequency values ÷ 1000 — a power-law
    // corpus has ≪ vocab distinct frequencies; TextQueries
    // text_vocab_coverage doc)
    "text_vocab_coverage",
    // two-level prefix sum: global window only over the doc-id BUCKET
    // base table (~√N rows — ppsBucketWidth derives the width from
    // the corpus; SampleQueries sample_pps_systematic doc)
    "sample_pps_systematic",
    // rolling moments over the joined DAY table — calendar-bounded,
    // never data-sized (ProfileQueries ts_rolling_correlation doc)
    "ts_rolling_correlation")
    // (window_trailing_distinct_users' calendar-bounded prefix sum
    // plans WITHOUT a fresh single-partition exchange — the 1-row
    // span aggregate already collapsed its input — so it needs no
    // allowlist entry; the sweep keeps watching it.)

  test("no single-partition shuffle outside the audited bounded set") {
    // AQE off (it hides nodes behind QueryStageExec) on a CLONED
    // session — the MomentGuardSpec discipline: a shared-session
    // toggle races concurrently-planning shape-sensitive suites
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val withSingles = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(s2, sf).queryExecution.executedPlan
        val singles = plan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.numPartitions == 1 &&
                !partialFed(e) => e
        }
        if (singles.nonEmpty) Some(name) else None
    }.toSet
    val offenders = withSingles -- boundedSinglePartition
    assert(offenders.isEmpty,
      s"unaudited single-partition exchanges in: ${offenders.toSeq.sorted}")
    val stale = boundedSinglePartition -- withSingles
    assert(stale.isEmpty,
      s"allowlisted but no longer single-partition (remove): ${stale.toSeq.sorted}")
  }
}
