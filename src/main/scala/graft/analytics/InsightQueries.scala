package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Decision-support analytics: association mining, dominance (skyline),
  * rank tests, distribution distance, and link prediction — the
  * exploratory layer an analyst runs on top of the warehouse the rest
  * of the surface maintains.
  *
  * Determinism contract (same as [[StatQueries]]): every aggregate is
  * an INTEGER sum (counts, cents, ppb-quantized terms); the only float
  * ops are final per-row division/sqrt on those exact integers, which
  * are correctly rounded in IEEE-754 and therefore bit-identical in
  * Spark and DuckDB. Where a statistic's textbook form needs a float
  * SUM (Bhattacharyya affinity, resource allocation), each term is
  * quantized to integer parts-per-billion FIRST (floor of a
  * correctly-rounded double) and the ppb integers are summed — the
  * quantization is the query's defined semantics, so any aggregation
  * order and any engine agree. log() never appears: it is not
  * correctly rounded and differs across libm implementations, so
  * log-based measures (Adamic-Adar, KL/JS divergence) are replaced by
  * their log-free published counterparts (resource allocation — Zhou
  * et al., EPJ B 2009; Hellinger/Bhattacharyya distance).
  *
  * Integer headroom at 100 TB: cross products of group counts (c·d,
  * o²·10⁹) bound group sizes to ~10⁹ rows before BIGINT overflow —
  * past that the moments swap to DECIMAL(38,0) sums with the same plan
  * shape (see the StatQueries header for the same argument).
  */
object InsightQueries extends QuerySuite {

  /** Baskets larger than this are dropped before the pair self-join:
    * pair volume per basket is C(k,2), so the cap bounds the join
    * output at C(64,2)·baskets regardless of corpus size (the same
    * guard class as GraphQueries.MaxFanout). TPC-H-shaped orders have
    * ≤7 lines, so at any sf the cap drops nothing — it exists for the
    * 100 TB case where a malformed mega-basket would otherwise emit
    * a quadratic pair set. */
  private val MaxBasket = 64

  /** Pairs below this co-occurrence count are statistical noise for
    * lift estimation (a single shared order makes lift explode at
    * small item supports). Classic Apriori min-support pruning. */
  private val MinPairSupport = 3

  /** Deterministic result cap for ranked pair outputs. */
  private val TopPairs = 200

  /** Half-life of the recency decay (agg_decayed_revenue): revenue
    * halves every 30 days of age — one whole right-shift bucket. */
  val HalfLifeDays = 30L

  /** Decay-shift cap: cents fit 2^40, so any shift ≥ 40 yields exactly
    * 0 — capping there keeps 1<<k inside BIGINT for arbitrarily old
    * rows without changing any value. */
  val MaxDecayShift = 40L

  /** Bootstrap resample count and the 2.5% / 97.5% rank statistics of
    * the sorted resample means (1-based; ceil(0.025·B) and
    * B − ceil(0.025·B) + 1). */
  private[analytics] val BootB = 200L
  private[analytics] val BootLoRank = 5L
  private[analytics] val BootHiRank = 196L

  /** Sign-flip permutations for the paired permutation test. */
  private[analytics] val PermB = 200L

  private def dayCol(ts: Column): Column =
    floor(unix_timestamp(ts) / 86400L).cast("long")

  /** Thursday-anchored day-of-week (1970-01-01 was a Thursday):
    * (epoch_day + 4) % 7 → 0=Sunday, 6=Saturday. Same convention as
    * StatQueries/ProfileQueries. */
  private def weekendCol(ts: Column): Column = {
    val dow = (dayCol(ts) + 4L) % 7L
    dow === 0L || dow === 6L
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Market-basket association rules over order baskets (Agrawal &
    // Srikant, VLDB'94): which part pairs co-occur in the same order
    // more than their independent popularities predict (lift > 1)?
    // Scale shape: the basket self-join is keyed on the order id (both
    // sides co-partitioned by the SAME shuffle), per-basket pair count
    // is capped at C(MaxBasket,2), and min-support pruning keeps the
    // pair aggregate sparse. Item supports join back onto the
    // pair-count table (pair-count-sized, not lineitem-sized). Counts
    // are exact integers; lift/confidence are single final divisions.
    "basket_pair_lift" -> ((s, d) => {
      // Pair generation by per-order combination explode (the
      // coSupplyEdges / graph_resource_alloc trick): ONE orderkey
      // shuffle builds the deduped, sorted basket (collect_set
      // replaces the old distinct + count + semi-join chain), the
      // C(k,2) fan-out streams map-side inside the ≤ MaxBasket cap
      // with part_a < part_b by construction (sorted array), and
      // supports, basket count and pair counts all flow into
      // map-side-combined aggregates — no k²-row self-join, no
      // second pass over lineitem (guide §2.3/§2.4).
      // NULL handling pinned to the oracle: SQL's DISTINCT keeps a
      // NULL partkey as a basket member (it counts toward the
      // MaxBasket size and the order still counts toward n_orders)
      // while collect_set silently drops it — so the dropped NULL is
      // added back to the size check explicitly (the coSupplyEdges
      // NULL-fork lesson, resolved toward the oracle this time
      // because the oracle SQL has no IS NOT NULL gate).
      val baskets = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        // hash-spread on the order key (the coSupplyEdges note): one
        // exchange satisfying the groupBy, pinned wide so the set
        // build and the pair explode below run on every core
        .transform(graft.Spread.fanoutBy(_, col("o")))
        .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"),
          max(col("p").isNull).as("has_null"))
        .filter(size(col("ps")) + col("has_null").cast("int") <= MaxBasket)
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      val supp = baskets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("c"))
      val pairs = baskets.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |    y -> struct(x AS u, y AS v))))""".stripMargin)).as("pr"))
        .groupBy(col("pr.u").as("part_a"), col("pr.v").as("part_b"))
        .agg(count(lit(1)).as("pair_orders"))
        .filter(col("pair_orders") >= MinPairSupport)
      pairs
        .join(supp.select(col("p").as("part_a"), col("c").as("orders_a")),
          "part_a")
        .join(supp.select(col("p").as("part_b"), col("c").as("orders_b")),
          "part_b")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("pair_orders"),
          col("orders_a"), col("orders_b"),
          ((col("pair_orders") * col("n_orders")).cast("double") /
            (col("orders_a") * col("orders_b")).cast("double")).as("lift"),
          (col("pair_orders").cast("double") /
            col("orders_a").cast("double")).as("conf_ab"))
        .orderBy(desc("pair_orders"), col("part_a"), col("part_b"))
        .limit(TopPairs)
    }),

    // Skyline (pareto-front) orders: maximize (order date, total
    // price) — no other order is both newer and at-least-as-expensive
    // (strict somewhere). The BNL/NN skyline literature (Börzsönyi et
    // al., ICDE'01) is quadratic; in 2-D the front falls out of one
    // per-day max + one running max over the DAY table — day count
    // grows with calendar time, not data volume, so the single
    // ordered window is bounded (same argument as the hot-hour
    // broadcast in join_interval_overlap). Equal (day, price) points
    // all survive (no strict dominance between them).
    "agg_pareto_orders" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        dayCol(col("o_orderdate")).as("od"),
        cents(col("o_totalprice")).as("pc"))
      val daymax = o.groupBy("od").agg(max("pc").as("dmax"))
      val laterMax = max(col("dmax")).over(
        Window.orderBy(desc("od"))
          .rowsBetween(Window.unboundedPreceding, -1))
      val sky = daymax.withColumn("later", laterMax)
        .filter(col("later").isNull || col("dmax") > col("later"))
        .select(col("od").as("sod"), col("dmax"))
      o.join(broadcast(sky),
          col("od") === col("sod") && col("pc") === col("dmax"))
        .select(col("o_orderkey"), col("od"),
          (col("pc") / 100.0).as("price"))
        .orderBy("o_orderkey")
    }),

    // Recency-weighted (half-life-decayed) revenue per market segment —
    // the "what has this segment done for us LATELY" aggregate behind
    // churn and LTV dashboards, with the decay kept EXACT: weight
    // 2^-(age/[[HalfLifeDays]]) is a whole-bucket right-shift of the
    // integer cents (cents div 2^k — floor division both engines
    // replay bit-for-bit), so the decayed sum is an associative BIGINT
    // aggregate, not a float pow(). Shift capped at [[MaxDecayShift]]
    // (cents < 2^40, so deeper shifts are exactly 0 — the cap only
    // prevents 1<<k overflow on ancient rows). The decay anchor is the
    // corpus' max order second — ONE 1-row broadcast; ages never go
    // negative. Scale shape: orders⋈customer keyed join, one
    // segment-keyed aggregate; everything map-side-combines.
    "agg_decayed_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("osec"),
        cents(col("o_totalprice")).as("pc"))
      val anchor = o.agg(max("osec").as("amax"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      o.crossJoin(broadcast(anchor))
        .withColumn("k", least(
          expr(s"(amax - osec) div ${HalfLifeDays * 86400L}"),
          lit(MaxDecayShift)))
        .withColumn("dc",
          expr("pc div shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"))
        .join(seg, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          (sum("pc") / 100.0).as("revenue"),
          (sum("dc") / 100.0).as("decayed_revenue"))
        .orderBy("c_mktsegment")
    }),

    // Chi-square test of independence between customer market segment
    // and order priority, plus Cramér's V effect size. Exact-integer
    // algebra: chi2 = N·Σ o²/(rt·ct) − N, with each cell's term
    // quantized to ppb by integer division BEFORE the sum — the sum is
    // associative and engine-independent; the final N·T/10⁹ − N and
    // sqrt are single correctly-rounded float ops. Scale shape: one
    // fact-side aggregate to the (segment × priority) cell table
    // (≤ r·c rows), marginals derived FROM the cell table (no second
    // fact scan), everything after is broadcast-sized.
    "stat_chi_square" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("c_mktsegment").agg(sum("o").as("rt"))
      val ct = cells.groupBy("o_orderpriority").agg(sum("o").as("ct"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct("c_mktsegment").as("r"),
        countDistinct("o_orderpriority").as("c"))
      val t = cells.join(broadcast(rt), "c_mktsegment")
        .join(broadcast(ct), "o_orderpriority")
        .select(expr("o * o * 1000000000L div (rt * ct)").as("t_ppb"),
          col("o"))
        .agg(sum("t_ppb").as("t_sum"), max("o").as("mo"))
      // loud headroom guard (Exact.momentGuard): the per-cell term
      // o²·10⁹ wraps once a cell holds ~9.6·10⁴ orders — four orders
      // of magnitude below the row counts a 100 TB run carries — and
      // the final n·t_sum long product is bounded by n·r·c·10⁹
      // (each t_ppb ≤ 10⁹ since o ≤ min(rt, ct)). Both bounds from
      // wrap-proof count/max aggregates, in DOUBLE.
      val chiBound = greatest(
        col("mo").cast("double") * col("mo").cast("double") * lit(1.0e9),
        col("n").cast("double") *
          (col("r") * col("c")).cast("double") * lit(1.0e9))
      t.crossJoin(broadcast(tot))
        .select(col("n"),
          ((col("r") - 1L) * (col("c") - 1L)).as("df"),
          Exact.momentGuard(s, "stat_chi_square",
            "max(max_cell^2*1e9, n*r*c*1e9)", chiBound)(
            (col("n") * col("t_sum")).cast("double") / 1.0e9 -
              col("n").cast("double")).as("chi2"),
          least(col("r") - 1L, col("c") - 1L).as("k"))
        .select(col("n"), col("df"), col("chi2"),
          // a 1-row or 1-column table (k = least(r−1, c−1) = 0) makes
          // Cramér's V undefined: ANSI abort in Spark, NaN in DuckDB
          // — NULL in both twins (the sigma = 0 convention)
          when(col("n") * col("k") === 0L, lit(null).cast("double"))
            .otherwise(
              sqrt(col("chi2") / (col("n") * col("k")).cast("double")))
            .as("cramers_v"))
    }),

    // Mann-Whitney U rank-sum test: do BUILDING-segment orders run
    // systematically larger than MACHINERY-segment orders? Mid-rank
    // tie handling and the tie-corrected normal approximation, all in
    // exact integer algebra on the VALUE-COUNT table (doubled ranks
    // keep .5 mid-ranks integral): 2U_A = Σ nA_v·(2·cum_v + t_v + 1)
    // − nA·(nA+1) … wait, minus nA(nA+1) — see oracle twin. The only
    // floats are the final z denominator's divisions and sqrt. Scale
    // shape: ranks come from a cumulative window over the DISTINCT
    // cents-value count table, never raw rows (same pattern as
    // stat_percentile_cont's rank selection).
    "stat_mann_whitney" -> ((s, d) => {
      val g = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(cents(col("o_totalprice")).as("v"),
          (col("c_mktsegment") === "BUILDING").as("isA"))
      val vc = g.groupBy("v").agg(
        sum(when(col("isA"), 1L).otherwise(0L)).as("na_v"),
        count(lit(1)).as("t_v"))
      // Two-level prefix sum: the only GLOBAL window runs over the
      // price-domain bucket table (~price range / $10k — bounded by
      // the business domain, never the row count); the within-bucket
      // cumulative is partitioned by bucket and parallelizes.
      val bk = vc.withColumn("bk", expr("v div 1000000L"))
      val base = bk.groupBy("bk").agg(sum("t_v").as("bt"))
        .withColumn("base",
          coalesce(sum("bt").over(Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base")
      val cum = bk.join(broadcast(base), "bk")
        .withColumn("within",
          coalesce(sum("t_v").over(Window.partitionBy("bk").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("below", col("base") + col("within"))
      val agg0 = cum.agg(
        sum(col("na_v") * (col("below") * 2L + col("t_v") + 1L))
          .as("r2a"),
        sum("na_v").as("na"),
        sum("t_v").as("n"),
        sum(col("t_v") * col("t_v") * col("t_v") - col("t_v")).as("ts"),
        count(lit(1)).as("nd")) // distinct values: 1 => zero variance
      // degenerate-sample guard (the stat_auc_roc convention): one
      // empty group, n < 2, or an all-tied sample (nd = 1) zeroes the
      // z denominator, where the engines DISAGREE on x/0.0 (Spark
      // non-ANSI divide NULL, DuckDB +-inf) - both twins emit NULL
      agg0.select(col("na"), (col("n") - col("na")).as("nb"), col("n"),
          (col("r2a") - col("na") * (col("na") + 1L)).as("u2a"),
          col("ts"), col("nd"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          (col("u2a").cast("double") / 2.0).as("u_a"),
          when(col("na") * col("nb") === 0L || col("n") < 2L ||
              col("nd") === 1L, lit(null).cast("double"))
            .otherwise((col("u2a") - col("na") * col("nb")).cast("double") /
              (lit(2.0) * sqrt(
                (col("na") * col("nb")).cast("double") / 12.0 *
                  ((col("n") + 1L).cast("double") -
                    col("ts").cast("double") /
                      (col("n") * (col("n") - 1L)).cast("double")))))
            .as("z"))
    }),

    // ROC AUC of event value as a score for the 'purchase' class —
    // the ranking-quality scalar every trained quality filter
    // reports, computed WITHOUT materializing the curve: AUC is the
    // tie-corrected rank statistic U/(n⁺·n⁻) (Hanley & McNeil,
    // Radiology 1982). With DOUBLED midranks over the value-count
    // table, AUC = (R2⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) — exact integers up
    // to the single final division, plus the Gini coefficient
    // 2·AUC−1. Scale shape: identical to stat_mann_whitney — one
    // fact aggregate to the value-count table, the two-level
    // value-DOMAIN prefix sum (outer window over ~domain/1000
    // buckets, within-bucket cumulative partitioned), one global
    // reduce. Integer headroom: R2⁺ ≤ 2n⁺N < 2⁶³ to ~10⁹ rows.
    "stat_auc_roc" -> ((s, d) => {
      // a NULL value has no rank: Spark's NULL cents group is dropped
      // by the bucket equi-join while DuckDB ranks it NULLS LAST —
      // exclude in BOTH twins (the stat_percentile_cont convention)
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(cents(col("value")).as("v"),
          (col("event_type") === "purchase").as("pos"))
      val vc = ev.groupBy("v").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("np_v"),
        count(lit(1)).as("t_v"))
      val bk = vc.withColumn("bk", expr("v div 1000L"))
      val base = bk.groupBy("bk").agg(sum("t_v").as("bt"))
        .withColumn("base",
          coalesce(sum("bt").over(Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base")
      val cum = bk.join(broadcast(base), "bk")
        .withColumn("within",
          coalesce(sum("t_v").over(Window.partitionBy("bk").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("below", col("base") + col("within"))
      val agg0 = cum.agg(
        sum(col("np_v") * (col("below") * 2L + col("t_v") + 1L))
          .as("r2p"),
        sum("np_v").as("np"), sum("t_v").as("n"))
      val a = agg0.select(col("np").as("n_pos"),
        (col("n") - col("np")).as("n_neg"),
        when(col("np") === 0L || col("n") === col("np"),
          lit(null).cast("double"))
          .otherwise((col("r2p") - col("np") * (col("np") + 1L))
            .cast("double") /
            (lit(2.0) * (col("np") * (col("n") - col("np")))
              .cast("double"))).as("auc"))
      a.select(col("n_pos"), col("n_neg"), col("auc"),
        (col("auc") * 2.0 - 1.0).as("gini"))
    }),

    // Hellinger distance between the weekday and weekend event-type
    // mixes — "did the traffic composition shift?" in a bounded [0,1]
    // metric. The Bhattacharyya affinity Σ√(p·q) is a float sum, so
    // each term is ppb-quantized first (floor(√(c·d / (N1·N2))·10⁹) —
    // every op correctly rounded, then exact integer sum); the
    // distance is √(1 − B) on the exact ppb total. One fact-side
    // aggregate to the per-type 2-column count table; everything
    // after is type-count-sized.
    "stat_hellinger_segments" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        weekendCol(col("ts")).as("wkend"))
      val m = ev.groupBy("event_type").agg(
        sum(when(!col("wkend"), 1L).otherwise(0L)).as("c"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("e"))
      val tot = m.agg(sum("c").as("n1"), sum("e").as("n2"))
      // nullif: one distribution empty (n1 or n2 = 0 - a weekday- or
      // weekend-only corpus) is an ANSI x/0 abort otherwise; the NULL
      // terms NULL-propagate to NULL distance in both twins
      val terms = m.crossJoin(broadcast(tot))
        .select(floor(sqrt((col("c") * col("e")).cast("double") /
          expr("CAST(nullif(n1 * n2, 0) AS DOUBLE)")) * 1.0e9)
          .cast("long").as("b_ppb"))
      terms.agg(sum("b_ppb").as("b_sum"), count(lit(1)).as("n_types"))
        .select(col("n_types"),
          (col("b_sum").cast("double") / 1.0e9).as("bhattacharyya"),
          sqrt(lit(1.0) - col("b_sum").cast("double") / 1.0e9)
            .as("hellinger"))
    }),

    // Quantified-comparison shape (x > ALL correlated subquery):
    // orders strictly more expensive than EVERY AUTOMOBILE-segment
    // order of the same priority. The oracle spells the textbook
    // > ALL; the engine decorrelates it by hand into a per-priority
    // max aggregate left-joined back (null max ⇒ vacuous truth) —
    // the rewrite Catalyst itself applies to quantified predicates.
    // Comparison happens in exact cents (monotone in the raw money
    // column, so the two spellings agree row-for-row).
    "sql_quantified_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val autoMax = o
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(max(cents(col("o_totalprice"))).as("amax"))
      o.join(broadcast(autoMax), o("o_orderpriority") === autoMax("prio"),
          "left")
        .filter(col("amax").isNull || cents(col("o_totalprice")) > col("amax"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // RFM (recency / frequency / monetary) customer segmentation —
    // the classic CRM scoring grid. Each dimension is bucketed 1–4 by
    // EXACT quartile thresholds (value at rank ceil(q·n), rank-
    // selected from the value-count table — never a global ntile sort
    // over raw customers; the three threshold frames are 1-row
    // broadcasts and the scoring pass is map-side). Bucket rule:
    // 1 + (v>t1) + (v>t2) + (v>t3); recency inverts (recent = best).
    // Output is the segment grid with exact-integer user counts and
    // cents-exact average monetary value.
    "behavior_rfm_segments" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(dayCol(col("o_orderdate"))).as("lastd"),
          count(lit(1)).as("frq"),
          sum(cents(col("o_totalprice"))).as("mon"))
      val maxd = perCust.agg(max("lastd").as("maxd"),
        count(lit(1)).as("n_cust"))
      val rfm = perCust.crossJoin(broadcast(maxd))
        .select(col("o_custkey"), (col("maxd") - col("lastd")).as("rec"),
          col("frq"), col("mon"), col("n_cust"))
      // Exact quartile thresholds by rank selection with the same
      // two-level prefix sum as stat_mann_whitney: the global window
      // runs only over each dimension's BUCKET table (bounded by the
      // domain ÷ bucket width — days / order counts / lifetime spend,
      // none of which grow with the customer count), the within-bucket
      // cumulative is bucket-partitioned.
      def thresholds(dim: String, bucketW: Long): DataFrame = {
        val vc = rfm.groupBy(col(dim).as("v"))
          .agg(count(lit(1)).as("cnt"), first("n_cust").as("n"))
          .withColumn("bk", expr(s"v div ${bucketW}L"))
        val base = vc.groupBy("bk").agg(sum("cnt").as("bt"))
          .withColumn("base",
            coalesce(sum("bt").over(Window.orderBy("bk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("bk", "base")
        vc.join(broadcast(base), "bk")
          .withColumn("hi", col("base") +
            sum("cnt").over(Window.partitionBy("bk").orderBy("v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .agg(
            min(when(col("hi") >= expr("(n + 3) div 4"), col("v")))
              .as(s"${dim}_t1"),
            min(when(col("hi") >= expr("(n + 1) div 2"), col("v")))
              .as(s"${dim}_t2"),
            min(when(col("hi") >= expr("(3 * n + 3) div 4"), col("v")))
              .as(s"${dim}_t3"))
      }
      def bucket(dim: String): Column =
        lit(1L) + when(col(dim) > col(s"${dim}_t1"), 1L).otherwise(0L) +
          when(col(dim) > col(s"${dim}_t2"), 1L).otherwise(0L) +
          when(col(dim) > col(s"${dim}_t3"), 1L).otherwise(0L)
      rfm.crossJoin(broadcast(thresholds("rec", 32L)))
        .crossJoin(broadcast(thresholds("frq", 8L)))
        .crossJoin(broadcast(thresholds("mon", 10000000L)))
        .select((lit(5L) - bucket("rec")).as("score_r"),
          bucket("frq").as("score_f"), bucket("mon").as("score_m"),
          col("mon"))
        .groupBy("score_r", "score_f", "score_m")
        .agg(count(lit(1)).as("n_users"),
          (sum("mon").cast("double") / 100.0 /
            count(lit(1)).cast("double")).as("avg_monetary"))
        .orderBy("score_r", "score_f", "score_m")
    }),

    // Daily new vs cumulative distinct users — the growth-accounting
    // curve. Running COUNT(DISTINCT) is quadratic-state at scale; the
    // identity "cumulative distinct = cumulative sum of first-seen
    // counts" makes it one per-user min-day aggregate + one per-day
    // count + a running sum over the DAY table (calendar-bounded, same
    // argument as agg_pareto_orders' day window).
    "behavior_cumulative_users" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        dayCol(col("ts")).as("od"))
      val firstDay = ev.groupBy("user_id").agg(min("od").as("fd"))
      val newPerDay = firstDay.groupBy(col("fd").as("od"))
        .agg(count(lit(1)).as("new_users"))
      val days = ev.select("od").distinct()
      days.join(newPerDay, Seq("od"), "left")
        .select(col("od"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_users",
          sum("new_users").over(Window.orderBy("od")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("od")
    }),

    // Candidate-key / uniqueness profiling across the warehouse — the
    // data-quality sweep run before declaring join keys. One exact
    // count-distinct aggregate per profiled column (each a single
    // keyed shuffle); uniqueness is reported in exact integer ppm so
    // no float sum exists anywhere. is_key = exact distinct == rows.
    "dq_uniqueness_report" -> ((s, d) => {
      def prof(df: DataFrame, table: String, colName: String,
               cols: Seq[String]): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(cols.head, cols.tail: _*).as("n_distinct"))
          .select(lit(s"$table.$colName").as("column_name"),
            col("n_rows"), col("n_distinct"),
            // nullif: an empty table (n_rows = 0) is an ANSI
            // DIVIDE_BY_ZERO abort otherwise; NULL ppm in both twins
            expr("n_distinct * 1000000 div nullif(n_rows, 0)")
              .as("uniq_ppm"),
            (col("n_distinct") === col("n_rows")).as("is_key"))
      val specs: Seq[DataFrame] = Seq(
        prof(Tables.orders(s, d), "orders", "o_orderkey", Seq("o_orderkey")),
        prof(Tables.orders(s, d), "orders", "o_custkey", Seq("o_custkey")),
        prof(Tables.customer(s, d), "customer", "c_custkey", Seq("c_custkey")),
        prof(Tables.customer(s, d), "customer", "c_name", Seq("c_name")),
        prof(Tables.lineitem(s, d), "lineitem", "l_orderkey_l_linenumber",
          Seq("l_orderkey", "l_linenumber")),
        prof(Tables.events(s, d), "events", "event_id", Seq("event_id")),
        prof(Tables.events(s, d), "events", "user_id", Seq("user_id")),
        prof(Tables.documents(s, d), "documents", "doc_id", Seq("doc_id")),
        prof(Tables.part(s, d), "part", "p_name", Seq("p_name")))
      specs.reduce(_.unionByName(_)).orderBy("column_name")
    }),

    // Resource-allocation link prediction (Zhou, Lü & Zhang, EPJ B
    // 2009) on the customer–part bipartite graph: candidate customer
    // pairs scored by Σ 1/deg(shared part) — the log-free cousin of
    // Adamic-Adar that consistently matches or beats it in published
    // benchmarks, and here EXACT in integer ppb (10⁹ div deg — no
    // transcendental, no float sum). Same hub-cap candidate generation
    // as graph_common_neighbors: parts with fan > MaxFanout are
    // excluded (bounding wedge volume at C(MaxFanout,2) per part AND
    // truncating only tail terms, each < 10⁹/MaxFanout ppb).
    "graph_resource_alloc" -> ((s, d) => {
      val cs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          col("l_partkey").cast("long").as("sp"))
        .distinct()
      // wedge generation by per-part combination explode (the
      // coSupplyEdges trick — valid here because the fan CAP bounds
      // the collected list at MaxFanout): the fan-count pass gates
      // which parts may collect, the capped collect_list emits
      // C(k,2) ordered pairs map-side instead of the k² join rows
      // the self-join filtered after the fact. Measured warm minima
      // ~10 s → ~4 s at sf0.1 (same-window A/B).
      val fanOk = cs.groupBy("sp").agg(count(lit(1)).as("nf"))
        .filter(col("nf") <= GraphQueries.MaxFanout).select("sp")
      cs.join(fanOk, Seq("sp"), "left_semi")
        // hash-spread on the wedge center BEFORE the collect (the
        // coSupplyEdges note): one exchange, pinned wide against
        // byte-sized AQE coalescing, with the C(k,2) explode running
        // in the same wide stage
        .transform(graft.Spread.fanoutBy(_, col("sp")))
        .groupBy("sp").agg(sort_array(collect_list("c")).as("cc"))
        .select(expr("1000000000L div size(cc)").as("inv_ppb"),
          explode(expr(
            """flatten(transform(cc, (x, i) ->
              |  transform(slice(cc, i + 2, size(cc)),
              |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("cust_a"), col("p.b").as("cust_b"))
        .agg(count(lit(1)).as("n_common"), sum("inv_ppb").as("ra_ppb"))
        .filter(col("n_common") >= GraphQueries.MinCommon)
        .orderBy(desc("ra_ppb"), col("cust_a"), col("cust_b"))
        .limit(100)
    }),

    // Hour-of-day activity-profile cosine similarity between event
    // types — "do errors follow the click diurnal curve?". The 24-bin
    // count vectors make dot products and norms exact integers; the
    // cosine is the single final division over two correctly-rounded
    // sqrts. Profile table is (types × 24)-sized: the pair join is
    // trivially broadcast at any corpus size.
    "ts_profile_cosine" -> ((s, d) => {
      val prof = Tables.events(s, d)
        .select(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 3600L) % 24L).as("hr"))
        .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
      val norms = prof.groupBy("event_type")
        .agg(sum(col("c") * col("c")).as("nrm"))
      val dots = prof.select(col("hr"), col("event_type").as("type_a"),
          col("c").as("ca"))
        .join(prof.select(col("hr"), col("event_type").as("type_b"),
          col("c").as("cb")), Seq("hr"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(sum(col("ca") * col("cb")).as("dot"))
      dots
        .join(broadcast(norms.select(col("event_type").as("type_a"),
          col("nrm").as("na"))), "type_a")
        .join(broadcast(norms.select(col("event_type").as("type_b"),
          col("nrm").as("nb"))), "type_b")
        .select(col("type_a"), col("type_b"), col("dot"),
          (col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cosine"))
        .orderBy("type_a", "type_b")
    }),

    // Corpus-mixture similarity: Bhattacharyya affinity / Hellinger
    // distance between per-SOURCE unigram distributions — the "which
    // crawls duplicate each other's mix" matrix a pretraining-data
    // curator reads before setting mixture weights. Same ppb
    // quantization as stat_hellinger_segments, per source pair. Scale
    // shape: the corpus explodes to tokens ONCE; the term-count table
    // is keyed by term for the pair join (sources per term ≤ the
    // source count, so pair volume is #terms · C(sources,2) at worst
    // and the shuffle key is the term); totals are a source-count-
    // sized broadcast.
    "text_source_affinity" -> ((s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      val tot = tc.groupBy("source").agg(sum("c").as("n"))
      val pairs = tc.select(col("term"), col("source").as("src_a"),
          col("c").as("ca"))
        .join(tc.select(col("term"), col("source").as("src_b"),
          col("c").as("cb")), Seq("term"))
        .filter(col("src_a") < col("src_b"))
      pairs
        .join(broadcast(tot.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
        .join(broadcast(tot.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"),
          floor(sqrt((col("ca") * col("cb")).cast("double") /
            (col("na") * col("nb")).cast("double")) * 1.0e9)
            .cast("long").as("b_ppb"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_common_terms"), sum("b_ppb").as("b_sum"))
        .select(col("src_a"), col("src_b"), col("n_common_terms"),
          (col("b_sum").cast("double") / 1.0e9).as("bhattacharyya"),
          sqrt(lit(1.0) - col("b_sum").cast("double") / 1.0e9)
            .as("hellinger"))
        .orderBy("src_a", "src_b")
    }),

    // Holt's linear trend (double exponential smoothing, α=β=½) over
    // each event type's daily-total series — level + trend + one-step
    // forecast. The recursion is a SEQUENTIAL fold, so both engines
    // run the IDENTICAL ordered op sequence: Spark `aggregate` over
    // the sorted per-type day array, DuckDB `list_reduce` over the
    // same ordered list — same IEEE ops on same inputs, bit-identical
    // out (the ts_ewma_user pattern, extended to a struct
    // accumulator). α=β=½ keeps every smoothing multiply exact. The
    // collected array is day-count-sized (calendar-bounded, per the
    // pareto/day-window argument), grouped per type — never raw rows.
    // Q–Q deciles — the distribution-comparison table a Q–Q plot
    // renders: matching exact deciles of BUILDING vs MACHINERY order
    // totals side by side (the same segment pairing stat_mann_whitney
    // tests; this shows WHERE the distributions diverge, not just
    // whether). Rank selection over per-segment value counts (decile
    // k = smallest value with cum·10 ≥ k·n); the ×9 decile fan is a
    // constant grid over the value-count table.
    "stat_qq_deciles" -> ((s, d) => {
      val g = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("seg"),
          cents(col("o_totalprice")).as("v"))
      // two-level value-DOMAIN prefix sum (the stat_mann_whitney
      // shape): the naive per-seg cumulative window would funnel each
      // segment's whole distinct-cents table — tens of millions of
      // rows at 100 TB — through ONE task's sort; bucketing by
      // v div 1000 keeps every window partition bounded (within a
      // bucket) or domain/1000-sized (the bucket-base table)
      val vc = g.groupBy("seg", "v").agg(count(lit(1)).as("c"))
        .withColumn("bk", expr("v div 1000L"))
      val base = vc.groupBy("seg", "bk").agg(sum("c").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("seg").orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("seg", "bk", "base")
      val nSeg = vc.groupBy("seg").agg(sum("c").as("n"))
      val cum = vc.join(broadcast(base), Seq("seg", "bk"))
        .withColumn("cum", col("base") + sum("c").over(
          Window.partitionBy("seg", "bk").orderBy("v")))
        .join(broadcast(nSeg), "seg")
      val qs = cum
        .select(col("seg"), col("v"), col("cum"), col("n"),
          explode(sequence(lit(1L), lit(9L))).as("decile"))
        .filter(col("cum") * 10L >= col("decile") * col("n"))
        .groupBy("seg", "decile").agg(min("v").as("q"))
      qs.filter(col("seg") === "BUILDING")
        .select(col("decile"), (col("q") / 100.0).as("q_building"))
        .join(qs.filter(col("seg") === "MACHINERY")
          .select(col("decile"), (col("q") / 100.0).as("q_machinery")),
          "decile")
        .orderBy("decile")
    }),

    // Per-category boxplot (Tukey): exact quartiles by rank selection
    // over the (type, price)-count table plus the 1.5·IQR outlier
    // census — fences kept in DOUBLED cents (2v ≶ 2q₁−3·IQR …) so the
    // half-cent 1.5× never touches floats. The quartile windows
    // partition by p_type over distinct cent values; the outlier pass
    // re-joins the broadcast per-type quartile table map-side.
    "stat_boxplot_types" -> ((s, d) => {
      val pv = Tables.part(s, d)
        .select(col("p_type"), cents(col("p_retailprice")).as("v"))
      val vc = pv.groupBy("p_type", "v").agg(count(lit(1)).as("c"))
      val cum = vc.withColumn("cum", sum("c").over(
          Window.partitionBy("p_type").orderBy("v")))
        .withColumn("n", sum("c").over(Window.partitionBy("p_type")))
      val qs = cum.groupBy("p_type").agg(
        max("n").as("n"),
        min(when(col("cum") * 4L >= col("n"), col("v"))).as("q1"),
        min(when(col("cum") * 2L >= col("n"), col("v"))).as("med"),
        min(when(col("cum") * 4L >= col("n") * 3L, col("v"))).as("q3"))
      vc.join(broadcast(qs), "p_type")
        .groupBy(col("p_type"), col("n"), col("q1"), col("med"), col("q3"))
        .agg(sum(when(
          col("v") * 2L < col("q1") * 2L - (col("q3") - col("q1")) * 3L ||
          col("v") * 2L > col("q3") * 2L + (col("q3") - col("q1")) * 3L,
          col("c")).otherwise(0L)).as("n_outliers"))
        .select(col("p_type"), col("n"),
          (col("q1") / 100.0).as("q1"), (col("med") / 100.0).as("median"),
          (col("q3") / 100.0).as("q3"), col("n_outliers"))
        .orderBy("p_type")
    }),

    // Value heatmap — exact p50/p95 per (event type × hour-of-day),
    // the SLA/ops grid a monitoring dashboard renders. Rank selection
    // over the (type, hour, value)-count table: the quantile windows
    // partition by (type, hour) and run over DISTINCT cent values —
    // never raw events, never unpartitioned. Quantile convention:
    // smallest value whose cumulative count reaches ⌈n·q⌉ (integer
    // cum·k ≥ n·j compares).
    "ts_value_heatmap" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 3600L) % 24L).as("hr"),
          cents(col("value")).as("xc"))
      val vc = ev.groupBy("event_type", "hr", "xc")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type", "hr").orderBy("xc")
      val cum = vc.withColumn("cum", sum("c").over(w))
        .withColumn("n", sum("c").over(
          Window.partitionBy("event_type", "hr")))
      cum.groupBy("event_type", "hr").agg(
          max("n").as("n_events"),
          min(when(col("cum") * 2L >= col("n"), col("xc"))).as("p50_c"),
          min(when(col("cum") * 20L >= col("n") * 19L, col("xc")))
            .as("p95_c"))
        .select(col("event_type"), col("hr"), col("n_events"),
          (col("p50_c") / 100.0).as("p50"),
          (col("p95_c") / 100.0).as("p95"))
        .orderBy("event_type", "hr")
    }),

    // Wald–Wolfowitz runs test on the daily total's up/down moves —
    // "is the series a random walk or does it trend/mean-revert?"
    // (too few runs ⇒ trending, too many ⇒ oscillating). The runs
    // count, n_up and n_down are exact integers from lag compares
    // (ties count as down — a fixed deterministic convention shared
    // with the oracle); the z statistic's float tree — one division
    // for μ, one for σ², one sqrt, one final division — is written
    // identically on both sides. All windows run over the DAY table.
    "stat_runs_test" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val w = Window.orderBy("od")
      val sgn = daily.withColumn("prev", lag("yc", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("up", (col("yc") > col("prev")).cast("long"))
      val runs = sgn.withColumn("pu", lag("up", 1).over(w))
        .withColumn("chg",
          when(col("pu").isNull || col("up") =!= col("pu"), 1L)
            .otherwise(0L))
      runs.agg(count(lit(1)).as("n"), sum("up").as("n_up"),
          sum("chg").as("n_runs"))
        .select(col("n"), col("n_up"), (col("n") - col("n_up")).as("n_down"),
          col("n_runs"),
          {
            val two = lit(2L) * col("n_up") * (col("n") - col("n_up"))
            val mu = two.cast("double") / col("n").cast("double") + lit(1.0)
            val va = (two * (two - col("n"))).cast("double") /
              (col("n") * col("n") * (col("n") - 1L)).cast("double")
            // degenerate-series guard (both twins): n < 2 zeroes the
            // variance denominator, and a monotone/constant series
            // (n_up = 0 or n) zeroes va itself - x/0.0 is where the
            // engines disagree (Spark NULL, DuckDB +-inf), so both
            // emit NULL. 2ab >= a+b for a,b >= 1, so va cannot go
            // negative on any non-degenerate series.
            when(col("n") < 2L || two === 0L || two === col("n"),
              lit(null).cast("double"))
              .otherwise((col("n_runs").cast("double") - mu) / sqrt(va))
              .as("z")
          })
    }),

    // Classical additive seasonal decomposition (the moving-average
    // method every textbook opens with): detrend the daily series
    // with a CENTERED 7-day moving sum, then average the detrended
    // residual by day-of-week — the weekly seasonal profile net of
    // trend, which the raw dow means (ts_seasonality_profile)
    // conflate with growth. Exactness: the MA stays a SUM (×7 instead
    // of /7 — detrended_x7 = 7·y − Σwindow, pure integers), only the
    // per-dow mean divides, once. Edge days without a full 7-day
    // window drop (both engines count the same ROWS frame). The only
    // unpartitioned window runs over the DAY table — calendar-bounded.
    "ts_classical_decompose" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val w = Window.orderBy("od").rowsBetween(-3, 3)
      daily
        .withColumn("wn", count(lit(1)).over(w))
        .withColumn("tsum", sum("yc").over(w))
        .filter(col("wn") === 7)
        .select(((col("od") + 4L) % 7L).as("dow"),
          (col("yc") * 7L - col("tsum")).as("det7"))
        .groupBy("dow").agg(
          count(lit(1)).as("n_days"),
          sum("det7").as("s7"))
        .select(col("dow"), col("n_days"),
          (col("s7").cast("double") /
            (col("n_days") * 700L).cast("double")).as("seasonal"))
        .orderBy("dow")
    }),

    // Detrended anomaly days — the detector the MA decomposition
    // exists to feed: detrend every day by its centered 7-day moving
    // average (integral ×7, the ts_classical_decompose discipline —
    // kills level drift and the slow season), then flag days whose
    // detrended value sits > 2σ from the detrended distribution. The
    // 2σ test is EXACT integer algebra — |z| > 2 ⇔
    // (n·x − s)² > 4·(n·q − s²) on the ×7-scaled integers, no float
    // σ ever computed; severity (z/2)² is ONE division of exact
    // integers (> 1 ⇔ flagged). Cohorting by day-of-week was
    // measured unusable here: with n-day cohorts max |z| = (n−1)/√n,
    // so a 4-row cohort can never reach 2σ — the global test is the
    // one that detects. dow rides along as context. Scale shape: the
    // fact table collapses to the day table first; the MA window and
    // the moment aggregate run over calendar-bounded frames.
    // Headroom: (n·x)² bounds the calendar to ~10⁴ days at 10⁸-cent
    // daily totals — DECIMAL(38,0) swap past that (StatQueries note).
    "ts_anomaly_residual" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val w = Window.orderBy("od").rowsBetween(-3, 3)
      val det = daily
        .withColumn("wn", count(lit(1)).over(w))
        .withColumn("tsum", sum("yc").over(w))
        .filter(col("wn") === 7)
        .select(col("od"), ((col("od") + 4L) % 7L).as("dow"),
          (col("yc") * 7L - col("tsum")).as("x"))
      val mom = det.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum(col("x") * col("x")).as("q"))
      det.crossJoin(broadcast(mom))
        .withColumn("ndev", col("n") * col("x") - col("sx"))
        .withColumn("thr2", lit(4L) * (col("n") * col("q")
          - col("sx") * col("sx")))
        .filter(col("ndev") * col("ndev") > col("thr2"))
        .select(col("od"), col("dow"), col("x").as("det7"),
          col("ndev"),
          // (z/3)² as ONE division of exact integers (> 1 ⇔ flagged);
          // integer ppm would need ndev²·10⁶ and overflow first
          when(col("thr2") === 0L, lit(null).cast("double"))
            .otherwise((col("ndev") * col("ndev")).cast("double") /
              col("thr2").cast("double")).as("severity"))
        .orderBy("od")
    }),

    // Bootstrap confidence interval for the mean DAILY revenue-event
    // total — the uncertainty band a metrics pipeline attaches to its
    // headline number. Classic multinomial day-resampling (Efron '79),
    // made engine-exact by DERIVING every draw from xxhash64: resample
    // b picks day pmod(xxhash64("b:j"), n) for j < n, so both engines
    // rebuild the identical [[BootB]] resamples (the XxhSql replay —
    // the same machinery that hash-checks the MinHash family). All
    // resample sums are integer cents; the CI bounds are rank
    // statistics ([[BootLoRank]]/[[BootHiRank]] of the sorted means)
    // with a single final division each. Scale shape: the grid is
    // B·n_days rows (calendar-bounded, NOT data-bounded), the pick
    // join keys on the day index, and the only windows run over the
    // n-day and B-row tables.
    "stat_bootstrap_ci" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val idx = daily.withColumn("i",
        (row_number().over(Window.orderBy("od")) - 1).cast("long"))
      val nn = idx.agg(count(lit(1)).as("n"),
        sum("yc").as("tot_c"))
      val picks = s.range(BootB).select(col("id").as("b"))
        .crossJoin(broadcast(nn))
        // n > 0 guard: on an empty series, sequence(0, -1) would step
        // BACKWARDS (Spark defaults step to -1 when start > stop) and
        // pmod(·, 0) would raise under ANSI — an empty day table must
        // yield an empty result, not a crash
        .filter(col("n") > 0L)
        .select(col("b"), col("n"), col("tot_c"),
          explode(expr("sequence(0L, n - 1)")).as("j"))
        .withColumn("di", pmod(xxhash64(
          concat(col("b").cast("string"), lit(":"),
            col("j").cast("string"))), col("n")))
      val means = picks
        .join(idx.select(col("i").as("di"), col("yc")), "di")
        .groupBy("b", "n", "tot_c").agg(sum("yc").as("syc"))
      means
        .withColumn("rk", row_number().over(
          Window.orderBy(col("syc"), col("b"))))
        .groupBy("n", "tot_c").agg(
          min(when(col("rk") === BootLoRank, col("syc"))).as("lo_c"),
          min(when(col("rk") === BootHiRank, col("syc"))).as("hi_c"))
        .select(col("n").as("n_days"), lit(BootB).as("n_boot"),
          (col("tot_c").cast("double") /
            (col("n") * 100L).cast("double")).as("mean_daily"),
          (col("lo_c").cast("double") /
            (col("n") * 100L).cast("double")).as("ci_lo"),
          (col("hi_c").cast("double") /
            (col("n") * 100L).cast("double")).as("ci_hi"))
    }),

    // Paired sign-flip permutation test (Fisher randomization) on the
    // daily click−view value difference: is the paired shift real, or
    // does a random ± relabeling of each day's difference produce a
    // |Σd| this large anyway? The distribution-free companion to
    // stat_welch_ttest — no normality, no variance model; beside
    // stat_bootstrap_ci it completes the resampling pair (CI there,
    // p-value here). Same determinism contract: every "random" sign
    // is pmod(xxhash64('perm:'||b||':'||od), 2) so the oracle rebuilds
    // the identical [[PermB]] relabelings; the statistic is an exact
    // integer |Σ ± cents|; p gets the standard +1 smoothing
    // ((1+#{T_b ≥ T_obs})/(B+1)) as one integer ppm division. Scale
    // shape: the fact table collapses to the calendar-bounded day
    // table FIRST; the B-way fan is a broadcast cross join off that
    // bounded table and re-aggregates by permutation id — raw events
    // shuffle once, everything else is |days|·B.
    "stat_permutation_test" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(dayCol(col("ts")).as("od"))
        .agg((sum(when(col("event_type") === "click", cents(col("value")))
            .otherwise(0L)) -
          sum(when(col("event_type") === "view", cents(col("value")))
            .otherwise(0L))).as("dc"))
      val obs = daily.agg(count(lit(1)).as("n"),
        abs(coalesce(sum("dc"), lit(0L))).as("t_obs"))
      val signed = daily.crossJoin(
          broadcast(s.range(PermB).select(col("id").as("b"))))
        .select(col("b"),
          (when(pmod(xxhash64(concat(lit("perm:"),
              col("b").cast("string"), lit(":"),
              col("od").cast("string"))), lit(2L)) === 0L, lit(1L))
            .otherwise(lit(-1L)) * col("dc")).as("sd"))
      val tb = signed.groupBy("b").agg(abs(sum("sd")).as("t_b"))
      tb.crossJoin(broadcast(obs))
        .agg(coalesce(min("n"), lit(0L)).as("n_days"),
          min("t_obs").as("t_obs_cents"),
          coalesce(sum(when(col("t_b") >= col("t_obs"), 1L)
            .otherwise(0L)), lit(0L)).as("n_ge"))
        .select(col("n_days"), col("t_obs_cents"), col("n_ge"),
          when(col("n_days") === 0L, lit(null).cast("long"))
            .otherwise(expr(s"(1 + n_ge) * 1000000 div ${PermB + 1}"))
            .as("p_ppm"))
    }),

    // MASE (Hyndman & Koehler '06) of the SEASONAL-naive forecast
    // (weekly period) against the plain-naive baseline, per event
    // type — the scale-free forecast-accuracy metric that makes
    // "does weekly seasonality help" comparable across types with
    // wildly different volumes. mase < 1 ⇒ y[t−7] beats y[t−1].
    // Exact arithmetic: daily totals in integer cents, both error
    // sums are integer |Δ| sums, and the final ratio cross-multiplies
    // the integer (sum, count) pairs so ONE double division decides
    // the metric. The lag windows run over the per-type DAY table
    // (bounded by calendar span), never raw events.
    // Moving-average crossover detection (the 7/28-day golden/death
    // cross of technical analysis, applied to per-type daily volume)
    // — "did the short-term level cross the long-term level, and
    // which way?" Exactness: the comparison is the cross-multiplied
    // integer sign s7·n28 − s28·n7 (no float means), a crossover is
    // a SIGN CHANGE vs the previous day (lag of the exact sign), and
    // only full 28-day windows participate. The reported means are
    // two final divisions. Scale shape: one fact aggregate to the
    // (type, day) table, then ROWS-frame windows partitioned per
    // type over the calendar-bounded daily table.
    "ts_sma_crossover" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val w = Window.partitionBy("event_type").orderBy("od")
      val w7 = w.rowsBetween(-6, 0)
      val w28 = w.rowsBetween(-27, 0)
      val x = col("s7") * col("n28") - col("s28") * col("n7")
      val sgn = when(x > 0L, 1L).when(x < 0L, -1L).otherwise(0L)
      daily
        .withColumn("s7", sum("yc").over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("s28", sum("yc").over(w28))
        .withColumn("n28", count(lit(1)).over(w28))
        .withColumn("sg", sgn)
        .withColumn("prev_sg", lag("sg", 1).over(w))
        .filter(col("n28") === 28L && col("prev_sg").isNotNull &&
          col("sg") =!= col("prev_sg") && col("sg") =!= 0L)
        .select(col("event_type"), col("od").as("day"),
          when(col("sg") > 0L, "golden").otherwise("death")
            .as("direction"),
          (col("s7").cast("double") / (col("n7") * 100L).cast("double"))
            .as("short_mean"),
          (col("s28").cast("double") / (col("n28") * 100L).cast("double"))
            .as("long_mean"))
        .orderBy("event_type", "day")
    }),

    "ts_mase_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val w = Window.partitionBy("event_type").orderBy("od")
      daily
        .withColumn("l1", lag("yc", 1).over(w))
        .withColumn("l7", lag("yc", 7).over(w))
        .groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum(when(col("l7").isNotNull, abs(col("yc") - col("l7")))
            .otherwise(0L)).as("sn_err_c"),
          sum(when(col("l7").isNotNull, 1L).otherwise(0L)).as("sn_n"),
          sum(when(col("l1").isNotNull, abs(col("yc") - col("l1")))
            .otherwise(0L)).as("nv_err_c"),
          sum(when(col("l1").isNotNull, 1L).otherwise(0L)).as("nv_n"))
        // a series shorter than the lags (n_days <= 7 zeroes sn_n,
        // n_days = 1 zeroes nv_n, a constant series zeroes nv_err) has
        // no defined error ratio: NULL in both twins, never ANSI x/0
        .select(col("event_type"), col("n_days"),
          when(col("sn_n") === 0L, lit(null).cast("double"))
            .otherwise(col("sn_err_c").cast("double") /
              (col("sn_n") * 100L).cast("double")).as("sn_mae"),
          when(col("nv_n") === 0L, lit(null).cast("double"))
            .otherwise(col("nv_err_c").cast("double") /
              (col("nv_n") * 100L).cast("double")).as("naive_mae"),
          when(col("sn_n") === 0L || col("nv_err_c") === 0L,
            lit(null).cast("double"))
            .otherwise((col("sn_err_c") * col("nv_n")).cast("double") /
              (col("sn_n") * col("nv_err_c")).cast("double")).as("mase"))
        .orderBy("event_type")
    }),

    "ts_holt_linear" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      daily.groupBy("event_type")
        .agg(expr("array_sort(collect_list(struct(od, yc)))").as("arr"))
        .select(col("event_type"),
          expr("CAST(size(arr) AS BIGINT)").as("n_days"),
          expr(
            """aggregate(
              |  slice(arr, 2, greatest(size(arr) - 1, 0)),
              |  named_struct(
              |    'l', CAST(arr[0].yc AS DOUBLE),
              |    'b', CAST(0.0 AS DOUBLE)),
              |  (acc, x) -> named_struct(
              |    'l', 0.5D * CAST(x.yc AS DOUBLE) + 0.5D * (acc.l + acc.b),
              |    'b', 0.5D * ((0.5D * CAST(x.yc AS DOUBLE)
              |           + 0.5D * (acc.l + acc.b)) - acc.l)
              |         + 0.5D * acc.b))""".stripMargin).as("st"))
        .select(col("event_type"), col("n_days"),
          (col("st.l") / 100.0).as("level"),
          (col("st.b") / 100.0).as("trend"),
          ((col("st.l") + col("st.b")) / 100.0).as("forecast"))
        .orderBy("event_type")
    }),

    // Holt–Winters additive (level + trend + 7-slot weekly season,
    // α=β=γ=0.5) over daily per-type totals — the seasonal upgrade of
    // ts_holt_linear for series where a naive trend forecast is
    // wrecked by day-of-week shape (which ts_classical_decompose
    // showed these series have). Same execution discipline as
    // holt_linear: daily totals in integer cents, one ordered
    // collect_list per type (bounded by calendar span), and ONE
    // deterministic left-fold whose float tree — built from a shared
    // generator so level/trend/season updates are literally the same
    // expression text everywhere — is replayed operation-for-
    // operation by the oracle's recursive CTE, so the doubles are
    // bit-identical. The seasonal state rides as 7 named struct
    // slots (s0..s6) selected by CASE on the fold index — no
    // per-step array rebuild. Seasonal slots initialize to 0 and
    // burn in over the first weeks (documented semantics, identical
    // in the twin).
    "ts_holt_winters" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), dayCol(col("ts")).as("od"))
        .agg(sum(cents(col("value"))).as("yc"))
      val sSlot = "CASE acc.i % 7 " +
        (0 to 6).map(k => s"WHEN $k THEN acc.s$k").mkString(" ") + " END"
      val y = "CAST(x.yc AS DOUBLE)"
      val lNew = s"0.5D * ($y - ($sSlot)) + 0.5D * (acc.l + acc.b)"
      val bNew = s"0.5D * (($lNew) - acc.l) + 0.5D * acc.b"
      val sUpd = (0 to 6).map(k =>
        s"'s$k', IF(acc.i % 7 = $k, " +
          s"0.5D * ($y - ($lNew)) + 0.5D * acc.s$k, acc.s$k)")
        .mkString(", ")
      val init = "named_struct('l', CAST(arr[0].yc AS DOUBLE), " +
        "'b', CAST(0.0 AS DOUBLE), " +
        (0 to 6).map(k => s"'s$k', CAST(0.0 AS DOUBLE)").mkString(", ") +
        ", 'i', 1)"
      // the fold ends with st.i = size(arr), so the NEXT day's slot
      // is st.i % 7
      val fcSlot = "CASE st.i % 7 " +
        (0 to 6).map(k => s"WHEN $k THEN st.s$k").mkString(" ") + " END"
      daily.groupBy("event_type")
        .agg(expr("array_sort(collect_list(struct(od, yc)))").as("arr"))
        .select(col("event_type"),
          expr("CAST(size(arr) AS BIGINT)").as("n_days"),
          expr(
            s"""aggregate(
               |  slice(arr, 2, greatest(size(arr) - 1, 0)),
               |  $init,
               |  (acc, x) -> named_struct('l', $lNew, 'b', $bNew,
               |    $sUpd, 'i', acc.i + 1))""".stripMargin).as("st"))
        .select(col("event_type"), col("n_days"),
          (col("st.l") / 100.0).as("level"),
          (col("st.b") / 100.0).as("trend"),
          expr(s"($fcSlot) / 100.0").as("season_next"),
          expr(s"(st.l + st.b + ($fcSlot)) / 100.0").as("forecast"))
        .orderBy("event_type")
    }),

    // Spearman rank correlation between the click and purchase daily
    // totals — the monotone-association check robust to the heavy
    // right tail that wrecks Pearson. Mid-ranks in DOUBLED integers
    // (2·minrank + t − 1), then the Pearson formula on those exact
    // integer ranks — cross-multiplied moments, one final sqrt/div
    // (the StatQueries integer-moments trick; ranks ≤ 2n keep n·Σr²
    // far inside BIGINT at any calendar span). Rank windows run over
    // the DAY table only.
    "stat_spearman_daily" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(
          sum(when(col("event_type") === "click", cents(col("value")))
            .otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", cents(col("value")))
            .otherwise(0L)).as("y"))
      def rank2(c: String): Column =
        lit(2L) * rank().over(Window.orderBy(col(c))) +
          count(lit(1)).over(Window.partitionBy(col(c))) - lit(1L)
      val ranked = daily.select(rank2("x").as("rx"), rank2("y").as("ry"))
      val m = ranked.agg(count(lit(1)).as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      // zero rank variance on either axis (an all-tied series — e.g.
      // zero purchase events on every day, or a single active day)
      // makes the denominator 0.0: under Spark 4's ANSI default even
      // DOUBLE x/0 ABORTS while DuckDB yields NaN — correlation is
      // undefined there, so NULL in both twins (the stat_corr_monthly
      // sigma = 0 convention)
      m.select(col("n").as("n_days"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0L ||
            col("n") * col("syy") - col("sy") * col("sy") === 0L,
          lit(null).cast("double"))
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                 .cast("double")))).as("spearman_rho"))
    }),

    // Kendall tau-b between the same daily series: exact concordant/
    // discordant counting over the C(n_days, 2) pair set of the DAY
    // table (the stat_theil_sen pair-set precedent — bounded by
    // calendar, never rows). Tie-adjusted denominator; everything
    // integer until the final sqrt product.
    "stat_kendall_daily" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(dayCol(col("ts")).as("od"))
        .agg(
          sum(when(col("event_type") === "click", cents(col("value")))
            .otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", cents(col("value")))
            .otherwise(0L)).as("y"))
      val a = daily.select(col("od").as("i"), col("x").as("xi"),
        col("y").as("yi"))
      val b = daily.select(col("od").as("j"), col("x").as("xj"),
        col("y").as("yj"))
      val pairs = a.join(b, col("i") < col("j"))
        .select(
          ((col("xi") - col("xj")) * (col("yi") - col("yj"))).as("prod"),
          (col("xi") === col("xj")).as("tx"),
          (col("yi") === col("yj")).as("ty"))
      val agg0 = pairs.agg(
        sum(when(col("prod") > 0L, 1L).otherwise(0L)).as("nc"),
        sum(when(col("prod") < 0L, 1L).otherwise(0L)).as("nd"),
        count(lit(1)).as("n0"),
        sum(when(col("tx"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("ty"), 1L).otherwise(0L)).as("n2"))
      // an all-tied axis (n1 = n0 or n2 = n0: e.g. one event type
      // absent every day) zeroes the tie-adjusted denominator — ANSI
      // abort in Spark, NaN in DuckDB; tau-b is undefined, so NULL in
      // both twins (the spearman/corr sigma = 0 convention)
      agg0.select(col("nc").as("n_concordant"), col("nd").as("n_discordant"),
        when(col("n0") === col("n1") || col("n0") === col("n2"),
          lit(null).cast("double"))
          .otherwise((col("nc") - col("nd")).cast("double") /
            (sqrt((col("n0") - col("n1")).cast("double")) *
              sqrt((col("n0") - col("n2")).cast("double"))))
          .as("kendall_tau_b"))
    }))

  def oracles: Map[String, String] = Map(
    "basket_pair_lift" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |ok AS (SELECT o FROM items GROUP BY o
         |       HAVING count(*) <= $MaxBasket),
         |it AS (SELECT items.o, items.p FROM items JOIN ok USING (o)),
         |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM it),
         |supp AS (SELECT p, CAST(count(*) AS BIGINT) AS c
         |         FROM it GROUP BY p),
         |pairs AS (
         |  SELECT a.p AS part_a, b.p AS part_b,
         |    CAST(count(*) AS BIGINT) AS pair_orders
         |  FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MinPairSupport)
         |SELECT part_a, part_b, pair_orders,
         |  sa.c AS orders_a, sb.c AS orders_b,
         |  CAST(pair_orders * n.n_orders AS DOUBLE) /
         |    CAST(sa.c * sb.c AS DOUBLE) AS lift,
         |  CAST(pair_orders AS DOUBLE) / CAST(sa.c AS DOUBLE) AS conf_ab
         |FROM pairs
         |JOIN supp sa ON pairs.part_a = sa.p
         |JOIN supp sb ON pairs.part_b = sb.p
         |CROSS JOIN n
         |ORDER BY pair_orders DESC, part_a, part_b
         |LIMIT $TopPairs""".stripMargin,

    "agg_pareto_orders" ->
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS od,
         |    ${centsSql("o_totalprice")} AS pc
         |  FROM orders),
         |d AS (SELECT od, max(pc) AS dmax FROM o GROUP BY od),
         |sky AS (
         |  SELECT od, dmax FROM d
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM d d2 WHERE d2.od > d.od AND d2.dmax >= d.dmax))
         |SELECT o.o_orderkey, o.od, o.pc / 100.0 AS price
         |FROM o JOIN sky ON o.od = sky.od AND o.pc = sky.dmax
         |ORDER BY o.o_orderkey""".stripMargin,

    "agg_decayed_revenue" ->
      s"""WITH o AS (
         |  SELECT o_custkey,
         |    CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec,
         |    ${centsSql("o_totalprice")} AS pc
         |  FROM orders),
         |anchor AS (SELECT max(osec) AS amax FROM o),
         |dec AS (
         |  SELECT o_custkey, pc,
         |    pc // (CAST(1 AS BIGINT) << CAST(least(
         |      (amax - osec) // ${HalfLifeDays * 86400L},
         |      $MaxDecayShift) AS INT)) AS dc
         |  FROM o CROSS JOIN anchor)
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(pc) AS BIGINT) / 100.0 AS revenue,
         |  CAST(sum(dc) AS BIGINT) / 100.0 AS decayed_revenue
         |FROM dec JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "stat_chi_square" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT c_mktsegment, CAST(sum(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |          CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS r,
        |          CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS c
        |        FROM cells),
        |t AS (SELECT CAST(sum(o * o * 1000000000 // (rt.rt * ct.ct))
        |               AS BIGINT) AS t_sum
        |      FROM cells
        |      JOIN rt ON cells.c_mktsegment = rt.c_mktsegment
        |      JOIN ct ON cells.o_orderpriority = ct.o_orderpriority),
        |pre AS (
        |  SELECT n, (r - 1) * (c - 1) AS df,
        |    CAST(n * t_sum AS DOUBLE) / 1.0e9 - CAST(n AS DOUBLE) AS chi2,
        |    least(r - 1, c - 1) AS k
        |  FROM t, tot)
        |SELECT n, df, chi2,
        |  CASE WHEN n * k = 0 THEN NULL
        |  ELSE sqrt(chi2 / CAST(n * k AS DOUBLE)) END AS cramers_v
        |FROM pre""".stripMargin,

    "stat_mann_whitney" ->
      s"""WITH g AS (
         |  SELECT ${centsSql("o_totalprice")} AS v,
         |    c_mktsegment = 'BUILDING' AS isA
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |vc AS (
         |  SELECT v,
         |    CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
         |    CAST(count(*) AS BIGINT) AS t_v
         |  FROM g GROUP BY v),
         |cum AS (
         |  SELECT *, CAST(coalesce(sum(t_v) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS below
         |  FROM vc),
         |m AS (
         |  SELECT CAST(sum(na_v * (below * 2 + t_v + 1)) AS BIGINT) AS r2a,
         |    CAST(sum(na_v) AS BIGINT) AS na,
         |    CAST(sum(t_v) AS BIGINT) AS n,
         |    CAST(sum(t_v * t_v * t_v - t_v) AS BIGINT) AS ts,
         |    CAST(count(*) AS BIGINT) AS nd
         |  FROM cum)
         |SELECT na AS n_a, n - na AS n_b,
         |  CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
         |  CASE WHEN na * (n - na) = 0 OR n < 2 OR nd = 1 THEN NULL
         |  ELSE CAST((r2a - na * (na + 1)) - na * (n - na) AS DOUBLE) /
         |    (2.0 * sqrt(CAST(na * (n - na) AS DOUBLE) / 12.0 *
         |      (CAST(n + 1 AS DOUBLE) -
         |        CAST(ts AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))))
         |  END AS z
         |FROM m""".stripMargin,

    "stat_auc_roc" ->
      s"""WITH ev AS (
         |  SELECT ${centsSql("\"value\"")} AS v,
         |    event_type = 'purchase' AS pos
         |  FROM events WHERE "value" IS NOT NULL),
         |vc AS (
         |  SELECT v,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np_v,
         |    CAST(count(*) AS BIGINT) AS t_v
         |  FROM ev GROUP BY v),
         |cum AS (
         |  SELECT *, CAST(coalesce(sum(t_v) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS below
         |  FROM vc),
         |m AS (
         |  SELECT CAST(sum(np_v * (below * 2 + t_v + 1)) AS BIGINT) AS r2p,
         |    CAST(sum(np_v) AS BIGINT) AS np,
         |    CAST(sum(t_v) AS BIGINT) AS n
         |  FROM cum),
         |a AS (
         |  SELECT np AS n_pos, n - np AS n_neg,
         |    CASE WHEN np = 0 OR n = np THEN NULL
         |         ELSE CAST(r2p - np * (np + 1) AS DOUBLE) /
         |              (2.0 * CAST(np * (n - np) AS DOUBLE)) END AS auc
         |  FROM m)
         |SELECT n_pos, n_neg, auc, auc * 2.0 - 1.0 AS gini
         |FROM a""".stripMargin,

    "stat_hellinger_segments" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
        |      IN (0, 6) AS wkend
        |  FROM events),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS BIGINT) AS e
        |  FROM ev GROUP BY event_type),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n1,
        |          CAST(sum(e) AS BIGINT) AS n2 FROM m),
        |terms AS (
        |  SELECT CAST(floor(sqrt(CAST(c * e AS DOUBLE) /
        |    CAST(nullif(n1 * n2, 0) AS DOUBLE)) * 1.0e9) AS BIGINT)
        |    AS b_ppb
        |  FROM m, tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(b_ppb) AS DOUBLE) / 1.0e9 AS bhattacharyya,
        |  sqrt(1.0 - CAST(sum(b_ppb) AS DOUBLE) / 1.0e9) AS hellinger
        |FROM terms""".stripMargin,

    "sql_quantified_all" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > ALL (
        |  SELECT o2.o_totalprice
        |  FROM orders o2 JOIN customer ON o2.o_custkey = c_custkey
        |  WHERE c_mktsegment = 'AUTOMOBILE'
        |    AND o2.o_orderpriority = o.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    "behavior_rfm_segments" -> {
      def thr(dim: String, p: String): String =
        s"""${p}vc AS (SELECT $dim AS v, CAST(count(*) AS BIGINT) AS cnt
           |  FROM rfm GROUP BY 1),
           |${p}hi AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |  AS hi FROM ${p}vc),
           |${p}t AS (SELECT
           |  min(CASE WHEN hi >= (n + 3) // 4 THEN v END) AS ${dim}_t1,
           |  min(CASE WHEN hi >= (n + 1) // 2 THEN v END) AS ${dim}_t2,
           |  min(CASE WHEN hi >= (3 * n + 3) // 4 THEN v END) AS ${dim}_t3
           |  FROM ${p}hi, tot)""".stripMargin
      s"""WITH pc AS (
         |  SELECT o_custkey,
         |    CAST(max(floor(epoch(o_orderdate) / 86400)) AS BIGINT)
         |      AS lastd,
         |    CAST(count(*) AS BIGINT) AS frq,
         |    CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS mon
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT max(lastd) AS maxd, CAST(count(*) AS BIGINT) AS n
         |        FROM pc),
         |rfm AS (SELECT o_custkey, tot.maxd - lastd AS rec, frq, mon
         |        FROM pc, tot),
         |${thr("rec", "r")},
         |${thr("frq", "f")},
         |${thr("mon", "m")},
         |scored AS (
         |  SELECT
         |    5 - (1 + CASE WHEN rec > rec_t1 THEN 1 ELSE 0 END
         |           + CASE WHEN rec > rec_t2 THEN 1 ELSE 0 END
         |           + CASE WHEN rec > rec_t3 THEN 1 ELSE 0 END) AS score_r,
         |    1 + CASE WHEN frq > frq_t1 THEN 1 ELSE 0 END
         |      + CASE WHEN frq > frq_t2 THEN 1 ELSE 0 END
         |      + CASE WHEN frq > frq_t3 THEN 1 ELSE 0 END AS score_f,
         |    1 + CASE WHEN mon > mon_t1 THEN 1 ELSE 0 END
         |      + CASE WHEN mon > mon_t2 THEN 1 ELSE 0 END
         |      + CASE WHEN mon > mon_t3 THEN 1 ELSE 0 END AS score_m,
         |    mon
         |  FROM rfm, rt, ft, mt)
         |SELECT CAST(score_r AS BIGINT) AS score_r,
         |  CAST(score_f AS BIGINT) AS score_f,
         |  CAST(score_m AS BIGINT) AS score_m,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(mon) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE)
         |    AS avg_monetary
         |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "behavior_cumulative_users" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od
        |  FROM events),
        |fd AS (SELECT user_id, min(od) AS fd FROM ev GROUP BY 1),
        |np AS (SELECT fd AS od, CAST(count(*) AS BIGINT) AS new_users
        |       FROM fd GROUP BY 1),
        |days AS (SELECT DISTINCT od FROM ev)
        |SELECT days.od,
        |  CAST(coalesce(np.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(np.new_users, 0)) OVER (ORDER BY days.od
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM days LEFT JOIN np USING (od)
        |ORDER BY days.od""".stripMargin,

    "dq_uniqueness_report" -> {
      def prof(table: String, label: String, distinctExpr: String): String =
        s"""SELECT '$table.$label' AS column_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT $distinctExpr) AS BIGINT) AS n_distinct,
           |  CAST(count(DISTINCT $distinctExpr) * 1000000
           |    // nullif(count(*), 0) AS BIGINT) AS uniq_ppm,
           |  count(DISTINCT $distinctExpr) = count(*) AS is_key
           |FROM $table""".stripMargin
      Seq(
        prof("orders", "o_orderkey", "o_orderkey"),
        prof("orders", "o_custkey", "o_custkey"),
        prof("customer", "c_custkey", "c_custkey"),
        prof("customer", "c_name", "c_name"),
        prof("lineitem", "l_orderkey_l_linenumber",
          "(l_orderkey, l_linenumber)"),
        prof("events", "event_id", "event_id"),
        prof("events", "user_id", "user_id"),
        prof("documents", "doc_id", "doc_id"),
        prof("part", "p_name", "p_name"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "graph_resource_alloc" ->
      s"""WITH cs AS (
         |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
         |    CAST(l_partkey AS BIGINT) AS sp
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |fan AS (SELECT sp, CAST(count(*) AS BIGINT) AS nf
         |        FROM cs GROUP BY sp
         |        HAVING count(*) <= ${GraphQueries.MaxFanout}),
         |capped AS (
         |  SELECT cs.sp, cs.c,
         |    CAST(1000000000 // nf AS BIGINT) AS inv_ppb
         |  FROM cs JOIN fan USING (sp)),
         |pairs AS (
         |  SELECT a.c AS cust_a, b.c AS cust_b,
         |    CAST(count(*) AS BIGINT) AS n_common,
         |    CAST(sum(a.inv_ppb) AS BIGINT) AS ra_ppb
         |  FROM capped a JOIN capped b ON a.sp = b.sp AND a.c < b.c
         |  GROUP BY 1, 2 HAVING count(*) >= ${GraphQueries.MinCommon})
         |SELECT cust_a, cust_b, n_common, ra_ppb
         |FROM pairs
         |ORDER BY ra_ppb DESC, cust_a, cust_b
         |LIMIT 100""".stripMargin,

    "ts_profile_cosine" ->
      """WITH prof AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |norms AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS nrm
        |          FROM prof GROUP BY 1),
        |dots AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |  FROM prof a JOIN prof b
        |    ON a.hr = b.hr AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, dot,
        |  CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
        |    AS cosine
        |FROM dots
        |JOIN norms na ON type_a = na.event_type
        |JOIN norms nb ON type_b = nb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    "text_source_affinity" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |        FROM tc GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(floor(sqrt(CAST(a.c * b.c AS DOUBLE) /
        |      CAST(ta.n * tb.n AS DOUBLE)) * 1.0e9) AS BIGINT) AS b_ppb
        |  FROM tc a JOIN tc b ON a.term = b.term AND a.source < b.source
        |  JOIN tot ta ON a.source = ta.source
        |  JOIN tot tb ON b.source = tb.source)
        |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_common_terms,
        |  CAST(sum(b_ppb) AS DOUBLE) / 1.0e9 AS bhattacharyya,
        |  sqrt(1.0 - CAST(sum(b_ppb) AS DOUBLE) / 1.0e9) AS hellinger
        |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // NOTE: the natural list_reduce spelling is unusable here —
    // DuckDB v1.0 aliases the struct accumulator buffer across lambda
    // applications, so a field expression that reads another field
    // (b reads l) sees the CURRENT step's already-written value from
    // the second application on. An explicit recursive CTE steps the
    // same recursion with correct old-value semantics.
    "stat_qq_deciles" ->
      s"""WITH g AS (
         |  SELECT c_mktsegment AS seg,
         |    ${centsSql("o_totalprice")} AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |vc AS (SELECT seg, v, CAST(count(*) AS BIGINT) AS c
         |       FROM g GROUP BY 1, 2),
         |cum AS (
         |  SELECT seg, v,
         |    sum(c) OVER (PARTITION BY seg ORDER BY v) AS cum,
         |    sum(c) OVER (PARTITION BY seg) AS n
         |  FROM vc),
         |dk AS (SELECT unnest(range(1, 10)) AS decile),
         |qs AS (
         |  SELECT seg, CAST(dk.decile AS BIGINT) AS decile,
         |    min(v) AS q
         |  FROM cum CROSS JOIN dk
         |  WHERE cum * 10 >= dk.decile * n
         |  GROUP BY seg, dk.decile)
         |SELECT b.decile, b.q / 100.0 AS q_building,
         |  m.q / 100.0 AS q_machinery
         |FROM qs b JOIN qs m ON b.decile = m.decile
         |WHERE b.seg = 'BUILDING' AND m.seg = 'MACHINERY'
         |ORDER BY b.decile""".stripMargin,

    "stat_boxplot_types" ->
      s"""WITH pv AS (
         |  SELECT p_type, ${centsSql("p_retailprice")} AS v FROM part),
         |vc AS (SELECT p_type, v, CAST(count(*) AS BIGINT) AS c
         |       FROM pv GROUP BY 1, 2),
         |cum AS (
         |  SELECT p_type, v, c,
         |    sum(c) OVER (PARTITION BY p_type ORDER BY v) AS cum,
         |    sum(c) OVER (PARTITION BY p_type) AS n
         |  FROM vc),
         |qs AS (
         |  SELECT p_type, CAST(max(n) AS BIGINT) AS n,
         |    min(CASE WHEN cum * 4 >= n THEN v END) AS q1,
         |    min(CASE WHEN cum * 2 >= n THEN v END) AS med,
         |    min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS q3
         |  FROM cum GROUP BY p_type)
         |SELECT vc.p_type, qs.n,
         |  qs.q1 / 100.0 AS q1, qs.med / 100.0 AS median,
         |  qs.q3 / 100.0 AS q3,
         |  CAST(sum(CASE WHEN vc.v * 2 < qs.q1 * 2 - (qs.q3 - qs.q1) * 3
         |             OR vc.v * 2 > qs.q3 * 2 + (qs.q3 - qs.q1) * 3
         |           THEN vc.c ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM vc JOIN qs USING (p_type)
         |GROUP BY vc.p_type, qs.n, qs.q1, qs.med, qs.q3
         |ORDER BY vc.p_type""".stripMargin,

    "ts_value_heatmap" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT) AS hr,
        |    CAST(round("value" * 100) AS BIGINT) AS xc
        |  FROM events WHERE "value" IS NOT NULL),
        |vc AS (SELECT event_type, hr, xc, count(*) AS c
        |       FROM ev GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT event_type, hr, xc,
        |    sum(c) OVER (PARTITION BY event_type, hr ORDER BY xc) AS cum,
        |    sum(c) OVER (PARTITION BY event_type, hr) AS n
        |  FROM vc)
        |SELECT event_type, hr, CAST(max(n) AS BIGINT) AS n_events,
        |  min(CASE WHEN cum * 2 >= n THEN xc END) / 100.0 AS p50,
        |  min(CASE WHEN cum * 20 >= n * 19 THEN xc END) / 100.0 AS p95
        |FROM cum GROUP BY event_type, hr
        |ORDER BY event_type, hr""".stripMargin,

    "stat_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events WHERE "value" IS NOT NULL GROUP BY 1),
        |sg AS (
        |  SELECT od, yc,
        |    lag(yc) OVER (ORDER BY od) AS prev
        |  FROM daily),
        |up AS (
        |  SELECT od, CAST(yc > prev AS BIGINT) AS up
        |  FROM sg WHERE prev IS NOT NULL),
        |ch AS (
        |  SELECT up, lag(up) OVER (ORDER BY od) AS pu FROM up),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(up) AS BIGINT) AS n_up,
        |    CAST(sum(CASE WHEN pu IS NULL OR up <> pu
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        |  FROM ch)
        |SELECT n, n_up, n - n_up AS n_down, n_runs,
        |  CASE WHEN n < 2 OR 2 * n_up * (n - n_up) = 0
        |            OR 2 * n_up * (n - n_up) = n THEN NULL
        |  ELSE (CAST(n_runs AS DOUBLE) -
        |    (CAST(2 * n_up * (n - n_up) AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 1.0)) /
        |  sqrt(CAST(2 * n_up * (n - n_up) *
        |      (2 * n_up * (n - n_up) - n) AS DOUBLE) /
        |    CAST(n * n * (n - 1) AS DOUBLE))
        |  END AS z
        |FROM agg""".stripMargin,

    "ts_classical_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events WHERE "value" IS NOT NULL GROUP BY 1),
        |ma AS (
        |  SELECT od, yc,
        |    CAST(count(*) OVER w AS BIGINT) AS wn,
        |    CAST(sum(yc) OVER w AS BIGINT) AS tsum
        |  FROM daily
        |  WINDOW w AS (ORDER BY od
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT (od + 4) % 7 AS dow, yc * 7 - tsum AS det7
        |  FROM ma WHERE wn = 7)
        |SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(det7) AS DOUBLE) /
        |    CAST(count(*) * 700 AS DOUBLE) AS seasonal
        |FROM det GROUP BY dow ORDER BY dow""".stripMargin,

    "stat_bootstrap_ci" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
         |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
         |      AS yc
         |  FROM events WHERE "value" IS NOT NULL GROUP BY 1),
         |idx AS (
         |  SELECT od, yc,
         |    CAST(row_number() OVER (ORDER BY od) - 1 AS BIGINT) AS i
         |  FROM daily),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(yc) AS BIGINT) AS tot_c FROM idx),
         |gsrc AS (
         |  SELECT b.b, x.i AS j,
         |    CAST(b.b AS VARCHAR) || ':' || CAST(x.i AS VARCHAR) AS s0
         |  FROM range(0, $BootB) b(b), idx x),
         |${graft.llm.XxhSql.ctes("gsrc", Seq("b", "j"), "s0", "gh")},
         |picks AS (
         |  SELECT g.b, ((g.hv % nn.n) + nn.n) % nn.n AS di
         |  FROM gh_out g, nn),
         |means AS (
         |  SELECT p.b, CAST(sum(x.yc) AS BIGINT) AS syc
         |  FROM picks p JOIN idx x ON x.i = p.di
         |  GROUP BY p.b),
         |ranked AS (
         |  SELECT syc, row_number() OVER (ORDER BY syc, b) AS rk
         |  FROM means)
         |SELECT nn.n AS n_days, CAST($BootB AS BIGINT) AS n_boot,
         |  CAST(nn.tot_c AS DOUBLE) / CAST(nn.n * 100 AS DOUBLE)
         |    AS mean_daily,
         |  CAST(l.syc AS DOUBLE) / CAST(nn.n * 100 AS DOUBLE) AS ci_lo,
         |  CAST(h.syc AS DOUBLE) / CAST(nn.n * 100 AS DOUBLE) AS ci_hi
         |FROM nn,
         |  (SELECT syc FROM ranked WHERE rk = $BootLoRank) l,
         |  (SELECT syc FROM ranked WHERE rk = $BootHiRank) h""".stripMargin,

    "ts_anomaly_residual" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events WHERE "value" IS NOT NULL GROUP BY 1),
        |ma AS (
        |  SELECT od, yc,
        |    count(*) OVER (ORDER BY od
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn,
        |    CAST(sum(yc) OVER (ORDER BY od
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
        |      AS tsum
        |  FROM daily),
        |det AS (
        |  SELECT od, (od + 4) % 7 AS dow,
        |    CAST(yc * 7 - tsum AS BIGINT) AS x
        |  FROM ma WHERE wn = 7),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS q
        |  FROM det),
        |j AS (
        |  SELECT det.od, det.dow, det.x,
        |    CAST(n * x - sx AS BIGINT) AS ndev,
        |    CAST(4 * (n * q - sx * sx) AS BIGINT) AS thr2
        |  FROM det, mom)
        |SELECT od, dow, x AS det7, ndev,
        |  CASE WHEN thr2 = 0 THEN NULL
        |       ELSE CAST(ndev * ndev AS DOUBLE) / CAST(thr2 AS DOUBLE)
        |  END AS severity
        |FROM j WHERE ndev * ndev > thr2 ORDER BY od""".stripMargin,

    "stat_permutation_test" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
         |    CAST(sum(CASE WHEN event_type = 'click'
         |        THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
         |      - sum(CASE WHEN event_type = 'view'
         |        THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS dc
         |  FROM events
         |  WHERE "value" IS NOT NULL AND event_type IN ('click', 'view')
         |  GROUP BY 1),
         |obs AS (SELECT count(*) AS n,
         |  abs(coalesce(sum(dc), 0)) AS t_obs FROM daily),
         |psrc AS (
         |  SELECT r.range AS b, od, dc,
         |    'perm:' || r.range || ':' || od AS s0
         |  FROM daily CROSS JOIN range(0, $PermB) r),
         |${graft.llm.XxhSql.ctes("psrc", Seq("b", "od", "dc"), "s0", "pm")},
         |tb AS (
         |  SELECT b, abs(sum(CASE WHEN ((hv % 2) + 2) % 2 = 0
         |    THEN dc ELSE -dc END)) AS t_b
         |  FROM pm_out GROUP BY b),
         |fin AS (
         |  SELECT CAST(coalesce(min(n), 0) AS BIGINT) AS n_days,
         |    CAST(min(t_obs) AS BIGINT) AS t_obs_cents,
         |    CAST(coalesce(sum(CASE WHEN t_b >= t_obs THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS n_ge
         |  FROM tb, obs)
         |SELECT n_days, t_obs_cents, n_ge,
         |  CAST(CASE WHEN n_days = 0 THEN NULL
         |       ELSE (1 + n_ge) * 1000000 // ${PermB + 1} END AS BIGINT)
         |    AS p_ppm
         |FROM fin""".stripMargin,

    "ts_sma_crossover" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
         |    CAST(sum(${centsSql("\"value\"")}) AS BIGINT) AS yc
         |  FROM events GROUP BY 1, 2),
         |wins AS (
         |  SELECT event_type, od,
         |    CAST(sum(yc) OVER (PARTITION BY event_type ORDER BY od
         |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s7,
         |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY od
         |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7,
         |    CAST(sum(yc) OVER (PARTITION BY event_type ORDER BY od
         |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS s28,
         |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY od
         |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS n28
         |  FROM daily),
         |sg AS (
         |  SELECT *, CASE WHEN s7 * n28 - s28 * n7 > 0 THEN 1
         |                 WHEN s7 * n28 - s28 * n7 < 0 THEN -1
         |                 ELSE 0 END AS sgv,
         |    lag(CASE WHEN s7 * n28 - s28 * n7 > 0 THEN 1
         |             WHEN s7 * n28 - s28 * n7 < 0 THEN -1
         |             ELSE 0 END) OVER (PARTITION BY event_type
         |      ORDER BY od) AS prev_sg
         |  FROM wins)
         |SELECT event_type, od AS day,
         |  CASE WHEN sgv > 0 THEN 'golden' ELSE 'death' END AS direction,
         |  CAST(s7 AS DOUBLE) / CAST(n7 * 100 AS DOUBLE) AS short_mean,
         |  CAST(s28 AS DOUBLE) / CAST(n28 * 100 AS DOUBLE) AS long_mean
         |FROM sg
         |WHERE n28 = 28 AND prev_sg IS NOT NULL AND sgv <> prev_sg
         |  AND sgv <> 0
         |ORDER BY event_type, day""".stripMargin,

    "ts_mase_naive" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events WHERE "value" IS NOT NULL
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, yc,
        |    lag(yc, 1) OVER (PARTITION BY event_type ORDER BY od) AS l1,
        |    lag(yc, 7) OVER (PARTITION BY event_type ORDER BY od) AS l7
        |  FROM daily),
        |agg AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN l7 IS NOT NULL
        |             THEN abs(yc - l7) ELSE 0 END) AS BIGINT) AS sn_err_c,
        |    CAST(sum(CASE WHEN l7 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sn_n,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL
        |             THEN abs(yc - l1) ELSE 0 END) AS BIGINT) AS nv_err_c,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nv_n
        |  FROM lagged GROUP BY event_type)
        |SELECT event_type, n_days,
        |  CASE WHEN sn_n = 0 THEN NULL
        |  ELSE CAST(sn_err_c AS DOUBLE) / CAST(sn_n * 100 AS DOUBLE)
        |  END AS sn_mae,
        |  CASE WHEN nv_n = 0 THEN NULL
        |  ELSE CAST(nv_err_c AS DOUBLE) / CAST(nv_n * 100 AS DOUBLE)
        |  END AS naive_mae,
        |  CASE WHEN sn_n = 0 OR nv_err_c = 0 THEN NULL
        |  ELSE CAST(sn_err_c * nv_n AS DOUBLE)
        |    / CAST(sn_n * nv_err_c AS DOUBLE)
        |  END AS mase
        |FROM agg ORDER BY event_type""".stripMargin,

    "ts_holt_linear" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS yc
        |  FROM events WHERE "value" IS NOT NULL
        |  GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, yc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY od)
        |      AS i,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n
        |  FROM daily),
        |rec AS (
        |  SELECT event_type, i, n, CAST(yc AS DOUBLE) AS l,
        |    CAST(0.0 AS DOUBLE) AS b
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.event_type, idx.i, idx.n,
        |    0.5 * CAST(idx.yc AS DOUBLE) + 0.5 * (rec.l + rec.b),
        |    0.5 * ((0.5 * CAST(idx.yc AS DOUBLE)
        |        + 0.5 * (rec.l + rec.b)) - rec.l) + 0.5 * rec.b
        |  FROM rec JOIN idx
        |    ON idx.event_type = rec.event_type AND idx.i = rec.i + 1)
        |SELECT event_type, n AS n_days, l / 100.0 AS level,
        |  b / 100.0 AS trend, (l + b) / 100.0 AS forecast
        |FROM rec WHERE i = n ORDER BY event_type""".stripMargin,

    "ts_holt_winters" -> {
      // same generator discipline as the Spark fold: level/trend/
      // season updates share one expression text, so the float trees
      // are operation-identical across engines
      val sSlot = "CASE rec.i % 7 " +
        (0 to 6).map(k => s"WHEN $k THEN rec.s$k").mkString(" ") + " END"
      val y = "CAST(idx.yc AS DOUBLE)"
      val lNew = s"0.5 * ($y - ($sSlot)) + 0.5 * (rec.l + rec.b)"
      val bNew = s"0.5 * (($lNew) - rec.l) + 0.5 * rec.b"
      val sCols = (0 to 6).map(k =>
        s"CASE WHEN rec.i % 7 = $k THEN 0.5 * ($y - ($lNew)) " +
          s"+ 0.5 * rec.s$k ELSE rec.s$k END AS s$k").mkString(", ")
      val s0Cols = (0 to 6).map(k => s"CAST(0.0 AS DOUBLE) AS s$k")
        .mkString(", ")
      val fcSlot = "CASE i % 7 " +
        (0 to 6).map(k => s"WHEN $k THEN s$k").mkString(" ") + " END"
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
         |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
         |      AS yc
         |  FROM events WHERE "value" IS NOT NULL
         |  GROUP BY 1, 2),
         |idx AS (
         |  SELECT event_type, yc,
         |    row_number() OVER (PARTITION BY event_type ORDER BY od)
         |      AS i,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS n
         |  FROM daily),
         |rec AS (
         |  SELECT event_type, i, n, CAST(yc AS DOUBLE) AS l,
         |    CAST(0.0 AS DOUBLE) AS b, $s0Cols
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT idx.event_type, idx.i, idx.n, $lNew, $bNew, $sCols
         |  FROM rec JOIN idx
         |    ON idx.event_type = rec.event_type AND idx.i = rec.i + 1)
         |SELECT event_type, n AS n_days, l / 100.0 AS level,
         |  b / 100.0 AS trend,
         |  ($fcSlot) / 100.0 AS season_next,
         |  (l + b + ($fcSlot)) / 100.0 AS forecast
         |FROM rec WHERE i = n ORDER BY event_type""".stripMargin
    },

    "stat_spearman_daily" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events
        |  WHERE "value" IS NOT NULL
        |    AND event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT
        |    2 * rank() OVER (ORDER BY x)
        |      + count(*) OVER (PARTITION BY x) - 1 AS rx,
        |    2 * rank() OVER (ORDER BY y)
        |      + count(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |  CAST(sum(rx * rx) AS BIGINT) AS sxx,
        |  CAST(sum(ry * ry) AS BIGINT) AS syy,
        |  CAST(sum(rx * ry) AS BIGINT) AS sxy FROM ranked)
        |SELECT n AS n_days,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |  THEN NULL
        |  ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS spearman_rho
        |FROM m""".stripMargin,

    "stat_kendall_daily" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS od,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events
        |  WHERE "value" IS NOT NULL
        |    AND event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |p AS (
        |  SELECT (a.x - b.x) * (a.y - b.y) AS prod,
        |    a.x = b.x AS tx, a.y = b.y AS ty
        |  FROM daily a JOIN daily b ON a.od < b.od),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |  CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |  CAST(count(*) AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN tx THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN ty THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM p)
        |SELECT nc AS n_concordant, nd AS n_discordant,
        |  CASE WHEN n0 = n1 OR n0 = n2 THEN NULL
        |  ELSE CAST(nc - nd AS DOUBLE) /
        |    (sqrt(CAST(n0 - n1 AS DOUBLE)) *
        |     sqrt(CAST(n0 - n2 AS DOUBLE))) END AS kendall_tau_b
        |FROM m""".stripMargin)

}
