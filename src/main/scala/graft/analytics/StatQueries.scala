package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Exact distributed statistics for feature pipelines — the
  * standardize/correlate/winsorize trio every tabular-feature prep
  * stage runs before training, each spelled so the driver hash
  * matches DuckDB bit-for-bit.
  *
  * Determinism contract (the integer-moments trick): float sums are
  * order-dependent, so every moment is an INTEGER aggregate of
  * integer-quantized values (cents / whole units / raw longs) —
  * associative, engine- and partitioning-independent. The only float
  * ops are the FINAL division and sqrt on those exact integers:
  * BIGINT→DOUBLE conversion and IEEE `/`, `sqrt` are correctly
  * rounded in both engines, so results are bit-identical. Variance
  * and covariance use the cross-multiplied forms n·Σx²−(Σx)² and
  * n·Σxy−ΣxΣy — no mean subtraction, no float accumulation.
  *
  * Integer headroom: [[Exact.momentGuard]] ENFORCES every moment's
  * a-priori bound against the 2^62 ceiling (half of Long range — the
  * bound proofs consume the other factor 2), so each GROUP is bounded
  * at n < 2^62 / x_max² (x in quantized units) — ~5·10^8 rows/group
  * at x_max ≈ 10^5 (z-scores on daily cohorts), ~5·10^7 at the corr
  * query's whole-unit prices; past that the query RAISES with the
  * bound in the message. At that point a 100 TB run swaps the BIGINT
  * moments for DECIMAL(38,0) sums (same plan shape, same oracle
  * trick — stat_pca_power_decimal is the verified template); the
  * group keys here (type×day, flag×month) keep test- and
  * cluster-scale groups far inside the bound.
  */
object StatQueries extends QuerySuite {

  /** Power-iteration rounds for stat_pca_power: enough for the gap
    * ratio on this covariance (price variance dominates by orders of
    * magnitude) to pin the direction; the oracle unrolls the same
    * count, so the value must only be deterministic, not converged. */
  val PcaRounds = 6

  /** Ridge penalties swept by stat_ridge_path, in the covariance
    * units of the hour/weekend predictors (var(hour) ≈ 48, so the
    * grid spans none → mild → dominant shrinkage). Whole units keep
    * the perturbed diagonal an exact BIGINT. */
  val RidgeLambdas = Seq(0L, 25L, 100L, 400L)

  /** Shared hour/weekend design moments for the OLS/ridge pair — ONE
    * source for the feature projection and the 10-moment aggregate,
    * so stat_ridge_path's λ = 0 row matches stat_linreg_multi by
    * construction on the data side (the solve trees stay separately
    * spelled; RidgeSpec pins their equality). */
  private def hourWeekendMoments(s: SparkSession, d: String): DataFrame = {
    val ep = floor(unix_timestamp(col("ts")) / 3600L).cast("long")
    val dow = (floor(unix_timestamp(col("ts")) / 86400L).cast("long")
      + 4L) % 7L
    // valued events only: a NULL y would inflate n and the x-only
    // moments while every y moment skips it — a hash-invisible bias
    // (both engines would agree on the wrong regression); the
    // stat_welch_ttest count-vs-sum discipline, applied in both twins
    Tables.events(s, d).filter(col("value").isNotNull).select(
        (ep % 24L).as("x1"),
        when(dow === 0L || dow === 6L, 1L).otherwise(0L).as("x2"),
        round(col("value"), 0).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"),
        max(abs(col("y"))).as("my"))
  }

  /** A-priori BIGINT bound for the hour/weekend cross-multiplied
    * forms: x1 ≤ 23 and x2 ≤ 1 are structural, so every n·Σab−ΣaΣb
    * term is dominated by n²·max(my², 23·my, 529) (plus the caller's
    * λ·n² diagonal perturbation for ridge). Computed in DOUBLE from
    * the wrap-proof n/max aggregates — feeds [[Exact.momentGuard]]. */
  private def hourWeekendBound(extra: Double): Column = {
    val nD = col("n").cast("double")
    val myD = col("my").cast("double")
    nD * nD * greatest(myD * myD, lit(23.0) * myD, lit(529.0), lit(extra))
  }

  /** Shared builder for stat_pca_power and its DECIMAL twin — ONE
    * plan, two moment spellings, so the "re-spell in DECIMAL(38,0),
    * same plan shape" escape hatch named by every guard message is
    * executable code rather than a comment.
    *
    * `decimalMoments = false`: sums are BIGINT, protected by
    * [[Exact.momentGuard]] at the 2⁶² ceiling. `true`: each xⱼ is
    * cast to DECIMAL(18,0) (|x| < 10¹⁸ — covers any quantized unit in
    * the suite), products land in DECIMAL(37,0) and sums in
    * DECIMAL(38,0) per Spark's precision widening, lifting the
    * headroom to 10³⁸ with no guard needed (overflow PAST 10³⁸ fails
    * loudly under ANSI and NULLs the output — never wraps — without);
    * the covariance tree then casts to DOUBLE exactly as the BIGINT
    * path does, and since any sum inside 2⁶² converts to the SAME
    * correctly-rounded double from either type, the eigenpair is
    * bit-identical wherever both spellings are legal. */
  /** Pearson correlation of quantity vs price per (returnflag, month)
    * slice — ONE plan, two moment spellings (suite header; the
    * pcaPower pattern). BIGINT spelling guards every cross form at
    * n²·max(|x|,|y|)² per slice; the DECIMAL(18,0)-input spelling
    * lifts the moment headroom to 10³⁸ with no guard, casting to
    * DOUBLE identically, so the twins are bit-identical wherever both
    * are legal. */
  /** Shared oracle for both corr_monthly spellings (DuckDB BIGINT is
    * exact at fixture scale). */
  private def corrMonthlySql: String =
    """WITH li AS (
      |  SELECT l_returnflag AS rf, strftime(l_shipdate, '%Y-%m') AS month,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT rf, month, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
      |    CAST(sum(x*y) AS BIGINT) AS sxy
      |  FROM li GROUP BY rf, month)
      |SELECT rf, month, n,
      |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0
      |       THEN NULL
      |       ELSE CAST(n*sxy - sx*sy AS DOUBLE)
      |            / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
      |               * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END
      |    AS corr_qty_price
      |FROM m ORDER BY rf, month""".stripMargin

  private def corrMonthly(s: SparkSession, d: String,
      decimalMoments: Boolean): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("rf"),
      date_format(col("l_shipdate"), "yyyy-MM").as("month"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice"), 0).cast("long").as("y"))
    def q(c: Column): Column =
      if (decimalMoments) c.cast("decimal(18,0)") else c
    val m = li.groupBy("rf", "month").agg(
      count(lit(1)).as("n"),
      sum(q(col("x"))).as("sx"), sum(q(col("y"))).as("sy"),
      sum(q(col("x")) * q(col("x"))).as("sxx"),
      sum(q(col("y")) * q(col("y"))).as("syy"),
      sum(q(col("x")) * q(col("y"))).as("sxy"),
      greatest(max(abs(col("x"))), max(abs(col("y")))).as("mxy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    // loud headroom guard, BIGINT spelling only (suite header): every
    // cross form here is bounded by n²·max(|x|,|y|)² per slice.
    val hotD = col("n").cast("double") * col("n").cast("double") *
      col("mxy").cast("double") * col("mxy").cast("double")
    val corr = when(vx === 0L || vy === 0L, lit(null).cast("double"))
      .otherwise(cov.cast("double") /
        (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
    m.select(col("rf"), col("month"), col("n"),
      (if (decimalMoments) corr
       else momentGuard(s, "stat_corr_monthly",
         "slice n^2*max(|x|,|y|)^2", hotD)(corr))
        .as("corr_qty_price"))
      .orderBy("rf", "month")
  }

  private def pcaPower(s: SparkSession, d: String,
      decimalMoments: Boolean): DataFrame = {
    val dims = 1 to 4
    val pairs = for (j <- dims; k <- dims if j <= k) yield (j, k)
    val li = Tables.lineitem(s, d).select(
      round(col("l_quantity"), 0).cast("long").as("x1"),
      round(col("l_extendedprice"), 0).cast("long").as("x2"),
      round(col("l_discount") * 100, 0).cast("long").as("x3"),
      round(col("l_tax") * 100, 0).cast("long").as("x4"))
    def x(j: Int): Column =
      if (decimalMoments) col(s"x$j").cast("decimal(18,0)")
      else col(s"x$j")
    val aggs = Seq(count(lit(1)).as("n")) ++
      dims.map(j => sum(x(j)).as(s"s$j")) ++
      pairs.map { case (j, k) => sum(x(j) * x(k)).as(s"s$j$k") } ++
      dims.map(j => max(abs(col(s"x$j"))).as(s"m$j"))
    val m = li.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    val covCols = pairs.map { case (j, k) =>
      ((nD * col(s"s$j$k").cast("double") -
        col(s"s$j").cast("double") * col(s"s$k").cast("double")) /
        (nD * nD)).as(s"c$j$k") }
    // loud headroom guard, BIGINT spelling only (suite header): each
    // BIGINT moment Σxⱼxₖ is bounded a-priori by n·max|xⱼ|·max|xₖ| ≤
    // n·(maxⱼ max|xⱼ|)² — the "n·max|x|² under 2⁶² to ~5·10⁷ rows"
    // contract, enforced. The per-element products xⱼ·xₖ are bounded
    // by the same max², far inside the sum bound. Computed in DOUBLE
    // from wrap-proof n/max.
    // coalesce: on an EMPTY corpus the maxes are NULL while the
    // guarded column (n = 0) is not — a NULL bound now raises by
    // design (round-12 momentGuard hardening), and 0 is the sound
    // stand-in (no rows → no products to bound)
    val mmax = coalesce(
      greatest(dims.map(j => col(s"m$j").cast("double")): _*), lit(0.0))
    val pcaBound = nD * mmax * mmax
    val guardedN =
      if (decimalMoments) col("n")
      else momentGuard(s, "stat_pca_power", "n*max|x|^2", pcaBound)(
        col("n"))
    val keep = col("n") +: pairs.map { case (j, k) => col(s"c$j$k") }
    var cur = m.select((guardedN.as("n") +:
      (covCols ++ dims.map(j => lit(0.5).as(s"v$j")))): _*)
    var nrmExpr = lit(null).cast("double")
    for (_ <- 1 to PcaRounds) {
      val ws = dims.map { j =>
        dims.map { k =>
          val (a, b) = if (j <= k) (j, k) else (k, j)
          col(s"c$a$b") * col(s"v$k")
        }.reduceLeft(_ + _).as(s"w$j") }
      cur = cur.select(keep ++ ws: _*)
      nrmExpr = sqrt(dims.map(j => col(s"w$j") * col(s"w$j"))
        .reduceLeft(_ + _))
      // nrm = 0 (all-constant features, e.g. a single row zeroes the
      // covariance) has no principal direction: NULL v, and the NULL
      // propagates through later rounds - never an ANSI x/0 abort
      val vs = dims.map(j =>
        when(nrmExpr === 0.0, lit(null).cast("double"))
          .otherwise(col(s"w$j") / nrmExpr).as(s"v$j"))
      cur = cur.select((keep :+ nrmExpr.as("nrm")) ++ vs: _*)
    }
    cur.select(col("n"), col("nrm").as("lambda"),
      col("v1").as("v_qty"), col("v2").as("v_price"),
      col("v3").as("v_disc"), col("v4").as("v_tax"))
  }

  /** The (event_type, day, y = event count) table — the ONE daily
    * series both trend tests (stat_trend_daily's OLS and
    * stat_mann_kendall's rank test) and MannKendallSpec's replay pull
    * through, so the daily-series contract cannot silently fork
    * between companions. OBSERVED days only: a day with zero events
    * of a type contributes no row (the calendar spine is never
    * joined), so both tests measure the trend AMONG ACTIVE DAYS —
    * activity-frequency changes at constant per-day volume (1/week →
    * 1/day at y = 1) are invisible by design; both oracles replay
    * exactly this. */
  private[analytics] def dailyCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-(event_type, day) z-score of every event's value — the
    // daily-cohort anomaly score. Scale shape: one groupBy for the
    // 3-column moment table (group-count-sized), broadcast back, then
    // MAP-SIDE scoring — the fact table shuffles once for the
    // aggregate and never for the join. σ=0 cohorts (single event or
    // constant values) score 0 by convention, guarding the division.
    "stat_zscore_daily" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        cents(col("value")).as("xc"))
      val mom = ev.groupBy("event_type", "day").agg(
        count(lit(1)).as("n"), sum("xc").as("sx"),
        sum(col("xc") * col("xc")).as("sq"),
        max(abs(col("xc"))).as("mx"))
      val denom = col("n") * col("sq") - col("sx") * col("sx")
      // loud headroom guard (suite header): the cross form n·Σx²−(Σx)²
      // is bounded a-priori by n²·max|x|² — per GROUP, because a 100 TB
      // hot cohort is exactly the skew case the comment-only bound
      // missed. mx/n cannot wrap, so the check sees true magnitudes.
      val hotD = col("n").cast("double") * col("n").cast("double") *
        col("mx").cast("double") * col("mx").cast("double")
      ev.join(broadcast(mom), Seq("event_type", "day"))
        .select(col("event_id"), col("event_type"), col("day"),
          momentGuard(s, "stat_zscore_daily", "group n^2*max|x|^2", hotD)(
            when(denom === 0L, lit(0.0))
              .otherwise((col("xc") * col("n") - col("sx")).cast("double") /
                sqrt(denom.cast("double")))).as("z"))
        .orderBy("event_id")
    }),

    // Exact INTERPOLATED percentiles (R-7 / percentile_cont) of event
    // values per type, by rank selection over the value-count table —
    // no raw-row global sort, no approx sketch. The interpolation is
    // RATIONAL: for p = k/10 the target rank h = (n−1)k/10 splits into
    // integer quotient+remainder, and the result is the exact integer
    // combination v_lo·(10−r) + v_hi·r over cents, divided by 1000
    // ONCE — both engines do identical integer math plus one
    // correctly-rounded division, so the hash matches bit-for-bit
    // with no float floor/frac boundary risk. Plan: one fact
    // aggregate to (type, value)-counts, windows + four rank probes
    // on that bounded table.
    "stat_percentile_cont" -> ((s, d) => {
      // value IS NOT NULL in BOTH twins: a NULL cents group would
      // sort FIRST in Spark's window but LAST in DuckDB's ORDER BY,
      // shifting every rank probe by the NULL-group count
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), cents(col("value")).as("xc"))
      val vc = ev.groupBy("event_type", "xc").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("xc")
      val tot = vc.groupBy("event_type").agg(sum("cnt").as("n"))
      val cum = vc
        .withColumn("hi", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("lo", col("hi") - col("cnt") + 1L)
        .join(broadcast(tot), "event_type")
      def pick(k: Int, side: String): DataFrame = {
        val idxLo = expr(s"(n - 1) * $k div 10 + 1")
        val rem = expr(s"(n - 1) * $k % 10")
        val idx = if (side == "lo") idxLo
          else idxLo + when(rem > 0L, 1L).otherwise(0L)
        cum.filter(col("lo") <= idx && idx <= col("hi"))
          .select(col("event_type"), col("xc").as(s"v_${side}_$k"))
      }
      tot
        .join(pick(5, "lo"), "event_type").join(pick(5, "hi"), "event_type")
        .join(pick(9, "lo"), "event_type").join(pick(9, "hi"), "event_type")
        .select(col("event_type"), col("n"),
          ((col("v_lo_5") * (lit(10L) - expr("(n - 1) * 5 % 10")) +
            col("v_hi_5") * expr("(n - 1) * 5 % 10")).cast("double") / 1000.0)
            .as("p50"),
          ((col("v_lo_9") * (lit(10L) - expr("(n - 1) * 9 % 10")) +
            col("v_hi_9") * expr("(n - 1) * 9 % 10")).cast("double") / 1000.0)
            .as("p90"))
        .orderBy("event_type")
    }),

    // Pearson correlation of (quantity, whole-unit price) per
    // (returnflag, ship month) — the drift monitor a feature store
    // runs on every ingest slice. Whole units (not cents) keep
    // n·Σy² inside BIGINT (headroom note above). One aggregate over
    // the fact table; everything after is arithmetic on the
    // group-count-sized table. Degenerate slices (σ=0 on either
    // variable) emit NULL, the SQL corr() convention.
    "stat_corr_monthly" ->
      ((s, d) => corrMonthly(s, d, decimalMoments = false)),

    // The DECIMAL(38,0) re-spelling the stat_corr_monthly guard names
    // (stat_pca_power template): the round-13 scaling harness tripped
    // the BIGINT guard at a ×10 amplification of sf0.1 (slice
    // n²·max(|x|,|y|)² ≈ 5.9·10¹⁸ > 2⁶²), so this swap is the live
    // path one decade up — bit-identical rows, unchanged plan shape
    // (DecimalTwinSpec).
    "stat_corr_monthly_decimal" ->
      ((s, d) => corrMonthly(s, d, decimalMoments = true)),

    // Winsorized mean of line value per returnflag: exact p05/p95
    // DISC cutpoints, map-side clamp, integer-cents mean. Scale
    // shape: the cutpoints come from the agg_percentiles_disc
    // two-level VALUE-COUNT decomposition — the fact table collapses
    // map-side to (rf, value) counts, windows run over the bounded
    // count table, and the pick is value-at-rank via cumulative
    // counts (smallest value whose cum reaches the oracle's rank
    // greatest(1, ceil(n·p)), ceil computed in DOUBLE exactly like
    // both twins). NOT a per-flag window over raw rows (a 3-value
    // partition key would funnel the fact table through 3 tasks) and
    // NOT the old global orderBy + RDD zipWithIndex rank (a full
    // range exchange of the fact table, an InternalRow→Tuple2
    // conversion per row, and two extra jobs — guide §1.4/§2.4). The
    // DuckDB oracle spells the same thing with window functions, so
    // the hash proves the decomposition.
    "agg_winsorized_mean" -> ((s, d) => {
      // value IS NOT NULL in BOTH twins (the agg_percentiles_disc
      // convention): a NULL price would rank differently per engine
      val src = Tables.lineitem(s, d)
        .filter(col("l_extendedprice").isNotNull)
        .select(
          col("l_returnflag").as("rf"), cents(col("l_extendedprice")).as("xc"))
      val vc = src.groupBy("rf", "xc").agg(count(lit(1)).as("c"))
        .withColumn("b", expr("xc div 1000L"))
      val bases = vc.groupBy("rf", "b").agg(sum("c").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("rf").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("rf", "b", "base")
      val cum = vc.join(broadcast(bases), Seq("rf", "b"))
        .withColumn("cum", col("base") + sum("c").over(
          Window.partitionBy("rf", "b").orderBy("xc")))
      val n = vc.groupBy("rf").agg(sum("c").as("n"))
      val cuts = cum.join(broadcast(n), "rf").groupBy("rf").agg(
        min(when(col("cum") >= greatest(lit(1L), ceil(col("n") * 0.05)),
          col("xc"))).as("lo"),
        min(when(col("cum") >= greatest(lit(1L), ceil(col("n") * 0.95)),
          col("xc"))).as("hi"))
      src.join(broadcast(cuts), "rf")
        .select(col("rf"), col("lo"), col("hi"),
          least(greatest(col("xc"), col("lo")), col("hi")).as("wc"))
        .groupBy("rf", "lo", "hi")
        .agg(count(lit(1)).as("n_rows"),
          (sum("wc") / 100.0 / count(lit(1))).as("wmean"))
        .select(col("rf"), col("n_rows"),
          (col("lo") / 100.0).as("p05"), (col("hi") / 100.0).as("p95"),
          col("wmean"))
        .orderBy("rf")
    }),

    // Per-event-type OLS trendline of daily event volume on the day
    // index — the drift/trend monitor beside stat_corr_monthly: slope
    // and intercept of count ~ day from the SAME cross-multiplied
    // integer moments (n·Σxy−ΣxΣy over n·Σx²−(Σx)²), so the whole
    // regression is exact integer arithmetic with two final IEEE
    // divisions both engines round identically. Scale shape: the fact
    // table aggregates once to the (type, day) count table
    // (map-side-combined), every later step runs on the
    // days×types-sized table. Day index = days since the corpus min
    // day (a 1-row scalar), keeping Σx² small. Degenerate groups
    // (single day: vx = 0) emit NULL slope/intercept per the SQL
    // regr_slope convention.
    "stat_trend_daily" -> ((s, d) => {
      val dc = dailyCounts(s, d)
      // isNullAt guards the empty corpus: min over zero rows is a
      // NULL Date and .toString would NPE (the sql_recursive_spine
      // precedent); any literal origin works then - the frame below
      // is empty and the query yields zero rows like the oracle
      val mn = dc.agg(min("day")).head
      val d0 = if (mn.isNullAt(0)) "1970-01-01" else mn.getDate(0).toString
      val daily = dc
        .withColumn("x", datediff(col("day"), lit(d0)).cast("long"))
      val m = daily.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        max(abs(col("x"))).as("mx"), max(abs(col("y"))).as("my"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      // loud headroom guard (suite header): every BIGINT product here
      // (n·Σxy, ΣxΣy, Σy·Σx², Σx·Σxy) is dominated a-priori by
      // 2·n²·max(mx,1)²·max(my,1), computed in DOUBLE from the
      // wrap-proof n/max aggregates.
      val trendBound = lit(2.0) *
        col("n").cast("double") * col("n").cast("double") *
        greatest(col("mx").cast("double"), lit(1.0)) *
        greatest(col("mx").cast("double"), lit(1.0)) *
        greatest(col("my").cast("double"), lit(1.0))
      m.select(col("event_type"),
        momentGuard(s, "stat_trend_daily", "2*n^2*max(mx,1)^2*max(my,1)",
          trendBound)(col("n")).as("n_days"),
        when(vx === 0L, lit(null).cast("double"))
          .otherwise(cov.cast("double") / vx.cast("double")).as("slope"),
        when(vx === 0L, lit(null).cast("double"))
          .otherwise((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / vx.cast("double")).as("intercept"))
        .orderBy("event_type")
    }),

    // Mann–Kendall trend test (Mann '45, Kendall '75) per event type
    // over the daily volume series (OBSERVED days only — see
    // [[dailyCounts]] for what that excludes) — the NONPARAMETRIC
    // companion of stat_trend_daily's OLS: rank-based, so it detects
    // any monotone trend in the active-day counts without a
    // linearity assumption and one outlier day can't
    // flip the verdict. (Cousins, not duplicates: stat_theil_sen in
    // ProfileQueries is the magnitude estimator that classically
    // pairs with this test, and stat_kendall_daily in InsightQueries
    // applies the same concordance machinery BETWEEN two series —
    // this query is tau against the TIME axis with the variance/z/
    // significance call neither of them makes.) S = Σ_{i<j}
    // sign(y_j − y_i) over
    // day-ordered daily counts and the tie-corrected Var(S) are exact
    // BIGINTs; z applies the standard ±1 continuity correction. The
    // only floats are IEEE-exactly-rounded ops (one divide by 18.0,
    // ONE sqrt — correctly rounded by the standard, unlike log/pow,
    // the dq_benford precedent — and one divide), so both engines
    // agree bitwise, and the trend call compares bit-identical z to
    // the same literal. Scale shape: the fact table collapses once
    // (map-side combined) to the CALENDAR-bounded (type, day) table;
    // the pairwise stage self-joins day series of n ≤ days-of-history
    // rows (~10³ at decade scale → ≤ 10⁶ pairs per type) — never raw
    // rows. Headroom is static, not guarded: |S| ≤ n²/2 and the
    // variance numerator ≤ 2n³ + n·tie-terms ≈ 10¹⁰ at decade scale
    // ≪ 2^62 (the calendar-bounded-exempt class of the BENCH_NOTES
    // ledger).
    "stat_mann_kendall" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val pairS = daily.select(col("event_type"), col("day").as("di"),
          col("y").as("yi"))
        .join(daily.select(col("event_type"), col("day").as("dj"),
          col("y").as("yj")), Seq("event_type"))
        .filter(col("di") < col("dj"))
        .groupBy("event_type")
        .agg(sum(when(col("yj") > col("yi"), 1L)
          .when(col("yj") < col("yi"), -1L).otherwise(0L)).as("s_stat"))
      // n and the tie correction from ONE value-count pass: a run of
      // t equal daily totals contributes t(t−1)(2t+5) to the
      // correction (zero when t = 1)
      val m = daily.groupBy("event_type", "y")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t")).as("n_days"),
          sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L))
            .as("tcorr"))
      val vnum = col("n_days") * (col("n_days") - 1L) *
        (col("n_days") * 2L + 5L) - col("tcorr")
      val s0 = coalesce(col("s_stat"), lit(0L))
      val sgn = when(s0 > 0L, 1L).when(s0 < 0L, -1L).otherwise(0L)
      val z = (s0 - sgn).cast("double") /
        sqrt(vnum.cast("double") / lit(18.0))
      // left join: a single-day type has NO i<j pairs (S = 0 by
      // convention; z NULL via vnum = 0, all-tied series likewise)
      m.join(pairS, Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"), s0.as("s_stat"),
          when(vnum === 0L, lit(null).cast("double"))
            .otherwise(z).as("z"),
          when(vnum === 0L, lit(null).cast("string"))
            .otherwise(when(z > 1.96, lit("increasing"))
              .when(z < -1.96, lit("decreasing"))
              .otherwise(lit("no_trend"))).as("trend"))
        .orderBy("event_type")
    }),

    // Same-user cross-type event pairs within 30 s — burst/co-click
    // detection, the batch twin of the stream-stream interval join.
    // Scale shape: candidates come from a BANDED equi-join on
    // (user_id, 30-s time band) with each right row fanned to its own
    // and the next band (any |Δt| ≤ 30 pair differs by ≤ 1 band, and
    // the swapped-role pass covers the other direction), then the
    // exact |Δt| verify runs on candidates only — never an unbounded
    // range join. Canonicalized (lo, hi) pairs dedupe the two-band
    // double-finds before aggregation.
    "behavior_pair_bursts" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("tsec"))
        .withColumn("band", expr("tsec div 30"))
      val fan = e.withColumn("jband",
        explode(array(col("band"), col("band") + 1)))
      val pairs = e.as("x").join(fan.as("y"),
          col("x.user_id") === col("y.user_id") &&
          col("x.band") === col("y.jband") &&
          col("x.event_id") =!= col("y.event_id"))
        .filter(abs(col("x.tsec") - col("y.tsec")) <= 30 &&
          col("x.event_type") =!= col("y.event_type"))
        .select(col("x.user_id").as("user_id"),
          least(col("x.event_id"), col("y.event_id")).as("ea"),
          greatest(col("x.event_id"), col("y.event_id")).as("eb"),
          abs(col("x.tsec") - col("y.tsec")).as("gap"))
        .distinct()
      pairs.groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"), min("gap").as("min_gap_s"))
        .orderBy("user_id")
    }),

    // Robust location/scale per event type: exact MEDIAN and MAD
    // (median absolute deviation) — the outlier-resistant twin of
    // stat_zscore_daily's mean/σ. Rank selection over integer cents
    // (lower-median convention, rank (n+1) div 2) involves no float
    // interpolation. Scale shape: the fact table collapses to a
    // (type, value)-COUNT table first, so the rank-selection window
    // cumsum runs over distinct values per type, never raw rows; the
    // second pass (deviations) re-aggregates against the broadcast
    // 5-row median table map-side.
    "stat_mad_daily" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // value filter: the stat_percentile_cont NULL-ordering argument
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), cents(col("value")).as("xc"))
      def medianOf(df: DataFrame, valueCol: String, out: String) = {
        val vc = df.groupBy("event_type", valueCol)
          .agg(count(lit(1)).as("c"))
        vc.withColumn("cum", sum("c").over(
            Window.partitionBy("event_type").orderBy(valueCol)))
          .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
          .withColumn("rk", expr("(n + 1) div 2"))
          .filter(col("cum") - col("c") < col("rk") && col("rk") <= col("cum"))
          .select(col("event_type"), col(valueCol).as(out), col("n"))
      }
      val med = medianOf(ev, "xc", "medc")
      val dev = ev.join(broadcast(med.select("event_type", "medc")),
          "event_type")
        .select(col("event_type"), abs(col("xc") - col("medc")).as("dv"))
      val mad = medianOf(dev, "dv", "madc")
      med.select(col("event_type"), col("n"),
          (col("medc") / 100.0).as("median_value"))
        .join(mad.select(col("event_type"), (col("madc") / 100.0).as("mad")),
          "event_type")
        .orderBy("event_type")
    }),

    // Exact per-type MODE: most frequent value, smallest value on tie
    // — deterministic by construction via a single lexicographic
    // struct-max over the (type, value)-count table. Two aggregates
    // total, both map-side-partial; no window, no sort.
    // Two-sample Kolmogorov–Smirnov statistic between the order-value
    // distributions of two customer segments — the distribution-drift
    // test a data pipeline runs between corpus snapshots or sampling
    // strata. Exact integer arithmetic end to end: values are money
    // CENTS, and D = max|F1−F2| is computed on the cross-multiplied
    // numerator |c1·n2 − c2·n1| so no per-row division ever happens;
    // the single ppm division at the end is integral. Scale shape:
    // the CDF is the two-stage cumulative the repo uses everywhere —
    // per-value counts bucketed by value range (bucket count bounded
    // by the price DOMAIN, not the row count), in-bucket cumsum keyed
    // by bucket, plus a broadcast per-bucket base table — so no
    // corpus-sized frame ever crosses a single-partition exchange.
    // Integer headroom: c·n ≤ n1·n2 and the ppm multiply needs 10^6×
    // that in BIGINT, safe to ~3·10^6 rows per side; past that,
    // rescale counts (same InitMass-style note as PageRank).
    "stat_ks_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seg = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("seg"))
        .filter(col("seg").isin("BUILDING", "MACHINERY"))
      val vc = Tables.orders(s, d)
        .select(col("o_custkey"), cents(col("o_totalprice")).as("v"))
        .join(seg, "o_custkey")
        .groupBy("v")
        .agg(sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("d1"),
          sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("d2"))
      val n = vc.agg(sum("d1").as("n1"), sum("d2").as("n2"))
      val bucketed = vc.withColumn("b", expr("v div 1048576"))
      val inB = Window.partitionBy("b").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumIn = bucketed
        .withColumn("c1l", sum("d1").over(inB))
        .withColumn("c2l", sum("d2").over(inB))
      val bases = bucketed.groupBy("b")
        .agg(sum("d1").as("t1"), sum("d2").as("t2"))
        .withColumn("b1", coalesce(sum("t1").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("b2", coalesce(sum("t2").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("b", "b1", "b2")
      cumIn.join(broadcast(bases), "b")
        .crossJoin(broadcast(n))
        .withColumn("dnum", abs((col("c1l") + col("b1")) * col("n2") -
          (col("c2l") + col("b2")) * col("n1")))
        .agg(max(struct(col("dnum"), (-col("v")).as("nv"))).as("m"),
          max("n1").as("n1"), max("n2").as("n2"))
        .select(col("n1"), col("n2"),
          // loud headroom guard: the ppm numerator dnum·10⁶ ≤
          // 10⁶·n1·n2 is the binding BIGINT bound (comment above).
          momentGuard(s, "stat_ks_segments", "1e6*n1*n2",
            lit(1e6) * col("n1").cast("double") * col("n2").cast("double"))(
            // nullif-fold (the sample_pps discipline): an empty
            // segment must NOT reach an ANSI DIVIDE_BY_ZERO abort
            // regardless of filter/projection evaluation order
            expr("(m.dnum * 1000000) div (nullif(n1 * n2, 0))"))
            .as("ks_ppm"),
          (-col("m.nv")).as("ks_at_cents"))
        // one segment empty => the KS statistic is undefined; empty
        // input additionally leaves Spark's global agg with one
        // all-NULL row where the oracle's LIMIT 1 over nothing yields
        // zero rows - drop both degenerate shapes in BOTH twins
        .filter(col("n1") > 0L && col("n2") > 0L)
    }),

    "stat_mode_per_type" -> ((s, d) => {
      val vc = Tables.events(s, d)
        .select(col("event_type"), cents(col("value")).as("xc"))
        .groupBy("event_type", "xc").agg(count(lit(1)).as("c"))
      vc.groupBy("event_type")
        .agg(max(struct(col("c"), (-col("xc")).as("nx"))).as("m"),
          sum("c").as("n_events"),
          count(lit(1)).as("n_distinct_values"))
        .select(col("event_type"), col("n_events"),
          col("n_distinct_values"),
          (-col("m.nx") / 100.0).as("mode_value"),
          col("m.c").as("n_mode"))
        .orderBy("event_type")
    }),

    // Closed-form TWO-predictor OLS via exact normal equations —
    // value ~ hour-of-day + weekend — the multivariate step past the
    // suite's simple-regression pair (stat_trend_daily slope,
    // stat_theil_sen): does the diurnal effect survive controlling
    // for the weekend mix? Exactness: all ten raw moments (n, Σx1,
    // Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²) are exact BIGINTs
    // on whole-unit y (round(value) — the brown_forsythe headroom
    // choice: n·Σy² under the ENFORCED 2⁶² ceiling to ~5·10⁶ rows at
    // these magnitudes, DECIMAL swap past that per the suite header,
    // loud raise in between); the centered
    // cross-products n·Σab−ΣaΣb are exact BIGINT cross-multiplied
    // forms, and the 2×2 solve (determinant, betas, R²) is a fixed
    // float tree over those exact integers, written identically in
    // the oracle. Scale shape: ONE map-side-combined aggregate to a
    // single row — no shuffle beyond the 1-row reduce, no window, no
    // join; the normal-equations pattern is how distributed OLS
    // should look at any p (p² moments, one pass).
    "stat_linreg_multi" -> ((s, d) => {
      val m = hourWeekendMoments(s, d)
      // loud headroom guard on n (always selected — pruning-proof):
      // see [[hourWeekendBound]]; enforces the ~10⁷-row comment bound.
      val c = m.select(
        momentGuard(s, "stat_linreg_multi",
          "n^2*max(my^2,23*my,529)", hourWeekendBound(0.0))(col("n"))
          .as("n"),
        col("s1"), col("s2"), col("sy"),
        (col("n") * col("s11") - col("s1") * col("s1"))
          .cast("double").as("d11"),
        (col("n") * col("s22") - col("s2") * col("s2"))
          .cast("double").as("d22"),
        (col("n") * col("s12") - col("s1") * col("s2"))
          .cast("double").as("d12"),
        (col("n") * col("s1y") - col("s1") * col("sy"))
          .cast("double").as("d1y"),
        (col("n") * col("s2y") - col("s2") * col("sy"))
          .cast("double").as("d2y"),
        (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("dyy"))
      // the det guard must live AT the division: the betas are
      // referenced by several downstream whens, so CollapseProject
      // keeps this Project alive and an unconditional x/det would
      // evaluate EAGERLY - an ANSI DIVIDE_BY_ZERO abort on a
      // degenerate (constant-predictor) corpus before any mask runs
      val detE = col("d11") * col("d22") - col("d12") * col("d12")
      val b = c.select(col("n"), col("s1"), col("s2"), col("sy"),
        col("d1y"), col("d2y"), col("dyy"),
        detE.as("det"),
        when(detE === 0.0, lit(null).cast("double"))
          .otherwise((col("d22") * col("d1y") - col("d12") * col("d2y")) /
            detE).as("beta_hour"),
        when(detE === 0.0, lit(null).cast("double"))
          .otherwise((col("d11") * col("d2y") - col("d12") * col("d1y")) /
            detE).as("beta_weekend"))
      b.select(col("n"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise((col("sy").cast("double") -
            col("beta_hour") * col("s1").cast("double") -
            col("beta_weekend") * col("s2").cast("double")) /
            col("n").cast("double")).as("beta0"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise(col("beta_hour")).as("beta_hour"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise(col("beta_weekend")).as("beta_weekend"),
        when(col("det") === 0.0 || col("dyy") === 0.0,
          lit(null).cast("double"))
          .otherwise((col("beta_hour") * col("d1y") +
            col("beta_weekend") * col("d2y")) / col("dyy")).as("r2"))
    }),

    // Top principal component of the 4-feature lineitem space
    // (quantity, whole-dollar price, discount ppc, tax ppc) by POWER
    // ITERATION on the exact population covariance — the "which single
    // direction explains this table" question, and the canonical
    // d²-moments-one-pass shape distributed PCA takes at any scale:
    // ONE map-side-combined aggregate produces all 15 integer moments
    // (n, 4 sums, 10 squares/crosses — exact BIGINTs on the quantized
    // grid), and everything after is a FIXED float tree on that 1-row
    // frame: covariance via the cross-multiplied form
    // (n·Σxy − Σx·Σy)/n², then [[PcaRounds]] rounds of w = C·v,
    // v = w/‖w‖ from v₀ = (½,½,½,½). Zero data motion past the single
    // reduce; the iteration costs nothing at 100 TB because it never
    // touches the data again. Exactness: the covariance products are
    // computed in DOUBLE (n·Σp² ≈ 4·10²¹ exceeds BIGINT — unlike the
    // linreg twins the casts happen BEFORE the multiply, identically
    // in the oracle), and mult/add/div/sqrt on identical doubles are
    // correctly-rounded IEEE in both engines, so the eigenpair is
    // bit-identical. λ is the final ‖C·v‖ (→ top eigenvalue as the
    // iteration converges); the eigenvector sign is pinned by the
    // positive start vector. Moment headroom: n·max|x|² under the
    // ENFORCED 2⁶² ceiling to ~5·10⁷ rows at whole-dollar prices —
    // loud raise past that; stat_pca_power_decimal is the verified
    // DECIMAL(38,0) re-spelling (suite header) for runs that need
    // the scale.
    "stat_pca_power" -> (pcaPower(_, _, decimalMoments = false)),

    // The DECIMAL(38,0) re-spelling every momentGuard message names as
    // the escape hatch, verified as a live query: IDENTICAL plan
    // shape and bit-identical output to stat_pca_power (PcaPowerSpec
    // pins both; the driver replays the same oracle), with the
    // moments' headroom moved from 2⁶² to 10³⁸ — n·max|x|² to ~10²⁷
    // rows at whole-dollar prices, past any physical corpus. Cost:
    // decimal sums aggregate outside the long-adder fast path
    // (BigDecimal adds, still map-side combined), the price of the
    // headroom — which is why the BIGINT spelling stays the default
    // and this variant is the documented swap-in.
    "stat_pca_power_decimal" -> (pcaPower(_, _, decimalMoments = true)),

    // Ridge-regression REGULARIZATION PATH for the linreg_multi model
    // (value ~ hour + weekend) — every λ on [[RidgeLambdas]] solved
    // from the SAME single pass of exact integer moments: ridge on
    // centered data only perturbs the normal-equation diagonal, and in
    // the cross-multiplied integer forms that is d_ii + λ·n² (still an
    // exact BIGINT: λ·n² under the ENFORCED 2⁶² ceiling to n ≈ 10⁸
    // rows at λ ≤ 400, loud raise past that — DECIMAL swap per the
    // suite header). The sweep
    // costs ZERO extra data passes at any scale: one map-side-combined
    // aggregate, a broadcast λ spine, and the per-λ 2×2 solve as the
    // same fixed float tree as stat_linreg_multi (which this query
    // must reproduce exactly at λ = 0 — RidgeSpec pins that). β
    // magnitudes shrink monotonically in λ; fit_share is the explained
    // variance along the ridge direction ((β·d_y)/d_yy), double, one
    // tree.
    "stat_ridge_path" -> ((s, d) => {
      val m = hourWeekendMoments(s, d)
      val spine = s.range(1).select(explode(
        array(RidgeLambdas.map(v => lit(v)): _*)).as("lambda"))
      val c = m.crossJoin(broadcast(spine)).select(
        col("lambda"),
        // loud headroom guard: the ridge diagonal adds λ·n² to the
        // linreg cross forms, so the bound gains a λmax term — this
        // enforces the "λ·n² under 2⁶² to n ≈ 10⁸" comment contract.
        momentGuard(s, "stat_ridge_path",
          "n^2*max(my^2,23*my,529,lambda_max)",
          hourWeekendBound(RidgeLambdas.max.toDouble))(col("n")).as("n"),
        col("s1"), col("s2"), col("sy"),
        (col("n") * col("s11") - col("s1") * col("s1") +
          col("lambda") * col("n") * col("n")).cast("double").as("d11"),
        (col("n") * col("s22") - col("s2") * col("s2") +
          col("lambda") * col("n") * col("n")).cast("double").as("d22"),
        (col("n") * col("s12") - col("s1") * col("s2"))
          .cast("double").as("d12"),
        (col("n") * col("s1y") - col("s1") * col("sy"))
          .cast("double").as("d1y"),
        (col("n") * col("s2y") - col("s2") * col("sy"))
          .cast("double").as("d2y"),
        (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("dyy"))
      val det = col("d11") * col("d22") - col("d12") * col("d12")
      // det-guard at the division (the stat_linreg_multi rationale)
      val bh = when(det === 0.0, lit(null).cast("double"))
        .otherwise((col("d22") * col("d1y") - col("d12") * col("d2y")) / det)
      val bw = when(det === 0.0, lit(null).cast("double"))
        .otherwise((col("d11") * col("d2y") - col("d12") * col("d1y")) / det)
      val b = c.select(col("lambda"), col("n"), col("s1"), col("s2"),
        col("sy"), col("d1y"), col("d2y"), col("dyy"),
        det.as("det"), bh.as("beta_hour"), bw.as("beta_weekend"))
      b.select(col("lambda"), col("n"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise((col("sy").cast("double") -
            col("beta_hour") * col("s1").cast("double") -
            col("beta_weekend") * col("s2").cast("double")) /
            col("n").cast("double")).as("beta0"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise(col("beta_hour")).as("beta_hour"),
        when(col("det") === 0.0, lit(null).cast("double"))
          .otherwise(col("beta_weekend")).as("beta_weekend"),
        when(col("det") === 0.0 || col("dyy") === 0.0,
          lit(null).cast("double"))
          .otherwise((col("beta_hour") * col("d1y") +
            col("beta_weekend") * col("d2y")) / col("dyy"))
          .as("fit_share"))
        .orderBy("lambda")
    }),

    // Delete-one-GROUP jackknife standard error of the mean event
    // value (Quenouille/Tukey, grouped form — days are the deletion
    // blocks, the right unit when rows within a day are dependent):
    // completes the suite's resampling trio next to the bootstrap CI
    // and the permutation test. Exactness: each leave-one-day-out
    // mean (S−s_d)/(N−n_d) is ONE correctly-rounded division,
    // immediately floor-quantized to integer milli-cents — the
    // quantization is the defined semantics (the InsightQueries ppb
    // discipline), so the pseudo-value moments are associative BIGINT
    // sums and the SE is a single sqrt of the cross-multiplied form
    // √((g−1)·(g·Σm²−(Σm)²))/g. Scale shape: one fact aggregate to
    // the DAY table (calendar-bounded), a 1-row broadcast of totals,
    // then arithmetic on the day table — nothing downstream is
    // data-sized. Headroom: the ENFORCED a-priori bound 2·g³·max|m|²
    // (cubic — it covers the full (g−1)·(g·Σm²−(Σm)²) product tree,
    // stricter than the g²·m² of the inner products alone) clears the
    // 2⁶² ceiling to ~45 day-groups at m ≈ 5·10⁶ milli-cents, ~450 at
    // m ≈ 5·10⁵; a longer panel raises loudly — DECIMAL swap past
    // that, per the suite header.
    "stat_jackknife" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          cents(col("value")).as("xc"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_d"), sum("xc").as("s_d"),
          max(abs(col("xc"))).as("mx_d"))
      val tot = byDay.agg(count(lit(1)).as("g"), sum("n_d").as("nn"),
        sum("s_d").as("ss"), max("mx_d").as("mx"))
      val md = byDay.crossJoin(broadcast(tot))
        .withColumn("m", when(col("nn") =!= col("n_d"),
          floor((col("ss") - col("s_d")).cast("double") /
            (col("nn") - col("n_d")).cast("double") *
            lit(1000.0)).cast("long")))
      // loud headroom guard (suite header): the computed BIGINT
      // products are bounded a-priori by (g−1)·(g·Σm²−(Σm)²) ≤
      // 2·g³·max|m|², and the event-sum side by |Σxc| ≤ nn·max|xc|
      // (per-day sums included, n_d ≤ nn) with a 1000× milli-cent
      // factor on the floor() long cast — the "2·g³·max|m|² under
      // 2⁶²" contract above, enforced from wrap-proof count/max
      // aggregates.
      // maxes coalesced to 0: on an all-NULL-value corpus mm/mx are
      // NULL while the guarded column (g, a count) is not — a NULL
      // bound raises by design since the round-12 hardening, and 0 is
      // sound (NULL values contribute NULL products that sums skip)
      val jkBound = greatest(
        lit(2.0) * col("g").cast("double") * col("g").cast("double") *
          col("g").cast("double") *
          coalesce(col("mm"), lit(0L)).cast("double") *
          coalesce(col("mm"), lit(0L)).cast("double"),
        lit(2000.0) * col("nn").cast("double") *
          coalesce(col("mx"), lit(0L)).cast("double"))
      md.groupBy("g", "nn", "ss", "mx")
        .agg(count(col("m")).as("gm"), sum("m").as("sm"),
          sum(col("m") * col("m")).as("sm2"),
          max(abs(col("m"))).as("mm"))
        .select(
          momentGuard(s, "stat_jackknife",
            "max(2*g^3*max|m|^2, 2000*nn*max|xc|)", jkBound)(
            col("g")).as("n_days"),
          col("nn").as("n_events"),
          (col("ss").cast("double") / col("nn").cast("double") / 100.0)
            .as("mean_value"),
          when(col("g") < 2L || col("gm") =!= col("g"),
            lit(null).cast("double"))
            .otherwise(sqrt(((col("g") - 1L) *
              (col("g") * col("sm2") - col("sm") * col("sm")))
              .cast("double")) /
              col("g").cast("double") / 1000.0 / 100.0)
            .as("se_jackknife"))
    }),

    // Wilson score interval (Wilson, JASA 1927) for each event type's
    // high-value rate — the binomial CI that stays inside [0,1] and
    // behaves at small n, i.e. the A/B-dashboard staple the normal
    // approximation gets wrong. Exactness: k and n are one exact
    // integer aggregate; the interval is a fixed float tree on
    // (k, n, z=1.96) written identically in the oracle — division,
    // sqrt, multiply only, all correctly rounded. Map-side-combined
    // single pass to a 5-row table; nothing else moves.
    "stat_wilson_ci" -> ((s, d) => {
      val z = lit(1.96)
      val m = Tables.events(s, d)
        .select(col("event_type"),
          when(cents(col("value")) > 5000L, 1L).otherwise(0L).as("hit"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("hit").as("k"))
      val nD = col("n").cast("double")
      val p = col("k").cast("double") / nD
      val z2 = z * z
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (lit(2.0) * nD)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (lit(4.0) * nD * nD)) / denom
      m.select(col("event_type"), col("n"), col("k"),
          p.as("p_hat"), (center - half).as("ci_lo"),
          (center + half).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Distribution-free confidence interval for the MEDIAN by order
    // statistics (the binomial/sign-test ranks — no normality, no
    // bootstrap): the interval is [x(l), x(u)] with
    // l = ⌊(n − z√n)/2⌋, u = ⌈(n + z√n)/2 + 1⌉ clamped to [1, n]
    // (the conservative textbook convention, documented as the
    // semantics), plus the lower median x(⌊(n+1)/2⌋). Rank selection
    // runs over the (type, value)-COUNT table — the
    // stat_percentile_cont machinery: one fact aggregate, a cum-range
    // probe, no raw-row sort. The only floats are z·√n (correctly
    // rounded, identical in the oracle) floor/ceil'd straight back to
    // integer ranks.
    "stat_median_ci" -> ((s, d) => {
      val z = lit(1.96)
      // value filter: the stat_percentile_cont NULL-ordering argument
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), cents(col("value")).as("xc"))
      val vc = ev.groupBy("event_type", "xc")
        .agg(count(lit(1)).as("cnt"))
      val cum = vc
        .withColumn("hi", sum("cnt").over(
          Window.partitionBy("event_type").orderBy("xc")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("lo", col("hi") - col("cnt") + 1L)
      val tot = vc.groupBy("event_type").agg(sum("cnt").as("n"))
      val nD = col("n").cast("double")
      val ranks = tot.select(col("event_type"), col("n"),
        greatest(lit(1L),
          floor((nD - z * sqrt(nD)) / 2.0).cast("long")).as("rl"),
        expr("(n + 1) div 2").as("rm"),
        least(col("n"),
          ceil((nD + z * sqrt(nD)) / 2.0 + 1.0).cast("long")).as("ru"))
      cum.join(broadcast(ranks), "event_type")
        .groupBy("event_type", "n", "rl", "rm", "ru")
        .agg(
          min(when(col("lo") <= col("rl") && col("rl") <= col("hi"),
            col("xc"))).as("v_lo"),
          min(when(col("lo") <= col("rm") && col("rm") <= col("hi"),
            col("xc"))).as("v_med"),
          min(when(col("lo") <= col("ru") && col("ru") <= col("hi"),
            col("xc"))).as("v_hi"))
        .select(col("event_type"), col("n"),
          (col("v_med") / 100.0).as("median"),
          (col("v_lo") / 100.0).as("ci_lo"),
          (col("v_hi") / 100.0).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Capture–recapture population estimation (Lincoln–Petersen with
    // Chapman's bias correction — mark-recapture from ecology, applied
    // where a data engineer meets it: estimating a TRUE distinct count
    // from two overlapping observation windows when scanning
    // everything is off the table). Sample 1 = users active on even
    // epoch-days, sample 2 = odd days; N̂ = n1·n2 div m and Chapman's
    // (n1+1)(n2+1) div (m+1) − 1 are pure integer arithmetic on three
    // distinct-count aggregates, compared against the exact truth the
    // same scan yields. Headroom: (n1+1)·(n2+1) under the ENFORCED
    // 2⁶² ceiling to ~2.1·10⁹ users per sample, loud raise past that.
    // One (user, parity) dedup shuffle; everything after is 1-row.
    "stat_capture_recapture" -> ((s, d) => {
      val up = Tables.events(s, d)
        .select(col("user_id"),
          (expr("unix_timestamp(ts) div 86400") % 2L).as("par"))
        .distinct()
      val m = up.groupBy("user_id")
        .agg(max(when(col("par") === 0L, 1L).otherwise(0L)).as("in1"),
          max(when(col("par") === 1L, 1L).otherwise(0L)).as("in2"))
        .agg(sum("in1").as("n1"), sum("in2").as("n2"),
          sum(col("in1") * col("in2")).as("m"),
          count(lit(1)).as("n_true"))
      // loud headroom guard (suite header): the BIGINT products
      // n1·n2 and (n1+1)(n2+1) are bounded a-priori by
      // (n1+1)·(n2+1) in DOUBLE (n1, n2 are counts and cannot wrap) —
      // the "(n1+1)·(n2+1) under 2⁶² to ~2.1·10⁹ users" contract
      // above, enforced.
      val crBound = (col("n1").cast("double") + lit(1.0)) *
        (col("n2").cast("double") + lit(1.0))
      m.select(
        momentGuard(s, "stat_capture_recapture", "(n1+1)*(n2+1)",
          crBound)(col("n1")).as("n1"),
        col("n2"), col("m"), col("n_true"),
        when(col("m") > 0L, expr("n1 * n2 div m"))
          .otherwise(lit(null).cast("long")).as("lincoln_petersen"),
        expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("chapman"))
    }))

  def oracles: Map[String, String] = Map(
    "stat_percentile_cont" ->
      s"""WITH ev AS (
         |  SELECT event_type, ${Exact.centsSql("\"value\"")} AS xc
         |  FROM events WHERE "value" IS NOT NULL),
         |vc AS (SELECT event_type, xc, CAST(count(*) AS BIGINT) AS cnt
         |       FROM ev GROUP BY 1, 2),
         |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
         |        FROM vc GROUP BY event_type),
         |cum AS (
         |  SELECT vc.event_type, vc.xc, tot.n, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY vc.event_type ORDER BY xc
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
         |  FROM vc JOIN tot ON vc.event_type = tot.event_type),
         |cum2 AS (SELECT event_type, xc, n, hi, hi - cnt + 1 AS lo
         |         FROM cum),
         |vlo5 AS (SELECT event_type, xc AS v_lo_5 FROM cum2
         |  WHERE lo <= (n-1)*5 // 10 + 1 AND (n-1)*5 // 10 + 1 <= hi),
         |vhi5 AS (SELECT event_type, xc AS v_hi_5 FROM cum2
         |  WHERE lo <= (n-1)*5 // 10 + 1
         |          + CASE WHEN (n-1)*5 % 10 > 0 THEN 1 ELSE 0 END
         |    AND (n-1)*5 // 10 + 1
         |          + CASE WHEN (n-1)*5 % 10 > 0 THEN 1 ELSE 0 END <= hi),
         |vlo9 AS (SELECT event_type, xc AS v_lo_9 FROM cum2
         |  WHERE lo <= (n-1)*9 // 10 + 1 AND (n-1)*9 // 10 + 1 <= hi),
         |vhi9 AS (SELECT event_type, xc AS v_hi_9 FROM cum2
         |  WHERE lo <= (n-1)*9 // 10 + 1
         |          + CASE WHEN (n-1)*9 % 10 > 0 THEN 1 ELSE 0 END
         |    AND (n-1)*9 // 10 + 1
         |          + CASE WHEN (n-1)*9 % 10 > 0 THEN 1 ELSE 0 END <= hi)
         |SELECT tot.event_type, tot.n,
         |  CAST(v_lo_5 * (10 - (n-1)*5 % 10) + v_hi_5 * ((n-1)*5 % 10)
         |    AS DOUBLE) / 1000.0 AS p50,
         |  CAST(v_lo_9 * (10 - (n-1)*9 % 10) + v_hi_9 * ((n-1)*9 % 10)
         |    AS DOUBLE) / 1000.0 AS p90
         |FROM tot
         |JOIN vlo5 ON tot.event_type = vlo5.event_type
         |JOIN vhi5 ON tot.event_type = vhi5.event_type
         |JOIN vlo9 ON tot.event_type = vlo9.event_type
         |JOIN vhi9 ON tot.event_type = vhi9.event_type
         |ORDER BY tot.event_type""".stripMargin,

    // honest global-window CDF twin of the two-stage bucketed plan
    "stat_ks_segments" ->
      s"""WITH seg AS (
         |  SELECT c_custkey, c_mktsegment AS seg FROM customer
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |vv AS (
         |  SELECT ${centsSql("o_totalprice")} AS v, seg
         |  FROM orders JOIN seg ON o_custkey = c_custkey),
         |vc AS (
         |  SELECT v,
         |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d1,
         |    CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d2
         |  FROM vv GROUP BY v),
         |n AS (SELECT CAST(sum(d1) AS BIGINT) AS n1,
         |             CAST(sum(d2) AS BIGINT) AS n2 FROM vc),
         |cum AS (
         |  SELECT v, sum(d1) OVER (ORDER BY v) AS c1,
         |         sum(d2) OVER (ORDER BY v) AS c2
         |  FROM vc),
         |sc AS (SELECT v, abs(c1 * n2 - c2 * n1) AS dnum
         |       FROM cum CROSS JOIN n)
         |SELECT n.n1, n.n2,
         |  CAST((s.dnum * 1000000) // (n.n1 * n.n2) AS BIGINT) AS ks_ppm,
         |  CAST(s.v AS BIGINT) AS ks_at_cents
         |FROM sc s CROSS JOIN n
         |WHERE n.n1 > 0 AND n.n2 > 0
         |ORDER BY s.dnum DESC, s.v LIMIT 1""".stripMargin,
    "stat_zscore_daily" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, strftime(ts, '%Y-%m-%d') AS day,
         |    ${centsSql("value")} AS xc
         |  FROM events),
         |m AS (
         |  SELECT event_type, day, count(*) AS n,
         |    CAST(sum(xc) AS BIGINT) AS sx,
         |    CAST(sum(xc*xc) AS BIGINT) AS sq
         |  FROM e GROUP BY event_type, day)
         |SELECT e.event_id, e.event_type, e.day,
         |  CASE WHEN m.n*m.sq - m.sx*m.sx = 0 THEN 0.0
         |       ELSE CAST(e.xc*m.n - m.sx AS DOUBLE)
         |            / sqrt(CAST(m.n*m.sq - m.sx*m.sx AS DOUBLE)) END AS z
         |FROM e JOIN m USING (event_type, day)
         |ORDER BY event_id""".stripMargin,

    "stat_corr_monthly" -> corrMonthlySql,
    // bit-identical wherever both spellings are legal → same oracle
    "stat_corr_monthly_decimal" -> corrMonthlySql,

    "agg_winsorized_mean" ->
      s"""WITH src AS (
         |  SELECT l_returnflag AS rf,
         |    ${centsSql("l_extendedprice")} AS xc
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |r AS (
         |  SELECT rf, xc,
         |    row_number() OVER (PARTITION BY rf ORDER BY xc) AS rk,
         |    count(*) OVER (PARTITION BY rf) AS n
         |  FROM src),
         |c AS (
         |  SELECT rf,
         |    min(CASE WHEN rk = greatest(1, CAST(ceil(n*0.05) AS BIGINT))
         |        THEN xc END) AS lo,
         |    min(CASE WHEN rk = greatest(1, CAST(ceil(n*0.95) AS BIGINT))
         |        THEN xc END) AS hi
         |  FROM r GROUP BY rf)
         |SELECT s.rf, count(*) AS n_rows,
         |  c.lo/100.0 AS p05, c.hi/100.0 AS p95,
         |  sum(least(greatest(s.xc, c.lo), c.hi))/100.0/count(*) AS wmean
         |FROM src s JOIN c USING (rf)
         |GROUP BY s.rf, c.lo, c.hi ORDER BY s.rf""".stripMargin,

    "stat_trend_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |dx AS (
        |  SELECT event_type,
        |    CAST(day - (SELECT d0 FROM d0) AS BIGINT) AS x, y
        |  FROM daily),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM dx GROUP BY event_type)
        |SELECT event_type, n AS n_days,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
        |       ELSE CAST(n*sxy - sx*sy AS DOUBLE)
        |            / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
        |       ELSE CAST(sy*sxx - sx*sxy AS DOUBLE)
        |            / CAST(n*sxx - sx*sx AS DOUBLE) END AS intercept
        |FROM m ORDER BY event_type""".stripMargin,

    // Exact BIGINT S and tie-corrected variance numerator; z via
    // IEEE-exactly-rounded divide + sqrt + divide, so the doubles
    // match Spark bitwise and the trend CASE sees identical values.
    "stat_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |ps AS (
        |  SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1
        |                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
        |      AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY a.event_type),
        |m AS (
        |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
        |    CAST(sum(t*(t-1)*(2*t+5)) AS BIGINT) AS tcorr
        |  FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
        |        FROM daily GROUP BY event_type, y)
        |  GROUP BY event_type),
        |z0 AS (
        |  SELECT m.event_type, m.n_days,
        |    coalesce(ps.s_stat, 0) AS s_stat,
        |    m.n_days*(m.n_days-1)*(2*m.n_days+5) - m.tcorr AS vnum
        |  FROM m LEFT JOIN ps ON m.event_type = ps.event_type),
        |z1 AS (
        |  SELECT event_type, n_days, s_stat,
        |    CASE WHEN vnum = 0 THEN NULL
        |      ELSE CAST(s_stat - (CASE WHEN s_stat > 0 THEN 1
        |                               WHEN s_stat < 0 THEN -1
        |                               ELSE 0 END) AS DOUBLE)
        |        / sqrt(CAST(vnum AS DOUBLE) / 18.0) END AS z
        |  FROM z0)
        |SELECT event_type, n_days, s_stat, z,
        |  CASE WHEN z IS NULL THEN NULL
        |       WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z1 ORDER BY event_type""".stripMargin,

    // The oracle spells the plain quadratic-within-user filter; the
    // banded plan equals it because any pair within 30 s lands in
    // adjacent bands (≤ 1 apart) and role-swap covers both signs.
    "behavior_pair_bursts" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events)
        |SELECT x.user_id, count(*) AS n_pairs,
        |  min(abs(x.tsec - y.tsec)) AS min_gap_s
        |FROM e x JOIN e y
        |  ON x.user_id = y.user_id AND x.event_id < y.event_id
        |WHERE abs(x.tsec - y.tsec) <= 30
        |  AND x.event_type <> y.event_type
        |GROUP BY x.user_id ORDER BY x.user_id""".stripMargin,

    // The oracle spells the rank selection directly over ordered rows
    // (row_number = the classic formulation); the value-count cumsum
    // plan equals it because rank (n+1)//2 falls in the value whose
    // cumulative range covers it.
    "stat_mad_daily" ->
      s"""WITH e AS (
         |  SELECT event_type, ${centsSql("value")} AS xc
         |  FROM events WHERE "value" IS NOT NULL),
         |r AS (SELECT event_type, xc,
         |    row_number() OVER (PARTITION BY event_type ORDER BY xc) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM e),
         |med AS (SELECT event_type, n, xc AS medc FROM r
         |  WHERE rn = (n + 1) // 2),
         |dv AS (SELECT e.event_type, abs(xc - medc) AS d
         |  FROM e JOIN med ON e.event_type = med.event_type),
         |r2 AS (SELECT event_type, d,
         |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dv),
         |mad AS (SELECT event_type, d AS madc FROM r2
         |  WHERE rn = (n + 1) // 2)
         |SELECT med.event_type AS event_type, n, medc/100.0 AS median_value,
         |  madc/100.0 AS mad
         |FROM med JOIN mad ON med.event_type = mad.event_type
         |ORDER BY event_type""".stripMargin,

    // Independent formulation: rank values by (count DESC, value ASC)
    // and take rank 1 — must equal the struct-max.
    "stat_mode_per_type" ->
      s"""WITH vc AS (
         |  SELECT event_type, ${centsSql("value")} AS xc, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |rk AS (SELECT event_type, xc, c,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY c DESC, xc ASC) AS rn,
         |    sum(c) OVER (PARTITION BY event_type) AS n_events,
         |    count(*) OVER (PARTITION BY event_type) AS n_distinct_values
         |  FROM vc)
         |SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
         |  n_distinct_values, xc/100.0 AS mode_value, c AS n_mode
         |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "stat_linreg_multi" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS x1,
        |    CASE WHEN ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
        |      IN (0, 6) THEN 1 ELSE 0 END AS x2,
        |    CAST(round("value") AS BIGINT) AS y
        |  FROM events WHERE "value" IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
        |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM ev),
        |c AS (SELECT n, s1, s2, sy,
        |    CAST(n * s11 - s1 * s1 AS DOUBLE) AS d11,
        |    CAST(n * s22 - s2 * s2 AS DOUBLE) AS d22,
        |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS d12,
        |    CAST(n * s1y - s1 * sy AS DOUBLE) AS d1y,
        |    CAST(n * s2y - s2 * sy AS DOUBLE) AS d2y,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS dyy
        |  FROM m),
        |b AS (SELECT n, s1, s2, sy, d1y, d2y, dyy,
        |    d11 * d22 - d12 * d12 AS det,
        |    CASE WHEN d11 * d22 - d12 * d12 = 0 THEN NULL
        |    ELSE (d22 * d1y - d12 * d2y) / (d11 * d22 - d12 * d12)
        |    END AS beta_hour,
        |    CASE WHEN d11 * d22 - d12 * d12 = 0 THEN NULL
        |    ELSE (d11 * d2y - d12 * d1y) / (d11 * d22 - d12 * d12)
        |    END AS beta_weekend
        |  FROM c)
        |SELECT n,
        |  CASE WHEN det = 0 THEN NULL
        |       ELSE (CAST(sy AS DOUBLE) -
        |             beta_hour * CAST(s1 AS DOUBLE) -
        |             beta_weekend * CAST(s2 AS DOUBLE)) /
        |            CAST(n AS DOUBLE) END AS beta0,
        |  CASE WHEN det = 0 THEN NULL ELSE beta_hour END AS beta_hour,
        |  CASE WHEN det = 0 THEN NULL ELSE beta_weekend END
        |    AS beta_weekend,
        |  CASE WHEN det = 0 OR dyy = 0 THEN NULL
        |       ELSE (beta_hour * d1y + beta_weekend * d2y) / dyy END
        |    AS r2
        |FROM b""".stripMargin,

    "stat_pca_power" -> pcaPowerSql,
    // the DECIMAL twin must reproduce the BIGINT result bit-exactly,
    // so it replays the SAME oracle
    "stat_pca_power_decimal" -> pcaPowerSql,

    // z enters as CAST(1.96 AS DOUBLE) so z*z is a DOUBLE product like
    // Spark's lit(1.96)*lit(1.96) — a bare 1.96*1.96 would compute in
    // DuckDB DECIMAL (exact 3.8416) and diverge from the double
    // product in the last ulp.
    "stat_wilson_ci" ->
      s"""WITH m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN ${centsSql("\"value\"")} > 5000
         |      THEN 1 ELSE 0 END) AS BIGINT) AS k,
         |    CAST(1.96 AS DOUBLE) AS z
         |  FROM events GROUP BY event_type),
         |t AS (SELECT event_type, n, k,
         |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         |    z, CAST(n AS DOUBLE) AS nd
         |  FROM m),
         |w AS (SELECT event_type, n, k, p,
         |    (p + z * z / (2.0 * nd)) / (1.0 + z * z / nd) AS center,
         |    z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd))
         |      / (1.0 + z * z / nd) AS half
         |  FROM t)
         |SELECT event_type, n, k, p AS p_hat,
         |  center - half AS ci_lo, center + half AS ci_hi
         |FROM w ORDER BY event_type""".stripMargin,

    "stat_capture_recapture" ->
      s"""WITH up AS (
         |  SELECT DISTINCT user_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 % 2 AS par
         |  FROM events),
         |fl AS (SELECT user_id,
         |         max(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS in1,
         |         max(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS in2
         |       FROM up GROUP BY user_id),
         |m AS (SELECT CAST(sum(in1) AS BIGINT) AS n1,
         |        CAST(sum(in2) AS BIGINT) AS n2,
         |        CAST(sum(in1 * in2) AS BIGINT) AS m,
         |        CAST(count(*) AS BIGINT) AS n_true
         |      FROM fl)
         |SELECT n1, n2, m, n_true,
         |  CASE WHEN m > 0 THEN n1 * n2 // m END AS lincoln_petersen,
         |  (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman
         |FROM m""".stripMargin,

    "stat_median_ci" ->
      s"""WITH ev AS (
         |  SELECT event_type, ${centsSql("\"value\"")} AS xc
         |  FROM events WHERE "value" IS NOT NULL),
         |vc AS (SELECT event_type, xc, CAST(count(*) AS BIGINT) AS cnt
         |       FROM ev GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, xc, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY xc
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
         |  FROM vc),
         |cum2 AS (SELECT event_type, xc, hi, hi - cnt + 1 AS lo FROM cum),
         |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
         |        FROM vc GROUP BY event_type),
         |rk AS (SELECT event_type, n,
         |    greatest(CAST(1 AS BIGINT), CAST(floor(
         |      (CAST(n AS DOUBLE) - CAST(1.96 AS DOUBLE)
         |        * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS rl,
         |    (n + 1) // 2 AS rm,
         |    least(n, CAST(ceil(
         |      (CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE)
         |        * sqrt(CAST(n AS DOUBLE))) / 2.0 + 1.0) AS BIGINT)) AS ru
         |  FROM tot)
         |SELECT rk.event_type, rk.n,
         |  min(CASE WHEN lo <= rm AND rm <= hi THEN xc END) / 100.0
         |    AS median,
         |  min(CASE WHEN lo <= rl AND rl <= hi THEN xc END) / 100.0
         |    AS ci_lo,
         |  min(CASE WHEN lo <= ru AND ru <= hi THEN xc END) / 100.0
         |    AS ci_hi
         |FROM cum2 JOIN rk ON cum2.event_type = rk.event_type
         |GROUP BY rk.event_type, rk.n
         |ORDER BY rk.event_type""".stripMargin,

    "stat_jackknife" ->
      s"""WITH vc AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS day,
         |    ${centsSql("\"value\"")} AS xc
         |  FROM events),
         |byday AS (SELECT day, CAST(count(*) AS BIGINT) AS n_d,
         |            CAST(sum(xc) AS BIGINT) AS s_d
         |          FROM vc GROUP BY day),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS g,
         |          CAST(sum(n_d) AS BIGINT) AS nn,
         |          CAST(sum(s_d) AS BIGINT) AS ss
         |        FROM byday),
         |md AS (SELECT g, nn, ss,
         |         CASE WHEN nn <> n_d THEN CAST(floor(
         |           CAST(ss - s_d AS DOUBLE) / CAST(nn - n_d AS DOUBLE)
         |             * 1000.0) AS BIGINT) END AS m
         |       FROM byday CROSS JOIN tot),
         |agg AS (SELECT g, nn, ss, CAST(count(m) AS BIGINT) AS gm,
         |          CAST(sum(m) AS BIGINT) AS sm,
         |          CAST(sum(m * m) AS BIGINT) AS sm2
         |        FROM md GROUP BY g, nn, ss)
         |SELECT g AS n_days, nn AS n_events,
         |  CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0 AS mean_value,
         |  CASE WHEN g < 2 OR gm <> g THEN NULL
         |       ELSE sqrt(CAST((g - 1) * (g * sm2 - sm * sm) AS DOUBLE))
         |            / CAST(g AS DOUBLE) / 1000.0 / 100.0 END
         |    AS se_jackknife
         |FROM agg""".stripMargin,

    "stat_ridge_path" -> {
      val vals = RidgeLambdas.map(l => s"($l)").mkString(", ")
      s"""WITH ev AS (
         |  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS x1,
         |    CASE WHEN ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
         |      IN (0, 6) THEN 1 ELSE 0 END AS x2,
         |    CAST(round("value") AS BIGINT) AS y
         |  FROM events WHERE "value" IS NOT NULL),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM ev),
         |spine AS (SELECT CAST(lambda AS BIGINT) AS lambda
         |          FROM (VALUES $vals) t(lambda)),
         |c AS (SELECT lambda, n, s1, s2, sy,
         |    CAST(n * s11 - s1 * s1 + lambda * n * n AS DOUBLE) AS d11,
         |    CAST(n * s22 - s2 * s2 + lambda * n * n AS DOUBLE) AS d22,
         |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS d12,
         |    CAST(n * s1y - s1 * sy AS DOUBLE) AS d1y,
         |    CAST(n * s2y - s2 * sy AS DOUBLE) AS d2y,
         |    CAST(n * syy - sy * sy AS DOUBLE) AS dyy
         |  FROM m CROSS JOIN spine),
         |b AS (SELECT lambda, n, s1, s2, sy, d1y, d2y, dyy,
         |    d11 * d22 - d12 * d12 AS det,
         |    CASE WHEN d11 * d22 - d12 * d12 = 0 THEN NULL
         |    ELSE (d22 * d1y - d12 * d2y) / (d11 * d22 - d12 * d12)
         |    END AS beta_hour,
         |    CASE WHEN d11 * d22 - d12 * d12 = 0 THEN NULL
         |    ELSE (d11 * d2y - d12 * d1y) / (d11 * d22 - d12 * d12)
         |    END AS beta_weekend
         |  FROM c)
         |SELECT lambda, n,
         |  CASE WHEN det = 0 THEN NULL
         |       ELSE (CAST(sy AS DOUBLE) -
         |             beta_hour * CAST(s1 AS DOUBLE) -
         |             beta_weekend * CAST(s2 AS DOUBLE)) /
         |            CAST(n AS DOUBLE) END AS beta0,
         |  CASE WHEN det = 0 THEN NULL ELSE beta_hour END AS beta_hour,
         |  CASE WHEN det = 0 THEN NULL ELSE beta_weekend END
         |    AS beta_weekend,
         |  CASE WHEN det = 0 OR dyy = 0 THEN NULL
         |       ELSE (beta_hour * d1y + beta_weekend * d2y) / dyy END
         |    AS fit_share
         |FROM b ORDER BY lambda""".stripMargin
    })

  /** SQL twin of stat_pca_power, generated with the same loops as the
    * DataFrame side so the float trees stay in lockstep: one CTE per
    * w-step and per v-step, left-associated sums in declaration order
    * exactly as `reduceLeft(_ + _)` builds them. */
  private def pcaPowerSql: String = {
    val dims = 1 to 4
    val pairs = for (j <- dims; k <- dims if j <= k) yield (j, k)
    val covKeep = pairs.map { case (j, k) => s"c$j$k" }.mkString(", ")
    val momentCols =
      (dims.map(j => s"CAST(sum(x$j) AS BIGINT) AS s$j") ++
        pairs.map { case (j, k) =>
          s"CAST(sum(x$j * x$k) AS BIGINT) AS s$j$k" }).mkString(",\n    ")
    val covCols = pairs.map { case (j, k) =>
      s"""(CAST(n AS DOUBLE) * CAST(s$j$k AS DOUBLE) -
         |     CAST(s$j AS DOUBLE) * CAST(s$k AS DOUBLE)) /
         |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS c$j$k""".stripMargin
    }.mkString(",\n    ")
    val v0 = dims.map(j => s"CAST(0.5 AS DOUBLE) AS v$j").mkString(", ")
    val rounds = (1 to PcaRounds).flatMap { r =>
      val prev = if (r == 1) "c" else s"r${r - 1}v"
      val ws = dims.map { j =>
        dims.map { k =>
          val (a, b) = if (j <= k) (j, k) else (k, j)
          s"c$a$b * v$k"
        }.mkString(" + ") + s" AS w$j"
      }.mkString(",\n    ")
      val nrm = "sqrt(" + dims.map(j => s"w$j * w$j").mkString(" + ") + ")"
      val vs = dims.map(j =>
        s"CASE WHEN $nrm = 0 THEN NULL ELSE w$j / $nrm END AS v$j")
        .mkString(",\n    ")
      Seq(
        s"r${r}w AS (SELECT n, $covKeep,\n    $ws\n  FROM $prev)",
        s"r${r}v AS (SELECT n, $covKeep, $nrm AS nrm,\n    $vs\n  FROM r${r}w)")
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
       |    CAST(round(l_extendedprice) AS BIGINT) AS x2,
       |    CAST(round(l_discount * 100) AS BIGINT) AS x3,
       |    CAST(round(l_tax * 100) AS BIGINT) AS x4
       |  FROM lineitem),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    $momentCols
       |  FROM li),
       |c AS (SELECT n,
       |    $covCols,
       |    $v0
       |  FROM m),
       |$rounds
       |SELECT n, nrm AS lambda, v1 AS v_qty, v2 AS v_price,
       |  v3 AS v_disc, v4 AS v_tax
       |FROM r${PcaRounds}v""".stripMargin
  }
}
