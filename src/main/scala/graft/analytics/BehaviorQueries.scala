package graft.analytics

import graft.Lineage.LineageOps
import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — the funnel/cohort/path staples every
  * product-analytics workload runs over an event log. All three are
  * pure integer/count computations (epoch seconds, distinct users), so
  * every result hash-matches the DuckDB oracle.
  *
  * Scale shapes: the funnel is three conditional-min aggregations
  * keyed by user (each one shuffle with map-side partials — no window,
  * no self-join over raw events); cohort retention is a two-level
  * aggregation whose shuffle carries (user, week) pairs; transitions
  * use one per-user window (events per user are bounded, so the
  * per-partition sort is tiny) feeding a count aggregation.
  */
object BehaviorQueries extends QuerySuite {

  /** Attribution lookback: clicks within this many seconds before a
    * purchase get the credit. */
  val AttribWindowSec = 3600L

  /** Per-user event cap for the pattern-regex symbol strings: bounds
    * any one user's string (and the collect_list behind it) so a
    * pathological power user can't blow a task; the truncation is
    * part of the query's semantics — the oracle replays the same
    * first-MaxSeqEvents-by-(sec, event_id) prefix. */
  val MaxSeqEvents = 4096

  /** (name → regex) patterns counted by behavior_pattern_regex over
    * the c/e/p/s/v symbol alphabet (event-type initials). Each regex
    * has a unique non-overlapping match set under both Java and RE2
    * semantics: fixed literal terminators, negated-class gaps only. */
  val PatternRegexes = Seq(
    "browse_to_buy" -> "v[^p]*p", // view → purchase, no purchase between
    "error_then_purchase" -> "e+p", // error streak resolved by a purchase
    "double_signup" -> "ss") // adjacent repeat signups

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id"), col("event_type"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"))

  /** Banded purchase⋈click touch join shared by the attribution pair
    * (single source of truth for the banding, so the window bounds
    * can never drift between the two queries): every (purchase,
    * click) pair with the click in the preceding [[AttribWindowSec]],
    * equi-joined on (user, hour-band) with the time predicate as a
    * residual — never a theta join over raw events. Returns
    * (user_id, pid, pt, cid, ct) plus vc when `requireValue` (which
    * also applies behavior_attribution's value-non-null purchase
    * filter). */
  private def bandedClickTouches(s: SparkSession, d: String,
      requireValue: Boolean): DataFrame = {
    val base = Tables.events(s, d)
    val purch0 = base.filter(col("event_type") === "purchase")
    val purch1 =
      if (requireValue) purch0.filter(col("value").isNotNull) else purch0
    val pcols = Seq(col("user_id"), col("event_id").as("pid"),
      unix_timestamp(col("ts")).as("pt")) ++
      (if (requireValue) Seq(Exact.cents(col("value")).as("vc")) else Nil)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"),
        unix_timestamp(col("ts")).as("ct"))
      .withColumn("hb", expr("ct div 3600"))
    purch1.select(pcols: _*)
      .withColumn("hb",
        explode(sequence(expr(s"(pt - $AttribWindowSec) div 3600"),
          expr("pt div 3600"))))
      .join(clicks, Seq("user_id", "hb"))
      .filter(col("ct") > col("pt") - AttribWindowSec &&
        col("ct") <= col("pt"))
      .drop("hb")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Last-hour click attribution — the marketing staple: credit each
    // purchase to the clicks in the preceding [[AttribWindowSec]]
    // seconds by the same user. The purchase⋈click range join is
    // BANDED to hour buckets (each purchase probes its own and the
    // previous hour bucket, the join_interval_overlap discipline), so
    // the equi-join keys on (user, hour-band) and the time predicate
    // is a residual filter — never a theta join over raw events. The
    // oracle IS the naive theta join: the hash match proves band
    // coverage is exact (a window of W seconds spans at most
    // ceil(W/3600)+1 hour buckets). Output is per-user integer
    // counts/cents.
    "behavior_attribution" -> ((s, d) => {
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("event_id").as("pid"),
          Exact.cents(col("value")).as("vc"))
      val touched = bandedClickTouches(s, d, requireValue = true)
        .groupBy("user_id", "pid", "vc")
        .agg(count(lit(1)).as("n_touches"))
      purch.join(touched.select(col("pid"), col("n_touches")),
          Seq("pid"), "left")
        .groupBy("user_id").agg(
          count(lit(1)).as("n_purchases"),
          sum(when(col("n_touches").isNotNull, 1L).otherwise(0L))
            .as("n_attributed"),
          sum(when(col("n_touches").isNotNull, col("vc")).otherwise(0L))
            .as("attributed_cents"),
          sum(coalesce(col("n_touches"), lit(0L))).as("n_click_touches"))
        .filter(col("n_attributed") > 0L)
        .orderBy("user_id")
    }),

    // MULTI-TOUCH attribution — the four standard credit models over
    // the same banded purchase⋈click range join as
    // behavior_attribution (last-touch, linear, U-shaped/position,
    // time-decay), reported as credit share by click hour-of-day.
    // Every model's credit is integer ppm: linear is 10⁶ div k,
    // U-shaped is the 40/20/40 split with the middle floor-divided,
    // and time-decay reuses the exact shift-decay discipline —
    // per-touch weight 8 >> (age div 900) (halving each 15 min, age
    // < window so the shift is bounded at 3) normalized by the
    // per-purchase integer weight sum. Scale shape: the banded
    // equi-join from behavior_attribution, per-PURCHASE windows
    // (millions of tiny partitions, never global), a 4-way stack, and
    // a (model × 24h) census aggregate.
    "behavior_attribution_models" -> ((s, d) => {
      val w = Window.partitionBy("pid")
      val scored = bandedClickTouches(s, d, requireValue = false)
        .select(col("pid"), col("cid"), col("pt"), col("ct"))
        .withColumn("i",
          row_number().over(w.orderBy(col("ct"), col("cid"))).cast("long"))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("dw",
          expr("shiftright(CAST(8 AS BIGINT), CAST((pt - ct) div 900 AS INT))"))
        .withColumn("sw", sum("dw").over(w))
        .withColumn("last_touch",
          when(col("i") === col("k"), 1000000L).otherwise(0L))
        .withColumn("linear", expr("1000000 div k"))
        .withColumn("u_shaped",
          when(col("k") === 1L, 1000000L)
            .when(col("k") === 2L, 500000L)
            .when(col("i") === 1L || col("i") === col("k"), 400000L)
            .otherwise(expr("200000 div (k - 2)")))
        .withColumn("time_decay", expr("dw * 1000000 div sw"))
      scored
        .select(expr("ct div 3600 % 24").as("hour_of_day"),
          expr("stack(4, 'last_touch', last_touch, 'linear', linear," +
            " 'time_decay', time_decay, 'u_shaped', u_shaped)" +
            " as (model, credit)"))
        .groupBy("model", "hour_of_day")
        .agg(count(lit(1)).as("n_touches"), sum("credit").as("credit_ppm"))
        .orderBy("model", "hour_of_day")
    }),

    // Conversion funnel view -> click -> purchase: a user advances a
    // stage only with an event STRICTLY after their previous-stage
    // entry. Joins are user-keyed aggregates of the already-reduced
    // stage tables (≤ one row per user), never event × event.
    "funnel_stages" -> ((s, d) => {
      val e = ev(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("sec").as("v_sec"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("sec") > col("v_sec"))
        .groupBy("user_id").agg(min("sec").as("c_sec"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("sec") > col("c_sec"))
        .groupBy("user_id").agg(min("sec").as("p_sec"))
      val stage = (df: DataFrame, n: Int, name: String) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n.toLong).as("stage"), lit(name).as("stage_name"),
            col("n_users"))
      stage(v, 1, "view").union(stage(c, 2, "click"))
        .union(stage(p, 3, "purchase"))
        .orderBy("stage")
    }),

    // Daily bounce rate — the engagement-health staple: what share of
    // sessions (30-min-gap sessionization, the join_interval_overlap
    // convention) end after a single event? Sessions build from ONE
    // per-user window over (sec, event_id); the census is a keyed
    // aggregate by session then by day (a session belongs to the day
    // it starts). Integer ppm share.
    "behavior_bounce_rate" -> ((s, d) => {
      val e = ev(s, d)
      val perUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
      val lagT = lag("sec", 1).over(perUser)
      val sess = e
        .withColumn("new_s",
          when(lagT.isNull || col("sec") - lagT > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          perUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("sec").as("start_s"), count(lit(1)).as("n_events"))
      sess
        .groupBy(expr("start_s div 86400").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L))
            .as("n_bounce"))
        .select(col("day"), col("n_sessions"), col("n_bounce"),
          expr("n_bounce * 1000000 div n_sessions").as("bounce_ppm"))
        .orderBy("day")
    }),

    // User-lifetime survival curve — the churn staple beside
    // cohort_weekly_retention (which grids cohort × week; this is the
    // LIFETIME DISTRIBUTION itself): for every observed lifetime t
    // (days between a user's first and last event), how many users
    // are still "at risk" at t — i.e. S(t) = |{u : lifetime(u) ≥ t}|
    // / n_users, the exact empirical survival function (the
    // Kaplan-Meier estimator with no mid-study censoring collapses to
    // exactly this). All integer: per-user min/max day aggregate →
    // value-count table keyed by lifetime → one descending cumulative
    // sum. Scale shape: the raw log shuffles once on user_id; every
    // later step runs on the lifetime-count table, whose size is
    // bounded by the CALENDAR SPAN in days — a constant-bounded
    // global window (the PlanShapeSpec category), never data-sized.
    "behavior_lifetime_survival" -> ((s, d) => {
      val life = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("user_id")
        .agg(datediff(max("day"), min("day")).cast("long")
          .as("lifetime_days"))
      val counts = life.groupBy("lifetime_days")
        .agg(count(lit(1)).as("n_ending"))
      val w = Window.orderBy(col("lifetime_days").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.withColumn("at_risk", sum("n_ending").over(w))
        .crossJoin(broadcast(life.agg(count(lit(1)).as("n_users"))))
        .select(col("lifetime_days"), col("n_ending"), col("at_risk"),
          expr("at_risk * 1000000 div n_users").as("survival_ppm"))
        .orderBy("lifetime_days")
    }),

    // Funnel latency quartiles — not just HOW MANY users convert
    // (funnel_stages) but HOW FAST: exact p25/p50/p75 of the
    // stage-to-stage delay, per transition, by rank selection over
    // the (transition, delay)-count table with the two-level bucketed
    // prefix sum (the agg_percentiles_disc discipline — a cumulative
    // partitioned only by TRANSITION would hold every distinct delay
    // of one transition, up to the calendar span in seconds, in one
    // window task; bucketing by dsec div 1000 caps within-bucket
    // windows at 1000 rows and the per-transition base window at
    // domain/1000 rows). Quartile convention: smallest delay whose
    // cumulative count reaches ⌈n·q⌉ (cum·k ≥ n integer compares —
    // no float ranks). The oracle keeps the single flat cumulative —
    // the two-level sum telescopes to the same prefix.
    "funnel_latency_quantiles" -> ((s, d) => {
      val e = ev(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("sec").as("v_sec"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("sec") > col("v_sec"))
        .groupBy("user_id").agg(min("sec").as("c_sec"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("sec") > col("c_sec"))
        .groupBy("user_id").agg(min("sec").as("p_sec"))
      val d1 = c.join(v, "user_id")
        .select(lit("1_view_to_click").as("transition"),
          (col("c_sec") - col("v_sec")).as("dsec"))
      val d2 = p.join(c, "user_id")
        .select(lit("2_click_to_purchase").as("transition"),
          (col("p_sec") - col("c_sec")).as("dsec"))
      val vc = d1.union(d2).groupBy("transition", "dsec")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("db", expr("dsec div 1000"))
      val bases = vc.groupBy("transition", "db").agg(sum("cnt").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("transition").orderBy("db")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("transition", "db", "base")
      val nTot = vc.groupBy("transition").agg(sum("cnt").as("n"))
      val cum = vc.join(broadcast(bases), Seq("transition", "db"))
        .withColumn("cum", col("base") + sum("cnt").over(
          Window.partitionBy("transition", "db").orderBy("dsec")))
        .join(broadcast(nTot), "transition")
      cum.groupBy("transition").agg(
          max("n").as("n_users"),
          min(when(col("cum") * 4 >= col("n"), col("dsec"))).as("p25_sec"),
          min(when(col("cum") * 2 >= col("n"), col("dsec"))).as("p50_sec"),
          min(when(col("cum") * 4 >= col("n") * 3, col("dsec")))
            .as("p75_sec"))
        .orderBy("transition")
    }),

    // Monthly stickiness (avg-DAU / MAU): the engagement ratio product
    // teams track — what fraction of a month's users show up on an
    // average day. All counts are exact distincts over the slim
    // (month, day, user) projection; the ratio is one float tree
    // (user_days / n_days / mau) written identically in the oracle.
    // Month from pure epoch arithmetic (30-day buckets) so both
    // engines bucket identically without calendar functions.
    "cohort_stickiness" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
        .distinct()
        .withColumn("month", expr("day div 30"))
      days.groupBy("month")
        .agg(count(lit(1)).as("user_days"),
          countDistinct("day").as("n_days"),
          countDistinct("user_id").as("mau"))
        .select(col("month"), col("user_days"), col("n_days"), col("mau"),
          (col("user_days").cast("double") / col("n_days").cast("double") /
            col("mau").cast("double")).as("stickiness"))
        .orderBy("month")
    }),

    // Weekly cohort retention: users bucketed by first-activity week,
    // counted in each later week they return. The classic retention
    // triangle; all integer week arithmetic.
    "cohort_weekly_retention" -> ((s, d) => {
      val weeks = ev(s, d)
        .select(col("user_id"), expr("sec div 604800").as("week"))
        .distinct()
      val first = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
      weeks.join(first, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Cohort LTV curve — cumulative revenue per signup cohort by
    // week-age, the lifetime-value matrix under every payback /
    // retention-economics dashboard (the revenue companion of
    // cohort_weekly_retention's activity matrix). Exact: weekly cents
    // aggregate per (cohort, age), cumulative sum over the
    // calendar-bounded (cohort × age) table only, cohort sizes from
    // the same first-week table; the per-user LTV is one final
    // division. Nothing after the first fact aggregate is data-sized.
    "cohort_ltv_curve" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_timestamp(ts) div 604800").as("week"),
          Exact.cents(col("value")).as("vc"))
      val first = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
      val sizes = first.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_size"))
      val cell = wk.join(first, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_active"),
          sum("vc").as("rev_c"))
      cell
        .withColumn("cum_c", sum("rev_c").over(
          Window.partitionBy("cohort_week").orderBy("week_offset")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .join(broadcast(sizes), "cohort_week")
        .select(col("cohort_week"), col("week_offset"),
          col("cohort_size"), col("n_active"),
          (col("rev_c") / 100.0).as("revenue"),
          (col("cum_c") / 100.0).as("cum_revenue"),
          (col("cum_c").cast("double") / 100.0 /
            col("cohort_size").cast("double")).as("ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Hourly volume anomaly detection: z-score of each hour's event
    // count against the global hourly distribution. Multiplying
    // through by n turns the z formula into pure integer arithmetic
    // under one sqrt and one divide — z = (c·n − Σc) / √(n·Σc² − Σc²)
    // — so both engines agree bit-for-bit. The stats side is a 1-row
    // broadcast; the scan collapses to hourly counts immediately.
    "ts_anomalous_hours" -> ((s, d) => {
      // lazily materialized: both the stats aggregate and the join
      // side read the tiny hourly frame instead of scanning events
      // twice (same pattern as ts_type_correlation's dense matrix)
      val hourly = Tables.events(s, d)
        .groupBy(expr("unix_timestamp(ts) div 3600").as("h"))
        .agg(count(lit(1)).as("c"))
        .truncateLineage(eager = false)
      val stats = hourly.agg(count(lit(1)).as("n"),
        sum("c").as("sc"), sum(col("c") * col("c")).as("scc"),
        max("c").as("cmax"))
      // zero variance (constant traffic) → NULL z, never NaN: Spark's
      // NaN-is-largest ordering would otherwise flag EVERY hour
      val den = sqrt((col("n") * col("scc") - col("sc") * col("sc"))
        .cast("double"))
      hourly.crossJoin(broadcast(stats))
        // integer headroom, ENFORCED: Σc² and n·scc are z-score
        // moments over DATA-DEPENDENT hourly peaks (a hot hour pulls
        // Σc² toward n·cmax²; 10¹² events over 10⁵ hours already put
        // Σc² ≈ 10¹⁹ past BIGINT) — the guarded class per the ledger's
        // dividing line; bound from the same wrap-proof count/max pass
        .withColumn("z", Exact.momentGuard(s, "ts_anomalous_hours",
          "(n_hours*cmax)^2",
          (col("n").cast("double") *
            coalesce(col("cmax"), lit(0L)).cast("double")) *
            (col("n").cast("double") *
              coalesce(col("cmax"), lit(0L)).cast("double")))(
          (col("c") * col("n") - col("sc")).cast("double")
            / when(den =!= 0.0, den)))
        .select(col("h"), col("c").as("n_events"), col("z"),
          (abs(col("z")) >= 3.0).cast("long").as("is_anomaly"))
        .orderBy("h")
    }),

    // Cross-series correlation: Pearson between the hourly count
    // series of every event-type pair — the "do these metrics move
    // together" time-series primitive. The raw events collapse to a
    // dense (hour, type) count matrix immediately (hours × types is
    // bounded — ~100k rows even for years — regardless of corpus
    // size), so the pair join never touches events. All sums are
    // exact integers; the final correlation is a fixed tree of
    // correctly-rounded IEEE ops, so both engines agree bit-for-bit.
    // A zero-variance series yields NULL (not a division crash).
    "ts_type_correlation" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(expr("unix_timestamp(ts) div 3600").as("h"), col("event_type"))
      val hours = e.select("h").distinct()
      val types = e.select("event_type").distinct()
      val counts = e.groupBy("h", "event_type").agg(count(lit(1)).as("n"))
      // lazily materialized: both self-join sides read the tiny dense
      // matrix instead of re-deriving it (3 event scans each) per side
      val dense = hours.crossJoin(broadcast(types))
        .join(counts, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .truncateLineage(eager = false)
      val a = dense.select(col("h"), col("event_type").as("ta"), col("n").as("na"))
      val b = dense.select(col("h"), col("event_type").as("tb"), col("n").as("nb"))
      val stats = a.join(b, Seq("h")).filter(col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("na")).as("sa"), sum(col("nb")).as("sb"),
          sum(col("na") * col("nb")).as("sab"),
          sum(col("na") * col("na")).as("saa"),
          sum(col("nb") * col("nb")).as("sbb"),
          max(greatest(col("na"), col("nb"))).as("cmax"))
      val da = sqrt((col("n_hours") * col("saa") - col("sa") * col("sa"))
        .cast("double"))
      val db = sqrt((col("n_hours") * col("sbb") - col("sb") * col("sb"))
        .cast("double"))
      val denom = da * db
      stats.select(col("ta"), col("tb"), col("n_hours"),
        // integer headroom, ENFORCED: the Pearson moments (Σnanb,
        // n·saa, …) square DATA-DEPENDENT hourly peaks — the same
        // hot-hour hazard as ts_anomalous_hours, guarded by the same
        // (n_hours·cmax)² bound from the wrap-proof count/max pass
        Exact.momentGuard(s, "ts_type_correlation",
          "(n_hours*cmax)^2",
          (col("n_hours").cast("double") *
            coalesce(col("cmax"), lit(0L)).cast("double")) *
            (col("n_hours").cast("double") *
              coalesce(col("cmax"), lit(0L)).cast("double")))(
          (col("n_hours") * col("sab") - col("sa") * col("sb"))
            .cast("double") / when(denom =!= 0.0, denom)).as("pearson"))
        .orderBy("ta", "tb")
    }),

    // Top event-type transitions: consecutive (prev -> curr) pairs per
    // user in event order, ranked by global frequency. The per-user
    // window sorts only within a user's own events.
    "path_top_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      ev(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("curr_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.orderBy(
          col("n").desc, col("prev_type"), col("curr_type"))).cast("long"))
        .filter(col("rk") <= 10)
        .select("rk", "prev_type", "curr_type", "n")
        .orderBy("rk")
    }),

    // Per-user EWMA of event value — the exponential-decay feature a
    // feature store computes per entity. An inherently ORDER-DEPENDENT
    // float recursion (e_i = α·x_i + (1-α)·e_{i-1}, e_0 = x_0) made
    // engine-exact: the per-user history is collected into an
    // explicitly (ts, event_id)-sorted array — bounded by the user's
    // own event count, never corpus-scale — and folded left with
    // α = 0.5 over integer-cents doubles, the same first-element-init
    // left fold DuckDB's list_reduce performs, so both engines round
    // identically at every step.
    // Audience overlap: exact Jaccard between every pair of event-type
    // user segments — the dataset-diversity / segment-dedup audit. The
    // (user, type) distinct set shuffles once on user_id and the
    // self-join is co-partitioned on that key; per-user pair fan-out is
    // bounded by C(|types|, 2), never corpus². Jaccard is one IEEE
    // divide of exact integers.
    "audience_overlap" -> ((s, d) => {
      val a = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val sizes = a.groupBy("event_type").agg(count(lit(1)).as("n"))
      val inter = a.as("x").join(a.as("y"),
          col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ta"),
          col("y.event_type").as("tb"))
        .agg(count(lit(1)).as("n_inter"))
      // EVERY pair appears, including fully-disjoint ones (jaccard 0,
      // the rows a diversity audit most wants): the pair spine is the
      // tiny sizes×sizes cross, left-joined to the intersections
      sizes.select(col("event_type").as("ta"), col("n").as("na"))
        .crossJoin(broadcast(
          sizes.select(col("event_type").as("tb"), col("n").as("nb"))))
        .filter(col("ta") < col("tb"))
        .join(inter, Seq("ta", "tb"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .select(col("ta"), col("tb"), col("na"), col("nb"), col("n_inter"),
          (col("na") + col("nb") - col("n_inter")).as("n_union"),
          (col("n_inter").cast("double") /
            (col("na") + col("nb") - col("n_inter")).cast("double"))
            .as("jaccard"))
        .orderBy("ta", "tb")
    }),

    "ts_ewma_user" -> ((s, d) => {
      // NULL values are excluded in BOTH twins: the Spark null-init
      // fold would silently RESTART the recursion at a NULL while
      // DuckDB's list_reduce NULL-poisons to the end — neither is
      // the feature anyone wants, so a null observation simply does
      // not participate. And as with behavior_pattern_regex, each
      // user is truncated to their LAST [[MaxSeqEvents]] observations
      // AS PART OF THE QUERY'S SEMANTICS (the oracle replays the same
      // rank cut): without the cap one pathological power user's
      // whole history materializes in a single collect_list buffer —
      // the OOM the regex query's cap comment warns about — while at
      // weight 0.5 an observation 4096 steps back is ~2^-4096 of the
      // answer anyway.
      val wDesc = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          graft.analytics.Exact.cents(col("value")).cast("double").as("v"))
        .withColumn("rn", row_number().over(wDesc))
        .filter(col("rn") <= MaxSeqEvents)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("v")))).as("h"))
        .select(col("user_id"), col("n_events"),
          aggregate(transform(col("h"), x => x.getField("v")),
            lit(null).cast("double"),
            (acc, v) => when(acc.isNull, v)
              .otherwise(lit(0.5) * v + lit(0.5) * acc)).as("ewma_cents"))
        .orderBy("user_id")
    }),

    // First-order Markov next-event prediction, EVALUATED out of
    // sample — the sequence-model baseline every behavior stack
    // measures before reaching for anything learned: users split
    // 80/20 by the sample_group_split hash, per-source argmax next
    // type fitted on TRAIN transitions (ties to the lexicographically
    // smallest successor — pure integer argmax via the max-struct
    // trick), accuracy scored on TEST transitions. Scale shape: one
    // lag window per user partition (the path_top_transitions
    // shape), one (src,dst)-count aggregate per split, the ≤|types|²
    // model BROADCAST back onto test transitions, and a types-sized
    // report; accuracy is the single final division.
    // Transition latency — path_top_transitions tells you WHICH
    // consecutive (prev → curr) steps users take; this prices HOW
    // LONG each step takes: exact count, mean, and median delay per
    // transition pair. Median by rank selection over the
    // (pair, delay)-count table (the funnel_latency_quantiles
    // convention: smallest delay whose doubled cumulative count
    // reaches n), with the same two-level dsec div 1000 bucketing —
    // the windows are the per-user lag (bounded by a user's own
    // events), within-bucket cumulatives (≤ 1000 rows), and per-pair
    // base windows over the delay domain ÷ 1000 — nothing global,
    // nothing raw-row. Mean is one IEEE divide of exact integer sums.
    "path_transition_latency" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val tr = ev(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_sec", lag(col("sec"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type").as("curr_type"),
          (col("sec") - col("prev_sec")).as("dsec"))
      val vc = tr.groupBy("prev_type", "curr_type", "dsec")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("db", expr("dsec div 1000"))
      val bases = vc.groupBy("prev_type", "curr_type", "db")
        .agg(sum("cnt").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("prev_type", "curr_type").orderBy("db")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("prev_type", "curr_type", "db", "base")
      val nTot = vc.groupBy("prev_type", "curr_type")
        .agg(sum("cnt").as("n"))
      val cum = vc
        .join(broadcast(bases), Seq("prev_type", "curr_type", "db"))
        .withColumn("cum", col("base") + sum("cnt").over(
          Window.partitionBy("prev_type", "curr_type", "db")
            .orderBy("dsec")))
        .join(broadcast(nTot), Seq("prev_type", "curr_type"))
      cum.groupBy("prev_type", "curr_type").agg(
          max("n").as("n_transitions"),
          sum(col("cnt") * col("dsec")).as("total_sec"),
          min(when(col("cum") * 2 >= col("n"), col("dsec")))
            .as("p50_sec"))
        .withColumn("mean_sec", col("total_sec").cast("double") /
          col("n_transitions").cast("double"))
        .select("prev_type", "curr_type", "n_transitions", "total_sec",
          "p50_sec", "mean_sec")
        .orderBy("prev_type", "curr_type")
    }),

    // Sequential-pattern support mining (the 2-sequence core of
    // AGRAWAL/Srikant-style sequence mining, kept exact): pattern
    // a → b is supported by a user iff SOME a-event precedes SOME
    // b-event in their stream. "Precedes" is the (sec, event_id)
    // lexicographic order every behavior query uses, encoded as a
    // zero-padded sortable string key so ONE min/max aggregate per
    // (user, type) captures everything the containment test needs:
    // supp(a→b, u) ⇔ min_key(a-events of u) < max_key(b-events of u).
    // Scale shape: events collapse to ≤ |users|·|types| (user, type)
    // rows in one shuffle; the pair test is a user-co-partitioned
    // self-join with C(|types|,2)-bounded fan per user (the
    // audience_overlap discipline); support/confidence are integer
    // ppm over broadcast 1-row / |types|-row aggregates. No window,
    // no event×event join, nothing data-sized after the first agg.
    "behavior_seq2_support" -> ((s, d) => {
      // Key-width contract: both pads are 19 digits — the full width
      // of a non-negative int64 — so the string order equals numeric
      // order for ANY non-negative (sec, event_id), not just the
      // fixture's range (epoch seconds are post-1970 and event ids
      // are sequence-assigned, so both are ≥ 0 by schema). Must match
      // the oracle's lpad widths exactly.
      val e = ev(s, d).withColumn("k",
        concat(lpad(col("sec").cast("string"), 19, "0"), lit("|"),
          lpad(col("event_id").cast("string"), 19, "0")))
      val ut = e.groupBy("user_id", "event_type")
        .agg(min("k").as("kmin"), max("k").as("kmax"))
      val tot = e.agg(countDistinct("user_id").as("n_total"))
      val perType = ut.groupBy("event_type")
        .agg(count(lit(1)).as("n_users_a"))
      val sup = ut.select(col("user_id"), col("event_type").as("a"),
          col("kmin"))
        .join(ut.select(col("user_id"), col("event_type").as("b"),
          col("kmax")), "user_id")
        .filter(col("a") =!= col("b") && col("kmin") < col("kmax"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_users"))
      sup
        .join(broadcast(perType.select(col("event_type").as("a"),
          col("n_users_a"))), "a")
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("n_users"), col("n_users_a"),
          col("n_total"),
          expr("n_users * 1000000 div n_total").as("support_ppm"),
          expr("n_users * 1000000 div n_users_a").as("confidence_ppm"))
        .orderBy("a", "b")
    }),

    // Sequence PATTERN MATCHING over per-user event streams — the
    // MATCH_RECOGNIZE workload (SQL:2016 row-pattern recognition,
    // re-expressed Spark-first): each user's ordered stream collapses
    // to a compact symbol string (one letter per event type — the
    // alphabet is the 5 fixed types, initials distinct by fixture
    // contract), and each pattern is a regex counted with
    // non-overlapping leftmost matches. Pattern design keeps the
    // count ENGINE-AGNOSTIC: fixed terminators and negated classes
    // (`v[^p]*p`) have a unique match set under both leftmost-greedy
    // (Java) and RE2 (DuckDB) semantics — no backtracking ambiguity.
    // Scale shape: ONE user-keyed shuffle builds the strings
    // (collect_list + sort_array, capped at [[MaxSeqEvents]] events —
    // the cap is part of the semantics and the oracle replays it via
    // row_number ≤ cap); matching is map-only over user-count rows;
    // the census is a 3-row aggregate. Nothing downstream of the
    // first shuffle is event-sized.
    "behavior_pattern_regex" -> ((s, d) => {
      // the cap is enforced BEFORE collect_list (row_number ≤ cap,
      // exactly the oracle's rn filter) so the aggregation buffer is
      // truly bounded — a slice after collection would still
      // materialize a pathological user's full array in one task
      val seqs = ev(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("sec", "event_id")))
        .filter(col("rn") <= MaxSeqEvents)
        .select(col("user_id"),
          struct(col("sec"), col("event_id"),
            substring(col("event_type"), 1, 1).as("ch")).as("e"))
        .groupBy("user_id")
        .agg(concat_ws("", transform(sort_array(collect_list("e")),
          x => x.getField("ch"))).as("sq"))
      val scored = seqs.select(col("user_id") +:
        PatternRegexes.map { case (name, rx) =>
          size(regexp_extract_all(col("sq"), lit(rx), lit(0)))
            .cast("long").as(name)
        }: _*)
      val stackArgs = PatternRegexes
        .map { case (name, _) => s"'$name', $name" }.mkString(", ")
      scored
        .select(expr(s"stack(${PatternRegexes.size}, $stackArgs)" +
          " as (pattern, m)"))
        .groupBy("pattern").agg(
          sum(when(col("m") > 0L, 1L).otherwise(0L)).as("n_users"),
          sum("m").as("n_matches"))
        .orderBy("pattern")
    }),

    "behavior_markov_eval" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val tr = ev(s, d)
        .withColumn("split",
          when(pmod(xxhash64(concat(lit("grp:"),
            col("user_id").cast("string"))), lit(10L)) < 8L, "train")
            .otherwise("test"))
        .withColumn("src", lag(col("event_type"), 1).over(w))
        .filter(col("src").isNotNull)
        .select(col("split"), col("src"), col("event_type").as("dst"))
      val trainCnt = tr.filter(col("split") === "train")
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      val model = trainCnt.withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy(col("n").desc, col("dst"))))
        .filter(col("rk") === 1)
        .select(col("src"), col("dst").as("predicted_next"))
      val nTrain = trainCnt.groupBy("src").agg(sum("n").as("n_train"))
      val evalCnt = tr.filter(col("split") === "test")
        .join(broadcast(model), Seq("src"), "left")
        .groupBy("src").agg(count(lit(1)).as("n_test"),
          sum(when(col("dst") === col("predicted_next"), 1L)
            .otherwise(0L)).as("n_correct"))
      nTrain.join(model, Seq("src")).join(evalCnt, Seq("src"), "left")
        .select(col("src").as("src_type"), col("n_train"),
          col("predicted_next"),
          coalesce(col("n_test"), lit(0L)).as("n_test"),
          coalesce(col("n_correct"), lit(0L)).as("n_correct"))
        .withColumn("accuracy",
          when(col("n_test") === 0L, lit(null).cast("double"))
            .otherwise(col("n_correct").cast("double") /
              col("n_test").cast("double")))
        .orderBy("src_type")
    }))

  private val secSql = "CAST(floor(epoch(ts)) AS BIGINT)"

  def oracles: Map[String, String] = Map(
    "behavior_attribution" ->
      s"""WITH p AS (
         |  SELECT user_id, event_id AS pid,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS pt,
         |    CAST(round("value" * 100) AS BIGINT) AS vc
         |  FROM events
         |  WHERE event_type = 'purchase' AND "value" IS NOT NULL),
         |c AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ct
         |  FROM events WHERE event_type = 'click'),
         |t AS (
         |  SELECT p.user_id, p.pid, p.vc, CAST(count(*) AS BIGINT)
         |    AS n_touches
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND c.ct > p.pt - $AttribWindowSec AND c.ct <= p.pt
         |  GROUP BY 1, 2, 3)
         |SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_purchases,
         |  CAST(sum(CASE WHEN t.n_touches IS NOT NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         |  CAST(sum(CASE WHEN t.n_touches IS NOT NULL
         |           THEN p.vc ELSE 0 END) AS BIGINT) AS attributed_cents,
         |  CAST(sum(coalesce(t.n_touches, 0)) AS BIGINT)
         |    AS n_click_touches
         |FROM p LEFT JOIN t ON t.pid = p.pid
         |GROUP BY p.user_id
         |HAVING sum(CASE WHEN t.n_touches IS NOT NULL
         |           THEN 1 ELSE 0 END) > 0
         |ORDER BY p.user_id""".stripMargin,

    "behavior_bounce_rate" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, $secSql AS sec FROM events),
         |x AS (
         |  SELECT *, CASE WHEN lag(sec) OVER
         |      (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
         |      OR sec - lag(sec) OVER
         |      (PARTITION BY user_id ORDER BY sec, event_id) > 1800
         |    THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sx AS (
         |  SELECT *, sum(new_s) OVER
         |      (PARTITION BY user_id ORDER BY sec, event_id
         |       ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x),
         |sess AS (
         |  SELECT user_id, sid, min(sec) AS start_s,
         |    count(*) AS n_events
         |  FROM sx GROUP BY user_id, sid)
         |SELECT start_s // 86400 AS day,
         |  CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bounce,
         |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS bounce_ppm
         |FROM sess GROUP BY 1 ORDER BY day""".stripMargin,

    "behavior_lifetime_survival" ->
      """WITH life AS (
        |  SELECT user_id,
        |    CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) AS BIGINT)
        |      AS lifetime_days
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT lifetime_days, CAST(count(*) AS BIGINT) AS n_ending
        |  FROM life GROUP BY lifetime_days),
        |n AS (SELECT count(*) AS n_users FROM life),
        |cum AS (
        |  SELECT lifetime_days, n_ending,
        |    CAST(sum(n_ending) OVER (ORDER BY lifetime_days DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk
        |  FROM c)
        |SELECT lifetime_days, n_ending, at_risk,
        |  CAST(at_risk * 1000000 // n_users AS BIGINT) AS survival_ppm
        |FROM cum, n ORDER BY lifetime_days""".stripMargin,

    "funnel_latency_quantiles" ->
      s"""WITH e AS (SELECT user_id, event_type, $secSql AS sec FROM events),
         |v AS (SELECT user_id, min(sec) AS v_sec FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.sec) AS c_sec
         |      FROM e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.sec > v.v_sec
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.sec) AS p_sec
         |      FROM e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.sec > c.c_sec
         |      GROUP BY e.user_id),
         |ds AS (
         |  SELECT '1_view_to_click' AS transition,
         |    c.c_sec - v.v_sec AS dsec
         |  FROM c JOIN v USING (user_id)
         |  UNION ALL
         |  SELECT '2_click_to_purchase' AS transition,
         |    p.p_sec - c.c_sec AS dsec
         |  FROM p JOIN c USING (user_id)),
         |vc AS (SELECT transition, dsec, count(*) AS cnt
         |       FROM ds GROUP BY 1, 2),
         |cum AS (
         |  SELECT transition, dsec,
         |    sum(cnt) OVER (PARTITION BY transition ORDER BY dsec) AS cum,
         |    sum(cnt) OVER (PARTITION BY transition) AS n
         |  FROM vc)
         |SELECT transition, CAST(max(n) AS BIGINT) AS n_users,
         |  CAST(min(CASE WHEN cum * 4 >= n THEN dsec END) AS BIGINT)
         |    AS p25_sec,
         |  CAST(min(CASE WHEN cum * 2 >= n THEN dsec END) AS BIGINT)
         |    AS p50_sec,
         |  CAST(min(CASE WHEN cum * 4 >= n * 3 THEN dsec END) AS BIGINT)
         |    AS p75_sec
         |FROM cum GROUP BY transition ORDER BY transition""".stripMargin,

    "funnel_stages" ->
      s"""WITH e AS (SELECT user_id, event_type, $secSql AS sec FROM events),
         |v AS (SELECT user_id, min(sec) AS v_sec FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.sec) AS c_sec
         |      FROM e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.sec > v.v_sec
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.sec) AS p_sec
         |      FROM e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.sec > c.c_sec
         |      GROUP BY e.user_id)
         |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
         |  count(*) AS n_users FROM v
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM c
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM p
         |ORDER BY stage""".stripMargin,

    "cohort_stickiness" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        |  FROM events),
        |m AS (SELECT user_id, day, day // 30 AS month FROM days)
        |SELECT month, CAST(count(*) AS BIGINT) AS user_days,
        |  CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
        |  CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT day) AS DOUBLE)
        |    / CAST(count(DISTINCT user_id) AS DOUBLE) AS stickiness
        |FROM m GROUP BY month ORDER BY month""".stripMargin,

    "cohort_weekly_retention" ->
      s"""WITH weeks AS (
         |  SELECT DISTINCT user_id, $secSql // 604800 AS week FROM events),
         |first AS (SELECT user_id, min(week) AS cohort_week
         |          FROM weeks GROUP BY user_id)
         |SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
         |  count(DISTINCT w.user_id) AS n_users
         |FROM weeks w JOIN first f ON w.user_id = f.user_id
         |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "ts_anomalous_hours" ->
      s"""WITH hourly AS (
         |  SELECT $secSql // 3600 AS h, count(*) AS c
         |  FROM events GROUP BY 1),
         |st AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sc,
         |         CAST(sum(c * c) AS BIGINT) AS scc
         |       FROM hourly)
         |SELECT h, c AS n_events,
         |  CAST(c * n - sc AS DOUBLE)
         |    / nullif(sqrt(CAST(n * scc - sc * sc AS DOUBLE)), 0.0) AS z,
         |  CAST(abs(CAST(c * n - sc AS DOUBLE)
         |    / nullif(sqrt(CAST(n * scc - sc * sc AS DOUBLE)), 0.0)) >= 3.0
         |    AS BIGINT) AS is_anomaly
         |FROM hourly CROSS JOIN st ORDER BY h""".stripMargin,

    "ts_type_correlation" ->
      s"""WITH e AS (
         |  SELECT $secSql // 3600 AS h, event_type FROM events),
         |hours AS (SELECT DISTINCT h FROM e),
         |types AS (SELECT DISTINCT event_type FROM e),
         |counts AS (SELECT h, event_type, count(*) AS n FROM e GROUP BY 1, 2),
         |dense AS (
         |  SELECT hours.h, types.event_type, coalesce(c.n, 0) AS n
         |  FROM hours CROSS JOIN types LEFT JOIN counts c
         |    ON c.h = hours.h AND c.event_type = types.event_type),
         |s AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb,
         |    count(*) AS n_hours,
         |    CAST(sum(a.n) AS BIGINT) AS sa, CAST(sum(b.n) AS BIGINT) AS sb,
         |    CAST(sum(a.n * b.n) AS BIGINT) AS sab,
         |    CAST(sum(a.n * a.n) AS BIGINT) AS saa,
         |    CAST(sum(b.n * b.n) AS BIGINT) AS sbb
         |  FROM dense a JOIN dense b
         |    ON a.h = b.h AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT ta, tb, n_hours,
         |  CAST(n_hours * sab - sa * sb AS DOUBLE)
         |    / nullif(sqrt(CAST(n_hours * saa - sa * sa AS DOUBLE))
         |             * sqrt(CAST(n_hours * sbb - sb * sb AS DOUBLE)), 0.0)
         |    AS pearson
         |FROM s ORDER BY ta, tb""".stripMargin,

    "path_top_transitions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, $secSql AS sec FROM events),
         |t AS (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS prev_type,
         |    event_type AS curr_type
         |  FROM e),
         |c AS (SELECT prev_type, curr_type, count(*) AS n FROM t
         |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (
         |    ORDER BY n DESC, prev_type, curr_type) AS rk FROM c)
         |SELECT rk, prev_type, curr_type, n FROM r WHERE rk <= 10
         |ORDER BY rk""".stripMargin,

    "audience_overlap" ->
      """WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, count(*) AS n FROM a GROUP BY 1),
        |i AS (
        |  SELECT x.event_type AS ta, y.event_type AS tb,
        |    count(*) AS n_inter
        |  FROM a x JOIN a y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT sa.event_type AS ta, sb.event_type AS tb,
        |  sa.n AS na, sb.n AS nb,
        |  coalesce(i.n_inter, 0) AS n_inter,
        |  sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union,
        |  CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
        |    CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS DOUBLE) AS jaccard
        |FROM sz sa JOIN sz sb ON sa.event_type < sb.event_type
        |LEFT JOIN i ON i.ta = sa.event_type AND i.tb = sb.event_type
        |ORDER BY ta, tb""".stripMargin,

    // list_reduce left-folds with the first element as init — exactly
    // the Spark null-init fold's semantics; the ordered list pins the
    // recursion order so both engines round identically
    "ts_ewma_user" ->
      s"""WITH r AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value*100) AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE value IS NOT NULL)
        |SELECT user_id, count(*) AS n_events,
        |  list_reduce(list(v ORDER BY ts, event_id),
        |    (acc, x) -> 0.5*x + 0.5*acc) AS ewma_cents
        |FROM r WHERE rn <= $MaxSeqEvents
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "path_transition_latency" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, $secSql AS sec
         |  FROM events),
         |t AS (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS prev_type,
         |    event_type AS curr_type,
         |    sec - lag(sec) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS dsec
         |  FROM e),
         |tf AS (SELECT * FROM t WHERE prev_type IS NOT NULL),
         |vc AS (SELECT prev_type, curr_type, dsec,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM tf GROUP BY 1, 2, 3),
         |cum AS (
         |  SELECT prev_type, curr_type, dsec, cnt,
         |    sum(cnt) OVER (PARTITION BY prev_type, curr_type
         |      ORDER BY dsec) AS cum,
         |    sum(cnt) OVER (PARTITION BY prev_type, curr_type) AS n
         |  FROM vc)
         |SELECT prev_type, curr_type,
         |  CAST(max(n) AS BIGINT) AS n_transitions,
         |  CAST(sum(cnt * dsec) AS BIGINT) AS total_sec,
         |  CAST(min(CASE WHEN cum * 2 >= n THEN dsec END) AS BIGINT)
         |    AS p50_sec,
         |  CAST(sum(cnt * dsec) AS DOUBLE) / CAST(max(n) AS DOUBLE)
         |    AS mean_sec
         |FROM cum GROUP BY prev_type, curr_type
         |ORDER BY prev_type, curr_type""".stripMargin,

    "behavior_seq2_support" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    lpad(CAST($secSql AS VARCHAR), 19, '0') || '|' ||
         |      lpad(CAST(event_id AS VARCHAR), 19, '0') AS k
         |  FROM events),
         |ut AS (
         |  SELECT user_id, event_type, min(k) AS kmin, max(k) AS kmax
         |  FROM e GROUP BY user_id, event_type),
         |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
         |  AS n_total FROM e),
         |pt AS (SELECT event_type, CAST(count(*) AS BIGINT)
         |  AS n_users_a FROM ut GROUP BY event_type),
         |sup AS (
         |  SELECT x.event_type AS a, y.event_type AS b,
         |    CAST(count(*) AS BIGINT) AS n_users
         |  FROM ut x JOIN ut y ON x.user_id = y.user_id
         |    AND x.event_type <> y.event_type AND x.kmin < y.kmax
         |  GROUP BY 1, 2)
         |SELECT sup.a, sup.b, sup.n_users, pt.n_users_a, tot.n_total,
         |  CAST(sup.n_users * 1000000 // tot.n_total AS BIGINT)
         |    AS support_ppm,
         |  CAST(sup.n_users * 1000000 // pt.n_users_a AS BIGINT)
         |    AS confidence_ppm
         |FROM sup JOIN pt ON pt.event_type = sup.a CROSS JOIN tot
         |ORDER BY a, b""".stripMargin,

    "cohort_ltv_curve" ->
      s"""WITH wk AS (
         |  SELECT user_id, $secSql // 604800 AS week,
         |    ${graft.analytics.Exact.centsSql("\"value\"")} AS vc
         |  FROM events),
         |first AS (SELECT user_id, min(week) AS cohort_week
         |          FROM wk GROUP BY user_id),
         |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT)
         |            AS cohort_size
         |          FROM first GROUP BY cohort_week),
         |cell AS (
         |  SELECT f.cohort_week, wk.week - f.cohort_week AS week_offset,
         |    CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_active,
         |    CAST(sum(vc) AS BIGINT) AS rev_c
         |  FROM wk JOIN first f ON wk.user_id = f.user_id
         |  GROUP BY 1, 2),
         |cum AS (
         |  SELECT cohort_week, week_offset, n_active, rev_c,
         |    CAST(sum(rev_c) OVER (PARTITION BY cohort_week
         |      ORDER BY week_offset ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_c
         |  FROM cell)
         |SELECT cum.cohort_week, week_offset, sizes.cohort_size,
         |  n_active, rev_c / 100.0 AS revenue,
         |  cum_c / 100.0 AS cum_revenue,
         |  CAST(cum_c AS DOUBLE) / 100.0 /
         |    CAST(sizes.cohort_size AS DOUBLE) AS ltv_per_user
         |FROM cum JOIN sizes ON cum.cohort_week = sizes.cohort_week
         |ORDER BY cum.cohort_week, week_offset""".stripMargin,

    // The click⋈purchase leg is deliberately the naive theta join —
    // the hash proves the engine's hour-banding exact, as in
    // behavior_attribution.
    "behavior_attribution_models" -> {
      val credits = Seq(
        "last_touch" -> "CASE WHEN i = k THEN 1000000 ELSE 0 END",
        "linear" -> "1000000 // k",
        "time_decay" -> "dw * 1000000 // sw",
        "u_shaped" -> ("CASE WHEN k = 1 THEN 1000000 " +
          "WHEN k = 2 THEN 500000 " +
          "WHEN i = 1 OR i = k THEN 400000 " +
          "ELSE 200000 // (k - 2) END"))
      val arms = credits.map { case (name, cr) =>
        s"""SELECT '$name' AS model, ct // 3600 % 24 AS hour_of_day,
           |  CAST($cr AS BIGINT) AS credit FROM sc""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH p AS (
         |  SELECT user_id, event_id AS pid, $secSql AS pt
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS cid, $secSql AS ct
         |  FROM events WHERE event_type = 'click'),
         |t AS (
         |  SELECT p.pid, c.cid, p.pt, c.ct
         |  FROM p JOIN c ON p.user_id = c.user_id
         |    AND c.ct > p.pt - $AttribWindowSec AND c.ct <= p.pt),
         |sc AS (
         |  SELECT pid, cid, pt, ct,
         |    CAST(row_number() OVER (PARTITION BY pid ORDER BY ct, cid)
         |      AS BIGINT) AS i,
         |    CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS k,
         |    CAST(CAST(8 AS BIGINT) >> CAST((pt - ct) // 900 AS INTEGER)
         |      AS BIGINT) AS dw,
         |    CAST(sum(CAST(8 AS BIGINT) >> CAST((pt - ct) // 900
         |      AS INTEGER)) OVER (PARTITION BY pid) AS BIGINT) AS sw
         |  FROM t)
         |SELECT model, hour_of_day, CAST(count(*) AS BIGINT) AS n_touches,
         |  CAST(sum(credit) AS BIGINT) AS credit_ppm
         |FROM ($arms)
         |GROUP BY model, hour_of_day ORDER BY model, hour_of_day""".stripMargin
    },

    "behavior_pattern_regex" -> {
      val spine = PatternRegexes
        .map { case (n, rx) => s"('$n', '$rx')" }.mkString(", ")
      s"""WITH e AS (
         |  SELECT user_id, substr(event_type, 1, 1) AS ch,
         |    $secSql AS sec, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY $secSql, event_id) AS rn
         |  FROM events),
         |seqs AS (
         |  SELECT user_id, string_agg(ch, '' ORDER BY sec, event_id) AS sq
         |  FROM e WHERE rn <= $MaxSeqEvents GROUP BY user_id),
         |pat AS (SELECT * FROM (VALUES $spine) t(pattern, rx)),
         |m AS (SELECT pat.pattern,
         |        len(regexp_extract_all(seqs.sq, pat.rx)) AS m
         |      FROM seqs CROSS JOIN pat)
         |SELECT pattern,
         |  CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_users,
         |  CAST(sum(m) AS BIGINT) AS n_matches
         |FROM m GROUP BY pattern ORDER BY pattern""".stripMargin
    },

    "behavior_markov_eval" ->
      s"""WITH gsrc AS (
         |  SELECT user_id, event_id, event_type, $secSql AS sec,
         |    'grp:' || CAST(user_id AS VARCHAR) AS s0
         |  FROM events),
         |${graft.llm.XxhSql.ctes("gsrc",
             Seq("user_id", "event_id", "event_type", "sec"), "s0", "ms")},
         |tr AS (
         |  SELECT CASE WHEN ((hv % 10) + 10) % 10 < 8
         |      THEN 'train' ELSE 'test' END AS split,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS src,
         |    event_type AS dst
         |  FROM ms_out),
         |trf AS (SELECT * FROM tr WHERE src IS NOT NULL),
         |tc AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         |  FROM trf WHERE split = 'train' GROUP BY src, dst),
         |model AS (SELECT src, dst AS predicted_next FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |      ORDER BY n DESC, dst) AS rk FROM tc)
         |  WHERE rk = 1),
         |nt AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_train
         |  FROM tc GROUP BY src),
         |ev AS (SELECT t.src, CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN t.dst = m.predicted_next
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |  FROM trf t LEFT JOIN model m ON m.src = t.src
         |  WHERE t.split = 'test' GROUP BY t.src)
         |SELECT nt.src AS src_type, nt.n_train, model.predicted_next,
         |  CAST(coalesce(ev.n_test, 0) AS BIGINT) AS n_test,
         |  CAST(coalesce(ev.n_correct, 0) AS BIGINT) AS n_correct,
         |  CASE WHEN coalesce(ev.n_test, 0) = 0 THEN NULL
         |       ELSE CAST(ev.n_correct AS DOUBLE) /
         |            CAST(ev.n_test AS DOUBLE) END AS accuracy
         |FROM nt JOIN model USING (src) LEFT JOIN ev USING (src)
         |ORDER BY src_type""".stripMargin)
}
