package graft.analytics

import graft.Lineage.LineageOps
import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling and distribution-audit operators — the checks a
  * pipeline runs on every new snapshot BEFORE training jobs consume
  * it: referential integrity, per-column profiles, distribution
  * shape (Benford, Gini), segment comparison (Welch), and changepoint
  * localization (CUSUM).
  *
  * Determinism follows the suite-wide integer-moments contract
  * (StatQueries scaladoc): every aggregate is an exact BIGINT; floats
  * appear only in final correctly-rounded divisions/sqrt, written with
  * the identical expression tree in the DuckDB oracle.
  */
object ProfileQueries extends QuerySuite {

  /** One foreign-key census row: child rows, orphans (child keys with
    * no parent). The parent side is reduced to DISTINCT keys before
    * the join, so the probe is key-sized; at warehouse scale the big
    * fact-side relations shuffle on the key once — the same shape as
    * the join they exist to pre-validate. */
  private def fk(name: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(ck).as("k"))
      .join(parent.select(col(pk).as("k")).distinct()
        .withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))

  private def fkSql(name: String, child: String, ck: String,
      parent: String, pk: String): String =
    s"""SELECT '$name' AS relation,
       |  CAST(count(*) AS BIGINT) AS n_child,
       |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_orphans
       |FROM $child c LEFT JOIN
       |  (SELECT DISTINCT $pk AS k FROM $parent) p ON c.$ck = p.k""".stripMargin

  /** Per-column profile row over `events`: nulls + exact distincts. */
  private val profCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** SAX frame: hours aggregated per PAA window (ts_sax_motifs). */
  val SaxWindowHours = 6L

  /** Rolling-correlation frame: trailing OBSERVED days per window —
    * a ROWS frame over the inner-joined day table, so a day missing
    * either series doesn't occupy a slot (on gappy data the window
    * spans more than 14 calendar days by design; a RANGE frame would
    * be the calendar-strict variant). */
  val RollCorrDays = 14

  /** SAX alphabet breakpoints in integer CENTS over the PAA value —
    * fixed constants bracketing the fixture's ~5000-cent mean, giving
    * a 4-letter alphabet (a < b < c < d). Fixed (not data-derived)
    * breakpoints keep the symbols engine-exact and windows
    * independently scorable — the streaming-friendly SAX variant. */
  val SaxBreaks = Seq(4500L, 5000L, 5500L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Referential-integrity census over the whole star schema: every
    // FK edge, its child cardinality and orphan count — the gate that
    // runs before any snapshot is published. Each relation is one
    // keyed left join against the parent's distinct keys; the 7 tiny
    // (1-row) results union at the end, so the plan is 7 independent
    // key-shuffles, nothing global.
    "dq_referential_orphans" -> ((s, d) => {
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      val c = Tables.customer(s, d); val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d); val r = Tables.region(s, d)
      val p = Tables.part(s, d)
      fk("customer_nation", c, "c_nationkey", n, "n_nationkey")
        .unionByName(fk("lineitem_orders", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(fk("lineitem_part", li, "l_partkey", p, "p_partkey"))
        .unionByName(fk("lineitem_supplier", li, "l_suppkey", su, "s_suppkey"))
        .unionByName(fk("nation_region", n, "n_regionkey", r, "r_regionkey"))
        .unionByName(fk("orders_customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(fk("supplier_nation", su, "s_nationkey", n, "n_nationkey"))
        .orderBy("relation")
    }),

    // Per-column profile of the events stream: rows, nulls, exact
    // distinct counts — the schema-drift monitor. One aggregate with
    // N count-distincts (Spark plans the standard expand — one pass
    // over the fact table, rows × N in the shuffle but only the
    // PROFILED COLUMN's bytes per lane), then an in-memory unpivot of
    // the single 1-row result.
    "dq_null_profile" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val one = ev.agg(count(lit(1)).as("n_rows"),
        profCols.flatMap(c => Seq(
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"))): _*)
      one.select(col("n_rows"), explode(array(profCols.map(c =>
          struct(lit(c).as("column_name"), col(s"nn_$c").as("n_nulls"),
            col(s"nd_$c").as("n_distinct"))): _*)).as("p"))
        .select(col("p.column_name").as("column_name"), col("n_rows"),
          col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"))
        .orderBy("column_name")
    }),

    // Benford leading-digit CENSUS of order totals — the classic
    // fabricated-data screen's raw distribution (dq_benford in
    // ExtendedQueries is the scored TEST: per-event-type grid vs the
    // log10(1+1/d) expectation with deviations). The digit comes from
    // the DECIMAL STRING of exact integer cents (never float log10,
    // whose boundary rounding differs per libm); share is integer
    // ppm. One groupBy on a 9-value key + a broadcast 1-row total.
    "stat_benford_digits" -> ((s, d) => {
      val c = Exact.cents(col("o_totalprice"))
      val byDigit = Tables.orders(s, d)
        .select(substring(c.cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      byDigit.crossJoin(broadcast(byDigit.agg(sum("n").as("total"))))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div total").as("share_ppm"))
        .orderBy("digit")
    }),

    // Gini coefficient of document length per source — the corpus
    // inequality audit (is one crawl shard dominating the token
    // budget?). Exact rank formulation G = (2·Σi·x_i − (n+1)·Σx_i) /
    // (n·Σx_i) over lengths ranked ascending within source: one
    // per-source window sort + one aggregate, both keyed on source.
    // Headroom: Σi·x_i grows as n²·x̄ per source, so past ~10^6 docs
    // per source the two sums swap to DECIMAL(38,0) (same plan shape,
    // StatQueries scaladoc convention).
    "stat_gini_sources" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sx"),
          sum(col("i") * col("n_chars")).as("six"))
        .select(col("source"), col("n_docs"),
          // a source of only empty documents (Σ n_chars = 0) is
          // 0.0/0.0: ANSI abort in Spark, NaN in DuckDB — dispersion
          // of nothing is undefined, NULL in both twins
          ((lit(2L) * col("six") - (col("n_docs") + 1L) * col("sx"))
            .cast("double") /
            when(col("sx") === 0L, lit(null).cast("long"))
              .otherwise(col("n_docs") * col("sx")).cast("double"))
            .as("gini"))
        .orderBy("source")
    }),

    // Welch's t between weekend and weekday event values per type —
    // the segment-shift detector (unequal variances, unequal n).
    // Weekend from pure epoch-day arithmetic ((day+4) mod 7 ∈ {0,6},
    // 0=Sunday) so both engines agree without timezone/locale DOW
    // functions. Whole-unit quantization keeps n·Σx² in BIGINT
    // headroom (StatQueries scaladoc); t's float tree — two means,
    // two exact-ratio variances, one sqrt — is written identically in
    // the oracle, so the hash matches bit-for-bit. Degenerate sides
    // (n<2 or both variances 0) emit NULL.
    "stat_welch_ttest" -> ((s, d) => {
      val dow = (floor(unix_timestamp(col("ts")) / 86400L) + 4L) % 7L
      // value IS NOT NULL in BOTH twins: an unfiltered NULL value
      // would enter the group COUNTS but not the moment SUMS, biasing
      // mean/variance with an inconsistent n - and both engines would
      // agree on the wrong statistic, so the hash could not catch it
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"),
        (dow === 0L || dow === 6L).as("wkend"),
        round(col("value"), 0).cast("long").as("x"))
      val m = ev.groupBy("event_type").agg(
        sum(when(!col("wkend"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("wkend"), col("x")).otherwise(0L)).as("sx1"),
        sum(when(!col("wkend"), col("x") * col("x")).otherwise(0L)).as("sq1"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("wkend"), col("x")).otherwise(0L)).as("sx2"),
        sum(when(col("wkend"), col("x") * col("x")).otherwise(0L)).as("sq2"))
      def a(n: Column, sx: Column, sq: Column) = n * sq - sx * sx
      val a1 = a(col("n1"), col("sx1"), col("sq1"))
      val a2 = a(col("n2"), col("sx2"), col("sq2"))
      val d1 = col("n1") * col("n1") * (col("n1") - 1L)
      val d2 = col("n2") * col("n2") * (col("n2") - 1L)
      m.select(col("event_type"), col("n1"), col("n2"),
        when(col("n1") < 2L || col("n2") < 2L || (a1 === 0L && a2 === 0L),
          lit(null).cast("double"))
          .otherwise(
            (col("sx1").cast("double") / col("n1").cast("double") -
              col("sx2").cast("double") / col("n2").cast("double")) /
            sqrt(a1.cast("double") / d1.cast("double") +
              a2.cast("double") / d2.cast("double"))).as("t_stat"))
        .orderBy("event_type")
    }),

    // Higher moments per event type — skewness g1, excess kurtosis
    // g2, and the SAS bimodality coefficient (g1²+1)/(g2+3): the
    // distribution-SHAPE profile beside the location (z-score/
    // percentile) and spread (MAD/Brown–Forsythe) families; bc >
    // ~0.55 flags a two-regime metric whose mean is a lie. Exactness
    // contract: values quantize to whole TENS (x = round(v)/10 via
    // floor(v/10 + 0.5) on the rounded value — keeping Σx⁴ inside
    // BIGINT at 10⁶ rows/group; tens are the defined semantics, both
    // engines compute them identically), the four power sums S1..S4
    // are exact BIGINTs, and the central moments are ONE fixed float
    // tree over those integers mirrored operation-for-operation in
    // the oracle (m2^1.5 spelled m2·√m2 — pow() is banned with log()
    // for not being correctly rounded). Scale shape: a single
    // map-side-combined aggregate, no join, no window.
    "stat_higher_moments" -> ((s, d) => {
      val x = floor(round(col("value"), 0) / 10.0 + 0.5).cast("long")
      val m = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), x.as("x"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      val nD = col("n").cast("double")
      val mu = col("s1").cast("double") / nD
      val m2 = col("s2").cast("double") / nD - mu * mu
      val m3 = col("s3").cast("double") / nD -
        lit(3.0) * mu * (col("s2").cast("double") / nD) +
        lit(2.0) * mu * mu * mu
      val m4 = col("s4").cast("double") / nD -
        lit(4.0) * mu * (col("s3").cast("double") / nD) +
        lit(6.0) * mu * mu * (col("s2").cast("double") / nD) -
        lit(3.0) * mu * mu * mu * mu
      val g1 = m3 / (m2 * sqrt(m2))
      val g2 = m4 / (m2 * m2) - lit(3.0)
      val bad = col("n") < 2L ||
        (col("n") * col("s2") - col("s1") * col("s1")) === 0L
      m.select(col("event_type"), col("n"),
        when(bad, lit(null).cast("double")).otherwise(g1).as("skewness"),
        when(bad, lit(null).cast("double")).otherwise(g2).as("ex_kurtosis"),
        when(bad, lit(null).cast("double"))
          .otherwise((g1 * g1 + lit(1.0)) / (g2 + lit(3.0)))
          .as("bimodality"))
        .orderBy("event_type")
    }),

    // Effect sizes for the weekend/weekday value shift per event
    // type — the MAGNITUDE companion to stat_welch_ttest's
    // significance: Cohen's d (pooled-sd standardized mean
    // difference) and the small-sample-corrected Hedges' g. A 100 TB
    // pipeline makes every tiny shift "significant"; d/g answer
    // whether it MATTERS. Same exact integer moments as Welch
    // (whole-unit quantization, identical headroom), same split, and
    // a fixed float tree ((n1−1)s1² = A1/n1 exactly) mirrored
    // operation-for-operation in the oracle. Degenerate groups
    // (n < 2 or zero pooled spread) emit NULL.
    "stat_effect_sizes" -> ((s, d) => {
      val dow = (floor(unix_timestamp(col("ts")) / 86400L) + 4L) % 7L
      // value filter: the stat_welch_ttest consistency argument
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"),
        (dow === 0L || dow === 6L).as("wkend"),
        round(col("value"), 0).cast("long").as("x"))
      val m = ev.groupBy("event_type").agg(
        sum(when(!col("wkend"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("wkend"), col("x")).otherwise(0L)).as("sx1"),
        sum(when(!col("wkend"), col("x") * col("x")).otherwise(0L)).as("sq1"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("wkend"), col("x")).otherwise(0L)).as("sx2"),
        sum(when(col("wkend"), col("x") * col("x")).otherwise(0L)).as("sq2"))
      val a1 = col("n1") * col("sq1") - col("sx1") * col("sx1")
      val a2 = col("n2") * col("sq2") - col("sx2") * col("sx2")
      val sp2 = (a1.cast("double") / col("n1").cast("double") +
        a2.cast("double") / col("n2").cast("double")) /
        (col("n1") + col("n2") - 2L).cast("double")
      val dEx = (col("sx1").cast("double") / col("n1").cast("double") -
        col("sx2").cast("double") / col("n2").cast("double")) / sqrt(sp2)
      val corr = lit(1.0) - lit(3.0) /
        (lit(4.0) * (col("n1") + col("n2")).cast("double") - lit(9.0))
      val bad = col("n1") < 2L || col("n2") < 2L || (a1 === 0L && a2 === 0L)
      m.select(col("event_type"), col("n1"), col("n2"),
        when(bad, lit(null).cast("double")).otherwise(dEx).as("cohens_d"),
        when(bad, lit(null).cast("double")).otherwise(dEx * corr)
          .as("hedges_g"))
        .orderBy("event_type")
    }),

    // Brown–Forsythe robust spread-equality test between the click
    // and view value distributions — Levene's test with the group
    // MEDIAN as center (the robust variant): z = |x − med_g|, then
    // the two-sample pooled-variance t on z (for k = 2 groups the
    // Brown–Forsythe ANOVA F is exactly t²; both are emitted). The
    // question it answers — "do these two segments merely sit at
    // different levels (Welch), or is one genuinely more VOLATILE?" —
    // is the other half of the drift story stat_welch_ttest tells.
    // Exactness: whole-unit quantization (the Welch headroom note),
    // medians by rank selection over the (type, value)-count table,
    // every aggregate an exact BIGINT; the float tree (two means,
    // pooled variance, one sqrt) is written identically in the
    // oracle. Scale shape: one value-count aggregate for medians
    // (windows run over distinct values, never raw rows), one
    // broadcast of the 2-row median table, one global conditional-sum
    // aggregate with map-side partials — no raw-row window, no
    // self-join. Degenerate sides (n < 2, or zero pooled spread)
    // emit NULL.
    "stat_brown_forsythe" -> ((s, d) => {
      // value IS NOT NULL in BOTH twins: NULLs would enter the n
      // counts but not the sums (the welch argument), AND the median
      // window orders NULLS FIRST in Spark but LAST in DuckDB
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view") &&
          col("value").isNotNull)
        .select(col("event_type"), round(col("value"), 0).cast("long").as("x"))
      val vc = ev.groupBy("event_type", "x").agg(count(lit(1)).as("c"))
      val wOrd = Window.partitionBy("event_type").orderBy("x")
      val med = vc
        .withColumn("cum", sum("c").over(wOrd))
        .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
        .withColumn("rk", expr("(n + 1) div 2"))
        .filter(col("cum") - col("c") < col("rk") && col("rk") <= col("cum"))
        .select(col("event_type"), col("x").as("med"))
      val z = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("x") - col("med")).as("z"))
      val isC = col("event_type") === "click"
      val m = z.agg(
        sum(when(isC, 1L).otherwise(0L)).as("n1"),
        sum(when(isC, col("z")).otherwise(0L)).as("s1"),
        sum(when(isC, col("z") * col("z")).otherwise(0L)).as("q1"),
        sum(when(!isC, 1L).otherwise(0L)).as("n2"),
        sum(when(!isC, col("z")).otherwise(0L)).as("s2"),
        sum(when(!isC, col("z") * col("z")).otherwise(0L)).as("q2"))
      val a1 = col("n1") * col("q1") - col("s1") * col("s1")
      val a2 = col("n2") * col("q2") - col("s2") * col("s2")
      // pooled t on the deviations: SS_g = A_g/n_g exactly, then the
      // fixed float tree sp2 = (SS1+SS2)/(n1+n2-2),
      // t = (z̄1−z̄2)/sqrt(sp2·(1/n1+1/n2))
      val ss1 = a1.cast("double") / col("n1").cast("double")
      val ss2 = a2.cast("double") / col("n2").cast("double")
      val sp2 = (ss1 + ss2) / (col("n1") + col("n2") - 2L).cast("double")
      val tEx = (col("s1").cast("double") / col("n1").cast("double") -
        col("s2").cast("double") / col("n2").cast("double")) /
        sqrt(sp2 * (lit(1.0) / col("n1").cast("double") +
          lit(1.0) / col("n2").cast("double")))
      val medp = med.agg(
        max(when(col("event_type") === "click", col("med"))).as("med_click"),
        max(when(col("event_type") === "view", col("med"))).as("med_view"))
      m.crossJoin(broadcast(medp))
        .select(col("n1"), col("n2"), col("med_click"), col("med_view"),
          when(col("n1") === 0L, lit(null).cast("double"))
            .otherwise(col("s1").cast("double") / col("n1").cast("double"))
            .as("mean_dev_click"),
          when(col("n2") === 0L, lit(null).cast("double"))
            .otherwise(col("s2").cast("double") / col("n2").cast("double"))
            .as("mean_dev_view"),
          when(col("n1") < 2L || col("n2") < 2L || (a1 === 0L && a2 === 0L),
            lit(null).cast("double")).otherwise(tEx).as("bf_t"),
          when(col("n1") < 2L || col("n2") < 2L || (a1 === 0L && a2 === 0L),
            lit(null).cast("double")).otherwise(tEx * tEx).as("bf_f"))
    }),

    // Pre-join fan-out estimator — the CBO sanity check a pipeline
    // runs BEFORE a self-join or user-level pair analysis: from the
    // per-key count table alone, the exact output cardinality of the
    // events-by-user self join (Σ n_u²) and the hottest keys'
    // contribution share. Answers "will behavior_pair_bursts-style
    // pair generation explode, and which keys would need salting?"
    // without running the join. Scale shape: one keyed aggregate to
    // the per-user count table, one TOP-K via TakeOrderedAndProject,
    // one 1-row total broadcast — the join itself never runs.
    // Integer headroom: Σ n_u² ≤ (Σ n_u)² needs n_total < 3·10⁹ in
    // BIGINT; past that the contributions rescale to thousands
    // first (same note as stat_ks_segments).
    "dq_join_fanout_estimate" -> ((s, d) => {
      val pk = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          (col("n_events") * col("n_events")).as("pair_contrib"))
      val tot = pk.agg(
        coalesce(sum("n_events"), lit(0L)).as("t_rows"),
        coalesce(sum("pair_contrib"), lit(0L)).as("t_pairs"))
      val top = pk.orderBy(col("pair_contrib").desc, col("user_id"))
        .limit(10)
      val summary = tot.select(lit(null).cast("long").as("user_id"),
        col("t_rows").as("n_events"), col("t_pairs").as("pair_contrib"),
        when(col("t_pairs") === 0L, lit(0L)).otherwise(lit(1000000L))
          .as("share_ppm"))
      top.crossJoin(broadcast(tot))
        .select(col("user_id"), col("n_events"), col("pair_contrib"),
          when(col("t_pairs") === 0L, lit(0L))
            .otherwise(expr("pair_contrib * 1000000 div t_pairs"))
            .as("share_ppm"))
        .unionByName(summary)
        .orderBy(col("user_id").isNotNull, col("pair_contrib").desc,
          col("user_id"))
    }),

    // Inclusion-dependency DISCOVERY — FK-candidate inference from
    // the data alone (dq_referential_orphans VALIDATES declared FKs;
    // this one asks which column pairs LOOK like FKs): for each
    // candidate (A ⊆ B), the share of A's DISTINCT values present in
    // B, in integer ppm, with a verdict at full containment. The
    // grid includes one deliberate non-FK (customer ⊆ orders — a
    // customer with no orders breaks containment) so the verdict
    // column is exercised in both directions. Scale shape: per pair,
    // two distinct-key aggregates and one left-semi join ON THE
    // DISTINCT-KEY TABLES — the fact tables collapse before any
    // join; no row-level comparison survives.
    "dq_inclusion_deps" -> ((s, d) => {
      def dep(name: String, a: DataFrame, ak: String,
          b: DataFrame, bk: String): DataFrame = {
        val da = a.select(col(ak).cast("long").as("k")).distinct()
        val db = b.select(col(bk).cast("long").as("k")).distinct()
        val nA = da.agg(count(lit(1)).as("n_left_distinct"))
        val nM = da.join(db, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("n_matched"))
        nA.crossJoin(nM).select(lit(name).as("dep"),
          col("n_left_distinct"), col("n_matched"),
          when(col("n_left_distinct") === 0L, lit(0L))
            .otherwise(expr("n_matched * 1000000 div n_left_distinct"))
            .as("containment_ppm"),
          (col("n_left_distinct") > 0L &&
            col("n_matched") === col("n_left_distinct"))
            .as("fk_candidate"))
      }
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val li = Tables.lineitem(s, d)
      dep("customer.c_custkey<orders.o_custkey", c, "c_custkey",
          o, "o_custkey")
        .unionByName(dep("lineitem.l_orderkey<orders.o_orderkey",
          li, "l_orderkey", o, "o_orderkey"))
        .unionByName(dep("lineitem.l_partkey<part.p_partkey",
          li, "l_partkey", Tables.part(s, d), "p_partkey"))
        .unionByName(dep("orders.o_custkey<customer.c_custkey",
          o, "o_custkey", c, "c_custkey"))
        .orderBy("dep")
    }),

    // Theil–Sen robust trend per event type: the MEDIAN of all
    // pairwise slopes between daily totals — outlier-days shift OLS
    // fits but barely move this. Slopes live on the C(n_days, 2)
    // pair set of the bounded DAILY table (never raw rows), and the
    // median is rank-selected with row_number so tied doubles pick
    // the same VALUE on any ordering; even counts average the two
    // middles. Every double here is one exact-integer division, so
    // both engines produce identical bits.
    "stat_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("x"),
          round(col("value"), 0).cast("long").as("v"))
        .groupBy("event_type", "x").agg(sum("v").as("y"))
      val slopes = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.x") < col("b.x"))
        .select(col("a.event_type").as("event_type"),
          ((col("b.y") - col("a.y")).cast("double") /
            (col("b.x") - col("a.x")).cast("double")).as("slope"))
      val ranked = slopes.withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy("slope")))
      val np = slopes.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
      // integer div, NOT Column./ (true division → DOUBLE): with an
      // EVEN pair count the lower-middle rank (n+1)/2 is x.5 under
      // float division and matches no row_number, so only the upper
      // middle would be kept while the oracle's // averages BOTH
      // middles — the classic even-n median bug
      val mid = ranked.join(broadcast(np), "event_type")
        .filter(col("rk") === expr("(n_pairs + 1) div 2") ||
          col("rk") === expr("n_pairs div 2 + 1"))
        .groupBy("event_type")
        .agg((sum("slope") / count(lit(1))).as("ts_slope"))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      nd.join(np, "event_type").join(mid, "event_type")
        .select("event_type", "n_days", "n_pairs", "ts_slope")
        .orderBy("event_type")
    }),

    // Lag-1 autocorrelation of daily totals per event type — the
    // is-today-like-yesterday signal that separates trending series
    // from noise before anyone fits a forecast. Pearson between the
    // daily series and its one-day shift over the bounded daily
    // table, in the suite's exact integer moments (n·Σxy−ΣxΣy forms);
    // the only floats are the final division and sqrt, written
    // identically in the oracle. Degenerate series (under 2 pairs or
    // zero variance on either side) emit NULL.
    "ts_autocorrelation" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("x"),
          round(col("value"), 0).cast("long").as("v"))
        .groupBy("event_type", "x").agg(sum("v").as("y"))
      val w = Window.partitionBy("event_type").orderBy("x")
      val pairs = daily
        .withColumn("y_prev", lag("y", 1).over(w))
        .withColumn("x_prev", lag("x", 1).over(w))
        // only CONSECUTIVE days form a lag-1 pair; calendar gaps drop
        .filter(col("x_prev") === col("x") - 1L)
      val m = pairs.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("y").as("sa"), sum("y_prev").as("sb"),
        sum(col("y") * col("y")).as("saa"),
        sum(col("y_prev") * col("y_prev")).as("sbb"),
        sum(col("y") * col("y_prev")).as("sab"))
      val va = col("n") * col("saa") - col("sa") * col("sa")
      val vb = col("n") * col("sbb") - col("sb") * col("sb")
      val cov = col("n") * col("sab") - col("sa") * col("sb")
      m.select(col("event_type"), col("n").as("n_pairs"),
          when(col("n") < 2L || va === 0L || vb === 0L,
            lit(null).cast("double"))
            .otherwise(cov.cast("double") /
              sqrt(va.cast("double") * vb.cast("double"))).as("acf1"))
        .orderBy("event_type")
    }),

    // SAX symbolic motifs (Lin et al., DMKD'07 — Symbolic Aggregate
    // approXimation, kept integer-exact): the hourly mean-value series
    // per event type is piecewise-aggregate-approximated over
    // [[SaxWindowHours]]-hour windows and quantized to a 4-letter
    // alphabet at the fixed [[SaxBreaks]] cent breakpoints, then the
    // most frequent 3-window MOTIF is reported — the recurring-shape
    // primitive behind symbolic TS indexing. Exactness: hourly means
    // and PAA values are integer divisions of exact cent sums (the
    // quantization is the published method's point — SAX is defined
    // by its discretization, so integer-div is semantics, not
    // compromise). TRUNCATE-vs-FLOOR contract: Spark's `div` and
    // DuckDB's `//` BOTH truncate toward zero on signed integers
    // (verified: −7 div 2 = −3 = −7 // 2), so the twins agree at
    // every sign — but on a NEGATIVE cent sum the quantized mean is
    // the truncated value, one ABOVE the mathematical floor (−3, not
    // −4), which can shift a window sitting exactly on a SaxBreaks
    // boundary one letter up relative to a floor-defined SAX. That
    // truncation IS this query's published semantics (both twins
    // replay it identically); a floor-defined variant would spell
    // both sides with explicit floor(x/y) — don't mix the two.
    // Symbols are pure CASE. Scale shape: fact →
    // (type, hour) aggregate → (type, window) PAA — all keyed,
    // calendar-bounded tables; the trigram census is two consecutive-
    // window equi-joins (calendar gaps break motifs by design) and
    // the per-type argmax runs on the ≤ 4³-motif table.
    "ts_sax_motifs" -> ((s, d) => {
      // valued events only: an all-NULL PAA window would yield pv =
      // NULL, fall through every CASE branch, and misclassify a
      // no-data window as the TOP symbol 'd' — and mixed windows
      // would deflate hm = sum(non-NULL)/count(all). Both twins.
      val hourly = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 3600L).cast("long").as("h"),
          Exact.cents(col("value")).as("xc"))
        .groupBy("event_type", "h")
        .agg(expr("sum(xc) div count(1)").as("hm"))
      val paa = hourly
        .groupBy(col("event_type"),
          expr(s"h div $SaxWindowHours").as("widx"))
        .agg(expr("sum(hm) div count(1)").as("pv"))
        .withColumn("sym",
          when(col("pv") < SaxBreaks(0), "a")
            .when(col("pv") < SaxBreaks(1), "b")
            .when(col("pv") < SaxBreaks(2), "c")
            .otherwise("d"))
        .truncateLineage() // read 3× by the trigram self-joins
      val nw = paa.groupBy("event_type").agg(count(lit(1)).as("n_windows"))
      val tri = paa.as("w0")
        .join(paa.as("w1"), col("w0.event_type") === col("w1.event_type")
          && col("w1.widx") === col("w0.widx") + 1L)
        .join(paa.as("w2"), col("w0.event_type") === col("w2.event_type")
          && col("w2.widx") === col("w0.widx") + 2L)
        .select(col("w0.event_type").as("event_type"),
          concat(col("w0.sym"), col("w1.sym"), col("w2.sym")).as("motif"))
        .groupBy("event_type", "motif").agg(count(lit(1)).as("n"))
      val top = tri.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("n").desc, col("motif"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("motif").as("top_motif"),
          col("n").as("n_motif"))
      nw.join(top, Seq("event_type"), "left")
        .select(col("event_type"), col("n_windows"),
          col("top_motif"), col("n_motif"))
        .orderBy("event_type")
    }),

    // ROLLING correlation between the click and purchase daily-total
    // series — the time-varying coupling a static Pearson (the
    // stat_corr_* family) averages away: is demand tracking
    // engagement THIS fortnight? All six rolling moments (n, Σx, Σy,
    // Σx², Σy², Σxy) are exact BIGINT window sums over the
    // calendar-bounded joined DAY table (never raw events), and r is
    // the per-row cross-multiplied float tree with a zero-variance →
    // NULL guard. Partial leading windows are reported with their
    // n_window (the oracle replays the same frames).
    "ts_rolling_correlation" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long")
          .as("day"), col("event_type"))
        .agg(sum(round(col("value"), 0).cast("long")).as("v"))
      val x = daily.filter(col("event_type") === "click")
        .select(col("day"), col("v").as("x"))
      val y = daily.filter(col("event_type") === "purchase")
        .select(col("day"), col("v").as("y"))
      val j = x.join(y, "day")
      val w = Window.orderBy("day")
        .rowsBetween(-(RollCorrDays - 1), Window.currentRow)
      val m = j
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum("x").over(w))
        .withColumn("sy", sum("y").over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      m.select(col("day"), col("n").as("n_window"),
          when(col("n") < 2L || vx === 0L || vy === 0L,
            lit(null).cast("double"))
            .otherwise(cov.cast("double") /
              sqrt(vx.cast("double") * vy.cast("double")))
            .as("rolling_r"))
        .orderBy("day")
    }),

    // Hour-of-day seasonality profile per event type: volume and
    // exact mean value by UTC hour, plus each type's peak hour — the
    // shape check behind load forecasting and anomaly baselines. Pure
    // integer epoch arithmetic for the hour bucket; one fact
    // aggregate to the bounded (type, hour) table.
    "ts_seasonality_profile" -> ((s, d) => {
      // valued events only — NULL values would inflate n while the
      // mean's numerator skips them (count-vs-sum discipline)
      val byHour = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 3600L) % 24L).as("hod"),
          Exact.cents(col("value")).as("xc"))
        .groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n"), sum("xc").as("sxc"))
      val peak = byHour.groupBy("event_type")
        .agg(max(struct(col("n"), (-col("hod")).as("nh"))).as("p"))
        .select(col("event_type"), (-col("p.nh")).as("peak_hour"))
      byHour.join(broadcast(peak), "event_type")
        .select(col("event_type"), col("hod"), col("n"),
          (col("sxc").cast("double") / 100.0 / col("n").cast("double"))
            .as("mean_value"),
          col("peak_hour"))
        .orderBy("event_type", "hod")
    }),

    // Snapshot freshness per event type: how far each type's newest
    // event lags the snapshot's global high-water mark — the
    // is-this-feed-stale monitor. Two tiny aggregates, one broadcast.
    "dq_freshness" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      val byType = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("ts_s").as("last_s"))
      byType.crossJoin(broadcast(byType.agg(max("last_s").as("hwm"))))
        .select(col("event_type"), col("n"), col("last_s"),
          (col("hwm") - col("last_s")).as("lag_s"))
        .orderBy("event_type")
    }),

    // Watermark-delay tuning table: for each candidate watermark
    // delay, what fraction of events would a streaming 5-min tumbling
    // aggregation DROP as too late? Arrival time is simulated as
    // event time + a deterministic hash-derived network delay in
    // [0, 600) s (pmod(xxhash64('lat:'||id), 600) — the
    // stat_bootstrap_ci convention, so the oracle replays the exact
    // same jitter via XxhSql); an event is dropped under delay D iff
    // arrival > its window end + D. This is the batch study run
    // BEFORE picking `withWatermark` for streaming.Ingest — the grid
    // answers "1 min loses 8%, 5 min loses 0.4%". Scale shape: pure
    // map-side arithmetic + ONE global aggregate (3 conditional sums
    // with map-side partials), then a 3-row stack — no shuffle
    // carries raw events, no window at all.
    "dq_watermark_lateness" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), unix_timestamp(col("ts")).as("tsec"))
        .withColumn("delay_s", pmod(xxhash64(
          concat(lit("lat:"), col("event_id").cast("string"))), lit(600L)))
        .withColumn("late_by", col("tsec") + col("delay_s")
          - (expr("tsec div 300") + 1L) * 300L)
      val agg = e.agg(
        count(lit(1)).as("total"),
        coalesce(sum(when(col("late_by") > 60L, 1L).otherwise(0L)), lit(0L))
          .as("d60"),
        coalesce(sum(when(col("late_by") > 120L, 1L).otherwise(0L)), lit(0L))
          .as("d120"),
        coalesce(sum(when(col("late_by") > 300L, 1L).otherwise(0L)), lit(0L))
          .as("d300"))
      agg.select(
          expr("stack(3, 60L, d60, 120L, d120, 300L, d300)")
            .as(Seq("watermark_delay_s", "dropped")), col("total"))
        .select(col("watermark_delay_s"), col("dropped"), col("total"),
          when(col("total") === 0L, lit(0L))
            .otherwise(expr("dropped * 1000000 div total"))
            .as("dropped_ppm"))
        .orderBy("watermark_delay_s")
    }),

    // CUSUM changepoint per event type: the day where the cumulative
    // deviation of daily totals from the per-type mean peaks — where
    // the level shift happened. Integer-exact via n-scaling: c_i =
    // n·cum_i − i·T needs no float mean. Plan: one fact aggregate to
    // the (type, day) table, then windows over that bounded table;
    // tie on |c| resolves to the earliest day on both engines.
    "ts_cusum_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          round(col("value"), 0).cast("long").as("x"))
        .groupBy("event_type", "day").agg(sum("x").as("y"))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("t"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val cum = daily.join(broadcast(tot), "event_type")
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cy", sum("y").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("c", abs(col("n") * col("cy") - col("i") * col("t")))
      cum.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("c").desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("day").as("peak_day"), col("c").as("max_dev"))
        .orderBy("event_type")
    }),

    // One-way ANOVA F-test of event value across ALL event types —
    // the k-group generalization of the Welch/pooled-t pair: "does
    // mean spend differ by type at all?" before any pairwise drill.
    // Exactness: per-group moments (n, Σx, Σx²) are exact BIGINT
    // cents; the between-group term Σ S_g²/n_g is rational, so each
    // group's term is floor-quantized on correctly-rounded doubles
    // (cast, square, divide, floor — IEEE-identical in both engines),
    // making the cross-group sum an associative integer aggregate
    // (the stat_hellinger_segments ppb trick, here in whole cents²).
    // The reported SS columns are defined AS the quantized statistic
    // (each of the k+1 floors undercounts < 1 cent²). Integer
    // headroom: S_g² must stay inside double's exact-ish range and
    // u_g = S_g²/n_g inside BIGINT — n_g·x̄² < 2⁶³ holds to ~10¹⁰
    // rows/group at these cent magnitudes; past that swap the moment
    // sums to DECIMAL(38,0) (suite-header note). Scale shape: ONE
    // fact-table aggregate to a k-row moment table; everything after
    // is k-row arithmetic — no window, no join, no second scan.
    "stat_anova_oneway" -> ((s, d) => {
      // NULL values must not inflate ng while contributing nothing to
      // the moments (the stat_welch_ttest count-vs-sum discipline):
      // the statistic is defined over VALUED events in both twins
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), Exact.cents(col("value")).as("xc"))
      val g = ev.groupBy("event_type").agg(
        count(lit(1)).as("ng"), sum("xc").as("sg"),
        sum(col("xc") * col("xc")).as("qg"))
      val gq = g.select(col("ng"), col("sg"), col("qg"),
        floor(col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double")).as("ug"))
      val m = gq.agg(count(lit(1)).as("k_groups"), sum("ng").as("n"),
        sum("sg").as("s"), sum("qg").as("q"), sum("ug").as("u"))
      val gterm = floor(col("s").cast("double") * col("s").cast("double") /
        col("n").cast("double"))
      m.select(col("k_groups"), col("n"),
        (col("u") - gterm).as("ss_between_c2"),
        (col("q") - col("u")).as("ss_within_c2"),
        when(col("k_groups") < 2L || col("q") - col("u") === 0L,
          lit(null).cast("double"))
          .otherwise((col("u") - gterm).cast("double") /
            (col("k_groups") - 1L).cast("double") /
            ((col("q") - col("u")).cast("double") /
              (col("n") - col("k_groups")).cast("double"))).as("f_stat"),
        when(col("q") - gterm === 0L, lit(null).cast("double"))
          .otherwise((col("u") - gterm).cast("double") /
            (col("q") - gterm).cast("double")).as("eta_sq"))
    }),

    // Tukey–Kramer post-hoc pairwise comparisons — the step AFTER a
    // significant one-way ANOVA: which pairs of event types actually
    // differ? q_ij = |x̄_i − x̄_j| / sqrt((MSW/2)·(1/n_i + 1/n_j)),
    // with MSW = SSW/(N−k) taken from the SAME floor-quantized
    // within-group sum stat_anova_oneway reports (the two queries
    // can never disagree about the error term). Exactness: group
    // moments exact BIGINT cents; the pairwise layer is a fixed
    // float tree over the k-row moment table. Scale shape: one fact
    // aggregate to k rows, a broadcast C(k,2) self-join, k²-sized
    // output — nothing after the first aggregate touches the corpus.
    "stat_tukey_hsd" -> ((s, d) => {
      // valued events only — the same count-vs-sum discipline as
      // stat_anova_oneway (the two share the error term by contract)
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), Exact.cents(col("value")).as("xc"))
      val g = ev.groupBy("event_type").agg(
        count(lit(1)).as("ng"), sum("xc").as("sg"),
        sum(col("xc") * col("xc")).as("qg"))
      val gq = g.select(col("event_type"), col("ng"), col("sg"),
        floor(col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double")).as("ug"))
      val msw = g.select(col("qg"), col("ng"),
        floor(col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double")).as("ug"))
        .agg(count(lit(1)).as("k"), sum("ng").as("n"),
          sum("qg").as("q"), sum("ug").as("u"))
        // n = k (every group a single row) zeroes the within-group
        // df: msw undefined -> NULL (q_stat NULL-propagates), never
        // an ANSI x/0 abort
        .select(when(col("n") === col("k"), lit(null).cast("double"))
          .otherwise((col("q") - col("u")).cast("double") /
            (col("n") - col("k")).cast("double")).as("msw"))
      val a = gq.select(col("event_type").as("type_a"),
        col("ng").as("na"), col("sg").as("sa"))
      val b = gq.select(col("event_type").as("type_b"),
        col("ng").as("nb"), col("sg").as("sb"))
      val md = abs(col("sa").cast("double") / col("na").cast("double") -
        col("sb").cast("double") / col("nb").cast("double"))
      a.join(b, col("type_a") < col("type_b"))
        .crossJoin(broadcast(msw))
        .select(col("type_a"), col("type_b"),
          col("na"), col("nb"), (md / 100.0).as("mean_diff"),
          when(col("msw") === 0.0, lit(null).cast("double"))
            .otherwise(md / sqrt(col("msw") / 2.0 *
              (lit(1.0) / col("na").cast("double") +
                lit(1.0) / col("nb").cast("double")))).as("q_stat"))
        .orderBy("type_a", "type_b")
    }),

    // Kruskal–Wallis H — the rank-based k-group test (Mann–Whitney's
    // k-sample generalization), tie-corrected, run over the same
    // event-type groups as stat_anova_oneway so the parametric and
    // non-parametric verdicts sit side by side. Exactness: rank sums
    // are computed on the (value → count) table with DOUBLED ranks
    // (2·below + t + 1) so midranks stay integral; Σ R_g²/n_g is
    // floor-quantized per group on correctly-rounded doubles (the
    // ANOVA trick) and summed as an exact BIGINT; the tie term
    // Σ(t³−t) is an exact integer aggregate. Scale shape: one fact
    // aggregate to the (group, value)-count table, one to the
    // value-count table; the ONLY global window is the two-level
    // prefix sum over the bounded value DOMAIN (the stat_mann_whitney
    // pattern — the outer ordering runs over ~domain/1000 buckets,
    // the within-bucket cumulative partitions by bucket), never raw
    // rows. Integer headroom: u_g ≈ n_g·N² < 2⁶³ (suite-header
    // DECIMAL swap past ~10⁹ total rows); t³ < 2⁶³ to N ~ 2·10⁶ ties
    // per value.
    "stat_kruskal_wallis" -> ((s, d) => {
      // a NULL value has no rank (Spark's NULL bucket sorts FIRST in
      // the bucket-base window, DuckDB's cumulative ranks it LAST —
      // every doubled midrank would shift differently per engine):
      // ranks are defined over VALUED events in both twins
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type").as("g"), Exact.cents(col("value")).as("v"))
      val gv = ev.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val vc = gv.groupBy("v").agg(sum("c").as("t"))
      val bk = vc.withColumn("bk", expr("v div 1000L"))
      val base = bk.groupBy("bk").agg(sum("t").as("bt"))
        .withColumn("base",
          coalesce(sum("bt").over(Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base")
      val below = bk.join(broadcast(base), "bk")
        .withColumn("within",
          coalesce(sum("t").over(Window.partitionBy("bk").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("v"), col("t"),
          (col("base") + col("within")).as("below"))
      val r = gv.join(below, "v").groupBy("g").agg(
        sum("c").as("ng"),
        sum(col("c") * (col("below") * 2L + col("t") + 1L)).as("r2"))
      val rq = r.select(col("ng"),
        floor(col("r2").cast("double") * col("r2").cast("double") /
          (lit(4.0) * col("ng").cast("double"))).as("ug"))
      val ties = vc.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("ts"))
      val m = rq.agg(count(lit(1)).as("k_groups"), sum("ng").as("n"),
        sum("ug").as("u")).crossJoin(broadcast(ties))
      val res = m.select(col("k_groups"), col("n"), col("ts"),
        (lit(12.0) / (col("n").cast("double") *
          (col("n") + 1L).cast("double")) * col("u").cast("double") -
          lit(3.0) * (col("n") + 1L).cast("double")).as("h_stat"),
        // n < 2: n^3 - n = 0 and the correction is undefined -> NULL
        // (h_corrected NULL-propagates), never an ANSI x/0 abort
        when(col("n") < 2L, lit(null).cast("double"))
          .otherwise(lit(1.0) - col("ts").cast("double") /
            (col("n").cast("double") * col("n").cast("double") *
              col("n").cast("double") - col("n").cast("double")))
          .as("tie_corr"))
      res.select(col("k_groups"), col("n"), col("ts").as("ties_term"),
        col("h_stat"), col("tie_corr"),
        when(col("tie_corr") === 0.0, lit(null).cast("double"))
          .otherwise(col("h_stat") / col("tie_corr")).as("h_corrected"))
    }),

    // Dunn's post-hoc pairwise test — the non-parametric companion
    // of stat_tukey_hsd, run after a significant Kruskal–Wallis:
    // z_ij = |R̄_i − R̄_j| / sqrt((N(N+1)/12 − Σ(t³−t)/(12(N−1))) ·
    // (1/n_i + 1/n_j)), with mean ranks R̄ = R2/(2n) from the SAME
    // doubled-midrank sums stat_kruskal_wallis computes (shared
    // two-level value-domain prefix; the two queries can never
    // disagree about the ranking). Exactness: rank sums and the tie
    // term are exact BIGINTs; the pairwise layer is a fixed float
    // tree over the k-row table. Scale shape: identical to
    // stat_kruskal_wallis plus a broadcast C(k,2) self-join.
    "stat_dunn_test" -> ((s, d) => {
      // a NULL value has no rank (Spark's NULL bucket sorts FIRST in
      // the bucket-base window, DuckDB's cumulative ranks it LAST —
      // every doubled midrank would shift differently per engine):
      // ranks are defined over VALUED events in both twins
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type").as("g"), Exact.cents(col("value")).as("v"))
      val gv = ev.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val vc = gv.groupBy("v").agg(sum("c").as("t"))
      val bk = vc.withColumn("bk", expr("v div 1000L"))
      val base = bk.groupBy("bk").agg(sum("t").as("bt"))
        .withColumn("base",
          coalesce(sum("bt").over(Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base")
      val below = bk.join(broadcast(base), "bk")
        .withColumn("within",
          coalesce(sum("t").over(Window.partitionBy("bk").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("v"), col("t"),
          (col("base") + col("within")).as("below"))
      val r = gv.join(below, "v").groupBy("g").agg(
        sum("c").as("ng"),
        sum(col("c") * (col("below") * 2L + col("t") + 1L)).as("r2"))
      val glob = r.agg(sum("ng").as("n"))
        .crossJoin(broadcast(vc.agg(
          sum(col("t") * col("t") * col("t") - col("t")).as("ts"))))
        // n < 2 zeroes the 12(n-1) tie denominator: variance term
        // undefined -> NULL (z NULL-propagates), never an ANSI x/0
        .select(when(col("n") < 2L, lit(null).cast("double"))
          .otherwise(col("n").cast("double") *
            (col("n") + 1L).cast("double") / 12.0 -
            col("ts").cast("double") /
              (lit(12.0) * (col("n") - 1L).cast("double"))).as("vterm"))
      val a = r.select(col("g").as("type_a"), col("ng").as("na"),
        col("r2").as("ra"))
      val b = r.select(col("g").as("type_b"), col("ng").as("nb"),
        col("r2").as("rb"))
      val mra = col("ra").cast("double") / (col("na") * 2L).cast("double")
      val mrb = col("rb").cast("double") / (col("nb") * 2L).cast("double")
      a.join(b, col("type_a") < col("type_b"))
        .crossJoin(broadcast(glob))
        .select(col("type_a"), col("type_b"),
          mra.as("mean_rank_a"), mrb.as("mean_rank_b"),
          when(col("vterm") <= 0.0, lit(null).cast("double"))
            .otherwise(abs(mra - mrb) / sqrt(col("vterm") *
              (lit(1.0) / col("na").cast("double") +
                lit(1.0) / col("nb").cast("double")))).as("z"))
        .orderBy("type_a", "type_b")
    }),

    // Approximate functional-dependency discovery over a fixed
    // candidate set — the schema-inference pass a profiler runs
    // before choosing clustering keys or declaring constraints: for
    // each A→B candidate, the exact-FD verdict and the g3' repair
    // strength (the row fraction kept under the best single-value
    // repair per LHS group — Huhtala et al., TANE, Comput. J. 1999).
    // Scale shape: each candidate is a two-level keyed aggregate
    // ((A,B)-counts, then per-A max/sum) with map-side partials —
    // the fact table shuffles once per candidate on the (A,B) pair
    // and the report is candidate-count rows; no joins, no windows,
    // no distinct over raw rows.
    "dq_fd_discovery" -> ((s, d) => {
      def fd(df: DataFrame, label: String, lhs: String,
          rhs: String): DataFrame =
        df.groupBy(col(lhs).as("l"), col(rhs).as("r"))
          .agg(count(lit(1)).as("c"))
          .groupBy("l").agg(sum("c").as("nl"), max("c").as("mx"),
            count(lit(1)).as("nd"))
          .agg(sum("nl").as("n_rows"), count(lit(1)).as("n_lhs"),
            sum(when(col("nd") === 1L, 1L).otherwise(0L))
              .as("n_exact_lhs"),
            sum("mx").as("kept"))
          .select(lit(label).as("fd"), col("n_rows"), col("n_lhs"),
            col("n_exact_lhs"),
            expr("kept * 1000000 div n_rows").as("keep_ppm"),
            (col("n_exact_lhs") === col("n_lhs")).as("is_exact"))
      Seq(
        fd(Tables.lineitem(s, d), "lineitem.l_partkey -> l_suppkey",
          "l_partkey", "l_suppkey"),
        fd(Tables.orders(s, d), "orders.o_custkey -> o_orderpriority",
          "o_custkey", "o_orderpriority"),
        fd(Tables.customer(s, d), "customer.c_custkey -> c_nationkey",
          "c_custkey", "c_nationkey"),
        fd(Tables.customer(s, d), "customer.c_nationkey -> c_mktsegment",
          "c_nationkey", "c_mktsegment"),
        fd(Tables.nation(s, d), "nation.n_nationkey -> n_regionkey",
          "n_nationkey", "n_regionkey"),
        fd(Tables.events(s, d), "events.user_id -> event_type",
          "user_id", "event_type"),
        fd(Tables.documents(s, d), "documents.source -> lang",
          "source", "lang"))
        .reduce(_.unionByName(_)).orderBy("fd")
    }),

    // Cross-table amount reconciliation — the financial-close check
    // beside the FK census: does each order's header total equal the
    // sum of its line amounts (within 1 cent)? Reports the
    // discrepancy PROFILE per order status: headers without lines,
    // reconciled count, total and max absolute drift. (On this
    // synthetic fixture totals are independent of lines, so the
    // check correctly reports ~0 reconciled — the report IS the
    // operator; real books would show the inverse.) Exactness: all
    // comparisons and sums in integer cents, the two dollar columns
    // divided once. Scale shape: lineitem aggregates on l_orderkey,
    // the join keys both sides on the SAME order key (one co-keyed
    // shuffle each), then a status-sized reduce; no window.
    "dq_order_total_reconciliation" -> ((s, d) => {
      val ls = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("lsum"))
      val diff = abs(col("oc") - col("lsum"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          Exact.cents(col("o_totalprice")).as("oc"))
        .join(ls, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus").agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("lsum").isNull, 1L).otherwise(0L))
            .as("n_without_lines"),
          sum(when(col("lsum").isNotNull && diff <= 1L, 1L)
            .otherwise(0L)).as("n_reconciled"),
          sum(when(col("lsum").isNotNull, diff).otherwise(0L))
            .as("adc"),
          max(when(col("lsum").isNotNull, diff)).as("mdc"))
        .select(col("o_orderstatus"), col("n_orders"),
          col("n_without_lines"), col("n_reconciled"),
          (col("adc") / 100.0).as("total_abs_drift"),
          (col("mdc") / 100.0).as("max_abs_drift"))
        .orderBy("o_orderstatus")
    }))

  def oracles: Map[String, String] = Map(
    "dq_referential_orphans" -> Seq(
      fkSql("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fkSql("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkSql("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      fkSql("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      fkSql("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
      fkSql("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fkSql("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation"),

    "dq_null_profile" -> profCols.map(c =>
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM events""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),

    "ts_rolling_correlation" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         |    event_type,
         |    CAST(sum(CAST(round("value") AS BIGINT)) AS BIGINT) AS v
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT x.day, x.v AS x, y.v AS y
         |  FROM (SELECT day, v FROM daily WHERE event_type = 'click') x
         |  JOIN (SELECT day, v FROM daily WHERE event_type = 'purchase') y
         |    ON x.day = y.day),
         |m AS (
         |  SELECT day,
         |    CAST(count(*) OVER w AS BIGINT) AS n,
         |    CAST(sum(x) OVER w AS BIGINT) AS sx,
         |    CAST(sum(y) OVER w AS BIGINT) AS sy,
         |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         |    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
         |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
         |  FROM j
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN ${RollCorrDays - 1} PRECEDING AND CURRENT ROW))
         |SELECT day, n AS n_window,
         |  CASE WHEN n < 2 OR n * sxx - sx * sx = 0
         |         OR n * syy - sy * sy = 0 THEN NULL
         |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
         |            sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |                 CAST(n * syy - sy * sy AS DOUBLE)) END
         |    AS rolling_r
         |FROM m ORDER BY day""".stripMargin,

    "ts_sax_motifs" ->
      s"""WITH hourly AS (
         |  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         |    CAST(sum(${Exact.centsSql("\"value\"")}) // count(*)
         |      AS BIGINT) AS hm
         |  FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2),
         |paa AS (
         |  SELECT event_type, h // $SaxWindowHours AS widx,
         |    CAST(sum(hm) // count(*) AS BIGINT) AS pv
         |  FROM hourly GROUP BY 1, 2),
         |sym AS (SELECT event_type, widx,
         |    CASE WHEN pv < ${SaxBreaks(0)} THEN 'a'
         |         WHEN pv < ${SaxBreaks(1)} THEN 'b'
         |         WHEN pv < ${SaxBreaks(2)} THEN 'c'
         |         ELSE 'd' END AS sym
         |  FROM paa),
         |nw AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_windows
         |       FROM sym GROUP BY 1),
         |tri AS (
         |  SELECT w0.event_type, w0.sym || w1.sym || w2.sym AS motif,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM sym w0
         |  JOIN sym w1 ON w1.event_type = w0.event_type
         |    AND w1.widx = w0.widx + 1
         |  JOIN sym w2 ON w2.event_type = w0.event_type
         |    AND w2.widx = w0.widx + 2
         |  GROUP BY 1, 2),
         |top AS (SELECT event_type, motif, n,
         |          row_number() OVER (PARTITION BY event_type
         |            ORDER BY n DESC, motif) AS rk
         |        FROM tri)
         |SELECT nw.event_type, nw.n_windows,
         |  top.motif AS top_motif, top.n AS n_motif
         |FROM nw LEFT JOIN top
         |  ON top.event_type = nw.event_type AND top.rk = 1
         |ORDER BY nw.event_type""".stripMargin,

    "stat_benford_digits" ->
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |byd AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
        |        FROM dg GROUP BY digit)
        |SELECT digit, n,
        |  CAST(n * 1000000 // (SELECT sum(n) FROM byd) AS BIGINT)
        |    AS share_ppm
        |FROM byd ORDER BY digit""".stripMargin,

    "stat_gini_sources" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS i
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_chars) AS BIGINT) AS sx,
        |        CAST(sum(i * n_chars) AS BIGINT) AS six
        |      FROM r GROUP BY source)
        |SELECT source, n_docs,
        |  CAST(2 * six - (n_docs + 1) * sx AS DOUBLE) /
        |    CAST(nullif(n_docs * sx, 0) AS DOUBLE) AS gini
        |FROM g ORDER BY source""".stripMargin,

    "stat_welch_ttest" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
        |      IN (0, 6) AS wkend,
        |    CAST(round("value") AS BIGINT) AS x
        |  FROM events WHERE "value" IS NOT NULL),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT wkend THEN x ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN NOT wkend THEN x*x ELSE 0 END) AS BIGINT) AS sq1,
        |    CAST(sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN wkend THEN x ELSE 0 END) AS BIGINT) AS sx2,
        |    CAST(sum(CASE WHEN wkend THEN x*x ELSE 0 END) AS BIGINT) AS sq2
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, n1, n2,
        |  CASE WHEN n1 < 2 OR n2 < 2
        |         OR (n1*sq1 - sx1*sx1 = 0 AND n2*sq2 - sx2*sx2 = 0)
        |    THEN NULL
        |    ELSE (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |          CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |         sqrt(CAST(n1*sq1 - sx1*sx1 AS DOUBLE) /
        |                CAST(n1*n1*(n1-1) AS DOUBLE) +
        |              CAST(n2*sq2 - sx2*sx2 AS DOUBLE) /
        |                CAST(n2*n2*(n2-1) AS DOUBLE))
        |  END AS t_stat
        |FROM m ORDER BY event_type""".stripMargin,

    "stat_higher_moments" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x*x) AS BIGINT) AS s2,
        |    CAST(sum(x*x*x) AS BIGINT) AS s3,
        |    CAST(sum(x*x*x*x) AS BIGINT) AS s4
        |  FROM (SELECT event_type,
        |      CAST(floor(round("value") / 10.0 + 0.5) AS BIGINT) AS x
        |    FROM events WHERE "value" IS NOT NULL)
        |  GROUP BY event_type),
        |tv AS (
        |  SELECT event_type, n, s1, s2,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM m),
        |cm AS (
        |  SELECT event_type, n, s1, s2, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM tv),
        |g AS (
        |  SELECT event_type, n, s1, s2,
        |    m3 / (m2 * sqrt(m2)) AS g1,
        |    m4 / (m2 * m2) - 3.0 AS g2
        |  FROM cm)
        |SELECT event_type, n,
        |  CASE WHEN n < 2 OR n*s2 - s1*s1 = 0 THEN NULL
        |       ELSE g1 END AS skewness,
        |  CASE WHEN n < 2 OR n*s2 - s1*s1 = 0 THEN NULL
        |       ELSE g2 END AS ex_kurtosis,
        |  CASE WHEN n < 2 OR n*s2 - s1*s1 = 0 THEN NULL
        |       ELSE (g1 * g1 + 1.0) / (g2 + 3.0) END AS bimodality
        |FROM g ORDER BY event_type""".stripMargin,

    "stat_effect_sizes" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
        |      IN (0, 6) AS wkend,
        |    CAST(round("value") AS BIGINT) AS x
        |  FROM events WHERE "value" IS NOT NULL),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT wkend THEN x ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN NOT wkend THEN x*x ELSE 0 END) AS BIGINT) AS sq1,
        |    CAST(sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN wkend THEN x ELSE 0 END) AS BIGINT) AS sx2,
        |    CAST(sum(CASE WHEN wkend THEN x*x ELSE 0 END) AS BIGINT) AS sq2
        |  FROM ev GROUP BY event_type),
        |tv AS (
        |  SELECT event_type, n1, n2,
        |    n1*sq1 - sx1*sx1 AS a1, n2*sq2 - sx2*sx2 AS a2,
        |    (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |     CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |    sqrt((CAST(n1*sq1 - sx1*sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) +
        |          CAST(n2*sq2 - sx2*sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |         CAST(n1 + n2 - 2 AS DOUBLE)) AS d,
        |    1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0) AS corr
        |  FROM m)
        |SELECT event_type, n1, n2,
        |  CASE WHEN n1 < 2 OR n2 < 2 OR (a1 = 0 AND a2 = 0) THEN NULL
        |       ELSE d END AS cohens_d,
        |  CASE WHEN n1 < 2 OR n2 < 2 OR (a1 = 0 AND a2 = 0) THEN NULL
        |       ELSE d * corr END AS hedges_g
        |FROM tv ORDER BY event_type""".stripMargin,

    "stat_brown_forsythe" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round("value") AS BIGINT) AS x
        |  FROM events
        |  WHERE event_type IN ('click', 'view')
        |    AND "value" IS NOT NULL),
        |r AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |med AS (SELECT event_type, x AS med FROM r
        |  WHERE rn = (n + 1) // 2),
        |z AS (SELECT ev.event_type, abs(x - med) AS z
        |  FROM ev JOIN med ON ev.event_type = med.event_type),
        |m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN z ELSE 0 END)
        |      AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN z*z ELSE 0 END)
        |      AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN z ELSE 0 END)
        |      AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN z*z ELSE 0 END)
        |      AS BIGINT) AS q2
        |  FROM z),
        |medp AS (
        |  SELECT max(CASE WHEN event_type = 'click' THEN med END)
        |      AS med_click,
        |    max(CASE WHEN event_type = 'view' THEN med END) AS med_view
        |  FROM med),
        |tv AS (
        |  SELECT n1, n2, med_click, med_view,
        |    n1*q1 - s1*s1 AS a1, n2*q2 - s2*s2 AS a2,
        |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |     CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |    sqrt(((CAST(n1*q1 - s1*s1 AS DOUBLE) / CAST(n1 AS DOUBLE) +
        |           CAST(n2*q2 - s2*s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |          CAST(n1 + n2 - 2 AS DOUBLE)) *
        |         (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
        |      AS t,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS md1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS md2
        |  FROM m, medp)
        |SELECT n1, n2, med_click, med_view,
        |  CASE WHEN n1 = 0 THEN NULL ELSE md1 END AS mean_dev_click,
        |  CASE WHEN n2 = 0 THEN NULL ELSE md2 END AS mean_dev_view,
        |  CASE WHEN n1 < 2 OR n2 < 2 OR (a1 = 0 AND a2 = 0) THEN NULL
        |       ELSE t END AS bf_t,
        |  CASE WHEN n1 < 2 OR n2 < 2 OR (a1 = 0 AND a2 = 0) THEN NULL
        |       ELSE t * t END AS bf_f
        |FROM tv""".stripMargin,

    "dq_join_fanout_estimate" ->
      """WITH pk AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(*) * count(*) AS BIGINT) AS pair_contrib
        |  FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT CAST(coalesce(sum(n_events), 0) AS BIGINT) AS t_rows,
        |    CAST(coalesce(sum(pair_contrib), 0) AS BIGINT) AS t_pairs
        |  FROM pk),
        |top AS (
        |  SELECT user_id, n_events, pair_contrib FROM pk
        |  ORDER BY pair_contrib DESC, user_id LIMIT 10)
        |SELECT user_id, n_events, pair_contrib, share_ppm FROM (
        |  SELECT top.user_id, top.n_events, top.pair_contrib,
        |    CAST(CASE WHEN t_pairs = 0 THEN 0
        |         ELSE pair_contrib * 1000000 // t_pairs END AS BIGINT)
        |      AS share_ppm
        |  FROM top, tot
        |  UNION ALL
        |  SELECT NULL, t_rows, t_pairs,
        |    CAST(CASE WHEN t_pairs = 0 THEN 0 ELSE 1000000 END AS BIGINT)
        |  FROM tot) u
        |ORDER BY user_id IS NOT NULL, pair_contrib DESC, user_id"""
        .stripMargin,

    "dq_inclusion_deps" ->
      """WITH d AS (
        |  SELECT 'customer.c_custkey<orders.o_custkey' AS dep,
        |    (SELECT count(DISTINCT c_custkey) FROM customer) AS nl,
        |    (SELECT count(DISTINCT c_custkey) FROM customer
        |     WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS nm
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey<orders.o_orderkey',
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem
        |     WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey<part.p_partkey',
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem),
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem
        |     WHERE l_partkey IN (SELECT p_partkey FROM part))
        |  UNION ALL
        |  SELECT 'orders.o_custkey<customer.c_custkey',
        |    (SELECT count(DISTINCT o_custkey) FROM orders),
        |    (SELECT count(DISTINCT o_custkey) FROM orders
        |     WHERE o_custkey IN (SELECT c_custkey FROM customer)))
        |SELECT dep, CAST(nl AS BIGINT) AS n_left_distinct,
        |  CAST(nm AS BIGINT) AS n_matched,
        |  CAST(CASE WHEN nl = 0 THEN 0
        |       ELSE nm * 1000000 // nl END AS BIGINT) AS containment_ppm,
        |  nl > 0 AND nm = nl AS fk_candidate
        |FROM d ORDER BY dep""".stripMargin,

    "stat_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
        |    CAST(sum(CAST(round("value") AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |slopes AS (
        |  SELECT a.event_type,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |ranked AS (
        |  SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope)
        |      AS rk
        |  FROM slopes),
        |np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM slopes GROUP BY event_type),
        |mid AS (
        |  SELECT r.event_type, sum(slope) / count(*) AS ts_slope
        |  FROM ranked r JOIN np ON r.event_type = np.event_type
        |  WHERE rk = (n_pairs + 1) // 2 OR rk = n_pairs // 2 + 1
        |  GROUP BY r.event_type),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY event_type)
        |SELECT nd.event_type, n_days, n_pairs, ts_slope
        |FROM nd JOIN np ON nd.event_type = np.event_type
        |JOIN mid ON nd.event_type = mid.event_type
        |ORDER BY nd.event_type""".stripMargin,

    "ts_autocorrelation" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
        |    CAST(sum(CAST(round("value") AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, x, y,
        |    lag(y) OVER w AS y_prev, lag(x) OVER w AS x_prev
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY x)),
        |pairs AS (SELECT * FROM lagged WHERE x_prev = x - 1),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sa,
        |    CAST(sum(y_prev) AS BIGINT) AS sb,
        |    CAST(sum(y*y) AS BIGINT) AS saa,
        |    CAST(sum(y_prev*y_prev) AS BIGINT) AS sbb,
        |    CAST(sum(y*y_prev) AS BIGINT) AS sab
        |  FROM pairs GROUP BY event_type)
        |SELECT event_type, n AS n_pairs,
        |  CASE WHEN n < 2 OR n*saa - sa*sa = 0 OR n*sbb - sb*sb = 0
        |    THEN NULL
        |    ELSE CAST(n*sab - sa*sb AS DOUBLE) /
        |         sqrt(CAST(n*saa - sa*sa AS DOUBLE) *
        |              CAST(n*sbb - sb*sb AS DOUBLE))
        |  END AS acf1
        |FROM m ORDER BY event_type""".stripMargin,

    "ts_seasonality_profile" ->
      s"""WITH bh AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hod,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(${Exact.centsSql("\"value\"")}) AS BIGINT) AS sxc
         |  FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2),
         |pk AS (
         |  SELECT event_type, hod AS peak_hour FROM (
         |    SELECT event_type, hod,
         |      row_number() OVER (PARTITION BY event_type
         |        ORDER BY n DESC, hod) AS rk
         |    FROM bh) WHERE rk = 1)
         |SELECT bh.event_type, hod, n,
         |  CAST(sxc AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mean_value,
         |  peak_hour
         |FROM bh JOIN pk ON bh.event_type = pk.event_type
         |ORDER BY bh.event_type, hod""".stripMargin,

    "dq_freshness" ->
      """WITH bt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS last_s
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, last_s,
        |  (SELECT max(last_s) FROM bt) - last_s AS lag_s
        |FROM bt ORDER BY event_type""".stripMargin,

    "dq_watermark_lateness" ->
      s"""WITH lsrc AS (
         |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
         |    'lat:' || CAST(event_id AS VARCHAR) AS s0
         |  FROM events),
         |${graft.llm.XxhSql.ctes("lsrc", Seq("event_id", "tsec"), "s0", "wl")},
         |lb AS (
         |  SELECT tsec + ((hv % 600) + 600) % 600
         |       - ((tsec // 300) + 1) * 300 AS late_by
         |  FROM wl_out),
         |agg AS (
         |  SELECT count(*) AS total,
         |    CAST(coalesce(sum(CASE WHEN late_by > 60 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS d60,
         |    CAST(coalesce(sum(CASE WHEN late_by > 120 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS d120,
         |    CAST(coalesce(sum(CASE WHEN late_by > 300 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS d300
         |  FROM lb),
         |g AS (SELECT CAST(v.d AS BIGINT) AS watermark_delay_s
         |      FROM (VALUES (60), (120), (300)) v(d))
         |SELECT g.watermark_delay_s,
         |  CAST(CASE g.watermark_delay_s WHEN 60 THEN d60
         |       WHEN 120 THEN d120 ELSE d300 END AS BIGINT) AS dropped,
         |  CAST(total AS BIGINT) AS total,
         |  CAST(CASE WHEN total = 0 THEN 0
         |       ELSE (CASE g.watermark_delay_s WHEN 60 THEN d60
         |             WHEN 120 THEN d120 ELSE d300 END) * 1000000 // total
         |  END AS BIGINT) AS dropped_ppm
         |FROM g, agg ORDER BY g.watermark_delay_s""".stripMargin,

    "ts_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(round("value") AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(y) AS BIGINT) AS t
        |        FROM daily GROUP BY event_type),
        |cum AS (
        |  SELECT d.event_type, d.day, tot.n, tot.t,
        |    CAST(row_number() OVER w AS BIGINT) AS i,
        |    CAST(sum(y) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy
        |  FROM daily d JOIN tot ON d.event_type = tot.event_type
        |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)),
        |scored AS (
        |  SELECT event_type, n AS n_days, day AS peak_day,
        |    abs(n * cy - i * t) AS c,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * cy - i * t) DESC, day) AS rk
        |  FROM cum)
        |SELECT event_type, n_days, peak_day, c AS max_dev
        |FROM scored WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "stat_anova_oneway" ->
      s"""WITH ev AS (
         |  SELECT event_type, ${Exact.centsSql("\"value\"")} AS xc
         |  FROM events WHERE "value" IS NOT NULL),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(sum(xc) AS BIGINT) AS sg,
         |    CAST(sum(xc * xc) AS BIGINT) AS qg
         |  FROM ev GROUP BY event_type),
         |gq AS (SELECT ng, sg, qg,
         |    CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
         |      CAST(ng AS DOUBLE)) AS BIGINT) AS ug
         |  FROM g),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
         |    CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
         |    CAST(sum(qg) AS BIGINT) AS q, CAST(sum(ug) AS BIGINT) AS u
         |  FROM gq),
         |t AS (SELECT *, CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
         |    CAST(n AS DOUBLE)) AS BIGINT) AS gterm FROM m)
         |SELECT k_groups, n, u - gterm AS ss_between_c2,
         |  q - u AS ss_within_c2,
         |  CASE WHEN k_groups < 2 OR q - u = 0 THEN NULL
         |       ELSE CAST(u - gterm AS DOUBLE) /
         |            CAST(k_groups - 1 AS DOUBLE) /
         |            (CAST(q - u AS DOUBLE) /
         |             CAST(n - k_groups AS DOUBLE)) END AS f_stat,
         |  CASE WHEN q - gterm = 0 THEN NULL
         |       ELSE CAST(u - gterm AS DOUBLE) /
         |            CAST(q - gterm AS DOUBLE) END AS eta_sq
         |FROM t""".stripMargin,

    "stat_tukey_hsd" ->
      s"""WITH ev AS (
         |  SELECT event_type, ${Exact.centsSql("\"value\"")} AS xc
         |  FROM events WHERE "value" IS NOT NULL),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(sum(xc) AS BIGINT) AS sg,
         |    CAST(sum(xc * xc) AS BIGINT) AS qg
         |  FROM ev GROUP BY event_type),
         |gq AS (SELECT event_type, ng, sg, qg,
         |    CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
         |      CAST(ng AS DOUBLE)) AS BIGINT) AS ug
         |  FROM g),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(ng) AS BIGINT) AS n, CAST(sum(qg) AS BIGINT) AS q,
         |    CAST(sum(ug) AS BIGINT) AS u
         |  FROM gq),
         |msw AS (SELECT CASE WHEN n = k THEN NULL
         |    ELSE CAST(q - u AS DOUBLE) / CAST(n - k AS DOUBLE)
         |    END AS msw FROM m)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |  a.ng AS na, b.ng AS nb,
         |  abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE) -
         |      CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE)) / 100.0
         |    AS mean_diff,
         |  CASE WHEN msw = 0 THEN NULL
         |       ELSE abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE) -
         |                CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE)) /
         |            sqrt(msw / 2.0 *
         |              (1.0 / CAST(a.ng AS DOUBLE) +
         |               1.0 / CAST(b.ng AS DOUBLE))) END AS q_stat
         |FROM gq a JOIN gq b ON a.event_type < b.event_type, msw
         |ORDER BY type_a, type_b""".stripMargin,

    "stat_kruskal_wallis" ->
      s"""WITH ev AS (
         |  SELECT event_type AS g, ${Exact.centsSql("\"value\"")} AS v
         |  FROM events WHERE "value" IS NOT NULL),
         |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
         |  FROM ev GROUP BY g, v),
         |vc AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
         |  FROM gv GROUP BY v),
         |cum AS (SELECT v, t,
         |    CAST(coalesce(sum(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS below
         |  FROM vc),
         |r AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
         |    CAST(sum(c * (below * 2 + t + 1)) AS BIGINT) AS r2
         |  FROM gv JOIN cum USING (v) GROUP BY g),
         |rq AS (SELECT ng,
         |    CAST(floor(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) /
         |      (4.0 * CAST(ng AS DOUBLE))) AS BIGINT) AS ug
         |  FROM r),
         |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ts FROM vc),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
         |    CAST(sum(ng) AS BIGINT) AS n, CAST(sum(ug) AS BIGINT) AS u
         |  FROM rq),
         |res AS (SELECT k_groups, n, ts,
         |    12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) *
         |      CAST(u AS DOUBLE) - 3.0 * CAST(n + 1 AS DOUBLE) AS h_stat,
         |    CASE WHEN n < 2 THEN NULL
         |    ELSE 1.0 - CAST(ts AS DOUBLE) /
         |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) -
         |       CAST(n AS DOUBLE)) END AS tie_corr
         |  FROM m, ties)
         |SELECT k_groups, n, ts AS ties_term, h_stat, tie_corr,
         |  CASE WHEN tie_corr = 0 THEN NULL
         |       ELSE h_stat / tie_corr END AS h_corrected
         |FROM res""".stripMargin,

    "stat_dunn_test" ->
      s"""WITH ev AS (
         |  SELECT event_type AS g, ${Exact.centsSql("\"value\"")} AS v
         |  FROM events WHERE "value" IS NOT NULL),
         |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
         |  FROM ev GROUP BY g, v),
         |vc AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
         |  FROM gv GROUP BY v),
         |cum AS (SELECT v, t,
         |    CAST(coalesce(sum(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS below
         |  FROM vc),
         |r AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
         |    CAST(sum(c * (below * 2 + t + 1)) AS BIGINT) AS r2
         |  FROM gv JOIN cum USING (v) GROUP BY g),
         |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ts FROM vc),
         |vt AS (SELECT CASE WHEN n < 2 THEN NULL
         |      ELSE CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 12.0
         |      - CAST(ts AS DOUBLE) / (12.0 * CAST(n - 1 AS DOUBLE))
         |      END AS vterm
         |  FROM (SELECT CAST(sum(ng) AS BIGINT) AS n FROM r) nn, ties)
         |SELECT a.g AS type_a, b.g AS type_b,
         |  CAST(a.r2 AS DOUBLE) / CAST(a.ng * 2 AS DOUBLE)
         |    AS mean_rank_a,
         |  CAST(b.r2 AS DOUBLE) / CAST(b.ng * 2 AS DOUBLE)
         |    AS mean_rank_b,
         |  CASE WHEN vterm <= 0 THEN NULL
         |       ELSE abs(CAST(a.r2 AS DOUBLE) / CAST(a.ng * 2 AS DOUBLE) -
         |                CAST(b.r2 AS DOUBLE) / CAST(b.ng * 2 AS DOUBLE)) /
         |            sqrt(vterm * (1.0 / CAST(a.ng AS DOUBLE) +
         |                          1.0 / CAST(b.ng AS DOUBLE))) END AS z
         |FROM r a JOIN r b ON a.g < b.g, vt
         |ORDER BY type_a, type_b""".stripMargin,

    "dq_fd_discovery" -> Seq(
      ("lineitem.l_partkey -> l_suppkey", "lineitem",
        "l_partkey", "l_suppkey"),
      ("orders.o_custkey -> o_orderpriority", "orders",
        "o_custkey", "o_orderpriority"),
      ("customer.c_custkey -> c_nationkey", "customer",
        "c_custkey", "c_nationkey"),
      ("customer.c_nationkey -> c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment"),
      ("nation.n_nationkey -> n_regionkey", "nation",
        "n_nationkey", "n_regionkey"),
      ("events.user_id -> event_type", "events",
        "user_id", "event_type"),
      ("documents.source -> lang", "documents", "source", "lang"))
      .map { case (label, table, lhs, rhs) =>
        s"""SELECT '$label' AS fd, n_rows, n_lhs, n_exact_lhs,
           |  kept * 1000000 // n_rows AS keep_ppm,
           |  n_exact_lhs = n_lhs AS is_exact
           |FROM (
           |  SELECT CAST(sum(nl) AS BIGINT) AS n_rows,
           |    CAST(count(*) AS BIGINT) AS n_lhs,
           |    CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_exact_lhs,
           |    CAST(sum(mx) AS BIGINT) AS kept
           |  FROM (
           |    SELECT l, CAST(sum(c) AS BIGINT) AS nl,
           |      CAST(max(c) AS BIGINT) AS mx,
           |      CAST(count(*) AS BIGINT) AS nd
           |    FROM (SELECT $lhs AS l, $rhs AS r,
           |        CAST(count(*) AS BIGINT) AS c
           |      FROM $table GROUP BY $lhs, $rhs) gv
           |    GROUP BY l) pg) agg""".stripMargin }
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd"),

    "dq_order_total_reconciliation" ->
      s"""WITH ls AS (
         |  SELECT l_orderkey,
         |    CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT)
         |      AS lsum
         |  FROM lineitem GROUP BY l_orderkey),
         |j AS (
         |  SELECT o_orderstatus, ${Exact.centsSql("o_totalprice")} AS oc,
         |    ls.lsum
         |  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey)
         |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(CASE WHEN lsum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_without_lines,
         |  CAST(sum(CASE WHEN lsum IS NOT NULL AND abs(oc - lsum) <= 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
         |  CAST(sum(CASE WHEN lsum IS NOT NULL THEN abs(oc - lsum)
         |    ELSE 0 END) AS BIGINT) / 100.0 AS total_abs_drift,
         |  max(CASE WHEN lsum IS NOT NULL THEN abs(oc - lsum) END) / 100.0
         |    AS max_abs_drift
         |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
