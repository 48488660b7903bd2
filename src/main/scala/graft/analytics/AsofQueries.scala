package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — an operator Spark lacks natively, composed from
  * existing ops (union-tag + running `last(_, ignoreNulls)` window)
  * rather than a custom physical operator, per the compose-first
  * preference: the semantics are fully expressible, one shuffle on the
  * join key, no row explosion.
  *
  * Use case: for every purchase event, the same user's most recent
  * click at-or-before the purchase (the "state as of" lookup the
  * reference's delivery gate approximates by checking live maps).
  * Oracle: DuckDB's native ASOF JOIN — a hash match proves the
  * composed dataflow implements true as-of semantics.
  *
  * Scale shape: one hash partition by user_id, one per-partition sort —
  * identical cost to any window query; contrast with the naive
  * inequality join (per-row scan of the other side).
  */
object AsofQueries extends QuerySuite {

  /** Freshness tolerance for asof_prev_click_tol (seconds). */
  val TolSeconds = 600L

  /** The composed as-of dataflow, extracted so specs can drive it with
    * fixture frames (tie coverage: two clicks in the purchase's own
    * second must resolve to the max event_id on BOTH engines). Input
    * needs event_id, user_id, event_type, ts(timestamp) columns. */
  private[analytics] def prevClickAsof(ev: DataFrame): DataFrame = {
      // at most one click per (user, second): deterministic tiebreak on
      // both engines (ASOF is ambiguous across equal timestamps)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .groupBy("user_id", "ts_s")
        .agg(max("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      // union-tag: clicks carry their id, purchases carry null; a
      // running last() over (user, time, click-before-purchase) hands
      // every purchase the latest click at-or-before it.
      val tagged = clicks
        .select(col("user_id"), col("ts_s"), lit(0).as("side"),
          col("click_id"), lit(null).cast("long").as("event_id"))
        .unionByName(purchases
          .select(col("user_id"), col("ts_s"), lit(1).as("side"),
            lit(null).cast("long").as("click_id"), col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("side"), col("click_id").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("prev_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("prev_click_id"))
        .orderBy("event_id")
  }

  /** FORWARD as-of: for every purchase, the same user's EARLIEST click
    * at-or-after it — the mirror composition (first() over a FOLLOWING
    * frame; clicks sort after purchases within a second so same-second
    * clicks count as "after"). Ties inside one second resolve to the
    * minimum click id on both engines. */
  private[analytics] def nextClickAsof(ev: DataFrame): DataFrame = {
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .groupBy("user_id", "ts_s")
        .agg(min("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      val tagged = purchases
        .select(col("user_id"), col("ts_s"), lit(0).as("side"),
          lit(null).cast("long").as("click_id"), col("event_id"))
        .unionByName(clicks
          .select(col("user_id"), col("ts_s"), lit(1).as("side"),
            col("click_id"), lit(null).cast("long").as("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("side"), col("click_id").asc_nulls_last)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      tagged
        .withColumn("next_click_id",
          first(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 0)
        .select(col("event_id"), col("user_id"), col("next_click_id"))
        .orderBy("event_id")
  }

  /** NEAREST as-of: for every purchase, the click minimizing |Δt| in
    * either direction, ties to the backward (at-or-before) side. Both
    * directional lookups run as the already-proven union-tag window
    * composition, each carrying the click's second so the final pick
    * is pure arithmetic; the directional frames then join back on the
    * purchase id — three shuffles total, all keyed, no inequality
    * join. Same-second clicks have gap 0 on both sides and resolve to
    * the backward side's max-id tiebreak, exactly like the oracle. */
  private[analytics] def nearestClickAsof(ev: DataFrame): DataFrame = {
    val clicksB = ev.filter(col("event_type") === "click")
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .groupBy("user_id", "ts_s").agg(max("event_id").as("click_id"))
    val clicksF = ev.filter(col("event_type") === "click")
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .groupBy("user_id", "ts_s").agg(min("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"))
    def side(cl: DataFrame, backward: Boolean): DataFrame = {
      val cSide = if (backward) 0 else 1
      val tagged = purchases
        .select(col("user_id"), col("ts_s"), lit(1 - cSide).as("side"),
          lit(null).cast("struct<cts:bigint,cid:bigint>").as("c"),
          col("event_id"))
        .unionByName(cl.select(col("user_id"), col("ts_s"),
          lit(cSide).as("side"),
          struct(col("ts_s").as("cts"), col("click_id").as("cid")).as("c"),
          lit(null).cast("long").as("event_id")))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("side"), col("c.cid").asc_nulls_last)
      val w =
        if (backward) ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val pick = if (backward) last(col("c"), ignoreNulls = true)
        else first(col("c"), ignoreNulls = true)
      val tag = if (backward) "p" else "n"
      tagged.withColumn("hit", pick.over(w))
        .filter(col("side") === (1 - cSide))
        .select(col("event_id"), col("user_id").as(s"${tag}_uid"),
          col("ts_s").as(s"${tag}_ts"),
          col(s"hit.cts").as(s"${tag}_cts"), col(s"hit.cid").as(s"${tag}_cid"))
    }
    val b = side(clicksB, backward = true)
    val f = side(clicksF, backward = false)
    b.join(f, Seq("event_id"))
      .select(col("event_id"), col("p_uid").as("user_id"),
        when(col("p_cid").isNull && col("n_cid").isNull,
          lit(null).cast("long"))
          .when(col("n_cid").isNull, col("p_cid"))
          .when(col("p_cid").isNull, col("n_cid"))
          .when(col("p_ts") - col("p_cts") <= col("n_cts") - col("p_ts"),
            col("p_cid"))
          .otherwise(col("n_cid")).as("nearest_click_id"),
        when(col("p_cid").isNull && col("n_cid").isNull,
          lit(null).cast("long"))
          .when(col("n_cid").isNull, col("p_ts") - col("p_cts"))
          .when(col("p_cid").isNull, col("n_cts") - col("p_ts"))
          .otherwise(least(col("p_ts") - col("p_cts"),
            col("n_cts") - col("p_ts"))).as("gap_s"))
      .orderBy("event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_prev_click" -> ((s, d) => prevClickAsof(Tables.events(s, d))),

    "asof_nearest_click" -> ((s, d) => nearestClickAsof(Tables.events(s, d))),

    // As-of with a staleness TOLERANCE — the feature-store lookup rule
    // ("use the last click only if it is fresh enough, else treat as
    // missing"; pandas merge_asof's `tolerance=`). Same backward
    // union-tag pass as asof_prev_click but carrying the click's
    // second, with the match nulled past [[TolSeconds]].
    "asof_prev_click_tol" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .groupBy("user_id", "ts_s").agg(max("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      val tagged = clicks
        .select(col("user_id"), col("ts_s"), lit(0).as("side"),
          struct(col("ts_s").as("cts"), col("click_id").as("cid")).as("c"),
          lit(null).cast("long").as("event_id"))
        .unionByName(purchases
          .select(col("user_id"), col("ts_s"), lit(1).as("side"),
            lit(null).cast("struct<cts:bigint,cid:bigint>").as("c"),
            col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("side"), col("c.cid").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("hit", last(col("c"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .withColumn("fresh",
          col("hit.cid").isNotNull &&
            col("ts_s") - col("hit.cts") <= TolSeconds)
        .select(col("event_id"), col("user_id"),
          when(col("fresh"), col("hit.cid")).as("prev_click_id"),
          when(col("fresh"), col("ts_s") - col("hit.cts")).as("gap_s"))
        .orderBy("event_id")
    }),

    "asof_next_click" -> ((s, d) => nextClickAsof(Tables.events(s, d))),

    // Multiset difference: EXCEPT ALL keeps duplicate cardinality
    // (set_except_nations is the distinct variant).
    "set_except_all_nations" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // Multiset intersection: INTERSECT ALL keeps min(duplicate
    // cardinality) per value — the remaining set-op flavor next to
    // union/distinct, intersect, except, except all.
    "set_intersect_all_nations" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")))

  def oracles: Map[String, String] = Map(
    "asof_nearest_click" ->
      """WITH cb AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |cf AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         min(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase'),
        |both_sides AS (
        |  SELECT p.event_id, p.user_id, p.ts_s,
        |    b.ts_s AS p_cts, b.click_id AS p_cid,
        |    f.ts_s AS n_cts, f.click_id AS n_cid
        |  FROM purchases p
        |  ASOF LEFT JOIN cb b
        |    ON p.user_id = b.user_id AND p.ts_s >= b.ts_s
        |  ASOF LEFT JOIN cf f
        |    ON p.user_id = f.user_id AND p.ts_s <= f.ts_s)
        |SELECT event_id, user_id,
        |  CASE WHEN p_cid IS NULL AND n_cid IS NULL THEN NULL
        |       WHEN n_cid IS NULL THEN p_cid
        |       WHEN p_cid IS NULL THEN n_cid
        |       WHEN ts_s - p_cts <= n_cts - ts_s THEN p_cid
        |       ELSE n_cid END AS nearest_click_id,
        |  CASE WHEN p_cid IS NULL AND n_cid IS NULL THEN NULL
        |       WHEN n_cid IS NULL THEN ts_s - p_cts
        |       WHEN p_cid IS NULL THEN n_cts - ts_s
        |       ELSE least(ts_s - p_cts, n_cts - ts_s) END AS gap_s
        |FROM both_sides ORDER BY event_id""".stripMargin,

    "asof_prev_click_tol" ->
      s"""WITH clicks AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         |         max(event_id) AS click_id
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |purchases AS (
         |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
         |  FROM events WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id,
         |  CASE WHEN c.click_id IS NOT NULL
         |         AND p.ts_s - c.ts_s <= $TolSeconds
         |    THEN c.click_id END AS prev_click_id,
         |  CASE WHEN c.click_id IS NOT NULL
         |         AND p.ts_s - c.ts_s <= $TolSeconds
         |    THEN p.ts_s - c.ts_s END AS gap_s
         |FROM purchases p
         |ASOF LEFT JOIN clicks c
         |  ON p.user_id = c.user_id AND p.ts_s >= c.ts_s
         |ORDER BY p.event_id""".stripMargin,

    "asof_prev_click" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.click_id AS prev_click_id
        |FROM purchases p
        |ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts_s >= c.ts_s
        |ORDER BY p.event_id""".stripMargin,

    "asof_next_click" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         min(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  (SELECT c.click_id FROM clicks c
        |   WHERE c.user_id = p.user_id AND c.ts_s >= p.ts_s
        |   ORDER BY c.ts_s, c.click_id LIMIT 1) AS next_click_id
        |FROM purchases p
        |ORDER BY p.event_id""".stripMargin,

    "set_except_all_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_intersect_all_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)
}
