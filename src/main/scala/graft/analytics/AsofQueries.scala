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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_prev_click" -> ((s, d) => prevClickAsof(Tables.events(s, d))),

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
