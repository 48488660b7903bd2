package graft.analytics

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

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id"), col("event_type"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    }))

  private val secSql = "CAST(floor(epoch(ts)) AS BIGINT)"

  def oracles: Map[String, String] = Map(
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
         |SELECT 1 AS stage, 'view' AS stage_name, count(*) AS n_users FROM v
         |UNION ALL
         |SELECT 2, 'click', count(*) FROM c
         |UNION ALL
         |SELECT 3, 'purchase', count(*) FROM p
         |ORDER BY stage""".stripMargin,

    "cohort_weekly_retention" ->
      s"""WITH weeks AS (
         |  SELECT DISTINCT user_id, $secSql // 604800 AS week FROM events),
         |first AS (SELECT user_id, min(week) AS cohort_week
         |          FROM weeks GROUP BY user_id)
         |SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
         |  count(DISTINCT w.user_id) AS n_users
         |FROM weeks w JOIN first f ON w.user_id = f.user_id
         |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

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
         |ORDER BY rk""".stripMargin)
}
