package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** The relational/query surface (SURVEY §2.2: scans, projection/filter,
  * joins of every flavor, aggregation, grouping sets, sorts/top-k,
  * set-ops) exercised TPC-H-style over the driver testdata.
  *
  * Scale notes (100 TB stance):
  *  - dimension sides (region/nation/customer/supplier/part) are
  *    broadcast — the fact tables (orders/lineitem) never shuffle for
  *    dim joins;
  *  - fact⋈fact (orders⋈lineitem) is a shuffle on the join key — at
  *    scale both sides would be bucketed on orderkey; here AQE handles
  *    partition sizing;
  *  - aggregates are partial (map-side combine) for free via Catalyst;
  *  - filters and column pruning reach the parquet scan (verified via
  *    `.explain("formatted")` — see Bench).
  */
object RelationalQueries extends QuerySuite {

  // revE4 / revE4Sql (exact 1e-4-unit revenue) come from Exact._ —
  // one source of truth shared with TpchQueries.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LISTAGG/string_agg — the reporting staple that folds a group's
    // members into one ordered CSV cell. Determinism: collect then
    // sort_array BEFORE concat (collect order is partition-dependent,
    // the sorted array is not) — the exact pitfall Spark's
    // concat_ws(collect_list(...)) hides; the oracle's ORDER BY
    // inside string_agg is the same contract. Member lists are
    // region-sized (bounded domain), never fact-sized.
    "agg_string_agg" -> ((s, d) =>
      Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"),
          concat_ws(",", sort_array(collect_list(col("n_name"))))
            .as("nations_csv"))
        .orderBy("r_name")),

    // Yannakakis-style semi-join reduction, written out explicitly:
    // before the fact⋈fact join materializes anything, the middle
    // relation (orders) is REDUCED by left-semi probes from both
    // selective ends (BUILDING customers, recent lineitems), so the
    // expensive join only ever sees rows that contribute to the
    // output — the acyclic-join discipline Catalyst does not apply on
    // its own, load-bearing at 100 TB when the reducers are selective.
    // The oracle is the plain 3-way join: the hash match proves the
    // reduction is semantics-preserving.
    "join_semijoin_reduction" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val lf = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date"))
        .select(col("l_orderkey"), cents(col("l_extendedprice")).as("pc"))
      val reduced = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(lf, col("o_orderkey") === col("l_orderkey"), "left_semi")
      reduced.join(lf, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(countDistinct("o_orderkey").as("n_orders"),
          (sum("pc") / 100.0).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q1-style pricing summary: scan + filter + groupBy/agg.
    // sum_charge is the engine's widest per-row moment — cents·
    // (100−disc)·(100+tax) ≈ 1.1e11/row — crossing 2^62 at only
    // ~4·10⁷ rows per (flag, status) group, i.e. around sf25 of this
    // data: squarely inside the 100 TB design envelope, so it carries
    // a momentGuard (n·max_cents·100·(100+max_tax), all wrap-proof
    // aggregates). The guard dominates sum_disc_price's bound (same
    // product sans the tax factor), and both sums abort together when
    // it fires — one guard covers the family.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          (sum(revE4) / 10000.0).as("sum_disc_price"),
          // maxes are coalesced to 0 so an all-NULL column (whose rows
          // contribute NULL products, never summed) cannot NULL the
          // bound and disable the guard while the UNGUARDED dominated
          // sums (sum_disc_price has no tax factor) still accumulate
          Exact.momentGuard(s, "q1_pricing_summary",
            "n*max_cents*100*(100+max_tax)",
            count(lit(1)).cast("double") *
              coalesce(max(cents(col("l_extendedprice"))), lit(0L))
                .cast("double") * lit(100.0) *
              (lit(100.0) +
                coalesce(max(cents(col("l_tax"))), lit(0L)).cast("double")))(
            (sum(revE4 * (lit(100L) + cents(col("l_tax")))) / 1000000.0))
            .as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          (sum(cents(col("l_discount"))) / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-style: 3-way join, group, top-10 by revenue.
    "q3_top_orders" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg((sum(revE4) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q6 (forecast revenue change): THE pushdown showcase — a
    // pure filter-and-aggregate whose three predicates all reach the
    // parquet scan (PushedFilters) and whose projection prunes to four
    // columns; one year per output row. Revenue is exact: cents ×
    // discount-basis-points is an integer product, divided once at the
    // end.
    "q6_forecast_revenue" -> ((s, d) => {
      val bp = cents(col("l_discount")) // discount basis points
      Tables.lineitem(s, d)
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) * bp) / 10000.0).as("revenue"))
        .orderBy("ship_year")
    }),

    // TPC-H Q5-style: 6-way join (3 broadcast dims + 1 fact-fact
    // shuffle), revenue per nation.
    "q5_region_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        // per-nation groups scale with the corpus: at 100 TB
        // (~5·10¹¹ lineitems / 25 nations) the revenue sum crosses
        // 2^62 — guarded like the rest of the revE4 family
        .agg((guardedRevE4Sum(s, "q5_region_revenue") / 10000.0)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Left-semi join: customers having at least one open order.
    "join_semi_open_orders" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Anti join: customers with no orders at all.
    "join_anti_no_orders" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Left-outer join + conditional agg: order count & value per
    // customer including order-less customers.
    "join_outer_order_counts" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).divide(100.0)
            .as("total_value"))
        .orderBy("c_custkey")),

    // FULL OUTER join: browse-side and buy-side user activity merged
    // into one segment view — either side may be missing (null-padded),
    // the coalesced key survives. Both inputs are already user-keyed
    // aggregates, so the outer join runs on reduced tables.
    "join_full_outer_activity" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(count(lit(1)).as("n_views"))
      val p = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
      v.join(p, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          when(col("n_views").isNull, "buyer_only")
            .when(col("n_purchases").isNull, "browser_only")
            .otherwise("both").as("segment"))
        .orderBy("user_id")
    }),

    // Aggregation breadth: count/min/max/countDistinct + exact avg.
    "agg_nation_stats" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          moneyAvg(col("c_acctbal")).as("avg_bal"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy("n_name")),

    // Correlated-style subquery via join: parts priced above their
    // brand's exact average.
    "subquery_above_avg_parts" -> ((s, d) => {
      val p = Tables.part(s, d)
      val brandAvg = p.groupBy(col("p_brand").as("b"))
        .agg(moneyAvg(col("p_retailprice")).as("brand_avg"))
      p.join(broadcast(brandAvg), col("p_brand") === col("b"))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // Grouping sets: ROLLUP over (status, priority).
    "rollup_order_status" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // grouping() flags: the subtotal-row discriminator a reporting
    // layer needs to tell detail rows from rollup totals (NULL in a
    // group column is otherwise ambiguous with a NULL data value).
    "rollup_grouping_flags" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .select("o_orderstatus", "o_orderpriority", "g_status",
          "g_priority", "n")
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Grouping sets: CUBE over (event_type, day).
    "cube_events_day" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),

    // Set ops: nations present among customers INTERSECT suppliers.
    "set_intersect_nations" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // Set ops: customer nations EXCEPT supplier nations.
    "set_except_nations" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // Sort + limit: top-20 orders by value (global top-k — Spark
    // executes as per-partition top-k + merge, no full sort).
    "topk_orders_by_value" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // Date functions: orders per (year, month) with priority split.
    "date_orders_by_month" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
            .as("n_urgent"))
        .orderBy("y", "m")))

  def oracles: Map[String, String] = Map(
    "agg_string_agg" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "join_semijoin_reduction" ->
      s"""SELECT o_orderpriority,
         |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
         |  sum(${centsSql("l_extendedprice")}) / 100.0 AS revenue
         |FROM orders
         |JOIN customer ON c_custkey = o_custkey
         |  AND c_mktsegment = 'BUILDING'
         |JOIN lineitem ON l_orderkey = o_orderkey
         |  AND l_shipdate >= DATE '1996-01-01'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${moneySumSql("l_extendedprice")} AS sum_base_price,
         |  sum($revE4Sql)/10000.0 AS sum_disc_price,
         |  sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
         |      * (100 + ${centsSql("l_tax")}))/1000000.0 AS sum_charge,
         |  sum(l_quantity)/count(*) AS avg_qty,
         |  ${moneyAvgSql("l_extendedprice")} AS avg_price,
         |  sum(${centsSql("l_discount")})/100.0/count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  sum($revE4Sql)/10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
         |  count(*) AS n_items,
         |  sum(${centsSql("l_extendedprice")}
         |      * ${centsSql("l_discount")}) / 10000.0
         |    AS revenue
         |FROM lineitem
         |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
         |GROUP BY 1 ORDER BY ship_year""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, sum($revE4Sql)/10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "join_semi_open_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_full_outer_activity" ->
      """WITH v AS (SELECT user_id, count(*) AS n_views FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT user_id, count(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT coalesce(v.user_id, p.user_id) AS user_id,
        |  coalesce(v.n_views, 0) AS n_views,
        |  coalesce(p.n_purchases, 0) AS n_purchases,
        |  CASE WHEN v.user_id IS NULL THEN 'buyer_only'
        |       WHEN p.user_id IS NULL THEN 'browser_only'
        |       ELSE 'both' END AS segment
        |FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
        |ORDER BY user_id""".stripMargin,

    "join_outer_order_counts" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         |  coalesce(sum(${centsSql("o_totalprice")}), 0)/100.0 AS total_value
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "agg_nation_stats" ->
      s"""SELECT n_name, count(*) AS n_customers,
         |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
         |  ${moneyAvgSql("c_acctbal")} AS avg_bal,
         |  count(DISTINCT c_mktsegment) AS n_segments
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "subquery_above_avg_parts" ->
      s"""WITH ba AS (SELECT p_brand AS b,
         |    ${moneyAvgSql("p_retailprice")} AS brand_avg
         |  FROM part GROUP BY p_brand)
         |SELECT p_partkey, p_brand, p_retailprice
         |FROM part JOIN ba ON p_brand = b
         |WHERE p_retailprice > brand_avg
         |ORDER BY p_partkey""".stripMargin,

    "rollup_grouping_flags" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "rollup_order_status" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${moneySumSql("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST,
         |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "cube_events_day" ->
      s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
         |  ${moneySumSql("value")} AS total_value
         |FROM events GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
         |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,

    "set_intersect_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "topk_orders_by_value" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "date_orders_by_month" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
        |ORDER BY y, m""".stripMargin)
}
