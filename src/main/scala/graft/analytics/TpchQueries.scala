package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** The rest of the classic TPC-H query set (Q2, Q4, Q7–Q22), adapted to
  * the driver testdata's reduced star schema (TESTDATA.md: no partsupp
  * table; no shipmode/commitdate/receiptdate/phone/container columns).
  * Q1/Q3/Q5/Q6 live in [[RelationalQueries]] — together the full 22
  * query shapes are covered. Each adaptation keeps the ORIGINAL plan
  * shape (the thing that matters at 100 TB) and swaps only the missing
  * column for an available stand-in, documented per query:
  *  - supply cost (Q9) := 0.8 × p_retailprice;
  *  - "late" (Q4/Q12/Q21) := l_shipdate far past o_orderdate (the
  *    commit/receipt pair is absent);
  *  - supplier complaints (Q16) := s_acctbal < 0;
  *  - country code (Q22) := c_nationkey % 5;
  *  - part-supply relation (Q2/Q11/Q20) := the observed shipper
  *    relation, distinct (l_partkey, l_suppkey) pairs from lineitem.
  *
  * Scale stance (SURVEY §2.2, §4): dims broadcast, fact⋈fact shuffles
  * only on l_orderkey, every aggregate is partial map-side via
  * Catalyst, all money math is integer-cents exact (Exact.scala) so the
  * DuckDB oracle hashes match bit-for-bit. Reference provenance: the
  * reference has no relational surface (SURVEY §2.2 "Joins" row —
  * `lib/ChannelHub.js:251-279` is its only join-like op); this suite is
  * the north-star analytics surface sized for the 100 TB goal.
  */
object TpchQueries extends QuerySuite {

  // revE4 / revE4Sql (exact 1e-4-unit revenue) come from Exact._ —
  // one source of truth shared with RelationalQueries.

  /** l_quantity is integral in the testdata (verified: 0 rows with a
    * fractional part) — cast once, sum as exact longs. */
  private def qtyL: Column = col("l_quantity").cast("long")
  private val qtyLSql = "CAST(l_quantity AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 shape: correlated min over a per-part candidate set. The
    // part-supplier relation is the observed shipper set; "min cost"
    // becomes min s_acctbal. groupBy-min + join-back replaces the
    // correlated subquery — same result, no per-row re-scan at scale.
    "q2_min_acctbal_supplier" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_type") === "LARGE" && col("p_size") <= 5)
        .select("p_partkey", "p_type")
      val cand = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
      val minBal = cand.groupBy(col("p_partkey").as("mk"))
        .agg(min("s_acctbal").as("min_bal"))
      cand.join(broadcast(minBal),
          col("p_partkey") === col("mk") && col("s_acctbal") === col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q4: order-priority checking — EXISTS a lineitem shipped > 60 days
    // after the order date (the commitdate<receiptdate stand-in), over
    // one order quarter. Left-semi join keeps the probe side unexploded.
    "q4_priority_late_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // Q7: bilateral shipping volume between two nations, by supplier
    // nation × customer nation × ship year. Two broadcast copies of the
    // 25-row nation dim; the OR'd pair predicate filters post-join.
    "q7_nation_volume" -> ((s, d) => {
      val supN = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val cusN = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") <= lit("1997-12-31"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .join(broadcast(cusN), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg((guardedRevE4Sum(s, "q7_nation_volume") / 10000.0)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8: national market share — NATION_3's fraction of EUROPE-customer
    // ECONOMY-part revenue per order year. The share is a ratio of two
    // exact integer sums: one IEEE division per row, identical on both
    // engines.
    "q8_market_share" -> ((s, d) => {
      val supN = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val eurKeys = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("en_key"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") <= lit("1997-12-31")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(eurKeys), col("c_nationkey") === col("en_key"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", revE4).otherwise(0L)) /
          guardedRevE4Sum(s, "q8_market_share")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Q9: product-type profit by supplier nation × order year.
    // supplycost := 0.8 × p_retailprice (partsupp is absent); amount =
    // revenue − cost·qty, all in exact 1e-4 units. One fact⋈fact
    // shuffle (lineitem⋈orders); part/supplier/nation broadcast.
    "q9_profit_by_nation_year" -> ((s, d) => {
      val amountE4 = revE4 -
        cents(col("p_retailprice")) * lit(80L) * qtyL
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        // profit moment is wider than revE4: |amount| <= max_cents·100
        // + max_retail_cents·80·max_qty per row, all wrap-proof maxima
        .agg((Exact.momentGuard(s, "q9_profit_by_nation_year",
          "n*(max_cents*100 + max_retail_cents*80*max_qty)",
          count(lit(1)).cast("double") *
            (coalesce(max(cents(col("l_extendedprice"))), lit(0L))
              .cast("double") * lit(100.0) +
              coalesce(max(cents(col("p_retailprice"))), lit(0L))
                .cast("double") * lit(80.0) *
                coalesce(max(qtyL), lit(0L)).cast("double")))(
          sum(amountE4)) / 10000.0).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q10: returned-item reporting — top 20 customers by lost revenue
    // (returnflag 'R') in one order quarter.
    "q10_returned_items" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-07-01") &&
            col("o_orderdate") < lit("1997-10-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((guardedRevE4Sum(s, "q10_returned_items") / 10000.0)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // Q11: important-part concentration — parts whose value (shipped by
    // suppliers of nations 0–4) exceeds a fraction of the total. The
    // total is a 1-row broadcast, not a correlated rescan.
    "q11_part_value_concentration" -> ((s, d) => {
      val contrib = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .filter(col("s_nationkey") < 5).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(guardedRevE4Sum(s, "q11_part_value_concentration")
          .as("value_e4"))
      // second level: the corpus-wide total of already-guarded longs —
      // bound n_parts·max|value| from wrap-proof aggregates
      val total = contrib.agg(Exact.momentGuard(s,
        "q11_part_value_concentration", "n_parts*max_part_value",
        count(lit(1)).cast("double") *
          coalesce(max(abs(col("value_e4"))), lit(0L)).cast("double"))(
        sum(col("value_e4"))).as("total_e4"))
      contrib.crossJoin(broadcast(total))
        .filter(col("value_e4") > col("total_e4") * 0.0005)
        .select(col("p_partkey"), (col("value_e4") / 10000.0).as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    }),

    // Q12: ship-latency classification (shipmode is absent — the bucket
    // is derived from the order→ship delay) × order-priority split, one
    // ship year. Conditional aggregation over a single fact⋈fact join.
    "q12_latency_priority" -> ((s, d) => {
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      val hi = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_bucket",
          when(delay < 30, "FAST").when(delay < 60, "NORMAL").otherwise("SLOW"))
        .groupBy("ship_bucket")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_bucket")
    }),

    // Q13: customer order-count distribution (left outer join keeps
    // zero-order customers; the priority filter stands in for the
    // original comment pattern-match).
    "q13_order_count_distribution" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q14: promotion revenue share for one ship month — 100 × promo
    // revenue / total revenue, both exact integer sums.
    "q14_promo_revenue_share" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01") &&
          col("l_shipdate") < lit("1997-10-01"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", revE4).otherwise(0L)) /
          sum(revE4)).as("promo_share"),
          (sum(when(col("p_type") === "PROMO", revE4).otherwise(0L)) / 10000.0)
            .as("promo_revenue"),
          (guardedRevE4Sum(s, "q14_promo_revenue_share") / 10000.0)
            .as("total_revenue"))),

    // Q15: top supplier(s) by quarterly revenue — revenue per supplier,
    // then an integer-exact equality against the broadcast scalar max
    // (ties all surface, as in the original).
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .groupBy("l_suppkey")
        .agg(guardedRevE4Sum(s, "q15_top_supplier").as("rev_e4"))
      val mx = rev.agg(max(col("rev_e4")).as("max_e4"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_e4") === col("max_e4"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev_e4") / 10000.0).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q16: part-supplier variety — distinct shippers per (brand, type,
    // size) bucket, excluding one brand, one type, and "complaint"
    // suppliers (s_acctbal < 0 stands in for the comment match).
    // NULL l_suppkey is excluded in BOTH twins: left_anti KEEPS a
    // NULL-key row (NULL === x never matches) while SQL NOT IN
    // evaluates it to NULL and DROPS it whenever the complaint set is
    // non-empty — the 3VL fork the twins must not straddle.
    "q16_part_supplier_variety" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_suppkey").isNotNull)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))),

    // Q17: small-quantity revenue — lines under half their part's mean
    // quantity, for one brand; the per-part mean is a broadcast
    // aggregate (exact long-sum / count), not a correlated rescan.
    "q17_small_quantity_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#3")
          .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      val avgQ = li.groupBy(col("p_partkey").as("ak"))
        .agg((sum(qtyL) / count(lit(1))).as("avg_qty"))
      li.join(broadcast(avgQ), col("p_partkey") === col("ak"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((sum(cents(col("l_extendedprice"))) / 100.0 / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // Q18: large-volume customers — orders whose total quantity exceeds
    // 200, with customer enrichment; the HAVING runs map-side-partial
    // on the fact table before any join.
    "q18_large_volume_customers" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(qtyL).as("sum_qty"))
        .filter(col("sum_qty") > 200)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // Q19: disjunctive brand/size/quantity predicates — three OR'd
    // branches collapsing to one revenue row; Catalyst pushes the
    // common part-join key and evaluates the disjunction post-join.
    "q19_disjunct_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg((guardedRevE4Sum(s, "q19_disjunct_revenue") / 10000.0)
          .as("revenue"),
          count(lit(1)).as("n_lines"))),

    // Q20: heavy part shippers — suppliers in one region who shipped
    // more than 60 units of some SMALL-type part in 1997 (the
    // availqty/2 test against partsupp, re-based on the observed
    // shipment relation).
    "q20_heavy_part_shippers" -> ((s, d) => {
      val qual = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "SMALL")
          .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "p_partkey")
        .agg(sum(qtyL).as("qty"))
        .filter(col("qty") > 60)
        .select("l_suppkey").distinct()
      Tables.supplier(s, d)
        .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    }),

    // Q21: suppliers who kept orders waiting — finished orders with ≥2
    // distinct suppliers where exactly ONE supplier shipped late
    // (> 75 days after the order date), counted per supplier for one
    // region. The EXISTS / NOT-EXISTS pair of the original collapses
    // into one groupBy over the order: n_supp>1 ∧ n_late_supp=1 — no
    // double self-join of the fact table.
    "q21_waiting_suppliers" -> ((s, d) => {
      val lo = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
      val perOrder = lo.groupBy("o_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      perOrder.filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(broadcast(Tables.supplier(s, d)),
          col("late_supp") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 2)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22: dormant high-balance customers — country code := nationkey
    // mod 5; customers above the positive-balance mean with no order
    // since 1999 (anti-join), grouped by code.
    "q22_dormant_customers" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .withColumn("cntrycode", (col("c_nationkey") % 5).cast("long"))
        .filter(col("cntrycode").isin(0, 1, 3))
      val avgBal = base.filter(col("c_acctbal") > 0)
        .agg((sum(cents(col("c_acctbal"))) / 100.0 / count(lit(1))).as("avg_bal"))
      base.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("1999-01-01"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          moneySum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    }))

  def oracles: Map[String, String] = Map(
    "q2_min_acctbal_supplier" ->
      """WITH cand AS (
        |  SELECT DISTINCT p_partkey, p_type, s_suppkey, s_acctbal, s_name, n_name
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'LARGE' AND p_size <= 5)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type FROM cand c
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
        |                   WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q4_priority_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year, sum($revE4Sql)/10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  sum(CASE WHEN n2.n_name = 'NATION_3' THEN $revE4Sql ELSE 0 END)
         |    / sum($revE4Sql) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
         |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q9_profit_by_nation_year" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  sum($revE4Sql
         |      - ${centsSql("p_retailprice")} * 80 * $qtyLSql)/10000.0 AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  sum($revE4Sql)/10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-07-01'
         |  AND o_orderdate < TIMESTAMP '1997-10-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q11_part_value_concentration" ->
      s"""WITH contrib AS (
         |  SELECT l_partkey AS p_partkey, sum($revE4Sql) AS value_e4
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE s_nationkey < 5 GROUP BY 1)
         |SELECT p_partkey, value_e4/10000.0 AS part_value FROM contrib
         |WHERE value_e4 > (SELECT sum(value_e4) FROM contrib) * 0.0005
         |ORDER BY part_value DESC, p_partkey""".stripMargin,

    "q12_latency_priority" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
        |            WHEN datediff('day', o_orderdate, l_shipdate) < 60 THEN 'NORMAL'
        |            ELSE 'SLOW' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY ship_bucket""".stripMargin,

    "q13_order_count_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM co
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_revenue_share" ->
      s"""SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO' THEN $revE4Sql ELSE 0 END)
         |    / sum($revE4Sql) AS promo_share,
         |  sum(CASE WHEN p_type = 'PROMO' THEN $revE4Sql ELSE 0 END)/10000.0
         |    AS promo_revenue,
         |  sum($revE4Sql)/10000.0 AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($revE4Sql) AS rev_e4 FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, rev_e4/10000.0 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q16_part_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey IS NOT NULL
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_quantity_revenue" ->
      s"""SELECT sum(${centsSql("l_extendedprice")})/100.0/7.0 AS avg_yearly,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#3'
         |  AND l_quantity < 0.5 * (
         |    SELECT sum($qtyLSql)/count(*) FROM lineitem l2
         |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,

    "q18_large_volume_customers" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(sum($qtyLSql) AS BIGINT) AS sum_qty FROM lineitem
         |  GROUP BY l_orderkey HAVING sum($qtyLSql) > 200)
         |SELECT c_name, c_custkey, o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  o_totalprice, sum_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q19_disjunct_revenue" ->
      s"""SELECT sum($revE4Sql)/10000.0 AS revenue, count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_heavy_part_shippers" ->
      s"""SELECT s_name, n_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE p_type = 'SMALL'
         |    AND l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |  GROUP BY l_suppkey, p_partkey
         |  HAVING sum($qtyLSql) > 60)
         |ORDER BY s_name""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 75 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 2
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_dormant_customers" ->
      s"""WITH base AS (
         |  SELECT *, CAST(c_nationkey % 5 AS BIGINT) AS cntrycode FROM customer
         |  WHERE c_nationkey % 5 IN (0, 1, 3))
         |SELECT cntrycode, count(*) AS numcust,
         |  ${moneySumSql("c_acctbal")} AS totacctbal
         |FROM base
         |WHERE c_acctbal > (SELECT sum(${centsSql("c_acctbal")})/100.0/count(*)
         |                   FROM base WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
         |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
}
