package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Degenerate-input coverage for the round-6 additions: every adapted
  * TPC-H query, the KMV sketch family and the robust-stat queries must
  * survive fully EMPTY tables — scalar-subquery aggregates become
  * 1-row NULLs that must flow through comparisons as SQL NULLs
  * (filtering to empty), never crash or fabricate rows.
  */
class TpchEmptySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_empty_t").toString
    Seq.empty[(Long, Long, String, Double, java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$d/orders.parquet")
    Seq.empty[(Long, Long, Long, Int, Double, Double, Double, Double,
        String, String, java.sql.Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .repartition(1).write.parquet(s"$d/lineitem.parquet")
    Seq.empty[(Long, String, Int, Double, String)]
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .repartition(1).write.parquet(s"$d/customer.parquet")
    Seq.empty[(Long, String, Int, Double)]
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .repartition(1).write.parquet(s"$d/supplier.parquet")
    Seq.empty[(Long, String, String, String, Int, Double)]
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .repartition(1).write.parquet(s"$d/part.parquet")
    Seq.empty[(Int, String, Int)]
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .repartition(1).write.parquet(s"$d/nation.parquet")
    Seq.empty[(Int, String)].toDF("r_regionkey", "r_name")
      .repartition(1).write.parquet(s"$d/region.parquet")
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("every adapted TPC-H list query is empty on empty tables") {
    for (q <- Seq("q2_min_acctbal_supplier", "q4_priority_late_orders",
        "q7_nation_volume", "q8_market_share", "q9_profit_by_nation_year",
        "q10_returned_items", "q11_part_value_concentration",
        "q12_latency_priority", "q13_order_count_distribution",
        "q15_top_supplier", "q16_part_supplier_variety",
        "q18_large_volume_customers", "q20_heavy_part_shippers",
        "q21_waiting_suppliers", "q22_dormant_customers"))
      assert(SparkEntry.queries(q)(spark, dir).count() === 0L,
        s"$q must be empty, not crash")
  }

  test("scalar-aggregate TPC-H queries produce one NULL row, not a crash") {
    // global aggregates without GROUP BY legitimately emit one row
    for (q <- Seq("q14_promo_revenue_share", "q17_small_quantity_revenue",
        "q19_disjunct_revenue")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.length === 1, q)
      assert(rows(0).isNullAt(0), s"$q revenue/share must be NULL on empty")
    }
  }

  test("KMV and robust-stat queries survive empty events") {
    assert(SparkEntry.queries("sketch_kmv_users")(spark, dir).count() === 0L)
    assert(SparkEntry.queries("stat_mad_daily")(spark, dir).count() === 0L)
    assert(SparkEntry.queries("stat_mode_per_type")(spark, dir).count() === 0L)
    // global-aggregate rows: may be a single all-NULL row, never a crash
    assert(SparkEntry.queries("sketch_kmv_merge")(spark, dir).count() <= 1L)
    assert(SparkEntry.queries("sketch_kmv_overlap")(spark, dir).count() <= 1L)
  }
}
