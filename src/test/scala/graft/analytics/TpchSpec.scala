package graft.analytics

import graft.SparkSpec

/** Independent driver-side replays for the TPC-H adaptations whose
  * Spark formulation differs structurally from the oracle SQL — the
  * groupBy collapse of Q21's EXISTS/NOT-EXISTS pair, Q17's correlated
  * mean, and Q13's filtered outer join. Each replay is literal Scala
  * over collected rows: a third implementation that would catch a
  * shared-construction bug between the DataFrame plan and the oracle.
  */
class TpchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def lineitem = graft.Tables.lineitem(spark, sf)
    .selectExpr("l_orderkey", "l_suppkey", "l_partkey",
      "CAST(l_quantity AS BIGINT) AS qty",
      "CAST(datediff(l_shipdate, TIMESTAMP '1995-01-01') AS LONG) AS ship_day")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))

  test("q21: one-pass groupBy collapse equals the literal EXISTS scan") {
    val orders = graft.Tables.orders(spark, sf)
      .filter("o_orderstatus = 'F'")
      .selectExpr("o_orderkey",
        "CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS LONG) AS oday")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val supplierRegion2 = graft.Tables.supplier(spark, sf)
      .join(graft.Tables.nation(spark, sf).filter("n_regionkey = 2"),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .selectExpr("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // literal per-order scan: late suppliers and all suppliers
    val byOrder = lineitem.filter(l => orders.contains(l._1))
      .groupBy(_._1)
    val waits = byOrder.toSeq.flatMap { case (ok, ls) =>
      val all = ls.map(_._2).distinct
      val late = ls.filter(l => l._5 > orders(ok) + 75).map(_._2).distinct
      if (all.size > 1 && late.size == 1) Some(late.head) else None
    }
    val expect = waits.groupBy(identity).view
      .flatMap { case (sk, os) =>
        supplierRegion2.get(sk).map(_ -> os.size.toLong) }
      .toMap

    val got = TpchQueries.queries("q21_waiting_suppliers")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the query LIMITs to 20; at sf0.001 the expect set is small enough
    // that the limit never truncates — assert that precondition too
    assert(expect.size <= 20, "fixture outgrew the LIMIT — rewrite the spec")
    assert(got === expect)
  }

  test("q17: broadcast per-part mean equals the literal correlated mean") {
    val brand3 = graft.Tables.part(spark, sf)
      .filter("p_brand = 'Brand#3'").selectExpr("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val li = lineitem.filter(l => brand3.contains(l._3))
    val avgQ = li.groupBy(_._3).view.mapValues(ls =>
      ls.map(_._4).sum.toDouble / ls.size).toMap
    val expectN = li.count(l => l._4 < 0.5 * avgQ(l._3)).toLong

    val got = TpchQueries.queries("q17_small_quantity_revenue")(spark, sf)
      .collect()(0)
    assert(got.getLong(1) === expectN)
  }

  test("q13: zero-order customers appear in the c_count=0 bucket") {
    val nCust = graft.Tables.customer(spark, sf).count()
    val perCust = graft.Tables.orders(spark, sf)
      .filter("o_orderpriority <> '4-NOT SPECIFIED'")
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (graft.Tables.customer(spark, sf).select("c_custkey")
      .collect().map(r => perCust.getOrElse(r.getLong(0), 0L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = TpchQueries.queries("q13_order_count_distribution")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.values.sum === nCust)
  }
}
