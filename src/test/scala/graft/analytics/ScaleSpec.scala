package graft.analytics

import graft.SparkSpec

/** Bounds for the sketch query (the driver's check is rows-only since
  * estimates are engine-specific): HLL++ at rsd=0.02 must land within
  * 5% of the exact distinct count on every channel.
  */
class ScaleSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per channel") {
    val rows = ScaleQueries.queries("sketch_hll_users")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("salted aggregation equals naive aggregation") {
    val salted = ScaleQueries.queries("agg_salted_hot_key")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val naive = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        Exact.moneySum(org.apache.spark.sql.functions.col("value")).as("v"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == naive.toSeq)
  }
}
