package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning evidence (SURVEY §4): on a year-partitioned
  * fact table joined to a filtered dimension, Catalyst must inject a
  * dynamicpruning expression into the fact scan's PartitionFilters —
  * the runtime analog of static partition pruning, and the mechanism
  * that keeps a 100 TB date-partitioned fact from full-scanning when
  * the query only names dimension attributes. Asserted on the plan AND
  * on result equality with the statically-pruned twin.
  */
class DppSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("dynamic partition pruning engages on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(s"$dir/orders_part")
    val fact = spark.read.parquet(s"$dir/orders_part")

    // dimension: year → era label; the filter selects 2 of the years
    val years = fact.select(col("o_year")).distinct()
      .withColumn("era", when(col("o_year") <= 1996, "early")
        .otherwise("late"))
    years.write.parquet(s"$dir/year_dim")
    val dim = spark.read.parquet(s"$dir/year_dim")

    val q = fact.join(broadcast(dim.filter(col("era") === "early")), "o_year")
      .agg(count(lit(1)).as("n"), sum(graft.analytics.Exact.cents(
        col("o_totalprice"))).as("v"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")

    // result equality with the statically-pruned twin
    val expect = fact.filter(col("o_year") <= 1996)
      .agg(count(lit(1)), sum(graft.analytics.Exact.cents(col("o_totalprice"))))
      .collect()(0)
    val got = q.collect()(0)
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getLong(1) === expect.getLong(1))
    assert(got.getLong(0) > 0L)
  }
}
