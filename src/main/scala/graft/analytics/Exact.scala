package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact cross-engine arithmetic helpers.
  *
  * The driver hash-compares Spark results against a DuckDB oracle.
  * Naive `sum(double)` is order-dependent, and aggregation order differs
  * between engines (and between runs under parallelism), so money
  * aggregates are computed in integer cents: the testdata's money
  * columns carry exactly 2 decimals, hence `round(x*100)` is an exact
  * integer, integer sums are associative, and one final division by a
  * power of ten is a single deterministic IEEE op — identical doubles on
  * both engines regardless of execution order.
  */
object Exact {
  /** 2-decimal double -> exact integer cents. (`round` before `cast`:
    * Spark's double->long cast truncates while DuckDB's rounds, so the
    * cast must only ever see an integral value.) */
  def cents(c: Column): Column = round(c.multiply(100), 0).cast("long")

  /** Exact money sum in cents -> double units. */
  def moneySum(c: Column): Column = sum(cents(c)).divide(100.0)

  /** Exact mean of a 2-decimal money column. */
  def moneyAvg(c: Column): Column =
    sum(cents(c)).divide(100.0).divide(count(lit(1)))

  /** SQL twins (DuckDB dialect) — keep in lockstep with the above. */
  def centsSql(x: String): String = s"CAST(round($x*100) AS BIGINT)"
  def moneySumSql(x: String): String = s"sum(${centsSql(x)})/100.0"
  def moneyAvgSql(x: String): String = s"sum(${centsSql(x)})/100.0/count(*)"
}
