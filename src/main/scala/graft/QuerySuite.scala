package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. Every key in [[queries]]
  * that is DuckDB-expressible has a twin in [[oracles]]; keys absent from
  * [[oracles]] get the driver's weaker rows-only check (contract,
  * `SparkEntry.scala`). Column names MUST match between the two sides —
  * the driver sorts columns by name before hashing values.
  */
trait QuerySuite {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
