package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that a silent mistake could break:
  * `suites.flatMap(_.queries).toMap` would quietly DROP a query if two
  * suites reused a name, and an oracle without a query (or vice versa
  * where one is intended) would skew the driver's pass accounting.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are globally unique across suites") {
    val perSuite = SparkEntry.suiteSizes
    assert(SparkEntry.queries.size === perSuite.sum,
      "a duplicated query name was silently dropped by the toMap merge")
  }

  test("oracle keys are globally unique across suites") {
    // the twin of the query-name guard: a cross-suite duplicate
    // oracle key would keep only the LAST entry, pass the orphan
    // check (the name is a valid query), and silently gate that
    // query against the wrong SQL
    assert(SparkEntry.oracleSql.size === SparkEntry.oracleSizes.sum,
      "a duplicated oracle key was silently dropped by the toMap merge")
  }

  test("every oracle has a query; no empty SQL") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
    }
  }
}
