package graft.auth

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingress auth gating as a dataflow (O20/O35): mint a token per
  * client, verify at the "connection" row, reject tampered tokens —
  * the `authorizeClient` filter (`lib/QutyCluster.js:344-373`)
  * expressed as a UDF predicate. Deterministic (fixed secret, fixed
  * expiry, injected `now`), but HMAC-SHA256 is not expressible in
  * DuckDB SQL → rows-only driver check + ScalaTest matrix.
  */
object AuthQueries extends QuerySuite {

  val Secret = "graft-test-secret"
  val FixedNow = 1704067200000L          // 2024-01-01T00:00:00Z
  val Expiry = FixedNow + 86400000L      // +1 day

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Round-trip + tamper rejection: even event_ids carry valid
    // tokens, odd ones are tampered (flipped last char of signature).
    "auth_token_gate" -> ((s, d) => {
      val mk = Tokens.createUdf
      val vf = Tokens.verifyUdf
      val tokens = Tables.customer(s, d).select(
        col("c_custkey"),
        mk(concat(lit("client-"), col("c_custkey")),
          lit(Tokens.TypeClusterClient), lit(Expiry), lit(Secret)).as("token"))
      val withTampered = tokens.withColumn("wire_token",
        when(col("c_custkey") % 2 === 0, col("token"))
          .otherwise(concat(substring(col("token"), 1, 10), lit("x"),
            substring(col("token"), 12, 100000))))
      withTampered.select(
        col("c_custkey"),
        vf(col("wire_token"), lit(Tokens.TypeClusterClient), lit(Secret),
          lit(FixedNow)).as("verified_id"),
        vf(col("wire_token"), lit(Tokens.TypeClusterClient), lit(Secret),
          lit(FixedNow)).isNotNull.as("admitted"))
        .orderBy("c_custkey")
    }))

  def oracles: Map[String, String] = Map.empty
}
