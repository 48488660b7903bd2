package graft.auth

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingress auth gating as a dataflow (O20/O35): mint a token per
  * client, verify at the "connection" row, reject tampered tokens —
  * the `authorizeClient` filter (`lib/QutyCluster.js:344-373`)
  * expressed as a UDF predicate. Deterministic (fixed secret, fixed
  * expiry, injected `now`) and fully hash-checked:
  *
  *   - `auth_token_mint` outputs the signature BYTES (hex), and its
  *     oracle recomputes them with [[HmacSql]] — an independent
  *     HMAC-SHA256 implementation in DuckDB SQL — so the driver's
  *     hash gate pins the MAC byte-for-byte.
  *   - `auth_token_gate`'s oracle predicts the admit/reject
  *     semantics: even custkeys carry untampered tokens (round-trip
  *     to their id), odd ones have body position 11 flipped to 'x'.
  *     Position 11 sits inside the base64 of the CONSTANT claim
  *     prefix `{"_e":<expiry>...` shared by every row, where the
  *     original char is 'c' ≠ 'x' — so the tamper always corrupts
  *     and verification always rejects (AuthQueriesSpec asserts the
  *     position-11 invariant; the signature itself is pinned by the
  *     sibling's oracle).
  */
object AuthQueries extends QuerySuite {

  val Secret = "graft-test-secret"
  val FixedNow = 1704067200000L          // 2024-01-01T00:00:00Z
  val Expiry = FixedNow + 86400000L      // +1 day

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Round-trip + tamper rejection: even c_custkeys carry valid
    // tokens, odd ones are tampered (body char at position 11
    // replaced - the constant-prefix position AuthQueriesSpec pins,
    // NOT the signature tail; the class doc explains why).
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
      // ONE verify UDF call per row: admitted derives from the
      // already-computed column instead of re-running the double
      // SHA-256 (subexpression elimination is not guaranteed for
      // non-deterministic-looking UDFs)
      withTampered.select(
        col("c_custkey"),
        vf(col("wire_token"), lit(Tokens.TypeClusterClient), lit(Secret),
          lit(FixedNow)).as("verified_id"))
        .withColumn("admitted", col("verified_id").isNotNull)
        .orderBy("c_custkey")
    }),

    // Token minting with the MAC exposed: body (base64 claims) and
    // the HMAC-SHA256 signature as lowercase hex. The oracle rebuilds
    // both from the raw tables — the signature via HmacSql's in-SQL
    // SHA-256 — so a single flipped bit anywhere in the token scheme
    // (claim serialization, base64, padding, MAC) fails the driver's
    // hash gate.
    "auth_token_mint" -> ((s, d) => {
      val mk = Tokens.createUdf
      Tables.customer(s, d).select(
        col("c_custkey"),
        mk(concat(lit("client-"), col("c_custkey")),
          lit(Tokens.TypeClusterClient), lit(Expiry), lit(Secret)).as("token"))
        .select(col("c_custkey"),
          split(col("token"), "-").getItem(0).as("body"),
          lower(hex(unbase64(split(col("token"), "-").getItem(1)))).as("sig_hex"))
        .orderBy("c_custkey")
    }))

  def oracles: Map[String, String] = Map(
    "auth_token_gate" ->
      s"""SELECT c_custkey,
         |  CASE WHEN c_custkey % 2 = 0 THEN 'client-' || c_custkey END AS verified_id,
         |  c_custkey % 2 = 0 AS admitted
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "auth_token_mint" ->
      s"""WITH mint_src AS (
         |  SELECT c_custkey,
         |    to_base64(('{"_e":$Expiry,"_v":${Tokens.Version},"_t":${Tokens.TypeClusterClient},"_i":"client-' || c_custkey || '"}')::BLOB) AS body
         |  FROM customer),
         |${HmacSql.ctes("mint_src", Seq("c_custkey", "body"), "body", Secret, "mac")}
         |SELECT c_custkey, body, mac_hex AS sig_hex FROM mac_out ORDER BY c_custkey""".stripMargin)
}
