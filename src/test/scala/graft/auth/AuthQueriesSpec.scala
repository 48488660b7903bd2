package graft.auth

import graft.SparkSpec

/** Content pin for the rows-only `auth_token_gate` driver row: the
  * gate's admitted set must exactly equal the set derived by applying
  * [[Tokens.create]]/[[Tokens.verify]] (the TokensSpec-verified
  * scalar API) plus the query's own tamper rule to every customer —
  * so the dataflow can never drift from the token semantics it wraps.
  */
class AuthQueriesSpec extends SparkSpec {

  test("auth_token_gate admitted set equals the scalar-API-derived set") {
    val sf = "/root/testdata/sf0.001"
    val got = AuthQueries.queries("auth_token_gate")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getBoolean(2))).toMap
    assert(got.nonEmpty)

    val keys = graft.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    assert(got.keySet == keys.toSet)

    var admitted = 0
    keys.foreach { k =>
      val token = Tokens.create(s"client-$k", Tokens.TypeClusterClient,
        AuthQueries.Expiry, AuthQueries.Secret)
      // replicate the query's tamper rule for odd keys: replace the
      // 11th character with 'x' (substring(1,10) + 'x' + substring(12))
      val wire =
        if (k % 2 == 0) token
        else token.take(10) + "x" + token.drop(11)
      val want = Tokens.verify(wire, Tokens.TypeClusterClient,
        AuthQueries.Secret, AuthQueries.FixedNow)
      assert(got(k) == (want, want.isDefined),
        s"customer $k: gate says ${got(k)}, scalar API says $want")
      if (want.isDefined) admitted += 1
    }
    // the fixture must exercise both branches
    assert(admitted > 0 && admitted < keys.length)
    // every even key's untampered token must admit with the right id
    keys.filter(_ % 2 == 0).foreach { k =>
      assert(got(k) == (Some(s"client-$k"), true), s"customer $k")
    }
  }

  test("gate-oracle soundness: tamper position 11 is constant and != 'x'") {
    // The DuckDB oracle for auth_token_gate predicts odd keys are
    // ALWAYS rejected. That holds iff the tampered character differs
    // from the original for every row — position 11 sits inside the
    // base64 of the constant claim prefix {"_e":<expiry>, so it is
    // the same character for all ids and it is not 'x'.
    val chars = (1L to 200L).map { k =>
      Tokens.create(s"client-$k", Tokens.TypeClusterClient,
        AuthQueries.Expiry, AuthQueries.Secret).charAt(10)
    }.toSet
    assert(chars.size == 1, s"position 11 varies across ids: $chars")
    assert(!chars.contains('x'), "tamper would be a no-op")
  }

  test("auth_token_mint sig matches javax.crypto HMAC byte-for-byte") {
    val sf = "/root/testdata/sf0.001"
    val got = AuthQueries.queries("auth_token_mint")(spark, sf).collect()
    assert(got.nonEmpty)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      AuthQueries.Secret.getBytes("UTF-8"), "HmacSHA256"))
    got.foreach { r =>
      val (k, body, sigHex) = (r.getLong(0), r.getString(1), r.getString(2))
      val wantJson = s"""{"_e":${AuthQueries.Expiry},"_v":1,"_t":3,"_i":"client-$k"}"""
      assert(body == java.util.Base64.getEncoder.encodeToString(wantJson.getBytes("UTF-8")))
      val want = mac.doFinal(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(sigHex == want, s"customer $k")
    }
  }
}
