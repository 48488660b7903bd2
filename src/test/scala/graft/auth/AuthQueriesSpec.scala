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
}
