package graft.auth

import org.scalatest.funsuite.AnyFunSuite

/** Token matrix from `lib/token.js:70-99`: valid; expired `_e`; wrong
  * `_t`; bad signature; malformed shape (3+ dash parts).
  */
class TokensSpec extends AnyFunSuite {
  private val secret = "s3cret"
  private val now = 1704067200000L

  test("valid token verifies and yields the id") {
    val t = Tokens.create("client-7", Tokens.TypeClusterClient, now + 1000, secret)
    assert(Tokens.verify(t, Tokens.TypeClusterClient, secret, now)
      .contains("client-7"))
  }

  test("expired token is rejected") {
    val t = Tokens.create("c", Tokens.TypeClusterClient, now - 1, secret)
    assert(Tokens.verify(t, Tokens.TypeClusterClient, secret, now).isEmpty)
  }

  test("wrong token type is rejected") {
    val t = Tokens.create("c", Tokens.TypeHub, now + 1000, secret)
    assert(Tokens.verify(t, Tokens.TypeCluster, secret, now).isEmpty)
  }

  test("tampered signature is rejected") {
    val t = Tokens.create("c", Tokens.TypeCluster, now + 1000, secret)
    val bad = t.dropRight(1) + (if (t.last == 'A') 'B' else 'A')
    assert(Tokens.verify(bad, Tokens.TypeCluster, secret, now).isEmpty)
  }

  test("wrong secret is rejected") {
    val t = Tokens.create("c", Tokens.TypeCluster, now + 1000, secret)
    assert(Tokens.verify(t, Tokens.TypeCluster, "other", now).isEmpty)
  }

  test("expiry boundary: token expiring exactly at `now` is still valid") {
    // lib/token.js rejects with `_e < now` — equality passes.
    val t = Tokens.create("edge", Tokens.TypeCluster, now, secret)
    assert(Tokens.verify(t, Tokens.TypeCluster, secret, now).contains("edge"))
  }

  test("ids with quotes, backslashes and control chars round-trip") {
    for (id <- Seq("""he said "hi"""", """back\slash""", "tab\there", "a,b}c"))
      {
        val t = Tokens.create(id, Tokens.TypeCluster, now + 1000, secret)
        assert(Tokens.verify(t, Tokens.TypeCluster, secret, now).contains(id),
          s"id '$id' must round-trip")
      }
  }

  test("malformed shapes are rejected") {
    for (bad <- Seq("", "justonepart", "a-b-c", "-b", "a-"))
      assert(Tokens.verify(bad, Tokens.TypeCluster, secret, now).isEmpty,
        s"should reject '$bad'")
  }

  test("verify is total: NULL token and non-numeric claims reject, never throw") {
    // round-12 review: via verifyUdf a single throwing row aborts the
    // whole ingress query — the contract is None, not an exception
    assert(Tokens.verify(null, Tokens.TypeCluster, secret, now).isEmpty)
    // validly-SIGNED bodies with non-Long claim text (another minter
    // sharing the secret): reject via toLongOption, no crash
    def signed(json: String): String = {
      val b64 = java.util.Base64.getEncoder
        .encodeToString(json.getBytes("UTF-8"))
      val sig = java.util.Base64.getEncoder.encodeToString(
        javax.crypto.Mac.getInstance("HmacSHA256") match {
          case m =>
            m.init(new javax.crypto.spec.SecretKeySpec(
              secret.getBytes("UTF-8"), "HmacSHA256"))
            m.doFinal(b64.getBytes("UTF-8"))
        })
      s"$b64-$sig"
    }
    val badClaims = Seq(
      """{"_v":null,"_t":1,"_e":9999999999999,"_i":"u1"}""",
      """{"_v":1,"_t":1,"_e":1704067200000.5,"_i":"u1"}""",
      """{"_v":abc,"_t":1,"_e":9999999999999,"_i":"u1"}""",
      // malformed unicode escapes in a validly-signed id claim:
      // reject, not NumberFormatException (round-12 self-review
      // finding; the backslash-u is spliced in to dodge scalac's own
      // source-level unicode-escape processing)
      "{\"_v\":1,\"_t\":1,\"_e\":9999999999999,\"_i\":\"x\\" + "uZZZZ\"}",
      "{\"_v\":1,\"_t\":1,\"_e\":9999999999999,\"_i\":\"x\\" + "u12\"}")
    for (j <- badClaims)
      assert(Tokens.verify(signed(j), Tokens.TypeCluster, secret, now).isEmpty,
        s"should reject (not throw) on $j")
  }
}
