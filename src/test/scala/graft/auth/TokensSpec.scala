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
}
