package graft.auth

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Auth-token create/verify (SURVEY §2.1 O35) mirroring the reference's
  * HMAC-SHA256 token scheme (`lib/token.js:35-56` create,
  * `lib/token.js:70-99` verify): token = `{b64(json)}-{b64(hmac)}` with
  * claims `_e` expiry epoch-millis, `_v` version, `_t` type
  * (1=HUB, 2=CLUSTER, 3=CLUSTER_CLIENT), `_i` id.
  *
  * Validation order replicates the reference: shape (exactly one dash,
  * both parts non-empty) → signature → JSON parse → version → type →
  * expiry. Exposed both as plain Scala (driver/ingress use) and as
  * Spark UDFs for ingress-time filtering (`authorizeClient` analog,
  * `lib/QutyCluster.js:344-373`).
  */
object Tokens {

  val Version = 1
  val TypeHub = 1
  val TypeCluster = 2
  val TypeClusterClient = 3

  private def hmac(data: String, secret: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** STANDARD base64 (alphabet A-Za-z0-9+/): its alphabet never
    * contains '-', so the token's dash separator splits unambiguously.
    * (URL-safe base64 would put '-' inside the parts and break the
    * 2-part shape check.) */
  private def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)

  /** JSON string escaping for the id claim — the reference serializes
    * with an escaping stringify (`util.safeStringify`), so an id
    * containing '"' or '\' must not produce malformed JSON here. */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Returns None on a malformed \u escape (non-hex digits): the
    * caller's contract is reject-not-crash, and a validly-signed body
    * minted elsewhere can carry any bytes — a NumberFormatException
    * here would abort a whole ingress query through [[verifyUdf]]. */
  private def jsonUnescape(s: String): Option[String] = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            val hex = s.substring(i + 2, i + 6)
            if (!hex.forall(ch => Character.digit(ch, 16) >= 0)) return None
            sb.append(Integer.parseInt(hex, 16).toChar)
            i += 5
          case 'u' => return None // truncated \u escape
          case e => sb.append(e); i += 1
        }
      } else sb.append(c)
      i += 1
    }
    Some(sb.toString)
  }

  /** Minimal JSON for the fixed claim set (no library dependency). */
  private def claimsJson(id: String, tokenType: Int, expiryMillis: Long): String =
    s"""{"_e":$expiryMillis,"_v":$Version,"_t":$tokenType,"_i":"${jsonEscape(id)}"}"""

  def create(id: String, tokenType: Int, expiryMillis: Long,
      secret: String): String = {
    val payload = claimsJson(id, tokenType, expiryMillis)
    val body = b64(payload.getBytes(UTF_8))
    s"$body-${b64(hmac(body, secret))}"
  }

  /** Verify → Some(id) or None; `now` injected for determinism. The
    * contract is TOTAL: any malformed input — including NULL (a token
    * extracted from a malformed frame is NULL by the Frames contract)
    * and non-numeric claim text in a validly-signed body — returns
    * None; the verifier never throws, because via [[verifyUdf]] a
    * single throwing row would abort the whole ingress query. */
  def verify(token: String, tokenType: Int, secret: String,
      now: Long): Option[String] = {
    if (token == null) return None
    val parts = token.split("-", -1)
    if (parts.length != 2 || parts(0).isEmpty || parts(1).isEmpty) return None
    val (body, sig) = (parts(0), parts(1))
    // Constant-time comparison on the raw MAC bytes (the JVM gives this
    // for free via MessageDigest.isEqual; the reference's != is not).
    val sigBytes = try Base64.getDecoder.decode(sig)
      catch { case _: IllegalArgumentException => return None }
    if (!java.security.MessageDigest.isEqual(hmac(body, secret), sigBytes))
      return None
    val json = try new String(Base64.getDecoder.decode(body), UTF_8)
      catch { case _: IllegalArgumentException => return None }
    def field(k: String): Option[String] =
      s""""$k":"?([^,}"]+)"?""".r.findFirstMatchIn(json).map(_.group(1))
    // the id claim is a JSON string that may contain escapes — match
    // escape-aware and unescape (the numeric claims stay on the simple
    // pattern above).
    def idField: Option[String] =
      """"_i":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
        .flatMap(m => jsonUnescape(m.group(1)))
    // toLongOption, not toLong: a validly-SIGNED token minted by
    // another implementation can carry non-numeric claim text
    // ("_v":null, a float expiry) — that is a reject, not a crash
    val ok = for {
      v <- field("_v").flatMap(_.toLongOption) if v == Version
      t <- field("_t").flatMap(_.toLongOption) if t == tokenType
      // reference boundary (lib/token.js: `_e < now` rejects): a token
      // expiring exactly AT `now` is still valid.
      e <- field("_e").flatMap(_.toLongOption) if e >= now
      i <- idField
    } yield i
    ok
  }

  /** UDF pair for ingress-time filtering in a dataflow. */
  def createUdf: UserDefinedFunction =
    udf((id: String, tokenType: Int, expiry: Long, secret: String) =>
      create(id, tokenType, expiry, secret))

  def verifyUdf: UserDefinedFunction =
    udf((token: String, tokenType: Int, secret: String, now: Long) =>
      verify(token, tokenType, secret, now))
}
