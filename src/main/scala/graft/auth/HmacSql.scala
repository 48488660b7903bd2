package graft.auth

/** DuckDB replay of HMAC-SHA256 as generated SQL — the piece that
  * converts the auth-token family from rows-only to hash-checked.
  *
  * HMAC(K, m) = SHA256(opad ∥ SHA256(ipad ∥ m)) with ipad/opad the
  * 64-byte-padded key XORed with 0x36/0x5c (RFC 2104). Two
  * observations make this expressible in DuckDB, whose `sha256()`
  * accepts VARCHAR only:
  *
  *   - For an ASCII secret, every ipad byte is ASCII (< 0x80), so
  *     `ipad ∥ body` is a valid UTF-8 VARCHAR and the INNER hash is
  *     just the builtin `sha256(ipadStr || body)` (emitted as a
  *     `chr()` chain — some XORed bytes are control characters).
  *   - The OUTER input is `opad(64B) ∥ digest(32B)` — 96 bytes = two
  *     SHA-256 blocks of which the first is the CONSTANT opad block.
  *     Its compression from the IV is precomputed here in Scala
  *     ([[midstate]]), so the SQL only replays ONE 64-round
  *     compression whose message block is the inner digest (parsed
  *     from hex) plus fixed padding (0x80, zeros, bit-length 768).
  *
  * All arithmetic is 32-bit wrapping, carried in BIGINT mod 2^32:
  * rotr r = x div 2^r + (x mod 2^r)·2^(32−r); xor/and/or are DuckDB
  * BIGINT bit ops. The 48-word schedule expansion and the 64 rounds
  * both run as `list_reduce` folds with BIGINT-list accumulators —
  * NOT struct accumulators: this DuckDB version mis-evaluates struct
  * literals inside `list_reduce` lambdas (all fields collapse to one
  * value; reproduced on a 3-field shift), while list accumulators
  * are exact.
  *
  * Validated (prototype) against `javax.crypto.Mac` on empty / short
  * / long bodies, and end-to-end by the driver's hash gate on
  * `auth_token_mint`. Mirrors [[graft.llm.XxhSql]] (the XXH64
  * replay) in structure.
  */
object HmacSql {

  private val M = 4294967296L // 2^32

  private val K: Array[Long] = Array(
    0x428a2f98L, 0x71374491L, 0xb5c0fbcfL, 0xe9b5dba5L, 0x3956c25bL,
    0x59f111f1L, 0x923f82a4L, 0xab1c5ed5L, 0xd807aa98L, 0x12835b01L,
    0x243185beL, 0x550c7dc3L, 0x72be5d74L, 0x80deb1feL, 0x9bdc06a7L,
    0xc19bf174L, 0xe49b69c1L, 0xefbe4786L, 0x0fc19dc6L, 0x240ca1ccL,
    0x2de92c6fL, 0x4a7484aaL, 0x5cb0a9dcL, 0x76f988daL, 0x983e5152L,
    0xa831c66dL, 0xb00327c8L, 0xbf597fc7L, 0xc6e00bf3L, 0xd5a79147L,
    0x06ca6351L, 0x14292967L, 0x27b70a85L, 0x2e1b2138L, 0x4d2c6dfcL,
    0x53380d13L, 0x650a7354L, 0x766a0abbL, 0x81c2c92eL, 0x92722c85L,
    0xa2bfe8a1L, 0xa81a664bL, 0xc24b8b70L, 0xc76c51a3L, 0xd192e819L,
    0xd6990624L, 0xf40e3585L, 0x106aa070L, 0x19a4c116L, 0x1e376c08L,
    0x2748774cL, 0x34b0bcb5L, 0x391c0cb3L, 0x4ed8aa4aL, 0x5b9cca4fL,
    0x682e6ff3L, 0x748f82eeL, 0x78a5636fL, 0x84c87814L, 0x8cc70208L,
    0x90befffaL, 0xa4506cebL, 0xbef9a3f7L, 0xc67178f2L)

  private val IV: Array[Long] = Array(
    0x6a09e667L, 0xbb67ae85L, 0x3c6ef372L, 0xa54ff53aL,
    0x510e527fL, 0x9b05688cL, 0x1f83d9abL, 0x5be0cd19L)

  private def rotr(x: Long, r: Int): Long =
    ((x >>> r) | (x << (32 - r))) & 0xffffffffL

  /** One SHA-256 compression (FIPS 180-4), used only to fold the
    * constant opad block into the midstate at SQL-generation time. */
  private def compress(state: Array[Long], block: Array[Byte]): Array[Long] = {
    val w = new Array[Long](64)
    var t = 0
    while (t < 16) {
      w(t) = ((block(4 * t) & 0xffL) << 24) | ((block(4 * t + 1) & 0xffL) << 16) |
        ((block(4 * t + 2) & 0xffL) << 8) | (block(4 * t + 3) & 0xffL)
      t += 1
    }
    while (t < 64) {
      val s0 = rotr(w(t - 15), 7) ^ rotr(w(t - 15), 18) ^ (w(t - 15) >>> 3)
      val s1 = rotr(w(t - 2), 17) ^ rotr(w(t - 2), 19) ^ (w(t - 2) >>> 10)
      w(t) = (s1 + w(t - 7) + s0 + w(t - 16)) % M
      t += 1
    }
    var Array(a, b, c, d, e, f, g, h) = state
    t = 0
    while (t < 64) {
      val t1 = (h + (rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)) +
        (g ^ (e & (f ^ g))) + K(t) + w(t)) % M
      val t2 = ((rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)) +
        ((a & b) ^ (a & c) ^ (b & c))) % M
      h = g; g = f; f = e; e = (d + t1) % M
      d = c; c = b; b = a; a = (t1 + t2) % M
      t += 1
    }
    Array((state(0) + a) % M, (state(1) + b) % M, (state(2) + c) % M,
      (state(3) + d) % M, (state(4) + e) % M, (state(5) + f) % M,
      (state(6) + g) % M, (state(7) + h) % M)
  }

  private def pad(secret: String): Array[Byte] = {
    val sb = secret.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(sb.length <= 64, "keys longer than a block would be pre-hashed")
    sb ++ Array.fill[Byte](64 - sb.length)(0)
  }

  /** State after compressing the opad block — 8 constant words. */
  private def midstate(secret: String): Array[Long] =
    compress(IV, pad(secret).map(b => (b ^ 0x5c).toByte))

  /** The ipad string as a `chr()` chain (ASCII-safe by construction;
    * XORed control bytes can't sit in a plain SQL literal). */
  private def ipadExpr(secret: String): String = {
    val bytes = pad(secret).map(b => (b ^ 0x36) & 0xff)
    require(bytes.forall(_ < 0x80), "non-ASCII secret would break the VARCHAR inner hash")
    // a secret byte 0x36 ('6') XORs to 0 and chr(0) is a NUL DuckDB
    // rejects in VARCHAR — fail at build time with the reason, not at
    // oracle time with a family-wide SQL error
    require(bytes.forall(_ != 0),
      "secret containing 0x36 ('6') would produce a NUL ipad byte the " +
        "oracle's VARCHAR inner hash cannot carry; pick a '6'-free secret")
    bytes.map(b => s"chr($b)").mkString("(", " || ", ")")
  }

  private def sqlRotr(x: String, r: Int): String =
    s"(($x) // ${1L << r} + (($x) % ${1L << r}) * ${1L << (32 - r)})"
  private def sqlXor(a: String, b: String) =
    s"xor(($a)::BIGINT, ($b)::BIGINT)"
  private def x3(a: String, b: String, c: String) = sqlXor(sqlXor(a, b), c)

  /** Parse big-endian word j (0-based) of a 64-char hex digest. */
  private def hexWord(j: Int): String =
    s"list_reduce(list_transform(range(1,9), i -> " +
      s"instr('0123456789abcdef', substr(inner_hex, $j*8 + i, 1)) - 1), (a,b) -> a*16 + b)"

  /** CTE chain from `src` (columns `keys` + VARCHAR column `body`) to
    * `<pre>_out` (columns `keys` + `mac_hex` = lowercase-hex
    * HMAC-SHA256(secret, body)). Emits only CTE bodies — embed inside
    * a `WITH`. */
  def ctes(src: String, keys: Seq[String], body: String, secret: String,
      pre: String): String = {
    val ks = keys.mkString(", ")
    val h1 = midstate(secret)
    // schedule: a[k] is w[k-1]; appending w[t] needs w[t-2]=a[len-1],
    // w[t-7]=a[len-6], w[t-15]=a[len-14], w[t-16]=a[len-15]
    val s0 = x3(sqlRotr("a[len(a)-14]", 7), sqlRotr("a[len(a)-14]", 18), "(a[len(a)-14]) // 8")
    val s1 = x3(sqlRotr("a[len(a)-1]", 17), sqlRotr("a[len(a)-1]", 19), "(a[len(a)-1]) // 1024")
    val wexp = s"list_reduce(list_concat([w16], list_transform(range(16,64), t -> [t::BIGINT])), " +
      s"(a, x) -> list_append(a, ($s1 + a[len(a)-6] + $s0 + a[len(a)-15]) % $M))"
    // rounds: state list s = [a,b,c,d,e,f,g,h]; step element x = [t]
    val sS1 = x3(sqlRotr("s[5]", 6), sqlRotr("s[5]", 11), sqlRotr("s[5]", 25))
    val ch = sqlXor("s[7]", s"(s[5])::BIGINT & (${sqlXor("s[6]", "s[7]")})::BIGINT")
    val t1 = s"(s[8] + $sS1 + $ch + kl[x[1]+1] + wl[x[1]+1]) % $M"
    val sS0 = x3(sqlRotr("s[1]", 2), sqlRotr("s[1]", 13), sqlRotr("s[1]", 22))
    val mj = "((s[1])::BIGINT & (s[2])::BIGINT) | ((s[1])::BIGINT & (s[3])::BIGINT) | " +
      "((s[2])::BIGINT & (s[3])::BIGINT)"
    val t2 = s"($sS0 + ($mj)) % $M"
    val init = h1.map(v => s"${v}::BIGINT").mkString("[", ",", "]")
    val rounds = s"list_reduce(list_concat([$init], list_transform(range(0,64), t -> [t::BIGINT])), " +
      s"(s, x) -> [(($t1) + $t2) % $M, s[1], s[2], s[3], (s[4] + ($t1)) % $M, s[5], s[6], s[7]])"
    def hexOf(e: String) = s"lpad(lower(to_hex(($e)::BIGINT)), 8, '0')"
    val finalHex = h1.zipWithIndex
      .map { case (v, i) => hexOf(s"(fs[${i + 1}] + $v) % $M") }.mkString(" || ")
    val klLit = K.mkString("[", ",", "]")
    // outer block 2: digest words ∥ 0x80000000 ∥ zeros ∥ bit length 768
    val w16 = (0 until 8).map(hexWord).mkString(",") +
      ", 2147483648, 0, 0, 0, 0, 0, 0, 768"
    s"""${pre}_ih AS (
       |  SELECT $ks, sha256(${ipadExpr(secret)} || ($body)) AS inner_hex FROM $src),
       |${pre}_w AS (SELECT *, [$w16]::BIGINT[] AS w16 FROM ${pre}_ih),
       |${pre}_s AS (SELECT *, $wexp AS wl, $klLit::BIGINT[] AS kl FROM ${pre}_w),
       |${pre}_c AS (SELECT *, $rounds AS fs FROM ${pre}_s),
       |${pre}_out AS (SELECT $ks, $finalHex AS mac_hex FROM ${pre}_c)""".stripMargin
  }
}
