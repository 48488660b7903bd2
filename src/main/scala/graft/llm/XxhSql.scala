package graft.llm

/** DuckDB replay of Spark's `xxhash64` (XXH64, seed 42) as generated
  * SQL — the piece that converts the MinHash/LSH family from
  * rows-only to fully hash-checked: signatures, band hashes and the
  * estimator are all integer arithmetic over shingle strings ONCE the
  * oracle can compute the same 64-bit string hash Spark does.
  *
  * XXH64 needs wrapping uint64 arithmetic; DuckDB BIGINT checks
  * overflow instead of wrapping, so every value is carried as a
  * HUGEINT in [0, 2^64) and each op re-normalizes mod 2^64:
  *   - add: plain `+` then `% 2^64` (sum < 2^65 fits HUGEINT);
  *   - multiply (always by a compile-time prime): 32×32 schoolbook
  *     split — lo·lo + ((lo·hi + hi·lo) mod 2^32)·2^32, every
  *     intermediate < 2^97;
  *   - rotl r: (x·2^r mod 2^64) + x div 2^(64−r) (disjoint bits);
  *   - xor: DuckDB's `xor` operates on HUGEINT directly.
  * The 32-byte stripe loop and byte tails fold via `list_reduce`
  * (first-element-init convention) over per-row byte lists built with
  * `unicode(s[i:i])` — valid because the documents fixture is pure
  * ASCII, where codepoint = UTF-8 byte (the Spark side hashes UTF-8
  * bytes; a non-ASCII corpus would need a byte-level decode here).
  * Chained merge/avalanche steps are staged as CTE columns so no
  * expression re-expands exponentially.
  *
  * Validated (prototype) against Spark's own `xxhash64` output on 28
  * vectors covering every stripe/tail length class, and end-to-end by
  * the driver's hash gate on the three MinHash queries.
  */
object XxhSql {
  private val H = "18446744073709551616" // 2^64
  private val P1 = java.lang.Long.parseUnsignedLong("11400714785074694791")
  private val P2 = java.lang.Long.parseUnsignedLong("14029467366897019727")
  private val P3 = 1609587929392839161L
  private val P4 = java.lang.Long.parseUnsignedLong("9650029242287828579")
  private val P5 = 2870177450012600261L
  private val Seed = 42L

  /** Unsigned decimal rendering of a wrapped long. */
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  private def wadd(a: String, b: String) = s"(($a) + ($b)) % $H"

  /** a · const mod 2^64 via 32-bit split (const is a compile-time
    * prime, so its halves are literals). */
  private def wmulc(a: String, c: Long): String = {
    val lo = c & 0xffffffffL
    val hi = c >>> 32
    s"((($a) % 4294967296) * $lo + (((($a) % 4294967296) * $hi + " +
      s"(($a) // 4294967296) * $lo) % 4294967296) * 4294967296) % $H"
  }

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${u(1L << r)}) % $H + ($x) // ${u(1L << (64 - r))})"

  private def xor64(a: String, b: String) =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** round(acc, input) = rotl(acc + input·P2, 31) · P1 */
  private def rnd(acc: String, inp: String): String =
    wmulc(rotl(wadd(acc, wmulc(inp, P2)), 31), P1)

  private def rnd0(v: String): String = wmulc(rotl(wmulc(v, P2), 31), P1)

  /** Little-endian u64/u32 read from byte list `bl` at 1-based pos. */
  private def le64(p: String): String =
    (0 until 8).map(j => s"(bl)[($p)+$j] * ${u(1L << (8 * j))}").mkString("(", " + ", ")")
  private def le32(p: String): String =
    (0 until 4).map(j => s"(bl)[($p)+$j] * ${1L << (8 * j)}").mkString("(", " + ", ")")

  /** CTE chain from `src` (columns `keys` + string column `s`) to
    * `<pre>_out` (columns `keys` + `hv` = signed-BIGINT xxhash64).
    * Emits only CTE bodies — embed inside a `WITH`. */
  def ctes(src: String, keys: Seq[String], s: String, pre: String): String = {
    val ks = keys.mkString(", ")
    def accInit(k: Int): String = u(k match {
      case 1 => Seed + P1 + P2
      case 2 => Seed + P2
      case 3 => Seed
      case 4 => Seed - P1
    })
    val lanes = (1 to 4).map(k =>
      s"'v$k': ${le64(s"st*32+${8 * (k - 1)}+1")}::HUGEINT").mkString(", ")
    val fold = (1 to 4).map(k =>
      s"'v$k': ${rnd(s"a.v$k", s"x.v$k")}").mkString(", ")
    val initStruct = (1 to 4).map(k =>
      s"'v$k': ${accInit(k)}::HUGEINT").mkString(", ")
    val h0 = wadd(wadd(wadd(rotl("acc.v1", 1), rotl("acc.v2", 7)),
      rotl("acc.v3", 12)), rotl("acc.v4", 18))
    val merges = (1 to 4).map { k =>
      val srcCte = if (k == 1) s"${pre}_h0" else s"${pre}_m${k - 1}"
      s"""${pre}_m$k AS (SELECT *, ${wadd(wmulc(xor64(s"h${k - 1}", rnd0(s"acc.v$k")), P1), u(P4))} AS h$k FROM $srcCte)"""
    }.mkString(",\n")
    val step8 = wadd(wmulc(rotl(xor64("a", rnd0("b")), 27), P1), u(P4))
    val step4 = wadd(wmulc(rotl(xor64("t8h", wmulc(le32("i4+1"), P1)), 23), P2), u(P3))
    val stepB = wmulc(rotl(xor64("a", wmulc("b", P5)), 11), P1)
    val fin = xor64("a4", s"a4 // ${u(1L << 32)}")
    s"""${pre}_b AS (
       |  SELECT $ks, $s AS s, length($s) AS n,
       |    list_transform(range(1, length($s)+1),
       |      i -> unicode(($s)[i:i])::HUGEINT) AS bl
       |  FROM $src),
       |${pre}_acc AS (
       |  SELECT *, CASE WHEN n >= 32 THEN
       |    list_reduce(list_concat(
       |      [{$initStruct}],
       |      list_transform(range(0, n//32), st -> {$lanes})),
       |      (a, x) -> {$fold})
       |    ELSE NULL END AS acc
       |  FROM ${pre}_b),
       |${pre}_h0 AS (SELECT *, CASE WHEN n >= 32 THEN $h0 ELSE ${u(Seed + P5)}::HUGEINT END AS h0 FROM ${pre}_acc),
       |$merges,
       |${pre}_t0 AS (
       |  SELECT *, ((CASE WHEN n >= 32 THEN h4 ELSE h0 END) + n) % $H AS th,
       |    (n//32)*32 AS i0
       |  FROM ${pre}_m4),
       |${pre}_t8 AS (
       |  SELECT *, list_reduce(list_concat([th],
       |      list_transform(range(0, (n - i0) // 8), c -> ${le64("i0 + c*8 + 1")}::HUGEINT)),
       |    (a, b) -> $step8) AS t8h,
       |    i0 + ((n - i0) // 8) * 8 AS i4
       |  FROM ${pre}_t0),
       |${pre}_t4 AS (
       |  SELECT *, CASE WHEN n - i4 >= 4 THEN $step4 ELSE t8h END AS t4h,
       |    i4 + CASE WHEN n - i4 >= 4 THEN 4 ELSE 0 END AS i5
       |  FROM ${pre}_t8),
       |${pre}_tb AS (
       |  SELECT *, list_reduce(list_concat([t4h], list_slice(bl, i5+1, n)),
       |    (a, b) -> $stepB) AS tbh
       |  FROM ${pre}_t4),
       |${pre}_a1 AS (SELECT *, ${xor64("tbh", s"tbh // ${u(1L << 33)}")} AS a1 FROM ${pre}_tb),
       |${pre}_a2 AS (SELECT *, ${wmulc("a1", P2)} AS a2 FROM ${pre}_a1),
       |${pre}_a3 AS (SELECT *, ${xor64("a2", s"a2 // ${u(1L << 29)}")} AS a3 FROM ${pre}_a2),
       |${pre}_a4 AS (SELECT *, ${wmulc("a3", P3)} AS a4 FROM ${pre}_a3),
       |${pre}_out AS (
       |  SELECT $ks,
       |    CAST(($fin) - CASE WHEN ($fin) >= 9223372036854775808 THEN $H ELSE 0 END AS BIGINT) AS hv
       |  FROM ${pre}_a4)""".stripMargin
  }
}
