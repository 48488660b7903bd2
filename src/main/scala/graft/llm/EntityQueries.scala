package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy self-join of the customer name registry —
  * the metadata-dedup step a training-data pipeline runs on author /
  * domain / record identifiers that differ by typos.
  *
  * Scale design (why this is not an all-pairs scan): candidates come
  * from PIGEONHOLE SEGMENT BLOCKING (the partition scheme of
  * HmSearch-style hamming joins, Zhang et al., SIGMOD'13 — public
  * algorithm): the 9-digit suffix splits into [[NumSegs]] = MaxHamming
  * + 1 equal segments, and hamming ≤ [[MaxHamming]] leaves at least
  * one segment UNTOUCHED by pigeonhole, so every qualifying pair
  * meets in the block keyed by (prefix, segment-index, exact segment
  * value). COMPLETE by construction over the suite's predicate —
  * equal prefix + suffix hamming ≤ 2 (FuzzyNameSpec proves equality
  * to the brute-force join on real data and random registries). Cost
  * is O(n·3) emitted keys — the prefix rides INSIDE the block key, so
  * cross-prefix candidates never shuffle at all (the earlier
  * two-wildcard-mask design emitted 36 keys/record and filtered
  * prefixes post-join) — and the verify step — 9 integer digit
  * compares on a precomputed LONG, no string allocation, no HOF, no
  * UDF — runs on block-local candidates only.
  */
object EntityQueries extends QuerySuite {

  /** Name layout: 9-char registry prefix + 9-DIGIT id. The match
    * predicate — shared by the oracle and FuzzyNameSpec — is: both
    * suffixes all-digits, equal prefix, suffix hamming ≤
    * [[MaxHamming]]. Non-digit suffixes are out of the id-resolution
    * domain in all three places, so the LONG fast path in the verify
    * step is a representation choice, not a semantic narrowing. */
  val PrefixLen = 9
  val SuffixLen = 9
  val NameLen = PrefixLen + SuffixLen
  val MaxHamming = 2

  /** MaxHamming + 1 segments: ≤ MaxHamming differing positions cannot
    * touch every segment, so one segment always matches exactly. */
  val NumSegs = MaxHamming + 1
  private val SegLen = SuffixLen / NumSegs

  /** Digit-wise hamming distance between two 9-digit ids held as
    * LONGs: 9 integer div/mod compares, pure codegen arithmetic — no
    * per-character string allocation on the (candidate-pair-sized)
    * verify path. */
  private def digitHamming(a: Column, b: Column): Column =
    (0 until SuffixLen).map { i =>
      val p = math.pow(10, i).toLong
      when((a.divide(p).cast("long") % 10) =!= (b.divide(p).cast("long") % 10),
        1).otherwise(0)
    }.reduce(_ + _)

  /** The [[NumSegs]] pigeonhole block keys: fixed-width concat of
    * prefix (9 ch) + segment index (1 ch) + exact segment value
    * (3 ch), so distinct (prefix, index, value) triples can never
    * collide as strings. */
  private def segKeys(pfx: Column, sfx: Column): Column =
    array((0 until NumSegs).map(i =>
      concat(pfx, lit(i.toString),
        substring(sfx, i * SegLen + 1, SegLen))): _*)

  /** Blocked candidate pairs (k1 < k2), hamming-verified. */
  private[llm] def nearPairs(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("k"), col("c_name").as("name"))
      .filter(length(col("name")) === NameLen)
      .withColumn("pfx", substring(col("name"), 1, PrefixLen))
      .withColumn("sfx", substring(col("name"), PrefixLen + 1, SuffixLen))
      // the all-digits domain gate (same regex as the oracle — a
      // signed or padded string that cast() would accept is NOT a
      // registry id), then the id as a LONG computed ONCE per record:
      // the verify step downstream touches only integers, never strings
      .filter(col("sfx").rlike("^[0-9]+$"))
      .withColumn("sn", col("sfx").cast("long"))
    val keyed = c.select(col("k"), col("sn"),
      explode(segKeys(col("pfx"), col("sfx"))).as("bkey"))
    val a = keyed.select(col("bkey"), col("k").as("k1"), col("sn").as("sn1"))
    val b = keyed.select(col("bkey"), col("k").as("k2"), col("sn").as("sn2"))
    // prefix equality is enforced BY the block key (it is the key's
    // first 9 chars), so the join carries only (key, id-long) pairs;
    // verify runs BEFORE dedup, streaming straight out of the join —
    // the only shuffled dedup state is the surviving bare (k1, k2)
    a.join(b, Seq("bkey"))
      .filter(col("k1") < col("k2") &&
        digitHamming(col("sn1"), col("sn2")) <= MaxHamming)
      .select("k1", "k2").distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-entity near-duplicate census: how many registry names sit
    // within hamming ≤ 2 of each, and the smallest such neighbor key
    // (the canonical-survivor pointer exact dedup uses). Symmetric:
    // each verified pair counts for both sides.
    "dedup_fuzzy_names" -> ((s, d) =>
      // both directions exploded from ONE pass over the verified
      // pairs — a union of two selects would execute the whole
      // blocked join twice
      nearPairs(s, d)
        .select(explode(array(
          struct(col("k1").as("k"), col("k2").as("nbr")),
          struct(col("k2").as("k"), col("k1").as("nbr")))).as("e"))
        .groupBy(col("e.k").as("c_custkey"))
        .agg(count(lit(1)).as("n_near"), min(col("e.nbr")).as("min_nbr"))
        .orderBy("c_custkey")))

  def oracles: Map[String, String] = Map(
    // the oracle is the honest brute force — DuckDB pays the all-pairs
    // cost the blocked plan exists to avoid
    "dedup_fuzzy_names" ->
      s"""WITH pairs AS (
         |  SELECT a.c_custkey AS k, b.c_custkey AS nbr
         |  FROM customer a JOIN customer b
         |    ON a.c_custkey <> b.c_custkey
         |   AND len(a.c_name) = $NameLen AND len(b.c_name) = $NameLen
         |   AND regexp_matches(substr(a.c_name, ${PrefixLen + 1}, $SuffixLen),
         |         '^[0-9]+$$')
         |   AND regexp_matches(substr(b.c_name, ${PrefixLen + 1}, $SuffixLen),
         |         '^[0-9]+$$')
         |   AND substr(a.c_name, 1, $PrefixLen) = substr(b.c_name, 1, $PrefixLen)
         |   AND mismatches(substr(a.c_name, ${PrefixLen + 1}, $SuffixLen),
         |                  substr(b.c_name, ${PrefixLen + 1}, $SuffixLen))
         |       <= $MaxHamming)
         |SELECT k AS c_custkey, count(*) AS n_near, min(nbr) AS min_nbr
         |FROM pairs GROUP BY k ORDER BY c_custkey""".stripMargin)
}
