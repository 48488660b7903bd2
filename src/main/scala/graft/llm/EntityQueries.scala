package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy self-join of the customer name registry —
  * the metadata-dedup step a training-data pipeline runs on author /
  * domain / record identifiers that differ by typos.
  *
  * Scale design (why this is not an all-pairs scan): candidates come
  * from SymSpell-style NEIGHBORHOOD BLOCKING — each record emits its
  * C(9,2)=36 two-wildcard masks of the 9-char discriminative suffix,
  * and only records sharing a mask meet. For hamming distance ≤ 2 the
  * differing positions D (|D| ≤ 2) are covered by every wildcard pair
  * ⊇ D, so the block join is COMPLETE by construction over the
  * suite's predicate — equal prefix + suffix hamming ≤ 2
  * (FuzzyNameSpec proves equality to the brute-force join on real
  * data). Cost is O(n·36) emitted keys and block-local pairing; a
  * constant mask position yields an agree-everywhere block (exact
  * duplicates only), never an all-pairs bomb, and verification is
  * free: blocks are staged by EXACT distance (equi-join / 1-wildcard /
  * 2-wildcard with the masked digits carried on the block key), so
  * block-mates need at most two integer compares and each matching
  * pair is emitted exactly once — no candidate-sized DISTINCT.
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

  // (The digit-wise hamming re-check that once lived here was deleted
  // as a per-pair tautology — see the block-mate comment in nearPairs;
  // FuzzyNameSpec pins the brute-force predicate, hamming included.)

  /** The 9 single-wildcard masks of the suffix, encoded as LONG block
    * keys: for wildcard digit position i (a power of ten), the key is
    * i*10^9 + the id with digit i zeroed. Encoding the mask
    * arithmetically instead of as a 9-char template string keeps the
    * per-row block-key emission pure codegen integer math (no string
    * allocation) and shuffles 8-byte keys instead of 9-char strings. */
  private def masks1(sn: Column): Column =
    array((0 until SuffixLen).map { i =>
      (sn - (sn.divide(math.pow(10, i).toLong).cast("long") % 10) *
        math.pow(10, i).toLong) + lit(i * 1000000000L)
    }: _*)

  /** The 36 two-wildcard masks of the suffix, bare LONG block keys
    * (tag (i*9+j)*10^9 + the id with digits i and j zeroed) — the
    * narrow spelling for consumers whose candidate volume is small
    * enough that a per-candidate hamming walk is cheaper than
    * carrying wildcard digits through the explode (the top-k twin's
    * stage 2, where earlier stages have already satisfied almost
    * every key: A/B showed the wide struct emission costing more
    * than the 18 div/mods it saved there). */
  private def masksBare(sn: Column): Column = {
    def digit(i: Int): Column =
      (sn.divide(math.pow(10, i).toLong).cast("long") % 10) *
        math.pow(10, i).toLong
    array((for { i <- 0 until SuffixLen; j <- i + 1 until SuffixLen } yield
      (sn - digit(i) - digit(j)) + lit((i * SuffixLen + j) * 1000000000L)): _*)
  }

  /** The 36 two-wildcard masks of the suffix — same LONG block-key
    * encoding, tag (i*9+j)*10^9 — each CARRYING the two digits the
    * mask zeroed (di, dj). Block-mates agree on every non-wildcard
    * digit, so the pair's hamming distance is exactly the number of
    * differing carried digits: the exact-distance filters downstream
    * are two integer compares computed once per EMISSION (36·n rows),
    * never a 9-digit div/mod walk per CANDIDATE (the block-mate
    * volume, ~40× larger on a dense sequential registry). */
  private def masks2(sn: Column): Column = {
    def dig(i: Int): Column =
      sn.divide(math.pow(10, i).toLong).cast("long") % 10
    array((for { i <- 0 until SuffixLen; j <- i + 1 until SuffixLen } yield
      struct(
        ((sn - dig(i) * math.pow(10, i).toLong
          - dig(j) * math.pow(10, j).toLong)
          + lit((i * SuffixLen + j) * 1000000000L)).as("bkey"),
        dig(i).as("di"), dig(j).as("dj"))): _*)
  }

  /** The domain-gated registry: (k, pfx, sn) — name length, equal
    * prefix handling, and the all-digits suffix gate shared by the
    * census and the top-k twin so they can never drift apart. */
  private def registry(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
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
      .select("k", "pfx", "sn")

  /** Blocked candidate pairs (k1 < k2), hamming-verified — spelled as
    * EXACT-DISTANCE STAGES so every matching pair streams out of its
    * join exactly once and the pair-census-sized DISTINCT exchange the
    * old single 36-mask join needed (23.6M candidate rows at sf0.1,
    * the query's heaviest shuffle in the round-15 spill probe) does
    * not exist anywhere (guide §2.3/§2.4 — aggregate-before-shuffle
    * instead of dedup-after-shuffle):
    *
    *   dist 0 — plain (pfx, sn) equi-join: identical ids meet once;
    *   dist 1 — 9 single-wildcard blocks, sn1 ≠ sn2: block-mates agree
    *            on the 8 non-wildcard digits, so ≠ means exactly
    *            dist 1, and the pair appears only in the block naming
    *            its one differing digit;
    *   dist 2 — 36 two-wildcard blocks, both carried wildcard digits
    *            differing: exactly dist 2, only in the block naming
    *            its two differing positions.
    *
    * Union of the stages = every hamming ≤ 2 pair exactly once
    * (FuzzyNameSpec pins equality to the brute-force predicate on
    * real, clone-degenerate, and random registries). Joins key on
    * (pfx, bkey) so cross-prefix block-mates never materialize. */
  private[llm] def nearPairs(s: SparkSession, d: String): DataFrame = {
    val base = registry(s, d)
    val c0 = base.select(col("pfx"), col("sn"), col("k").as("k1"))
      .join(base.select(col("pfx"), col("sn"), col("k").as("k2")),
        Seq("pfx", "sn"))
      .filter(col("k1") < col("k2"))
      .select("k1", "k2")
    val a1 = base.select(col("pfx"), col("k").as("k1"),
      col("sn").as("sn1"), explode(masks1(col("sn"))).as("bkey"))
    val b1 = base.select(col("pfx"), col("k").as("k2"),
      col("sn").as("sn2"), explode(masks1(col("sn"))).as("bkey"))
    val c1 = a1.join(b1, Seq("pfx", "bkey"))
      .filter(col("k1") < col("k2") && col("sn1") =!= col("sn2"))
      .select("k1", "k2")
    val a2 = base.select(col("pfx"), col("k").as("k1"),
        explode(masks2(col("sn"))).as("m"))
      .select(col("pfx"), col("k1"), col("m.bkey").as("bkey"),
        col("m.di").as("di1"), col("m.dj").as("dj1"))
    val b2 = base.select(col("pfx"), col("k").as("k2"),
        explode(masks2(col("sn"))).as("m"))
      .select(col("pfx"), col("k2"), col("m.bkey").as("bkey"),
        col("m.di").as("di2"), col("m.dj").as("dj2"))
    val c2 = a2.join(b2, Seq("pfx", "bkey"))
      .filter(col("k1") < col("k2") &&
        col("di1") =!= col("di2") && col("dj1") =!= col("dj2"))
      .select("k1", "k2")
    c0.unionByName(c1).unionByName(c2)
  }

  /** How many best matches per name the bounded twin keeps. */
  val TopK = 3

  /** Digit-wise hamming distance between two 9-digit ids held as
    * LONGs — 9 integer digit compares, codegen arithmetic only. Used
    * by the top-k twin's stage 2, where candidates are few (see the
    * masksBare note); the census's high-volume path carries the
    * wildcard digits on the mask instead. */
  private def digitHamming(x: Column, y: Column): Column = {
    def dig(c: Column, i: Int): Column =
      (c.divide(math.pow(10, i).toLong).cast("long") % 10)
    (0 until SuffixLen)
      .map(i => when(dig(x, i) =!= dig(y, i), 1L).otherwise(0L))
      .reduce(_ + _)
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
        .orderBy("c_custkey")),

    // The BOUNDED production twin (round-13 verdict task): the k best
    // matches per name by (hamming, neighbor key) — EXACT, same
    // brute-force oracle predicate as the census, but spelled as
    // STAGED ESCALATION so the scale shape is linear where the census
    // is output-bound quadratic:
    //
    //   stage 0 — dist-0 matches from a plain (pfx, sn) equi-join;
    //   stage 1 — dist-1 matches from single-wildcard blocks, only
    //             for keys stage 0 left short of k;
    //   stage 2 — dist-2 matches from the census's two-wildcard
    //             blocks, only for keys still short after stage 1.
    //
    // Exactness: every dist-0 match beats every dist-1 beats every
    // dist-2 under the (dist, nbr) order, so a key with ≥ k matches
    // at earlier stages never needs a later stage. Each stage is
    // DUPLICATE-FREE by construction — a pair at exactly distance d
    // shares exactly one d-wildcard block (the block naming its
    // differing positions), and the within-block distance filter
    // (sn1 ≠ sn2 for stage 1, hamming = 2 for stage 2) drops the
    // closer pairs that would repeat across blocks — so no
    // match-census-sized DISTINCT shuffle exists anywhere. On a
    // clone-heavy registry stage 0 saturates everything and the later
    // block joins see an ~empty probe side; on a dense sequential
    // registry stage 1 does; either way candidate volume stays
    // ~linear while the census's output is inherently ~quadratic.
    // Output ≤ n·k via the two-phase TopKPerKey operator (map-side
    // partial caps each (partition, key) at k before the exchange).
    "dedup_fuzzy_names_topk" -> ((s, d) => {
      val base = registry(s, d)
      def pairCols(dist: Int)(df: DataFrame): DataFrame =
        df.select(col("k1").as("c_custkey"), col("k2").as("nbr"),
          lit(dist.toLong).as("dist"))

      // stage 0: exact-id twins — one linear equi-join, no blocks
      val c0 = base.select(col("pfx"), col("sn"), col("k").as("k1"))
        .join(base.select(col("pfx"), col("sn"), col("k").as("k2")),
          Seq("pfx", "sn"))
        .filter(col("k1") =!= col("k2"))
      val sat0 = c0.groupBy(col("k1").as("k"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= TopK)
        .select("k")

      // stage 1: keys short after stage 0 probe the 9 single-wildcard
      // blocks; sn1 ≠ sn2 keeps exactly-dist-1 (block-mates agree
      // everywhere else), which also de-duplicates: a dist-0 pair
      // shares all 9 blocks, a dist-1 pair exactly one
      val need1 = base.join(sat0, Seq("k"), "left_anti")
      val a1 = need1.select(col("pfx"), col("k").as("k1"),
        col("sn").as("sn1"), explode(masks1(col("sn"))).as("bkey"))
      val b1 = base.select(col("pfx"), col("k").as("k2"),
        col("sn").as("sn2"), explode(masks1(col("sn"))).as("bkey"))
      val c1 = a1.join(b1, Seq("pfx", "bkey"))
        .filter(col("k1") =!= col("k2") && col("sn1") =!= col("sn2"))

      // stage 2: keys still short probe the census's 36 two-wildcard
      // blocks; hamming = 2 keeps exactly-dist-2 (a dist-2 pair
      // shares exactly the block naming its two differing digits).
      // Bare mask keys + per-candidate hamming here, NOT the census's
      // digit-carrying masks2: stage 2's probe side is the handful of
      // keys stages 0-1 left short, so candidates are few and the
      // wide struct emission on the full build side costs more than
      // the hamming walk it saves (measured, r15 optimization round)
      val n01 = pairCols(0)(c0).select("c_custkey")
        .unionAll(pairCols(1)(c1).select("c_custkey"))
        .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= TopK).select("k")
      val need2 = base.join(n01, Seq("k"), "left_anti")
      val a2 = need2.select(col("pfx"), col("k").as("k1"),
        col("sn").as("sn1"), explode(masksBare(col("sn"))).as("bkey"))
      val b2 = base.select(col("pfx"), col("k").as("k2"),
        col("sn").as("sn2"), explode(masksBare(col("sn"))).as("bkey"))
      val c2 = a2.join(b2, Seq("pfx", "bkey"))
        .filter(col("k1") =!= col("k2") &&
          digitHamming(col("sn1"), col("sn2")) === 2L)

      val edges = pairCols(0)(c0)
        .unionAll(pairCols(1)(c1)).unionAll(pairCols(2)(c2))
      // (dist, nbr) is a TOTAL order per key (nbr unique), so ranks
      // are deterministic and the window row_number twin is exactly
      // equal — FuzzyNameSpec pins that executably
      graft.plans.TopKPerKey(edges, Seq("c_custkey"),
          Seq(col("dist").asc, col("nbr").asc), TopK, "rk")
        .orderBy("c_custkey", "rk")
    }))

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
         |FROM pairs GROUP BY k ORDER BY c_custkey""".stripMargin,

    // same brute force, ranked: row_number over the total (dist, nbr)
    // order replays TopKPerKey's rank contract exactly
    "dedup_fuzzy_names_topk" ->
      s"""WITH pairs AS (
         |  SELECT a.c_custkey AS k, b.c_custkey AS nbr,
         |    mismatches(substr(a.c_name, ${PrefixLen + 1}, $SuffixLen),
         |               substr(b.c_name, ${PrefixLen + 1}, $SuffixLen))
         |      AS dist
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
         |       <= $MaxHamming),
         |ranked AS (
         |  SELECT k, nbr, dist,
         |    row_number() OVER (PARTITION BY k ORDER BY dist, nbr) AS rk
         |  FROM pairs)
         |SELECT k AS c_custkey, nbr, CAST(dist AS BIGINT) AS dist,
         |  CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $TopK
         |ORDER BY c_custkey, rk""".stripMargin)
}
