package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The phash carrying-capacity cliff and its remedy, executably —
  * the multimodal twin of SrpSaturationSpec (round 15): the 4 × 16-bit
  * band space holds PhashMaxBucket · 2¹⁶ ≈ 4.2M fingerprints per band;
  * past that every bucket is hot and the hot-bucket cap drops 100% of
  * candidate mass — linear cost, zero recall, no error. The remedy
  * cannot be plain wider bands (the hamming ≤ 3 completeness proof is
  * pigeonhole over 4 bands): [[Multimodal.phashPairsWide]] trades
  * width for probes — 2 × 32-bit bands, identity + 1-bit-flip
  * multi-probe — keeping the distance-3 guarantee while deepening the
  * band space to 2.7e11.
  *
  * Corpus: 200k fingerprints whose 16-bit bands are CONSTRAINED to
  * 1,000 distinct values each (occupancy ~200 ≫ cap 64: every narrow
  * bucket hot — the saturated regime at 1/20th the row count), plus
  * 50 planted identical twins. The same fingerprints' 32-bit bands
  * have ~10⁶ value combinations (occupancy ~0.2: nothing hot).
  */
class PhashSaturationSpec extends SparkSpec {

  private val N = 200000L
  private val Twins = 50L

  private def sigs: DataFrame = {
    // band b of doc i = pmod(xxhash64(i, b), 1000), packed into the
    // 64-bit fingerprint; twin 1e6+i reuses i's generator
    def phashExpr(id: String) = expr(
      s"CAST(${(0 until 4).map(b =>
        s"pmod(xxhash64($id, $b), 1000) * ${1L << (16 * b)}")
        .mkString(" + ")} AS BIGINT)")
    val base = spark.range(N)
      .select(col("id").as("doc_id"), phashExpr("id").as("phash"))
    val twins = spark.range(Twins)
      .select((col("id") + 1000000L).as("doc_id"),
        phashExpr("id").as("phash"))
    base.unionByName(twins).repartition(8)
  }

  test("16-bit bands saturate; the 2x32-bit multi-probe path recovers every planted twin inside its linear bound") {
    val s = sigs.cache()
    try {
      val twinPairs = (0L until Twins).map(i => (i, 1000000L + i)).toSet

      val narrow = Multimodal.phashPairs(s)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val foundNarrow = twinPairs.count(narrow.contains)
      assert(foundNarrow < Twins / 2,
        s"expected the saturated 4x16 path to lose most twins, " +
          s"found $foundNarrow")

      val wide = Multimodal.phashPairsWide(s)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val foundWide = twinPairs.count(wide.contains)
      assert(foundWide == Twins,
        s"wide multi-probe must recover every identical twin: " +
          s"$foundWide/$Twins")
      // 66·cap·n is the probe-join ceiling; the verified output is a
      // fortiori inside it
      val bound = (N + Twins) * 66 * Multimodal.PhashMaxBucket
      assert(wide.size <= bound,
        s"wide output ${wide.size} exceeds linear bound $bound")
    } finally s.unpersist()
  }

  test("identical-pile regime: BOTH pairwise variants drop to zero; the cluster form keeps every pile and its near links") {
    // The regime the ×1000 docs decade measured (1.14M sigs → 5,365
    // distinct fingerprints, ~213-image piles,
    // bench_anchors/r15_phash_exponents.json): when fingerprints
    // repeat in PILES, every bucket of ANY band split is hot and
    // pairwise banding — narrow or wide — correctly refuses the
    // Θ(pile²) output. The production answer is distinct-first
    // (phashClusters): groupBy the fingerprint, then band only the
    // distinct values. Corpus: 100 piles of 100 identical
    // fingerprints; piles 2k and 2k+1 differ in bit 0 only while
    // sharing their 16-bit band at index 1, so each cluster has at
    // least one hamming-1 neighbor findable through a non-hot
    // distinct-set bucket.
    val pileSize = 100
    val piles = 100
    val sigs = spark.range(pileSize.toLong * piles)
      .select(col("id").as("doc_id"),
        // pile p: phash = (p div 2)·2¹⁶ + (p mod 2) — pairs share
        // band 1, differ in bit 0; bands 2/3 are zero for everyone
        expr(s"CAST((id div ${2 * pileSize}) * 65536 " +
          s"+ (id div $pileSize) % 2 AS BIGINT)").as("phash"))
      .repartition(8)
    assert(Multimodal.phashPairs(sigs).count() == 0L,
      "4x16 pairs must drop the all-hot pile corpus")
    assert(Multimodal.phashPairsWide(sigs).count() == 0L,
      "wide pairs must drop the all-hot pile corpus")
    val cl = Multimodal.phashClusters(sigs).collect()
    assert(cl.length == piles, s"expected $piles clusters, ${cl.length}")
    assert(cl.forall(_.getLong(1) == pileSize),
      "every cluster must carry its full pile membership")
    assert(cl.forall(_.getLong(2) >= 1L),
      "every cluster must see its planted hamming-1 neighbor")
  }
}
