package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SRP saturation cliff and its remedy, executably (round 14):
  * the ×100 amplification decade showed the driver surface's (8, 8)
  * band split returning EMPTY at 200k vectors — every bucket of the
  * fixed 8 × 2⁸ band space goes hot, and the hot-bucket cap (which
  * keeps volume linear) drops 100% of candidate mass.
  * `dedup_srp_bucket_stats` makes that visible; THIS spec proves the
  * remedy the census points at: at the same corpus size, widening
  * the bands (rBits ≳ log2(n / cap)) restores recall while staying
  * inside the linear candidate bound.
  *
  * Corpus: 100k deterministic pseudo-random vectors + 50 planted
  * identical twins (a twin shares every band with its original, so
  * it is findable iff its buckets aren't capped away).
  */
class SrpSaturationSpec extends SparkSpec {

  private val N = 100000L
  private val Twins = 50L
  private val Dim = 16

  private def corpus: DataFrame = {
    graft.plans.FloatVectorDot.register(spark)
    val emb = (idCol: String) =>
      s"transform(sequence(0, ${Dim - 1}), " +
        s"j -> CAST(pmod(xxhash64($idCol, j), 200) - 100 AS FLOAT))"
    val base = spark.range(N).selectExpr(
      "id AS vec_id", s"${emb("id")} AS embedding")
    // twin i (vec_id 1e6+i) reuses id i's generator — identical vector
    val twins = spark.range(Twins).selectExpr(
      "id + 1000000 AS vec_id", s"${emb("id")} AS embedding")
    base.unionByName(twins)
      .withColumn("nrm", Vectors.normNative(col("embedding")))
      .filter(col("nrm") > 0.0)
      .repartition(8)
  }

  test("8-bit bands saturate at 100k vectors; 16-bit bands recover the planted twins inside the linear bound") {
    val e = corpus.cache()
    try {
      val twinPairs = (0L until Twins).map(i => (i, 1000000L + i)).toSet

      // the driver surface's split: 2^8 values per band, capacity
      // cap·2^8 ≈ 16k ≪ 100k — occupancy ~390 per bucket, only the
      // exponentially-rare tail band values stay under the cap
      val c8 = DedupQueries.srpCandidatesWith(e, Dim,
          bands = DedupQueries.SrpBands, rBits = DedupQueries.SrpR,
          cap = DedupQueries.SrpMaxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val found8 = twinPairs.count(c8.contains)
      assert(found8 < Twins / 2,
        s"expected saturation to lose most twins at 8 bits, found $found8")

      // the remedy: same 64-plane budget split 4 × 16 bits — 2^16
      // values per band, occupancy ~0.5, nothing hot
      val c16 = DedupQueries.srpCandidatesWith(e, Dim,
        bands = 4, rBits = 16, cap = DedupQueries.SrpMaxBucket)
      val cand16 = c16.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val found16 = twinPairs.count(cand16.contains)
      assert(found16 == Twins,
        s"wide bands must recover every identical twin: $found16/$Twins")
      // and the volume stays inside the linear candidate bound
      val bound = (N + Twins) * 4 * DedupQueries.SrpMaxBucket
      assert(cand16.size <= bound,
        s"wide-band candidates ${cand16.size} exceed linear bound $bound")
    } finally e.unpersist()
  }
}
