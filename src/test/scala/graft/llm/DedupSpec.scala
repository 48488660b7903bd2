package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import TextOps._

/** Properties of the non-oracle-checkable dedup primitives: MinHash
  * signature behavior, LSH candidate recall on planted duplicates,
  * SimHash locality.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again"
  private val docB = "the quick brown fox jumps over the lazy dog again and again" // exact dup
  private val docC = "the quick brown fox leaps over the lazy dog again and again" // near dup
  private val docD = "completely different words about spark query engines at scale"

  private lazy val docs = Seq(
    (1L, docA), (2L, docB), (3L, docC), (4L, docD))
    .toDF("doc_id", "text")
    .withColumn("w", words(col("text")))
    .withColumn("sh", shingles(col("w"), 3))

  test("identical docs have identical minhash signatures") {
    val sigs = docs.withColumn("sig", minHashSignature(col("sh"), 32))
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("near-dup signatures agree on most components (jaccard estimate)") {
    val sigs = docs.withColumn("sig", minHashSignature(col("sh"), 32))
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree > 8, s"only $agree/32 components agree for a ~0.5-jaccard pair")
    val agreeFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agreeFar < agree)
  }

  test("LSH bands put identical docs in the same buckets") {
    val bands = docs
      .withColumn("sig", minHashSignature(col("sh"), 32))
      .select(col("doc_id"), explode(lshBands(col("sig"), 8, 4)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup must be an LSH candidate")
    assert(!pairs.contains((1L, 4L)), "unrelated docs must not collide in all bands")
  }

  test("exact jaccard: identical=1.0, disjoint=0.0") {
    val j = docs.as("x").join(docs.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        jaccard(col("x.sh"), col("y.sh")).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
    assert(j((1L, 3L)) > 0.3 && j((1L, 3L)) < 1.0)
  }

  test("simhash: identical equal; near-dup within small hamming radius") {
    val hs = docs.withColumn("h", simHash(col("w")))
      .select("doc_id", "h").as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L))
    val nearDist = java.lang.Long.bitCount(hs(1L) ^ hs(3L))
    val farDist = java.lang.Long.bitCount(hs(1L) ^ hs(4L))
    assert(nearDist < farDist,
      s"near-dup hamming $nearDist should be < unrelated $farDist")
  }

  test("vocab fingerprint is word-order insensitive") {
    val fp = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
        (3L, "alpha beta delta"))
      .toDF("id", "text")
      .select(col("id"), vocabFingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
