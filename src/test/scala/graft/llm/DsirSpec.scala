package graft.llm

import graft.SparkSpec

/** DSIR importance weighting, executed on a planted fixture: a train
  * doc sharing the target split's distinctive bigrams must out-score
  * a train doc with disjoint vocabulary, weights are exact integers
  * (count-ratio fixed point), and target docs never appear in the
  * output.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like train doc out-scores a disjoint one; target docs excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val targetish = "quantum flux capacitor resonance cascade"
    val docs = Seq(
      // target docs (id % 50 == 0) establishing the domain bigrams
      (0L, s"$targetish drives the $targetish", "en", "web", 0L),
      (50L, s"more $targetish text about $targetish", "en", "web", 0L),
      // train doc in-domain → high mean weight
      (1L, s"a study of $targetish behavior", "en", "web", 0L),
      // train doc out-of-domain → every bucket has ct=0
      (2L, "completely unrelated prose concerning gardening tips daily", "en", "web", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")

    val out = MiningQueries.queries("text_dsir_weights")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L), "exactly the train docs are scored")
    val (n1, w1, s1) = out(1L)
    val (n2, w2, s2) = out(2L)
    assert(n1 === 8L && n2 === 6L, "bigram occurrence counts")
    assert(s1 > s2, "in-domain doc must out-score the disjoint doc")
    // disjoint doc: every bucket has ct=0, cr=1 (each bigram unique
    // here) → weight = (0+1)*scale div (1+1) exactly
    assert(w2 === 6L * (MiningQueries.DsirScale / 2),
      "disjoint-doc weights are the exact smoothed floor")
    assert(w1 > 0L && s1 === w1.toDouble / n1.toDouble)

    // the selection half ranks the in-domain doc first within the source
    val sel = MiningQueries.queries("text_dsir_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sel.toSeq === Seq(("web", 1L, 1L), ("web", 2L, 2L)),
      "per-source ranking must follow dsir_score desc, doc_id")
  }
}
