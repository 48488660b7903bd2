package graft.llm

import graft.SparkSpec

/** The winnowing contamination guarantee, executed: a train doc that
  * shares a run of ≥ WinK+WinW−1 words with an eval doc MUST be
  * flagged by text_contamination_overlap (at least one fingerprint in
  * any shared window is common to both), and disjoint-vocabulary docs
  * must not be.
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("planted verbatim run across the split is flagged; disjoint docs are not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    val shared = (1 to (MiningQueries.WinK + MiningQueries.WinW - 1))
      .map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      // eval doc (id % 50 == 0) carrying the shared run
      (100L, s"eval preamble $shared eval tail words here", "en", "web", 0L),
      // train doc carrying the same run → must be flagged
      (101L, s"train lead-in $shared completely different ending", "en", "web", 0L),
      // train doc with disjoint vocabulary → must not be flagged
      (102L, "totally unrelated content with its own vocabulary stream", "en", "web", 0L),
      // second eval doc, also disjoint
      (150L, "another eval document nothing in common at all", "en", "web", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")

    val out = MiningQueries.queries("text_contamination_overlap")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.contains(101L), "the doc sharing the verbatim run must be flagged")
    assert(out(101L)._1 >= 1L && out(101L)._2 === 1L)
    assert(!out.contains(102L), "disjoint-vocabulary doc must not be flagged")
    assert(out.keySet === Set(101L))
  }
}
