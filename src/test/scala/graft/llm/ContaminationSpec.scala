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

  test("past BroadcastFpBudget the eval join degrades to a shuffle join with identical rows") {
    val sf = "/root/testdata/sf0.001"
    def rows(budget: Long) =
      MiningQueries.contaminationOverlap(spark, sf, budget)
        .collect().map(_.toSeq).toSeq
    def plan(budget: Long) =
      MiningQueries.contaminationOverlap(spark, sf, budget)
        .queryExecution.executedPlan.toString()
    // the assertions key on the mh join specifically — the winnowing
    // pipeline legitimately broadcasts its tiny nk side either way
    val mhBroadcast = "BroadcastHashJoin \\[mh".r
    val mhShuffle = "(SortMergeJoin|ShuffledHashJoin) \\[mh".r
    // below budget: the eval fingerprint side ships broadcast
    val under = plan(MiningQueries.BroadcastFpBudget)
    assert(mhBroadcast.findFirstIn(under).isDefined,
      s"under-budget plan must broadcast the eval side of the mh join:\n$under")
    // budget 0: every eval k-gram count exceeds it → keyed shuffle join
    val degraded = plan(0L)
    assert(mhBroadcast.findFirstIn(degraded).isEmpty,
      s"budget-0 plan must not broadcast the mh join:\n$degraded")
    assert(mhShuffle.findFirstIn(degraded).isDefined,
      s"budget-0 plan must shuffle-join on the mh key:\n$degraded")
    // both ship strategies produce the identical flagged set
    assert(rows(0L) === rows(MiningQueries.BroadcastFpBudget))
  }
}
