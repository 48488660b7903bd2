package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The `graft.checkpointDir` switch in [[Lineage.LineageOps]]: every
  * iterative loop truncates lineage through `truncateLineage`, which
  * defaults to executor-local blocks (fast, but a lost executor
  * mid-iteration kills the query on a real cluster) and switches to
  * reliable `checkpoint()` when the conf names a fault-tolerant dir.
  * The spec runs two iterative queries — the peel-to-fixpoint k-core
  * and the path-halving connected components — through BOTH paths and
  * asserts bit-identical rows, then proves the reliable path actually
  * engaged (checkpoint files on disk; not a vacuous toggle).
  */
class ReliableCheckpointSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("reliable checkpoint() path: bit-identical rows, files written") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val s2 = spark.newSession()
    s2.conf.set("graft.checkpointDir", dir)
    for (q <- Seq("graph_kcore", "dedup_components")) {
      val base = SparkEntry.queries(q)(spark, Sf).collect()
        .map(_.toString).sorted.toSeq
      val rel = SparkEntry.queries(q)(s2, Sf).collect()
        .map(_.toString).sorted.toSeq
      assert(base.nonEmpty, s"$q: empty baseline")
      assert(base == rel, s"$q: reliable-checkpoint rows diverge")
    }
    // prove engagement: the shared SparkContext's checkpoint dir now
    // points under our temp dir and holds rdd checkpoint data
    val scDir = spark.sparkContext.getCheckpointDir
    assert(scDir.exists(_.contains(Paths.get(dir).getFileName.toString)),
      s"checkpoint dir not set under $dir (got $scDir)")
    val files = Files.walk(Paths.get(dir)).iterator().asScala
      .count(p => Files.isRegularFile(p))
    assert(files > 0, "reliable path wrote no checkpoint files — vacuous")
  }

  test("conf absent: truncateLineage stays executor-local (no sc dir needed)") {
    import graft.Lineage.LineageOps
    // a session WITHOUT the conf must not require a checkpoint dir and
    // must still truncate lineage (logical plan becomes a scan)
    val df = spark.range(100).toDF("id").truncateLineage()
    assert(df.count() == 100)
    assert(df.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
  }
}
