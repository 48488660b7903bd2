package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Forks [[FaultProbe]] as its own JVM and asserts every injection
  * scenario reported OK. A subprocess because the scenarios need
  * `local[4,2]` (task retries — the shared spec session is
  * maxFailures=1) and a task-killing listener that must never observe
  * another suite's jobs; see the probe's scaladoc for the four
  * scenarios (fail-once retry, mid-iteration task kill, the
  * no-executor-state invariant of the reliable path, and the
  * block-loss contrast where localCheckpoint dies and reliable
  * checkpoint survives).
  */
class FaultInjectionSpec extends AnyFunSuite {

  test("reliable-checkpoint fault probe: all scenarios OK", org.scalatest.tagobjects.Slow) {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    // inherit the parent test JVM's --add-opens (build.sbt's
    // jdk17AddOpens) instead of a hand-copied list that would drift
    // when a Spark/JDK upgrade adds a required open; sbt forks with
    // the two-token form ("--add-opens", "pkg=ALL-UNNAMED"), plain
    // java may use the one-token "--add-opens=pkg=..." form
    import scala.jdk.CollectionConverters._
    val args = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val addOpens = args.zipWithIndex.flatMap {
      case ("--add-opens", i) if i + 1 < args.size =>
        Seq("--add-opens", args(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Nil
    }
    assert(addOpens.nonEmpty,
      "no --add-opens inherited from the test JVM — fork would fail")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.FaultProbe")
    val out = new StringBuilder
    val rc = Process(cmd).!(
      ProcessLogger(l => out.synchronized { out.append(l).append('\n') },
        _ => ()))
    val text = out.toString
    val probeLines = text.linesIterator.filter(_.startsWith("PROBE")).toSeq
    assert(rc == 0, s"probe JVM exited $rc:\n${probeLines.mkString("\n")}")
    for (scenario <- Seq("fail_once_retry", "task_kill_reschedule",
        "reliable_no_executor_state", "block_loss_contrast"))
      assert(probeLines.exists(l => l.contains(scenario) && l.contains("OK")),
        s"scenario $scenario not OK:\n${probeLines.mkString("\n")}")
    assert(probeLines.exists(_.contains("ALL_OK")))
  }
}
