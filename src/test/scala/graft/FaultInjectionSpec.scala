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

  test("reliable-checkpoint fault probe: all scenarios OK") {
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
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
