package graft.route

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Forks [[graft.SkewProbe]] as its own JVM and asserts every skew
  * scenario reported OK (the FaultInjectionSpec pattern). A subprocess
  * because the probe needs `local[8]` — AQE's skew split can only cut
  * a hot partition at MAPPER boundaries, so under the shared 2-core
  * spec session any straggler is uncut at 2 chunks and the bound the
  * probe asserts is unreachable — plus a task-metrics listener that
  * must never observe another suite's stages. See the probe's
  * scaladoc for the scenarios (straggler contrast, the three route
  * queries under AQE skew split with output-digest parity, and the
  * default-threshold control).
  */
class SkewSpec extends AnyFunSuite {

  test("skew probe (route + text + graph families): stragglers proven, the per-family mechanism bounds them, outputs identical", org.scalatest.tagobjects.Slow) {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val addOpens = jvmArgs.zipWithIndex.flatMap {
      case ("--add-opens", i) if i + 1 < jvmArgs.size =>
        Seq("--add-opens", jvmArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Nil
    }
    assert(addOpens.nonEmpty,
      "no --add-opens inherited from the test JVM — fork would fail")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.SkewProbe")
    val out = new StringBuilder
    val rc = Process(cmd).!(
      ProcessLogger(l => out.synchronized { out.append(l).append('\n') },
        _ => ()))
    val text = out.toString
    val lines = text.linesIterator.filter(_.startsWith("SKEW")).toSeq
    assert(rc == 0, s"probe JVM exited $rc:\n${lines.mkString("\n")}")
    for (scenario <- Seq("straggler_exists", "route_client_fanout",
        "route_delivery_gate", "route_enriched_deliveries",
        "default_thresholds_quiet", "text_token_groupby",
        "graph_pagerank_top", "graph_pagerank_top_default_thresholds_quiet"))
      assert(lines.exists(l => l.contains(scenario) && l.contains("OK")),
        s"scenario $scenario not OK:\n${lines.mkString("\n")}")
    lines.foreach(l => info(l))
  }
}
