package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Forks [[graft.SpillProbe]] as a 2 GB-heap JVM with
  * `spark.memory.fraction = 0.05` (a SparkConf-time setting — no
  * per-session override exists, hence the fork; the SkewSpec
  * pattern) and asserts, per probed query:
  *
  *   - the run COMPLETED under ~87 MB of unified memory (graceful
  *     spill, not an executor OOM),
  *   - it actually SPILLED (task-metric memory+disk spill > 0 — a
  *     run that fit would prove nothing),
  *   - its order-free content digest matches the same query computed
  *     here on the normal-memory shared session: memory pressure
  *     changed the execution strategy, never the answer.
  */
class SpillSpec extends SparkSpec {

  test("heaviest shuffles complete under a starved heap by spilling, digests identical to the unconstrained run", org.scalatest.tagobjects.Slow) {
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
    val sfDir = "/root/testdata/sf0.1"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.SpillProbe", sfDir)
    val out = new StringBuilder
    val rc = Process(cmd).!(
      ProcessLogger(l => out.synchronized { out.append(l).append('\n') },
        _ => ()))
    val lines = out.toString.linesIterator
      .filter(_.startsWith("SPILL")).toSeq
    assert(rc == 0, s"probe JVM exited $rc:\n${lines.mkString("\n")}")

    val parsed = lines.flatMap { l =>
      "SPILL (\\S+) rows=(\\d+) digest=(\\d+) .* OK$".r
        .findFirstMatchIn(l)
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong))
    }.toMap
    for (name <- SpillProbe.Probed) {
      assert(parsed.contains(name),
        s"query $name not OK under pressure:\n${lines.mkString("\n")}")
      val (probeRows, probeDigest) = parsed(name)
      val (n, dg) = SpillProbe.digest(
        SparkEntry.queries(name)(spark, sfDir))
      assert((probeRows, probeDigest) == ((n, dg)),
        s"$name content diverged under memory pressure: " +
          s"pressured (rows, digest)=($probeRows, $probeDigest), " +
          s"normal ($n, $dg)")
    }
    lines.foreach(l => info(l))
  }
}
