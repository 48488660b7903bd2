package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.loadWarmFloors]]'s hand-rolled parse (round-14 ADVICE
  * fix): the flat top-level format parses including scientific
  * notation, a nested object's inner pairs don't leak in as floors,
  * and the absent-file case stays silent-empty (the fresh-checkout
  * path the driver hits when cwd isn't the repo). */
class WarmFloorSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = java.nio.file.Files.createTempFile("warm", ".json")
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("flat floors parse, including scientific notation") {
    val floors = Bench.loadWarmFloors(write(
      """{
        | "q_a": 0.81,
        | "q_b": 12,
        | "q_c": 1.2e-3,
        | "q_d": 2.5E2
        |}""".stripMargin))
    assert(floors == Map(
      "q_a" -> 0.81, "q_b" -> 12.0, "q_c" -> 0.0012, "q_d" -> 250.0))
  }

  test("a nested object disables floors entirely (flat-file contract enforced, r15)") {
    // round-14's anchor alone still let a nested object's inner pairs
    // ("reps": 3,) match the flat shape — a phantom floor colliding
    // with a query name would mis-adjudicate warm reruns. The parser
    // now REJECTS any file with braces inside the top-level body:
    // floors off loudly beats floors subtly wrong.
    val floors = Bench.loadWarmFloors(write(
      """{
        | "q_a": 1.5,
        | "meta": {"reps": 3, "cap": 10},
        | "q_b": 2.25
        |}""".stripMargin))
    assert(floors.isEmpty,
      s"nested file must disable floors, parsed $floors")
    // brace-free non-floor values (arrays) stay skipped entry-wise —
    // the file is still flat, so the parse survives
    val arr = Bench.loadWarmFloors(write(
      """{"q_x": [1.0, 2.0], "q_y": 3.5}"""))
    assert(arr.get("q_y").contains(3.5) && !arr.contains("q_x"))
  }

  test("absent file is silently empty; real anchor file parses fully") {
    assert(Bench.loadWarmFloors("/nonexistent/warm.json").isEmpty)
    val real = Bench.loadWarmFloors("bench_anchors/warm_minima.json")
    assert(real.size >= 371,
      s"the seeded anchor file should cover the full surface: ${real.size}")
    assert(real.values.forall(v => v > 0 && v < 1000))
  }
}
