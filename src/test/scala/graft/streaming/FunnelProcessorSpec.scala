package graft.streaming

import graft.SparkSpec
import FunnelProcessor._

/** The streaming funnel must advance on strict view→click→purchase
  * progression only, match the batch min-chain on time-ordered input,
  * and ignore events that cannot advance the stage.
  */
class FunnelProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[FunnelEvent]]): Seq[StageAdvance] =
    runRocksDbStream(batches)(FunnelProcessor.advances)

  private def ev(u: Long, id: Long, t: String, sec: Long) =
    FunnelEvent(u, id, t, sec)

  test("full conversion across batches advances three stages in order") {
    val out = run(Seq(
      Seq(ev(1, 1, "view", 10), ev(1, 2, "click", 20)),
      Seq(ev(1, 3, "purchase", 30))))
    assert(out.sortBy(_.stage).map(a => (a.stage, a.stage_name, a.sec)) ==
      Seq((1L, "view", 10L), (2L, "click", 20L), (3L, "purchase", 30L)))
  }

  test("strict progression: same-second and out-of-order events cannot advance") {
    val out = run(Seq(Seq(
      ev(1, 1, "view", 10),
      ev(1, 2, "click", 10),    // NOT strictly after the view
      ev(1, 3, "purchase", 15), // skips the click stage entirely
      ev(2, 4, "click", 5))))   // click before any view
    assert(out.map(a => (a.user_id, a.stage)) == Seq((1L, 1L)))
  }

  test("intra-batch unordered rows resolve in event-time order") {
    // rows arrive purchase-first within the batch; time order is
    // view(1) -> click(2) -> purchase(3), all strictly increasing
    val out = run(Seq(Seq(
      ev(1, 3, "purchase", 30), ev(1, 1, "view", 10), ev(1, 2, "click", 20))))
    assert(out.sortBy(_.stage).map(_.stage) == Seq(1L, 2L, 3L))
  }

  test("replaying an already-consumed stage is a no-op (idempotent replays)") {
    val out = run(Seq(
      Seq(ev(1, 1, "view", 10)),
      Seq(ev(1, 1, "view", 10), ev(1, 5, "view", 12)))) // dup + later view
    assert(out.map(_.stage) == Seq(1L), "only the first view advances")
  }
}
