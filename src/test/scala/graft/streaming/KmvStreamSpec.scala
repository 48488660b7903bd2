package graft.streaming

import graft.SparkSpec
import KmvStream.{HashEvent, SketchRow}

class KmvStreamSpec extends SparkSpec {
  private val K = 8
  private implicit val heEnc: org.apache.spark.sql.Encoder[HashEvent] =
    org.apache.spark.sql.Encoders.product[HashEvent]
  private implicit val srEnc: org.apache.spark.sql.Encoder[SketchRow] =
    org.apache.spark.sql.Encoders.product[SketchRow]

  private def latest(rows: Seq[SketchRow]): Map[String, SketchRow] =
    rows.groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap

  private def batchSketch(hashes: Seq[Long]): (Seq[Long], Double) = {
    val hs = hashes.map(_ & Long.MaxValue).distinct.sorted.take(K)
    val est =
      if (hs.length >= K)
        (K - 1).toDouble * 9223372036854775808.0 / hs.last.toDouble
      else hs.length.toDouble
    (hs, est)
  }

  test("stream sketch equals the batch rebuild on a random stream") {
    val rnd = new scala.util.Random(7)
    val all = (1 to 60).map(_ =>
      HashEvent(s"k${rnd.nextInt(3)}", rnd.nextLong()))
    val batches = all.grouped(17).toSeq
    val out = runRocksDbStream(batches)(ds => KmvStream.sketches(ds, K))
    val got = latest(out)
    all.groupBy(_.key).foreach { case (key, evs) =>
      val (hs, est) = batchSketch(evs.map(_.hash))
      val row = got(key)
      assert(row.n_in_sketch === hs.length.toLong, key)
      assert(row.kth_min === (if (hs.length >= K) hs.last else -1L), key)
      assert(row.estimate === est, key)
    }
  }

  test("replayed batches change nothing (idempotent under at-least-once)") {
    val evs = (1 to 20).map(i => HashEvent("c", i.toLong * 1234567891L))
    val out1 = runRocksDbStream(Seq(evs))(ds => KmvStream.sketches(ds, K))
    val out2 = runRocksDbStream(Seq(evs, evs))(ds => KmvStream.sketches(ds, K))
    assert(latest(out1)("c").kth_min === latest(out2)("c").kth_min)
    assert(latest(out1)("c").estimate === latest(out2)("c").estimate)
    // the replay batch emitted no new version
    assert(out1.map(_.version).max === out2.map(_.version).max)
  }

  test("below-k sketches report the exact count") {
    val evs = Seq(HashEvent("c", 5L), HashEvent("c", 9L), HashEvent("c", 5L))
    val out = runRocksDbStream(Seq(evs))(ds => KmvStream.sketches(ds, K))
    val r = latest(out)("c")
    assert(r.n_in_sketch === 2L)
    assert(r.kth_min === -1L)
    assert(r.estimate === 2.0)
  }
}
