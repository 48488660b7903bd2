package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode
import TrailingDistinctStream.{Delta, Obs}

/** Checkpoint-restore for the trailing-distinct segment state: stop
  * the query mid-feed, restart from the checkpoint, and the summed
  * ±1 deltas still prefix-sum to the brute-force sliding distinct —
  * the per-user `Seg` state (RocksDB) and the file-source offsets
  * must BOTH recover, or the restart would re-open covered segments
  * (duplicated +1s) or drop extensions (missing corrections). File
  * source, not MemoryStream: memory offsets die with the query.
  */
class TrailingDistinctRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val W = 7L

  test("segment state survives a restart: deltas still sum to the truth") {
    val root = Files.createTempDirectory("ckpt_tdist").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[Obs]].schema
    withRocksDbProvider {
      def startQuery() = {
        val src = spark.readStream.schema(schema).json(s"$root/in")
          .as[Obs]
        TrailingDistinctStream.deltas(src, W)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode(OutputMode.Append)
          .start()
      }
      // run 1: open segments for two users (u1 will later EXTEND —
      // the restart must remember last_day=103 to emit the correction
      // pair, not a fresh +1)
      val b1 = Seq(Obs(1L, 100L), Obs(1L, 103L), Obs(2L, 101L))
      b1.toDS().repartition(1).write.mode("append").json(s"$root/in")
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop()
      // while "down": u1 extends (gap 5 ≤ W), u2 breaks (gap 9 > W),
      // u3 is brand new
      val b2 = Seq(Obs(1L, 108L), Obs(2L, 110L), Obs(3L, 109L))
      b2.toDS().repartition(1).write.mode("append").json(s"$root/in")
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()

      val obs = (b1 ++ b2).map(o => (o.user_id, o.day))
      val deltas = spark.read.parquet(s"$root/out").as[Delta].collect()
      // brute force over the union (obs spans days 100..110)
      val want = TrailingDistinctTestAlgebra.bruteSliding(obs, W)
      val got = TrailingDistinctTestAlgebra.prefixDeltas(
        deltas.map(d => (d.day, d.delta)).toSeq, obs)
      assert(got == want, s"got $got want $want")
      // and the correction algebra across the restart is tight: u1's
      // run-2 extension must move the close marker 110 → 115 via a
      // (+1@110, −1@115) pair — a lost state row would instead open a
      // fresh segment (+1@108). Raw rows keep the cancelling pairs
      // (they net out in the day aggregate, not in the log):
      val u1 = deltas.filter(_.user_id == 1L)
        .map(d => (d.day, d.delta)).sorted.toSeq
      assert(u1 == Seq((100L, 1L), (107L, -1L), (107L, 1L),
          (110L, -1L), (110L, 1L), (115L, -1L)),
        s"u1 delta stream wrong across restart: $u1")
    }
  }
}
