package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-channel testdata clone for the routing-family skew harness
  * (VERDICT r13 task 1): rewrites the events log so ONE channel
  * carries `hotPct`% of all messages — the zipf traffic shape of a
  * real pub/sub deployment (the reference's per-message subscriber
  * loop hot spot, `lib/ChannelHub.js:258-272`), which the uniformly
  * densified amplified clone cannot produce.
  *
  * The hot channel keeps the name `purchase` so the route-family
  * queries run UNCHANGED on the clone (their message filter selects
  * exactly the hot channel); the cold tail spreads over 19 `chNN`
  * channels. Assignment hashes `event_id` (xxhash64 — deterministic,
  * no RNG), so the clone is reproducible bit-for-bit and the
  * subscriber registry derived from it (users with ≥ 15 hot events)
  * stays dense on the hot channel.
  *
  * Usage: ZipfTestdata <srcSfDir> <outDir> [hotPct=70]
  */
object ZipfTestdata {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/graft_zipf/sf0.01")
    val hotPct = args.lift(2).map(_.toInt).getOrElse(70)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    zipfify(spark, src, out, hotPct)
    spark.stop()
  }

  /** Number of cold-tail channels the non-hot share spreads over. */
  val ColdChannels = 19

  /** Write `out`/events.parquet: the `src` events with `event_type`
    * reassigned so `hotPct`% of rows land on the hot channel. Raw
    * read/write (not Tables.*) so the on-disk schema shape is
    * preserved for the NTZ/nanos shims. */
  def zipfify(spark: SparkSession, src: String, out: String,
      hotPct: Int): Unit = {
    require(hotPct > 0 && hotPct < 100, s"hotPct out of range: $hotPct")
    spark.read.parquet(s"$src/events.parquet")
      .withColumn("event_type",
        when(pmod(xxhash64(col("event_id")), lit(100)) < hotPct,
          lit("purchase"))
          .otherwise(concat(lit("ch"),
            pmod(xxhash64(col("event_id"), lit(7)), lit(ColdChannels)))))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }
}
