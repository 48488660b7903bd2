package graft

import org.apache.spark.sql.SparkSession

/** Local A/B harness (not part of the driver contract): runs each
  * selected query REPS times in one JVM and prints every iteration.
  * Iteration 1 absorbs JIT/codegen warmup; compare iterations 2+.
  * The driver's Bench runs queries once in a 220-query sweep where
  * warmup is amortized — a 3-query SPARK_GRAFT_ONLY Bench run instead
  * charges the whole C2 compile storm to the first measured query,
  * which is exactly the confound this tool removes.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ps = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",").toSeq
    val selected = SparkEntry.queries
      .filter { case (n, _) => ps.exists(n.startsWith) }.toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-34s " +
        times.map(t => f"$t%7.2f").mkString(" "))
    }
    spark.stop()
  }
}
