package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: Bench with per-query progress on stderr (find the hogs).
  * BP_THREADS / BP_SPLIT env vars mirror Bench's session config. */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threads = sys.env.getOrElse("BP_THREADS", "8")
    val b = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
    if (sys.env.get("BP_SPLIT").contains("1"))
      b.config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // BP_ONLY: comma-separated name prefixes to restrict the run.
    val only = sys.env.get("BP_ONLY").map(_.split(",").toSeq)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"$name ERROR ${e.getMessage.take(80)}") }
      System.err.println(f"$name%-32s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    spark.stop()
  }
}
