package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only scheduled-job counter: builds + noop-runs each named query
  * and prints how many Spark jobs it scheduled. Iterative loops pay a
  * fixed scheduling constant per job, so "fewer jobs per round" is the
  * adjudicable evidence for loop-scheduling optimizations (VERDICT r15
  * item 6).
  *
  * Usage: graft.JobCount <query[,query...]> [sfDir]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (q <- names) {
      // settle the async listener bus before and after each query so
      // counts cannot bleed between queries (dev tool: sleep is fine)
      Thread.sleep(800)
      jobs.set(0)
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(800)
      println(f"[jobs] $q%-34s ${jobs.get()}%5d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
