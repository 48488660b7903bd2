package graft

import org.apache.spark.sql.SparkSession

/** Output-row counter: prints `name dir count` for the named queries
  * over each sf dir — separates OUTPUT growth from operator-volume
  * growth when adjudicating a ScalingCurve exponent (an output-bound
  * query's total_rows slope is its answer size, not a plan defect).
  *
  * Usage: graft.QueryCount <query[,query...]> <sfDir[,sfDir...]>
  */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs; n <- names) {
      val c = SparkEntry.queries(n)(spark, d).count()
      println(f"[count] $n%-34s $d%-28s $c%12d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
