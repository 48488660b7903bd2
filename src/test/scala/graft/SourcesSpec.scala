package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet (SURVEY §2.2 scans row):
  * CSV with header+schema, JSON lines, and text — write → read →
  * values round-trip.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("sources").toString
  private val rows = Seq((1L, "news", 9.5), (2L, "sport", 3.25))

  test("csv round-trip with header and explicit schema") {
    val df = rows.toDF("id", "channel", "score")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = spark.read.option("header", "true")
      .schema("id LONG, channel STRING, score DOUBLE")
      .csv(s"$dir/csv")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }

  test("json-lines round-trip") {
    val df = rows.toDF("id", "channel", "score")
    df.write.mode("overwrite").json(s"$dir/json")
    val back = spark.read.json(s"$dir/json")
      .select("id", "channel", "score")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }

  test("orc round-trip preserves values and schema") {
    val df = rows.toDF("id", "channel", "score")
    df.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }

  test("text source feeds the frame codec") {
    val frames = Seq("""M|{"c":"news","m":"hi","_q":1}""", "garbage")
    frames.toDF("value").write.mode("overwrite").text(s"$dir/text")
    val parsed = spark.read.text(s"$dir/text")
      .select(graft.protocol.Frames.parseFrame(col("value")).as("p"))
      .select("p.op", "p.channel")
      .collect()
    assert(parsed.count(r => !r.isNullAt(0)) == 1) // only the valid frame
    assert(parsed.count(_.isNullAt(0)) == 1)       // garbage -> null op
  }

  test("partitioned parquet write prunes partitions on read") {
    val df = rows.toDF("id", "channel", "score")
    df.write.mode("overwrite").partitionBy("channel").parquet(s"$dir/part")
    val pruned = spark.read.parquet(s"$dir/part")
      .filter(col("channel") === "news")
    assert(pruned.count() == 1)
    // partition filter must appear as a PartitionFilter, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("channel#"), s"partition pruning missing in: $plan")
  }
}
