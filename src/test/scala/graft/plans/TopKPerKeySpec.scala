package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator path (TopKPerKeyNode → Strategy →
  * two-phase Exec): row-for-row equal to the window row_number twin,
  * plans with partial-below-exchange/final-above, never sorts the
  * corpus, and handles the degenerate shapes (k > group, empty input,
  * null keys).
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 9.0), ("a", 2L, 7.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
    ("b", 5L, 5.0), ("b", 6L, 5.0),
    ("c", 7L, 2.0))
    .toDF("key", "id", "v")

  test("matches the window row_number twin, ties broken by id") {
    val got = TopKPerKey(df, Seq("key"), Seq(col("v").desc, col("id").asc), 2)
      .select("key", "rk", "id", "v")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val want = df.withColumn("rk",
        row_number().over(Window.partitionBy(col("key"))
          .orderBy(col("v").desc, col("id").asc)).cast("long"))
      .filter(col("rk") <= 2)
      .select("key", "rk", "id", "v")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("plans as partial below the exchange, final above, no Sort/Window") {
    val plan = TopKPerKey(df, Seq("key"), Seq(col("v").desc, col("id").asc), 2)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).length >= 2,
      s"expected partial+final TopKPerKeyExec in: $plan")
    assert(plan.contains("Exchange hashpartitioning(key"),
      s"expected a hash exchange on the key in: $plan")
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"the whole point is no corpus sort: $plan")
  }

  test("k larger than every group returns whole groups, dense ranks") {
    val got = TopKPerKey(df, Seq("key"), Seq(col("id").asc), 10)
      .select("key", "rk", "id")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.length == 7)
    assert(got.filter(_._1 == "a").map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("empty input yields empty output; null keys group together") {
    val empty = df.filter(col("id") < 0)
    assert(TopKPerKey(empty, Seq("key"), Seq(col("id").asc), 3).count() == 0)

    val withNulls = Seq((Some("a"), 1L), (None, 2L), (None, 3L), (None, 4L))
      .toDF("key", "id")
    val top = TopKPerKey(withNulls, Seq("key"), Seq(col("id").asc), 2)
      .select("key", "rk", "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(top.filter(_._1.isEmpty).map(t => (t._2, t._3)).sorted.toSeq ==
      Seq((1L, 2L), (2L, 3L)))
  }

  test("property: agrees with the window twin on seeded-random data") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(4)
      val data = Seq.fill(120)((s"k${rnd.nextInt(6)}", rnd.nextInt(20).toDouble))
        .zipWithIndex.map { case ((key, v), i) => (key, i.toLong, v) }
      val df = data.toDF("key", "id", "v")
      val got = TopKPerKey(df, Seq("key"), Seq(col("v").desc, col("id").asc), k)
        .select("key", "rk", "id")
        .as[(String, Long, Long)].collect().toSet
      val want = df.withColumn("rk",
          row_number().over(Window.partitionBy(col("key"))
            .orderBy(col("v").desc, col("id").asc)).cast("long"))
        .filter(col("rk") <= k)
        .select("key", "rk", "id")
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"seed $seed k $k")
    }
  }

  test("a rank name colliding with an input column is rejected") {
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("key"), Seq(col("id").asc), 2, rankName = "v")
    }
    assert(e.getMessage.contains("'v' already exists"))
    // a non-colliding custom name still works
    val ok = TopKPerKey(df, Seq("key"), Seq(col("id").asc), 1,
      rankName = "position")
    assert(ok.columns.contains("position") && ok.count() == 3)
  }

  test("an empty key list fails fast with the global-top-k hint") {
    // ClusteredDistribution(Nil) would otherwise surface as an
    // internals-pointing require() during physical planning
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq.empty, Seq(col("id").asc), 2)
    }
    assert(e.getMessage.contains("keyCols must be non-empty"))
    assert(e.getMessage.contains("orderBy(...).limit(k)"))
  }

  test("heap state past the per-partition bound dies loudly, naming the conf") {
    // the operator's O(keys·k) memory is per DISTINCT KEY — a
    // high-cardinality misuse must fail with an actionable error, not
    // an opaque executor OOM (the LocalTypeCap discipline). Conf on a
    // CLONED session; data forced into one partition so the key count
    // is deterministic.
    val s2 = spark.newSession()
    s2.conf.set(TopKPerKey.MaxHeapEntriesKey, "4")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("id", LongType)))
    val rows = (1 to 10).map(i => Row(s"k$i", i.toLong))
    val wide = s2.createDataFrame(
      s2.sparkContext.parallelize(rows, 1), schema)
    val e = intercept[Throwable] {
      TopKPerKey(wide, Seq("key"), Seq(col("id").asc), 2).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("TopKPerKey") &&
      m.contains(TopKPerKey.MaxHeapEntriesKey)), msgs.mkString(" | "))
    // the default bound passes the same shape untouched
    val ok = TopKPerKey(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      Seq("key"), Seq(col("id").asc), 2)
    assert(ok.count() == 10)
  }

  test("multi-column keys and ascending order work end to end") {
    val multi = Seq(("x", 1, 10L), ("x", 1, 20L), ("x", 2, 30L), ("y", 1, 40L))
      .toDF("k1", "k2", "id")
    val got = TopKPerKey(multi, Seq("k1", "k2"), Seq(col("id").asc), 1)
      .select("k1", "k2", "rk", "id")
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("x", 1, 1L, 10L), ("x", 2, 1L, 30L),
      ("y", 1, 1L, 40L)))
  }
}
