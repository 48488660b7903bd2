package graft.llm

import graft.SparkSpec

/** Proves the neighborhood-blocked fuzzy join complete: its verified
  * pair set equals a driver-side brute-force recomputation over every
  * customer pair (the quadratic scan the blocking exists to avoid).
  */
class FuzzyNameSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  /** The suite's predicate: all-digit suffixes, equal prefix, suffix
    * hamming ≤ 2. */
  private def near(n1: String, n2: String): Boolean = {
    val p = EntityQueries.PrefixLen
    n1.drop(p).forall(_.isDigit) && n2.drop(p).forall(_.isDigit) &&
      n1.take(p) == n2.take(p) &&
      hamming(n1.drop(p), n2.drop(p)) <= EntityQueries.MaxHamming
  }

  test("blocked pairs equal the brute-force hamming join") {
    val names = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(names.nonEmpty && names.forall(_._2.length == EntityQueries.NameLen))

    val brute = (for {
      (k1, n1) <- names; (k2, n2) <- names
      if k1 < k2 && near(n1, n2)
    } yield (k1, k2)).toSet

    val blocked = EntityQueries.nearPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(blocked === brute)
    assert(brute.nonEmpty, "fixture should contain near-duplicate names")
  }

  test("total collision: an all-clones registry still yields the exact census") {
    import spark.implicits._
    // 100 byte-identical names — every wildcard block degenerates to
    // the full table and the TRUE answer is itself quadratic (every
    // pair is at hamming 0); the blocked join must return exactly
    // that census, not crash or drop
    val dir = java.nio.file.Files.createTempDirectory("graft_clones").toString
    (0L until 100L).map(k => (k, "Customer#000000042"))
      .toDF("c_custkey", "c_name")
      .repartition(2).write.parquet(s"$dir/customer.parquet")
    val rows = EntityQueries.queries("dedup_fuzzy_names")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 100)
    rows.foreach { case (k, nNear, minNbr) =>
      assert(nNear === 99L, s"key $k")
      assert(minNbr === (if (k == 0L) 1L else 0L), s"key $k")
    }
  }

  test("property: blocked equals brute force on random digit registries") {
    import spark.implicits._
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      // clustered ids (shared high digits) so hamming-close pairs are
      // dense, plus uniform noise
      val ids = (0 until 300).map { i =>
        if (i % 3 == 0) 100000000L + rnd.nextInt(1000)
        else rnd.nextLong(1000000000L)
      }.distinct
      val names = ids.zipWithIndex.map { case (id, k) =>
        (k.toLong, f"Customer#$id%09d") }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_fz$seed").toString
      names.toDF("c_custkey", "c_name")
        .repartition(4).write.parquet(s"$dir/customer.parquet")

      val brute = (for {
        (k1, n1) <- names; (k2, n2) <- names
        if k1 < k2 && near(n1, n2)
      } yield (k1, k2)).toSet
      val blocked = EntityQueries.nearPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked === brute, s"seed $seed")
      assert(brute.nonEmpty, s"seed $seed produced no near pairs")
    }
  }

  test("topk twin equals brute-force k-best and the window row_number twin") {
    // brute-force k best per key by (dist, nbr) — the total order the
    // operator contracts to
    val names = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val p = EntityQueries.PrefixLen
    val brute = (for {
      (k1, n1) <- names; (k2, n2) <- names
      if k1 != k2 && near(n1, n2)
    } yield (k1, k2, hamming(n1.drop(p), n2.drop(p)).toLong))
      .groupBy(_._1).toSeq
      .flatMap { case (k, nbrs) =>
        nbrs.sortBy(t => (t._3, t._2)).take(EntityQueries.TopK)
          .zipWithIndex.map { case ((_, nbr, d), i) => (k, nbr, d, i + 1L) }
      }.toSet

    val topk = EntityQueries.queries("dedup_fuzzy_names_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(topk.toSet === brute)
    assert(brute.nonEmpty, "fixture should contain near-duplicate names")

    // and the window spelling (the spill-safe high-cardinality twin)
    // agrees row-for-row — the operator's correctness contract
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val edges = spark.createDataFrame(topk.map(t => (t._1, t._2, t._3)).toSeq)
      .toDF("c_custkey", "nbr", "dist")
    // rebuild the UNTRUNCATED edge list brute-force for the window twin
    val allEdges = (for {
      (k1, n1) <- names; (k2, n2) <- names
      if k1 != k2 && near(n1, n2)
    } yield (k1, k2, hamming(n1.drop(p), n2.drop(p)).toLong)).toSeq
    val windowed = spark.createDataFrame(allEdges)
      .toDF("c_custkey", "nbr", "dist")
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("dist"), col("nbr")))
        .cast("long"))
      .filter(col("rk") <= EntityQueries.TopK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(windowed.toSet === topk.toSet)
  }

  test("the blocked join never degenerates to a cartesian product") {
    // AQE off on a CLONED session (the MomentGuardSpec discipline —
    // a shared-session toggle races concurrently-planning suites)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = EntityQueries.nearPairs(s2, sf)
    df.collect()
    val bad = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty,
      s"all-pairs join shape in the blocked plan:\n${bad.mkString("\n")}")
  }
}
