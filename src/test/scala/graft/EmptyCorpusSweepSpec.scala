package graft

/** The whole-surface empty-corpus invariant: EVERY query must build
  * and execute against empty copies of all ten tables — no driver
  * NPE on a NULL min/max/sum pre-pass, no ANSI divide-by-zero, no
  * unguarded head() on an empty frame. The per-query EmptyInputSpec
  * lists pin exact outputs for interesting cases; this sweep pins the
  * weaker no-crash property for the other ~350 so the class of bug
  * the round-11 reviews kept finding (five instances) cannot recur
  * silently in ANY query. Schemas come from the sf0.001 parquet
  * itself (limit 0), so they cannot drift from the real fixtures.
  */
class EmptyCorpusSweepSpec extends SparkSpec {

  test("every query survives a fully-empty corpus") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("empty_all").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            val m = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .map(x => Option(x.getMessage).getOrElse(""))
              .mkString(" | ").take(200)
            Some(s"$name -> $m")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on an empty corpus:\n" +
        failures.mkString("\n"))
  }

  test("every query survives a single-row corpus") {
    // one real row per table (limit 1 from the fixtures, so values
    // are plausible but joins mostly miss): exercises the OTHER
    // degenerate family — n = 1 variances, single-day series,
    // (n−1)/0 denominators — that empty input cannot reach
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("one_row").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(1)
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            val m = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .map(x => Option(x.getMessage).getOrElse(""))
              .mkString(" | ").take(200)
            Some(s"$name -> $m")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on a single-row corpus:\n" +
        failures.mkString("\n"))
  }
}
