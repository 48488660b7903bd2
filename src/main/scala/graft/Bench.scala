package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Measurement discipline:
  *  - noop sink (not count()) so column pruning can't skip the
  *    projected work being measured;
  *  - AQE on (runtime shuffle coalescing + skew splitting) and a
  *    raised broadcast threshold — the same settings a production
  *    deployment would start from;
  *  - queries run in sorted-name order for stable per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // testdata is one file per table; small splits keep scans parallel
      .config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // local-iteration filter (same contract as Verify): comma-separated
    // name prefixes; unset (the driver's mode) benches every query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Intra-query persists (token-count projections etc.) must not
      // leak storage-memory pressure into later measurements; cleared
      // outside the timed region.
      spark.catalog.clearCache()
      (name, elapsed, ok)
    }
    // A failed query reports -1, never a fast-looking elapsed time, and
    // is listed in "failed" so a broken query can't pass as a quick win.
    // Locale.ROOT: the f-interpolator formats through the DEFAULT
    // locale, and a comma-decimal host (de_DE, fr_FR ...) would emit
    // "0,123" - malformed JSON the driver cannot parse.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, ok) =>
      JsonOut.q(k) + ":" + (if (ok) num(v) else "-1") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => JsonOut.q(k) }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // Machine-generated warm adjudication (the r12 noise lesson —
    // route_client_fanout read 5.95 s in one sweep vs a 1.31 s warm
    // truth): any query whose single-shot sweep reading exceeds 2× its
    // recorded warm minimum (bench_anchors/warm_minima.json) is
    // re-measured with WarmReps back-to-back runs in the SAME JVM and
    // the iterations land in the "warm_reruns" key, so the adjudication
    // is part of the round's bench artifact instead of a manual
    // AbBench session. Budgeted to the WarmRerunCap worst offenders.
    // floors are recorded at sf0.1 (the driver's bench scale) — at any
    // other sfDir they are meaningless and the pass stays off; exact
    // basename match, not substring (an amplified clone named
    // .../sf0.1x10 must not inherit sf0.1 floors)
    val sfBase = new java.io.File(sfDir).getName
    val warmFloors =
      if (sfBase != "sf0.1") Map.empty[String, Double]
      else loadWarmFloors(
        sys.env.getOrElse("SPARK_GRAFT_WARM_FILE",
          "bench_anchors/warm_minima.json"))
    val suspects = results.collect {
      case (name, v, true) if warmFloors.get(name).exists(w => v > 2 * w)
        => (name, v / warmFloors(name))
    }.sortBy(-_._2).take(WarmRerunCap).map(_._1)
    val warmReruns = suspects.map { name =>
      val fn = SparkEntry.queries(name)
      val iters = (1 to WarmReps).map { _ =>
        // same discipline as the sweep loop: a failed rerun reports
        // -1, never a fast-looking elapsed time (a crashed iteration
        // must not read as "warm truth is fast"), and the cache clear
        // stays OUTSIDE the timed region like the floors it is
        // adjudicated against
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) elapsed else -1.0
      }
      name -> iters
    }
    val warmRerunsJson = warmReruns.map { case (name, iters) =>
      JsonOut.q(name) + ":" + iters.map(num).mkString("[", ",", "]")
    }.mkString("{", ",", "}")

    // Self-adjudicated headline (r14 VERDICT task 5): three rounds
    // running, the dry sweep's "value" needed manual adjudication
    // against warm anchors to separate host-window noise from real
    // movement. warm_total does that adjudication inside the
    // artifact: per query, min(dry reading, best successful warm
    // rerun) — identical to "value" for the un-rerun majority, the
    // same-JVM warm truth for the suspects the floor check flagged.
    val rerunBest = warmReruns.toMap.map { case (name, iters) =>
      name -> iters.filter(_ >= 0) }
    val warmTotal = results.collect { case (name, v, true) =>
      rerunBest.get(name).filter(_.nonEmpty)
        .fold(v)(good => math.min(v, good.min))
    }.sum

    val fullLine =
      s"""{"metric":"total","value":${num(total)},"warm_total":${num(warmTotal)},"unit":"sec","queries":$qs,"failed":$failed,"warm_reruns":$warmRerunsJson,"sf":${JsonOut.q(sfDir)}}"""
    println(fullLine)
    // Driver-adjudication contract (VERDICT r15 item 1, additions
    // only): with 374 queries the full line above is ~15 KB and has
    // never survived the driver's 2000-char stdout tail — every
    // BENCH_r01..r15.json carries "parsed": null. Persist the full
    // per-query JSON to a file, then print a COMPACT final line that
    // fits any tail window. Consumers of the original line keep
    // working; the compact line adds a parseable summary after it.
    try
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(
        s"[bench] WARN could not write bench_out.json: ${e.getMessage}")
    }
    val nFailed = results.count(!_._3)
    println(s"""{"metric":"total","value":${num(total)},"warm_total":${num(warmTotal)},"unit":"sec","n":${results.size},"failed":$nFailed,"queries_file":"bench_out.json","sf":${JsonOut.q(sfDir)}}""")
    spark.stop()
  }

  private val WarmReps = 3
  private val WarmRerunCap = 10

  /** Recorded warm minima (query → seconds); empty when the anchor
    * file is absent (fresh checkout, non-repo cwd) — the rerun pass
    * then simply never triggers. Hand-rolled parse: the file is
    * repo-owned flat {"name": secs} JSON. */
  private[graft] def loadWarmFloors(path: String): Map[String, Double] =
    try {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      // The file is contracted to be FLAT {"name": secs} JSON, and
      // that contract is enforced here rather than assumed: the
      // [,}]-anchor alone would still match a nested object's inner
      // numeric pairs ("reps": 3, — ADVICE r14), so any brace inside
      // the top-level body disables floors loudly instead of
      // injecting phantom entries that mis-adjudicate warm reruns.
      val body = text.trim.stripPrefix("{").stripSuffix("}")
      if (body.exists(c => c == '{' || c == '}')) {
        System.err.println(s"[bench] WARN warm-floor file $path is " +
          "not flat {name: secs} JSON — floors disabled")
        return Map.empty
      }
      // accepts scientific notation; [,}]-anchored against trailing
      // garbage on a value
      val floors =
        "\"([^\"]+)\"\\s*:\\s*([0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)\\s*[,}]"
          .r.findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      if (floors.isEmpty && text.trim.length > 2)
        System.err.println(s"[bench] WARN warm-floor file $path " +
          "exists but parsed to zero entries — malformed?")
      floors
    } catch {
      case _: java.nio.file.NoSuchFileException => Map.empty
      case e: Exception =>
        System.err.println(s"[bench] WARN warm-floor file $path " +
          s"unreadable (${e.getClass.getSimpleName}): floors disabled")
        Map.empty
    }
}
