package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Skew-resilience probe: routing family (VERDICT r13 task 1), plus
  * the text token-groupBy and graph hub-node families (r14 task 3) —
  * the classic 100 TB scale-killers the uniform amplified ladder
  * cannot see. Per family, the probe asserts the mechanism that
  * actually bounds the straggler: AQE's skew-join split for the
  * route fan-outs and the degraded PageRank contribution join
  * (join-key skew in shuffle INPUT), and partial aggregation + the
  * distinct-agg rewrite for token groupBys (where no input-skewed
  * exchange exists to split).
  *
  * Real pub/sub traffic is zipf: one hot channel carries
  * most messages (the reference's per-message subscriber loop,
  * `lib/ChannelHub.js:258-272`). The fan-out joins shuffle by
  * `channel` once membership outgrows the broadcast ceiling (the
  * Router scaladoc's de-hinted sort-merge degradation), and then the
  * hot channel is ONE straggler partition.
  *
  * The straggler metric is per-task shuffle-WRITE records on the
  * query's dominant-flow stages (task-metrics listener, the
  * ScalingCurve pattern): the hot-channel task READS only its slice
  * of messages but PRODUCES the entire multiplied delivery stream, so
  * write records are where the straggler shows. 1.0 means one task
  * wrote the dominant stage's every record. Stages well below the
  * dominant flow are ignored: a broadcast-sized dimension build
  * (membership, 150 rows) legitimately coalesces to one task and is
  * not a straggler.
  *
  * Scenarios, each `SKEW <name> ... OK|FAIL` on stdout (the FaultProbe
  * reporting contract; SkewSpec forks this JVM and asserts):
  *
  *   1. contrast — skew handling OFF on the zipf corpus: the
  *      straggler demonstrably exists (max exchange share ≈ 1.0);
  *   2. per route query (`route_client_fanout`, `route_delivery_gate`,
  *      `route_enriched_deliveries`) — AQE skew split ON: an
  *      `isSkewJoin` node appears in the final plan, the max share
  *      drops under the bound, and the output digest is identical to
  *      the unsplit run;
  *   3. uniform control — default 256 MB thresholds on the same
  *      corpus: no skew join (the mechanism is skew-driven, not
  *      config-driven).
  *
  * Needs its own JVM: `local[8]` — AQE's skew split can only cut a
  * hot partition at MAPPER boundaries, so the shared 2-core spec
  * session caps any split at 2 chunks. Thresholds are scaled to the
  * 10k-event corpus (`skewedPartitionThresholdInBytes` defaults to
  * 256 MB — a size only a cluster-scale shuffle reaches); at 100 TB
  * the defaults engage the same code path.
  */
object SkewProbe {

  private val RouteFamily =
    Seq("route_client_fanout", "route_delivery_gate",
      "route_enriched_deliveries")

  /** All physical nodes including those behind AQE stage wrappers. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: through.flatMap(walk)
  }

  /** Execute `df` and return the max single-task share of shuffle-
    * WRITE records across the query's dominant-flow stages (total
    * writes within 4× of the heaviest stage). Write records are the
    * straggler signal for a fan-out: the hot-channel task READS only
    * its slice of messages but PRODUCES the entire multiplied
    * delivery stream — and measuring only dominant stages excludes
    * the tiny dimension-build aggregates that AQE legitimately
    * coalesces to one task (membership is 150 rows; its "1.0 share"
    * is a broadcast-sized build, not a straggler). */
  private def maxTaskShare(s: SparkSession, df: DataFrame): Double = {
    val stageWrites =
      scala.collection.concurrent.TrieMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val recs = Option(te.taskMetrics)
          .map(_.shuffleWriteMetrics.recordsWritten).getOrElse(0L)
        val buf = stageWrites.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty)
        buf.synchronized { buf += recs }
      }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      df.queryExecution.toRdd.count()
      // listener events dispatch asynchronously — poll to stability
      // (the ScalingCurve drain discipline)
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 2 && waited < 3000) {
        val now = stageWrites.values.map(_.size.toLong).sum
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(100); waited += 100
      }
      val perStage = stageWrites.toSeq
        .map { case (sid, b) => b.synchronized { (sid, b.sum, b.max) } }
        .filter(_._2 > 0L)
      require(perStage.nonEmpty, "no shuffle-writing stage observed")
      val dominant = perStage.map(_._2).max
      val shares = perStage.filter(_._2 * 4 >= dominant)
      if (sys.env.contains("SKEW_DEBUG"))
        shares.sortBy(_._1).foreach { case (sid, t, mx) =>
          System.err.println(f"[skew]   stage=$sid writes=$t " +
            f"maxTask=$mx share=${mx.toDouble / t}%.3f") }
      shares.map { case (_, t, mx) => mx.toDouble / t }.max
    } finally s.sparkContext.removeSparkListener(listener)
  }

  private def skewJoins(df: DataFrame): Int =
    walk(df.queryExecution.executedPlan).count {
      case j: SortMergeJoinExec => j.isSkewJoin
      case j: ShuffledHashJoinExec => j.isSkewJoin
      case _ => false
    }

  /** Order-free content digest (rows, modular xxhash sum — a raw sum
    * overflows LONG under ANSI on a half-million-row fan-out): the
    * skew split may reorder; the oracle sweep already pins ordered
    * output on the uniform corpus. */
  private def digest(df: DataFrame): (Long, Long) = {
    // coalesce: sum() is NULL on zero rows — an empty result must
    // surface as a (0, 0) digest mismatch in the FAIL line, not an
    // NPE out of getLong (ADVICE r14)
    val r = df.agg(count(lit(1)),
      coalesce(sum(pmod(xxhash64(df.columns.map(col): _*),
        lit(1000000007L))), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Session planning the 100 TB shape: no broadcast (membership past
    * the ceiling), AQE on, thresholds scaled to the corpus. */
  private def sortMergeSession(base: SparkSession,
      skewHandling: Boolean): SparkSession = {
    val s2 = base.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "32")
    // parallel scans: the corpus files are sub-MB, and the default
    // 128 MB split size would funnel a whole table through ONE map
    // task — a tiny-scale artifact that reads as a straggler on the
    // first shuffle write (at 100 TB the same default yields
    // thousands of mappers)
    s2.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", skewHandling.toString)
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    // scale the COALESCER down with the skew thresholds: its default
    // 1 MB minPartitionSize would merge this corpus' balanced 2.9 MB
    // gate-join input into 2 reader tasks — a tiny-scale artifact
    // that would read as a straggler (at 100 TB the same defaults
    // yield thousands of tasks)
    s2.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    s2.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
    s2
  }

  def main(args: Array[String]): Unit = {
    val srcSf = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false
    def check(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failed = true
      println(s"SKEW $name ${if (ok) "OK" else "FAIL"} $detail")
    }

    val zipfDir = java.nio.file.Files
      .createTempDirectory("graft_zipf").toString
    ZipfTestdata.zipfify(spark, srcSf, zipfDir, hotPct = 70)

    // 1. the contrast: handling off, the straggler exists
    val off0 = sortMergeSession(spark, skewHandling = false)
    val dfOff0 = SparkEntry.queries("route_client_fanout")(off0, zipfDir)
    val share0 = maxTaskShare(off0, dfOff0)
    check("straggler_exists", share0 >= 0.8 && skewJoins(dfOff0) == 0,
      f"off_share=$share0%.3f")

    // 2. the route family under AQE skew split
    for (name <- RouteFamily) {
      val off = sortMergeSession(spark, skewHandling = false)
      val on = sortMergeSession(spark, skewHandling = true)
      val dfOff = SparkEntry.queries(name)(off, zipfDir)
      val dfOn = SparkEntry.queries(name)(on, zipfDir)
      val shareOff = maxTaskShare(off, dfOff)
      val shareOn = maxTaskShare(on, dfOn)
      val splits = skewJoins(dfOn)
      val same = digest(dfOn) == digest(dfOff)
      check(name,
        splits >= 1 && shareOn <= 0.35 && shareOn < shareOff / 2 && same,
        f"off_share=$shareOff%.3f on_share=$shareOn%.3f " +
          s"skew_joins=$splits digest_match=$same")
    }

    // 3. uniform control: default thresholds never flag at this sf
    val ctl = spark.newSession()
    ctl.conf.set("spark.sql.shuffle.partitions", "32")
    ctl.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ctl.conf.set("spark.sql.adaptive.enabled", "true")
    val dfCtl = SparkEntry.queries("route_client_fanout")(ctl, zipfDir)
    dfCtl.queryExecution.toRdd.count()
    check("default_thresholds_quiet", skewJoins(dfCtl) == 0, "")

    // 4. TEXT family (VERDICT r14 task 3): token groupBys under a
    // token that is 70% of ALL occurrences. An aggregation's hot key
    // is NOT a join's hot key: partial aggregation combines the hot
    // token map-side and the distinct-agg rewrite keys its first
    // exchange on (token, doc_id) — so the family's term-stat
    // groupBys (text_top_terms, the tf-idf df counts) carry no
    // straggler AT ALL on a corpus this skewed. The probe proves
    // that bound as machine truth (plus plan-shape-independent
    // digests at 32 vs 4 reducers) instead of asserting a skew split
    // that has nothing to split. (The text family's OTHER skew — a
    // boilerplate fingerprint's join FANOUT, small input partition,
    // huge output — is invisible to input-sized skew detection by
    // construction; the family's posting caps own it: MaxFpSources,
    // MaxDf/MaxPostings. See BENCH_NOTES r15.)
    val tokDir = java.nio.file.Files
      .createTempDirectory("graft_zipf_tokens").toString
    ZipfTestdata.zipfifyTokens(spark, "/root/testdata/sf0.1", tokDir,
      hotPct = 70)
    def tokenAgg(s: SparkSession): DataFrame =
      Tables.documents(s, tokDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("occ"),
          countDistinct("doc_id").as("df"))
    val ts = sortMergeSession(spark, skewHandling = true)
    val dfTok = tokenAgg(ts)
    val shareTok = maxTaskShare(ts, dfTok)
    val fr = dfTok.agg(
      coalesce(sum(when(col("w") === "zzhot", col("occ"))), lit(0L)),
      sum(col("occ"))).collect()(0)
    val hotFrac = fr.getLong(0).toDouble / fr.getLong(1)
    val ts4 = sortMergeSession(spark, skewHandling = true)
    ts4.conf.set("spark.sql.shuffle.partitions", "4")
    val sameTok = digest(tokenAgg(ts4)) == digest(dfTok)
    check("text_token_groupby",
      hotFrac >= 0.6 && shareTok <= 0.2 && sameTok,
      f"hot_frac=$hotFrac%.3f max_share=$shareTok%.3f " +
        s"digest_match=$sameTok")

    // 5. GRAPH family: PageRank's per-round contribution join under a
    // hub node owning ~90% of edge endpoints (the celebrity-account
    // shape), forced past BroadcastNodeBudget — per-round keyed
    // shuffle on src, where the hub is ONE straggler partition whose
    // per-dst partial aggregation cannot shrink (every hub
    // contribution targets a distinct neighbor).
    val graphDir = java.nio.file.Files
      .createTempDirectory("graft_zipf_graph").toString
    ZipfTestdata.zipfifyGraph(spark, srcSf, graphDir, hotPct = 90)
    probeFamily(spark, "graph_pagerank_top",
      s => graft.analytics.GraphQueries.pagerankTop(s, graphDir,
        forceShuffle = true),
      offMin = 0.5, onMax = 0.35, check)

    spark.stop()
    if (failed) sys.exit(1)
  }

  /** The scenario-2 discipline generalized (text/graph families): the
    * straggler exists with handling off, AQE's skew split bounds it
    * with an identical output digest, and the family's own control —
    * default 256 MB thresholds on the SAME zipf corpus — stays quiet
    * (the mechanism is skew-driven, not config-driven). */
  private def probeFamily(spark: SparkSession, name: String,
      mk: SparkSession => DataFrame, offMin: Double, onMax: Double,
      check: (String, Boolean, String) => Unit): Unit = {
    val off = sortMergeSession(spark, skewHandling = false)
    val on = sortMergeSession(spark, skewHandling = true)
    val dfOff = mk(off)
    val dfOn = mk(on)
    val shareOff = maxTaskShare(off, dfOff)
    val shareOn = maxTaskShare(on, dfOn)
    val splits = skewJoins(dfOn)
    val same = digest(dfOn) == digest(dfOff)
    check(name,
      splits >= 1 && shareOff >= offMin && shareOn <= onMax &&
        shareOn < shareOff / 2 && same,
      f"off_share=$shareOff%.3f on_share=$shareOn%.3f " +
        s"skew_joins=$splits digest_match=$same")
    val ctl = spark.newSession()
    ctl.conf.set("spark.sql.shuffle.partitions", "32")
    ctl.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ctl.conf.set("spark.sql.adaptive.enabled", "true")
    val dfCtl = mk(ctl)
    dfCtl.queryExecution.toRdd.count()
    check(s"${name}_default_thresholds_quiet", skewJoins(dfCtl) == 0, "")
  }
}
