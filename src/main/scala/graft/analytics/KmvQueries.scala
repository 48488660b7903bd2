package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.XxhSql
import graft.plans.TopKPerKey

/** KMV (k-minimum-values) distinct sketches — the HASH-CHECKED member
  * of the sketch family. sketch_hll_users/merge use the engine's opaque
  * DataSketches binaries (their OUTPUTS are oracle-checked bound
  * contracts since round 12); the KMV sketch carries
  * the same capabilities — mergeable distinct estimation and
  * theta-style set intersection (Beyer et al., SIGMOD'07; the
  * DataSketches theta sketch is the industrial form) — as pure integer
  * arithmetic over xxhash64 values, which the DuckDB oracle replays
  * bit-for-bit (XxhSql), kth-minimum included.
  *
  * Sketch definition: uh = xxhash64(value) & Long.MaxValue (the
  * non-negative half keeps signed BIGINT comparisons = unsigned ones on
  * both engines); the sketch is the k smallest distinct uh. With
  * n ≥ k, est = (k−1) · 2^63 / kth_min (one IEEE division of exact
  * integers); with n < k the sketch holds every element and the
  * estimate is exact.
  *
  * Scale shape: the min-k selection is the custom TopKPerKey operator —
  * map-side partial min-k caps the shuffle at partitions·keys·k rows;
  * sketches then merge WITHOUT rescanning data (min-k of a union of
  * min-k sets is the union's min-k), which is the 100 TB story: one
  * pass per partition, k longs per key on the wire, register-style
  * merge at any fan-in, exactly like the HLL twin but fully
  * oracle-checked.
  */
object KmvQueries extends QuerySuite {

  private val K = 64

  /** Distinct masked hashes of user ids per event_type. NULL user ids
    * are excluded in BOTH twins: Spark's xxhash64 hashes NULL to the
    * seed (42 — a near-minimal sketch value that would poison the
    * min-K ranks), while the oracle's XxhSql replay of a NULL VARCHAR
    * propagates NULL — and the exact countDistinct audit column never
    * counts NULL anyway. */
  private def typeHashes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        xxhash64(col("user_id").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)).as("uh"))
      .distinct()

  /** est column from (n, kth) under the exact-below-k rule. */
  private def estimate(n: Column, kth: Column): Column =
    when(n < K, n.cast("double"))
      .otherwise(lit((K - 1).toDouble) * lit(9223372036854775808.0) /
        kth.cast("double"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-type KMV sketch state + estimate beside the exact count. The
    // full sketch (k rows per type) flows through TopKPerKey; only the
    // kth value and counts surface.
    "sketch_kmv_users" -> ((s, d) => {
      val mink = TopKPerKey(typeHashes(s, d), Seq("event_type"),
        Seq(col("uh")), K)
      // only the kth value surfaces here; n_hashes (the UNCAPPED
      // distinct count the estimator needs) comes from nAll below
      val stats = mink.groupBy("event_type")
        .agg(max(when(col("rk") === K, col("uh"))).as("kth_min"))
      val nAll = typeHashes(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n_hashes"))
      val exact = Tables.events(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      stats.join(nAll, Seq("event_type")).join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_hashes"), col("kth_min"),
          estimate(col("n_hashes"), col("kth_min")).as("est_users"),
          col("exact_users"))
        .orderBy("event_type")
    }),

    // Sketch MERGE: the global sketch built only from the per-type
    // sketches (never rescanning events) must equal the directly-built
    // global sketch — KMV merge is lossless by construction, and the
    // oracle checks both paths land on identical kth values and
    // estimates.
    "sketch_kmv_merge" -> ((s, d) => {
      val th = typeHashes(s, d)
      val perType = TopKPerKey(th, Seq("event_type"), Seq(col("uh")), K)
      val mergedPool = perType.select("uh").distinct()
        .withColumn("g", lit(1L))
      val merged = TopKPerKey(mergedPool, Seq("g"), Seq(col("uh")), K,
        rankName = "mrk")
        .agg(count(lit(1)).as("m_in_sketch"),
          max(when(col("mrk") === K, col("uh"))).as("merged_kth"))
      val directPool = th.select("uh").distinct().withColumn("g", lit(1L))
      val direct = TopKPerKey(directPool, Seq("g"), Seq(col("uh")), K,
        rankName = "drk")
        .agg(count(lit(1)).as("d_in_sketch"),
          max(when(col("drk") === K, col("uh"))).as("direct_kth"))
      val nGlobal = th.select("uh").distinct()
        .agg(count(lit(1)).as("n_global"))
      val exact = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.crossJoin(direct).crossJoin(nGlobal).crossJoin(exact)
        .select(lit(K.toLong).as("k"),
          col("merged_kth"), col("direct_kth"),
          estimate(col("n_global"), col("merged_kth")).as("merged_est"),
          estimate(col("n_global"), col("direct_kth")).as("direct_est"),
          col("exact_users"))
    }),

    // Theta-style set INTERSECTION from two sketches: θ = min of the
    // two sketch thresholds; candidates = sketch elements below θ;
    // est_inter = |A∩B below θ| · 2^63 / θ and the Jaccard estimate
    // |∩|/|∪| over the candidate pool — beside the exact overlap for
    // audit. The two sketches are ≤ k rows each: the set ops are
    // broadcast joins, the events table is scanned exactly twice
    // (sketch build + exact audit), never self-joined.
    "sketch_kmv_overlap" -> ((s, d) => {
      val th = typeHashes(s, d)
        .filter(col("event_type").isin("view", "purchase"))
      val mink = TopKPerKey(th, Seq("event_type"), Seq(col("uh")), K)
      val nBy = th.groupBy("event_type").agg(count(lit(1)).as("n"))
      val thetaBy = mink.groupBy("event_type")
        .agg(max(when(col("rk") === K, col("uh"))).as("kth"))
        .join(nBy, Seq("event_type"))
        // below-k sketches are exhaustive: threshold opens to 2^63
        .select(col("event_type"),
          when(col("n") < K, lit(Long.MaxValue)).otherwise(col("kth"))
            .as("theta"))
      val theta = thetaBy.agg(min(col("theta")).as("theta"))
      val a = mink.filter(col("event_type") === "view").select("uh")
      val b = mink.filter(col("event_type") === "purchase").select("uh")
      val candA = a.crossJoin(broadcast(theta)).filter(col("uh") < col("theta"))
      val candB = b.crossJoin(broadcast(theta)).filter(col("uh") < col("theta"))
      val inter = candA.join(candB, "uh")
        .agg(count(lit(1)).as("n_inter"))
      val union = candA.union(candB).distinct()
        .agg(count(lit(1)).as("n_union"))
      val exact = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id")).distinct()
        .join(Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct(), "user_id")
        .agg(count(lit(1)).as("exact_overlap"))
      inter.crossJoin(union).crossJoin(theta).crossJoin(exact)
        // n_union = 0 (empty corpus): under Spark 4's ANSI default
        // even DOUBLE x/0 throws DIVIDE_BY_ZERO (empirically checked
        // - not the IEEE inf one might expect), so the degenerate
        // estimate is NULL in both twins
        .select(col("n_inter"), col("n_union"), col("theta"),
          // theta = 0 (a kth-minimum hash of exactly 0 on a degenerate
          // sketch) is an ANSI DIVIDE_BY_ZERO abort — fold to NULL like
          // jaccard_est one column over (nullif discipline)
          (col("n_inter").cast("double") * lit(9223372036854775808.0) /
            when(col("theta") === 0L, lit(null).cast("double"))
              .otherwise(col("theta").cast("double"))).as("est_inter"),
          when(col("n_union") === 0L, lit(null).cast("double"))
            .otherwise(col("n_inter").cast("double") /
              col("n_union").cast("double")).as("jaccard_est"),
          col("exact_overlap"))
    }))

  /** Shared oracle CTE prefix: distinct (event_type, user) strings →
    * xxhash64 → masked distinct uh per type, ranked ascending. */
  private def uhCtes: String =
    s"""src AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS s
       |        FROM events WHERE user_id IS NOT NULL),
       |${XxhSql.ctes("src", Seq("event_type"), "s", "x")},
       |uhs AS (SELECT DISTINCT event_type,
       |          hv & 9223372036854775807 AS uh FROM x_out),
       |ranked AS (SELECT event_type, uh,
       |  row_number() OVER (PARTITION BY event_type ORDER BY uh) AS rk
       |  FROM uhs)""".stripMargin

  private val estSql =
    s"CASE WHEN n_hashes < $K THEN CAST(n_hashes AS DOUBLE) " +
      s"ELSE ${K - 1}.0 * 9223372036854775808.0 / kth_min END"

  def oracles: Map[String, String] = Map(
    "sketch_kmv_users" ->
      s"""WITH $uhCtes,
         |stats AS (SELECT event_type, count(*) AS n_hashes,
         |    max(CASE WHEN rk = $K THEN uh END) AS kth_min
         |  FROM ranked GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT stats.event_type AS event_type, n_hashes, kth_min,
         |  $estSql AS est_users, exact_users
         |FROM stats JOIN ex ON stats.event_type = ex.event_type
         |ORDER BY event_type""".stripMargin,

    "sketch_kmv_merge" ->
      s"""WITH $uhCtes,
         |pool AS (SELECT DISTINCT uh FROM ranked WHERE rk <= $K),
         |mranked AS (SELECT uh, row_number() OVER (ORDER BY uh) AS rk
         |  FROM pool),
         |m AS (SELECT count(*) AS m_n,
         |    max(CASE WHEN rk = $K THEN uh END) AS merged_kth FROM mranked
         |  WHERE rk <= $K),
         |dranked AS (SELECT uh,
         |    row_number() OVER (ORDER BY uh) AS rk
         |  FROM (SELECT DISTINCT uh FROM uhs)),
         |dd AS (SELECT max(CASE WHEN rk = $K THEN uh END) AS direct_kth
         |  FROM dranked WHERE rk <= $K),
         |ng AS (SELECT count(DISTINCT uh) AS n_hashes FROM uhs),
         |ex AS (SELECT count(DISTINCT user_id) AS exact_users FROM events)
         |SELECT CAST($K AS BIGINT) AS k, merged_kth, direct_kth,
         |  CASE WHEN n_hashes < $K THEN CAST(n_hashes AS DOUBLE)
         |       ELSE ${K - 1}.0 * 9223372036854775808.0 / merged_kth END
         |    AS merged_est,
         |  CASE WHEN n_hashes < $K THEN CAST(n_hashes AS DOUBLE)
         |       ELSE ${K - 1}.0 * 9223372036854775808.0 / direct_kth END
         |    AS direct_est,
         |  exact_users
         |FROM m, dd, ng, ex""".stripMargin,

    "sketch_kmv_overlap" ->
      s"""WITH $uhCtes,
         |th AS (SELECT event_type,
         |    CASE WHEN count(*) < $K THEN 9223372036854775807
         |         ELSE max(CASE WHEN rk = $K THEN uh END) END AS theta
         |  FROM ranked WHERE event_type IN ('view', 'purchase')
         |    AND rk <= $K GROUP BY 1),
         |theta AS (SELECT min(theta) AS theta FROM th),
         |ca AS (SELECT uh FROM ranked, theta
         |  WHERE event_type = 'view' AND rk <= $K AND uh < theta),
         |cb AS (SELECT uh FROM ranked, theta
         |  WHERE event_type = 'purchase' AND rk <= $K AND uh < theta),
         |i AS (SELECT count(*) AS n_inter FROM ca
         |  WHERE uh IN (SELECT uh FROM cb)),
         |u AS (SELECT count(DISTINCT uh) AS n_union
         |  FROM (SELECT uh FROM ca UNION ALL SELECT uh FROM cb)),
         |ex AS (SELECT count(*) AS exact_overlap FROM
         |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
         |  WHERE user_id IN
         |    (SELECT user_id FROM events WHERE event_type = 'purchase'))
         |SELECT n_inter, n_union, theta,
         |  CAST(n_inter AS DOUBLE) * 9223372036854775808.0
         |    / CAST(nullif(theta, 0) AS DOUBLE) AS est_inter,
         |  CASE WHEN n_union = 0 THEN NULL
         |  ELSE CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) END
         |    AS jaccard_est,
         |  exact_overlap
         |FROM i, u, theta, ex""".stripMargin)
}
