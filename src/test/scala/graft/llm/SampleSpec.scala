package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("stratified sampler: oversized strata land near Target, small strata kept whole") {
    val ev = graft.Tables.events(spark, sf)
    val totals = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SampleQueries.queries("sample_stratified_hash")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = sampled.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    for ((t, n) <- totals) {
      val k = byType.getOrElse(t, 0L)
      if (n <= SampleQueries.Target) assert(k == n, s"small stratum $t must be kept whole")
      else {
        // Bernoulli at rate Target/n: mean Target, sd < 10 — a ±50%
        // band is > 5 sigma, deterministic-safe on the fixed fixture
        assert(k >= SampleQueries.Target / 2 && k <= SampleQueries.Target * 2,
          s"stratum $t sampled $k of $n (target ${SampleQueries.Target})")
      }
    }
    // the sample is a subset of the input ids
    val ids = ev.select("event_id").collect().map(_.getLong(0)).toSet
    assert(sampled.forall(p => ids.contains(p._2)))
  }

  test("negative sampler: output disjoint from positives, collision loss bounded") {
    val positives = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("user"))
      .join(graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey").as("item")),
        col("o_orderkey") === col("l_orderkey"))
      .select("user", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SampleQueries.queries("sample_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // label correctness: no emitted negative is a true positive
    assert(got.forall { case (u, _, _, n) => !positives.contains((u, n)) })
    // every emitted negative is a valid part id
    val nParts = graft.Tables.part(spark, sf).count()
    assert(got.forall { case (_, _, _, n) => n >= 0 && n < nParts })
    // the anti-join only THINS the emit: at most K per anchor, and the
    // collision loss stays under half (sf0.001 observes ~21%, the
    // items-per-user / |parts| fraction the scaladoc predicts)
    val anchors = positives.toSeq.sorted.take(SampleQueries.Anchors)
    assert(got.length <= anchors.size * SampleQueries.K)
    assert(got.length >= anchors.size * SampleQueries.K / 2,
      s"collision loss over 50%: ${got.length} of ${anchors.size * SampleQueries.K}")
    // determinism across partitionings is the sampler's contract —
    // candidates depend only on (user, item, j), never on placement
    val again = SampleQueries.queries("sample_negatives")(spark, sf)
      .repartition(7).orderBy("user", "item", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == got.toSeq)
  }

  test("fingerprint: aggregates equal a driver-side fold over the engine's row hashes") {
    import spark.implicits._
    val hashes = graft.Tables.orders(spark, sf)
      .select(xxhash64(concat_ws("|", col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("h"))
      .as[Long].collect()
    val r = SampleQueries.queries("data_fingerprint")(spark, sf)
      .filter($"tbl" === "orders").collect()(0)
    assert(r.getAs[Long]("n_rows") == hashes.length.toLong)
    assert(r.getAs[Long]("xor_hash") == hashes.reduce(_ ^ _))
    assert(r.getAs[Long]("min_hash") == hashes.min)
    assert(r.getAs[Long]("max_hash") == hashes.max)
    // the detection property: any single-row change flips the checksum
    assert(hashes.reduce(_ ^ _) != hashes.drop(1).reduce(_ ^ _))
  }
}
