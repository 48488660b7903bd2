package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sample_pps_systematic vs a sequential weight-walk replay, plus the
  * scheme's defining invariants: every tick multiple falls inside a
  * selected doc's span, and inclusion count is bounded by the tick
  * count.
  */
class PpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("selection equals the sequential weight walk; ticks all covered") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = docs.map(_._2).sum
    val step = total / SampleQueries.PpsK
    var cum = 0L
    val want = docs.flatMap { case (id, w) =>
      val sel = (cum + w) / step > cum / step
      val tick = (cum + w) / step
      cum += w
      if (sel) Some((id, w, cum - w, tick)) else None
    }
    val got = SampleQueries.queries("sample_pps_systematic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == want.toSeq,
      s"selection differs: got ${got.length} want ${want.length}")
    assert(got.length <= SampleQueries.PpsK)
    // coverage: every multiple t·step (t = 1..total div step) lies in
    // some selected doc's [cum0, cum0 + w) span
    val spans = got.map { case (_, w, c0, _) => (c0, c0 + w) }
    for (t <- 1L to total / step) {
      val m = t * step
      assert(spans.exists { case (a, b) => a < m && m <= b },
        s"tick $t at $m not covered by any selected doc")
    }
  }

  test("ppsBucketWidth puts both prefix axes at ~sqrt(N)") {
    // degenerate corpora never yield a zero width
    assert(SampleQueries.ppsBucketWidth(0L, 0L) == 1L)
    assert(SampleQueries.ppsBucketWidth(1L, 0L) == 1L)
    // dense ids 0..N−1: width and bucket count both within 2× of √N
    // across ten orders of magnitude (the balance property that makes
    // the two-level decomposition hold at 10¹² docs)
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L, 1000000000000L)) {
      val w = SampleQueries.ppsBucketWidth(n, n - 1L)
      val buckets = (n - 1L) / w + 1L
      val r = math.sqrt(n.toDouble)
      assert(w.toDouble >= r / 2 && w.toDouble <= 2 * r,
        s"width $w unbalanced at n=$n")
      assert(buckets.toDouble <= 2 * r, s"$buckets buckets at n=$n")
    }
    // sparse ids: the width scales with the ID RANGE so the bucket
    // COUNT (the single-partition axis) stays ~√N, not range-sized
    val w = SampleQueries.ppsBucketWidth(10000L, 999999L)
    assert(999999L / w + 1L <= 200L, s"sparse bucket count blew up ($w)")
    // hashed ids near Long.MaxValue: the naive (maxId+buckets)/buckets
    // ceil spelling wraps negative here and collapsed the width to 1 —
    // the data-sized bucket table. The floor(m/b)+1 spelling must keep
    // the bucket count on the √N axis.
    val wMax = SampleQueries.ppsBucketWidth(1000000L, Long.MaxValue - 3L)
    assert(wMax > Long.MaxValue / 2000L,
      s"near-MaxValue ids collapsed the width ($wMax)")
    assert((Long.MaxValue - 3L) / wMax + 1L <= 2000L,
      "near-MaxValue bucket count off the sqrt(N) axis")
  }
}
