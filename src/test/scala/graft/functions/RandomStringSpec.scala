package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** O36 `util.randomString` (`lib/util.js:33-47`) via the builtin
  * `randstr`: alphabet-exactness, lengths (incl. the reference's
  * abs-of-negative quirk), statistical uniqueness, and the seeded
  * determinism contract. */
class RandomStringSpec extends SparkSpec {

  private def ids(n: Long, c: org.apache.spark.sql.Column) =
    spark.range(n).repartition(8).select(c.as("rid"))

  test("ids draw from exactly the reference's 62-char alnum alphabet") {
    val got = ids(2000, RandomId.randomString())
      .collect().map(_.getString(0))
    val seen = got.flatMap(_.toSeq).toSet
    assert(seen.subsetOf(RandomId.Alphabet),
      s"out-of-alphabet chars: ${seen -- RandomId.Alphabet}")
    // 2000 ids × 16 chars = 32k draws over 62 symbols: every symbol
    // is seen with overwhelming probability — a biased or truncated
    // alphabet (e.g. hex-only) fails here
    assert(seen.size == RandomId.Alphabet.size,
      s"only ${seen.size}/62 alphabet chars seen in 32k draws")
  }

  test("length: default 16, explicit length honored, negative length absolute-valued (lib/util.js:36)") {
    assert(ids(50, RandomId.randomString())
      .collect().forall(_.getString(0).length == 16))
    assert(ids(50, RandomId.randomString(5))
      .collect().forall(_.getString(0).length == 5))
    assert(ids(50, RandomId.randomString(-7))
      .collect().forall(_.getString(0).length == 7))
  }

  test("10k default-length ids are pairwise distinct (62^16 space)") {
    val n = ids(10000, RandomId.randomString())
      .agg(countDistinct("rid")).collect()(0).getLong(0)
    assert(n == 10000L, s"collision among 10k ids: $n distinct")
  }

  test("a supplied seed makes minting reproducible; omitting it does not") {
    def run(seed: Option[Long]) =
      spark.range(1000).repartition(4, col("id"))
        .select(col("id"), RandomId.randomString(16, seed).as("rid"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(run(Some(7L)).sameElements(run(Some(7L))),
      "same seed + same partitioning must reproduce ids")
    assert(!run(None).sameElements(run(None)),
      "unseeded minting must produce fresh ids per run")
  }
}
