package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import ExtendedQueries.WeightedPriceAvg

/** The typed-Aggregator overflow contract: Aggregator arithmetic runs
  * on raw JVM longs that Catalyst's ANSI checks never see, so the
  * accumulation sites must fail LOUDLY via addExact/multiplyExact —
  * a silent wrap here would return a corrupted weighted mean where
  * every other moment sum in the engine aborts with a named error.
  */
class WeightedPriceAvgSpec extends AnyFunSuite {

  test("reduce/merge accumulate exactly and finish divides once") {
    val b = WeightedPriceAvg.reduce(
      WeightedPriceAvg.reduce(WeightedPriceAvg.zero, (10.50, 2.0)),
      (3.25, 4.0))
    assert(b == (1050L * 2 + 325L * 4, 6.0))
    assert(WeightedPriceAvg.finish(b) == (2100 + 1300) / 100.0 / 6.0)
    assert(WeightedPriceAvg.finish(WeightedPriceAvg.zero) == 0.0)
    assert(WeightedPriceAvg.merge((5L, 1.0), (7L, 2.0)) == (12L, 3.0))
  }

  test("overflow raises a query-named ArithmeticException, never wraps") {
    val near = (Long.MaxValue - 10L, 1.0)
    val eReduce = intercept[ArithmeticException] {
      WeightedPriceAvg.reduce(near, (100.0, 5.0)) // +50000 cents·qty
    }
    assert(eReduce.getMessage.contains("udaf_weighted_price"))
    assert(eReduce.getMessage.contains("DECIMAL(38,0)"))
    val eMerge = intercept[ArithmeticException] {
      WeightedPriceAvg.merge(near, (100L, 1.0))
    }
    assert(eMerge.getMessage.contains("udaf_weighted_price"))
    // multiply site: a single gigantic cents·qty product
    val eMul = intercept[ArithmeticException] {
      WeightedPriceAvg.reduce(WeightedPriceAvg.zero, (9.0e16, 9.0e16))
    }
    assert(eMul.getMessage.contains("udaf_weighted_price"))
  }
}
