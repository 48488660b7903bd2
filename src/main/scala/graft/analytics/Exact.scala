package graft.analytics

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Bit-exact cross-engine arithmetic helpers.
  *
  * The driver hash-compares Spark results against a DuckDB oracle.
  * Naive `sum(double)` is order-dependent, and aggregation order differs
  * between engines (and between runs under parallelism), so money
  * aggregates are computed in integer cents: the testdata's money
  * columns carry exactly 2 decimals, hence `round(x*100)` is an exact
  * integer, integer sums are associative, and one final division by a
  * power of ten is a single deterministic IEEE op — identical doubles on
  * both engines regardless of execution order.
  */
object Exact {
  /** 2-decimal double -> exact integer cents. (`round` before `cast`:
    * Spark's double->long cast truncates while DuckDB's rounds, so the
    * cast must only ever see an integral value.) */
  def cents(c: Column): Column = round(c.multiply(100), 0).cast("long")

  /** Exact money sum in cents -> double units. */
  def moneySum(c: Column): Column = sum(cents(c)).divide(100.0)

  /** Exact mean of a 2-decimal money column. */
  def moneyAvg(c: Column): Column =
    sum(cents(c)).divide(100.0).divide(count(lit(1)))

  /** SQL twins (DuckDB dialect) — keep in lockstep with the above. */
  def centsSql(x: String): String = s"CAST(round($x*100) AS BIGINT)"
  def moneySumSql(x: String): String = s"sum(${centsSql(x)})/100.0"
  def moneyAvgSql(x: String): String = s"sum(${centsSql(x)})/100.0/count(*)"

  /** TPC-H revenue = extendedprice·(1−discount) in exact 1e-4 dollar
    * units: cents(price) × (100 − discount basis points) — exact
    * integers, associative under partial agg. ONE source of truth
    * (used by TpchQueries and RelationalQueries in both twins): a
    * change to the cents contract lands everywhere or nowhere. */
  def revE4: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
  val revE4Sql: String =
    s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"

  /** `sum(revE4)` under the momentGuard discipline: the revenue moment
    * is price-scale (~10⁹ in e4 units per row), so any group that
    * scales with the corpus or with one hot entity crosses 2⁶² around
    * 4.6·10⁹ rows — inside the 100 TB design envelope. The bound
    * n·max_cents·100 comes from wrap-proof aggregates computed in the
    * SAME aggregate pass (per group — exactly the granularity the sum
    * overflows at). Schema-bounded groups (per-order: ≤ 7 lineitems by
    * TPC-H construction) stay exempt — see the BENCH_NOTES ledger. */
  def guardedRevE4Sum(s: SparkSession, query: String): Column =
    // coalesce(max, 0): rows whose price is NULL contribute NULL
    // products (never summed), so 0 is a sound stand-in that keeps the
    // bound non-NULL — a NULL bound would trip momentGuard's
    // cannot-prove raise even on groups whose sums are harmless
    momentGuard(s, query, "n*max_cents*100",
      count(lit(1)).cast("double") *
        coalesce(max(cents(col("l_extendedprice"))), lit(0L))
          .cast("double") * lit(100.0))(
      sum(revE4))

  /** 2^62 — the default integer-moment headroom ceiling: every BIGINT
    * moment sum must PROVE (via an a-priori count·max-magnitude bound)
    * that it stays under half of Long range, a factor-2 margin before
    * wraparound. Overridable per session via `graft.momentCeiling`
    * (`MomentGuardSpec` shrinks it on a CLONED session to exercise the
    * loud-failure path on the sf0.001 fixtures). Values ABOVE 2^62 are
    * clamped WITH a logged warning (silent clamping would let an
    * operator believe a raised ceiling took effect): the per-query
    * bound proofs consume the factor-2 margin exactly (e.g. the linreg
    * |n·Σx1y − Σx1Σy| ≤ 2·n²·(x·y)max term), so raising the ceiling
    * would void the no-wraparound proof while the guard still passed.
    */
  val MomentCeiling: Double = 4.611686018427387904e18

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Exact")

  private[graft] def ceiling(s: SparkSession): Double = {
    val conf =
      s.conf.get("graft.momentCeiling", MomentCeiling.toString).toDouble
    if (conf > MomentCeiling) log.warn(
      s"graft.momentCeiling=$conf exceeds 2^62 and is CLAMPED to " +
        f"$MomentCeiling%.4e — the per-query overflow-bound proofs " +
        "consume the remaining factor-2 margin, so a higher ceiling " +
        "would void the no-wraparound guarantee; re-spell the moments " +
        "in DECIMAL(38,0) (StatQueries suite header) instead")
    math.min(conf, MomentCeiling)
  }

  /** Loud runtime guard for the integer-moments discipline.
    *
    * What Spark does without it depends on the ANSI flag: under
    * `spark.sql.ansi.enabled` (Spark 4's default, which every session
    * here runs) an overflowing long multiply/sum throws a GENERIC
    * ARITHMETIC_OVERFLOW naming no query and suggesting try_multiply
    * — the one remedy that would silently corrupt a moment; with ANSI
    * off it wraps silently. The guard upgrades both: its bound is
    * computed in DOUBLE from count/max aggregates that can never
    * overflow, and the 2^62 ceiling sits a factor 2 UNDER Long range,
    * so in the margin band [2^62, 2^63) the guard fires — query name,
    * bound value, escape hatch — while every long product in the plan
    * is still in range (MomentGuardOverflowSpec pins exactly this:
    * guard-first in the margin band, loud-either-way past it, and the
    * same protection holds if a deployment turns ANSI off). The DuckDB
    * oracle twin raises its own Out-of-Range on BIGINT overflow, so no
    * over-the-bound run can ever hash-match by accident. The honest
    * behavior at that scale is a loud failure (MaxBfsRounds precedent):
    * `bound` is the query's a-priori overflow bound — count·|x|max
    * products computed in DOUBLE space from pre-overflow-safe
    * count/max aggregates (never from the possibly-wrapped sums
    * themselves; max and count cannot overflow) — and when it reaches
    * the ceiling the wrapped output column raises instead of
    * returning. Wrap ONE always-selected column per query so column
    * pruning can never drop the check; on the pass path the value is
    * returned untouched, so the oracle hash is unaffected. The message
    * names the escape hatch: re-spell the moments in DECIMAL(38,0)
    * (same plan shape, same oracle trick — suite header of
    * StatQueries) when a run legitimately needs the scale.
    */
  def momentGuard(s: SparkSession, query: String, what: String,
      bound: Column)(value: Column): Column = {
    val c = ceiling(s)
    // a NULL bound (a max() aggregate over all-NULL inputs) must not
    // silently DISABLE the guard — when(NULL >= c) would fall through
    // to .otherwise and the unproven value would flow out. If the
    // guarded value itself is NULL there is nothing to corrupt (the
    // empty-corpus case); otherwise a NULL bound means "safety not
    // provable" and the honest behavior is the same loud raise.
    when(bound.isNull && value.isNotNull, raise_error(lit(
      s"$query: BIGINT moment guard bound ($what) is NULL — overflow " +
        "safety cannot be proven for a non-NULL result; coalesce the " +
        "bound's aggregates or re-spell the moments in DECIMAL(38,0)")))
      .when(bound >= lit(c), raise_error(concat(
        lit(s"$query: BIGINT moment headroom exceeded — $what reaches "),
        bound.cast("string"),
        lit(f" >= ceiling $c%.4e; re-spell the moments in DECIMAL(38,0) " +
          "(StatQueries suite header) before running at this scale"))))
      .otherwise(value)
  }
}
