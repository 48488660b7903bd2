package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Exact._

/** Second relational wave: pivot, generators (explode), the SQL entry
  * point (scalar subqueries through `spark.sql`), and a custom typed
  * `Aggregator` UDAF — the extension surface beyond built-ins.
  */
object ExtendedQueries extends QuerySuite {

  /** dq_rate_limit_audit's per-principal-day simulation bound: the
    * fold buffer holds at most this many (ms, event_id) pairs (~2 MB)
    * no matter how hot the principal. The audit's CONTRACT above the
    * cap: n_allowed/n_denied describe the day's FIRST MaxAuditEvents
    * events only — a positionally-truncated event is not classified
    * (it could be one the true simulation would admit, e.g. a
    * lone late event after a fully-refilled gap), it is COUNTED in
    * n_truncated so the truncation is visible, never silent. Chosen
    * above the bucket's hard per-day admission ceiling (capacity/cost
    * + 86.4e6 ms · refill/cost ≈ 86 405) so the admit-side count can
    * never saturate the window. Same constant inlined in the oracle
    * twin, so both engines audit the identical prefix. */
  val MaxAuditEvents = 131072

  /** Exact quantity-weighted mean price as a typed Aggregator:
    * buffer = (Σ cents(price)·qty, Σ qty) — both exact integers-in-long
    * /integral-double, so the single final division is deterministic.
    * Demonstrates the UDAF path (partial merge comes from Catalyst).
    *
    * Overflow honesty: typed-Aggregator arithmetic runs on RAW JVM
    * longs — Catalyst's ANSI overflow checks never see it, so plain
    * `+`/`*` would WRAP silently where every other moment sum in the
    * engine aborts loudly. All three accumulation sites use
    * addExact/multiplyExact instead: past ~1.8·10¹⁰ rows per brand
    * (Σ cents·qty ≈ 5·10⁸ per row) the query dies with an
    * ArithmeticException naming this aggregator, never returns a
    * corrupted mean. DECIMAL(38,0) buffer is the headroom escape
    * hatch (see BENCH_NOTES integer-headroom ledger). */
  object WeightedPriceAvg extends Aggregator[(Double, Double), (Long, Double), Double] {
    private def loud(op: => Long): Long =
      try op catch {
        case _: ArithmeticException => throw new ArithmeticException(
          "WeightedPriceAvg (udaf_weighted_price): Σ cents·qty overflowed " +
            "Long — re-spell the buffer as DECIMAL(38,0) for more headroom")
      }
    def zero: (Long, Double) = (0L, 0.0)
    def reduce(b: (Long, Double), in: (Double, Double)): (Long, Double) = {
      val cents = math.round(in._1 * 100)
      (loud(Math.addExact(b._1, Math.multiplyExact(cents, math.round(in._2)))),
        b._2 + in._2)
    }
    def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (loud(Math.addExact(a._1, b._1)), a._2 + b._2)
    def finish(b: (Long, Double)): Double =
      if (b._2 == 0) 0.0 else b._1 / 100.0 / b._2
    def bufferEncoder = Encoders.product[(Long, Double)]
    def outputEncoder = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pivot: customer count per (nation × market segment) — one column
    // per segment, stable column set pinned explicitly.
    "pivot_segment_counts" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("n_name")),

    // Generator / lateral view: explode document words (posexplode
    // exercises the positional generator), then corpus-wide top-20
    // word frequencies.
    "explode_word_freq" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "word")))
        .groupBy("word")
        .agg(count(lit(1)).as("n"),
          countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("first_doc"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)),

    // SQL entry point + scalar subquery: parts above the global exact
    // mean price, through spark.sql (the engine's SQL API surface).
    "sql_scalar_subquery" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql(s"""
        SELECT p_partkey, p_retailprice
        FROM part_v
        WHERE p_retailprice >
          (SELECT sum(cast(round(p_retailprice*100) as bigint))/100.0/count(*)
           FROM part_v)
        ORDER BY p_partkey""")
    }),

    // IN / NOT IN subqueries through SQL.
    "sql_in_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_v
        WHERE c_custkey IN (SELECT o_custkey FROM orders_v
                            WHERE o_orderpriority = '1-URGENT')
          AND c_custkey NOT IN (SELECT o_custkey FROM orders_v
                                WHERE o_orderstatus = 'F')
        ORDER BY c_custkey""")
    }),

    // Upsert compaction (CDC latest-state snapshot): collapse each
    // user's event stream to its most recent row — the keep-last
    // MERGE/compaction semantics of a mutable-table sync, expressed as
    // one window rank. One shuffle on the key; at 100 TB this is the
    // standard periodic compaction job over a change log.
    "cdc_latest_state" -> ((s, d) => {
      val latest = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rk", row_number().over(latest))
        .filter(col("rk") === 1)
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("last_ts"),
          col("event_type").as("last_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }),

    // SCD type-2 history compaction from a CDC event stream: collapse
    // consecutive identical states per key, then assign each surviving
    // state-change row its validity interval [valid_from, valid_to) via
    // lead(); the open interval marks the current state. Two window
    // passes over the same (user_id | ts, event_id) partitioning — one
    // shuffle, second window reuses the sort. The warehouse-standard
    // "latest + history" shape next to cdc_latest_state's type-1 view.
    "cdc_scd2_history" -> ((s, d) => {
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changed = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byKey))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      changed
        .withColumn("valid_from", unix_timestamp(col("ts")))
        .withColumn("valid_to", lead(unix_timestamp(col("ts")), 1).over(byKey))
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "event_id")
    }),

    // POINT-IN-TIME enrichment (the feature-store staple that
    // prevents label leakage): each click is joined to the SCD2 state
    // that was valid AT its instant — never a later one. The change
    // log here derives from the SAME event stream, so no union or
    // interval join is needed at all: ONE window pass computes the
    // change flag (lag) and the last-change carry-forward
    // (last ignoreNulls) over the identical (user_id | ts, event_id)
    // partitioning — one shuffle total, and a click that is itself a
    // state change sees its own new state because its change marker
    // rides the same row.
    "cdc_point_in_time" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val carry = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("chg_state",
          when(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"), col("event_type")))
        .withColumn("state_at",
          last(col("chg_state"), ignoreNulls = true).over(carry))
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("t_s"), col("state_at"))
        .orderBy("user_id", "event_id")
    }),

    // SNAPSHOT DIFF — the change-feed primitive between two points in
    // time: reconstruct the keep-last state at T1 and at T2 (the same
    // window compaction as cdc_latest_state) and full-outer join them
    // on the key; a key only in T2 is an INSERT, a changed row an
    // UPDATE, a key only in T1 a DELETE (structurally present; this
    // append-only fixture produces none), identical rows drop out.
    // Two compactions + one key-partitioned join — the incremental
    // MERGE feed a warehouse sync consumes.
    "cdc_snapshot_diff" -> ((s, d) => {
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      def latestState(df: DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        df.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("state"),
            cents(col("value")).as("v_cents"))
      }
      val ev = Tables.events(s, d)
      // explicit presence flags + null-safe compares: a NULL latest
      // value must read as an update, never as an absent key, and a
      // NULL-to-value change must not vanish into three-valued logic
      val t1 = latestState(ev.filter(col("ts") < cutoff))
        .select(col("user_id"), col("state").as("state_1"),
          col("v_cents").as("v_1"), lit(true).as("in_1"))
      val t2 = latestState(ev)
        .select(col("user_id"), col("state").as("state_2"),
          col("v_cents").as("v_2"), lit(true).as("in_2"))
      t1.join(t2, Seq("user_id"), "full_outer")
        .withColumn("op",
          when(coalesce(col("in_1"), lit(false)) === false, "insert")
            .when(coalesce(col("in_2"), lit(false)) === false, "delete")
            .when(!(col("state_1") <=> col("state_2")) ||
              !(col("v_1") <=> col("v_2")), "update"))
        .filter(col("op").isNotNull)
        .select(col("op"), col("user_id"),
          col("state_1"), col("v_1"), col("state_2"), col("v_2"))
        .orderBy("user_id")
    }),

    // EXISTS / NOT EXISTS correlated subqueries through SQL — the
    // remaining subquery flavor next to scalar and IN; Catalyst
    // rewrites both to semi/anti joins.
    "sql_exists_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_ex")
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders_ex o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        ORDER BY c_custkey""")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): build the complete
    // month spine between the first and last order date by recursion,
    // then left-join order counts — months with zero orders appear
    // with 0, which the plain GROUP BY of date_orders_by_month cannot
    // produce. The recursion depth is bounded by the calendar span
    // (~80 iterations on a tiny 1-row-per-step frame), not data size.
    "sql_recursive_spine" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_rc")
      // Bound the recursion with PRE-COMPUTED literals: a scalar
      // subquery in the recursive member is re-executed by every
      // UnionLoop iteration (~2 full orders scans per generated month —
      // 27 s at sf0.1 vs 3 s with literals). One 1-row aggregate up
      // front is the dynamic-SQL idiom for loop bounds; results are
      // identical and the oracle keeps the self-contained subqueries.
      val bounds = s.sql(
        """SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
          |  CAST(date_trunc('month', max(o_orderdate)) AS DATE)
          |FROM orders_rc""".stripMargin).collect()(0)
      // empty orders: the oracle's recursive anchor still emits one
      // NULL-month row that survives the LEFT JOIN as (NULL, 0) —
      // mirror it exactly
      if (bounds.isNullAt(0))
        s.sql("""SELECT CAST(NULL AS STRING) AS month,
          CAST(0 AS BIGINT) AS n_orders""")
      else s.sql(s"""
        WITH RECURSIVE m(mon) AS (
          SELECT DATE'${bounds.getDate(0)}'
          UNION ALL
          SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM m
          WHERE mon < DATE'${bounds.getDate(1)}')
        SELECT date_format(mon, 'yyyy-MM') AS month,
          count(o.o_orderkey) AS n_orders
        FROM m LEFT JOIN orders_rc o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mon
        GROUP BY mon ORDER BY month""")
    }),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    // top-2 orders per customer as a lateral join (the SQL-standard
    // spelling of the window-rank top-k; Catalyst rewrites it to a
    // DomainJoin + windowed filter).
    "sql_lateral_topn" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lt")
      Tables.orders(s, d).createOrReplaceTempView("orders_lt")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lt c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lt o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),

    // Explicit GROUPING SETS with grouping indicators (beyond
    // rollup/cube): per-(status,priority), per-status, grand total.
    "sql_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST, g_status, g_prio""")
    }),

    // Edit-distance + translation string functions (fuzzy-matching
    // family the dedup pipeline leans on for short fields).
    "string_distance_suite" -> ((s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey").cast("long").as("nationkey"),
        levenshtein(col("n_name"), lit("NATION_1")).cast("long").as("lev_to_n1"),
        translate(col("n_name"), "_0123456789", "-").as("name_dashed"),
        concat(col("n_name"), lit(":"), repeat(lit("*"), 3)).as("starred"),
        ascii(col("n_name")).cast("long").as("first_byte"))
        .orderBy("nationkey")),

    // Exact discrete percentiles (p50/p90/p99) of order value per
    // status, via rank selection over the VALUE-COUNT table with the
    // two-level bucketed prefix sum (the layout_equidepth_hist
    // discipline) — element SELECTION from the sorted multiset
    // involves no float interpolation, so both engines agree
    // bit-exactly. The old spelling windowed raw rows PARTITION BY
    // status (~3 keys): a data-sized single-partition exchange at
    // 100 TB. Here the windows run over the (status, value)-count
    // table, bucketed by tp div 1000 so every window partition is
    // within-bucket (bounded) or over bucket bases (1000× smaller).
    // The pick is the pure-integer compare cum·100 ≥ n·p100 — the
    // smallest value whose cumulative count reaches ceil(p·n).
    // NULL prices are excluded in BOTH twins (Spark windows sort
    // NULLS FIRST, DuckDB NULLS LAST — a NULL row would shift every
    // rank differently per engine).
    "agg_percentiles_disc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val vc = Tables.orders(s, d)
        .filter(col("o_totalprice").isNotNull)
        .select(col("o_orderstatus").as("status"),
          cents(col("o_totalprice")).as("tp"))
        .groupBy("status", "tp").agg(count(lit(1)).as("c"))
        .withColumn("b", expr("tp div 1000L"))
      val bases = vc.groupBy("status", "b").agg(sum("c").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("status").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("status", "b", "base")
      val cum = vc.join(broadcast(bases), Seq("status", "b"))
        .withColumn("cum", col("base") + sum("c").over(
          Window.partitionBy("status", "b").orderBy("tp")))
      val n = vc.groupBy("status").agg(sum("c").as("n"))
      def pick(p100: Long, name: String) =
        (min(when(col("cum") * 100L >= col("n") * p100, col("tp")))
          / 100.0).as(name)
      cum.join(broadcast(n), "status")
        .groupBy("status")
        .agg(max("n").as("n_orders"),
          pick(50L, "p50"), pick(90L, "p90"), pick(99L, "p99"))
        .orderBy("status")
    }),

    // Data-quality assertion report (Deequ-style): each rule reduces a
    // table scan to ONE violation count — referential integrity is an
    // anti-join against the (broadcast-sized) key side, uniqueness a
    // groupBy-count, range/null checks map-side filters. The union of
    // 1-row aggregates costs one pass per table; at 100 TB a real run
    // fuses same-table rules into one scan, exactly as written here
    // for the two orders rules.
    "dq_violation_report" -> ((s, d) => {
      def rule(n: Int, name: String, cnt: DataFrame) =
        cnt.select(lit(n.toLong).as("rule_id"), lit(name).as("rule"),
          col("n").as("n_violations"))
      val orphanOrders = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
      val ordersBad = Tables.orders(s, d)
        .agg(coalesce(sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)), lit(0L)).as("n"))
      val qtyRange = Tables.lineitem(s, d)
        .agg(coalesce(sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)), lit(0L)).as("n"))
      val dupCust = Tables.customer(s, d)
        .groupBy("c_custkey").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, col("c") - 1).otherwise(0L)), lit(0L)).as("n"))
      val negValues = Tables.events(s, d)
        .agg(coalesce(sum(when(col("value") < 0, 1L).otherwise(0L)), lit(0L)).as("n"))
      val emptyDocs = Tables.documents(s, d)
        .agg(coalesce(sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)), lit(0L)).as("n"))
      rule(1, "orders_fk_customer", orphanOrders)
        .union(rule(2, "orders_price_positive", ordersBad))
        .union(rule(3, "lineitem_qty_1_50", qtyRange))
        .union(rule(4, "customer_key_unique", dupCust))
        .union(rule(5, "events_value_nonneg", negValues))
        .union(rule(6, "documents_text_nonempty", emptyDocs))
        .orderBy("rule_id")
    }),

    // DEAD-LETTER SPLIT — the quarantine channel an ingest pipeline
    // runs on semi-structured payloads: parse with an explicit schema
    // in PERMISSIVE mode (the SURVEY O1 envelope-parse mapping) and
    // route rows whose payload fails to parse into a dead-letter leg
    // carrying the raw payload for replay, instead of dropping or
    // poisoning the batch. Corruption is PLANTED deterministically
    // (event_id % 97 → payload truncated) so both engines derive the
    // same corrupt set at any sf; good rows surface the extracted
    // field, dead rows surface reason + raw. Map-only — the split is
    // a projection, no shuffle until the final presentation sort.
    "dq_dead_letter_split" -> ((s, d) => {
      val corrupted = when(col("event_id") % 97 === 0,
        substring(col("props"), 1, 3)).otherwise(col("props"))
      Tables.events(s, d)
        .select(col("event_id"), corrupted.as("payload"))
        .select(col("event_id"), col("payload"),
          from_json(col("payload"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
        .select(col("event_id"),
          when(col("k").isNotNull, "ok").otherwise("dead_letter")
            .as("status"),
          col("k"),
          when(col("k").isNull, col("payload")).as("raw_payload"))
        .orderBy("event_id")
    }),

    // JOIN-KEY SKEW diagnostics — the audit a 100 TB pipeline runs
    // before shipping a shuffle join: per candidate key column, the
    // distinct-key count, total rows, the hottest key and its row
    // count, and a 100×-scaled mean (all integers). A max/avg ratio
    // far above 1 is the salting/AQE-skew-split trigger
    // (join_salted_skew is the treatment; this is the diagnosis).
    // ONE table scan and ONE keys-space aggregate per column: the
    // hottest key rides the same pass as a deterministic struct-max —
    // (n, -k) orders by count then lower key, so ties break exactly
    // like the oracle's min(k)-among-argmax.
    // Token-bucket quota audit — the BATCH twin of
    // streaming.RateLimitStream (same constants, same event-time
    // refill, same (ts, id) processing order), replayed per (user,
    // DAY): how many events would the admission gate have passed?
    // The fold is a sequential recurrence, so it runs as an
    // `aggregate` HOF over the (user, day) event list — bounded by a
    // principal's daily activity, the natural partition for a quota
    // audit (state resets at midnight; at 100 TB this is one
    // day-partition scan). The oracle replays the identical fold via
    // DuckDB list_reduce (first-element-init convention — the mapped
    // first element IS the post-first-event state, since a full
    // bucket always admits the first event). RateLimitStreamSpec pins
    // this twin event-for-event against the streaming processor.
    "dq_rate_limit_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cap = graft.streaming.RateLimitStream.CapacityMilli
      val cost = graft.streaming.RateLimitStream.CostMilli
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 1000").as("ms"), col("event_id"))
        .withColumn("day", expr("ms div 86400000"))
      // bound the fold buffer: a hot principal's day — precisely the
      // client this audit hunts — would otherwise collect unbounded
      // into ONE aggregation buffer. The audit simulates each
      // principal-day's FIRST MaxAuditEvents events (deterministic
      // (ms, event_id) order; the rank window spills gracefully where
      // an array buffer OOMs) and reports what it skipped as
      // n_truncated, so the cap is observable, never silent. Same cap
      // in the oracle twin — hash-neutral below the cap at any sf.
      val ranked = ev.withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "day").orderBy("ms", "event_id")))
      val truncated = ranked.filter(col("rn") > MaxAuditEvents)
        .groupBy("day").agg(count(lit(1)).as("n_truncated"))
      ranked.filter(col("rn") <= MaxAuditEvents)
        .groupBy("user_id", "day")
        .agg(sort_array(collect_list(
          struct(col("ms"), col("event_id")))).as("arr"))
        .select(col("day"), expr("CAST(size(arr) AS BIGINT)").as("n"),
          expr(
            s"""aggregate(
               |  slice(arr, 2, greatest(size(arr) - 1, 0)),
               |  named_struct(
               |    'tok', CAST(${cap - cost} AS BIGINT),
               |    'last', arr[0].ms,
               |    'allowed', CAST(1 AS BIGINT)),
               |  (acc, x) -> named_struct(
               |    'tok', CASE WHEN least(CAST($cap AS BIGINT),
               |        acc.tok + greatest(CAST(0 AS BIGINT),
               |          x.ms - acc.last)) >= $cost
               |      THEN least(CAST($cap AS BIGINT),
               |        acc.tok + greatest(CAST(0 AS BIGINT),
               |          x.ms - acc.last)) - $cost
               |      ELSE least(CAST($cap AS BIGINT),
               |        acc.tok + greatest(CAST(0 AS BIGINT),
               |          x.ms - acc.last)) END,
               |    'last', greatest(acc.last, x.ms),
               |    'allowed', acc.allowed +
               |      CASE WHEN least(CAST($cap AS BIGINT),
               |          acc.tok + greatest(CAST(0 AS BIGINT),
               |            x.ms - acc.last)) >= $cost
               |        THEN CAST(1 AS BIGINT)
               |        ELSE CAST(0 AS BIGINT) END)
               |).allowed""".stripMargin).as("allowed"))
        .groupBy("day").agg(
          sum("n").as("n_events"),
          sum("allowed").as("n_allowed"),
          (sum("n") - sum("allowed")).as("n_denied"))
        .join(truncated, Seq("day"), "left")
        .withColumn("n_truncated", coalesce(col("n_truncated"), lit(0L)))
        .orderBy("day")
    }),

    // Sequence-gap audit — the ingest-completeness check on a
    // monotonically-assigned id column: bucket the id space into
    // fixed-width ranges and report, per bucket, ids present vs the
    // bucket's covered span (max−min+1) — a bucket whose present
    // count falls short has holes (dropped ingest batches, failed
    // writes). One scan, one keyed aggregate over bucket ids —
    // bounded by id-space/width, never row count. The ids are assumed
    // unique (dq_uniqueness_report audits that separately).
    "dq_sequence_gaps" -> ((s, d) => {
      Tables.events(s, d)
        .select(expr("event_id div 10000").as("bucket"), col("event_id"))
        .groupBy("bucket").agg(
          count(lit(1)).as("n_present"),
          min("event_id").as("lo"), max("event_id").as("hi"))
        .select(col("bucket"), col("n_present"), col("lo"), col("hi"),
          (col("hi") - col("lo") + 1L - col("n_present")).as("n_missing"))
        .orderBy("bucket")
    }),

    "dq_key_skew" -> ((s, d) => {
      def skewOf(df: DataFrame, keyCol: String, label: String) = {
        // NULL keys are a referential-integrity concern
        // (dq_violation_report), not a skew one — and a null key would
        // make the (n, −k) struct-max incomparable
        val counts = df.filter(col(keyCol).isNotNull)
          .groupBy(col(keyCol).as("k"))
          .agg(count(lit(1)).as("n"))
        counts.agg(count(lit(1)).as("n_keys"),
            sum("n").as("n_total"),
            max(struct(col("n"), (lit(0L) - col("k")).as("negk"))).as("top"))
          .select(lit(label).as("key_col"), col("n_keys"), col("n_total"),
            // max_n IS the struct-max's first field — one source of truth
            col("top.n").as("max_n"), (lit(0L) - col("top.negk")).as("top_key"),
            expr("(100 * n_total) div n_keys").as("avg_x100"))
      }
      skewOf(Tables.lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
        .union(skewOf(Tables.events(s, d), "user_id", "events.user_id"))
        .union(skewOf(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
        .orderBy("key_col")
    }),

    // k-ANONYMITY audit — the privacy-governance counterpart of the
    // Deequ rules: for each quasi-identifier set, how many QID groups
    // (and rows) fall below k=5 — the re-identification risk a
    // release gate checks before data leaves the pipeline (Sweeney,
    // IJUFKS'02). Scale shape: one groupBy per QID set
    // (map-side-combined), then a 1-row aggregate over the
    // group-count-sized table — the fact tables are scanned once
    // each, nothing row-sized survives past the first aggregate.
    "dq_k_anonymity" -> ((s, d) => {
      val k = 5L
      def audit(df: DataFrame, qids: Seq[Column], label: String) =
        df.groupBy(qids: _*).agg(count(lit(1)).as("n"))
          .agg(coalesce(sum("n"), lit(0L)).as("n_rows"),
            count(lit(1)).as("n_groups"), min("n").as("min_group"),
            coalesce(sum(when(col("n") < k, 1L).otherwise(0L)), lit(0L))
              .as("n_groups_lt_k"),
            coalesce(sum(when(col("n") < k, col("n")).otherwise(0L)), lit(0L))
              .as("n_rows_lt_k"))
          .select(lit(label).as("qid_set"), col("n_rows"), col("n_groups"),
            col("min_group"), col("n_groups_lt_k"), col("n_rows_lt_k"))
      audit(Tables.customer(s, d),
          Seq(col("c_nationkey"), col("c_mktsegment")),
          "customer(nation,segment)")
        .union(audit(Tables.orders(s, d),
          Seq(col("o_orderstatus"), col("o_orderpriority"),
            year(col("o_orderdate"))),
          "orders(status,priority,year)"))
        .orderBy("qid_set")
    }),

    // Distinct l-diversity audit (Machanavajjhala et al., ICDE'06) —
    // the k-anonymity companion: group size alone doesn't stop
    // attribute disclosure when everyone in a quasi-identifier group
    // SHARES the sensitive value, so measure the minimum number of
    // DISTINCT sensitive values per QID group. Two audited
    // (QID set → sensitive) pairs; same shape as dq_k_anonymity — one
    // keyed aggregate to the group table, one census row per audit,
    // nothing data-sized downstream.
    "dq_l_diversity" -> ((s, d) => {
      val l = 3L
      def audit(df: DataFrame, qids: Seq[Column], sensitive: Column,
          label: String) =
        df.groupBy(qids: _*)
          .agg(countDistinct(sensitive).as("lv"), count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_groups"),
            min("lv").as("min_l"),
            coalesce(sum(when(col("lv") < l, 1L).otherwise(0L)), lit(0L))
              .as("n_groups_lt_l"),
            coalesce(sum(when(col("lv") < l, col("n")).otherwise(0L)),
              lit(0L)).as("n_rows_lt_l"))
          .select(lit(label).as("audit"), col("n_groups"), col("min_l"),
            col("n_groups_lt_l"), col("n_rows_lt_l"))
      audit(Tables.customer(s, d),
          Seq(col("c_nationkey")), col("c_mktsegment"),
          "customer(nation)->segment")
        .union(audit(Tables.orders(s, d),
          Seq(col("o_orderstatus"), year(col("o_orderdate"))),
          col("o_orderpriority"), "orders(status,year)->priority"))
        .orderBy("audit")
    }),

    // Wide→long reshaping: pivot order counts to one column per
    // status, then melt back with `unpivot` — the reshape pair every
    // reporting layer needs. Null cells (combinations absent from the
    // data) are dropped on the way back, so the round-trip is exactly
    // the plain long-format aggregate the oracle computes.
    "pivot_unpivot_roundtrip" -> ((s, d) => {
      // values-less pivot derives the status domain from the data (one
      // small distinct job), so an unexpected status can never be
      // silently dropped from the round-trip. NULL statuses are
      // excluded up front on BOTH engines: pivot would stringify a
      // NULL into a column literally named "null", which cannot
      // round-trip back to SQL NULL.
      val wide = Tables.orders(s, d)
        .filter(col("o_orderstatus").isNotNull)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus")
        .agg(count(lit(1)))
      val statusCols = wide.columns.filter(_ != "o_orderpriority")
      if (statusCols.isEmpty) // empty table: nothing to reshape
        Tables.orders(s, d).select(col("o_orderpriority"),
          col("o_orderstatus"), lit(0L).as("n_orders")).limit(0)
      else wide.unpivot(Array(col("o_orderpriority")),
          statusCols.map(col), "o_orderstatus", "n_orders")
        .filter(col("n_orders").isNotNull)
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // Equi-width histogram: fixed $25 buckets over event values — the
    // one-pass distribution profile (each bucket a single partial-agg
    // group; at scale a map-side combine ships ~n_buckets rows per
    // partition). The bucket id is one IEEE divide + floor, identical
    // on both engines; min/max are exact picks, the sum uses the
    // integer-cents contract.
    "agg_value_histogram" -> ((s, d) =>
      Tables.events(s, d)
        // a NULL value would form a NULL bucket row that Spark's
        // orderBy places first and DuckDB's last — excluded in BOTH
        // twins (hash-neutral on the NULL-free fixtures)
        .filter(col("value").isNotNull)
        .withColumn("bucket", floor(col("value") / 25.0).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"),
          min("value").as("min_value"), max("value").as("max_value"),
          (sum(cents(col("value"))) / 100.0).as("total_value"))
        .orderBy("bucket")),

    // Custom typed Aggregator UDAF: exact weighted mean price per brand.
    "udaf_weighted_price" -> ((s, d) => {
      val wavg = udaf(WeightedPriceAvg)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // Benford first-digit audit (Newcomb 1881 / Benford 1938; the
    // fabricated-data test fraud and DQ teams actually run): the
    // leading significant digit of organically-grown positive amounts
    // follows log10(1+1/d); a synthetic or truncated feed bulges at
    // specific digits. This is the TEST companion to the
    // stat_benford_digits CENSUS (ProfileQueries — global digit
    // shares of order totals, no expectation): here each EVENT TYPE's
    // 9-digit grid is scored against the Benford expectation with a
    // per-digit deviation, localizing which segment's values look
    // fabricated. Everything in exact integer ppm. The first
    // digit comes from the INTEGER cents value's decimal string —
    // substr(cast(xc)) is engine-exact where any log10/pow spelling
    // would hit libm variance ([[InsightQueries]] stance); the
    // Benford ppm constants are computed ONCE driver-side and inlined
    // as the same literals into both twins. Scale shape: one fact
    // aggregate to the ≤ 9·|types| census, a broadcast 9-row spine, a
    // types-sized total join; the full digit grid is emitted (a digit
    // with zero observations is a FINDING, not an absent row).
    // Headroom: n_obs·10⁶ needs n_obs < 4.6·10¹² per type — a
    // count-only bound, corpus-visible (BENCH_NOTES ledger).
    "dq_benford" -> ((s, d) => {
      import s.implicits._
      val bdf = (1 to 9).map(dd => (dd.toLong,
        math.round(math.log10(1.0 + 1.0 / dd) * 1e6)))
        .toDF("digit", "benford_ppm")
      val census = Tables.events(s, d)
        .select(col("event_type"), cents(col("value")).as("xc"))
        .filter(col("xc") > 0L)
        .select(col("event_type"),
          substring(col("xc").cast("string"), 1, 1).cast("long")
            .as("digit"))
        .groupBy("event_type", "digit").agg(count(lit(1)).as("n_obs"))
      val tot = census.groupBy("event_type").agg(sum("n_obs").as("n_total"))
      tot.crossJoin(broadcast(bdf))
        .join(census, Seq("event_type", "digit"), "left")
        .select(col("event_type"), col("digit"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("n_total"),
          expr("coalesce(n_obs, 0L) * 1000000L div n_total").as("obs_ppm"),
          col("benford_ppm"),
          abs(expr("coalesce(n_obs, 0L) * 1000000L div n_total") -
            col("benford_ppm")).as("dev_ppm"))
        .orderBy("event_type", "digit")
    }))

  def oracles: Map[String, String] = Map(
    "dq_benford" -> {
      // the same driver-side Benford constants, inlined as literals
      val spine = (1 to 9).map(dd =>
        s"(CAST($dd AS BIGINT), CAST(${
          math.round(math.log10(1.0 + 1.0 / dd) * 1e6)} AS BIGINT))")
        .mkString(", ")
      s"""WITH dg AS (
         |  SELECT event_type,
         |    CAST(substr(CAST(${Exact.centsSql("\"value\"")} AS VARCHAR),
         |      1, 1) AS BIGINT) AS digit
         |  FROM events WHERE ${Exact.centsSql("\"value\"")} > 0),
         |census AS (
         |  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_obs
         |  FROM dg GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n_total
         |  FROM census GROUP BY 1),
         |spine(digit, benford_ppm) AS (VALUES $spine),
         |grid AS (
         |  SELECT t.event_type, t.n_total, s.digit, s.benford_ppm
         |  FROM tot t CROSS JOIN spine s)
         |SELECT g.event_type, g.digit,
         |  CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs, g.n_total,
         |  CAST(coalesce(c.n_obs, 0) * 1000000 // g.n_total AS BIGINT)
         |    AS obs_ppm,
         |  g.benford_ppm,
         |  CAST(abs(coalesce(c.n_obs, 0) * 1000000 // g.n_total
         |    - g.benford_ppm) AS BIGINT) AS dev_ppm
         |FROM grid g LEFT JOIN census c
         |  ON c.event_type = g.event_type AND c.digit = g.digit
         |ORDER BY g.event_type, g.digit""".stripMargin
    },

    "dq_dead_letter_split" ->
      """WITH p AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 3)
        |         ELSE props END AS payload
        |  FROM events),
        |x AS (
        |  SELECT event_id, payload,
        |    CASE WHEN json_valid(payload)
        |         THEN CAST(json_extract_string(payload, '$.k') AS BIGINT)
        |    END AS k
        |  FROM p)
        |SELECT event_id,
        |  CASE WHEN k IS NOT NULL THEN 'ok' ELSE 'dead_letter' END AS status,
        |  k,
        |  CASE WHEN k IS NULL THEN payload END AS raw_payload
        |FROM x ORDER BY event_id""".stripMargin,

    "dq_violation_report" ->
      """SELECT CAST(1 AS BIGINT) AS rule_id, 'orders_fk_customer' AS rule,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |    AS n_violations
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'orders_price_positive',
        |  CAST((SELECT coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1
        |    ELSE 0 END), 0) FROM orders) AS BIGINT)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'lineitem_qty_1_50',
        |  CAST((SELECT coalesce(sum(CASE WHEN l_quantity < 1
        |    OR l_quantity > 50 THEN 1 ELSE 0 END), 0) FROM lineitem)
        |    AS BIGINT)
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), 'customer_key_unique',
        |  CAST((SELECT coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
        |    FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey))
        |    AS BIGINT)
        |UNION ALL
        |SELECT CAST(5 AS BIGINT), 'events_value_nonneg',
        |  CAST((SELECT coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0)
        |    FROM events) AS BIGINT)
        |UNION ALL
        |SELECT CAST(6 AS BIGINT), 'documents_text_nonempty',
        |  CAST((SELECT coalesce(sum(CASE WHEN text IS NULL
        |    OR length(text) = 0 THEN 1 ELSE 0 END), 0) FROM documents)
        |    AS BIGINT)
        |ORDER BY rule_id""".stripMargin,

    "pivot_unpivot_roundtrip" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
        |FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "agg_value_histogram" ->
      s"""SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
         |  count(*) AS n_events,
         |  min(value) AS min_value, max(value) AS max_value,
         |  ${moneySumSql("value")} AS total_value
         |FROM events WHERE value IS NOT NULL
         |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_percentiles_disc" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS tp
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |vc AS (SELECT status, tp, count(*) AS c FROM o GROUP BY 1, 2),
        |r AS (
        |  SELECT status, tp,
        |    CAST(sum(c) OVER (PARTITION BY status ORDER BY tp) AS BIGINT)
        |      AS cum,
        |    CAST(sum(c) OVER (PARTITION BY status) AS BIGINT) AS n
        |  FROM vc)
        |SELECT status, max(n) AS n_orders,
        |  min(CASE WHEN cum * 100 >= n * 50 THEN tp END)/100.0 AS p50,
        |  min(CASE WHEN cum * 100 >= n * 90 THEN tp END)/100.0 AS p90,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN tp END)/100.0 AS p99
        |FROM r GROUP BY status ORDER BY status""".stripMargin,

    "pivot_segment_counts" ->
      """SELECT n_name,
        |  CAST(sum(CASE WHEN c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
        |  CAST(sum(CASE WHEN c_mktsegment='BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
        |  CAST(sum(CASE WHEN c_mktsegment='FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
        |  CAST(sum(CASE WHEN c_mktsegment='HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
        |  CAST(sum(CASE WHEN c_mktsegment='MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "explode_word_freq" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs,
        |  min(doc_id) AS first_doc
        |FROM words GROUP BY word
        |ORDER BY n DESC, word LIMIT 20""".stripMargin,

    "sql_scalar_subquery" ->
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE p_retailprice >
        |  (SELECT sum(cast(round(p_retailprice*100) as bigint))/100.0/count(*)
        |   FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "sql_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "cdc_latest_state" ->
      """SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS last_ts,
        |  event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rk
        |      FROM events)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "dq_rate_limit_audit" -> {
      val cap = graft.streaming.RateLimitStream.CapacityMilli
      val cost = graft.streaming.RateLimitStream.CostMilli
      val refill = s"least($cap, acc.tok + greatest(0, x.last - acc.last))"
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) // 1000 AS ms, event_id,
         |    (epoch_us(ts) // 1000) // 86400000 AS day,
         |    row_number() OVER (PARTITION BY user_id,
         |        (epoch_us(ts) // 1000) // 86400000
         |      ORDER BY epoch_us(ts) // 1000, event_id) AS rn
         |  FROM events),
         |trunc AS (
         |  SELECT day, CAST(count(*) AS BIGINT) AS n_truncated
         |  FROM ev WHERE rn > $MaxAuditEvents GROUP BY day),
         |g AS (
         |  SELECT user_id, day,
         |    list_sort(list(struct_pack(ms := ms,
         |      event_id := event_id))) AS arr
         |  FROM ev WHERE rn <= $MaxAuditEvents GROUP BY user_id, day),
         |f AS (
         |  SELECT day, CAST(len(arr) AS BIGINT) AS n,
         |    list_reduce(
         |      list_transform(arr, x -> struct_pack(
         |        tok := CAST(${cap - cost} AS BIGINT),
         |        last := x.ms,
         |        allowed := CAST(1 AS BIGINT))),
         |      (acc, x) -> struct_pack(
         |        tok := CAST(CASE WHEN $refill >= $cost
         |          THEN $refill - $cost ELSE $refill END AS BIGINT),
         |        last := greatest(acc.last, x.last),
         |        allowed := acc.allowed +
         |          CASE WHEN $refill >= $cost THEN 1 ELSE 0 END)
         |    ).allowed AS allowed
         |  FROM g)
         |SELECT CAST(f.day AS BIGINT) AS day,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  CAST(sum(allowed) AS BIGINT) AS n_allowed,
         |  CAST(sum(n) - sum(allowed) AS BIGINT) AS n_denied,
         |  COALESCE(any_value(trunc.n_truncated), 0) AS n_truncated
         |FROM f LEFT JOIN trunc ON f.day = trunc.day
         |GROUP BY f.day ORDER BY day""".stripMargin
    },

    "dq_sequence_gaps" ->
      """SELECT event_id // 10000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_present,
        |  CAST(min(event_id) AS BIGINT) AS lo,
        |  CAST(max(event_id) AS BIGINT) AS hi,
        |  CAST(max(event_id) - min(event_id) + 1 - count(*) AS BIGINT)
        |    AS n_missing
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "dq_key_skew" -> {
      def arm(table: String, key: String) =
        s"""SELECT '$table.$key' AS key_col, n_keys, n_total, max_n, top_key,
           |    (100 * n_total) // n_keys AS avg_x100
           |  FROM (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_total,
           |          max(n) AS max_n
           |        FROM (SELECT $key AS k, count(*) AS n
           |              FROM $table WHERE $key IS NOT NULL
           |              GROUP BY 1)) s,
           |       (SELECT min(k) AS top_key
           |        FROM (SELECT $key AS k, count(*) AS n
           |              FROM $table WHERE $key IS NOT NULL
           |              GROUP BY 1)
           |        WHERE n = (SELECT max(n) FROM (
           |          SELECT count(*) AS n FROM $table
           |          WHERE $key IS NOT NULL GROUP BY $key))) t""".stripMargin
      s"""SELECT * FROM (
         |${arm("lineitem", "l_orderkey")}
         |UNION ALL
         |${arm("events", "user_id")}
         |UNION ALL
         |${arm("orders", "o_custkey")}
         |) ORDER BY key_col""".stripMargin
    },

    "dq_k_anonymity" -> {
      def arm(tbl: String, qids: String, label: String) =
        s"""SELECT '$label' AS qid_set,
           |  coalesce(CAST(sum(n) AS BIGINT), 0) AS n_rows,
           |  count(*) AS n_groups, min(n) AS min_group,
           |  coalesce(CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)
           |    AS BIGINT), 0) AS n_groups_lt_k,
           |  coalesce(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END)
           |    AS BIGINT), 0) AS n_rows_lt_k
           |FROM (SELECT count(*) AS n FROM $tbl GROUP BY $qids)""".stripMargin
      s"""SELECT * FROM (
         |${arm("customer", "c_nationkey, c_mktsegment",
        "customer(nation,segment)")}
         |UNION ALL
         |${arm("orders",
        "o_orderstatus, o_orderpriority, year(o_orderdate)",
        "orders(status,priority,year)")}
         |) ORDER BY qid_set""".stripMargin
    },

    "dq_l_diversity" -> {
      def arm(tbl: String, qids: String, sensitive: String,
          label: String) =
        s"""SELECT '$label' AS audit,
           |  count(*) AS n_groups, min(lv) AS min_l,
           |  coalesce(CAST(sum(CASE WHEN lv < 3 THEN 1 ELSE 0 END)
           |    AS BIGINT), 0) AS n_groups_lt_l,
           |  coalesce(CAST(sum(CASE WHEN lv < 3 THEN n ELSE 0 END)
           |    AS BIGINT), 0) AS n_rows_lt_l
           |FROM (SELECT CAST(count(DISTINCT $sensitive) AS BIGINT) AS lv,
           |        CAST(count(*) AS BIGINT) AS n
           |      FROM $tbl GROUP BY $qids)""".stripMargin
      s"""SELECT * FROM (
         |${arm("customer", "c_nationkey", "c_mktsegment",
        "customer(nation)->segment")}
         |UNION ALL
         |${arm("orders", "o_orderstatus, year(o_orderdate)",
        "o_orderpriority", "orders(status,year)->priority")}
         |) ORDER BY audit""".stripMargin
    },

    "cdc_snapshot_diff" ->
      """WITH l1 AS (
        |  SELECT user_id, event_type AS state_1,
        |    CAST(round(value*100) AS BIGINT) AS v_1, TRUE AS in_1
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rk
        |        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
        |  WHERE rk = 1),
        |l2 AS (
        |  SELECT user_id, event_type AS state_2,
        |    CAST(round(value*100) AS BIGINT) AS v_2, TRUE AS in_2
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rk
        |        FROM events)
        |  WHERE rk = 1),
        |j AS (
        |  SELECT coalesce(l1.user_id, l2.user_id) AS user_id,
        |    state_1, v_1, state_2, v_2,
        |    CASE WHEN coalesce(l1.in_1, FALSE) = FALSE THEN 'insert'
        |         WHEN coalesce(l2.in_2, FALSE) = FALSE THEN 'delete'
        |         WHEN state_1 IS DISTINCT FROM state_2
        |           OR v_1 IS DISTINCT FROM v_2 THEN 'update'
        |         END AS op
        |  FROM l1 FULL OUTER JOIN l2 ON l1.user_id = l2.user_id)
        |SELECT op, user_id, state_1, v_1, state_2, v_2
        |FROM j WHERE op IS NOT NULL ORDER BY user_id""".stripMargin,

    "cdc_point_in_time" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN prev IS NULL OR prev <> event_type
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state_at
        |  FROM x)
        |SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
        |  state_at
        |FROM c WHERE event_type = 'click'
        |ORDER BY user_id, event_id""".stripMargin,

    "cdc_scd2_history" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |chg AS (SELECT * FROM x WHERE prev IS NULL OR prev <> event_type),
        |r AS (SELECT user_id, event_id, event_type AS state,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, event_id, state, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM r ORDER BY user_id, event_id""".stripMargin,

    "sql_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "sql_recursive_spine" ->
      """WITH RECURSIVE m(mon) AS (
        |  SELECT CAST(date_trunc('month',
        |    (SELECT min(o_orderdate) FROM orders)) AS DATE)
        |  UNION ALL
        |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM m
        |  WHERE mon < (SELECT CAST(date_trunc('month', max(o_orderdate))
        |    AS DATE) FROM orders))
        |SELECT strftime(mon, '%Y-%m') AS month,
        |  count(o.o_orderkey) AS n_orders
        |FROM m LEFT JOIN orders o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mon
        |GROUP BY mon ORDER BY month""".stripMargin,

    "sql_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,

    "sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST, g_status, g_prio""".stripMargin,

    "string_distance_suite" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
        |  CAST(levenshtein(n_name, 'NATION_1') AS BIGINT) AS lev_to_n1,
        |  translate(n_name, '_0123456789', '-') AS name_dashed,
        |  n_name || ':' || repeat('*', 3) AS starred,
        |  CAST(ascii(n_name) AS BIGINT) AS first_byte
        |FROM nation ORDER BY nationkey""".stripMargin,

    "udaf_weighted_price" ->
      s"""SELECT p_brand,
         |  CASE WHEN sum(l_quantity) = 0 THEN 0.0
         |       ELSE sum(${centsSql("l_extendedprice")}
         |                * CAST(round(l_quantity) AS BIGINT))/100.0/sum(l_quantity)
         |  END AS wavg_price,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
