package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.2): the string / JSON / array /
  * date / math / hash / conditional function families the reference
  * touches implicitly (protocol parsing `lib/util.js:226-229`, base64
  * `lib/util.js:29-31`, JSON everywhere, `Date.now()` arithmetic).
  *
  * All expressions are Catalyst built-ins — whole-stage-codegen'd,
  * no UDFs — and every one has bit-identical DuckDB semantics
  * (functions with engine-divergent semantics, e.g. `round(double, n)`
  * half-up-on-decimal-string vs half-on-binary, are deliberately
  * excluded; see Exact.scala for how money math avoids them).
  */
object ScalarQueries extends QuerySuite {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String family over part (protocol-parse analogs: split at a
    // delimiter = substring_index, membership probes = instr/contains).
    "scalar_string_suite" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_padded"),
        substring_index(col("p_type"), " ", 1).as("type_first_word"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        col("p_name").contains("red").as("has_red"),
        reverse(col("p_brand")).as("brand_rev"))
        .orderBy("p_partkey")),

    // JSON family over events.props (the reference's dynamic payloads,
    // lib/util.js:234-240).
    // Spread.fanout: the per-row JSON parse dwarfs the exchange of
    // the skinny projection, and the single-row-group scan would run
    // it serial (graft.Spread doc)
    "scalar_json_suite" -> ((s, d) =>
      graft.Spread.fanoutScan(Tables.events(s, d).select("event_id", "props"))
        .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        get_json_object(col("props"), "$.missing").isNotNull.as("has_missing"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .orderBy("event_id")),

    // VARIANT family (Spark 4 `parse_json`/`variant_get`): the modern
    // spelling of SURVEY §1.3's "variant-style handling" row — the
    // reference's payloads are schema-dynamic JSON (`lib/util.js:
    // 234-240`), and at 100 TB the open-schema column should ride the
    // shredded binary VARIANT encoding, not repeated string parsing.
    // Values go text → VARIANT → typed-path extraction → aggregate;
    // the DuckDB oracle recomputes from the JSON text (no VARIANT
    // there), proving the encode→extract roundtrip value-exact.
    // try_parse_json, not parse_json: an ingest payload column CAN
    // carry a malformed record, and FAILFAST parse would abort the
    // whole 100 TB aggregate on one bad row (the zero-content corpus
    // sweep caught exactly this) — a malformed payload degrades to
    // NULL k in BOTH twins (the oracle gates on json_valid), the
    // dq_dead_letter_split channel being where bad payloads get
    // actively routed.
    // (r15 A/B: a Spread.fanout before the parse measured flat here
    // and would ship raw props through an extra exchange — the
    // parse-then-partial-aggregate shape already collapses this query
    // map-side, guide §2.3. Kept as is.)
    "variant_props_stats" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          variant_get(try_parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k").as("sum_k"),
          max("k").as("max_k"),
          sum(when(col("k") % 2 === 0L, 1L).otherwise(0L)).as("n_even_k"))
        .orderBy("event_type")),

    // ...and NESTED paths through one VARIANT document per event —
    // object-in-object and array indexing (`$.m.cents`, `$.arr[1]`),
    // typed extraction (bigint/string), and the missing-path → NULL
    // contract. The document is constructed from base columns
    // (integer-cents money so the roundtrip is bit-exact), so the
    // oracle can recompute every extracted value WITHOUT JSON — the
    // strongest possible check of the whole construct→parse→shred→
    // extract path.
    "variant_nested_paths" -> ((s, d) => {
      val v = parse_json(to_json(struct(
        col("user_id").as("u"),
        struct(Exact.cents(col("value")).as("cents"),
          col("event_type").as("t")).as("m"),
        array(col("event_id") % 5L, col("event_id") % 3L).as("arr"))))
      // Spread.fanout before the encode→parse→extract roundtrip
      // (scalar_json_suite note)
      graft.Spread.fanoutScan(Tables.events(s, d)
          .select("event_id", "user_id", "value", "event_type")).select(
        col("event_id"),
        variant_get(v, "$.u", "bigint").as("u"),
        variant_get(v, "$.m.cents", "bigint").as("cents"),
        variant_get(v, "$.m.t", "string").as("t"),
        variant_get(v, "$.arr[1]", "bigint").as("arr_1"),
        variant_get(v, "$.missing", "string").isNull.as("missing_is_null"))
        .orderBy("event_id")
    }),

    // Array family over tokenized documents (membership-array analogs
    // of lib/ChannelHub.js:65-82 push/splice/indexOf).
    "scalar_array_suite" -> ((s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_distinct"),
        array_contains(words, "spark").as("has_spark"),
        array_join(slice(words, 1, 3), " ").as("first3"),
        element_at(words, -1).as("last_word"),
        array_join(array_sort(array_distinct(words)), ",").as("vocab"))
        .orderBy("doc_id")
    }),

    // Map-function family: build word -> first-position maps per doc
    // and exercise lookup, keys/values, filter and value-transform.
    // The DuckDB oracle computes the same semantics from the arrays
    // (no MAP type needed — value(k) = list_position(ws, k)); lookups
    // use try_element_at so a missing key is NULL on both engines.
    "scalar_map_suite" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("ks", array_distinct(col("ws")))
        .withColumn("m",
          expr("map_from_arrays(ks, transform(ks, k -> array_position(ws, k)))"))
        .select(
          col("doc_id"),
          size(col("m")).cast("long").as("n_keys"),
          expr("try_element_at(m, 'the')").as("pos_the"),
          expr("element_at(m, element_at(ws, -1))").as("pos_last_word"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          expr("aggregate(map_values(m), 0L, (a, v) -> a + v)").as("sum_pos"),
          expr("CAST(size(map_filter(m, (k, v) -> v <= 3)) AS BIGINT)")
            .as("n_early"),
          expr("try_element_at(transform_values(m, (k, v) -> v * 10), 'the')")
            .as("pos_the_x10"))
        .orderBy("doc_id")),

    // Date/time family over orders (reference only has Date.now()
    // millis, lib/token.js:43).
    "scalar_date_suite" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"))
        .orderBy("o_orderkey")),

    // Math family over lineitem (only functions with IEEE-identical
    // cross-engine results).
    "scalar_math_suite" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        (col("l_orderkey") % 7).as("key_mod"),
        signum(col("l_quantity") - 25).cast("long").as("qty_sign"),
        greatest(col("l_quantity"), col("l_linenumber").cast("double")).as("gst"),
        least(col("l_discount"), col("l_tax")).as("lst"),
        sqrt(col("l_quantity")).as("qty_sqrt"))
        .orderBy("l_orderkey", "ln")),

    // Hash/encoding family (token HMAC machinery analog,
    // lib/token.js:52, lib/util.js:29-31).
    "scalar_hash_suite" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        sha2(col("c_name").cast("binary"), 256).as("name_sha256"),
        base64(col("c_name").cast("binary")).as("name_b64"))
        .orderBy("c_custkey")),

    // Bitwise family: and/or/xor/shifts/popcount — the primitives the
    // hash, bitmap-sketch and phash surfaces build on, pinned as
    // first-class scalars. Shift distances stay < 32 and operands
    // positive so no engine-specific overflow edge is in play; Spark's
    // `^` is xor (DuckDB's is power — its twin spells xor()).
    "scalar_bits_suite" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        col("c_custkey").bitwiseAND(lit(255L)).as("k_and"),
        col("c_custkey").bitwiseOR(lit(4096L)).as("k_or"),
        col("c_custkey").bitwiseXOR(lit(21845L)).as("k_xor"),
        shiftleft(col("c_custkey"), 3).as("k_shl"),
        shiftright(col("c_custkey"), 2).as("k_shr"),
        expr("CAST(bit_count(c_custkey) AS BIGINT)").as("k_pop"))
        .orderBy("c_custkey")),

    // Null-semantics family: three-valued logic (`=` yields NULL on a
    // NULL operand), null-safe equality (Spark `<=>` ≡ DuckDB
    // IS NOT DISTINCT FROM), and EXPLICIT null ordering — the engines
    // default differently (Spark sorts nulls first ascending, DuckDB
    // last), so portable plans must always spell it out.
    "scalar_null_suite" -> ((s, d) => {
      val m = nullif(col("c_mktsegment"), lit("MACHINERY"))
      Tables.customer(s, d).select(
        col("c_custkey"),
        m.as("seg_m"),
        (m === lit("BUILDING")).as("eq_3vl"),
        (m <=> lit("BUILDING")).as("eq_nullsafe"),
        m.isNull.as("is_n"),
        coalesce(m, lit("(redacted)")).as("seg_coal"))
        .orderBy(col("seg_m").asc_nulls_last, col("c_custkey"))
    }),

    // Conditional family: CASE/coalesce/nullif bucketization.
    "scalar_conditional_suite" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")),
          lit("OTHER")).as("segment_masked"),
        (col("c_acctbal") > 0).as("in_credit"))
        .orderBy("c_custkey")),

    // try_* error-handling scalars: graceful NULL instead of a crashed
    // job — division by zero, an unparseable cast, and a valid cast on
    // the same row (both branches exercised). The DuckDB twin spells
    // the same semantics with CASE/TRY_CAST.
    //
    // The always-failing bad_cast column is GATED behind a cheap
    // validity regexp: try_cast's NULL-on-failure is implemented by
    // throwing and catching a per-row NumberFormatException, which
    // measured ~3.3 s of this query's 3.6 s at sf0.1 (~20 µs/row on a
    // column where every value fails). The gate is a NECESSARY
    // condition for ANSI string→int acceptance — optional padding of
    // ≤0x20 bytes or 0x7F (UTF8String's numeric parse trims bytes via
    // isWhitespaceOrISOControl, which accepts DEL — ADVICE r15),
    // optional sign, ASCII digits — so gated-off rows are precisely
    // the rows try_cast would NULL anyway, and gated-on rows still run
    // the real try_cast (overflow → NULL preserved).
    // TryCastGateSpec pins value equality against raw try_cast on a
    // 30-case adversarial corpus (fractions, overflow, unicode digits,
    // control-char padding, NBSP, empty, bare signs, NULL).
    "scalar_try_suite" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("div_mod3"),
        when(col("o_orderpriority")
            .rlike("^[\\x00-\\x20\\x7F]*[+-]?[0-9]+[\\x00-\\x20\\x7F]*$"),
          expr("try_cast(o_orderpriority AS INT)")).as("bad_cast"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
          .as("prio_num"))
        .orderBy("o_orderkey")))

  def oracles: Map[String, String] = Map(
    "scalar_string_suite" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 12) AS name_prefix,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  p_brand || '|' || p_type AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
        |  split_part(p_type, ' ', 1) AS type_first_word,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        |  contains(p_name, 'red') AS has_red,
        |  reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    // json_valid gates: Spark's get_json_object is LENIENT (malformed
    // payload → NULL) while DuckDB's json_extract_string RAISES — on a
    // corpus with one bad payload the oracle would abort where the
    // engine degrades; the gate makes both twins NULL
    "scalar_json_suite" ->
      """WITH j AS (
        |  SELECT event_id,
        |    CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.k') END AS k_str,
        |    CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.missing') END AS m_str
        |  FROM events)
        |SELECT event_id, k_str,
        |  CAST(k_str AS BIGINT) AS k_int,
        |  m_str IS NOT NULL AS has_missing,
        |  CAST(k_str AS BIGINT) % 10 AS k_mod
        |FROM j ORDER BY event_id""".stripMargin,

    "variant_props_stats" ->
      """WITH k AS (SELECT event_type,
        |    CASE WHEN json_valid(props)
        |         THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
        |  CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_even_k
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,

    "variant_nested_paths" ->
      s"""SELECT event_id, user_id AS u,
         |  ${graft.analytics.Exact.centsSql("value")} AS cents,
         |  event_type AS t,
         |  event_id % 3 AS arr_1,
         |  TRUE AS missing_is_null
         |FROM events ORDER BY event_id""".stripMargin,

    "scalar_array_suite" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
        |  (string_split(text, ' '))[-1] AS last_word,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
        |FROM documents ORDER BY doc_id""".stripMargin,

    "scalar_map_suite" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |    list_distinct(string_split(text, ' ')) AS ks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(ks) AS BIGINT) AS n_keys,
        |  CASE WHEN list_contains(ks, 'the')
        |       THEN CAST(list_position(ws, 'the') AS BIGINT) END AS pos_the,
        |  CAST(list_position(ws, ws[-1]) AS BIGINT) AS pos_last_word,
        |  array_to_string(list_sort(ks), ',') AS keys_csv,
        |  CAST(list_sum(list_transform(ks,
        |    k -> CAST(list_position(ws, k) AS BIGINT))) AS BIGINT) AS sum_pos,
        |  CAST(len(list_filter(ks, k -> list_position(ws, k) <= 3))
        |    AS BIGINT) AS n_early,
        |  CASE WHEN list_contains(ks, 'the')
        |       THEN CAST(list_position(ws, 'the') * 10 AS BIGINT) END
        |    AS pos_the_x10
        |FROM t ORDER BY doc_id""".stripMargin,

    "scalar_date_suite" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS days_since_epoch_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_math_suite" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  abs(l_quantity - 25) AS qty_dev,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  l_orderkey % 7 AS key_mod,
        |  CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign,
        |  greatest(l_quantity, CAST(l_linenumber AS DOUBLE)) AS gst,
        |  least(l_discount, l_tax) AS lst,
        |  sqrt(l_quantity) AS qty_sqrt
        |FROM lineitem ORDER BY l_orderkey, ln""".stripMargin,

    "scalar_hash_suite" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256,
        |  base64(CAST(c_name AS BLOB)) AS name_b64
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_bits_suite" ->
      """SELECT c_custkey,
        |  c_custkey & 255 AS k_and,
        |  c_custkey | 4096 AS k_or,
        |  xor(c_custkey, 21845) AS k_xor,
        |  c_custkey << 3 AS k_shl,
        |  c_custkey >> 2 AS k_shr,
        |  CAST(bit_count(c_custkey) AS BIGINT) AS k_pop
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_null_suite" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'MACHINERY') AS seg_m,
        |  nullif(c_mktsegment, 'MACHINERY') = 'BUILDING' AS eq_3vl,
        |  nullif(c_mktsegment, 'MACHINERY') IS NOT DISTINCT FROM 'BUILDING'
        |    AS eq_nullsafe,
        |  nullif(c_mktsegment, 'MACHINERY') IS NULL AS is_n,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), '(redacted)')
        |    AS seg_coal
        |FROM customer
        |ORDER BY seg_m ASC NULLS LAST, c_custkey""".stripMargin,

    "scalar_conditional_suite" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
        |  c_acctbal > 0 AS in_credit
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_try_suite" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey % 3 = 0 THEN NULL
        |       ELSE o_totalprice / (o_custkey % 3) END AS div_mod3,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
