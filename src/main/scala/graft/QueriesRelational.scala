package graft

import graft.functions.{Bpe, DecodeFns, OddsFns, TextFns, TimeFns}
import graft.functions.SimFns.toDouble
import graft.operators._
import graft.sources.BettingFixture
import graft.streaming.{EventStreams, WagerBook}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational parity + scalar functions + flagship flatten + the
  * batch forms of the streaming semantics (SURVEY §2.1–§2.8 rows). */
private[graft] trait QueriesRelational extends QueriesBase {

  // ───────────────────────────── relational parity ──────────────────────────

  protected val q1PricingSummary = Q("q1_pricing_summary",
    (s, dir) => Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS n_rows
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin), bench = true)

  protected val f1IsinFilter = Q("f1_isin_filter",
    (s, dir) => Tables.customer(s, dir)
      .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal")),
    Some("""SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')""".stripMargin))

  protected val f2EqFilterJson = Q("f2_eq_filter_json",
    (s, dir) => Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(get_json_object(col("props"), "$.k"), lit("0")).cast("int").as("k"),
        col("value")),
    Some("""SELECT event_id, user_id,
      |  CAST(coalesce(json_extract_string(props, '$.k'), '0') AS INTEGER) AS k, value
      |FROM events WHERE event_type = 'purchase'""".stripMargin))

  /** F2's 100 TB shape (operators.VariantOps): the JSON text is parsed ONCE
    * into Spark 4's binary VARIANT, then every field is a typed binary probe
    * (`variant_get`) instead of a per-field text re-parse. The oracle never
    * sees JSON — it recomputes from the base event columns, so a hash match
    * proves the synthesize→parse→shred round-trip is lossless (same derived-
    * oracle pattern as `multimodal_decode`). */
  protected val xVariantShred = Q("x_variant_shred",
    (s, dir) => VariantOps.shred(VariantOps.eventPayload(Tables.events(s, dir)))
      .where(col("etype").isin("purchase", "click"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(col("uid")).as("uid_sum"),
        sum(col("k").cast("bigint")).as("k_sum"),
        sum(col("val2").cast("decimal(18,2)")).cast("double").as("val2_sum")),
    Some("""SELECT event_type AS etype, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
      |  CAST(sum(CAST(coalesce(json_extract_string(props, '$.k'), '0') AS INTEGER)) AS BIGINT) AS k_sum,
      |  CAST(sum(CAST(value * 2 AS DECIMAL(18,2))) AS DOUBLE) AS val2_sum
      |FROM events WHERE event_type IN ('purchase', 'click')
      |GROUP BY event_type""".stripMargin), bench = true)

  /** Variant's per-row dynamic typing: `$.tag` is a number on every third
    * event and a string otherwise. The typed read (`try_variant_get` int)
    * must null exactly on the string rows; the string read covers both.
    * Oracle derives the expected values from `event_id` directly. */
  protected val xVariantHetero = Q("x_variant_hetero",
    (s, dir) => VariantOps.shred(VariantOps.eventPayload(Tables.events(s, dir)))
      .select(col("event_id"), col("tag_int"), col("tag_str")),
    Some("""SELECT event_id,
      |  CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 100 AS INTEGER) END AS tag_int,
      |  CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 100 AS VARCHAR)
      |       ELSE 't-' || CAST(event_id % 100 AS VARCHAR) END AS tag_str
      |FROM events""".stripMargin))

  protected val j1JoinAgg = Q("j1_join_agg",
    (s, dir) => Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total")),
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin))

  /** J1's string-typed join key quirk (reference `src/mm_calls.py:94,102`). */
  protected val j1StrkeyJoin = Q("j1_strkey_join",
    (s, dir) => Tables.orders(s, dir).select(col("o_custkey").cast("string").as("k"), col("o_totalprice"))
      .join(Tables.customer(s, dir).select(col("c_custkey").cast("string").as("k"), col("c_nationkey")), "k")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total")),
    Some("""SELECT c_nationkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
      |GROUP BY c_nationkey""".stripMargin))

  protected val j2SemiJoin = Q("j2_semi_join",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin))

  protected val jAntiJoin = Q("j_anti_join",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin))

  protected val j3ChainAgg = Q("j3_chain_agg",
    (s, dir) => Tables.region(s, dir)
      .join(Tables.nation(s, dir), col("r_regionkey") === col("n_regionkey"))
      .join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("revenue")),
    Some("""SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |JOIN orders ON c_custkey = o_custkey
      |GROUP BY r_name, n_name""".stripMargin), bench = true)

  /** As-of join (operators.AsOfJoin): odds-at-event-time lookup — probes
    * (events) pick the latest snapshot ≤ their timestamp per tournament.
    * Oracle is DuckDB's native ASOF LEFT JOIN. Snapshot times interleave
    * with the event range deterministically and are unique per key. */
  protected val jAsofJoin = Q("j_asof_join",
    (s, dir) => {
      // µs domain on both sides: DuckDB coerces parquet TIMESTAMP_NS to its
      // µs-precision TIMESTAMP, so nano-precision probe times can't match.
      val snaps = Tables.lineitem(s, dir).select(
        pmod(col("l_suppkey"), lit(5)).as("tid"),
        (lit(1704067200000000L) +
          pmod(unix_timestamp(col("l_shipdate")) * lit(1000L), lit(604800000L)) * lit(1000L) +
          col("l_orderkey") * lit(10L) + col("l_linenumber")).as("tsn"),
        concat(lit("m"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("market_id"),
        OddsFns.ladderAt(pmod(col("l_partkey"), lit(291))).cast("int").as("odds"))
      val probes = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(5)).as("tid"),
        TimeFns.nanosToMicros(col("ts")).as("tsn"), col("event_id"))
      AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
        probeCols = Seq("event_id"), payloadCols = Seq("market_id", "odds"))
    },
    Some(s"""WITH snaps AS (
      |  SELECT l_suppkey % 5 AS tid,
      |    1704067200000000 + ((epoch_ms(l_shipdate) // 1000 * 1000) % 604800000) * 1000
      |      + l_orderkey * 10 + l_linenumber AS tsn,
      |    concat('m', CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS market_id,
      |    CAST(($ladderSql)[CAST(l_partkey % 291 AS INTEGER) + 1] AS INTEGER) AS odds
      |  FROM lineitem),
      |probes AS (SELECT user_id % 5 AS tid, epoch_ns(ts) // 1000 AS tsn, event_id FROM events)
      |SELECT p.tid, p.tsn, p.event_id, s.market_id, s.odds
      |FROM probes p ASOF LEFT JOIN snaps s ON p.tid = s.tid AND p.tsn >= s.tsn""".stripMargin),
    bench = true)

  /** Nearest-direction as-of join (operators.AsOfJoin, direction=nearest):
    * whichever of the backward/forward snapshot is closer in |ts|, ties
    * preferring backward. Oracle = two native DuckDB ASOF joins (one per
    * direction) + a per-row pick — the same shape as the Spark plan, and
    * O((n+m) log m) rather than the O(n·m)-per-key pair-rank form (which
    * ground for >10 min at sf0.1). Tie → backward arm via `<`, and an
    * equal-ts probe matches the same snapshot on both arms. */
  protected val jAsofNearest = Q("j_asof_nearest",
    (s, dir) => {
      val snaps = Tables.lineitem(s, dir).select(
        pmod(col("l_suppkey"), lit(5)).as("tid"),
        (lit(1704067200000000L) +
          pmod(unix_timestamp(col("l_shipdate")) * lit(1000L), lit(604800000L)) * lit(1000L) +
          col("l_orderkey") * lit(10L) + col("l_linenumber")).as("tsn"),
        concat(lit("m"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("market_id"),
        OddsFns.ladderAt(pmod(col("l_partkey"), lit(291))).cast("int").as("odds"))
      val probes = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(5)).as("tid"),
        TimeFns.nanosToMicros(col("ts")).as("tsn"), col("event_id"))
      AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
        probeCols = Seq("event_id"), payloadCols = Seq("market_id", "odds"),
        direction = "nearest")
    },
    Some(s"""WITH snaps AS (
      |  SELECT l_suppkey % 5 AS tid,
      |    1704067200000000 + ((epoch_ms(l_shipdate) // 1000 * 1000) % 604800000) * 1000
      |      + l_orderkey * 10 + l_linenumber AS tsn,
      |    concat('m', CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS market_id,
      |    CAST(($ladderSql)[CAST(l_partkey % 291 AS INTEGER) + 1] AS INTEGER) AS odds
      |  FROM lineitem),
      |probes AS (SELECT user_id % 5 AS tid, epoch_ns(ts) // 1000 AS tsn, event_id FROM events),
      |bwd AS (
      |  SELECT p.tid, p.tsn, p.event_id, s.market_id AS bm, s.odds AS bo, s.tsn AS bt
      |  FROM probes p ASOF LEFT JOIN snaps s ON p.tid = s.tid AND p.tsn >= s.tsn),
      |fwd AS (
      |  SELECT p.tid, p.tsn, p.event_id, s.market_id AS fm, s.odds AS fo, s.tsn AS ft
      |  FROM probes p ASOF LEFT JOIN snaps s ON p.tid = s.tid AND p.tsn <= s.tsn)
      |SELECT b.tid, b.tsn, b.event_id,
      |  CASE WHEN b.bt IS NULL THEN f.fm WHEN f.ft IS NULL THEN b.bm
      |       WHEN (f.ft - b.tsn) < (b.tsn - b.bt) THEN f.fm ELSE b.bm END AS market_id,
      |  CASE WHEN b.bt IS NULL THEN f.fo WHEN f.ft IS NULL THEN b.bo
      |       WHEN (f.ft - b.tsn) < (b.tsn - b.bt) THEN f.fo ELSE b.bo END AS odds
      |FROM bwd b JOIN fwd f
      |  ON f.tid = b.tid AND f.tsn = b.tsn AND f.event_id = b.event_id""".stripMargin))

  /** Range join (operators.RangeJoin): events-in-promotion-window lookup —
    * every event joins the deterministic order-derived intervals containing
    * its timestamp, aggregated per interval. The oracle is DuckDB's native
    * inequality join (IEJoin); the Spark side must reach the same rows via
    * the binned equi-join, never a nested-loop product. */
  protected val jRangeJoin = Q("j_range_join",
    (s, dir) => {
      val points = Tables.events(s, dir).select(
        TimeFns.nanosToMicros(col("ts")).as("pt"), col("event_id"), col("value"))
      // Minute-grid starts across events' Jan-2024 span; 1–30 min widths.
      val intervals = Tables.orders(s, dir).select(
          col("o_orderkey").as("interval_id"),
          (lit(1704067200000000L) +
            pmod(col("o_orderkey"), lit(43200)) * lit(60000000L)).as("ivl_start"),
          (pmod(col("o_custkey"), lit(30)) + 1).as("mins"))
        .withColumn("ivl_end", col("ivl_start") + col("mins") * lit(60000000L))
        .drop("mins")
      RangeJoin.pointInInterval(points, intervals, "pt", "ivl_start", "ivl_end",
          binWidth = 600000000L) // 10-min bins ≈ median span ⇒ fan-out ≤ 4
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
    },
    Some("""WITH p AS (SELECT epoch_ns(ts) // 1000 AS pt, event_id, value FROM events),
      |i AS (SELECT o_orderkey AS interval_id,
      |        1704067200000000 + (o_orderkey % 43200) * 60000000 AS s,
      |        1704067200000000 + (o_orderkey % 43200) * 60000000
      |          + ((o_custkey % 30) + 1) * 60000000 AS e
      |      FROM orders)
      |SELECT interval_id, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM i JOIN p ON p.pt >= i.s AND p.pt < i.e
      |GROUP BY interval_id""".stripMargin))

  protected val a3CollectIds = Q("a3_collect_ids",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(array_join(array_sort(collect_list(col("o_orderkey").cast("string"))), ",")
        .as("order_ids"), count(lit(1)).as("n")),
    Some("""SELECT o_custkey,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_ids,
      |  count(*) AS n
      |FROM orders GROUP BY o_custkey""".stripMargin))

  /** A4 — keyed last-write-wins over the events stream table. Ordered at
    * µs granularity on BOTH sides: DuckDB coerces TIMESTAMP_NS to its
    * µs-precision TIMESTAMP, so a nano-granular Spark ordering could break
    * ties differently than the oracle. */
  protected val a4LastWins = Q("a4_last_wins",
    (s, dir) => Tables.events(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(TimeFns.nanosToMicros(col("ts")).desc, col("event_id").desc)))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value")),
    Some("""SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin), bench = true)

  /** Skewed-key aggregation via two-phase salting (operators.Salted): the
    * oracle is the plain GROUP BY — decimal-exact partials make the salted
    * plan bit-identical. event_type has only ~6 heavy keys: exactly the
    * shape that melts a single reducer at 100 TB. */
  protected val aSaltedAgg = Q("a_salted_agg",
    (s, dir) => Salted.countSum(Tables.events(s, dir),
      col("event_type"), col("value"), nSalts = 16)
      .withColumnRenamed("key", "event_type"),
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type""".stripMargin))

  /** ANALYZE-style single-scan column profile (Profiling.columnStats):
    * null/distinct/min/max per column. min/max aggregate in native type and
    * cast to string only at output — the oracle mirrors with CAST(min(c) AS
    * VARCHAR), so a lexicographic-aggregation bug on the int columns would
    * hash-mismatch. */
  protected val aColumnProfile = Q("a_column_profile",
    (s, dir) => Profiling.columnStats(Tables.documents(s, dir),
      Seq("doc_id", "text", "lang", "source", "n_chars")),
    Some(Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n")),
    bench = true)

  /** Pre-flight skew report (Profiling.keySkew): top-20 heaviest event keys
    * with integral basis-point shares; deterministic (cnt desc, key) cut.
    * Spark plans the top-N as TakeOrderedAndProject (no global sort) —
    * plan-asserted in ProfilingSpec. */
  protected val aKeySkew = Q("a_key_skew",
    (s, dir) => Profiling.keySkew(Tables.events(s, dir), col("user_id"), 20),
    Some("""WITH c AS (SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY 1),
      |t AS (SELECT count(*) AS total FROM events)
      |SELECT key, cnt, cnt * 10000 // total AS share_bp FROM c, t
      |ORDER BY cnt DESC, key LIMIT 20""".stripMargin))

  /** Salted inner equi-join (Salted.equiJoin): events re-joined to their
    * per-type stats — ~6 distinct keys over 15k+ rows, the hot-key shape
    * that melts one reducer in a plain shuffle join. The oracle is the
    * plain join; salting must be row-for-row invisible. */
  protected val jSaltedJoin = Q("j_salted_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("type_n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("type_total"))
      Salted.equiJoin(
        ev.select(col("event_id"), col("event_type"), col("value")),
        dim, "event_type", nSalts = 8)
        .select(col("event_id"), col("event_type"), col("type_n"), col("type_total"))
    },
    Some("""WITH d AS (SELECT event_type, count(*) AS type_n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS type_total
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, d.type_n, d.type_total
      |FROM events e JOIN d USING (event_type)""".stripMargin))

  /** Pivot reshape (wide per-key counts). Missing combinations are
    * normalized to 0 on both sides (Spark pivot-count yields null, DuckDB
    * PIVOT yields 0). */
  protected val aggPivot = Q("agg_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, dir)
        .groupBy(col("user_id")).pivot("event_type", types).count()
      p.select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
    },
    Some("""SELECT user_id, click, error, purchase, signup, view
      |FROM (PIVOT events ON event_type IN ('click', 'error', 'purchase', 'signup', 'view')
      |      USING count(*) GROUP BY user_id)""".stripMargin))

  protected val a1Counts = Q("a1_counts",
    (s, dir) => Tables.orders(s, dir).agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(col("o_orderpriority")).as("n_priorities")),
    Some("""SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities FROM orders""".stripMargin))

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, same linear-interpolation formula). */
  protected val aPercentiles = Q("a_percentiles",
    (s, dir) => Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("percentile(c_acctbal, 0.5)").as("p50"),
        expr("percentile(c_acctbal, 0.9)").as("p90"),
        count(lit(1)).as("n")),
    Some("""SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS p50,
      |  quantile_cont(c_acctbal, 0.9) AS p90, count(*) AS n
      |FROM customer GROUP BY c_mktsegment""".stripMargin))

  /** Null-handling scalar vocabulary: nullif / coalesce chains / null-safe
    * equality over the JSON-sourced nullable column. */
  protected val cNullFns = Q("c_null_fns",
    (s, dir) => Tables.events(s, dir).select(
      col("event_id"),
      nullif(col("event_type"), lit("view")).as("type_or_null"),
      coalesce(get_json_object(col("props"), "$.missing"),
        get_json_object(col("props"), "$.k"), lit("-1")).as("first_present"),
      (col("event_type") <=> lit("purchase")).as("nullsafe_is_purchase")),
    Some("""SELECT event_id, nullif(event_type, 'view') AS type_or_null,
      |  coalesce(json_extract_string(props, '$.missing'),
      |           json_extract_string(props, '$.k'), '-1') AS first_present,
      |  event_type IS NOT DISTINCT FROM 'purchase' AS nullsafe_is_purchase
      |FROM events""".stripMargin))

  /** Time-series gap-fill: dense hourly spine per event_type with 0-filled
    * counts (sequence+explode left-joined to the sparse aggregate). */
  protected val tGapfill = Q("t_gapfill",
    (s, dir) => {
      // exact hour bucketing — through DECIMAL, not double (µs/3.6e9 in a
      // double can round up across an integer boundary vs floor division)
      val hours = Tables.events(s, dir).select(col("event_type"),
        (TimeFns.nanosToMicros(col("ts")).cast("decimal(20,0)") / lit(3600000000L))
          .cast("long").as("hour_idx"))
      val counts = hours.groupBy(col("event_type"), col("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val spine = hours.groupBy(col("event_type"))
        .agg(min(col("hour_idx")).as("h0"), max(col("hour_idx")).as("h1"))
        .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour_idx"))
      spine.join(counts, Seq("event_type", "hour_idx"), "left")
        .select(col("event_type"), col("hour_idx"),
          coalesce(col("n"), lit(0L)).as("n"))
    },
    Some("""WITH h AS (SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS hour_idx FROM events),
      |counts AS (SELECT event_type, hour_idx, count(*) AS n FROM h GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(min(hour_idx), max(hour_idx))) AS hour_idx
      |  FROM h GROUP BY event_type)
      |SELECT s.event_type, s.hour_idx, coalesce(c.n, 0) AS n
      |FROM spine s LEFT JOIN counts c ON c.event_type = s.event_type AND c.hour_idx = s.hour_idx""".stripMargin))

  protected val a5Scalar = Q("a5_scalar",
    (s, dir) => Tables.customer(s, dir).agg(
      max(col("c_acctbal")).as("max_bal"), min(col("c_acctbal")).as("min_bal"),
      count(lit(1)).as("n")),
    Some("SELECT max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal, count(*) AS n FROM customer"))

  protected val wTopkPerGroup = Q("w_topk_per_group",
    (s, dir) => Tables.orders(s, dir)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders) WHERE rank <= 3""".stripMargin), bench = true)

  /** The same top-3-per-customer through the custom whole-operator plan
    * (plans.TopKPlan — logical node + strategy + partial/final physical
    * operators, tier (c)): bounded per-partition heaps prune to ≤k rows per
    * key BEFORE the only shuffle, vs. the window plan's full-data exchange
    * + sort. Same oracle as w_topk_per_group — the two plans must agree
    * bit-for-bit. */
  protected val wTopkPlan = Q("w_topk_plan",
    (s, dir) => graft.plans.TopKPlan.topKPerGroup(Tables.orders(s, dir),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders) WHERE rank <= 3""".stripMargin), bench = true)

  /** Running (cumulative) window aggregate — frame-spec windows beyond the
    * reference's surface (SURVEY.md §2.9: free in the engine). */
  protected val wRunningSum = Q("w_running_sum",
    (s, dir) => Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).as("seq")),
    Some("""SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS seq
      |FROM orders""".stripMargin))

  /** lag/lead offset windows — order-to-order deltas per customer (the
    * classic event-sequence shape; completes the window-function family
    * beyond rank/rownum/frames). */
  protected val wLagLead = Q("w_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
        coalesce(lead(col("o_totalprice"), 1).over(w), lit(0.0)).as("next_price"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      |  coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
      |  coalesce(lead(o_totalprice, 1) OVER w, 0.0) AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin))

  /** ntile quartiles per market segment (both engines split remainder
    * identically: first n%k tiles get the extra row). Partitioned on the
    * segment key — an UNpartitioned ntile is a single-reducer global sort,
    * the one window shape that cannot survive a 100 TB input. */
  protected val wNtile = Q("w_ntile",
    (s, dir) => Tables.customer(s, dir).select(
      col("c_custkey"), col("c_mktsegment"),
      ntile(4).over(Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))).as("bal_quartile")),
    Some("""SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INTEGER) AS bal_quartile
      |FROM customer""".stripMargin))

  /** percent_rank / cume_dist — distribution windows. No rounding needed:
    * both engines compute the identical integer-operand double divisions
    * ((rank−1)/(n−1), peers/n), which are bit-identical IEEE results. */
  protected val wPctRank = Q("w_pct_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },
    Some("""SELECT c_custkey, c_mktsegment,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin))

  /** Fixed-width histogram of order totals (bucket arithmetic in both
    * engines, integral bucket ids) — the binned-aggregation shape behind
    * any distribution dashboard. */
  protected val aHistogram = Q("a_histogram",
    (s, dir) => Tables.orders(s, dir)
      // explicit floor: DuckDB's CAST-to-INTEGER rounds, Spark's truncates
      .select(floor(col("o_totalprice").cast("decimal(18,2)") / lit(25000))
        .cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n")),
    Some("""SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS INTEGER) AS bucket,
      |  count(*) AS n
      |FROM orders GROUP BY 1""".stripMargin))

  /** first_value / nth_value frame windows with an explicit ROWS frame
    * (frame defaults differ subtly across engines; explicit is portable). */
  protected val wFirstNth = Q("w_first_nth",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin))

  /** Map-function vocabulary: build a map per row, probe/inspect it, emit
    * SCALARS (map-typed outputs render differently across engines; the
    * operations are what's under test, not the wire format). */
  protected val cMapFns = Q("c_map_fns",
    (s, dir) => Tables.nation(s, dir).select(
      col("n_nationkey"),
      element_at(map(lit("region"), col("n_regionkey").cast("string"),
        lit("name"), col("n_name")), "name").as("via_map"),
      size(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey")))
        .as("map_size"),
      array_join(map_keys(map(lit("k1"), lit(1), lit("k2"), lit(2))), ",")
        .as("keys_joined")),
    Some("""SELECT n_nationkey,
      |  (map(['region', 'name'], [CAST(n_regionkey AS VARCHAR), n_name])['name'])[1] AS via_map,
      |  CAST(cardinality(map([ 'a', 'b' ], [n_nationkey, n_regionkey])) AS INTEGER) AS map_size,
      |  array_to_string(map_keys(map(['k1', 'k2'], [1, 2])), ',') AS keys_joined
      |FROM nation""".stripMargin))

  /** Histogram-sketch quantiles (operators.Sketch.histQuantiles): p50/p90
    * of order totals from the fixed-memory bucket table, integral math ⇒
    * exact cross-engine compare (the estimate is within one 25k bin of the
    * true quantile — a_percentiles holds the exact twin). */
  protected val sketchQuantileHist = Q("sketch_quantile_hist",
    (s, dir) => Sketch.histQuantiles(Tables.orders(s, dir), "o_totalprice", 25000L),
    Some("""WITH b AS (
      |  SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS INTEGER) AS bucket,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |c AS (SELECT bucket, n,
      |        sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
      |        (SELECT sum(n) FROM b) AS tot
      |      FROM b)
      |SELECT CAST((min(CASE WHEN cum * 2 >= tot THEN bucket END) + 1) * 25000 AS BIGINT) AS p50_upper,
      |       CAST((min(CASE WHEN cum * 10 >= tot * 9 THEN bucket END) + 1) * 25000 AS BIGINT) AS p90_upper
      |FROM c""".stripMargin))

  // The KLL estimate VALUES are merge-order-sensitive in their last digits,
  // so the registered rows emit the published rank-error guarantee as a
  // hash-checked verdict instead (the estimate's RANK within bound is a
  // yes/no fact per corpus). The raw estimates stay exposed for specs via
  // kllQuantilesRaw / kllByGroupRaw; ε-bounds are also property-tested in
  // QuantileSketchProps, and `sketch_quantile_hist` is the exactly-oracled
  // fixed-bin twin.
  private[graft] def kllQuantilesRaw(s: SparkSession, dir: String): DataFrame =
    Sketch.kllQuantiles(Tables.orders(s, dir), "o_totalprice", 256, Seq(0.5, 0.9))
      .select(round(element_at(col("qs"), 1), 2).as("p50_est"),
        round(element_at(col("qs"), 2), 2).as("p90_est"))

  private[graft] def kllByGroupRaw(s: SparkSession, dir: String): DataFrame =
    Sketch.kllQuantilesBy(Tables.customer(s, dir),
        "c_mktsegment", "c_acctbal", 256, Seq(0.5, 0.9))
      .select(col("c_mktsegment"),
        round(element_at(col("qs"), 1), 2).as("p50_est"),
        round(element_at(col("qs"), 2), 2).as("p90_est"))

  /** KLL rank-error bound for `k`-sketch quantile estimates, shared by the
    * two bound-check queries: 2·levels·n/k compaction slack (levels =
    * ⌈log2(n/k)⌉+1), floored at 3 ranks for the uncompacted small-n case
    * where the estimate is an exact order statistic. */
  protected def kllRankBound(n: Column, k: Int): Column = {
    val nD = n.cast("double")
    val levels = ceil(log(2.0, greatest(nD / k, lit(1.0)))) + lit(1.0)
    greatest(levels * nD / k * 2.0, lit(3.0))
  }

  /** Mergeable KLL quantile sketch (plans.KllQuantilesAgg), p50/p90 of
    * order totals, reported as its hash-checked rank-error verdict: the
    * estimates are nondeterministic in their last digits (merge order),
    * but whether each estimate's RANK lands within the published error
    * bound of its target rank is a yes/no fact — so THAT is the query
    * output, and the oracle (constant 1s) makes the gate fail if the
    * sketch ever drifts out of bound. Rank of each estimate is measured
    * against the full column in the same run. (Formerly the separate
    * `sketch_kll_bound` twin; folded here so the driver row is oracled.) */
  protected val sketchKllQuantiles = Q("sketch_kll_quantiles",
    (s, dir) => {
      val est = Sketch.kllQuantiles(Tables.orders(s, dir), "o_totalprice",
          256, Seq(0.5, 0.9))
        .select(element_at(col("qs"), 1).as("e50"),
          element_at(col("qs"), 2).as("e90"))
      val m = Tables.orders(s, dir)
        .select(col("o_totalprice").cast("double").as("x"))
        .crossJoin(broadcast(est))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") <= col("e50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("x") <= col("e90"), 1L).otherwise(0L)).as("r90"))
      val bound = kllRankBound(col("n"), 256)
      m.select(explode(array(
          struct(lit("p50").as("q"),
            (abs(col("r50") - col("n").cast("double") * 0.5) <= bound)
              .cast("int").as("within_bound")),
          struct(lit("p90").as("q"),
            (abs(col("r90") - col("n").cast("double") * 0.9) <= bound)
              .cast("int").as("within_bound")))).as("e"))
        .select(col("e.q").as("q"), col("e.within_bound").as("within_bound"))
    },
    Some("""SELECT 'p50' AS q, CAST(1 AS INTEGER) AS within_bound
      |UNION ALL SELECT 'p90', CAST(1 AS INTEGER)""".stripMargin))

  /** Per-group KLL quantiles (Sketch.kllQuantilesBy) as the per-group
    * rank-error verdict (same construction as sketch_kll_quantiles, per
    * market segment): one row per group, 1 iff that group's p50/p90
    * estimate ranks within the KLL bound of the target. a_percentiles is
    * the exact same-grouping twin. */
  protected val sketchKllByGroup = Q("sketch_kll_by_group",
    (s, dir) => {
      val est = Sketch.kllQuantilesBy(Tables.customer(s, dir),
          "c_mktsegment", "c_acctbal", 256, Seq(0.5, 0.9))
        .select(col("c_mktsegment"),
          element_at(col("qs"), 1).as("e50"), element_at(col("qs"), 2).as("e90"))
      val m = Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_acctbal").cast("double").as("x"))
        .join(broadcast(est), "c_mktsegment")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") <= col("e50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("x") <= col("e90"), 1L).otherwise(0L)).as("r90"))
      val bound = kllRankBound(col("n"), 256)
      m.select(col("c_mktsegment"),
        (abs(col("r50") - col("n").cast("double") * 0.5) <= bound)
          .cast("int").as("within_p50"),
        (abs(col("r90") - col("n").cast("double") * 0.9) <= bound)
          .cast("int").as("within_p90"))
    },
    Some("""SELECT DISTINCT c_mktsegment, CAST(1 AS INTEGER) AS within_p50,
      |  CAST(1 AS INTEGER) AS within_p90 FROM customer""".stripMargin))

  /** Array-function vocabulary (SURVEY §2.9: absent from the reference,
    * free in the engine) — sequence/slice/sort/position/join over a
    * per-row constructed array, each with its DuckDB list-function twin. */
  protected val cArrayFns = Q("c_array_fns",
    (s, dir) => Tables.nation(s, dir).select(
      col("n_nationkey"),
      size(sequence(lit(1), col("n_nationkey") + 1)).as("seq_len"),
      array_join(slice(sequence(lit(1), col("n_nationkey") + 1), 1, 3), "-")
        .as("first3"),
      array_position(sequence(lit(0), lit(24)), col("n_nationkey"))
        .cast("int").as("pos_in_range"),
      array_join(reverse(sequence(lit(1), pmod(col("n_nationkey"), lit(4)) + 1)), "-")
        .as("rev_joined")),
    Some("""SELECT n_nationkey,
      |  CAST(len(generate_series(1, n_nationkey + 1)) AS INTEGER) AS seq_len,
      |  array_to_string(list_slice(generate_series(1, n_nationkey + 1), 1, 3), '-') AS first3,
      |  CAST(list_position(generate_series(0, 24), n_nationkey) AS INTEGER) AS pos_in_range,
      |  array_to_string(list_reverse(generate_series(1, n_nationkey % 4 + 1)), '-') AS rev_joined
      |FROM nation""".stripMargin))

  /** Scalar string-function vocabulary parity (upper/substr/replace/…). */
  protected val cStringFns = Q("c_string_fns",
    (s, dir) => Tables.customer(s, dir).select(
      col("c_custkey"),
      upper(col("c_name")).as("upper_name"),
      substring(col("c_name"), 1, 8).as("prefix8"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
      length(col("c_name")).as("name_len"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged")),
    Some("""SELECT c_custkey, upper(c_name) AS upper_name, substr(c_name, 1, 8) AS prefix8,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  CAST(len(c_name) AS INTEGER) AS name_len,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged
      |FROM customer""".stripMargin))

  protected val sOrderbyLimit = Q("s_orderby_limit",
    (s, dir) => Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin))

  // ───────────────────────────── scalar functions ───────────────────────────

  protected val cTimeFns = Q("c_time_fns",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
        min(TimeFns.epochSeconds(TimeFns.toNewYork(col("o_orderdate")))).as("first_ny_epoch")),
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  count(*) AS n,
      |  min(epoch_ms(timezone('America/New_York', timezone('UTC', o_orderdate))) // 1000) AS first_ny_epoch
      |FROM orders GROUP BY 1, 2""".stripMargin))

  /** C3 — epoch-nanoseconds → µs → US/Eastern (reference `src/main.py:126-131`). */
  protected val cNanosEastern = Q("c_nanos_eastern",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.select(col("event_id"),
        TimeFns.nanosToMicros(col("ts")).as("ts_us"),
        TimeFns.epochSeconds(TimeFns.nanosToEastern(col("ts"))).as("eastern_epoch"),
        TimeFns.render(TimeFns.nanosToEastern(col("ts"))).as("eastern_str"))
    },
    Some("""SELECT event_id, epoch_ns(ts) // 1000 AS ts_us,
      |  epoch_ms(timezone('US/Eastern', timezone('UTC', make_timestamp(epoch_ns(ts) // 1000)))) // 1000 AS eastern_epoch,
      |  strftime(timezone('US/Eastern', timezone('UTC', make_timestamp(epoch_ns(ts) // 1000))), '%Y-%m-%d %H:%M:%S') AS eastern_str
      |FROM events""".stripMargin))

  /** C13 + ladder domain: deterministic pick, sign flip, −100 rule, decimal odds. */
  protected val oddsDomain = Q("odds_domain",
    (s, dir) => {
      val raw = OddsFns.ladderAt(pmod(col("l_partkey") * 3 + col("l_suppkey"), lit(291)))
      val flipped = when(pmod(col("l_orderkey"), lit(2)) === 0, -raw).otherwise(raw)
      val normalized = OddsFns.normalizeOdds(flipped)
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        raw.cast("int").as("raw_odds"),
        normalized.cast("int").as("norm_odds"),
        round(OddsFns.americanToDecimal(normalized), 4).as("decimal_odds"),
        OddsFns.isValidOdds(normalized.cast("int")).as("in_ladder"))
    },
    Some(s"""SELECT l_orderkey, l_linenumber,
      |  CAST(raw_odds AS INTEGER) AS raw_odds,
      |  CAST(norm_odds AS INTEGER) AS norm_odds,
      |  ROUND(CASE WHEN norm_odds > 0 THEN 1.0 + norm_odds / 100.0 ELSE 1.0 + 100.0 / (-norm_odds) END, 4) AS decimal_odds,
      |  list_contains($ladderSql, CAST(norm_odds AS INTEGER)) AS in_ladder
      |FROM (
      |  SELECT *, CASE WHEN l_orderkey % 2 = 0 THEN -raw_odds ELSE raw_odds END AS flipped,
      |    CASE WHEN (CASE WHEN l_orderkey % 2 = 0 THEN -raw_odds ELSE raw_odds END) = -100 THEN 100
      |         ELSE (CASE WHEN l_orderkey % 2 = 0 THEN -raw_odds ELSE raw_odds END) END AS norm_odds
      |  FROM (
      |    SELECT l_orderkey, l_linenumber,
      |      ($ladderSql)[CAST((l_partkey * 3 + l_suppkey) % 291 AS INTEGER) + 1] AS raw_odds
      |    FROM lineitem))""".stripMargin))

  /** Native Catalyst expressions (graft.plans) registered in the session's
    * function registry and invoked through SQL — tier-(b) codegen'd
    * scalar functions. */
  protected val oddsNativeExpr = Q("odds_native_expr",
    (s, dir) => {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "normalize_odds", exprs => graft.plans.NormalizeOdds(exprs.head), "built-in")
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "american_to_decimal", exprs => graft.plans.AmericanToDecimal(exprs.head), "built-in")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          OddsFns.ladderAt(pmod(col("l_partkey"), lit(291))).cast("int").as("raw_odds"))
        .withColumn("flipped",
          when(pmod(col("l_linenumber"), lit(2)) === 0, -col("raw_odds"))
            .otherwise(col("raw_odds")))
        .select(col("l_orderkey"), col("l_linenumber"),
          call_function("normalize_odds", col("flipped")).as("norm_odds"),
          round(call_function("american_to_decimal",
            call_function("normalize_odds", col("flipped"))), 4).as("decimal_odds"))
    },
    Some(s"""SELECT l_orderkey, l_linenumber,
      |  CAST(norm AS INTEGER) AS norm_odds,
      |  ROUND(CASE WHEN norm > 0 THEN 1.0 + norm / 100.0 ELSE 1.0 + 100.0 / (-norm) END, 4) AS decimal_odds
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN flipped = -100 THEN 100 ELSE flipped END AS norm
      |  FROM (
      |    SELECT l_orderkey, l_linenumber,
      |      CASE WHEN l_linenumber % 2 = 0 THEN -raw ELSE raw END AS flipped
      |    FROM (SELECT l_orderkey, l_linenumber,
      |            ($ladderSql)[CAST(l_partkey % 291 AS INTEGER) + 1] AS raw
      |          FROM lineitem)))""".stripMargin))

  /** Rollup with grouping flags (engine capability beyond the reference —
    * SURVEY.md §2.9 lists these as absent there, free here). */
  protected val aggRollup = Q("agg_rollup",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status")),
    Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin))

  /** Explicit GROUPING SETS (the general form rollup/cube specialize),
    * through the engine's SQL face — the frames register as temp views and
    * `spark.sql` runs the same text DuckDB does (modulo the BIGINT cast). */
  protected val aggGroupingSets = Q("agg_grouping_sets",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin))

  /** Wide → long unpivot (melt): the inverse of agg_pivot, Spark's native
    * `unpivot` against DuckDB's UNPIVOT. Metrics are computed as exact
    * decimals first so the melted value column is cross-engine stable. */
  protected val aggUnpivot = Q("agg_unpivot",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        decSum(col("o_totalprice")).as("sum_total"),
        countDistinct(col("o_custkey")).cast("double").as("n_custs"))
      .unpivot(Array(col("o_orderstatus")),
        Array(col("n_orders"), col("sum_total"), col("n_custs")),
        "metric", "value"),
    Some("""WITH w AS (SELECT o_orderstatus,
      |  CAST(count(*) AS DOUBLE) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
      |  CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_custs
      |FROM orders GROUP BY 1)
      |UNPIVOT w ON n_orders, sum_total, n_custs INTO NAME metric VALUE value""".stripMargin))

  /** Incremental aggregate maintenance (IncrementalAgg): three year-sliced
    * batches of orders each build mergeable per-key state; the merged +
    * finalized result must equal one aggregate over everything — which is
    * exactly what the oracle computes, knowing nothing of the split. In
    * production the history state is a persisted artifact and only the new
    * batch is aggregated; history raw rows are never rescanned. */
  protected val aggIncrMaintain = Q("agg_incr_maintain",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val y99 = lit("1999-01-01 00:00:00").cast("timestamp")
      val y00 = lit("2000-01-01 00:00:00").cast("timestamp")
      IncrementalAgg.finalizeState(IncrementalAgg.merge(Seq(
        IncrementalAgg.orderState(orders.where(col("o_orderdate") < y99)),
        IncrementalAgg.orderState(
          orders.where(col("o_orderdate") >= y99 && col("o_orderdate") < y00)),
        IncrementalAgg.orderState(orders.where(col("o_orderdate") >= y00)))))
    },
    Some("""SELECT o_custkey AS key, count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_total,
      |  min(epoch_ms(o_orderdate) // 1000) AS first_ts,
      |  max(epoch_ms(o_orderdate) // 1000) AS last_ts,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) // count(*) AS avg_cents
      |FROM orders GROUP BY 1""".stripMargin))

  /** Incremental DISTINCT-count maintenance (IncrementalAgg.distinctState):
    * three event_id-sliced batches each sketch distinct users per
    * event_type; the per-key HLL union must estimate within 2% of one
    * sketch over everything (dense-mode unions are bit-identical — the
    * HllShardSpec claim; at sketch-mode boundaries coupon→dense promotion
    * can differ by a count or two, hence a flag not an equality) and land
    * within the published HLL envelope of the exact count (9% ≈ 5σ at
    * lgK 12). The oracle recomputes the exact side and expects both flags
    * true. */
  protected val aggIncrDistinct = Q("agg_incr_distinct",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"))
      val batches = (0 to 2).map(i =>
        IncrementalAgg.distinctState(
          ev.where(pmod(col("event_id"), lit(3)) === i), "event_type", "user_id"))
      val merged = IncrementalAgg.finalizeDistinct(
        IncrementalAgg.mergeDistinct(batches))
      val whole = IncrementalAgg.finalizeDistinct(IncrementalAgg.mergeDistinct(
          Seq(IncrementalAgg.distinctState(ev, "event_type", "user_id"))))
        .withColumnRenamed("n_distinct_est", "whole_est")
      val exact = ev.groupBy(col("event_type").as("key"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      merged.join(whole, "key").join(exact, "key")
        .select(col("key").as("event_type"), col("n_exact"),
          (abs(col("n_distinct_est") - col("whole_est")) * 100
            <= greatest(col("whole_est"), lit(1L)) * 2)
            .cast("int").as("est_near_whole"),
          (abs(col("n_distinct_est") - col("n_exact")) * 100 <= col("n_exact") * 9)
            .cast("int").as("hll_within_bound"))
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_exact,
      |  CAST(1 AS INTEGER) AS est_near_whole, CAST(1 AS INTEGER) AS hll_within_bound
      |FROM events GROUP BY 1""".stripMargin))

  /** Correlated scalar subquery (decorrelated by Catalyst into a join —
    * the declarative form survives scale because the optimizer rewrites
    * it; left as a subquery in both engines' SQL). */
  protected val jScalarSubquery = Q("j_scalar_subquery",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v2")
      s.sql("""SELECT c_custkey, c_mktsegment,
        |  (SELECT max(o_totalprice) FROM orders_v2 o WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer_v c""".stripMargin)
    },
    Some("""SELECT c_custkey, c_mktsegment,
      |  (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c""".stripMargin))

  protected val aggCube = Q("agg_cube",
    (s, dir) => Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total")),
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin))

  // ─────────────────────── flagship flatten + seeding ───────────────────────

  /** Flagship oracle, parameterized on the market_updated rendering so the
    * strict-C4 variant (no-lines branch in an explicit machine zone) reuses
    * the whole 25-column derivation. */
  protected def flagshipOracleWith(marketUpdatedSql: String): String = {
    val fmtRender = "%Y-%m-%d %H:%M:%S"
    s"""WITH base AS (
      |  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_orderstatus,
      |         l.l_linenumber, l.l_partkey, l.l_quantity, l.l_extendedprice, l.l_discount,
      |         l.l_returnflag, l.l_linestatus, l.l_shipdate, t.k
      |  FROM orders o
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  CROSS JOIN (VALUES (1), (2), (3)) t(k)
      |  WHERE (l.l_linenumber % 2 = 0 AND t.k <= 2) OR (l.l_linenumber % 2 = 1)
      |)
      |SELECT
      |  CAST(o_orderkey AS VARCHAR) AS event_id,
      |  CASE WHEN l_linenumber % 2 = 0
      |    THEN strftime(timezone('America/New_York', timezone('UTC', o_orderdate)), '$fmtRender')
      |    ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') END AS event_scheduled_time,
      |  concat('Order #', CAST(o_orderkey AS VARCHAR)) AS event_name,
      |  concat('Cust ', CAST(o_custkey AS VARCHAR)) AS competitor1_name,
      |  concat('C', CAST(o_custkey % 100 AS VARCHAR)) AS competitor1_abbr,
      |  'home' AS competitor1_side,
      |  concat('Opp ', CAST(o_orderkey % 97 AS VARCHAR)) AS competitor2_name,
      |  CASE WHEN o_orderkey % 11 = 0 THEN '' ELSE concat('O', CAST(o_orderkey % 97 AS VARCHAR)) END AS competitor2_abbr,
      |  'away' AS competitor2_side,
      |  concat('m', CAST(o_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS market_id,
      |  concat('Market ', l_returnflag) AS market_name,
      |  CASE WHEN l_linenumber % 3 = 0 THEN 'moneyline' WHEN l_linenumber % 3 = 1 THEN 'spread' ELSE 'total' END AS market_type,
      |  CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'settled' END AS market_status,
      |  CASE WHEN l_linenumber % 2 = 0 THEN concat('ml', CAST(o_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) ELSE 'NA' END AS line_id,
      |  CASE WHEN l_linenumber % 2 = 0 THEN concat('Line ', CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)) ELSE 'NA' END AS line_name,
      |  CASE WHEN l_linenumber % 2 = 0 THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) ELSE 'NA' END AS line_value,
      |  CASE WHEN l_linenumber % 2 = 1 THEN 'NA'
      |       WHEN l_partkey % 7 = 0 THEN 'NA'
      |       WHEN l_partkey % 2 = 0 THEN 'home' ELSE 'away' END AS line_favourite,
      |  CASE WHEN l_linenumber % 2 = 0 THEN 'points' ELSE 'NA' END AS line_type,
      |  concat('s', CAST(o_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR), '-', CAST(k AS VARCHAR)) AS selection_id,
      |  concat('Sel ', CAST(k AS VARCHAR)) AS selection_name,
      |  CAST(($ladderSql)[CAST((l_partkey * 7 + l_linenumber * 13 + k * 31) % 291 AS INTEGER) + 1] AS VARCHAR) AS selection_odds,
      |  CASE WHEN o_orderstatus = 'F' THEN 'finished' WHEN o_orderstatus = 'O' THEN 'open' ELSE 'live' END AS event_status,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS selection_stake,
      |  CAST(CAST(l_discount * 100 AS DECIMAL(8,2)) AS VARCHAR) AS selection_value,
      |  $marketUpdatedSql AS market_updated
      |FROM base""".stripMargin
  }

  /** DuckDB render of the fixture's epoch-shipdate in `tz`. */
  protected def muRenderSql(tz: String): String =
    s"strftime(timezone('$tz', timezone('UTC', make_timestamp((epoch_ms(l_shipdate) // 1000) * 1000000))), '%Y-%m-%d %H:%M:%S')"

  protected val flagshipOracle: String = flagshipOracleWith(muRenderSql("US/Eastern"))

  // Reads the PERSISTED nested fixture (production shape — the source
  // delivers the event→markets→lines tree; bench hygiene, VERDICT r8 #4):
  // the bench row measures the flatten over a nested parquet scan, not
  // on-the-fly fixture synthesis. Results bit-identical; oracle unchanged.
  protected val xFlagshipFlatten = Q("x_flagship_flatten",
    (s, dir) => Flatten.flatten25(BettingFixture.sportEventsCached(s, dir)),
    Some(flagshipOracle), bench = true)

  /** C4 strict parity: the reference rendered the no-lines branch's
    * market_updated in the PROCESS-local zone (`src/main.py:172-174`); the
    * engine's default normalizes both branches to US/Eastern (C3). This
    * variant names the machine zone explicitly (America/Chicago here) —
    * deterministic, so the one remaining semantic divergence from the
    * reference is now covered by a hash-exact oracle instead of a doc note. */
  protected val xFlagshipC4Strict = Q("x_flagship_c4strict",
    (s, dir) => Flatten.flatten25(BettingFixture.sportEventsCached(s, dir),
      noLinesTz = Some("America/Chicago")),
    Some(flagshipOracleWith(
      s"""CASE WHEN l_linenumber % 2 = 0 THEN ${muRenderSql("US/Eastern")}
         |       ELSE ${muRenderSql("America/Chicago")} END""".stripMargin)))

  /** X3 — branch union with differing column order, resolved by name. */
  protected val x3BranchUnion = Q("x3_branch_union",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val urgent = o.where(col("o_orderpriority").startsWith("1"))
        .select(col("o_orderkey"), lit("urgent").as("bucket"), col("o_totalprice"))
      val other = o.where(!col("o_orderpriority").startsWith("1"))
        .select(col("o_totalprice"), col("o_orderkey"), lit("other").as("bucket"))
      urgent.unionByName(other)
    },
    Some("""SELECT o_orderkey, 'urgent' AS bucket, o_totalprice FROM orders
      |WHERE o_orderpriority LIKE '1%'
      |UNION ALL
      |SELECT o_orderkey, 'other' AS bucket, o_totalprice FROM orders
      |WHERE o_orderpriority NOT LIKE '1%'""".stripMargin))

  /** Set operations (intersect / except — absent from the reference,
    * SURVEY.md §2.9; free in the engine). */
  protected val xSetOps = Q("x_set_ops",
    (s, dir) => {
      val building = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val finished = Tables.orders(s, dir)
        .where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey")).distinct()
      building.intersect(finished).withColumn("tag", lit("both"))
        .unionByName(building.except(finished).withColumn("tag", lit("only_building")))
    },
    Some("""SELECT c_custkey, 'both' AS tag FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT c_custkey, 'only_building' AS tag FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin))

  protected val seedingPipeline = Q("seeding_pipeline",
    (s, dir) => Seeding.seededEvents(s, dir),
    Some("""SELECT o.o_orderkey AS event_id, o.o_custkey % 5 AS tournament_id,
      |  r.r_name AS tournament_name,
      |  CASE WHEN o.o_orderstatus = 'F' THEN 'finished' WHEN o.o_orderstatus = 'O' THEN 'open' ELSE 'live' END AS event_status,
      |  m.n_markets, m.n_moneyline
      |FROM orders o
      |JOIN region r ON r.r_regionkey = o.o_custkey % 5
      |JOIN (SELECT l_orderkey, count(*) AS n_markets,
      |        CAST(sum(CASE WHEN l_linenumber % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moneyline
      |      FROM lineitem GROUP BY l_orderkey) m ON m.l_orderkey = o.o_orderkey
      |WHERE r.r_name IN ('AMERICA', 'ASIA', 'EUROPE')""".stripMargin), bench = true)

  /** S2 through the parameterized DSv2 connector (VERDICT r15 #7): the
    * interest branch exercises IN-pushdown into the source, the param
    * branch the endpoint-side `tournament_id` query parameter (the S3
    * contract). Oracled against `region.parquet` — pins the rule-derived
    * fixture rows ≡ the stored region universe at every SF. */
  protected val s2MetaScan = Q("s2_meta_scan",
    (s, dir) => {
      val meta = s.read.format("graft.sources.SeedMetaSource")
        .option("table", "tournaments")
      meta.load()
        .where(col("tournament_name").isin(BettingFixture.InterestedTournaments: _*))
        .withColumn("src", lit("interest"))
        .unionByName(meta.option("tournament_id", "4").load()
          .withColumn("src", lit("param")))
    },
    Some("""SELECT r_regionkey AS tournament_id, r_name AS tournament_name,
      |       'interest' AS src
      |FROM region WHERE r_name IN ('AMERICA', 'ASIA', 'EUROPE')
      |UNION ALL
      |SELECT r_regionkey, r_name, 'param' FROM region WHERE r_regionkey = 4""".stripMargin))

  /** The seeding DAG with its tournaments dim served by the DSv2
    * connector instead of the parquet region scan — same oracle as
    * `seeding_pipeline`, proving the source composes into the real
    * pipeline with identical results. */
  protected val seedingPipelineDsv2 = Q("seeding_pipeline_dsv2",
    (s, dir) => Seeding.seededEventsDsv2(s, dir),
    seedingPipeline.oracle)

  /** MERGE / CDC-apply (operators.Upsert): the events stream becomes an
    * UPSERT/DELETE change log folded into the customer snapshot — latest
    * change per key wins, deletes drop the key, untouched keys pass
    * through. Oracle is the equivalent windowed-dedup + full outer join. */
  protected val uMergeUpsert = Q("u_merge_upsert",
    (s, dir) => {
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val changes = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "error"))
        .select((col("user_id") + 1).as("c_custkey"),
          when(col("event_type") === "error", "DELETE").otherwise("UPSERT").as("op"),
          concat(lit("upd_"), col("event_id")).as("c_name"),
          round(col("value"), 2).as("c_acctbal"),
          TimeFns.nanosToMicros(col("ts")).as("tsn"), col("event_id"))
      Upsert.applyChanges(base, changes, "c_custkey",
        Seq("c_name", "c_acctbal"), "op", "tsn", "event_id")
    },
    Some("""WITH ch AS (
      |  SELECT user_id + 1 AS c_custkey,
      |    CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
      |    concat('upd_', CAST(event_id AS VARCHAR)) AS c_name,
      |    ROUND(value, 2) AS c_acctbal,
      |    epoch_ns(ts) // 1000 AS tsn, event_id
      |  FROM events WHERE event_type IN ('purchase', 'error')),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY tsn DESC, event_id DESC) AS rn
      |    FROM ch) WHERE rn = 1)
      |SELECT coalesce(l.c_custkey, b.c_custkey) AS c_custkey,
      |  CASE WHEN l.op = 'UPSERT' THEN l.c_name ELSE b.c_name END AS c_name,
      |  CASE WHEN l.op = 'UPSERT' THEN l.c_acctbal ELSE b.c_acctbal END AS c_acctbal
      |FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
      |WHERE l.op IS NULL OR l.op = 'UPSERT'""".stripMargin))

  /** Dataset-version diff (Upsert.snapshotDiff): two snapshots derived
    * from documents — A drops doc_id % 11 = 0, B drops % 13 = 0 and
    * rewrites every % 5 = 0 text — and the diff must classify every key as
    * added/removed/changed/unchanged via the length-prefixed md5
    * fingerprint both engines recompute independently (the oracle
    * coalesces each field to 'null' exactly like the Scala side, so a
    * fixture regeneration introducing NULL text/lang stays hash-equal). */
  protected val uSnapshotDiff = Q("u_snapshot_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val snapA = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
      val snapB = docs.where(pmod(col("doc_id"), lit(13)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Upsert.snapshotDiff(snapA, snapB, "doc_id", Seq("text", "lang"))
    },
    Some("""WITH a AS (SELECT doc_id,
      |    md5(CAST(length(coalesce(text, 'null')) AS VARCHAR) || ' ' || coalesce(text, 'null') || ' ' ||
      |        CAST(length(coalesce(lang, 'null')) AS VARCHAR) || ' ' || coalesce(lang, 'null')) AS fp_a
      |  FROM documents WHERE doc_id % 11 <> 0),
      |b0 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text, lang
      |  FROM documents WHERE doc_id % 13 <> 0),
      |b AS (SELECT doc_id,
      |    md5(CAST(length(coalesce(text, 'null')) AS VARCHAR) || ' ' || coalesce(text, 'null') || ' ' ||
      |        CAST(length(coalesce(lang, 'null')) AS VARCHAR) || ' ' || coalesce(lang, 'null')) AS fp_b
      |  FROM b0)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN a.doc_id IS NULL THEN 'added'
      |       WHEN b.doc_id IS NULL THEN 'removed'
      |       WHEN fp_a <> fp_b THEN 'changed' ELSE 'unchanged' END AS status,
      |  fp_a, fp_b
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin))

  /** SCD Type-2 history (Upsert.scd2FromChanges): every UPSERT becomes a
    * version row with [valid_from, valid_to); a later change of either op
    * closes the previous version. Same change log as u_merge_upsert. */
  protected val uScd2History = Q("u_scd2_history",
    (s, dir) => {
      val changes = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "error"))
        .select((col("user_id") + 1).as("c_custkey"),
          when(col("event_type") === "error", "DELETE").otherwise("UPSERT").as("op"),
          concat(lit("upd_"), col("event_id")).as("c_name"),
          round(col("value"), 2).as("c_acctbal"),
          TimeFns.nanosToMicros(col("ts")).as("tsn"), col("event_id"))
      Upsert.scd2FromChanges(changes, "c_custkey",
        Seq("c_name", "c_acctbal"), "op", "tsn", "event_id")
    },
    Some("""WITH ch AS (
      |  SELECT user_id + 1 AS c_custkey,
      |    CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
      |    concat('upd_', CAST(event_id AS VARCHAR)) AS c_name,
      |    ROUND(value, 2) AS c_acctbal,
      |    epoch_ns(ts) // 1000 AS tsn, event_id
      |  FROM events WHERE event_type IN ('purchase', 'error')),
      |v AS (
      |  SELECT *, lead(tsn) OVER (PARTITION BY c_custkey ORDER BY tsn, event_id) AS valid_to
      |  FROM ch)
      |SELECT c_custkey, c_name, c_acctbal, tsn AS valid_from, valid_to,
      |  CAST(valid_to IS NULL AS INTEGER) AS is_current
      |FROM v WHERE op = 'UPSERT'""".stripMargin))

  // ─────────────────────── streaming-semantics (batch form) ─────────────────

  protected val wagerBookReplay = Q("wager_book_replay",
    (s, dir) => WagerBook.batchReplay(WagerBook.commandsFromEvents(Tables.events(s, dir))),
    Some("""WITH c AS (
      |  SELECT epoch_ns(ts) // 1000 AS tsn, event_id,
      |    concat('w', CAST(user_id % 50 AS VARCHAR)) AS external_id,
      |    CASE WHEN event_type = 'purchase' THEN 'PLACE' WHEN event_type = 'error' THEN 'CANCEL'
      |         WHEN event_type = 'signup' AND event_id % 211 = 0 THEN 'CANCEL_ALL' ELSE 'NOOP' END AS op,
      |    CASE WHEN event_id % 20 = 0 THEN 404 WHEN event_id % 20 = 1 THEN 500 ELSE 200 END AS http,
      |    concat('srv', CAST(event_id AS VARCHAR)) AS wager_id,
      |    ROUND(value, 2) AS stake
      |  FROM events),
      |eff AS (
      |  SELECT * FROM c
      |  WHERE (op = 'PLACE' AND http = 200) OR (op = 'CANCEL' AND http IN (200, 404))),
      |last_eff AS (
      |  SELECT *, row_number() OVER (PARTITION BY external_id ORDER BY tsn DESC, event_id DESC) AS rn
      |  FROM eff),
      |ca AS (
      |  SELECT coalesce(max(tsn), -9223372036854775808) AS ca_tsn FROM c
      |  WHERE op = 'CANCEL_ALL' AND http = 200),
      |ca2 AS (
      |  SELECT ca_tsn, coalesce((SELECT max(event_id) FROM c
      |    WHERE op = 'CANCEL_ALL' AND http = 200 AND tsn = ca.ca_tsn),
      |    -9223372036854775808) AS ca_eid FROM ca)
      |SELECT external_id, wager_id, CAST(stake AS DOUBLE) AS stake
      |FROM last_eff, ca2 WHERE rn = 1 AND op = 'PLACE'
      |  AND (tsn > ca_tsn OR (tsn = ca_tsn AND event_id > ca_eid))""".stripMargin),
    bench = true)

  /** Event-time tumbling window (batch form of the streaming upgrade). */
  protected val tWindowHourly = Q("t_window_hourly",
    (s, dir) => Tables.events(s, dir)
      .groupBy(
        TimeFns.epochSeconds(date_trunc("HOUR", TimeFns.nanosToTimestamp(col("ts"))))
          .as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value"), "14,2").as("sum_value")),
    Some("""SELECT epoch_ms(date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000))) // 1000 AS hour_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin), bench = true)

  /** Event-time session windows (30-minute gap) — the full idiomatic
    * event-time surface next to tumbling windows; the oracle is the
    * classic gaps-and-islands rewrite. */
  protected val tSessionWindows = Q("t_session_windows",
    (s, dir) => Tables.events(s, dir)
      .select(col("user_id"),
        TimeFns.nanosToTimestamp(col("ts")).as("et"), col("value"))
      .groupBy(col("user_id"), session_window(col("et"), "30 minutes"))
      .agg(count(lit(1)).as("n"), decSum(col("value"), "14,2").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n"), col("sum_value")),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
      |o AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                     OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
      |                                  ROWS UNBOUNDED PRECEDING) AS sid FROM o)
      |SELECT user_id, min(us) AS session_start_us, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid""".stripMargin), bench = true)

  /** T4 decode round-trip (+T1/T2 routing): encode deterministic frames,
    * decode them back; the oracle is the identity projection. */
  protected val decodeRoundtrip = Q("decode_roundtrip",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val updates = li.select(
        concat(lit("m"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("market_id"),
        col("l_orderkey").as("event_id"),
        pmod(col("l_suppkey"), lit(5)).as("tournament_id"),
        when(col("l_linestatus") === "O", "open").otherwise("settled").as("status"),
        OddsFns.ladderAt(pmod(col("l_partkey"), lit(291))).cast("int").as("odds"),
        (unix_timestamp(col("l_shipdate")) * lit(1000000000L)).as("updated_at"),
        when(pmod(col("l_orderkey"), lit(2)) === 0, "broadcast-main")
          .otherwise("private-user").as("channel"),
        concat(lit("tournament_"), pmod(col("l_suppkey"), lit(5))).as("event_name"))
      // `raw` goes through a Stage barrier: without it, the routing
      // filters inline the WHOLE encode expression and Catalyst pushes
      // that predicate below Tables' fan-out repartition — onto the
      // 1-task single-row-group scan, serializing the heavy encode on one
      // core (measured 5.5 s vs 1.7 s at sf0.1/local[32]). The barrier
      // pins encode+route above the exchange, which also mirrors
      // production: a frame log's `raw` is a STORED column, never an
      // expression a filter could inline. See NOTES.md round 5.
      val frames = graft.plans.Stage(updates, "raw", DecodeFns.encodeFrame(
        col("channel"), col("event_name"),
        struct(col("market_id"), col("event_id"), col("tournament_id"),
          col("status"), col("odds"), col("updated_at")))).select(col("raw"))
      EventStreams.tournamentLeg(EventStreams.decodeFrames(frames), 0L until 5L)
        .select(col("event_name"),
          col("update.market_id").as("market_id"), col("update.event_id").as("event_id"),
          col("update.tournament_id").as("tournament_id"), col("update.status").as("status"),
          col("update.odds").as("odds"), col("update.updated_at").as("updated_at"))
    },
    Some(s"""SELECT concat('tournament_', CAST(l_suppkey % 5 AS VARCHAR)) AS event_name,
      |  concat('m', CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS market_id,
      |  l_orderkey AS event_id, l_suppkey % 5 AS tournament_id,
      |  CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'settled' END AS status,
      |  CAST(($ladderSql)[CAST(l_partkey % 291 AS INTEGER) + 1] AS INTEGER) AS odds,
      |  (epoch_ms(l_shipdate) // 1000) * 1000000000 AS updated_at
      |FROM lineitem WHERE l_orderkey % 2 = 0""".stripMargin), bench = true)

  /** The raw seeded Bernoulli sample (specs exercise it; the registered
    * row below reports its hash-checked concentration verdict instead —
    * the sampled id SET depends on engine RNG + partitioning, so it can
    * never match a cross-engine oracle). */
  private[graft] def sampleBernoulliRaw(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).sample(0.3, 42).select(col("event_id"), col("event_type"))

  /** F6 — seeded Bernoulli sample, reported as its concentration gate:
    * the sample FRACTION concentrates hard around 0.3, so the query emits
    * whether it landed within 6 binomial sigmas and the constant-1 oracle
    * turns any broken sampler into a gate failure. `f_hash_sample` is the
    * exactly-oracled deterministic twin. (Formerly the separate
    * `f_sample_bound` twin; folded here so the driver row is oracled.) */
  protected val fSampleBernoulli = Q("f_sample_bernoulli",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.agg(count(lit(1)).as("n_total"))
        .crossJoin(e.sample(0.3, 42).agg(count(lit(1)).as("n_sampled")))
        .select(col("n_total"),
          (abs(col("n_sampled").cast("double") / col("n_total") - 0.3) <=
            lit(6.0) * sqrt(lit(0.3 * 0.7)) / sqrt(col("n_total").cast("double")))
            .cast("int").as("frac_within_6sigma"))
    },
    Some("""SELECT count(*) AS n_total, CAST(1 AS INTEGER) AS frac_within_6sigma
      |FROM events""".stripMargin))

  /** Deterministic ~30% hash-sample — the reproducible alternative to
    * seeded RNG sampling at pipeline scale: membership is a pure function
    * of the row key, so the sample is stable across engines, retries,
    * partitionings, and reruns (and therefore fully oracle-checkable,
    * which `rand(seed)` never is cross-engine). md5 is the portable hash. */
  protected val fHashSample = Q("f_hash_sample",
    (s, dir) => Tables.events(s, dir)
      .where(conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100 < 30)
      .select(col("event_id"), col("event_type")),
    Some("""SELECT event_id, event_type FROM events
      |WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 30""".stripMargin))

  /** S1 — the odds-ladder scan through the DataSource V2 connector, joined
    * against lineitem-derived picks to prove it composes as a real table. */
  protected val s1LadderScan = Q("s1_ladder_scan",
    (s, dir) => s.read.format("graft.sources.OddsLadderSource").load()
      .groupBy(col("band_step"))
      .agg(count(lit(1)).as("n_odds"), min(col("odds")).as("min_odds"),
        max(col("odds")).as("max_odds")),
    Some {
      val rows = graft.sources.OddsLadderSource.rows
        .map { case (o, st) => s"($o, $st)" }.mkString(", ")
      s"""SELECT band_step, count(*) AS n_odds, min(odds) AS min_odds, max(odds) AS max_odds
        |FROM (SELECT * FROM (VALUES $rows) t(odds, band_step))
        |GROUP BY band_step""".stripMargin
    })

  /** The raw per-wager UUID projection (specs exercise it; the registered
    * row below verifies it per-row instead — the uuid VALUES are random
    * and can never match a cross-engine oracle). */
  private[graft] def uuidWagersRaw(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(expr("uuid()").as("external_id"), col("event_id").as("line_id"),
        round(col("value"), 2).as("stake"))

  /** C11 — per-wager UUID generation (`uuid.uuid1()`,
    * `src/mm_calls.py:245,265`), verified per row: the uuids themselves
    * are random, but each row's RFC-4122 v4 shape and the set's mutual
    * distinctness are exact facts — so the query keeps one row per wager
    * (deterministic keys + stake) with the uuid replaced by its verdicts,
    * and the constant-1 oracle fails if generation ever breaks. (Formerly
    * the separate aggregate-only `c11_uuid_bound` twin; folded here, at
    * row granularity, so the driver row is oracled.) */
  protected val c11UuidWagers = Q("c11_uuid_wagers",
    (s, dir) => {
      val w = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(expr("uuid()").as("u"), col("event_id").as("line_id"),
          round(col("value"), 2).as("stake"))
      val distinctOk = w.agg(
        (countDistinct(col("u")) === count(lit(1))).cast("int").as("all_distinct"))
      // 1-row aggregate broadcast — the crossJoin never expands.
      w.crossJoin(broadcast(distinctOk))
        .select(col("line_id"), col("stake"),
          col("u").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
            .cast("int").as("v4_format"),
          col("all_distinct"))
    },
    Some("""SELECT event_id AS line_id, round(value, 2) AS stake,
      |  CAST(1 AS INTEGER) AS v4_format, CAST(1 AS INTEGER) AS all_distinct
      |FROM events WHERE event_type = 'purchase'""".stripMargin))

  /** This family's registrar — composed into [[Queries.all]]. */
  protected def relationalQs: Seq[Q] = Seq(
    q1PricingSummary, f1IsinFilter, f2EqFilterJson, xVariantShred,
    xVariantHetero, j1JoinAgg, j1StrkeyJoin, j2SemiJoin,
    jAntiJoin, j3ChainAgg, jAsofJoin, jAsofNearest,
    jRangeJoin, a1Counts, a3CollectIds, a4LastWins,
    a5Scalar, aSaltedAgg, aPercentiles, aColumnProfile,
    aKeySkew, jSaltedJoin, cNullFns, tGapfill,
    wTopkPerGroup, wTopkPlan, wRunningSum, wLagLead,
    wNtile, wPctRank, wFirstNth, aHistogram,
    sOrderbyLimit, cStringFns, cArrayFns, cMapFns,
    cTimeFns, cNanosEastern, oddsDomain, oddsNativeExpr,
    aggRollup, aggCube, aggPivot, aggGroupingSets,
    aggUnpivot, aggIncrMaintain, aggIncrDistinct, jScalarSubquery,
    xFlagshipFlatten, xFlagshipC4Strict, x3BranchUnion, xSetOps,
    seedingPipeline, s2MetaScan, seedingPipelineDsv2,
    uMergeUpsert, uScd2History, uSnapshotDiff,
    wagerBookReplay, tWindowHourly, tSessionWindows, decodeRoundtrip,
    fSampleBernoulli, s1LadderScan, c11UuidWagers, fHashSample,
    sketchQuantileHist, sketchKllQuantiles, sketchKllByGroup)
}
