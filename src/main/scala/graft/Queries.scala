package graft

import graft.functions.{Bpe, DecodeFns, OddsFns, TextFns, TimeFns}
import graft.functions.SimFns.toDouble
import graft.operators._
import graft.sources.BettingFixture
import graft.streaming.{EventStreams, WagerBook}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The oracle-checked query inventory (SURVEY.md §2): every SQL-expressible
  * operator gets a Spark implementation and a DuckDB-equivalent oracle over
  * the same parquet tables.
  *
  * Cross-engine determinism rules used throughout (SURVEY.md §5.1):
  *  - money math goes through DECIMAL (exact, order-independent) and is cast
  *    to double only at the end — bit-identical in both engines;
  *  - integer sums are cast to BIGINT (DuckDB's sum(int) is HUGEINT);
  *  - no timestamp-typed output columns — epochs (floor semantics both
  *    sides) or rendered strings instead;
  *  - hashes are md5/sha256 (identical in both engines), never xxhash64;
  *  - every ranking has a total-order tie-break;
  *  - DuckDB ROUND preserves IEEE -0.0 where Spark's round (BigDecimal)
  *    always yields +0.0 — any oracle-side ROUND whose argument can be a
  *    tiny negative gets `+ 0.0` appended (-0.0 + 0.0 = +0.0, every other
  *    value bit-unchanged).
  */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** `oracle` is static DuckDB SQL; `oracleFn` derives the SQL from the data
    * at verify time (for queries whose oracle interpolates data-dependent —
    * but bit-deterministic — literals, e.g. trained k-means centroids).
    * A query has one or the other, never both. */
  final case class Q(name: String, fn: QueryFn, oracle: Option[String],
      bench: Boolean = false,
      oracleFn: Option[(SparkSession, String) => String] = None)

  private def decSum(c: Column, scale: String = "18,2"): Column =
    sum(c.cast(s"decimal($scale)")).cast("double")

  private def ladderSql: String = OddsFns.Ladder.mkString("[", ", ", "]")

  /** Per-SF-dir PERSISTED-ARTIFACT path for the incremental-index demos
    * (parquet centroid / positional-batch indexes): the production
    * posture is "build the index ONCE, store it, every later job loads
    * it" — so the demo queries write the artifact on first touch and
    * load it afterwards, across JVMs (Verify builds, Bench reads warm).
    * Lives under java.io.tmpdir, keyed by the sanitized sfDir + a name
    * that must encode every build parameter (the `v1` tag versions the
    * layout so a format change never reads a stale artifact). */
  private def artifactPath(dir: String, name: String): String = {
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_artifacts_v1/" + dir.replaceAll("[^A-Za-z0-9.]+", "_"))
    root.mkdirs()
    new java.io.File(root, name).getAbsolutePath
  }

  /** One lock object per artifact path: sbt runs suites concurrently in
    * ONE JVM, so two threads building the same artifact must serialize
    * (review r12 — a shared pid-keyed tmp dir could rename a torn write
    * into place). Cross-JVM the tmp names differ (pid + nanos) and the
    * rename race stays benign: both builds are deterministic, the loser
    * deletes its copy. */
  private val artifactLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Write-once/load-after parquet artifact: `build` runs only when the
    * artifact is absent, writing through a temp dir + atomic rename so a
    * concurrent second builder either sees the complete artifact or
    * builds its own identical copy. The `_SUCCESS` probe guards against
    * a torn non-atomic write. `fpTable` names the source parquet whose
    * (size, mtime) fingerprint keys the artifact: regenerating the data
    * under an sfDir changes the fingerprint, so a stale artifact built
    * from the OLD data can never be served (review r12 — the in-JVM
    * memoization this replaced could not go stale across sessions; the
    * on-disk form can, hence the fingerprint). The fingerprint also
    * disambiguates distinct dirs whose sanitized names collide. */
  private def parquetArtifact(s: SparkSession, dir: String, name: String,
      fpTable: String)(build: => DataFrame): DataFrame = {
    val src = new java.io.File(s"$dir/$fpTable.parquet")
    // a missing fingerprint source (typo'd fpTable, future layout change)
    // would make length()/lastModified() both 0 — a CONSTANT fingerprint
    // that silently serves a stale artifact after data regeneration.
    // Fail loudly instead (ADVICE r12).
    require(src.isFile || src.isDirectory,
      s"artifact fingerprint source missing: $src")
    val path = artifactPath(dir,
      s"${name}_${src.length()}_${src.lastModified()}")
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      artifactLocks.computeIfAbsent(path, _ => new Object).synchronized {
        if (!done.exists()) {
          val tmp = path + "_tmp_" + java.lang.ProcessHandle.current().pid() +
            "_" + System.nanoTime()
          build.write.mode("overwrite").parquet(tmp)
          if (!new java.io.File(tmp).renameTo(new java.io.File(path))) {
            // lost a cross-JVM race — the winner's artifact is complete
            // and identical; drop our copy
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
          }
          // retention (VERDICT r14 #7): a successful build supersedes
          // every OTHER fingerprint of the same artifact name — those
          // dirs were keyed to source data that no longer exists (each
          // testdata regeneration changes the fingerprint), so nothing
          // can ever read them again; without this they strand forever.
          // The exact-name_digits_digits match can't clip a sibling
          // artifact whose name merely extends this one ("pq_codes_all"
          // never matches "pq_codes_all_wide_…"). Current readers are
          // safe: any JVM looking at the same source computes THIS
          // fingerprint, which is never deleted.
          val pat = java.util.regex.Pattern.quote(name) + "_\\d+_\\d+"
          val self = new java.io.File(path).getName
          Option(new java.io.File(path).getParentFile.listFiles()).toSeq
            .flatten
            .filter(f => f.isDirectory && f.getName != self &&
              f.getName.matches(pat))
            .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        }
      }
    }
    s.read.parquet(path)
  }

  /** Debug catalog of the persisted artifacts under this sfDir's root
    * (VERDICT r14 #7): one row per artifact dir — logical name, source
    * fingerprint, file count, total bytes. Driver-local listing (the
    * artifact root is a driver-side tmp dir by construction); rows-only
    * check (sizes are parquet-encoder-dependent). Touches one known
    * artifact first so the catalog is never empty regardless of query
    * execution order. */
  private def artifactCatalog(s: SparkSession, dir: String): DataFrame = {
    pqCodesAll(s, dir).count() // ensure at least one artifact exists
    val root = new java.io.File(artifactPath(dir, "x")).getParentFile
    val rows = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && !f.getName.contains("_tmp_"))
      .sortBy(_.getName)
      .map { d =>
        val files = Option(d.listFiles()).toSeq.flatten.filter(_.isFile)
        val m = "^(.*)_(\\d+)_(\\d+)$".r
        val (nm, fp) = d.getName match {
          case m(n, len, mt) => (n, s"${len}_$mt")
          case other => (other, "")
        }
        (nm, fp, files.size, files.map(_.length()).sum)
      }
    import s.implicits._
    rows.toDF("artifact", "fingerprint", "n_files", "total_bytes")
  }

  // ───────────────────────────── relational parity ──────────────────────────

  private val q1PricingSummary = Q("q1_pricing_summary",
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

  private val f1IsinFilter = Q("f1_isin_filter",
    (s, dir) => Tables.customer(s, dir)
      .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal")),
    Some("""SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')""".stripMargin))

  private val f2EqFilterJson = Q("f2_eq_filter_json",
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
  private val xVariantShred = Q("x_variant_shred",
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
  private val xVariantHetero = Q("x_variant_hetero",
    (s, dir) => VariantOps.shred(VariantOps.eventPayload(Tables.events(s, dir)))
      .select(col("event_id"), col("tag_int"), col("tag_str")),
    Some("""SELECT event_id,
      |  CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 100 AS INTEGER) END AS tag_int,
      |  CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 100 AS VARCHAR)
      |       ELSE 't-' || CAST(event_id % 100 AS VARCHAR) END AS tag_str
      |FROM events""".stripMargin))

  private val j1JoinAgg = Q("j1_join_agg",
    (s, dir) => Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total")),
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin))

  /** J1's string-typed join key quirk (reference `src/mm_calls.py:94,102`). */
  private val j1StrkeyJoin = Q("j1_strkey_join",
    (s, dir) => Tables.orders(s, dir).select(col("o_custkey").cast("string").as("k"), col("o_totalprice"))
      .join(Tables.customer(s, dir).select(col("c_custkey").cast("string").as("k"), col("c_nationkey")), "k")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total")),
    Some("""SELECT c_nationkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
      |GROUP BY c_nationkey""".stripMargin))

  private val j2SemiJoin = Q("j2_semi_join",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin))

  private val jAntiJoin = Q("j_anti_join",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin))

  private val j3ChainAgg = Q("j3_chain_agg",
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
  private val jAsofJoin = Q("j_asof_join",
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
  private val jAsofNearest = Q("j_asof_nearest",
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
  private val jRangeJoin = Q("j_range_join",
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

  private val a3CollectIds = Q("a3_collect_ids",
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
  private val a4LastWins = Q("a4_last_wins",
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
  private val aSaltedAgg = Q("a_salted_agg",
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
  private val aColumnProfile = Q("a_column_profile",
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
  private val aKeySkew = Q("a_key_skew",
    (s, dir) => Profiling.keySkew(Tables.events(s, dir), col("user_id"), 20),
    Some("""WITH c AS (SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY 1),
      |t AS (SELECT count(*) AS total FROM events)
      |SELECT key, cnt, cnt * 10000 // total AS share_bp FROM c, t
      |ORDER BY cnt DESC, key LIMIT 20""".stripMargin))

  /** Salted inner equi-join (Salted.equiJoin): events re-joined to their
    * per-type stats — ~6 distinct keys over 15k+ rows, the hot-key shape
    * that melts one reducer in a plain shuffle join. The oracle is the
    * plain join; salting must be row-for-row invisible. */
  private val jSaltedJoin = Q("j_salted_join",
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
  private val aggPivot = Q("agg_pivot",
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

  private val a1Counts = Q("a1_counts",
    (s, dir) => Tables.orders(s, dir).agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(col("o_orderpriority")).as("n_priorities")),
    Some("""SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities FROM orders""".stripMargin))

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, same linear-interpolation formula). */
  private val aPercentiles = Q("a_percentiles",
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
  private val cNullFns = Q("c_null_fns",
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
  private val tGapfill = Q("t_gapfill",
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

  private val a5Scalar = Q("a5_scalar",
    (s, dir) => Tables.customer(s, dir).agg(
      max(col("c_acctbal")).as("max_bal"), min(col("c_acctbal")).as("min_bal"),
      count(lit(1)).as("n")),
    Some("SELECT max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal, count(*) AS n FROM customer"))

  private val wTopkPerGroup = Q("w_topk_per_group",
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
  private val wTopkPlan = Q("w_topk_plan",
    (s, dir) => graft.plans.TopKPlan.topKPerGroup(Tables.orders(s, dir),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders) WHERE rank <= 3""".stripMargin), bench = true)

  /** Running (cumulative) window aggregate — frame-spec windows beyond the
    * reference's surface (SURVEY.md §2.9: free in the engine). */
  private val wRunningSum = Q("w_running_sum",
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
  private val wLagLead = Q("w_lag_lead",
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
  private val wNtile = Q("w_ntile",
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
  private val wPctRank = Q("w_pct_rank",
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
  private val aHistogram = Q("a_histogram",
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
  private val wFirstNth = Q("w_first_nth",
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
  private val cMapFns = Q("c_map_fns",
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
  private val sketchQuantileHist = Q("sketch_quantile_hist",
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
  private def kllRankBound(n: Column, k: Int): Column = {
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
  private val sketchKllQuantiles = Q("sketch_kll_quantiles",
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
  private val sketchKllByGroup = Q("sketch_kll_by_group",
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
  private val cArrayFns = Q("c_array_fns",
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
  private val cStringFns = Q("c_string_fns",
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

  private val sOrderbyLimit = Q("s_orderby_limit",
    (s, dir) => Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin))

  // ───────────────────────────── scalar functions ───────────────────────────

  private val cTimeFns = Q("c_time_fns",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
        min(TimeFns.epochSeconds(TimeFns.toNewYork(col("o_orderdate")))).as("first_ny_epoch")),
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  count(*) AS n,
      |  min(epoch_ms(timezone('America/New_York', timezone('UTC', o_orderdate))) // 1000) AS first_ny_epoch
      |FROM orders GROUP BY 1, 2""".stripMargin))

  /** C3 — epoch-nanoseconds → µs → US/Eastern (reference `src/main.py:126-131`). */
  private val cNanosEastern = Q("c_nanos_eastern",
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
  private val oddsDomain = Q("odds_domain",
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
  private val oddsNativeExpr = Q("odds_native_expr",
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
  private val aggRollup = Q("agg_rollup",
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
  private val aggGroupingSets = Q("agg_grouping_sets",
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
  private val aggUnpivot = Q("agg_unpivot",
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
  private val aggIncrMaintain = Q("agg_incr_maintain",
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
  private val aggIncrDistinct = Q("agg_incr_distinct",
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
  private val jScalarSubquery = Q("j_scalar_subquery",
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

  private val aggCube = Q("agg_cube",
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
  private def flagshipOracleWith(marketUpdatedSql: String): String = {
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
  private def muRenderSql(tz: String): String =
    s"strftime(timezone('$tz', timezone('UTC', make_timestamp((epoch_ms(l_shipdate) // 1000) * 1000000))), '%Y-%m-%d %H:%M:%S')"

  private val flagshipOracle: String = flagshipOracleWith(muRenderSql("US/Eastern"))

  // Reads the PERSISTED nested fixture (production shape — the source
  // delivers the event→markets→lines tree; bench hygiene, VERDICT r8 #4):
  // the bench row measures the flatten over a nested parquet scan, not
  // on-the-fly fixture synthesis. Results bit-identical; oracle unchanged.
  private val xFlagshipFlatten = Q("x_flagship_flatten",
    (s, dir) => Flatten.flatten25(BettingFixture.sportEventsCached(s, dir)),
    Some(flagshipOracle), bench = true)

  /** C4 strict parity: the reference rendered the no-lines branch's
    * market_updated in the PROCESS-local zone (`src/main.py:172-174`); the
    * engine's default normalizes both branches to US/Eastern (C3). This
    * variant names the machine zone explicitly (America/Chicago here) —
    * deterministic, so the one remaining semantic divergence from the
    * reference is now covered by a hash-exact oracle instead of a doc note. */
  private val xFlagshipC4Strict = Q("x_flagship_c4strict",
    (s, dir) => Flatten.flatten25(BettingFixture.sportEventsCached(s, dir),
      noLinesTz = Some("America/Chicago")),
    Some(flagshipOracleWith(
      s"""CASE WHEN l_linenumber % 2 = 0 THEN ${muRenderSql("US/Eastern")}
         |       ELSE ${muRenderSql("America/Chicago")} END""".stripMargin)))

  /** X3 — branch union with differing column order, resolved by name. */
  private val x3BranchUnion = Q("x3_branch_union",
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
  private val xSetOps = Q("x_set_ops",
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

  private val seedingPipeline = Q("seeding_pipeline",
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

  /** MERGE / CDC-apply (operators.Upsert): the events stream becomes an
    * UPSERT/DELETE change log folded into the customer snapshot — latest
    * change per key wins, deletes drop the key, untouched keys pass
    * through. Oracle is the equivalent windowed-dedup + full outer join. */
  private val uMergeUpsert = Q("u_merge_upsert",
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
  private val uSnapshotDiff = Q("u_snapshot_diff",
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
  private val uScd2History = Q("u_scd2_history",
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

  private val wagerBookReplay = Q("wager_book_replay",
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
  private val tWindowHourly = Q("t_window_hourly",
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
  private val tSessionWindows = Q("t_session_windows",
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
  private val decodeRoundtrip = Q("decode_roundtrip",
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
  private val fSampleBernoulli = Q("f_sample_bernoulli",
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
  private val fHashSample = Q("f_hash_sample",
    (s, dir) => Tables.events(s, dir)
      .where(conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100 < 30)
      .select(col("event_id"), col("event_type")),
    Some("""SELECT event_id, event_type FROM events
      |WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 30""".stripMargin))

  /** S1 — the odds-ladder scan through the DataSource V2 connector, joined
    * against lineitem-derived picks to prove it composes as a real table. */
  private val s1LadderScan = Q("s1_ladder_scan",
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
  private val c11UuidWagers = Q("c11_uuid_wagers",
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

  // ─────────────────────────── LLM-pipeline extensions ──────────────────────

  private def duckToks: String =
    """CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |       ELSE string_split_regex(trim(lower(text)), '\s+') END""".stripMargin

  // Shared real-BPE oracle fragments over `documents` (the merge table and
  // recursion live in Bpe.duckBpeCtes so SQL and kernel stay in lock-step).
  // Each must appear inside a `WITH RECURSIVE`.
  private def duckBpeBlock: String = Bpe.duckBpeCtes(duckToks, "documents")

  /** Per-doc real-BPE token count: relation `bpe_doc(doc_id, n_bpe)`. */
  private def duckBpeDocCount: String =
    s"""bpe_wcount AS (SELECT w, CAST(len(syms) AS BIGINT) AS n FROM bpe_enc_final),
       |bpe_doc AS (SELECT d.doc_id, CAST(coalesce(sum(wc.n), 0) AS BIGINT) AS n_bpe
       |  FROM documents d
       |  LEFT JOIN (SELECT doc_id, unnest($duckToks) AS w FROM documents) u
       |    ON u.doc_id = d.doc_id
       |  LEFT JOIN bpe_wcount wc ON wc.w = u.w
       |  GROUP BY d.doc_id)""".stripMargin

  /** Per-doc flattened BPE token array: relation `bpe_docarr(doc_id, w)`
    * (documents with zero words are absent — matches the chunker's
    * "empty docs emit no chunks"). */
  private def duckBpeDocArr: String =
    s"""bpe_docarr AS (
       |  SELECT u.doc_id, flatten(list(f.syms ORDER BY u.pos)) AS w
       |  FROM (SELECT doc_id, generate_subscripts($duckToks, 1) AS pos,
       |        unnest($duckToks) AS wd FROM documents) u
       |  JOIN bpe_enc_final f ON f.w = u.wd
       |  GROUP BY u.doc_id)""".stripMargin

  // Shared DuckDB fragments mirroring TextFns.qualityScore / langIdFromTokens
  // — single source for every oracle that gates on them (text_stats,
  // text_langid, pipeline_docs_prep). All reference columns `text` and `w`.
  private def qualityBpSql: String =
    """CAST(floor((least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      |    (1.0 - CASE WHEN len(w) = 0 THEN 0.0
      |       ELSE least(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / len(w), 1.0) END) * 0.3 +
      |    (CASE WHEN len(text) = 0 THEN 0.0
      |       ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / len(text) END) * 0.3) * 10000) AS BIGINT)""".stripMargin

  private val langScoreSets: Seq[(String, String)] =
    TextFns.LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => s"'$m'").mkString("(", ", ", ")")
    }
  private val langScoresSql: String = langScoreSets.map { case (lang, inList) =>
    s"len(list_filter(w, t -> t IN $inList)) AS s_$lang"
  }.mkString(", ")
  private val langBestSql: String =
    s"greatest(${langScoreSets.map("s_" + _._1).mkString(", ")})"
  private val langCaseSql: String = langScoreSets
    .map { case (l, _) => s"WHEN s_$l = best AND s_$l > 0 THEN '$l'" }.mkString(" ")

  /** The LangIdModel argmax CASE (priority tie-break = [[graft.functions.
    * LangIdModel.Langs]] order, `und` with zero trigrams) — ONE copy of
    * the load-bearing prediction text, shared by the standalone
    * text_langid_model oracle and the curation-gate chain. */
  private def langArgmaxCaseSql: String =
    """CASE WHEN ntg = 0 THEN 'und'
      |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
      |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
      |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END""".stripMargin

  /** Model-language CTE chain over `documents` — ends in relation
    * `mlang(doc_id, <carry aliases>, s_en..s_es, predicted_lang)`: the
    * LangIdModel re-derivation (trigrams → md5-nibble hash buckets →
    * pinned integer weights → [[langArgmaxCaseSql]]). `carry` lists
    * (baseExpr, alias) columns pulled from `documents` and threaded
    * through the chain (text_langid_model carries the label; the gate
    * carries nothing). Pre-stripped so callers embed it verbatim. */
  private def langModelCtes(carry: Seq[(String, String)] = Nil): String = {
    import graft.functions.LangIdModel
    val cSel = carry.map { case (e, a) => s", $e AS $a" }.mkString
    val cFwd = carry.map { case (_, a) => s", $a" }.mkString
    val scoreCols = LangIdModel.Langs.zipWithIndex.map { case (l, i) =>
      s"${LangIdModel.scoreSql("bk", "wall", i)} AS s_$l"
    }.mkString(",\n  ")
    s"""mbase AS (SELECT doc_id$cSel, lower(text) AS t FROM documents),
       |mtg AS (SELECT doc_id$cFwd, ${LangIdModel.trigramsSql("t")} AS tg FROM mbase),
       |mbk AS (SELECT doc_id$cFwd, len(tg) AS ntg,
       |  list_transform(tg, g -> ${LangIdModel.hash16Sql("g")} % ${LangIdModel.B}) AS bk FROM mtg),
       |msc AS (SELECT doc_id$cFwd, ntg,
       |  $scoreCols
       |  FROM (SELECT *, ${LangIdModel.flatWeightsSql} AS wall FROM mbk)),
       |mlang AS (SELECT doc_id$cFwd, s_en, s_de, s_fr, s_es,
       |  $langArgmaxCaseSql AS predicted_lang FROM msc)""".stripMargin
  }

  private def duckShingles(n: Int) =
    s"""CASE WHEN len(w) >= $n
      |  THEN list_transform(generate_series(1, len(w) - ${n - 1}),
      |         i -> ${(0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")})
      |  ELSE [array_to_string(w, ' ')] END""".stripMargin

  private val dedupExact = Q("dedup_exact",
    (s, dir) => Dedup.exact(Tables.documents(s, dir)),
    Some("""SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin))

  /** Canonical-URL dedup (Dedup.urlDedup — the cheapest crawl-dedup tier,
    * VERDICT r8 #8). The synthetic corpus has no URL column, so the query
    * PLANTS one per document from its key (same posture as
    * text_pii_redact): scheme/host case, www., default port, trailing
    * slash, tracking params and param order all vary by doc_id residues
    * and must collapse to one canonical form. The oracle replays the
    * identical normalization in DuckDB — hash-exact. */
  /** The planted URL column both URL-dedup queries share: scheme/host
    * case, userinfo, www., default port, trailing slash, tracking params
    * (incl. a bare `&fbclid`) and param order all vary by doc_id residues
    * and must collapse to one canonical form. Scala + SQL twins kept
    * adjacent (the canonicalUrlSql convention). */
  private def plantedUrls(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP")).otherwise(lit("http")),
      lit("://"),
      when(pmod(col("doc_id"), lit(6)) === 0, lit("User:Pw@")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), pmod(col("doc_id"), lit(40)).cast("string"), lit(".Example.COM"),
      when(pmod(col("doc_id"), lit(5)) === 0, lit(":80")).otherwise(lit("")),
      lit("/Docs/Page"), pmod(col("doc_id"), lit(20)).cast("string"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&b="), pmod(col("doc_id"), lit(7)).cast("string"),
      when(pmod(col("doc_id"), lit(8)) === 0, lit("&fbclid")).otherwise(lit("")),
      lit("&a=1")).as("url"))

  private def plantedUrlSql: String =
    """SELECT doc_id,
      |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
      |  (CASE WHEN doc_id % 6 = 0 THEN 'User:Pw@' ELSE '' END) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |  'Site' || CAST(doc_id % 40 AS VARCHAR) || '.Example.COM' ||
      |  (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
      |  '/Docs/Page' || CAST(doc_id % 20 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
      |  '?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 8 = 0 THEN '&fbclid' ELSE '' END) || '&a=1' AS url
      |  FROM documents""".stripMargin

  private val dedupUrl = Q("dedup_url",
    (s, dir) => Dedup.urlDedup(plantedUrls(s, dir)),
    Some(s"""WITH u AS ($plantedUrlSql),
      |c AS (SELECT doc_id, coalesce(${Dedup.canonicalUrlSql("url")},
      |    chr(0) || 'doc:' || CAST(doc_id AS VARCHAR)) AS canonical_url FROM u),
      |k AS (SELECT doc_id, canonical_url,
      |  min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id FROM c)
      |SELECT doc_id, canonical_url, keep_id,
      |  CAST(doc_id = keep_id AS INTEGER) AS is_canonical FROM k""".stripMargin))

  /** Incremental canonical-URL dedup (Dedup.urlIndex +
    * urlDedupIncremental): new crawl batch (doc_id % 3 ≠ 0) anti-joined
    * against the persisted canonical-key index of the history slice —
    * the recrawl shape for the cheapest dedup tier. The history slice is
    * shaped so the anti-join path is REAL at every SF (round-10 review —
    * two failure modes): its residue is 3, which the planted canonical
    * key does NOT depend on (site %40, page %20, b %7 — gcd(3, 280) = 1;
    * the original %7 split made history and batch keys provably disjoint
    * and the suppression path dead), and it is BOUNDED at doc_id < 600
    * ("yesterday's crawl" — 200 docs covering 200 of the 280 key
    * classes), because an unbounded slice saturates the whole key space
    * at sf1 and empties the output instead. Bounded history is also the
    * production posture: the index grows with DISTINCT pages, not with
    * crawl volume. */
  private val dedupUrlIncr = Q("dedup_url_incr",
    (s, dir) => {
      val urls = plantedUrls(s, dir)
      Dedup.urlDedupIncremental(
        urls.where(pmod(col("doc_id"), lit(3)) =!= 0),
        Dedup.urlIndex(urls.where(
          pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 600)))
    },
    Some(s"""WITH u AS ($plantedUrlSql),
      |c AS (SELECT doc_id, coalesce(${Dedup.canonicalUrlSql("url")},
      |    chr(0) || 'doc:' || CAST(doc_id AS VARCHAR)) AS canonical_url FROM u),
      |hist AS (SELECT DISTINCT canonical_url FROM c
      |         WHERE doc_id % 3 = 0 AND doc_id < 600),
      |nw AS (SELECT doc_id, canonical_url FROM c WHERE doc_id % 3 <> 0
      |  AND canonical_url NOT IN (SELECT canonical_url FROM hist)),
      |k AS (SELECT doc_id, canonical_url,
      |  min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id FROM nw)
      |SELECT doc_id, canonical_url, keep_id,
      |  CAST(doc_id = keep_id AS INTEGER) AS is_canonical FROM k""".stripMargin))

  /** MinHash-LSH candidate-pair CTE chain over any (doc_id, text) relation
    * `src` — no leading WITH, so callers can prepend their own CTEs. Ends
    * in `pairs(doc_a, doc_b, jaccard)`. */
  private def minhashPairsCtes(src: String, threshold: Double): String =
    s"""toks AS (SELECT doc_id, $duckToks AS w FROM $src),
      |sh AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM toks),
      |hsx AS (SELECT doc_id, sh,
      |  list_transform(list_transform(sh, s -> md5(s)), m -> ${TextFns.md5Base28Sql("m")}) AS hs
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, b.band,
      |    CASE b.band ${(0 until 4).map(b =>
             s"WHEN $b THEN ${TextFns.minhashBandNumSql("hs", b)}").mkString(" ")} END AS key
      |  FROM hsx CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |scored AS (
      |  SELECT doc_a, doc_b,
      |    ROUND(CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE) /
      |      (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh)) - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))), 4) AS jaccard
      |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b),
      |pairs AS (SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= $threshold)""".stripMargin

  private val minhashPairsSql: String =
    s"""WITH ${minhashPairsCtes("documents", 0.2)}
      |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin

  /** Banded-signature CTE chain for ONE side of an incremental join —
    * same tokenize/shingle/minhash fragments as [[minhashPairsCtes]], with
    * a `_p` suffix so two sources can band in one query. Ends in
    * `banded_<p>(doc_id, band, key)`. */
  private def bandedCtes(src: String, p: String): String =
    s"""toks_$p AS (SELECT doc_id, $duckToks AS w FROM $src),
      |sh_$p AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM toks_$p),
      |hsx_$p AS (SELECT doc_id,
      |  list_transform(list_transform(sh, s -> md5(s)), m -> ${TextFns.md5Base28Sql("m")}) AS hs
      |  FROM sh_$p),
      |banded_$p AS (
      |  SELECT doc_id, b.band,
      |    CASE b.band ${(0 until 4).map(b =>
             s"WHEN $b THEN ${TextFns.minhashBandNumSql("hs", b)}").mkString(" ")} END AS key
      |  FROM hsx_$p CROSS JOIN (VALUES (0), (1), (2), (3)) b(band))""".stripMargin

  /** Incremental exact dedup (Dedup.exactIncremental): the doc_id%7==0
    * slice plays the already-deduped history (only its md5s ship); the
    * rest is the new batch. */
  private val dedupExactIncr = Q("dedup_exact_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.exactIncremental(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(7)) === 0)
          .select(md5(col("text")).as("text_md5")))
    },
    Some("""WITH hist AS (SELECT md5(text) AS text_md5 FROM documents WHERE doc_id % 7 = 0)
      |SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents WHERE doc_id % 7 <> 0
      |  AND md5(text) NOT IN (SELECT text_md5 FROM hist)
      |GROUP BY 1""".stripMargin))

  /** Bloom-prefiltered incremental exact dedup (Dedup.exactIncrementalBloom):
    * the history bloom is built eagerly at query-build time — the stand-in
    * for loading a persisted artifact — and the result is bit-identical to
    * dedup_exact_incr (bloom false positives are confirmed away, false
    * negatives cannot exist), so the oracle is the same plain NOT IN
    * derivation, knowing nothing of blooms. */
  private val dedupExactIncrBloom = Q("dedup_exact_incr_bloom",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val hist = docs.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(md5(col("text")).as("text_md5"))
      val bloom = Dedup.buildHashBloom(hist, "text_md5", expectedItems = 1 << 16)
      Dedup.exactIncrementalBloom(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0), hist, bloom)
    },
    Some("""WITH hist AS (SELECT md5(text) AS text_md5 FROM documents WHERE doc_id % 7 = 0)
      |SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents WHERE doc_id % 7 <> 0
      |  AND md5(text) NOT IN (SELECT text_md5 FROM hist)
      |GROUP BY 1""".stripMargin), bench = true)

  /** Incremental near-dup candidates (Dedup.minhashCandidatesIncremental):
    * new batch vs the stored band index of history + within-batch pairs.
    * The oracle re-derives both banded sides from scratch and joins them
    * the naive way; the Spark side joins the PERSISTED-index shape. */
  private val dedupMinhashIncr = Q("dedup_minhash_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.minhashCandidatesIncremental(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0),
        Dedup.bandIndex(docs.where(pmod(col("doc_id"), lit(7)) === 0)))
    },
    Some(s"""WITH newdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
      |hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
      |${bandedCtes("newdocs", "n")},
      |${bandedCtes("hist", "h")}
      |SELECT DISTINCT n.doc_id AS doc_a, h.doc_id AS doc_b, 'history' AS origin
      |FROM banded_n n JOIN banded_h h ON n.band = h.band AND n.key = h.key
      |UNION
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, 'batch' AS origin
      |FROM banded_n a JOIN banded_n b
      |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin))

  /** dedup_minhash_incr through the persisted band-key bloom prefilter:
    * bloom-negative batch band keys never reach the history join (exact —
    * an inner join drops them anyway), so the oracle is the SAME banded
    * re-derivation, bloom-invisible like dedup_exact_incr_bloom's. */
  private val dedupMinhashIncrBloom = Q("dedup_minhash_incr_bloom",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val histIdx = Dedup.bandIndex(docs.where(pmod(col("doc_id"), lit(7)) === 0))
      val bloom = Dedup.buildBandBloom(histIdx, expectedItems = 1 << 16)
      Dedup.minhashCandidatesIncremental(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0), histIdx,
        historyBandBloom = Some(bloom))
    },
    dedupMinhashIncr.oracle)

  private val dedupMinhashPairs = Q("dedup_minhash_pairs",
    (s, dir) => Dedup.nearDupPairs(Tables.documents(s, dir), 0.2),
    Some(minhashPairsSql), bench = true)

  /** Connected components over the near-dup pair graph; the oracle is the
    * recursive-CTE transitive closure (min reachable id per node). `pairs`
    * and `edges` are MATERIALIZED: `reach` references `edges` on every
    * recursion iteration, and without the hint DuckDB may inline (and
    * re-run) the whole minhash+Jaccard pipeline under it per iteration —
    * unnoticeable at sf0.01, a multi-minute stall per evaluation at sf1. */
  private val dedupClusters = Q("dedup_clusters",
    (s, dir) => Dedup.nearDupClusters(Tables.documents(s, dir), 0.2),
    Some(s"""WITH RECURSIVE pairs AS MATERIALIZED ($minhashPairsSql),
      |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached)
      |SELECT node AS doc_id, least(node, min(reached)) AS cluster
      |FROM reach GROUP BY node""".stripMargin))

  /** Quality-argmax survivor per near-dup cluster (Dedup.qualitySurvivors):
    * keep the BEST copy of each near-dup family, not the lowest id —
    * argmax quality_bp, min-doc_id tie-break (total order ⇒ hash-exact).
    * Oracle = the dedup_clusters closure + the shared quality fragment +
    * the same first_value window. CTE names (`comp`, `q`) are load-bearing:
    * dev/check_closure_sf1.py splices a Python union-find result in place
    * of the recursive closure at sf1 by cutting at `,\nq AS`. */
  private val dedupSurvivorQuality = Q("dedup_survivor_quality",
    (s, dir) => Dedup.qualitySurvivors(Tables.documents(s, dir), 0.2),
    Some(s"""WITH RECURSIVE pairs AS MATERIALIZED ($minhashPairsSql),
      |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached),
      |comp AS (SELECT node AS doc_id, least(node, min(reached)) AS cluster
      |         FROM reach GROUP BY node),
      |q AS (SELECT doc_id, $qualityBpSql AS quality_bp
      |      FROM (SELECT doc_id, text, $duckToks AS w FROM documents)),
      |j AS (SELECT c.doc_id, c.cluster, q.quality_bp
      |      FROM comp c JOIN q USING (doc_id)),
      |k AS (SELECT doc_id, cluster, quality_bp,
      |        first_value(doc_id) OVER (PARTITION BY cluster
      |          ORDER BY quality_bp DESC, doc_id) AS keep_id FROM j)
      |SELECT doc_id, cluster, quality_bp, keep_id,
      |  CAST(doc_id = keep_id AS INTEGER) AS is_survivor FROM k""".stripMargin))

  /** End-to-end training-data prep (the composition demo: a reference user
    * runs their whole corpus-prep pass in this engine): quality gate →
    * language gate → exact dedup (min-id survivor) → near-dup cluster
    * removal keeping the BEST copy per cluster (quality-argmax, the
    * [[Dedup.qualitySurvivors]] convention — round-11 rebase from the
    * earlier greedy drop-higher-id-of-every-pair rule, which could keep
    * two docs of one cluster when neither faced the other directly).
    * Every stage reuses an already-oracle-checked operator; the oracle
    * composes the same fragments. */
  /** Stage 1 of docs-prep: the hygiene gate, over any (doc_id, text)
    * frame — batch or streaming (every expression is stateless). One scan,
    * one staged tokenize: stats, quality, and language all derive from the
    * same materialized token array — no joins of separately-derived
    * per-doc tables. `carry` names extra input columns to keep (e.g. the
    * event-time column a streaming caller watermarks on). */
  /** The MEASURED frame behind the hygiene gate — every doc with its
    * n_tokens, quality_bp and model-predicted language, UNfiltered (the
    * drop-attribution report reads this; the gate filters it). */
  private[graft] def curateMeasured(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = Seq("doc_id", "text") ++ carry
    val measured = graft.plans.Stage(docs.select(keep.map(col): _*),
        "w", TextFns.tokens(col("text")))
      .select(keep.map(col) ++ Seq(
        size(col("w")).as("n_tokens"),
        TextFns.basisPoints(
          TextFns.qualityScoreFromTokens(col("text"), col("w"))).as("quality_bp")): _*)
    // language = the MODEL-grade classifier (round-10 rebase; the
    // marker-stopword langId stays available standalone as text_langid)
    TextAnalysis.withModelLang(measured)
  }

  private[graft] def curateGateFrom(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    curateMeasured(docs, carry)
      .where(col("quality_bp") >= 7000 && col("predicted_lang") === "en")
      .drop("predicted_lang")

  /** [[curateGateFrom]] over the documents table — the registered-query
    * form, exposed (package-private) so ProfileCurate can time each stage
    * of the curation pipeline without duplicating its plan. */
  private[graft] def curateGated(s: SparkSession, dir: String): DataFrame =
    curateGateFrom(Tables.documents(s, dir))

  /** Stage 2 of docs-prep: exact dedup of the gated set. The LSH pass
    * references the survivor set ~5× (band self-join + two shingle joins +
    * the final anti-join); persisting cuts the gate subtree from five
    * executions to one. Not an unbounded leak: CacheManager keys entries
    * by canonicalized plan, so repeated invocations on the same sfDir
    * reuse ONE entry (one per distinct sfDir per session), each tiny
    * (survivor ids + text) and LRU-evictable. */
  private[graft] def curateSurvivors(s: SparkSession, dir: String): DataFrame =
    curateSurvivorsFrom(curateGated(s, dir))

  private[graft] def curateSurvivorsFrom(gated: DataFrame): DataFrame = {
    val exactKeep = gated
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    gated.join(exactKeep, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The full batch docs-prep composition over any (doc_id, text) frame:
    * hygiene gate → exact dedup → LSH near-dup removal. The registered
    * pipeline_docs_prep applies it to the documents table; the composed
    * streaming-curation spec applies it to the same corpus it streams, as
    * the equivalence oracle. */
  /** The prep composition with `text` still aboard — ONE copy of the
    * gate → exact-dedup → LSH-removal body; [[docsPrepFrom]] projects it
    * for the registered query, the crawl-to-trainer capstone packs it
    * (round-10 review: the capstone had inlined this body). */
  /** Near-dup DROPPED doc_ids among the exact-dedup survivors: clusters
    * over the pair graph, then argmax quality_bp per cluster (min-doc_id
    * tie-break — a total order, and the tie branch is what keeps the
    * streaming twin equivalent: first-seen == min-id when qualities
    * tie). quality_bp rides along from the gate, so no second tokenize
    * scan. The closure joins only the pairs-sized frame (tiny vs the
    * corpus); `survivors` must be the persisted frame. */
  private def nearDupDropsFrom(survivors: DataFrame): DataFrame = {
    val comp = Dedup.components(
      Dedup.nearDupPairs(survivors.select(col("doc_id"), col("text")), 0.2)
        .select(col("doc_a"), col("doc_b")))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("quality_bp").desc, col("doc_id").asc)
    comp.join(survivors.select(col("doc_id"), col("quality_bp")), "doc_id")
      .withColumn("keep_id", first(col("doc_id")).over(w))
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
  }

  private[graft] def docsPrepPrepped(docs: DataFrame): DataFrame = {
    val survivors = curateSurvivorsFrom(curateGateFrom(docs))
    survivors.join(nearDupDropsFrom(survivors), Seq("doc_id"), "left_anti")
  }

  private[graft] def docsPrepFrom(docs: DataFrame): DataFrame =
    docsPrepPrepped(docs).select(col("doc_id"), col("n_tokens"), col("quality_bp"))

  private val pipelineDocsPrep = Q("pipeline_docs_prep",
    (s, dir) => docsPrepFrom(Tables.documents(s, dir)),
    Some(docsPrepSql), bench = true)

  /** DROP-ATTRIBUTION report for the docs-prep pipeline — the "why did
    * my corpus shrink" audit a curator reads next to the dataset card:
    * every document attributed to the FIRST stage that killed it
    * (quality gate → language gate → exact dedup → near-dup removal) or
    * 'kept', summarized per stage with doc and token mass. Composes the
    * exact fragments docs_prep runs (same measured frame, same survivor
    * sets), so kept == pipeline_docs_prep's output by construction; the
    * oracle nests the shared docsPrepCtes derivation and re-attributes
    * independently. Output: (stage, n_docs, sum_tokens). */
  /** The drop-attribution body over any (doc_id, text) frame — factored
    * so the spec can exercise EVERY arm on a planted corpus (the sf
    * fixture populates exact_dup only at larger SFs). */
  private[graft] def dropReportFrom(docs: DataFrame): DataFrame = {
    val m = curateMeasured(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gated = m
      .where(col("quality_bp") >= 7000 && col("predicted_lang") === "en")
      .drop("predicted_lang")
    val survivors = curateSurvivorsFrom(gated)
    val nearDrops = nearDupDropsFrom(survivors)
    m.join(survivors.select(col("doc_id"), lit(1).as("_sv")),
        Seq("doc_id"), "left")
      .join(nearDrops.select(col("doc_id"), lit(1).as("_nd")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("quality_bp") < 7000, lit("quality"))
          .when(col("predicted_lang") =!= "en", lit("lang"))
          .when(col("_sv").isNull, lit("exact_dup"))
          .when(col("_nd").isNotNull, lit("near_dup"))
          .otherwise(lit("kept")).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"))
  }

  private val pipelineDropReport = Q("pipeline_drop_report",
    (s, dir) => dropReportFrom(Tables.documents(s, dir)),
    Some(s"""WITH RECURSIVE ${docsPrepCtes()},
      |rep AS (SELECT m.doc_id, m.n_tokens, CASE
      |    WHEN m.quality_bp < 7000 THEN 'quality'
      |    WHEN ml.predicted_lang <> 'en' THEN 'lang'
      |    WHEN s.doc_id IS NULL THEN 'exact_dup'
      |    WHEN d.doc_id IS NOT NULL THEN 'near_dup'
      |    ELSE 'kept' END AS stage
      |  FROM meas m JOIN mlang ml USING (doc_id)
      |  LEFT JOIN survivors s ON s.doc_id = m.doc_id
      |  LEFT JOIN dropq d ON d.doc_id = m.doc_id)
      |SELECT stage, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM rep GROUP BY stage""".stripMargin))

  /** pipeline_docs_prep's oracle, factored so compositions (e.g.
    * pipeline_curate_full) can nest it as a derived table. */
  /** The docs-prep derivation as a CTE chain ending in
    * `prepped(doc_id, text, n_tokens, quality_bp)` — shared by the
    * pipeline_docs_prep / pipeline_curate_full oracles and the
    * crawl-to-trainer capstone. `gateExtraJoin` injects an extra
    * membership restriction into the gate (the capstone joins the
    * URL-dedup survivor set); empty = the whole corpus. */
  /** Min-label closure CTE block over `pairs(doc_a, doc_b)` — ends in
    * `comp(doc_id, cluster)`. Identical text to the dedup_clusters
    * closure; the `,\nedges AS` / trailing-CTE markers are load-bearing
    * for dev/check_closure_sf1.py's staged splice at sf1 (DuckDB's
    * recursive closure re-evaluates the pair stage per iteration there). */
  private def closureCtes: String =
    """edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached),
      |comp AS (SELECT node AS doc_id, least(node, min(reached)) AS cluster
      |         FROM reach GROUP BY node)""".stripMargin

  private def docsPrepCtes(gateExtraJoin: String = ""): String =
    s"""dtoks AS (SELECT doc_id, text, $duckToks AS w FROM documents),
      |${langModelCtes()},
      |meas AS (SELECT doc_id, text, w,
      |  CAST(len(w) AS INTEGER) AS n_tokens,
      |  $qualityBpSql AS quality_bp FROM dtoks),
      |gated AS (
      |  SELECT m.doc_id, m.text, m.n_tokens, m.quality_bp
      |  FROM meas m JOIN mlang USING (doc_id) $gateExtraJoin
      |  WHERE m.quality_bp >= 7000 AND mlang.predicted_lang = 'en'),
      |exact AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
      |survivors AS (SELECT g.* FROM gated g JOIN exact e ON e.doc_id = g.doc_id),
      |${minhashPairsCtes("survivors", 0.2)},
      |$closureCtes,
      |dropq AS (SELECT doc_id FROM (
      |    SELECT c.doc_id, first_value(c.doc_id) OVER (PARTITION BY c.cluster
      |        ORDER BY s.quality_bp DESC, c.doc_id) AS keep_id
      |    FROM comp c JOIN survivors s ON s.doc_id = c.doc_id)
      |  WHERE doc_id <> keep_id),
      |prepped AS (
      |  SELECT s.doc_id, s.text, s.n_tokens, s.quality_bp
      |  FROM survivors s LEFT JOIN dropq d ON d.doc_id = s.doc_id
      |  WHERE d.doc_id IS NULL)""".stripMargin

  private lazy val docsPrepSql: String =
    s"""WITH RECURSIVE ${docsPrepCtes()}
      |SELECT doc_id, n_tokens, quality_bp FROM prepped""".stripMargin

  /** The END-TO-END curation run: hygiene gate → exact dedup → near-dup
    * removal (= pipeline_docs_prep), then train/val/test split and
    * deterministic sharding over the survivors, summarized per (split,
    * shard) cell — the one-call layout a user hands to a trainer. Every
    * stage is deterministic, so the WHOLE composition hash-checks against
    * the oracle nesting docs_prep's derivation as a subquery. */
  private val pipelineCurateFull = Q("pipeline_curate_full",
    (s, dir) => {
      val prepped = pipelineDocsPrep.fn(s, dir)
      val labeled = TextAnalysis.assignShards(
        TextAnalysis.trainSplit(prepped, 80, 10), nShards = 4)
      labeled.groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          sum(col("quality_bp").cast("long")).as("sum_quality_bp"))
    },
    Some(s"""WITH RECURSIVE ${docsPrepCtes()},
      |labeled AS (SELECT n_tokens, quality_bp,
      |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 80 THEN 'train'
      |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 4 AS shard
      |  FROM prepped)
      |SELECT split, shard, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(sum(quality_bp) AS BIGINT) AS sum_quality_bp
      |FROM labeled GROUP BY 1, 2""".stripMargin), bench = true)

  /** Sequence packing (TextAnalysis.packDocuments): which capacity-sized
    * block each document starts in after per-shard concat in doc_id
    * order — the LLM-pretraining pack table. Integral floor-div ⇒
    * hash-exact cross-engine. */
  private val pipelinePackDocs = Q("pipeline_pack_docs",
    (s, dir) => TextAnalysis.packDocuments(Tables.documents(s, dir),
      capacityTokens = 2048, nShards = 8),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |t AS (SELECT d.doc_id, CAST(b.n_bpe AS INTEGER) AS n_tokens,
      |  d.doc_id % 8 AS shard FROM documents d JOIN bpe_doc b USING (doc_id)),
      |c AS (SELECT doc_id, shard, n_tokens,
      |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS start_tok
      |  FROM t)
      |SELECT doc_id, shard, n_tokens, start_tok,
      |  CAST((start_tok - (start_tok % 2048)) / 2048 AS BIGINT) AS bin_id
      |FROM c""".stripMargin))

  /** Sequence ASSEMBLY (TextAnalysis.packSequences): the actual
    * fixed-length training sequences after per-shard concat-and-chunk of
    * the BPE token streams — documents straddling a cut contribute slices
    * to both sequences; the oracle checks the md5 of every sequence's
    * space-joined token stream (content + order, not just layout). */
  /** Concat-and-chunk CTE chain over `srcRel(doc_id, w)` (`w` a
    * token-array column) — ends in `g(shard, seq_id, n_docs, seq)`; the
    * SQL twin of `TextAnalysis.packCore`, shared by pack_sequences,
    * pack_ids and the crawl-to-trainer capstone. */
  private def packSeqCtes(srcRel: String, cap: Int, nShards: Int): String =
    s"""base AS (SELECT doc_id, doc_id % $nShards AS shard, w, CAST(len(w) AS BIGINT) AS n
      |  FROM $srcRel WHERE len(w) > 0),
      |st AS (SELECT *, CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) - n AS BIGINT) AS strt
      |  FROM base),
      |ex AS (SELECT shard, doc_id, strt, w, n,
      |    CAST(unnest(range(strt // $cap, (strt + n - 1) // $cap + 1)) AS BIGINT) AS seq_id
      |  FROM st),
      |sl AS (SELECT shard, seq_id, strt,
      |    list_slice(w, CAST(greatest(seq_id * $cap, strt) - strt + 1 AS INTEGER),
      |      CAST(least((seq_id + 1) * $cap, strt + n) - strt AS INTEGER)) AS sl
      |  FROM ex),
      |g AS (SELECT shard, seq_id, count(*) AS n_docs,
      |    flatten(list(sl ORDER BY strt)) AS seq
      |  FROM sl GROUP BY 1, 2)""".stripMargin

  /** The pack chain's standard witness projection (shared final SELECT). */
  private def packSeqSelect: String =
    """SELECT shard, seq_id, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(len(seq) AS BIGINT) AS seq_len,
      |  md5(array_to_string(seq, ' ')) AS seq_md5
      |FROM g""".stripMargin

  private val pipelinePackSequences = Q("pipeline_pack_sequences",
    (s, dir) => TextAnalysis.packSequences(Tables.documents(s, dir),
      capacityTokens = 512, nShards = 8),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocArr,
      |${packSeqCtes("bpe_docarr", 512, 8)}
      |$packSeqSelect""".stripMargin))

  /** Temperature (inverse-√) source rebalancing
    * (TextAnalysis.temperedSample): per-source keep rate k/√(BPE token
    * total) — α = ½ temperature mixture. The float steps (√, ÷, compare)
    * are correctly-rounded IEEE ops on exact operands, so the keep
    * decisions hash-match cross-engine. */
  private val pipelineTemperedSample = Q("pipeline_tempered_sample",
    (s, dir) => TextAnalysis.temperedSample(Tables.documents(s, dir), k = 20.0),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |tot AS (SELECT d.source, CAST(sum(b.n_bpe) AS BIGINT) AS tok_source
      |  FROM documents d JOIN bpe_doc b USING (doc_id) GROUP BY 1)
      |SELECT d.doc_id, d.source, tot.tok_source,
      |  CAST((CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
      |      / 16777216.0) < 20.0 / sqrt(CAST(tot.tok_source AS DOUBLE))
      |    AS INTEGER) AS keep
      |FROM documents d JOIN tot ON tot.source = d.source""".stripMargin))

  /** Dictionary encoding to dense token ids (TextAnalysis.tokenIds):
    * frequency-ranked vocab ids, per-document ordered id sequences
    * witnessed by md5 — the trainer-input tokenize step, end-to-end
    * hash-exact. */
  private val pipelineTokenIds = Q("pipeline_token_ids",
    (s, dir) => TextAnalysis.tokenIds(Tables.documents(s, dir)),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocArr,
      |occ AS (SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS subword
      |  FROM bpe_docarr),
      |vc AS (SELECT subword, count(*) AS n FROM occ GROUP BY 1),
      |vid AS (SELECT subword,
      |    CAST(row_number() OVER (ORDER BY n DESC, subword) - 1 AS BIGINT) AS token_id
      |  FROM vc),
      |j AS (SELECT occ.doc_id, occ.pos, vid.token_id FROM occ JOIN vid USING (subword)),
      |g AS (SELECT doc_id, list(CAST(token_id AS VARCHAR) ORDER BY pos) AS ids
      |  FROM j GROUP BY 1)
      |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(ids, 1, 8), ' ') AS ids_head,
      |  md5(array_to_string(ids, ' ')) AS ids_md5
      |FROM g""".stripMargin))

  /** Vocab-ID sequence assembly (TextAnalysis.packSequenceIds) — the
    * trainer-bytes shape: pack_sequences' concat-and-chunk over the
    * token_ids frequency-rank vocab, each fixed-length sequence witnessed
    * by its first-8 ids and the md5 of the space-joined decimal id
    * stream. Oracle = the token_ids vocab CTEs feeding the pack CTEs. */
  private val pipelinePackIds = Q("pipeline_pack_ids",
    (s, dir) => TextAnalysis.packSequenceIds(Tables.documents(s, dir),
      capacityTokens = 512, nShards = 8),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocArr,
      |occ AS (SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS subword
      |  FROM bpe_docarr),
      |vc AS (SELECT subword, count(*) AS n FROM occ GROUP BY 1),
      |vid AS (SELECT subword,
      |    CAST(row_number() OVER (ORDER BY n DESC, subword) - 1 AS BIGINT) AS token_id
      |  FROM vc),
      |ids AS (SELECT occ.doc_id, list(CAST(vid.token_id AS VARCHAR) ORDER BY occ.pos) AS w
      |  FROM occ JOIN vid USING (subword) GROUP BY 1),
      |${packSeqCtes("ids", 512, 8)}
      |SELECT shard, seq_id, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(len(seq) AS BIGINT) AS seq_len,
      |  array_to_string(list_slice(seq, 1, 8), ' ') AS ids_head,
      |  md5(array_to_string(seq, ' ')) AS ids_md5
      |FROM g""".stripMargin))

  /** The CAPSTONE composition — a crawl lands, trainer bytes leave, ONE
    * call: canonical-URL dedup (cheapest tier) → NFC normalization →
    * quality + model-language gate → exact dedup → LSH near-dup removal →
    * fixed-length sequence packing. Every stage is an already-oracled
    * operator and the oracle chains the same shared fragments (the URL
    * survivor set restricts the gate membership). The corpus text is
    * ASCII, so the NFC pass is provably the identity HERE — it is applied
    * for the contract and exercised with planted non-ASCII by
    * text_normalize / dedup_exact_nfc. Output = the (shard, seq) trainer
    * layout with a per-sequence content witness. */
  private val pipelineCrawlToTrainer = Q("pipeline_crawl_to_trainer",
    (s, dir) => {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => graft.plans.NfcNormalize(exprs.head), "built-in")
      val urlKeep = Dedup.urlDedup(plantedUrls(s, dir))
        .where(col("is_canonical") === 1).select(col("doc_id"))
      val corpus = Tables.documents(s, dir).join(urlKeep, "doc_id")
        .select(col("doc_id"), expr("nfc_normalize(text)").as("text"))
      TextAnalysis.packSequences(
        docsPrepPrepped(corpus).select(col("doc_id"), col("text")), 512, 8)
    },
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocArr,
      |u AS ($plantedUrlSql),
      |cu AS (SELECT doc_id, coalesce(${Dedup.canonicalUrlSql("url")},
      |    chr(0) || 'doc:' || CAST(doc_id AS VARCHAR)) AS canonical_url FROM u),
      |usv AS (SELECT doc_id FROM (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id
      |  FROM cu) WHERE doc_id = keep_id),
      |${docsPrepCtes("JOIN usv ON usv.doc_id = m.doc_id")},
      |${packSeqCtes(
        "(SELECT a.doc_id, a.w FROM bpe_docarr a JOIN prepped p ON p.doc_id = a.doc_id)",
        512, 8)}
      |$packSeqSelect""".stripMargin), bench = true)

  /** Overlapping token-window chunking (TextAnalysis.chunkDocuments):
    * windows of 128 REAL BPE tokens overlapping by 32; `chunk_text` is
    * the ORIGINAL words whose token spans intersect the window (words
    * straddling an edge appear whole in both chunks — round-9 review
    * fix: never emit space-joined subword pieces). */
  /** The chunk derivation as a CTE chain ending in `chunks(doc_id,
    * chunk_idx, chunk_text, chunk_tokens)` — shared by the
    * pipeline_chunk_docs oracle and the RAG retrieval capstone (CTE names
    * are c_-prefixed so the chain composes with the hybrid fragment's
    * occ/sp names). Must appear inside WITH RECURSIVE (the BPE block). */
  private def chunkDocsCtes: String =
    s"""$duckBpeBlock,
      |c_occ AS (SELECT doc_id, generate_subscripts(wd, 1) AS pos, unnest(wd) AS word
      |  FROM (SELECT doc_id, $duckToks AS wd FROM documents)),
      |c_wl AS (SELECT c_occ.doc_id, c_occ.pos, c_occ.word, CAST(len(f.syms) AS BIGINT) AS bl
      |  FROM c_occ JOIN bpe_enc_final f ON f.w = c_occ.word),
      |c_sp AS (SELECT *, CAST(sum(bl) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS e,
      |    CAST(sum(bl) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM c_wl),
      |c_sp2 AS (SELECT *, e - bl AS s,
      |    CASE WHEN n <= 128 THEN 1 ELSE 1 + (n - 128 + 95) // 96 END AS nc FROM c_sp),
      |c_ex AS (SELECT doc_id, pos, word, n,
      |    CAST(unnest(range(
      |      CASE WHEN s + 1 > 128 THEN (s - 128 + 96) // 96 ELSE 0 END,
      |      least((e - 1) // 96, nc - 1) + 1)) AS BIGINT) AS chunk_idx
      |  FROM c_sp2),
      |chunks AS (SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |  string_agg(word, ' ' ORDER BY pos) AS chunk_text,
      |  CAST(least(any_value(n) - chunk_idx * 96, 128) AS INTEGER) AS chunk_tokens
      |FROM c_ex GROUP BY doc_id, chunk_idx)""".stripMargin

  private val pipelineChunkDocs = Q("pipeline_chunk_docs",
    (s, dir) => TextAnalysis.chunkDocuments(Tables.documents(s, dir),
      chunkTokens = 128, overlap = 32),
    Some(s"""WITH RECURSIVE $chunkDocsCtes
      |SELECT doc_id, chunk_idx, chunk_text, chunk_tokens FROM chunks""".stripMargin))

  /** Balanced per-class sample (TextAnalysis.classSample): 5 docs per
    * lang by md5 rank, executed by the custom TopKPlan bounded heaps —
    * a second oracled query through the tier-(c) operator. */
  private val pipelineClassSample = Q("pipeline_class_sample",
    (s, dir) => TextAnalysis.classSample(Tables.documents(s, dir), "lang", 5),
    Some("""WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank FROM h)
      |SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id FROM r WHERE rank <= 5""".stripMargin))

  /** Deterministic train/val/test split (TextAnalysis.trainSplit):
    * 80/10/10 by md5 percentile — doc-level labels, hash-exact. */
  private val pipelineTrainSplit = Q("pipeline_train_split",
    (s, dir) => TextAnalysis.trainSplit(Tables.documents(s, dir), 80, 10)
      .select(col("doc_id"), col("lang"), col("split")),
    Some("""SELECT doc_id, lang,
      |  CASE WHEN u < 80 THEN 'train' WHEN u < 90 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS u
      |  FROM documents)""".stripMargin))

  /** Leakage-safe GROUPED split (TextAnalysis.groupSplit): split assigned
    * by md5-percentile of the `source` group key, so every document of a
    * source lands in the same split — near-duplicates (which cluster
    * within a group) can never straddle train/test and inflate eval
    * scores. The per-source coherence itself is part of the oracled
    * output: n_source_splits counts DISTINCT splits within the doc's
    * source and must be 1 everywhere, checked by DuckDB's independent
    * re-derivation, not just claimed. */
  private val pipelineGroupSplit = Q("pipeline_group_split",
    (s, dir) => TextAnalysis.groupSplit(Tables.documents(s, dir),
        "source", 80, 10)
      .withColumn("n_source_splits", size(collect_set(col("split")).over(
        Window.partitionBy(col("source")))).cast("long"))
      .select(col("doc_id"), col("source"), col("split"),
        col("n_source_splits")),
    Some("""WITH g AS (SELECT doc_id, source,
      |  CASE WHEN u < 80 THEN 'train' WHEN u < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(
      |      coalesce(source, chr(0) || 'doc:' || CAST(doc_id AS VARCHAR))
      |    ), 1, 4)) AS INTEGER) % 100 AS u
      |    FROM documents))
      |SELECT doc_id, source, split,
      |  CAST(count(DISTINCT split) OVER (PARTITION BY source) AS BIGINT)
      |    AS n_source_splits
      |FROM g""".stripMargin))

  private def hash16Sql: String =
    """(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096 +
      |(strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256 +
      |(strpos('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16 +
      |(strpos('0123456789abcdef', substr(md5(t), 4, 1)) - 1)""".stripMargin

  private val dedupSimhash = Q("dedup_simhash",
    (s, dir) => Dedup.simhash(Tables.documents(s, dir)),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |hs AS (SELECT doc_id, list_transform(w, t -> $hash16Sql) AS h FROM toks)
      |SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 15), b ->
      |  CASE WHEN list_sum(list_transform(h, x -> ((x >> b) & 1) * 2 - 1)) > 0
      |       THEN (1 << b) ELSE 0 END)) AS INTEGER) AS simhash
      |FROM hs""".stripMargin))

  private val dedupEmbedding = Q("dedup_embedding",
    (s, dir) => Dedup.embeddingNearDups(Tables.embeddings(s, dir), 0.2),
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.2""".stripMargin))

  /** DuckDB fragment for the label-free LSH near-dup pairs (vec_a, vec_b,
    * cosine): same plane literals as sim_lsh_topk's oracle. `multiProbe`
    * adds the Hamming-1 probe fan-out on side A (a pair's bucket-XOR is
    * fixed, so no pair matches twice). */
  private def duckLshPairsSql(multiProbe: Boolean, minCosine: Double): String = {
    val planes = Similarity.lshPlanes(6, 64)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    val aSide =
      if (multiProbe)
        """pa AS (SELECT vec_id, v, nrm, xor(bucket, flip) AS bucket
          |       FROM n CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip)),""".stripMargin
      else "pa AS (SELECT * FROM n),"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
      |$aSide
      |lshp AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
      |FROM pa a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= $minCosine)
      |""".stripMargin
  }

  /** Label-free near-dup (Dedup.embeddingNearDupsLsh): blocked by the
    * deterministic sign-LSH bucket instead of a label column — the variant
    * that runs on an unlabeled 100 TB corpus. Threshold 0.2 (matching
    * dedup_embedding) keeps the pair surface non-trivial at sf0.01. */
  private val dedupEmbeddingLsh = Q("dedup_embedding_lsh",
    (s, dir) => Dedup.embeddingNearDupsLsh(Tables.embeddings(s, dir), 0.2),
    Some(duckLshPairsSql(multiProbe = false, 0.2) + "SELECT * FROM lshp"))

  /** Multi-probe variant: pairs straddling ONE hyperplane (Hamming-1
    * buckets) are also found — the recall knob of the label-free path. A
    * pair's bucket-XOR pattern is fixed, so probes can't double-count
    * (see Dedup.embeddingNearDupsLshMultiProbe); deterministic ⇒ oracled. */
  private val dedupEmbeddingLshMp = Q("dedup_embedding_lsh_mp",
    (s, dir) => Dedup.embeddingNearDupsLshMultiProbe(Tables.embeddings(s, dir), 0.2),
    Some(duckLshPairsSql(multiProbe = true, 0.2) + "SELECT * FROM lshp"))

  /** The end of the label-free pipeline: connected components over the
    * multi-probe pair graph (pairs → clusters → min-id representative),
    * against the same recursive-CTE oracle shape as dedup_clusters. */
  private val dedupEmbeddingClusters = Q("dedup_embedding_clusters",
    (s, dir) => Dedup.embeddingNearDupClusters(Tables.embeddings(s, dir), 0.2),
    Some(s"""WITH RECURSIVE ${duckLshPairsSql(multiProbe = true, 0.2).stripPrefix("WITH ")},
      |edges AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM lshp
      |          UNION ALL SELECT vec_b, vec_a FROM lshp),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached)
      |SELECT node AS vec_id, least(node, min(reached)) AS cluster
      |FROM reach GROUP BY node""".stripMargin))

  /** Unicode NFC normalization (native codegen NfcNormalize, tier (b)) —
    * the hygiene pass before any content hashing: composed "é" (U+00E9)
    * and decomposed "e"+U+0301 must dedup identically. The corpus text is
    * ASCII, so each doc PLANTS a decomposed-é / composed-é / Hangul-Jamo
    * suffix by doc_id residue; the oracle replays DuckDB's utf8proc
    * nfc_normalize (both sides implement UAX #15, spec-pinned) and the
    * md5 witnesses byte identity of the normalized text. */
  private val textNormalize = Q("text_normalize",
    (s, dir) => {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => graft.plans.NfcNormalize(exprs.head), "built-in")
      Tables.documents(s, dir).select(col("doc_id"), concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(" cafe\u0301"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(" caf\u00e9"))
            .otherwise(lit(" \u1100\u1161"))).as("raw"))
        .select(col("doc_id"), length(col("raw")).as("raw_len"),
          expr("nfc_normalize(raw)").as("nfc"))
        .select(col("doc_id"), col("raw_len"),
          length(col("nfc")).as("nfc_len"), md5(col("nfc")).as("nfc_md5"))
    },
    Some("""WITH planted AS (SELECT doc_id, text ||
      |  (CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
      |        WHEN doc_id % 3 = 1 THEN ' caf' || chr(233)
      |        ELSE ' ' || chr(4352) || chr(4449) END) AS raw
      |  FROM documents),
      |n AS (SELECT doc_id, length(raw) AS raw_len, nfc_normalize(raw) AS nfc
      |      FROM planted)
      |SELECT doc_id, CAST(raw_len AS INTEGER) AS raw_len,
      |  CAST(length(nfc) AS INTEGER) AS nfc_len, md5(nfc) AS nfc_md5
      |FROM n""".stripMargin))

  /** NFC → exact-dedup composition: the reason the normalize tier exists —
    * the SAME text crawled composed vs decomposed must collapse to ONE
    * dedup group. Each doc plants a suffix whose encoding varies by
    * doc_id parity (composed é vs decomposed e+U+0301) over a shared
    * doc_id%250 payload, so raw md5 sees two keys where NFC sees one; the
    * oracle replays the grouping over utf8proc-normalized text. */
  private val dedupExactNfc = Q("dedup_exact_nfc",
    (s, dir) => {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => graft.plans.NfcNormalize(exprs.head), "built-in")
      val planted = Tables.documents(s, dir).select(col("doc_id"), concat(
        lit("shared payload "), pmod(col("doc_id"), lit(250)).cast("string"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(" caf\u00e9"))
          .otherwise(lit(" cafe\u0301"))).as("text"))
      Dedup.exact(planted.select(col("doc_id"),
        expr("nfc_normalize(text)").as("text")))
    },
    Some("""WITH planted AS (SELECT doc_id, 'shared payload ' ||
      |  CAST(doc_id % 250 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 2 = 0 THEN ' caf' || chr(233)
      |        ELSE ' cafe' || chr(769) END) AS text
      |  FROM documents)
      |SELECT md5(nfc_normalize(text)) AS text_md5, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM planted GROUP BY 1""".stripMargin))

  /** Compressibility signal (TextAnalysis.compressionSignal — native
    * DeflateLen): the entropy-proxy junk gate. Exact deflate byte counts
    * are run-deterministic but NOT cross-engine constants (zlib build),
    * and DuckDB has no SQL deflate — so the query emits what IS invariant
    * (the established bound-twin pattern): per-doc byte bounds and
    * repetition dominance (4×-concatenated text must deflate to well
    * under 2× the single deflate — LZ77 back-references). The REAL
    * lengths/ratios are exercised and order-pinned in CompressFnsSpec. */
  private val textCompress = Q("text_compress",
    (s, dir) => {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "deflate_len", exprs => graft.plans.DeflateLen(exprs.head), "built-in")
      Tables.documents(s, dir).select(col("doc_id"),
          octet_length(col("text")).cast("long").as("raw_bytes"),
          expr("deflate_len(text)").cast("long").as("dl"),
          expr("deflate_len(repeat(text, 4))").cast("long").as("dl4"))
        .select(col("doc_id"), col("raw_bytes"),
          (col("dl") >= 2 && col("dl") <= col("raw_bytes") + 64)
            .cast("int").as("bounded"),
          // dominance only holds while a repeat's copy can back-reference
          // the previous one — i.e. inside DEFLATE's 32 KiB match window;
          // beyond it dl4 ≈ 4·dl and the invariant is FALSE by design
          // (round-10 review), so the guard is a byte RANGE, not a floor
          when(col("raw_bytes").between(100, 32768),
              (col("dl4") < col("dl") * 2).cast("int"))
            .otherwise(lit(1)).as("repetition_dominates"))
    },
    Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS raw_bytes,
      |  1 AS bounded, 1 AS repetition_dominates
      |FROM documents""".stripMargin))

  private val textStats = Q("text_stats",
    (s, dir) => TextAnalysis.docStats(Tables.documents(s, dir)),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |toks AS (SELECT *, $duckToks AS w FROM documents)
      |SELECT doc_id,
      |  CAST(len(text) AS INTEGER) AS n_chars_measured,
      |  CAST(len(w) AS INTEGER) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INTEGER) AS n_punct,
      |  CAST(floor((CASE WHEN len(text) = 0 THEN 0.0
      |    ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / len(text) END) * 10000) AS BIGINT) AS alpha_bp,
      |  CAST(bpe_doc.n_bpe AS INTEGER) AS n_bpe_tokens,
      |  $qualityBpSql AS quality_bp
      |FROM toks JOIN bpe_doc USING (doc_id)""".stripMargin), bench = true)

  /** Real BPE tokenizer APPLY (Bpe.encode, pinned 48-rank default vocab —
    * VERDICT r8 #1): per document the word count, subword-token count,
    * distinct-subword count, and the first 8 subword tokens verbatim (so
    * the oracle checks token IDENTITY, not just arithmetic). The Spark
    * side is the native memoizing kernel applied per document; the oracle
    * re-derives the encode INDEPENDENTLY — a recursive CTE over the
    * DISTINCT-word dictionary advancing one merge rank per step — and the
    * two must agree hash-exact (same dual-derivation posture as
    * e_funnel_users). Scale shape: one narrow projection, zero shuffles;
    * the Zipf word cache makes the per-doc cost ~|words|, not
    * |words|·|ranks|. */
  private val textBpeTokens = Q("text_bpe_tokens",
    (s, dir) => {
      val toks = graft.plans.Stage(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "w", TextFns.tokens(col("text")))
      val enc = graft.plans.Stage(toks, "bpe", Bpe.encode(col("w")))
      enc.select(col("doc_id"),
        size(col("w")).as("n_words"),
        size(col("bpe")).as("n_bpe_tokens"),
        size(array_distinct(col("bpe"))).as("n_distinct_bpe"),
        concat_ws(" ", slice(col("bpe"), 1, 8)).as("bpe_head"))
    },
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocArr,
      |base AS (SELECT doc_id, $duckToks AS toks FROM documents)
      |SELECT base.doc_id,
      |  CAST(len(base.toks) AS INTEGER) AS n_words,
      |  CAST(len(coalesce(a.w, CAST([] AS VARCHAR[]))) AS INTEGER) AS n_bpe_tokens,
      |  CAST(len(list_distinct(coalesce(a.w, CAST([] AS VARCHAR[])))) AS INTEGER) AS n_distinct_bpe,
      |  array_to_string(list_slice(coalesce(a.w, CAST([] AS VARCHAR[])), 1, 8), ' ') AS bpe_head
      |FROM base LEFT JOIN bpe_docarr a USING (doc_id)""".stripMargin),
    bench = true)

  /** Corpus subword vocabulary under the pinned BPE vocab — the trained
    * tokenizer's usage profile (which merges actually fire, the
    * long-tail of partial splits). One explode + one map-side-combining
    * aggregate; shuffle width = |subword vocab|. */
  private val textBpeVocab = Q("text_bpe_vocab",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(Bpe.encode(TextFns.tokens(col("text")))).as("subword"))
      .groupBy(col("subword")).agg(count(lit(1)).as("n")),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |wc AS (SELECT w, count(*) AS c
      |  FROM (SELECT unnest($duckToks) AS w FROM documents) GROUP BY 1),
      |sv AS (SELECT unnest(f.syms) AS subword, wc.c
      |  FROM wc JOIN bpe_enc_final f ON f.w = wc.w)
      |SELECT subword, CAST(sum(c) AS BIGINT) AS n FROM sv GROUP BY 1""".stripMargin))

  /** Tokenizer-efficiency monitor: per source, characters per BPE token in
    * basis points (`chars_per_tok_bp = 10000·Σchars div Σtokens`) — the
    * compression-ratio metric a tokenizer owner tracks per corpus slice
    * (a slice drifting toward char-level splits signals vocab mismatch).
    * Integer end-to-end. */
  private val textBpeCompression = Q("text_bpe_compression",
    (s, dir) => {
      val toks = graft.plans.Stage(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")),
        "bpe", Bpe.encode(TextFns.tokens(col("text"))))
      toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("sum_chars"),
          sum(size(col("bpe"))).as("sum_bpe"))
        .select(col("source"), col("n_docs"),
          col("sum_chars").cast("long").as("sum_chars"),
          col("sum_bpe").cast("long").as("sum_bpe"),
          expr("sum_chars * 10000 div greatest(sum_bpe, 1)").as("chars_per_tok_bp"))
    },
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |j AS (SELECT d.source, d.doc_id, length(d.text) AS n_chars, b.n_bpe
      |  FROM documents d JOIN bpe_doc b USING (doc_id))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
      |  CAST(sum(n_chars) * 10000 // greatest(sum(n_bpe), 1) AS BIGINT) AS chars_per_tok_bp
      |FROM j GROUP BY 1""".stripMargin))

  private val textLangid = Q("text_langid",
    (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)),
    Some(
      s"""WITH toks AS (SELECT doc_id, lang AS labeled_lang, $duckToks AS w FROM documents),
        |scored AS (SELECT doc_id, labeled_lang, $langScoresSql FROM toks),
        |withbest AS (SELECT *, $langBestSql AS best FROM scored)
        |SELECT doc_id, labeled_lang, CASE $langCaseSql ELSE 'und' END AS predicted_lang
        |FROM withbest""".stripMargin))

  /** Model-grade language ID (TextAnalysis.langIdModel — hashed
    * char-trigram integer linear classifier, pinned offline weights,
    * VERDICT r8 #3). All-integer scores ⇒ hash-exact; the oracle rebuilds
    * the full model — trigrams, md5-nibble hash buckets, weight-table
    * lookups, argmax with priority tie-break — in DuckDB. */
  private val textLangidModel = Q("text_langid_model",
    (s, dir) => TextAnalysis.langIdModel(Tables.documents(s, dir)),
    Some(s"""WITH ${langModelCtes(Seq("lang" -> "labeled_lang"))}
      |SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es, predicted_lang
      |FROM mlang""".stripMargin))

  private val textTopTerms = Q("text_top_terms",
    (s, dir) => TextAnalysis.topTerms(Tables.documents(s, dir), 50),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents)
      |SELECT token, count(*) AS n FROM (SELECT unnest(w) AS token FROM toks)
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin), bench = true)

  /** Collocation mining (TextAnalysis.collocations): top-40 adjacent
    * bigrams by integer lift (the log-free PMI surrogate — identical
    * ranking, exact cross-engine math); hapax tail cut at pair_n ≥ 5. */
  private val textCollocations = Q("text_collocations",
    (s, dir) => TextAnalysis.collocations(Tables.documents(s, dir), 40),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |uni AS (SELECT token, count(*) AS n FROM (SELECT unnest(w) AS token FROM toks) GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM uni),
      |bg AS (SELECT unnest(${duckShingles(2)}) AS bigram FROM toks WHERE len(w) >= 2),
      |pairs AS (SELECT bigram, count(*) AS pair_n FROM bg GROUP BY 1 HAVING count(*) >= 5),
      |sp AS (SELECT bigram, pair_n, string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2 FROM pairs)
      |SELECT sp.bigram, sp.pair_n,
      |  CAST((CAST(sp.pair_n AS HUGEINT) * tot.total * 1000)
      |    // (CAST(ua.n AS HUGEINT) * ub.n) AS BIGINT) AS lift_x1000
      |FROM sp
      |JOIN uni ua ON ua.token = sp.w1
      |JOIN uni ub ON ub.token = sp.w2
      |CROSS JOIN tot
      |ORDER BY lift_x1000 DESC, bigram LIMIT 40""".stripMargin))

  /** Corpus-familiarity fluency proxy (TextAnalysis.familiarityScore):
    * per-doc mean bigram corpus frequency, integer floor-div; the
    * LM-free gibberish gate. */
  private val textFamiliarity = Q("text_familiarity",
    (s, dir) => TextAnalysis.familiarityScore(Tables.documents(s, dir), minScore = 2),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |bg AS (SELECT doc_id, unnest(${duckShingles(2)}) AS bigram FROM toks WHERE len(w) >= 2),
      |cnt AS (SELECT bigram, count(*) AS bg_n FROM bg GROUP BY 1),
      |agg AS (SELECT bg.doc_id, count(*) AS n_bigrams, CAST(sum(cnt.bg_n) AS BIGINT) AS sum_bg
      |  FROM bg JOIN cnt USING (bigram) GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(agg.sum_bg // agg.n_bigrams, 0) AS BIGINT) AS familiarity,
      |  CAST(coalesce(agg.sum_bg // agg.n_bigrams, 0) >= 2 AS INTEGER) AS keep
      |FROM toks t LEFT JOIN agg ON agg.doc_id = t.doc_id""".stripMargin))

  /** KenLM-style bigram LM with stupid backoff (TextAnalysis.lmScore) in
    * exact integer math — every log is a floored log₂ via
    * `length(bin(n)) − 1`, bit-identical cross-engine. Trained on the
    * even-doc_id half, scoring the odd half (held-out, so unseen bigrams
    * exist and the backoff arm actually executes). */
  private val textLmScore = Q("text_lm_score",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.lmScore(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1))
    },
    Some(s"""WITH tt AS (SELECT doc_id, $duckToks AS w FROM documents WHERE doc_id % 2 = 0),
      |et AS (SELECT doc_id, $duckToks AS w FROM documents WHERE doc_id % 2 = 1),
      |uni AS (SELECT token, count(*) AS n_uni FROM (SELECT unnest(w) AS token FROM tt) GROUP BY 1),
      |bgc AS (SELECT bigram, count(*) AS n_bg FROM
      |  (SELECT unnest(${duckShingles(2)}) AS bigram FROM tt WHERE len(w) >= 2) GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_uni) AS BIGINT) AS lm_total FROM uni),
      |eb AS (SELECT doc_id, bigram,
      |    string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
      |  FROM (SELECT doc_id, unnest(${duckShingles(2)}) AS bigram FROM et WHERE len(w) >= 2)),
      |sc AS (SELECT eb.doc_id,
      |    CASE WHEN bgc.n_bg IS NOT NULL
      |      THEN (length(bin(u1.n_uni)) - 1) - (length(bin(bgc.n_bg)) - 1)
      |      ELSE 4 + (length(bin(tot.lm_total)) - 1)
      |        - (length(bin(coalesce(u2.n_uni, 0) + 1)) - 1) END AS bits
      |  FROM eb LEFT JOIN bgc USING (bigram)
      |    LEFT JOIN uni u1 ON u1.token = eb.w1
      |    LEFT JOIN uni u2 ON u2.token = eb.w2
      |    CROSS JOIN tot),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(bits) AS BIGINT) AS sum_bits FROM sc GROUP BY 1)
      |SELECT e.doc_id,
      |  CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(agg.sum_bits, 0) AS BIGINT) AS sum_bits,
      |  CAST(coalesce(agg.sum_bits // agg.n_bigrams, 0) AS BIGINT) AS mean_bits,
      |  CAST(coalesce(agg.n_bigrams, 0) > 0
      |    AND coalesce(agg.sum_bits // agg.n_bigrams, 0) <= 6 AS INTEGER) AS keep
      |FROM et e LEFT JOIN agg USING (doc_id)""".stripMargin))

  /** Corpus drift monitor (TextAnalysis.corpusDrift): doc_id parity
    * splits the documents into two "snapshots"; per-token symmetric
    * divergence in basis points over the combined top-100 tokens. */
  private val textCorpusDrift = Q("text_corpus_drift",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.corpusDrift(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1), 100)
    },
    Some(s"""WITH ta AS (SELECT doc_id, $duckToks AS w FROM documents WHERE doc_id % 2 = 0),
      |tb AS (SELECT doc_id, $duckToks AS w FROM documents WHERE doc_id % 2 = 1),
      |ca AS (SELECT token, count(*) AS n FROM (SELECT unnest(w) AS token FROM ta) GROUP BY 1),
      |cb AS (SELECT token, count(*) AS n FROM (SELECT unnest(w) AS token FROM tb) GROUP BY 1),
      |top AS (SELECT token, CAST(sum(n) AS BIGINT) AS n_both
      |  FROM (SELECT * FROM ca UNION ALL SELECT * FROM cb)
      |  GROUP BY 1 ORDER BY n_both DESC, token LIMIT 100),
      |tots AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM ca) AS tot_a,
      |                (SELECT CAST(sum(n) AS BIGINT) FROM cb) AS tot_b)
      |SELECT top.token, top.n_both,
      |  CAST(coalesce(ca.n, 0) AS BIGINT) AS n_a,
      |  CAST(coalesce(cb.n, 0) AS BIGINT) AS n_b,
      |  CAST(abs(CAST(coalesce(ca.n, 0) AS HUGEINT) * tot_b - CAST(coalesce(cb.n, 0) AS HUGEINT) * tot_a) * 10000
      |    // greatest(CAST(coalesce(ca.n, 0) AS HUGEINT) * tot_b + CAST(coalesce(cb.n, 0) AS HUGEINT) * tot_a, 1) AS BIGINT) AS drift_bp
      |FROM top
      |LEFT JOIN ca USING (token)
      |LEFT JOIN cb USING (token)
      |CROSS JOIN tots""".stripMargin))

  /** Count-min sketch heavy hitters (operators.Sketch): the 4×1024 CMS is
    * built from token occurrences, then the top-20 exact terms are
    * point-estimated against it. Every cell and estimate is md5-derived ⇒
    * the DuckDB oracle reproduces the sketch bit-for-bit — a full
    * cross-engine check of a sketch STRUCTURE, not just a row count.
    * (CMS guarantee, visible in the output: cms_count ≥ exact_count.) */
  private val sketchCmsHeavyHitters = Q("sketch_cms_heavyhitters",
    (s, dir) => {
      val depth = 4; val width = 1024
      val toks = Tables.documents(s, dir)
        .select(explode(TextFns.tokens(col("text"))).as("term"))
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("term")).limit(20)
      val cms = Sketch.countMin(toks, "term", depth, width)
      exact.join(Sketch.estimate(cms, exact, "term", depth, width), "term")
    },
    Some {
      val depth = 4; val width = 1024
      def buckets(alias: String) = (0 until depth).map(i =>
        s"SELECT $i AS row, ${Sketch.bucketSql("term", i, width)} AS bucket" +
          (if (alias == "occ") "" else ", term") + s" FROM $alias")
        .mkString("\n  UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT unnest(w) AS term FROM toks),
      |cms AS (SELECT row, bucket, count(*) AS n FROM (
      |  ${buckets("occ")}) GROUP BY row, bucket),
      |exact AS (SELECT term, count(*) AS exact_count FROM occ GROUP BY term
      |          ORDER BY exact_count DESC, term LIMIT 20),
      |probes AS (
      |  ${buckets("exact")}),
      |est AS (SELECT p.term, min(coalesce(c.n, 0)) AS cms_count
      |        FROM probes p LEFT JOIN cms c ON c.row = p.row AND c.bucket = p.bucket
      |        GROUP BY p.term)
      |SELECT e.term, e.exact_count, est.cms_count FROM exact e JOIN est USING (term)""".stripMargin
    })

  /** Exact corpus vocabulary size (oracle-checked). */
  /** Sharded mergeable HLL cardinality (Sketch.hllShardSketches): per-shard
    * DataSketches binaries unioned to the global distinct-token count —
    * register updates are max-merges, so the union over the md5-disjoint
    * shards must estimate EXACTLY what one whole-corpus sketch estimates
    * (merge_consistent pins that bit-equality), and the estimate must land
    * within 10% (≈6σ at lgK=12's 1.6% rsd) of the exact count the oracle
    * recomputes. Sketch registers differ across engines, so the estimate
    * itself can never cross-engine-match — same bound-oracle style as
    * sketch_kll_quantiles. */
  private val sketchHllShards = Q("sketch_hll_shards",
    (s, dir) => {
      val toks = TextAnalysis.assignShards(Tables.documents(s, dir), 8)
        .select(col("shard"), explode(TextFns.tokens(col("text"))).as("token"))
      val merged = Sketch.hllMergedEstimate(
        Sketch.hllShardSketches(toks, "shard", "token"))
      val whole = toks.agg(
        hll_sketch_estimate(hll_sketch_agg(col("token"), 12)).as("whole_est"),
        countDistinct(col("token")).as("n_vocab"))
      merged.crossJoin(whole) // 1-row × 1-row
        .select(col("n_vocab"),
          (col("n_distinct_est") === col("whole_est")).cast("int")
            .as("merge_consistent"),
          (abs(col("n_distinct_est") - col("n_vocab")) * lit(100) <=
            col("n_vocab") * lit(10)).cast("int").as("hll_within_bound"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents)
      |SELECT count(DISTINCT token) AS n_vocab,
      |  CAST(1 AS INTEGER) AS merge_consistent,
      |  CAST(1 AS INTEGER) AS hll_within_bound
      |FROM (SELECT unnest(w) AS token FROM toks)""".stripMargin))

  /** HLL distinct-overlap estimate (Sketch.hllOverlapEstimate): the
    * inclusion–exclusion decontamination sizer — shared-vocabulary count
    * between the train split and the eval split from two sketch scans and
    * NO join. The bound is stated against the exact UNION size (each HLL
    * term's error scales with the set it sketches, so the difference
    * carries union-scale absolute error — that is the honest envelope for
    * an inclusion–exclusion estimate, not a fraction of the overlap
    * itself). Exact columns recomputed by DuckDB; bound flags oracled as
    * constants like the other sketch gates. The Spark-side exact twins
    * (distinct-join overlap, union countDistinct) exist ONLY to gate the
    * estimate — they re-tokenize the corpus on purpose; the production
    * operator is the two sketch scans alone. */
  private val sketchHllOverlap = Q("sketch_hll_overlap",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      def toks(f: DataFrame) =
        f.select(explode(TextFns.tokens(col("text"))).as("token"))
      val train = toks(docs.where(pmod(col("doc_id"), lit(7)) =!= 0))
      val evalT = toks(docs.where(pmod(col("doc_id"), lit(7)) === 0))
      val est = Sketch.hllOverlapEstimate(train, "token", evalT, "token")
      val exact = train.select("token").distinct()
        .join(evalT.select("token").distinct(), "token")
        .agg(count(lit(1)).as("n_overlap_exact"))
      val union = train.unionByName(evalT)
        .agg(countDistinct(col("token")).as("n_union_exact"))
      est.crossJoin(exact).crossJoin(union) // 1-row frames
        .select(col("n_overlap_exact"), col("n_union_exact"),
          (abs(col("n_intersect_est") - col("n_overlap_exact")) * lit(100) <=
            col("n_union_exact") * lit(10)).cast("int").as("overlap_within_bound"),
          (abs(col("n_union_est") - col("n_union_exact")) * lit(100) <=
            col("n_union_exact") * lit(10)).cast("int").as("union_within_bound"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(w) AS token FROM toks),
      |t AS (SELECT DISTINCT token FROM occ WHERE doc_id % 7 <> 0),
      |e AS (SELECT DISTINCT token FROM occ WHERE doc_id % 7 = 0)
      |SELECT
      |  (SELECT count(*) FROM t JOIN e USING (token)) AS n_overlap_exact,
      |  (SELECT count(*) FROM (SELECT token FROM t UNION SELECT token FROM e)) AS n_union_exact,
      |  CAST(1 AS INTEGER) AS overlap_within_bound,
      |  CAST(1 AS INTEGER) AS union_within_bound""".stripMargin))

  private val textVocab = Q("text_vocab",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token")).as("n_vocab"), count(lit(1)).as("n_tokens")),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents)
      |SELECT count(DISTINCT token) AS n_vocab, count(*) AS n_tokens
      |FROM (SELECT unnest(w) AS token FROM toks)""".stripMargin))

  /** The raw HLL vocabulary estimate (specs exercise it; the registered
    * row below reports its hash-checked envelope verdict instead — sketch
    * register layouts differ across engines, so the estimate itself can
    * never match a cross-engine oracle). */
  private[graft] def vocabApproxRaw(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .agg(approx_count_distinct(col("token")).as("n_vocab_approx"))

  /** HLL++ relative standard deviation for the approx-vocab gate; the
    * assertion envelope is derived from it (5σ) rather than hard-coded,
    * so tightening or loosening the sketch keeps the gate calibrated. */
  private val vocabRsd = 0.02
  private val vocabEnvelopePct: Int = math.ceil(vocabRsd * 5 * 100).toInt // 10%

  /** HLL approximate vocabulary, reported as its envelope verdict: the
    * estimate is engine-internal, but |hll − exact| ≤ 5σ·exact is a
    * deterministic fact for a given corpus (HLL has no RNG — its error is
    * fixed per dataset), so the query emits the exact vocabulary plus that
    * flag and the oracle recomputes the exact side. The envelope is 5×rsd
    * (10% at rsd 0.02) — wide enough that an in-spec estimator deviation
    * on a new corpus can't flip the gate, per round-7 advice. (Formerly
    * the separate `text_vocab_bound` twin; folded here so the driver row
    * is oracled.) */
  private val textVocabApprox = Q("text_vocab_approx",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token")).as("n_vocab"),
        approx_count_distinct(col("token"), vocabRsd).as("hll"))
      .select(col("n_vocab"),
        (abs(col("hll") - col("n_vocab")) * 100 <= col("n_vocab") * vocabEnvelopePct)
          .cast("int").as("hll_within_bound")),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents)
      |SELECT count(DISTINCT token) AS n_vocab,
      |  CAST(1 AS INTEGER) AS hll_within_bound
      |FROM (SELECT unnest(w) AS token FROM toks)""".stripMargin))

  private val textFingerprints = Q("text_fingerprints",
    (s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir)),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sh AS (SELECT doc_id, w, ${duckShingles(5)} AS sh FROM toks)
      |SELECT doc_id, md5(array_to_string(w, ' ')) AS full_md5,
      |  list_min(list_transform(sh, s -> md5(s))) AS min_shingle,
      |  list_max(list_transform(sh, s -> md5(s))) AS max_shingle
      |FROM sh""".stripMargin))

  /** Intra-doc repetition stats (TextAnalysis.repetitionStats): the
    * Gopher-style duplicate/top n-gram fractions as basis-point floors.
    * Count ratios are exact-int IEEE divisions — identical doubles both
    * engines. */
  private val textRepetition = Q("text_repetition",
    (s, dir) => TextAnalysis.repetitionStats(Tables.documents(s, dir)),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sh AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM toks),
      |occ AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      |g AS (SELECT doc_id, s, count(*) AS cnt FROM occ GROUP BY doc_id, s)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_shingles,
      |  CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(cnt) AS BIGINT) AS top_n,
      |  CAST(floor((1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)) * 10000) AS BIGINT) AS dup_bp,
      |  CAST(floor((CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)) * 10000) AS BIGINT) AS top_frac_bp
      |FROM g GROUP BY doc_id""".stripMargin))

  /** Benchmark decontamination (TextAnalysis.contamination): training docs
    * sharing ≥ 2 distinct 3-gram shingles with the doc_id%11 "eval set". */
  private val textContamination = Q("text_contamination",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.contamination(
        docs.where(pmod(col("doc_id"), lit(11)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(11)) === 0))
    },
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sh AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM toks),
      |dsh AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh),
      |bench AS (SELECT doc_id AS bench_id, s FROM dsh WHERE doc_id % 11 = 0),
      |train AS (SELECT doc_id, s FROM dsh WHERE doc_id % 11 <> 0)
      |SELECT t.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS shared_shingles
      |FROM train t JOIN bench b USING (s)
      |GROUP BY t.doc_id, b.bench_id HAVING count(*) >= 2""".stripMargin))

  /** Deterministic per-source mixture sampling (TextAnalysis.mixtureSample):
    * md5-uniform vs a per-source keep rate, the training-mix weighting
    * step; same portable-hash idiom as f_hash_sample. */
  private val textMixtureSample = Q("text_mixture_sample",
    (s, dir) => TextAnalysis.mixtureSample(Tables.documents(s, dir),
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), defaultRate = 0.1)
      .select(col("doc_id"), col("source")),
    Some("""SELECT doc_id, source FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) / 16777216.0 <
      |  CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25 ELSE 0.1 END""".stripMargin))

  /** Gap-based sessionization (Funnel.sessionize): per-event session ids
    * with the same 30-minute break rule as t_session_windows, exposed as a
    * joinable column. µs clock (see e_funnel_users). */
  private val eSessionize = Q("e_sessionize",
    (s, dir) => Funnel.sessionize(
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts")),
      gapTicks = 1800L * 1000000L),
    Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events),
      |o AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                     OR ts - lag(ts) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id, ts,
      |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |FROM o""".stripMargin))

  /** Top event paths (Funnel.topPaths): most frequent 3-step event-type
    * sequences. The Spark side slides windows over each user's ONE sorted
    * array; the oracle is the naive 2-step self-join cascade on
    * row_number — independent derivations must agree row-for-row (the
    * funnel-vs-cascade pattern). µs clock both sides. */
  private val eTopPaths = Q("e_top_paths",
    (s, dir) => Funnel.topPaths(
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts div 1000").as("ts")),
      pathLen = 3, topN = 20),
    Some("""WITH e AS (SELECT user_id, event_type,
      |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      |p AS (SELECT a.event_type || '>' || b.event_type || '>' || c.event_type AS path
      |  FROM e a
      |  JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      |  JOIN e c ON c.user_id = a.user_id AND c.rn = a.rn + 2)
      |SELECT path, count(*) AS n FROM p GROUP BY 1
      |ORDER BY n DESC, path LIMIT 20""".stripMargin))

  /** Last-touch attribution: each purchase joined to the latest same-user
    * click within a 7-day window — the as-of operator (AsOfJoin) composed
    * onto the events domain; the oracle is DuckDB's NATIVE ASOF LEFT JOIN
    * with the tolerance applied as a post-gate, so two independent as-of
    * implementations must agree. */
  private val eAttribution = Q("e_attribution",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOfJoin.lastValueAsOf(purchases, clicks, keys = Seq("user_id"),
        tsCol = "ts", probeCols = Seq("purchase_id"),
        payloadCols = Seq("click_id"),
        tolerance = Some(7L * 24 * 3600 * 1000000L))
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts FROM events),
      |p AS (SELECT user_id, ts, event_id AS purchase_id FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS cts, event_id AS click_id FROM e WHERE event_type = 'click')
      |SELECT p.user_id, p.ts, p.purchase_id,
      |  CASE WHEN p.ts - c.cts <= 604800000000 THEN c.click_id END AS click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.cts""".stripMargin))

  /** Feature-hashing document embedder (TextAnalysis.embedDocuments),
    * compared in long form (doc_id, dim_idx, weight) including untouched
    * dimensions so the array layout is pinned, not just the hits. */
  private val pipelineEmbedDocs = Q("pipeline_embed_docs",
    (s, dir) => TextAnalysis.embedDocuments(Tables.documents(s, dir), dim = 16)
      .select(col("doc_id"), posexplode(col("embedding")))
      .withColumnsRenamed(Map("pos" -> "dim_idx", "col" -> "weight")),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(w) AS t FROM toks),
      |hx AS (SELECT doc_id, md5(t) AS m FROM occ),
      |sig AS (SELECT doc_id, (${TextFns.md5Base28Sql("m")}) % 16 AS b,
      |  (((${TextFns.md5Base28Sql("m")}) // 16) % 2) * 2 - 1 AS s FROM hx),
      |agg AS (SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS w FROM sig GROUP BY 1, 2),
      |grid AS (SELECT doc_id, r.range AS dim_idx FROM documents CROSS JOIN range(0, 16) r)
      |SELECT g.doc_id, CAST(g.dim_idx AS INTEGER) AS dim_idx,
      |  coalesce(a.w, 0) AS weight
      |FROM grid g LEFT JOIN agg a ON a.doc_id = g.doc_id AND a.b = g.dim_idx""".stripMargin))

  /** The composed doc → embed → ANN pipeline: hash-embed every document,
    * then brute-force cosine top-k through the SAME Similarity machinery
    * (DotProductD + WindowGroupLimit) the float embeddings use. The oracle
    * re-derives the vectors in SQL and re-ranks with list_dot_product —
    * the full pipeline is hash-checked end to end. */
  private val pipelineEmbedTopk = Q("pipeline_embed_topk",
    (s, dir) => {
      val vecs = TextAnalysis.embedDocuments(Tables.documents(s, dir), dim = 16)
        .select(col("doc_id").as("vec_id"), lit(0).as("label"),
          transform(col("embedding"), _.cast("double")).as("embedding"))
        .where(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x) > 0)
      Similarity.bruteTopK(vecs, k = 5, stride = 50)
    },
    Some(s"""WITH $docVecCtes,
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec
      |  WHERE list_dot_product(v, v) > 0),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 50 = 0),
      |sc AS (SELECT q.query_id, n.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) AS cosine
      |      FROM q CROSS JOIN n WHERE n.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM sc)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 5""".stripMargin))

  /** The document-embedding vector table behind the decontamination and
    * topic-clustering pipelines: feature-hash embed at dim 16, cast to
    * double, zero vectors dropped (no cosine), constant label 0 (the
    * similarity ops' prepared() contract). */
  private def docVecsFrom(docs: DataFrame): DataFrame =
    TextAnalysis.embedDocuments(docs, dim = 16)
      .select(col("doc_id").as("vec_id"), lit(0).as("label"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
      .where(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x) > 0)

  private def docVecs(s: SparkSession, dir: String): DataFrame =
    docVecsFrom(Tables.documents(s, dir))

  /** Trained doc-topic centroids, memoized per (sfDir, nCells): training
    * is bit-deterministic, so the four consumers (two topic query fns +
    * their two derived oracles) share ONE training run per JVM instead of
    * re-running the ~8-pass eager loop four times. Bounded: one entry per
    * distinct (sfDir, nCells). ASSUMES the data under sfDir is immutable
    * for the JVM lifetime (true for the driver's testdata dirs): if a dir
    * is regenerated mid-session, query AND derived oracle both serve the
    * stale centroids — verification would still pass but reflect the old
    * training. Key the cache on a dataset fingerprint if that ever changes. */
  private val docCentroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[Array[Double]]]()
  private def docCentroids(s: SparkSession, dir: String,
      nCells: Int): Seq[Array[Double]] =
    docCentroidCache.computeIfAbsent((dir, nCells),
      _ => Similarity.kmeansCentroidArrays(docVecs(s, dir), nCells))

  /** [[docVecsFrom]]'s DuckDB re-derivation over any source relation
    * `src(doc_id, text)`: CTEs `toks`…`vec` (vec_id, v) — append an `n`
    * CTE for norms / buckets per query. Pre-stripped; interpolate
    * directly after WITH. */
  private def docVecCtesFor(src: String): String =
    s"""toks AS (SELECT doc_id, $duckToks AS w FROM $src),
      |occ AS (SELECT doc_id, unnest(w) AS t FROM toks),
      |hx AS (SELECT doc_id, md5(t) AS m FROM occ),
      |sig AS (SELECT doc_id, (${TextFns.md5Base28Sql("m")}) % 16 AS b,
      |  (((${TextFns.md5Base28Sql("m")}) // 16) % 2) * 2 - 1 AS s FROM hx),
      |agg AS (SELECT doc_id, b, sum(s) AS w FROM sig GROUP BY 1, 2),
      |grid AS (SELECT doc_id, r.range AS dim_idx FROM $src CROSS JOIN range(0, 16) r),
      |vec AS (SELECT g.doc_id AS vec_id,
      |    list(CAST(coalesce(a.w, 0) AS DOUBLE) ORDER BY g.dim_idx) AS v
      |  FROM grid g LEFT JOIN agg a ON a.doc_id = g.doc_id AND a.b = g.dim_idx
      |  GROUP BY g.doc_id)""".stripMargin

  private lazy val docVecCtes: String = docVecCtesFor("documents")

  /** Semantic decontamination (Similarity.crossTopK over
    * TextAnalysis.embedDocuments): every 10th document plays the held-out
    * benchmark; for each benchmark doc the 3 nearest TRAINING docs by
    * embedding cosine — the report a curator reads to find paraphrased eval
    * items that n-gram contamination checks (text_contamination) miss. The
    * whole chain — feature-hash embed, split, cross-corpus ANN — is
    * deterministic and oracled end-to-end. */
  private val pipelineDecontamTopk = Q("pipeline_decontam_topk",
    (s, dir) => {
      val vecs = docVecs(s, dir)
      Similarity.crossTopK(
        vecs.where(pmod(col("vec_id"), lit(10)) =!= 0),
        vecs.where(pmod(col("vec_id"), lit(10)) === 0), k = 3)
    },
    Some(s"""WITH $docVecCtes,
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec
      |  WHERE list_dot_product(v, v) > 0),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 10 = 0),
      |sc AS (SELECT q.query_id, n.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) + 0.0 AS cosine
      |      FROM q CROSS JOIN n WHERE n.vec_id % 10 <> 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM sc)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 3""".stripMargin))

  /** Topic clustering over the document embedder (Similarity.kmeansAssign
    * ∘ TextAnalysis.embedDocuments): train k-means‖ cells on the dim-16
    * doc vectors, assign every doc, and summarize each cluster (size +
    * best-fitting exemplar doc) — the corpus-curation view that tells a
    * data engineer what the corpus is MADE of before weighting it.
    * Training is bit-deterministic (sorted candidates, round-6 Lloyd
    * means), so the oracle is DERIVED at verify time: the trained
    * centroids interpolate as literals and DuckDB independently re-embeds,
    * re-assigns (same round-6/min-cell argmax), and re-summarizes. */
  private val pipelineTopicClusters = Q("pipeline_topic_clusters",
    (s, dir) => {
      val assigned = Similarity.kmeansAssignWith(docVecs(s, dir),
        docCentroids(s, dir, nCells = 8))
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("cell_cos").desc, col("vec_id"))
      assigned
        .withColumn("_rn", row_number().over(w))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_docs"),
          max(when(col("_rn") === 1, col("vec_id"))).as("exemplar_id"),
          max(when(col("_rn") === 1, col("cell_cos"))).as("exemplar_cos"))
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = docCentroids(s, dir, nCells = 8)
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH $docVecCtes,
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec
        |  WHERE list_dot_product(v, v) > 0),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |assigned AS (
        |  SELECT vec_id, cell, cell_cos FROM (
        |    SELECT n.vec_id, cn.cell,
        |      ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) + 0.0 AS cell_cos,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY cell
        |    ORDER BY cell_cos DESC, vec_id) AS rn FROM assigned)
        |SELECT cell, count(*) AS n_docs,
        |  max(CASE WHEN rn = 1 THEN vec_id END) AS exemplar_id,
        |  max(CASE WHEN rn = 1 THEN cell_cos END) AS exemplar_cos
        |FROM ranked GROUP BY cell""".stripMargin
    })

  /** Topic-balanced sampling: k docs per TRAINED cluster — classSample
    * (the TopKPlan bounded-heap path) running on the kmeansAssign output
    * instead of a stored label, i.e. balance the training mix across
    * DISCOVERED topics, not just given metadata. Derived oracle like
    * pipeline_topic_clusters (same assignment CTE, then the md5-rank cut
    * of pipeline_class_sample). */
  private val pipelineTopicSample = Q("pipeline_topic_sample",
    (s, dir) => {
      val assigned = Similarity.kmeansAssignWith(docVecs(s, dir),
          docCentroids(s, dir, nCells = 8))
        .select(col("vec_id").as("doc_id"), col("cell"))
      TextAnalysis.classSample(assigned, "cell", k = 10)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = docCentroids(s, dir, nCells = 8)
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH $docVecCtes,
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec
        |  WHERE list_dot_product(v, v) > 0),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |assigned AS (
        |  SELECT vec_id AS doc_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |h AS (SELECT doc_id, cell, md5(CAST(doc_id AS VARCHAR)) AS h FROM assigned),
        |r AS (SELECT *, row_number() OVER (PARTITION BY cell ORDER BY h, doc_id) AS rank FROM h)
        |SELECT cell, CAST(rank AS INTEGER) AS rank, doc_id FROM r WHERE rank <= 10""".stripMargin
    })

  /** pipeline_decontam_topk's SCALE path: the same embed → split →
    * cross-ANN chain, but bucketed with dim-16 hyperplanes
    * (crossTopKLsh(dim = 16)) so the benchmark-vs-training search is one
    * equi-join at any corpus size instead of the brute cross join. Both
    * engines derive buckets from the same interpolated plane literals. */
  private val pipelineDecontamLsh = Q("pipeline_decontam_lsh",
    (s, dir) => {
      val vecs = docVecs(s, dir)
      Similarity.crossTopKLsh(
        vecs.where(pmod(col("vec_id"), lit(10)) =!= 0),
        vecs.where(pmod(col("vec_id"), lit(10)) === 0), k = 3, nPlanes = 6,
        dim = 16)
    },
    Some {
      val planes = Similarity.lshPlanes(6, 16)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH $docVecCtes,
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM vec
        |  WHERE list_dot_product(v, v) > 0),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 10 = 0),
        |sc AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN n USING (bucket) WHERE n.vec_id % 10 <> 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 3""".stripMargin
    }, bench = true)

  /** Cross-corpus LSH top-k (Similarity.crossTopKLsh) on the embeddings
    * table — the decontamination scale path: both sides bucket on the same
    * shared hyperplanes, so the search is one equi-join however large the
    * training side grows. Every 5th vector plays the query set. */
  private val simCrossLshTopk = Q("sim_cross_lsh_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.crossTopKLsh(
        e.where(pmod(col("vec_id"), lit(5)) =!= 0),
        e.where(pmod(col("vec_id"), lit(5)) === 0), k = 10)
    },
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 5 = 0),
        |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN n USING (bucket) WHERE n.vec_id % 5 <> 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Multi-probe cross-corpus LSH top-k (Similarity.crossTopKLshMultiProbe
    * — Lv et al. 2007's recall knob on the two-table bucket path): each
    * query probes its own plus every Hamming-1 bucket; the probe explode
    * stays on the tiny broadcast query side, the corpus keeps one bucket
    * per row, so no dedup is ever needed. Deterministic ⇒ oracled: the
    * DuckDB twin unnests the same xor probe list. */
  private val simCrossLshMp = Q("sim_cross_lsh_mp",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.crossTopKLshMultiProbe(
        e.where(pmod(col("vec_id"), lit(5)) =!= 0),
        e.where(pmod(col("vec_id"), lit(5)) === 0), k = 10)
    },
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      val probes = (Seq("bucket") ++ (0 until 6).map(p =>
        s"xor(bucket, ${1 << p})")).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 5 = 0),
        |q AS (SELECT query_id, qv, qnrm, unnest($probes) AS bucket FROM q0),
        |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN n USING (bucket) WHERE n.vec_id % 5 <> 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Cross-corpus IVF top-k against the PERSISTED centroid index
    * (Similarity.crossTopKIvf, nProbes = 2): centroids are trained on
    * the corpus side once and loaded from the parquet artifact
    * (embCentroids — the same index dedup_semantic shares); the corpus
    * assigns to cells with the round-6 argmax, each query probes its 2
    * nearest cells — the trained-index sibling of sim_cross_lsh_topk.
    * Derived oracle: centroid literals, DuckDB re-derives assignment,
    * probe ranking and the search identically. */
  private val simCrossIvfTopk = Q("sim_cross_ivf_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val corpus = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
      Similarity.crossTopKIvf(corpus,
        e.where(pmod(col("vec_id"), lit(5)) === 0), k = 10,
        embCentroids(s, dir, "corp5", corpus), nProbes = 2)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "corp5",
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(5)) =!= 0))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 5 <> 0)
        |  WHERE crn = 1),
        |q AS (SELECT query_id, qv, qnrm, cell FROM (
        |    SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qnrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.cv) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 5 = 0)
        |  WHERE pr <= 2),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN assigned a ON a.cell = q.cell),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Token-budget mixture (TextAnalysis.tokenBudgetSample): greedy prefix
    * in portable md5 order until each source's token budget fills. The
    * Spark side is the bucket-refined prefix-sum (256-way parallel); the
    * oracle is the NAIVE single global window per source — the two must
    * agree bit-for-bit because the bucket is a prefix of the order key. */
  private val textTokenBudget = Q("text_token_budget",
    (s, dir) => TextAnalysis.tokenBudgetSample(Tables.documents(s, dir),
      Map("src0" -> 700L, "src1" -> 2000L), defaultBudget = 500L),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |d AS (SELECT dd.doc_id, dd.source, md5(CAST(dd.doc_id AS VARCHAR)) AS u,
      |  b.n_bpe AS n_tokens FROM documents dd JOIN bpe_doc b ON b.doc_id = dd.doc_id),
      |b AS (SELECT *, CASE source WHEN 'src0' THEN 700 WHEN 'src1' THEN 2000
      |  ELSE 500 END AS budget FROM d),
      |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
      |  ROWS UNBOUNDED PRECEDING) AS cum FROM b)
      |SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_toks
      |FROM c WHERE cum <= budget""".stripMargin))

  /** PII scrub (TextAnalysis.piiRedact). The synthetic corpus contains no
    * PII, so the query plants one deterministic email / IPv4 / phone per
    * document from its own key columns (same expression in both engines)
    * and the oracle re-runs the identical regex chain in DuckDB — the
    * patterns are written in the Java-regex ∩ RE2 syntax subset
    * (TextFns.PiiPatterns) precisely so both engines match the same spans. */
  private val textPiiRedact = Q("text_pii_redact",
    (s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".example.com"),
        lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
        lit(" call 555-"),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
        lit("-"),
        lpad(pmod(col("doc_id") * 3, lit(10000)).cast("string"), 4, "0")).as("text"))
      TextAnalysis.piiRedact(planted)
    },
    Some {
      val counts = TextFns.PiiPatterns.map { case (label, pat, _) =>
        s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_${label}s"
      }.mkString(",\n      |  ")
      val redact = TextFns.PiiPatterns.foldLeft("t") { case (acc, (_, pat, repl)) =>
        s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      s"""WITH raw AS (SELECT doc_id, text
      |  || ' contact user' || CAST(doc_id AS VARCHAR)
      |  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
      |  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |  || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      |  || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') AS t
      |  FROM documents)
      |SELECT doc_id,
      |  $counts,
      |  $redact AS redacted
      |FROM raw""".stripMargin
    })

  /** Paragraph-level exact dedup (TextAnalysis.paragraphDedup): global
    * first-occurrence keep over 20-token paragraphs, per-doc reassembly.
    * The oracle mirrors the same chunking arithmetic as pipeline_chunk_docs
    * (overlap 0) plus the first-occurrence window and an ordered
    * string_agg. */
  private val dedupParagraphs = Q("dedup_paragraphs",
    (s, dir) => TextAnalysis.paragraphDedup(Tables.documents(s, dir),
      paraTokens = 20),
    Some(s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sized AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n FROM t WHERE len(w) > 0),
      |counted AS (SELECT doc_id, w,
      |  CAST(((n + 19) - ((n + 19) % 20)) / 20 AS INTEGER) AS n_paras FROM sized),
      |ex AS (SELECT doc_id, w, n_paras,
      |  CAST(unnest(generate_series(0, n_paras - 1)) AS INTEGER) AS pos FROM counted),
      |para AS (SELECT doc_id, n_paras, pos,
      |  array_to_string(list_slice(w, pos * 20 + 1, pos * 20 + 20), ' ') AS para FROM ex),
      |first AS (SELECT *, row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      |  FROM para)
      |SELECT doc_id, max(n_paras) AS n_paras, count(*) AS n_kept,
      |  string_agg(para, ' ' ORDER BY pos) AS clean_text
      |FROM first WHERE rn = 1 GROUP BY doc_id""".stripMargin))

  /** ExactSubstr cross-document span dedup
    * (TextAnalysis.exactSubstrDedup): overlapping 10-token anchors, global
    * first-occurrence keep, per-token coverage rebuild. The oracle derives
    * the same report through an independent exploded-join formulation
    * (token×position LEFT JOIN covered-position set) rather than the
    * engine's array-rebuild, so the two sides must agree on every kept
    * token, not just counts. */
  private val dedupExactSubstr = Q("dedup_exact_substr",
    (s, dir) => TextAnalysis.exactSubstrDedup(Tables.documents(s, dir),
      spanTokens = 10),
    Some(s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sized AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n FROM t WHERE len(w) > 0),
      |anch AS (SELECT doc_id, w,
      |  CAST(unnest(generate_series(0, n - 10)) AS INTEGER) AS pos
      |  FROM sized WHERE n >= 10),
      |hashed AS (SELECT doc_id, pos,
      |  md5(array_to_string(list_slice(w, pos + 1, pos + 10), ' ')) AS h FROM anch),
      |marked AS (SELECT doc_id, pos,
      |  count(*) OVER (PARTITION BY h) AS cnt,
      |  row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM hashed),
      |cov AS (SELECT DISTINCT doc_id,
      |  CAST(unnest(generate_series(pos, pos + 9)) AS INTEGER) AS cpos
      |  FROM marked WHERE cnt > 1 AND rn > 1),
      |tok AS (SELECT doc_id, n,
      |  CAST(unnest(generate_series(1, n)) AS INTEGER) AS p, w FROM sized),
      |kept AS (SELECT k.doc_id, k.n, k.p, k.w[k.p] AS tokstr, c.cpos
      |  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.p - 1 = c.cpos)
      |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
      |  CAST(count(cpos) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(CASE WHEN cpos IS NULL THEN tokstr END, ' ' ORDER BY p), '') AS clean_text
      |FROM kept GROUP BY doc_id""".stripMargin), bench = true)

  /** Incremental ExactSubstr (TextAnalysis.exactSubstrDedupIncremental):
    * the batch (doc_id % 7 ≠ 0) dedups spans against itself AND the
    * persisted span index of history (doc_id % 7 = 0). The oracle
    * re-derives the index from history's raw text — independent
    * derivations agreeing, like dedup_minhash_incr. */
  private val dedupExactSubstrIncr = Q("dedup_exact_substr_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.exactSubstrDedupIncremental(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0),
        TextAnalysis.spanIndex(docs.where(pmod(col("doc_id"), lit(7)) === 0)),
        spanTokens = 10)
    },
    Some(s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sized AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n FROM t WHERE len(w) > 0),
      |banch AS (SELECT doc_id, w,
      |  CAST(unnest(generate_series(0, n - 10)) AS INTEGER) AS pos
      |  FROM sized WHERE n >= 10 AND doc_id % 7 <> 0),
      |bhashed AS (SELECT doc_id, pos,
      |  md5(array_to_string(list_slice(w, pos + 1, pos + 10), ' ')) AS h FROM banch),
      |hanch AS (SELECT doc_id, w,
      |  CAST(unnest(generate_series(0, n - 10)) AS INTEGER) AS pos
      |  FROM sized WHERE n >= 10 AND doc_id % 7 = 0),
      |hidx AS (SELECT DISTINCT
      |  md5(array_to_string(list_slice(w, pos + 1, pos + 10), ' ')) AS h FROM hanch),
      |marked AS (SELECT doc_id, pos,
      |  count(*) OVER (PARTITION BY h) AS cnt,
      |  row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
      |  h IN (SELECT h FROM hidx) AS in_hist FROM bhashed),
      |cov AS (SELECT DISTINCT doc_id,
      |  CAST(unnest(generate_series(pos, pos + 9)) AS INTEGER) AS cpos
      |  FROM marked WHERE in_hist OR (cnt > 1 AND rn > 1)),
      |tok AS (SELECT doc_id, n,
      |  CAST(unnest(generate_series(1, n)) AS INTEGER) AS p, w FROM sized
      |  WHERE doc_id % 7 <> 0),
      |kept AS (SELECT k.doc_id, k.n, k.p, k.w[k.p] AS tokstr, c.cpos
      |  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.p - 1 = c.cpos)
      |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
      |  CAST(count(cpos) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(CASE WHEN cpos IS NULL THEN tokstr END, ' ' ORDER BY p), '') AS clean_text
      |FROM kept GROUP BY doc_id""".stripMargin))

  /** Bloom-prefiltered incremental span dedup: bit-identical to
    * dedup_exact_substr_incr (the semi-join drops bloom-negative anchors
    * anyway), so it shares that oracle, which knows nothing of blooms. */
  private val dedupExactSubstrIncrBloom = Q("dedup_exact_substr_incr_bloom",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = TextAnalysis.spanIndex(
        docs.where(pmod(col("doc_id"), lit(7)) === 0))
      val bloom = Dedup.buildHashBloom(idx, "h", expectedItems = 1 << 17)
      TextAnalysis.exactSubstrDedupIncremental(
        docs.where(pmod(col("doc_id"), lit(7)) =!= 0), idx,
        spanTokens = 10, historySpanBloom = Some(bloom))
    },
    dedupExactSubstrIncr.oracle)

  /** Per-document TF-IDF top terms (TextAnalysis.tfidfTopTerms): ranked by
    * the exact integer score (tf·1e6) div (df+1) with a term tie-break —
    * no float log reaches the comparison, so both engines rank
    * identically. */
  private val textTfidf = Q("text_tfidf_topk",
    (s, dir) => TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), k = 3),
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(w) AS term FROM toks),
      |g AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
      |s AS (SELECT g.doc_id, g.term, g.tf, dfreq.df,
      |  (g.tf * 1000000) // (dfreq.df + 1) AS score_ppm
      |  FROM g JOIN dfreq USING (term)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |  ORDER BY score_ppm DESC, term) AS rnk FROM s)
      |SELECT doc_id, term, tf, df, CAST(score_ppm AS BIGINT) AS score_ppm,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM r WHERE rnk <= 3""".stripMargin))

  /** Deterministic shard assignment audit (TextAnalysis.shardStats): the
    * md5-uniform mod-nShards layout a training write uses, with per-shard
    * doc / token / source balance. */
  /** Dataset card (TextAnalysis.datasetCard): the per-source datasheet a
    * corpus release ships — docs/chars, REAL BPE token totals, integer
    * mean quality, exact-dup rate, model-language mode + share. Oracle
    * composes the BPE, quality and model-lang fragments; all-integral
    * arithmetic ⇒ hash-exact. */
  private val pipelineDatasetCard = Q("pipeline_dataset_card",
    (s, dir) => TextAnalysis.datasetCard(Tables.documents(s, dir)),
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |${langModelCtes()},
      |q AS (SELECT doc_id, source, length(text) AS n_chars, md5(text) AS tmd5,
      |        $qualityBpSql AS quality_bp
      |      FROM (SELECT doc_id, source, text, $duckToks AS w FROM documents)),
      |j AS (SELECT q.*, b.n_bpe, m.predicted_lang
      |      FROM q JOIN bpe_doc b USING (doc_id) JOIN mlang m USING (doc_id)),
      |agg AS (SELECT source, count(*) AS n_docs,
      |        CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
      |        CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |        sum(quality_bp) AS sum_q,
      |        count(DISTINCT tmd5) AS n_distinct FROM j GROUP BY 1),
      |lc AS (SELECT source, predicted_lang, count(*) AS n FROM j GROUP BY 1, 2),
      |lt AS (SELECT source, predicted_lang AS top_lang, n,
      |       row_number() OVER (PARTITION BY source ORDER BY n DESC, predicted_lang) AS rn
      |       FROM lc)
      |SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs, a.n_tokens, a.n_chars,
      |  CAST(a.sum_q // a.n_docs AS BIGINT) AS mean_quality_bp,
      |  CAST((a.n_docs - a.n_distinct) * 10000 // a.n_docs AS BIGINT) AS dup_bp,
      |  t.top_lang, CAST(t.n * 10000 // a.n_docs AS BIGINT) AS top_lang_share_bp
      |FROM agg a JOIN lt t ON t.source = a.source AND t.rn = 1""".stripMargin), bench = true)

  /** Incremental/mergeable dataset card (TextAnalysis.datasetCardState /
    * mergeCardStates / cardFromState): the corpus arrives as THREE
    * disjoint batches, each reduced to a per-source state row (sums + HLL
    * sketch + language histogram), states merged pairwise, card derived
    * from the merged state — the corpus is never rescanned. Every scalar
    * field equals the single-pass dataset_card exactly (monoid merges);
    * the one estimate field (HLL distinct) is witnessed by the derived 3σ
    * bound vs exact distinct, the text_vocab_approx pattern — DuckDB has
    * no datasketches HLL, so the estimate itself is not cross-engine. */
  private val pipelineDatasetCardIncr = Q("pipeline_dataset_card_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val state = (0 until 3).map(i => TextAnalysis.datasetCardState(
          docs.where(pmod(col("doc_id"), lit(3)) === i)))
        .reduce(TextAnalysis.mergeCardStates(_, _))
      val card = TextAnalysis.cardFromState(state)
      val exact = docs.groupBy(col("source"))
        .agg(countDistinct(md5(col("text"))).as("n_exact"))
      card.join(exact, "source").select(
        col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("mean_quality_bp"), col("top_lang"), col("top_lang_share_bp"),
        (abs(col("n_distinct_est") - col("n_exact")) * 100 <=
          col("n_exact") * TextAnalysis.CardHllBoundPct)
          .cast("int").as("hll_within_bound"))
    },
    Some(s"""WITH RECURSIVE $duckBpeBlock,
      |$duckBpeDocCount,
      |${langModelCtes()},
      |q AS (SELECT doc_id, source, length(text) AS n_chars,
      |        $qualityBpSql AS quality_bp
      |      FROM (SELECT doc_id, source, text, $duckToks AS w FROM documents)),
      |j AS (SELECT q.*, b.n_bpe, m.predicted_lang
      |      FROM q JOIN bpe_doc b USING (doc_id) JOIN mlang m USING (doc_id)),
      |agg AS (SELECT source, count(*) AS n_docs,
      |        CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
      |        CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |        sum(quality_bp) AS sum_q FROM j GROUP BY 1),
      |lc AS (SELECT source, predicted_lang, count(*) AS n FROM j GROUP BY 1, 2),
      |lt AS (SELECT source, predicted_lang AS top_lang, n,
      |       row_number() OVER (PARTITION BY source ORDER BY n DESC, predicted_lang) AS rn
      |       FROM lc)
      |SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs, a.n_tokens, a.n_chars,
      |  CAST(a.sum_q // a.n_docs AS BIGINT) AS mean_quality_bp,
      |  t.top_lang, CAST(t.n * 10000 // a.n_docs AS BIGINT) AS top_lang_share_bp,
      |  CAST(1 AS INTEGER) AS hll_within_bound
      |FROM agg a JOIN lt t ON t.source = a.source AND t.rn = 1""".stripMargin))

  private val textShardStats = Q("text_shard_stats",
    (s, dir) => TextAnalysis.shardStats(Tables.documents(s, dir), nShards = 8),
    Some(s"""WITH sh AS (SELECT
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 8 AS shard,
      |  source, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM sh GROUP BY shard""".stripMargin))

  // ───────────── line-level page cleaning (LineOps — the pre-gate tier) ──

  /** Planted multi-line "crawled page" fixture over documents (same
    * planted-fixture pattern as [[plantedUrls]] — the documents table is
    * single-line word soup, so page structure is synthesized
    * deterministically, twin expressions both sides). The line mix covers
    * every rule: nav chrome (no terminal punct + corpus-frequent), a
    * per-doc content sentence, a javascript interstitial (1/3 of docs),
    * a second content line whose terminal punct flips on parity, a short
    * teaser (1/4), a script line with braces (1/5), a within-doc repeat
    * of the content sentence (1/6), and a footer that PASSES the c4 rules
    * but is corpus-frequent (so only the boilerplate pass can remove it).
    * Collision structure audited at both SFs per the round-10 lesson:
    * every per-rule branch is non-empty and no rule kills all lines. */
  private def plantedPages(s: SparkSession, dir: String): DataFrame = {
    val st = graft.plans.Stage(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text")))
    st.select(col("doc_id"), concat_ws("\n",
      lit("Home | About | Contact"),
      concat(concat_ws(" ", slice(col("w"), 1, 8)), lit(".")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("Please enable javascript to view this site.")),
      concat(concat_ws(" ", slice(col("w"), 9, 6)),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(".")).otherwise(lit(""))),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("Read more")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("if (window.track) { trackPage(); }")),
      when(pmod(col("doc_id"), lit(6)) === 0,
        concat(concat_ws(" ", slice(col("w"), 1, 8)), lit("."))),
      lit("(c) 2026 Example Corp. All rights reserved.")).as("text"))
  }

  /** SQL twin of [[plantedPages]] — relation (doc_id, text). concat_ws
    * skips NULL branches in both engines; list_slice is begin/END indexed
    * in DuckDB vs begin/LENGTH in Spark (9..14 ≡ slice(w, 9, 6)). */
  private def plantedPageSql: String =
    s"""SELECT doc_id, concat_ws(chr(10),
      |  'Home | About | Contact',
      |  array_to_string(list_slice(w, 1, 8), ' ') || '.',
      |  CASE WHEN doc_id % 3 = 0 THEN 'Please enable javascript to view this site.' END,
      |  array_to_string(list_slice(w, 9, 14), ' ') ||
      |    (CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END),
      |  CASE WHEN doc_id % 4 = 0 THEN 'Read more' END,
      |  CASE WHEN doc_id % 5 = 0 THEN 'if (window.track) { trackPage(); }' END,
      |  CASE WHEN doc_id % 6 = 0 THEN array_to_string(list_slice(w, 1, 8), ' ') || '.' END,
      |  '(c) 2026 Example Corp. All rights reserved.') AS text
      |FROM (SELECT doc_id, $duckToks AS w FROM documents)""".stripMargin

  /** SQL twin of LineOps.c4KeepLine over a lambda-bound line `x`. */
  private def c4KeepSql(x: String, minWords: Int = 5): String =
    s"""len(string_split_regex(trim($x), '\\s+')) >= $minWords
      |      AND right(trim($x), 1) IN ('.', '!', '?')
      |      AND instr(lower($x), 'javascript') = 0
      |      AND instr(lower($x), 'lorem ipsum') = 0
      |      AND instr(lower($x), 'cookie') = 0
      |      AND instr(lower($x), '{') = 0""".stripMargin

  /** Planted robots.txt rule table — one Seq is the single source for
    * both sides. The planted URL structure fixes each host's page
    * (doc%40 = N ⇒ doc%20 = N%20), so the rules are shaped to make every
    * verdict branch REAL at every SF: hosts N%4==0 get a broad /Docs
    * disallow plus a longer /Docs/Page1 allow (pages 12/16 win the
    * longest-match override, pages 0/4/8 stay blocked); hosts N%4==1 get
    * their own exact page disallowed; the rest have no rules (default
    * allow). */
  private val robotsRules: Seq[(String, String, Int)] =
    (0 until 40).flatMap { n =>
      val h = s"site$n.example.com"
      if (n % 4 == 0) Seq((h, "/Docs", 0), (h, "/Docs/Page1", 1))
      else if (n % 4 == 1) Seq((h, s"/Docs/Page${n % 20}", 0))
      else Nil
    }

  private def robotsRuleSql: String =
    robotsRules.map { case (h, p, a) => s"('$h', '$p', $a)" }.mkString(
      "r AS (SELECT * FROM (VALUES ", ", ", ") AS v(host, prefix, allow))")

  /** The robots verdict derivation over relation `src(doc_id, url)` —
    * ONE fragment for every oracle that needs it (RFC 9309 semantics
    * live in exactly two places: Dedup.robotsFilter and here). Emits
    * CTEs `c(doc_id[, canonical_url], host, path)` and `m(doc_id,
    * allow, rn)`; the verdict is `coalesce(m.allow, 1)` joined
    * `ON m.doc_id = … AND m.rn = 1`. Requires `r(host, prefix, allow)`
    * in scope; `withCanonical` adds the canonical-URL column for
    * compositions that also dedup. */
  private def robotsVerdictCtes(src: String,
      withCanonical: Boolean = false): String = {
    val canon =
      if (withCanonical)
        s"coalesce(${Dedup.canonicalUrlSql("url")}, " +
          "chr(0) || 'doc:' || CAST(doc_id AS VARCHAR)) " +
          "AS canonical_url,\n        "
      else ""
    s"""c AS (SELECT doc_id, $canon${Dedup.urlHostSql("url")} AS host,
      |        ${Dedup.urlPathSql("url")} AS path FROM $src),
      |m AS (SELECT c.doc_id, r.allow, row_number() OVER (PARTITION BY c.doc_id
      |        ORDER BY len(r.prefix) DESC, r.allow DESC) AS rn
      |      FROM c JOIN r ON r.host = c.host AND starts_with(c.path, r.prefix))""".stripMargin
  }

  /** robots.txt frontier filter (Dedup.robotsFilter): RFC 9309
    * longest-prefix-wins, allow on ties, default allow. The Spark side
    * decides via ONE struct-max aggregation (no self-join); the oracle
    * derives the same verdict through an independent rank-window
    * formulation. */
  private val pipelineRobotsFilter = Q("pipeline_robots_filter",
    (s, dir) => {
      import s.implicits._
      Dedup.robotsFilter(plantedUrls(s, dir),
        robotsRules.toDF("host", "prefix", "allow"))
    },
    Some(s"""WITH u AS ($plantedUrlSql),
      |$robotsRuleSql,
      |${robotsVerdictCtes("u")}
      |SELECT c.doc_id, c.host, c.path,
      |  CAST(coalesce(m.allow, 1) AS INTEGER) AS allowed
      |FROM c LEFT JOIN m ON m.doc_id = c.doc_id AND m.rn = 1""".stripMargin))

  /** Per-host crawl profile (urlDedup ∘ robotsFilter → host rollup):
    * the frontier report a crawl operator reads — pages fetched,
    * distinct canonical pages, recrawl-duplication rate and
    * robots-allowed share per host, all integer basis points. Output is
    * #hosts rows at any corpus size. */
  private val aHostProfile = Q("a_host_profile",
    (s, dir) => {
      import s.implicits._
      val urls = plantedUrls(s, dir)
      val dd = Dedup.urlDedup(urls).select(col("doc_id"), col("is_canonical"))
      val rf = Dedup.robotsFilter(urls,
        robotsRules.toDF("host", "prefix", "allow"))
      rf.join(dd, "doc_id")
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_canonical").cast("long")).as("n_pages"),
          sum(col("allowed").cast("long")).as("n_allowed"))
        .select(col("host"), col("n_docs"), col("n_pages"),
          expr("(n_docs - n_pages) * 10000 div n_docs").as("dup_bp"),
          expr("n_allowed * 10000 div n_docs").as("allowed_bp"))
    },
    Some(s"""WITH u AS ($plantedUrlSql),
      |$robotsRuleSql,
      |${robotsVerdictCtes("u", withCanonical = true)},
      |k AS (SELECT doc_id, host,
      |        CAST(doc_id = min(doc_id) OVER (PARTITION BY canonical_url)
      |          AS INTEGER) AS is_canonical FROM c),
      |v AS (SELECT k.doc_id, k.host, k.is_canonical,
      |        coalesce(m.allow, 1) AS allowed
      |      FROM k LEFT JOIN m ON m.doc_id = k.doc_id AND m.rn = 1)
      |SELECT host, count(*) AS n_docs,
      |  CAST(sum(is_canonical) AS BIGINT) AS n_pages,
      |  (count(*) - CAST(sum(is_canonical) AS BIGINT)) * 10000 // count(*) AS dup_bp,
      |  CAST(sum(allowed) AS BIGINT) * 10000 // count(*) AS allowed_bp
      |FROM v GROUP BY host""".stripMargin))

  /** C4 line rules (LineOps.cleanLines): drop short / unterminated /
    * marker lines, rebuild the page. Narrow — zero exchanges. */
  private val textCleanLines = Q("text_clean_lines",
    (s, dir) => LineOps.cleanLines(plantedPages(s, dir)),
    Some(s"""WITH p AS ($plantedPageSql),
      |s AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
      |k AS (SELECT doc_id, l, list_filter(l, x -> ${c4KeepSql("x")}) AS k FROM s)
      |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
      |  CAST(len(k) AS BIGINT) AS n_kept,
      |  array_to_string(k, chr(10)) AS cleaned_text FROM k""".stripMargin))

  /** Within-doc repeated-line removal (LineOps.dedupLinesWithinDoc):
    * first occurrence wins, order preserved. `array_position` /
    * `list_position` both return the FIRST index, so the keep-predicate
    * is portable verbatim. Narrow — zero exchanges. */
  private val textLineDedup = Q("text_line_dedup",
    (s, dir) => LineOps.dedupLinesWithinDoc(plantedPages(s, dir)),
    Some(s"""WITH p AS ($plantedPageSql),
      |s AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
      |k AS (SELECT doc_id, l, list_filter(generate_series(1, len(l)),
      |        i -> list_position(l, l[CAST(i AS INTEGER)]) = i) AS ki FROM s)
      |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
      |  CAST(len(ki) AS BIGINT) AS n_unique,
      |  array_to_string(list_transform(ki, i -> l[CAST(i AS INTEGER)]), chr(10))
      |    AS deduped_text FROM k""".stripMargin))

  /** Corpus-frequent boilerplate strip (LineOps.stripBoilerplate): lines
    * in ≥ 30% of documents are chrome, removed everywhere — catches the
    * footer that PASSES the c4 rules. The doc-frequency pass shuffles md5
    * line keys (not raw strings); the frequent set joins back broadcast. */
  private val textBoilerplate = Q("text_boilerplate",
    (s, dir) => LineOps.stripBoilerplate(plantedPages(s, dir), 3000),
    Some(s"""WITH p AS ($plantedPageSql),
      |s AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
      |ex AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line FROM s),
      |nd AS (SELECT count(*) AS n_docs FROM p),
      |f AS (SELECT md5(line) AS lh, count(DISTINCT doc_id) AS doc_freq FROM ex GROUP BY 1),
      |b AS (SELECT lh FROM f, nd WHERE doc_freq * 10000 >= n_docs * 3000),
      |j AS (SELECT e.doc_id, e.pos, e.line, (b.lh IS NOT NULL) AS is_b
      |      FROM ex e LEFT JOIN b ON b.lh = md5(e.line))
      |SELECT doc_id, count(*) AS n_lines,
      |  CAST(count(*) FILTER (WHERE NOT is_b) AS BIGINT) AS n_kept,
      |  coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT is_b), '')
      |    AS cleaned_text
      |FROM j GROUP BY doc_id""".stripMargin))

  /** Incremental boilerplate strip (LineOps.boilerplateIndex +
    * applyBoilerplate): the frequent-line index is built on YESTERDAY's
    * crawl (the bounded %3==0 ∧ doc_id<600 history slice — same shape as
    * dedup_url_incr: residue coprime to the planted structure, bounded so
    * it saturates at no SF) and applied to today's batch (%3≠0) as a
    * pure narrow filter — history is never rescanned per batch, and the
    * apply side is stateless so the SAME operator cleans a streaming
    * ingest (spec'd). Nav/footer live in 100% of history docs, so the
    * suppression path is real at every SF; the javascript interstitial is
    * history-frequent but absent from the batch (the index-miss path). */
  private val textBoilerplateIncr = Q("text_boilerplate_incr",
    (s, dir) => {
      val pages = plantedPages(s, dir)
      LineOps.applyBoilerplate(
        pages.where(pmod(col("doc_id"), lit(3)) =!= 0),
        LineOps.boilerplateIndex(
          pages.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 600),
          3000))
    },
    Some(s"""WITH p AS ($plantedPageSql),
      |h AS (SELECT * FROM p WHERE doc_id % 3 = 0 AND doc_id < 600),
      |hex AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM h),
      |hnd AS (SELECT count(*) AS n_docs FROM h),
      |b AS (SELECT lh FROM (
      |    SELECT md5(line) AS lh, count(DISTINCT doc_id) AS doc_freq
      |    FROM hex GROUP BY 1) f, hnd
      |  WHERE doc_freq * 10000 >= n_docs * 3000),
      |bl AS (SELECT coalesce(list(lh), CAST([] AS VARCHAR[])) AS boiler FROM b),
      |s AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p
      |      WHERE doc_id % 3 <> 0),
      |k AS (SELECT doc_id, l, list_filter(l,
      |        x -> NOT list_contains(boiler, md5(x))) AS k FROM s, bl)
      |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
      |  CAST(len(k) AS BIGINT) AS n_kept,
      |  array_to_string(k, chr(10)) AS cleaned_text FROM k""".stripMargin))

  /** The pageClean derivation over any relation `rel(doc_id, text)` —
    * CTE chain + final SELECT, shared by pipeline_page_clean and the
    * wet-clean composition. Thresholds are PARAMETERS mirroring
    * LineOps.pageClean's signature (minWords rides inside
    * [[c4KeepSql]]), so a caller with non-default knobs cannot silently
    * hash-diverge from a default-built oracle. */
  private def pageCleanSql(rel: String, minDocShareBp: Int = 3000,
      minWords: Int = 5, minKeptLines: Int = 2): String =
    s"""s AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM $rel),
      |ex AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line FROM s),
      |nd AS (SELECT count(*) AS n_docs FROM $rel),
      |f AS (SELECT md5(line) AS lh, count(DISTINCT doc_id) AS doc_freq FROM ex GROUP BY 1),
      |b AS (SELECT lh FROM f, nd WHERE doc_freq * 10000 >= n_docs * $minDocShareBp),
      |deb AS (SELECT doc_id, count(*) AS n_lines,
      |    coalesce(string_agg(line, chr(10) ORDER BY pos)
      |      FILTER (WHERE b.lh IS NULL), '') AS text
      |  FROM ex e LEFT JOIN b ON b.lh = md5(e.line) GROUP BY doc_id),
      |c4 AS (SELECT doc_id, n_lines,
      |    list_filter(string_split(text, chr(10)), x -> ${c4KeepSql("x", minWords)}) AS k
      |  FROM deb),
      |dd AS (SELECT doc_id, n_lines, k,
      |    list_filter(generate_series(1, len(k)),
      |      i -> list_position(k, k[CAST(i AS INTEGER)]) = i) AS ki FROM c4)
      |SELECT doc_id, n_lines, CAST(len(ki) AS BIGINT) AS n_kept,
      |  CAST(len(ki) >= $minKeptLines AS INTEGER) AS keep_doc,
      |  array_to_string(list_transform(ki, i -> k[CAST(i AS INTEGER)]), chr(10))
      |    AS cleaned_text
      |FROM dd""".stripMargin

  /** Mergeable boilerplate-index state (LineOps.boilerplateState /
    * mergeBoilerplateStates / indexFromState): the corpus arrives as
    * THREE disjoint batches, each reduced to its (line-key,
    * doc-frequency) state with an n_docs rider row; states merge
    * pairwise and the share threshold applies at READ time over the
    * merged state — so it must equal the single-pass full-corpus
    * frequency table the oracle derives. Output = the full merged
    * state (frequent AND infrequent lines; the NULL-key rider row
    * carries the total doc count). */
  private val textBoilerplateMerge = Q("text_boilerplate_merge",
    (s, dir) => {
      val pages = plantedPages(s, dir)
      (0 until 3).map(i => LineOps.boilerplateState(
          pages.where(pmod(col("doc_id"), lit(3)) === i)))
        .reduce(LineOps.mergeBoilerplateStates)
    },
    Some(s"""WITH p AS ($plantedPageSql),
      |ex AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM p),
      |f AS (SELECT md5(line) AS lh, count(DISTINCT doc_id) AS cnt
      |      FROM ex GROUP BY 1)
      |SELECT lh, CAST(cnt AS BIGINT) AS cnt FROM f
      |UNION ALL
      |SELECT CAST(NULL AS VARCHAR) AS lh, count(*) AS cnt FROM p""".stripMargin))

  /** The composed page-cleaning pass (LineOps.pageClean): boilerplate
    * strip → c4 rules → within-doc dedup → doc-level gate (≥ 2 surviving
    * content lines). Even docs keep 2 lines (second content line gets
    * terminal punct), odd docs keep 1 and gate out — both branches of
    * keep_doc are populated at every SF. */
  private val pipelinePageClean = Q("pipeline_page_clean",
    (s, dir) => LineOps.pageClean(plantedPages(s, dir)),
    Some(s"""WITH p AS ($plantedPageSql),
      |${pageCleanSql("p")}""".stripMargin), bench = true)

  /** The full crawl tier END-TO-END (LineOps.htmlExtract → pageClean):
    * raw HTML in, gated clean pages out — extraction emits line-
    * structured text, so the boilerplate/c4/dedup tier runs on REAL
    * upstream output here, not only on the planted line fixture. The
    * nav div, footer-less entity paragraph and title/h1 chrome land in
    * the boilerplate or c4 buckets; the parity paragraph keeps keep_doc
    * two-sided at every SF. The boilerplate index comes through the
    * MERGED-STATE path (three disjoint batches → boilerplateState →
    * mergeBoilerplateStates → indexFromState) — the incremental line-
    * tier posture exercised end-to-end; by the merge monoid
    * (text_boilerplate_merge, LineOpsSpec) it equals the single-pass
    * index, so the oracle is unchanged. */
  private val pipelineWetClean = Q("pipeline_wet_clean",
    (s, dir) => {
      // pageClean consumes its input lineage three times (index explode,
      // n_docs count, narrow apply); persisting the extracted frame runs
      // the 13-step regex chain ONCE instead of thrice — the same
      // shared-consumer reason bm25TopK persists its postings.
      val pages = LineOps.htmlExtract(plantedHtml(s, dir))
        .select(col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val state = LineOps.mergeBoilerplateStatesAll((0 until 3).map(i =>
        LineOps.boilerplateState(
          pages.where(pmod(col("doc_id"), lit(3)) === i))))
      LineOps.pageCleanWithIndex(pages,
        LineOps.indexFromState(state, minDocShareBp = 3000))
    },
    Some(s"""WITH ${htmlExtractCtes()},
      |hpage AS (SELECT doc_id, text FROM hx),
      |${pageCleanSql("hpage")}""".stripMargin))

  /** Planted raw-HTML fixture over documents — the WET-extraction input:
    * title, headline + content paragraphs from the doc's tokens, a script
    * block whose body contains a bare '<' (1/3 of docs — the non-greedy
    * block-strip trap), an HTML comment (1/4), an entity-rich paragraph
    * (always: &amp;, &lt;/&gt;, &quot;, &#39;, and the double-encoding
    * probe &amp;lt; which must decode to the LITERAL '&lt;', not '<'),
    * a style block (1/5), and nav chrome. The script body spans TWO
    * LINES (real crawl JS is multi-line) — the `[\s\S]` block strips
    * must swallow the newline, not leak JS into the extracted text. */
  private def plantedHtml(s: SparkSession, dir: String): DataFrame = {
    val st = graft.plans.Stage(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text")))
    st.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><meta charset=\"utf-8\"></head><body><h1>"),
      concat_ws(" ", slice(col("w"), 1, 3)), lit("</h1><p>"),
      concat_ws(" ", slice(col("w"), 1, 8)), lit(".</p><p>"),
      concat_ws(" ", slice(col("w"), 9, 6)),
      when(pmod(col("doc_id"), lit(2)) === 0, lit(".")).otherwise(lit("")),
      lit("</p>"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("<script type=\"text/javascript\">var x = 1 < 2;\n track();</script>"))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0,
        lit("<!-- hidden build marker -->")).otherwise(lit("")),
      lit("<p>Fish &amp; Chips &lt;deal&gt; says &quot;today&quot; "),
      lit("it&#39;s &amp;lt;escaped&amp;gt;</p>"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("<style>.nav { color: red; }</style>")).otherwise(lit("")),
      lit("<div class=\"nav\">Home</div></body></html>")).as("html"))
  }

  private def plantedHtmlSql: String =
    s"""SELECT doc_id, '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |  '</title><meta charset="utf-8"></head><body><h1>' ||
      |  array_to_string(list_slice(w, 1, 3), ' ') || '</h1><p>' ||
      |  array_to_string(list_slice(w, 1, 8), ' ') || '.</p><p>' ||
      |  array_to_string(list_slice(w, 9, 14), ' ') ||
      |  (CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END) || '</p>' ||
      |  (CASE WHEN doc_id % 3 = 0
      |    THEN '<script type="text/javascript">var x = 1 < 2;' || chr(10) || ' track();</script>'
      |    ELSE '' END) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN '<!-- hidden build marker -->' ELSE '' END) ||
      |  '<p>Fish &amp; Chips &lt;deal&gt; says &quot;today&quot; ' ||
      |  'it&#39;s &amp;lt;escaped&amp;gt;</p>' ||
      |  (CASE WHEN doc_id % 5 = 0 THEN '<style>.nav { color: red; }</style>' ELSE '' END) ||
      |  '<div class="nav">Home</div></body></html>' AS html
      |FROM (SELECT doc_id, $duckToks AS w FROM documents)""".stripMargin

  /** The extraction derivation as a CTE block ending in
    * `hx(doc_id, html, text)` with LINE-STRUCTURED text — shared by the
    * text_html_extract oracle and the wet-clean composition. The strip
    * chain itself is generated from the SAME step list the Spark side
    * folds (LineOps.htmlStripSql). */
  private def htmlExtractCtes(srcSql: String = plantedHtmlSql): String =
    s"""hp AS ($srcSql),
      |hx AS (SELECT doc_id, html,
      |  trim(${LineOps.htmlStripSql("html")}, ' ' || chr(10)) AS text FROM hp)""".stripMargin

  /** WET-style HTML extraction (LineOps.htmlExtract): block tags become
    * line breaks, inline tags spaces; entity decode; per-line whitespace
    * normalization; raw title pull. */
  private val textHtmlExtract = Q("text_html_extract",
    (s, dir) => LineOps.htmlExtract(plantedHtml(s, dir)),
    Some(s"""WITH ${htmlExtractCtes()}
      |SELECT doc_id, regexp_extract(html, '(?i)<title(>|[ \t\r\n][^>]*>)([^<]*)</title>', 2) AS title,
      |  text,
      |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |  CAST(len(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS INTEGER)
      |    AS n_tokens
      |FROM hx""".stripMargin))

  /** The CRAWL-FRONTIER capstone — one call from today's raw crawl to
    * gated clean pages, every stage an already-oracled operator:
    *
    *   1. robots gate (RFC 9309 verdict, narrow) on the new batch
    *      (%3≠0 — the dedup_url_incr split),
    *   2. incremental canonical-URL dedup against YESTERDAY's persisted
    *      key index (bounded %3==0 ∧ doc_id<600 history),
    *   3. WET HTML extraction of the admitted fresh fetches,
    *   4. boilerplate/c4/line-dedup page cleaning + the doc gate.
    *
    * Funnel audited non-degenerate at both SFs: every stage culls some
    * docs and none culls all (robots, recrawl suppression, within-batch
    * dup collapse, and the keep_doc parity split all fire). The oracle
    * chains the same shared fragments (robots rank-window, history
    * anti-join, extract chain, pageClean CTEs). */
  private val pipelineCrawlFrontier = Q("pipeline_crawl_frontier",
    (s, dir) => {
      import s.implicits._
      val urls = plantedUrls(s, dir)
      val batch = urls.where(pmod(col("doc_id"), lit(3)) =!= 0)
      val admitted = Dedup.robotsFilter(batch,
          robotsRules.toDF("host", "prefix", "allow"))
        .where(col("allowed") === 1).select(col("doc_id"))
      val hist = Dedup.urlIndex(urls.where(
        pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 600))
      val fresh = Dedup.urlDedupIncremental(batch.join(admitted, "doc_id"), hist)
        .where(col("is_canonical") === 1).select(col("doc_id"))
      // fetch set decided — extract + clean only those pages; the
      // extracted frame persists (pageClean reads it three times)
      LineOps.pageClean(
        LineOps.htmlExtract(plantedHtml(s, dir).join(fresh, "doc_id"))
          .select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    },
    Some(s"""WITH u AS ($plantedUrlSql),
      |$robotsRuleSql,
      |bu AS (SELECT doc_id, url FROM u WHERE doc_id % 3 <> 0),
      |${robotsVerdictCtes("bu", withCanonical = true)},
      |adm AS (SELECT c.doc_id, c.canonical_url FROM c
      |  LEFT JOIN m ON m.doc_id = c.doc_id AND m.rn = 1
      |  WHERE coalesce(m.allow, 1) = 1),
      |histc AS (SELECT DISTINCT ${Dedup.canonicalUrlSql("url")} AS k FROM u
      |          WHERE doc_id % 3 = 0 AND doc_id < 600),
      |fresh AS (SELECT doc_id FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id
      |    FROM adm WHERE canonical_url NOT IN (SELECT k FROM histc))
      |  WHERE doc_id = keep_id),
      |${htmlExtractCtes(
          s"SELECT p.* FROM ($plantedHtmlSql) p JOIN fresh USING (doc_id)")},
      |hpage AS (SELECT doc_id, text FROM hx),
      |${pageCleanSql("hpage")}""".stripMargin))

  // ───────────── sparse lexical retrieval (Retrieval — BM25 tier) ────────

  /** The planted query batch for the BM25 family — one Seq is the single
    * source for BOTH the Spark frame and the SQL VALUES twin. Terms are
    * drawn from the documents vocabulary (multi-term, single-term, and
    * mixed-frequency queries), so every query matches a non-degenerate
    * candidate set at every SF. */
  private val bmQueryTerms: Seq[(String, String)] = Seq(
    "q1" -> "table", "q1" -> "scan",
    "q2" -> "window", "q2" -> "agg",
    "q3" -> "join", "q3" -> "merge", "q3" -> "batch",
    "q4" -> "stream", "q4" -> "vector",
    "q5" -> "slow", "q5" -> "fast",
    "q6" -> "customer", "q6" -> "order")

  private def bmQuerySql: String =
    bmQueryTerms.map { case (q, t) => s"('$q', '$t')" }.mkString(
      "q AS (SELECT * FROM (VALUES ", ", ", ") AS v(query_id, term))")

  /** Integer-BM25 top-k retrieval (Retrieval.bm25TopK): inverted-index
    * postings + df index + basis-point BM25 with floor division — the
    * no-float discipline makes the scores hash-exact cross-engine. The
    * oracle re-derives the identical arithmetic (Retrieval.bm25Sql, the
    * single source for the SQL side). */
  private val textBm25Topk = Q("text_bm25_topk",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25TopK(Tables.documents(s, dir),
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |${Retrieval.bm25Sql(duckToks, 5)}""".stripMargin), bench = true)

  /** BM25 from the PERSISTED index (Retrieval.bm25TopKIndexed): the
    * postings + corpus-stats artifacts are staged to parquet once
    * (parquetArtifact) and the query scores from the LOADED index — the
    * lexical tier's production read path, where a query batch never
    * touches the documents table at all. Same queries, same k, same
    * oracle as text_bm25_topk: the read path must reproduce the
    * build-and-score form bit-exactly through the parquet round-trip. */
  private val textBm25Indexed = Q("text_bm25_indexed",
    (s, dir) => {
      import s.implicits._
      val post = parquetArtifact(s, dir, "bm25_postings", "documents")(
        Retrieval.postings(Tables.documents(s, dir)))
      val stats = parquetArtifact(s, dir, "bm25_stats", "documents")(
        Retrieval.corpusStats(Tables.documents(s, dir)))
      Retrieval.bm25TopKIndexed(post, stats,
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |${Retrieval.bm25Sql(duckToks, 5)}""".stripMargin))

  /** Planted linked-page fixture — a nav line that is ALL anchor text,
    * a content line with one small inline link, and a plain line. */
  private def plantedLinkHtml(s: SparkSession, dir: String): DataFrame = {
    val st = graft.plans.Stage(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text")))
    st.select(col("doc_id"), concat(
      lit("<html><body><div><a href=\"/\">Home</a> | " +
        "<a href=\"/about\">About Us</a></div><p>"),
      concat_ws(" ", slice(col("w"), 1, 8)),
      lit(" see <a href=\"/d\">details</a> now.</p><p>"),
      concat_ws(" ", slice(col("w"), 9, 6)),
      lit(" plain text line here"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit(".")).otherwise(lit("")),
      lit("</p></body></html>")).as("html"))
  }

  private def plantedLinkHtmlSql: String =
    s"""SELECT doc_id, '<html><body><div><a href="/">Home</a> | ' ||
      |  '<a href="/about">About Us</a></div><p>' ||
      |  array_to_string(list_slice(w, 1, 8), ' ') ||
      |  ' see <a href="/d">details</a> now.</p><p>' ||
      |  array_to_string(list_slice(w, 9, 14), ' ') ||
      |  ' plain text line here' ||
      |  (CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END) ||
      |  '</p></body></html>' AS html
      |FROM (SELECT doc_id, $duckToks AS w FROM documents)""".stripMargin

  /** Per-line link density (LineOps.linkDensity): the trafilatura-style
    * main-content heuristic — nav chrome is mostly anchor text, prose is
    * not. The nav line reads ~80% link chars (flagged), the content line
    * a few percent, the plain line zero. Sentinel control chars travel
    * both engines' literals/regexes verbatim. */
  private val textLinkDensity = Q("text_link_density",
    (s, dir) => LineOps.linkDensity(plantedLinkHtml(s, dir)),
    Some {
      val a1 = "\u0001"; val a2 = "\u0002"
      s"""WITH p AS ($plantedLinkHtmlSql),
      |x AS (SELECT doc_id,
      |  trim(${LineOps.linkedStripSql("html")}, ' ' || chr(10)) AS text FROM p),
      |e AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS raw
      |      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM x)),
      |c AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |  regexp_replace(raw, '[$a1$a2]', '', 'g') AS line,
      |  CAST(coalesce(list_sum(list_transform(
      |    regexp_extract_all(raw, '$a1([^$a1$a2]*)$a2', 1), s -> length(s))), 0)
      |    AS BIGINT) AS link_chars FROM e),
      |d AS (SELECT doc_id, pos, line,
      |  CAST(length(line) AS BIGINT) AS n_chars, link_chars,
      |  CAST(CASE WHEN length(line) = 0 THEN 0
      |    ELSE link_chars * 10000 // length(line) END AS BIGINT) AS link_bp
      |  FROM c)
      |SELECT doc_id, pos, line, n_chars, link_chars, link_bp,
      |  CAST(link_chars * 10000 <= n_chars * 5000 AS INTEGER) AS is_content FROM d""".stripMargin
    })

  /** Main-content extraction end-to-end (LineOps.contentExtract): the
    * trafilatura composition - link-density gate -> sentinel strip ->
    * c4 rules -> within-doc dedup -> doc gate, ALL narrow. The nav line
    * dies to density (it survives c4: 5 words and the About-Us anchor
    * text ends with no punct... it dies to punct too - the density gate
    * is what kills link-heavy lines that DO look like sentences), the
    * content line stays, the plain line's punct flips on parity so
    * keep_doc is two-sided at every SF. */
  private val pipelineContentExtract = Q("pipeline_content_extract",
    (s, dir) => LineOps.contentExtract(plantedLinkHtml(s, dir)),
    Some {
      val a1 = "\u0001"; val a2 = "\u0002"
      val clean = s"regexp_replace(x, '[$a1$a2]', '', 'g')"
      val linkChars = "CAST(coalesce(list_sum(list_transform(" +
        s"regexp_extract_all(x, '$a1([^$a1$a2]*)$a2', 1), s -> length(s))), 0) AS BIGINT)"
      s"""WITH p AS ($plantedLinkHtmlSql),
      |x AS (SELECT doc_id,
      |  trim(${LineOps.linkedStripSql("html")}, ' ' || chr(10)) AS text FROM p),
      |sx AS (SELECT doc_id, string_split(text, chr(10)) AS l0 FROM x),
      |cg AS (SELECT doc_id, l0, list_filter(l0, x ->
      |    length($clean) = 0 OR
      |    $linkChars * 10000 <= CAST(length($clean) AS BIGINT) * 5000) AS lc
      |  FROM sx),
      |cl AS (SELECT doc_id, l0,
      |    list_transform(lc, x -> $clean) AS l FROM cg),
      |c4 AS (SELECT doc_id, l0, l,
      |    list_filter(l, x -> ${c4KeepSql("x")}) AS k FROM cl),
      |dd AS (SELECT doc_id, l0, l, k,
      |    list_filter(generate_series(1, len(k)),
      |      i -> list_position(k, k[CAST(i AS INTEGER)]) = i) AS ki FROM c4)
      |SELECT doc_id, CAST(len(l0) AS BIGINT) AS n_lines,
      |  CAST(len(l) AS BIGINT) AS n_content,
      |  CAST(len(ki) AS BIGINT) AS n_kept,
      |  CAST(len(ki) >= 2 AS INTEGER) AS keep_doc,
      |  array_to_string(list_transform(ki, i -> k[CAST(i AS INTEGER)]), chr(10))
      |    AS main_text
      |FROM dd""".stripMargin
    })

  /** Exact-phrase search (Retrieval.phraseSearch): adjacency = bigram
    * key, so phrase lookup is one equi-join on the bigram index. The
    * planted set mixes frequent and rare adjacencies plus one absent
    * phrase (contributes no rows — the honest miss branch). */
  private val textPhraseSearch = Q("text_phrase_search",
    (s, dir) => {
      import s.implicits._
      Retrieval.phraseSearch(Tables.documents(s, dir),
        Seq(("p1", "table scan"), ("p2", "window agg"),
          ("p3", "merge batch"), ("p4", "spark nonexistentword"))
          .toDF("phrase_id", "phrase"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(${duckShingles(2)}) AS bigram FROM t),
      |g AS (SELECT bigram, doc_id, count(*) AS n_hits FROM sh GROUP BY 1, 2),
      |p AS (SELECT * FROM (VALUES ('p1', 'table scan'), ('p2', 'window agg'),
      |  ('p3', 'merge batch'), ('p4', 'spark nonexistentword'))
      |  AS v(phrase_id, bigram))
      |SELECT p.phrase_id, g.doc_id, CAST(g.n_hits AS BIGINT) AS n_hits
      |FROM g JOIN p USING (bigram)""".stripMargin))

  /** Planted positional-phrase set — one Seq drives the Spark frame and
    * the per-phrase oracle derivations. The trigram was verified present
    * at sf0.01 AND sf0.1 (hence sf1); the absent phrase proves the miss
    * branch. */
  private val posPhrases: Seq[(String, Seq[String])] = Seq(
    "p2" -> Seq("table", "scan"),
    "p3" -> Seq("spark", "vector", "big"),
    "px" -> Seq("spark", "duck", "pond"))

  /** Positional n-term phrase search (Retrieval.phraseSearchPositional):
    * arity-free positional-index join — offset-shifted positions
    * collect all n_terms offsets exactly at true occurrences. The
    * oracle derives each planted phrase INDEPENDENTLY as an explicit
    * k-way self-join on pos+k (per-phrase SQL generated from the same
    * Seq), so the two formulations must agree on every count. */
  private val textPhrasePositional = Q("text_phrase_positional",
    (s, dir) => {
      import s.implicits._
      Retrieval.phraseSearchPositional(Tables.documents(s, dir),
        posPhrases.toDF("phrase_id", "terms"))
    },
    Some {
      val perPhrase = posPhrases.map { case (pid, terms) =>
        val joins = (1 until terms.size).map(k =>
          s"JOIN occ a$k ON a$k.doc_id = a0.doc_id AND a$k.pos = a0.pos + $k").mkString("\n  ")
        val conds = terms.zipWithIndex
          .map { case (t, k) => s"a$k.term = '$t'" }.mkString(" AND ")
        s"""SELECT '$pid' AS phrase_id, a0.doc_id, count(*) AS n_hits
          |FROM occ a0
          |  $joins
          |WHERE $conds GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
      |        unnest(w) AS term FROM t)
      |$perPhrase""".stripMargin
    })

  /** Proximity retrieval (Retrieval.proximitySearch): term pairs
    * co-occurring within 3 positions in either order, one corpus pass
    * with a persisted candidate frame feeding the range self-join. The
    * oracle derives the same counts through a direct positional
    * self-join on the exploded tokens. */
  private val textProximity = Q("text_proximity",
    (s, dir) => {
      import s.implicits._
      Retrieval.proximitySearch(Tables.documents(s, dir),
        Seq(("x1", "table", "scan"), ("x2", "window", "agg"),
          ("x3", "spark", "nonexistentword")).toDF("pair_id", "term_a", "term_b"),
        window = 3)
    },
    Some(s"""WITH t AS (SELECT doc_id, $duckToks AS w FROM documents),
      |occ AS (SELECT doc_id, generate_subscripts(w, 1) AS pos,
      |        unnest(w) AS term FROM t),
      |p AS (SELECT * FROM (VALUES ('x1', 'table', 'scan'),
      |  ('x2', 'window', 'agg'), ('x3', 'spark', 'nonexistentword'))
      |  AS v(pair_id, term_a, term_b))
      |SELECT p.pair_id, a.doc_id, count(*) AS n_hits
      |FROM p
      |  JOIN occ a ON a.term = p.term_a
      |  JOIN occ b ON b.doc_id = a.doc_id AND b.term = p.term_b
      |    AND abs(a.pos - b.pos) <= 3
      |GROUP BY 1, 2""".stripMargin))

  /** Stopword-pruned BM25 (Retrieval.bm25TopK with maxDfShareBp): a
    * query mixing a corpus-saturating term ('table', df ≈ 77% at every
    * SF — the planted vocab is near-uniform) with a rare one ('dup',
    * ≈ 5%); the 50% df-share prune drops the saturating term's whole
    * posting list BEFORE the candidate join — the stopword-explosion
    * guard — and ranking proceeds on the informative term. */
  private val textBm25Pruned = Q("text_bm25_pruned",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25TopK(Tables.documents(s, dir),
        Seq(("q1", "table"), ("q1", "dup")).toDF("query_id", "term"),
        k = 5, maxDfShareBp = 5000)
    },
    Some(s"""WITH q AS (SELECT * FROM (VALUES ('q1', 'table'), ('q1', 'dup'))
      |  AS v(query_id, term)),
      |${Retrieval.bm25Sql(duckToks, 5, maxDfShareBp = 5000)}""".stripMargin))

  /** Snippet generation for the BM25 top-k (Retrieval.bm25Snippets):
    * the 7-token window around each hit doc's first query-term
    * occurrence — the "present" step of the retrieval tier. Misses
    * differ cross-engine (Spark array_position = 0, DuckDB
    * list_position = NULL); both sides filter them before the min. */
  private val textBm25Snippets = Q("text_bm25_snippets",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25Snippets(Tables.documents(s, dir),
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |${Retrieval.bm25ScoreCtesSql()},
      |topk AS (SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS rnk
      |  FROM ranked WHERE rnk <= 5),
      |qt AS (SELECT query_id, list(term) AS terms FROM q GROUP BY 1),
      |j AS (SELECT t.query_id, t.doc_id, t.rnk, k.w, qt.terms
      |  FROM topk t JOIN qt USING (query_id) JOIN toks k USING (doc_id)),
      |hp AS (SELECT query_id, doc_id, rnk,
      |  CAST(list_min(list_filter(list_transform(terms, x -> list_position(w, x)),
      |    p -> p IS NOT NULL AND p > 0)) AS BIGINT) AS hit_pos, w FROM j)
      |SELECT query_id, doc_id, rnk, hit_pos,
      |  array_to_string(list_slice(w,
      |    CAST(greatest(1, hit_pos - 3) AS INTEGER),
      |    CAST(greatest(1, hit_pos - 3) + 6 AS INTEGER)), ' ') AS snippet
      |FROM hp""".stripMargin))

  /** BM25F fielded retrieval (Retrieval.bm25FieldedTopK): title hits
    * count 3× — tf and dl are field-weighted BEFORE saturation
    * (Robertson & Zaragoza's simple BM25F), df counts docs with the term
    * in EITHER field. The fielded fixture derives the title from the
    * doc's own leading tokens so query terms genuinely hit titles. The
    * oracle reuses the shared scoring tail over weighted postings. */
  /** The fielded fixture shared by the BM25F queries: title = the doc's
    * own 3 leading tokens (so query terms genuinely hit titles), body =
    * the full text. */
  private def bmFieldedFixture(s: SparkSession, dir: String): DataFrame =
    graft.plans.Stage(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "w", TextFns.tokens(col("text")))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, 3)).as("title"),
        col("text").as("body"))

  private val textBm25Fielded = Q("text_bm25_fielded",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25FieldedTopK(bmFieldedFixture(s, dir),
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |fields AS (SELECT doc_id,
      |    array_to_string(list_slice(w, 1, 3), ' ') AS title, text AS body
      |  FROM (SELECT doc_id, text, $duckToks AS w FROM documents)),
      |ft AS (SELECT doc_id,
      |  CASE WHEN trim(lower(title)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(title)), '\\s+') END AS wt,
      |  CASE WHEN trim(lower(body)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(body)), '\\s+') END AS wb
      |  FROM fields),
      |occ AS (SELECT doc_id, unnest(wt) AS term, 3 AS w FROM ft
      |  UNION ALL SELECT doc_id, unnest(wb) AS term, 1 AS w FROM ft),
      |dls AS (SELECT doc_id, CAST(3 * len(wt) + len(wb) AS BIGINT) AS dl FROM ft),
      |post AS (SELECT term, o.doc_id, d.dl, CAST(sum(o.w) AS BIGINT) AS tf
      |  FROM occ o JOIN dls d USING (doc_id) GROUP BY 1, 2, 3),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(3 * len(wt) + len(wb)) AS BIGINT) AS total_tokens FROM ft),
      |${Retrieval.bm25ScoreTailSql(5)}""".stripMargin))

  /** BM25F from the PERSISTED fielded index (Retrieval.bm25TopKIndexed
    * over staged fieldedPostings + fieldedCorpusStats artifacts): the
    * scoring core is shape-agnostic — field-weighted (term, doc_id, dl,
    * tf) rows score through the SAME indexed read path as the plain
    * tier, so the fielded tier also never touches the documents at
    * query time. Same queries, k and oracle as text_bm25_fielded. */
  private val textBm25FieldedIndexed = Q("text_bm25_fielded_indexed",
    (s, dir) => {
      import s.implicits._
      val post = parquetArtifact(s, dir, "bm25f_postings", "documents")(
        Retrieval.fieldedPostings(bmFieldedFixture(s, dir)))
      val stats = parquetArtifact(s, dir, "bm25f_stats", "documents")(
        Retrieval.fieldedCorpusStats(bmFieldedFixture(s, dir)))
      Retrieval.bm25TopKIndexed(post, stats,
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    textBm25Fielded.oracle)

  /** BM25F over REAL extracted fields (the wet→retrieval composition):
    * the h1 headline (discriminative — the fixture's h1 carries the
    * doc's leading content tokens, unlike <title> which is site chrome)
    * weights 3× against the extracted page body. Same scoring core and
    * oracle tail as the standalone fielded query; the fields come from
    * LineOps.htmlField + htmlExtract instead of a synthetic frame. */
  private val textBm25FieldedWet = Q("text_bm25_fielded_wet",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25FieldedTopK(
        LineOps.htmlExtractFields(plantedHtml(s, dir)),
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |${htmlExtractCtes()},
      |fields AS (SELECT doc_id,
      |    regexp_extract(html, '(?i)<h1(>|[ \t\r\n][^>]*>)([^<]*)</h1>', 2) AS title,
      |    text AS body FROM hx),
      |ft AS (SELECT doc_id,
      |  CASE WHEN trim(lower(title)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(title)), '\\s+') END AS wt,
      |  CASE WHEN trim(lower(body)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(body)), '\\s+') END AS wb
      |  FROM fields),
      |occ AS (SELECT doc_id, unnest(wt) AS term, 3 AS w FROM ft
      |  UNION ALL SELECT doc_id, unnest(wb) AS term, 1 AS w FROM ft),
      |dls AS (SELECT doc_id, CAST(3 * len(wt) + len(wb) AS BIGINT) AS dl FROM ft),
      |post AS (SELECT term, o.doc_id, d.dl, CAST(sum(o.w) AS BIGINT) AS tf
      |  FROM occ o JOIN dls d USING (doc_id) GROUP BY 1, 2, 3),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(3 * len(wt) + len(wb)) AS BIGINT) AS total_tokens FROM ft),
      |${Retrieval.bm25ScoreTailSql(5)}""".stripMargin))

  /** Mergeable term index (Retrieval.termIndex / mergeTermIndex): the
    * corpus arrives as three disjoint doc batches, each reduced to its
    * (term, df, tf_sum) index, merged pairwise — df and tf_sum are
    * additive over disjoint batches, so the merged index equals the
    * single-pass full-corpus index the oracle derives. The incremental
    * posture for the retrieval tier: new crawl batches fold into the
    * persisted index without rescanning history. */
  private val textBm25Incr = Q("text_bm25_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      (0 until 3).map(i =>
          Retrieval.termIndex(docs.where(pmod(col("doc_id"), lit(3)) === i)))
        .reduce(Retrieval.mergeTermIndex)
    },
    Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |post AS (SELECT term, doc_id, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY 1, 2)
      |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_sum
      |FROM post GROUP BY term""".stripMargin))

  /** Incremental POSITIONAL index (Retrieval.positionalIndex /
    * mergePositionalIndex): the corpus arrives as three disjoint doc
    * batches, each reduced to its (term, doc_id, positions) index,
    * merged pairwise, and the merged index answers the SAME planted
    * positional-phrase queries — so it must equal the single-pass index
    * (the oracle derives every count from the full corpus directly).
    * The incremental posture for the EXPENSIVE retrieval tier: new
    * crawl batches fold into the persisted positional index without
    * rescanning history, and phrase/proximity queries read the index
    * instead of re-exploding documents per query batch. */
  private val textPositionalIncr = Q("text_positional_incr",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // Each batch index is BUILT ONCE and staged to parquet
      // (parquetArtifact), then merged from the stored artifacts — the
      // StreamingRetrievalSpec posture (r12; the r11 demo re-aggregated
      // the full corpus per invocation). A warm run (artifacts present —
      // e.g. Bench after Verify) reads three small parquet dirs and pays
      // only the merge + query.
      val merged = (0 until 3).map(i =>
          parquetArtifact(s, dir, s"posidx_batch$i", "documents")(
            Retrieval.positionalIndex(
              docs.where(pmod(col("doc_id"), lit(3)) === i))))
        .reduce(Retrieval.mergePositionalIndex)
      Retrieval.phraseSearchPositionalIndexed(merged,
        posPhrases.toDF("phrase_id", "terms"))
    },
    textPhrasePositional.oracle)

  /** Delta-encoded positional index, queried DIRECTLY (Retrieval.
    * positionalIndexDelta + phraseSearchPositionalDelta — the postings-
    * compression step of the persisted artifact, r12: term-filter lands
    * on the ENCODED rows and only matching postings are prefix-sum
    * decoded, where the r11 round-trip decoded the whole index before
    * filtering): the planted positional phrases are answered through the
    * compressed artifact, so the query is green only if it is losslessly
    * queryable; the oracle is the same per-phrase derivation from the raw
    * corpus. The delta CONTENT (first + gaps, not just any self-inverse
    * pair) and direct ≡ plain-index equivalence are pinned separately in
    * RetrievalSpec. */
  private val textPositionalDelta = Q("text_positional_delta",
    (s, dir) => {
      import s.implicits._
      Retrieval.phraseSearchPositionalDelta(
        Retrieval.positionalIndexDelta(
          Retrieval.positionalIndex(Tables.documents(s, dir))),
        posPhrases.toDF("phrase_id", "terms"))
    },
    textPhrasePositional.oracle)

  /** Incremental FIELDED term index (Retrieval.fieldedTermIndex +
    * mergeTermIndex — same (term, df, tf_sum) monoid as the plain
    * index): three disjoint batches of the fielded fixture, merged,
    * must equal the single-pass full-corpus fielded index the oracle
    * derives (df = docs with the term in EITHER field, tf_sum = sum of
    * field-weighted tf). Completes the mergeable-index posture for the
    * BM25F tier. */
  private val textBm25FieldedIncr = Q("text_bm25_fielded_incr",
    (s, dir) => {
      val fields = bmFieldedFixture(s, dir)
      (0 until 3).map(i =>
          Retrieval.fieldedTermIndex(
            fields.where(pmod(col("doc_id"), lit(3)) === i)))
        .reduce(Retrieval.mergeTermIndex)
    },
    Some(s"""WITH fields AS (SELECT doc_id,
      |    array_to_string(list_slice(w, 1, 3), ' ') AS title, text AS body
      |  FROM (SELECT doc_id, text, $duckToks AS w FROM documents)),
      |ft AS (SELECT doc_id,
      |  CASE WHEN trim(lower(title)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(title)), '\\s+') END AS wt,
      |  CASE WHEN trim(lower(body)) = '' THEN CAST([] AS VARCHAR[])
      |    ELSE string_split_regex(trim(lower(body)), '\\s+') END AS wb
      |  FROM fields),
      |occ AS (SELECT doc_id, unnest(wt) AS term, 3 AS w FROM ft
      |  UNION ALL SELECT doc_id, unnest(wb) AS term, 1 AS w FROM ft),
      |post AS (SELECT term, doc_id, CAST(sum(w) AS BIGINT) AS tf
      |  FROM occ GROUP BY 1, 2)
      |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_sum
      |FROM post GROUP BY term""".stripMargin))

  /** Pseudo-relevance-feedback retrieval (Retrieval.bm25PrfTopK — the
    * integer RM3 reduction): pass 1 is plain BM25, the 3 highest-tf
    * terms across each query's top-5 docs (originals excluded, term-
    * string tie-break) expand the query at weight 5 vs the originals'
    * 10, pass 2 re-ranks with the weighted core over the SAME persisted
    * postings. The oracle replays both passes and the expansion
    * selection from the shared scoring fragments. */
  private val textBm25Prf = Q("text_bm25_prf",
    (s, dir) => {
      import s.implicits._
      Retrieval.bm25PrfTopK(Tables.documents(s, dir),
        bmQueryTerms.toDF("query_id", "term"), k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |${Retrieval.bm25ScoreCtesSql()},
      |topf AS (SELECT query_id, doc_id FROM ranked WHERE rnk <= 5),
      |fbtf AS (SELECT r.query_id, p.term, CAST(sum(p.tf) AS BIGINT) AS tfs
      |  FROM post p JOIN topf r USING (doc_id) GROUP BY 1, 2),
      |expt AS (SELECT query_id, term FROM (
      |    SELECT f.query_id, f.term,
      |      row_number() OVER (PARTITION BY f.query_id
      |        ORDER BY f.tfs DESC, f.term) AS tr
      |    FROM fbtf f LEFT JOIN q
      |      ON q.query_id = f.query_id AND q.term = f.term
      |    WHERE q.term IS NULL)
      |  WHERE tr <= 3),
      |q2 AS (SELECT query_id, term, 10 AS wgt FROM q
      |  UNION ALL SELECT query_id, term, 5 FROM expt),
      |${Retrieval.bm25ScoreWeightedCtesSql()}
      |SELECT query_id, doc_id, score, CAST(rnk2 AS INTEGER) AS rnk
      |FROM ranked2 WHERE rnk2 <= 5""".stripMargin))

  /** Retrieval evaluation (Retrieval.evalRanking): BM25 top-10 scored
    * against boolean-AND qrels (a doc is relevant to a query iff it
    * carries ALL the query's terms within its LEADING 8 tokens — the
    * "answer in the opening" proxy, derivable in both engines from the
    * tokens, no judgment file needed; strict enough that the ranker
    * genuinely misses some and first ranks vary). Per query: hits in the
    * top 10, first relevant rank, integer MRR in basis points. */
  private val textRetrievalEval = Q("text_retrieval_eval",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val q = bmQueryTerms.toDF("query_id", "term")
      Retrieval.evalRanking(
        Retrieval.bm25TopK(docs, q, k = 10), leading8Qrels(docs, q), k = 10)
    },
    Some(s"""WITH $bmQuerySql,
      |toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |${Retrieval.bm25ScoreCtesSql()},
      |topk AS (SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS rnk
      |  FROM ranked WHERE rnk <= 10),
      |qn AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM q GROUP BY 1),
      |lead AS (SELECT doc_id, unnest(list_distinct(list_slice(w, 1, 8))) AS term
      |  FROM toks),
      |qrels AS (SELECT l.term, l.doc_id, q.query_id FROM lead l JOIN q USING (term)),
      |rels AS (SELECT query_id, doc_id FROM (
      |    SELECT r.query_id, r.doc_id, count(DISTINCT r.term) AS n_match
      |    FROM qrels r GROUP BY 1, 2) m
      |  JOIN qn USING (query_id) WHERE m.n_match = qn.n_terms),
      |$evalTailSql""".stripMargin))

  /** SQL twin of Retrieval.evalRanking's tail — expects CTEs
    * `topk(query_id, doc_id, rnk)` and `rels(query_id, doc_id)` in
    * scope; shared by the BM25 and RAG evaluation oracles. */
  private def evalTailSql: String =
    """j AS (SELECT t.query_id, t.rnk,
      |    CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      |  FROM topk t LEFT JOIN rels r
      |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id),
      |a AS (SELECT query_id, count(*) AS n_ranked,
      |    CAST(sum(rel) AS BIGINT) AS n_hits,
      |    min(CASE WHEN rel = 1 THEN rnk END) AS fr
      |  FROM j GROUP BY 1)
      |SELECT query_id, n_ranked, n_hits,
      |  CAST(coalesce(fr, 0) AS INTEGER) AS first_rel_rnk,
      |  CAST(CASE WHEN fr IS NULL THEN 0 ELSE 10000 // fr END AS BIGINT) AS mrr_bp
      |FROM a""".stripMargin

  /** The numeric-id query "documents" behind the hybrid query's dense
    * tier: one row per query, text = its terms (the id is the q-suffix,
    * so 'q' || id maps back to the sparse tier's string ids). */
  private val bmQueryDocs: Seq[(Long, String)] =
    bmQueryTerms.groupBy(_._1).toSeq
      .map { case (q, ts) => (q.drop(1).toLong, ts.map(_._2).mkString(" ")) }
      .sortBy(_._1)

  /** The hybrid (sparse BM25 ⊕ dense ANN) fusion over any corpus frame
    * `(doc_id, text)` — ONE body for the documents query and the RAG
    * chunk capstone: BM25 top-10, feature-hash query embeddings against
    * the corpus embeddings, integer RRF fusion to the top-5.
    *
    * `denseLsh` picks the dense leg: false = brute crossTopK (exact —
    * the recall baseline, one full corpus vector scan per query batch);
    * true = MULTI-PROBE crossTopKLsh on the shared dim-16 hyperplanes
    * (the 100-TB posture — both sides bucket once and the search is one
    * equi-join however large the corpus; each query scores its own plus
    * every Hamming-1 bucket, ≈(nPlanes+1)/2^nPlanes of the corpus — the
    * Lv et al. 2007 recall knob, measured vs single-bucket and brute in
    * ProfileRetrievalR12 / NOTES). `nPlanes` is that dial surfaced as a
    * parameter (VERDICT r12 #6): 6 planes ≈ 11% scan / 0.37–0.48
    * recall@10, 4 planes ≈ 31% scan / 0.62 recall — a recall-hungry
    * deployment picks an operating point, not a code edit. `ivfCents`
    * (VERDICT r12 #7) swaps the dense leg onto the TRAINED persisted-
    * centroid path instead ([[Similarity.crossTopKIvf]], nProbes = 2 of
    * 10 cells): the third point on the exactness ladder — brute (exact)
    * ⊃ IVF (nProbes=|cells| ≡ exact) ⊃ LSH — completing the indexed-
    * tier matrix. All legs are deterministic, so every fusion is
    * hash-exact. */
  private def hybridTopKFrom(s: SparkSession, docs: DataFrame,
      denseLsh: Boolean = false, nPlanes: Int = 6,
      ivfCents: Option[Seq[Array[Double]]] = None): DataFrame = {
    val (sparse, dense) =
      hybridTiers(s, docs, denseLsh = denseLsh, nPlanes = nPlanes,
        ivfCents = ivfCents)
    Retrieval.rrfFuse(Seq(sparse, dense), k = 5)
  }

  /** The two ranked tiers behind every hybrid fusion — shared by the
    * RRF capstones and the TRAINED-weight fusion, so tier construction
    * can never drift between the fixed and learned combiners. */
  private def hybridTiers(s: SparkSession, docs: DataFrame,
      denseLsh: Boolean = false, nPlanes: Int = 6,
      ivfCents: Option[Seq[Array[Double]]] = None): (DataFrame, DataFrame) = {
    import s.implicits._
    val sparse = Retrieval.bm25TopK(docs,
        bmQueryTerms.toDF("query_id", "term"), k = 10)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val qvecs = TextAnalysis.embedDocuments(
        bmQueryDocs.toDF("doc_id", "text"), dim = 16)
      .select(col("doc_id").as("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
      .where(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x) > 0)
    val ranked = ivfCents match {
      case Some(cs) => Similarity.crossTopKIvf(docVecsFrom(docs),
        qvecs, k = 10, cs, nProbes = 2)
      case None if denseLsh => Similarity.crossTopKLshMultiProbe(
        docVecsFrom(docs), qvecs, k = 10, nPlanes = nPlanes, dim = 16)
      case None => Similarity.crossTopK(docVecsFrom(docs), qvecs, k = 10)
    }
    val dense = ranked
      .select(concat(lit("q"), col("query_id").cast("string")).as("query_id"),
        col("neighbor_id").as("doc_id"), col("rank").as("rnk"))
    (sparse, dense)
  }

  /** SQL twin of [[hybridTopKFrom]] over source relation `src(doc_id,
    * text)`: the two rank derivations + the integer RRF fusion, ending in
    * `rr(query_id, doc_id, rrf_score, n_tiers, rnk2)`. Requires `q` (the
    * query-term relation) already in scope; callers append their final
    * SELECT. `lsh` = true mirrors the MULTI-PROBE bucketed dense leg:
    * both sides derive the same dim-16 sign-LSH bucket from the
    * interpolated plane literals, the query side unnests its own plus
    * every Hamming-1 probe bucket (xor with each plane bit), and the
    * cross join becomes `JOIN … USING (bucket)`. `ivfCents` mirrors the
    * trained-centroid dense leg instead: centroid VALUES literals,
    * round-6 argmax assignment + probe ranking (the sim_cross_ivf_topk
    * oracle shapes), and the dense join becomes `USING (cell)`. */
  private def hybridCtesFor(src: String, lsh: Boolean = false,
      nPlanes: Int = 6,
      ivfCents: Option[Seq[Array[Double]]] = None): String = {
    def bucketExpr(v: String) = {
      val planes = Similarity.lshPlanes(nPlanes, 16)
      planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product($v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(", ", " + ", " AS bucket")
    }
    val bucket = if (lsh) bucketExpr("v") else ""
    val qbucket = if (lsh) bucketExpr("qv") else ""
    val probes = (Seq("bucket") ++ (0 until nPlanes).map(p =>
      s"xor(bucket, ${1 << p})")).mkString("[", ", ", "]")
    val ivfCtes = ivfCents.fold("") { cs =>
      val values = cs.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |asg AS (SELECT vec_id, v, nrm, cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |qp AS (SELECT query_id, qv, qnrm, cell FROM (
        |    SELECT qn.query_id, qn.qv, qn.qnrm, cn.cell,
        |      row_number() OVER (PARTITION BY qn.query_id
        |        ORDER BY ROUND(list_dot_product(qn.qv, cn.cv) / (qn.qnrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM qn CROSS JOIN cn)
        |  WHERE pr <= 2),
        |""".stripMargin
    }
    val denseJoin =
      if (ivfCents.isDefined) "FROM qp qn JOIN asg n USING (cell)"
      else if (lsh) s"""FROM (SELECT query_id, qv, qnrm,
        |      unnest($probes) AS bucket FROM qn) qn JOIN n USING (bucket)""".stripMargin
      else "FROM qn CROSS JOIN n"
    s"""${docVecCtesFor(src)},
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |${Retrieval.bm25ScoreCtesSql()},
      |sp AS (SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS rnk
      |  FROM ranked WHERE rnk <= 10),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm$bucket FROM vec
      |  WHERE list_dot_product(v, v) > 0),
      |qhx AS (SELECT query_id, md5(term) AS m FROM q),
      |qsig AS (SELECT query_id, (${TextFns.md5Base28Sql("m")}) % 16 AS b,
      |  (((${TextFns.md5Base28Sql("m")}) // 16) % 2) * 2 - 1 AS s FROM qhx),
      |qagg AS (SELECT query_id, b, sum(s) AS w FROM qsig GROUP BY 1, 2),
      |qgrid AS (SELECT query_id, r.range AS dim_idx
      |  FROM (SELECT DISTINCT query_id FROM q) CROSS JOIN range(0, 16) r),
      |qvec AS (SELECT g.query_id,
      |    list(CAST(coalesce(a.w, 0) AS DOUBLE) ORDER BY g.dim_idx) AS qv
      |  FROM qgrid g LEFT JOIN qagg a
      |    ON a.query_id = g.query_id AND a.b = g.dim_idx
      |  GROUP BY g.query_id),
      |qn AS (SELECT query_id, qv, sqrt(list_dot_product(qv, qv)) AS qnrm$qbucket
      |  FROM qvec WHERE list_dot_product(qv, qv) > 0),
      |${ivfCtes}dsc AS (SELECT qn.query_id, n.vec_id AS doc_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  $denseJoin),
      |dn AS (SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, doc_id) AS INTEGER) AS rnk FROM dsc),
      |dtier AS (SELECT query_id, doc_id, rnk FROM dn WHERE rnk <= 10),
      |u AS (SELECT query_id, doc_id, 10000 // (60 + rnk) AS c FROM sp
      |  UNION ALL SELECT query_id, doc_id, 10000 // (60 + rnk) FROM dtier),
      |f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_score,
      |    count(*) AS n_tiers FROM u GROUP BY 1, 2),
      |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf_score DESC, doc_id) AS rnk2 FROM f)""".stripMargin
  }

  /** HYBRID retrieval (Retrieval.rrfFuse): integer reciprocal-rank
    * fusion of the sparse BM25 top-10 and a dense top-10 (feature-hash
    * query embeddings against the document-embedding corpus through
    * Similarity.crossTopK — the standard RAG two-tower composition, both
    * tiers already oracled standalone). RRF contribution 10⁴//(60+rnk),
    * floor division ⇒ hash-exact; the oracle composes the two rank
    * derivations and the same fusion arithmetic. */
  private val textHybridTopk = Q("text_hybrid_topk",
    (s, dir) => hybridTopKFrom(s, Tables.documents(s, dir)),
    Some(s"""WITH $bmQuerySql,
      |${hybridCtesFor("documents")}
      |SELECT query_id, doc_id, rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
      |  CAST(rnk2 AS INTEGER) AS rnk
      |FROM rr WHERE rnk2 <= 5""".stripMargin), bench = true)

  /** text_hybrid_topk's INDEXED-dense twin (Similarity.crossTopKLsh,
    * dim-16 sign-LSH on the shared plane literals): the fusion capstone
    * with the dense leg on the bucketed scale path — one equi-join on
    * the bucket key instead of a full corpus vector scan per query batch
    * (the r11 verdict's last brute scan in a capstone). Deterministic ⇒
    * hash-exact; the oracle derives the SAME buckets from interpolated
    * plane literals and joins USING (bucket). Recall vs the brute twin
    * is measured in ProfileHybridLsh / NOTES (the LSH tier trades
    * recall for the equi-join plan — the knob is nPlanes). */
  private val textHybridLsh = Q("text_hybrid_lsh",
    (s, dir) => hybridTopKFrom(s, Tables.documents(s, dir), denseLsh = true),
    Some(s"""WITH $bmQuerySql,
      |${hybridCtesFor("documents", lsh = true)}
      |SELECT query_id, doc_id, rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
      |  CAST(rnk2 AS INTEGER) AS rnk
      |FROM rr WHERE rnk2 <= 5""".stripMargin), bench = true)

  /** text_hybrid_lsh at the MEASURED high-recall operating point —
    * nPlanes = 4 multi-probe (≈5/16 of the bucket space per query,
    * recall@10 0.617 vs brute at sf0.1 — the builder's dial table in
    * NOTES): the recall/cost dial exposed as an oracled query choice
    * instead of a code edit (VERDICT r12 #6). Same fusion, same
    * contract; only the dense leg's plane count differs. */
  private val textHybridLsh4 = Q("text_hybrid_lsh4",
    (s, dir) => hybridTopKFrom(s, Tables.documents(s, dir),
      denseLsh = true, nPlanes = 4),
    Some(s"""WITH $bmQuerySql,
      |${hybridCtesFor("documents", lsh = true, nPlanes = 4)}
      |SELECT query_id, doc_id, rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
      |  CAST(rnk2 AS INTEGER) AS rnk
      |FROM rr WHERE rnk2 <= 5""".stripMargin))

  /** MMR-diversified retrieval (Retrieval.mmrDiversify over the BM25
    * top-20): the RAG context-diversification step — each of the 5 picks
    * balances rank-relevance against max cosine to what is already
    * picked (λ = 0.5 in basis points), so near-identical candidates
    * can't fill the whole context window. Greedy is inherently
    * sequential in k, so both engines unroll the 5 steps; every
    * quantity is integer bp ⇒ hash-exact. */
  private val textMmrTopk = Q("text_mmr_topk",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      Retrieval.mmrDiversify(
        Retrieval.bm25TopK(docs, bmQueryTerms.toDF("query_id", "term"), k = 20)
          .select(col("query_id"), col("doc_id"), col("rnk")),
        docVecsFrom(docs).select(col("vec_id").as("doc_id"), col("embedding")),
        k = 5)
    },
    Some(s"""WITH $bmQuerySql,
      |${docVecCtesFor("documents")},
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |${Retrieval.bm25ScoreCtesSql()},
      |cnd0 AS (SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= 20),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vec
      |  WHERE list_dot_product(v, v) > 0),
      |cand AS MATERIALIZED (SELECT c.query_id, c.doc_id,
      |    CAST((21 - c.rnk) * 500 AS BIGINT) AS rel_bp, n.v, n.nrm
      |  FROM cnd0 c JOIN n ON n.vec_id = c.doc_id),
      |${Retrieval.mmrSql(5)}
      |SELECT query_id, rank, doc_id FROM mmr_out""".stripMargin))

  /** text_mmr_topk served on the DRIVER-LOCAL greedy
    * (Retrieval.mmrDiversifyLocal — the sub-second micro-batch path,
    * r14): same candidates, same stored vectors, SAME ORACLE — the
    * local greedy is bit-identical to the distributed one by
    * construction (integer rel_bp, BigDecimal HALF_UP round-4 cosine,
    * same tie-breaks), so the hash-compare against text_mmr_topk's
    * unrolled MMR SQL is the cross-engine proof of that identity, not
    * just a spec claim. */
  private val textMmrLocal = Q("text_mmr_local",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      Retrieval.mmrDiversifyLocal(
        Retrieval.bm25TopK(docs, bmQueryTerms.toDF("query_id", "term"), k = 20)
          .select(col("query_id"), col("doc_id"), col("rnk")),
        docVecsFrom(docs).select(col("vec_id").as("doc_id"), col("embedding")),
        k = 5)
    },
    textMmrTopk.oracle)

  /** Persisted doc-embedding centroid index for the hybrid IVF twin —
    * the documents-table sibling of embCentroids: trained once on the
    * dim-16 doc vectors (10 cells), stored as a centroidsToDF parquet
    * artifact fingerprinted on documents.parquet, loaded by every other
    * consumer (query fn, derived oracle, later JVMs — Bench reads what
    * Verify built). */
  private val docCentroidArtifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Array[Double]]]()
  private def docCentroidsPersisted(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir,
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "centroids_doc_all_c10", "documents")(
          Similarity.centroidsToDF(s,
            Similarity.kmeansCentroidArrays(docVecs(s, dir), nCells = 10)))))

  /** text_hybrid_topk's TRAINED-index twin (VERDICT r12 #7): the dense
    * leg on Similarity.crossTopKIvf against the persisted centroid
    * artifact — nProbes = 2 of 10 cells, so a query batch scores ~2/10
    * of the corpus cells, and nProbes = |cells| degrades to brute
    * EXACTLY (an exactness ladder the LSH twin cannot offer). Completes
    * the indexed-tier matrix: the fusion capstone now has brute, LSH
    * multi-probe (6- and 4-plane) and IVF dense legs. Derived oracle
    * re-runs assignment + probe ranking from the centroid literals. */
  private val textHybridIvf = Q("text_hybrid_ivf",
    (s, dir) => hybridTopKFrom(s, Tables.documents(s, dir),
      ivfCents = Some(docCentroidsPersisted(s, dir))),
    None, oracleFn = Some { (s, dir) =>
      s"""WITH $bmQuerySql,
        |${hybridCtesFor("documents",
            ivfCents = Some(docCentroidsPersisted(s, dir)))}
        |SELECT query_id, doc_id, rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
        |  CAST(rnk2 AS INTEGER) AS rnk
        |FROM rr WHERE rnk2 <= 5""".stripMargin
    })

  /** The candidate weight grid behind text_hybrid_trained — (sparse,
    * dense) weight vectors, equal weighting FIRST so the trained pick
    * can only match or beat plain RRF on the training judgments. */
  private val fusionGrid: Seq[Seq[Long]] =
    Seq(Seq(10L, 10L), Seq(20L, 10L), Seq(30L, 10L),
      Seq(10L, 20L), Seq(10L, 30L))

  /** TRAINED hybrid fusion (Retrieval.trainedFuse): the same two tiers
    * as text_hybrid_topk, but the RRF weights are LEARNED — every
    * (sparse, dense) weight vector in the grid is evaluated against the
    * leading-8 boolean-AND qrels (the engine's derivable relevance
    * proxy) in one plan, and the summed-integer-MRR argmax ships, with
    * the chosen operating point exposed as (wid, weights) columns in
    * the oracled output. Training is bit-deterministic, so the ORACLE
    * RE-RUNS IT: the static SQL unrolls the grid as VALUES, re-derives
    * the per-wid rankings and MRR sums, and picks the same argmax —
    * the learned artifact itself is hash-checked, not just the ranking
    * under it. */
  private val textHybridTrained = Q("text_hybrid_trained",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val (sparse, dense) = hybridTiers(s, docs)
      Retrieval.trainedFuse(Seq(sparse, dense),
        leading8Qrels(docs, bmQueryTerms.toDF("query_id", "term")),
        fusionGrid, k = 5)
    },
    Some {
      val gridValues = fusionGrid.zipWithIndex.flatMap { case (ws, wid) =>
        ws.zipWithIndex.map { case (w, tier) => s"($wid, $tier, $w)" }
      }.mkString(", ")
      s"""WITH $bmQuerySql,
        |${hybridCtesFor("documents")},
        |wgrid(wid, tier, wgt) AS (VALUES $gridValues),
        |contrib AS (SELECT query_id, doc_id, 0 AS tier,
        |    10000 // (60 + rnk) AS c FROM sp
        |  UNION ALL SELECT query_id, doc_id, 1 AS tier,
        |    10000 // (60 + rnk) FROM dtier),
        |fall AS (SELECT g.wid, c.query_id, c.doc_id,
        |    CAST(sum(g.wgt * c.c) AS BIGINT) AS fscore
        |  FROM contrib c JOIN wgrid g USING (tier) GROUP BY 1, 2, 3),
        |rnkd AS (SELECT *, row_number() OVER (PARTITION BY wid, query_id
        |    ORDER BY fscore DESC, doc_id) AS rnk FROM fall),
        |topw AS (SELECT * FROM rnkd WHERE rnk <= 5),
        |qtc AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM q GROUP BY 1),
        |lead8 AS (SELECT doc_id,
        |    unnest(list_distinct(list_slice(w, 1, 8))) AS term FROM toks),
        |rels AS (SELECT query_id, doc_id FROM (
        |    SELECT q.query_id, l.doc_id, count(DISTINCT q.term) AS n_match
        |    FROM lead8 l JOIN q USING (term) GROUP BY 1, 2) m
        |  JOIN qtc USING (query_id) WHERE m.n_match = qtc.n_terms),
        |ms AS (SELECT t.wid, t.query_id,
        |    min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END) AS fr
        |  FROM topw t LEFT JOIN rels r
        |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        |  GROUP BY 1, 2),
        |sw AS (SELECT wid, CAST(sum(CASE WHEN fr IS NULL THEN 0
        |    ELSE 10000 // fr END) AS BIGINT) AS s FROM ms GROUP BY 1),
        |best AS (SELECT wid FROM sw ORDER BY s DESC, wid LIMIT 1),
        |wstr AS (SELECT wid, string_agg(CAST(wgt AS VARCHAR), ','
        |    ORDER BY tier) AS weights FROM wgrid GROUP BY 1)
        |SELECT t.query_id, t.doc_id, t.fscore, CAST(t.rnk AS INTEGER) AS rnk,
        |  CAST(t.wid AS INTEGER) AS wid, wstr.weights
        |FROM topw t JOIN best USING (wid) JOIN wstr USING (wid)""".stripMargin
    })

  /** RAG retrieval capstone (TextAnalysis.chunkDocuments ∘
    * hybridTopKFrom): the full retrieval-augmented-generation data path —
    * context-window chunking (128 BPE tokens, 32 overlap), then HYBRID
    * sparse ⊕ dense retrieval over the CHUNKS, returning the top-5
    * (doc, chunk) contexts per query. Every stage — BPE encode,
    * token-window chunking, BM25, feature-hash embed, cosine ranking,
    * integer RRF — is already oracled standalone; the capstone composes
    * their SQL fragments and must hash-match end to end. The chunk frame
    * persists: it feeds the postings build, the corpus stats and the
    * dense embed (three consumers through the BPE window chain). */
  /** The chunk corpus behind the RAG queries, keyed by the COMPOSITE
    * `doc_id:chunk_idx` rendering (r12 — replaces the r11 packed
    * doc_id·1000 + chunk_idx long and its raise_error overflow guard:
    * ':' cannot appear in either component, so the key is collision-free
    * for ANY document length and no guard is needed). Retrieval /
    * fusion / eval are key-type-agnostic — ties in every rank window now
    * break on the composite string (binary UTF-8 order, identical in
    * DuckDB's default collation). Persisted: the BPE window chain feeds
    * the postings build, the corpus stats, the dense embed — and the
    * eval twin's qrels. */
  private def ragChunkDocs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(Tables.documents(s, dir),
        chunkTokens = 128, overlap = 32)
      .select(concat(col("doc_id").cast("string"), lit(":"),
          col("chunk_idx").cast("string")).as("doc_id"),
        col("chunk_text").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Unpack of the composite chunk key back to typed (doc_id, chunk_idx)
    * output columns — shared by the retrieval capstone and its oracle's
    * column contract. */
  private def ragUnpack: Seq[Column] = Seq(
    split(col("doc_id"), ":").getItem(0).cast("bigint").as("doc_id"),
    split(col("doc_id"), ":").getItem(1).cast("int").as("chunk_idx"))

  private val pipelineRagRetrieval = Q("pipeline_rag_retrieval",
    (s, dir) => {
      val cdocs = ragChunkDocs(s, dir)
      hybridTopKFrom(s, cdocs).select(
        (col("query_id") +: ragUnpack) ++ Seq(
          col("rrf_score"), col("n_tiers"), col("rnk")): _*)
    },
    Some(s"""WITH RECURSIVE $bmQuerySql,
      |$chunkDocsCtes,
      |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
      |  AS doc_id, chunk_text AS text FROM chunks),
      |${hybridCtesFor("cd")}
      |SELECT query_id,
      |  CAST(string_split(doc_id, ':')[1] AS BIGINT) AS doc_id,
      |  CAST(string_split(doc_id, ':')[2] AS INTEGER) AS chunk_idx,
      |  rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
      |  CAST(rnk2 AS INTEGER) AS rnk
      |FROM rr WHERE rnk2 <= 5""".stripMargin), bench = true)

  /** pipeline_rag_retrieval's INDEXED-dense twin — the full RAG capstone
    * with the chunk-embedding leg on the LSH bucket path
    * (text_hybrid_lsh's posture over the chunk corpus): at 100 TB the
    * chunk table is the big side, and this is the variant that never
    * scans it per query batch. Same composite chunk key, same output
    * contract. */
  private val pipelineRagLsh = Q("pipeline_rag_lsh",
    (s, dir) => {
      val cdocs = ragChunkDocs(s, dir)
      hybridTopKFrom(s, cdocs, denseLsh = true).select(
        (col("query_id") +: ragUnpack) ++ Seq(
          col("rrf_score"), col("n_tiers"), col("rnk")): _*)
    },
    Some(s"""WITH RECURSIVE $bmQuerySql,
      |$chunkDocsCtes,
      |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
      |  AS doc_id, chunk_text AS text FROM chunks),
      |${hybridCtesFor("cd", lsh = true)}
      |SELECT query_id,
      |  CAST(string_split(doc_id, ':')[1] AS BIGINT) AS doc_id,
      |  CAST(string_split(doc_id, ':')[2] AS INTEGER) AS chunk_idx,
      |  rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
      |  CAST(rnk2 AS INTEGER) AS rnk
      |FROM rr WHERE rnk2 <= 5""".stripMargin))

  /** Persisted CHUNK-corpus centroid index for the RAG IVF twin —
    * trained once on the dim-16 chunk vectors (10 cells), fingerprinted
    * on documents.parquet like every chunk-derived artifact. */
  private def ragChunkCentroids(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir + "#ragchunk",
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "centroids_ragchunk_c10", "documents")(
          Similarity.centroidsToDF(s,
            Similarity.kmeansCentroidArrays(
              docVecsFrom(ragChunkDocs(s, dir)), nCells = 10)))))

  /** HELD-OUT trained fusion — the ML-hygiene twin of
    * text_hybrid_trained: queries split by id parity (odd trains, even
    * evaluates — the demo split; production uses the leakage-safe
    * groupSplit), weights grid-search on the TRAIN split only, and the
    * oracled single-row output reports the chosen weights plus the
    * EVAL-split summed MRR under both the trained weights
    * (weightedRrfFuse — the serving face) and plain equal-weight RRF.
    * The whole train→select→serve→measure protocol is deterministic,
    * so DuckDB re-derives it end to end — including whether the
    * trained pick actually generalizes (no guarantee on held-out data;
    * the honest number IS the point). */
  private def trainedHoldoutQ(name: String, grid: Seq[Seq[Long]]): Q = Q(name,
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val (sparse, dense) = hybridTiers(s, docs)
      // unbounded suffix parse, mirroring the oracle's substr(id, 2) —
      // a fixed-length cap would diverge on 11+-digit ids (ADVICE r13)
      def part(df: DataFrame, rem: Int): DataFrame =
        df.where(pmod(expr("cast(substring(query_id, 2) as int)"),
          lit(2)) === rem)
      val qrels = leading8Qrels(docs, bmQueryTerms.toDF("query_id", "term"))
      val trained = Retrieval.trainedFuse(
        Seq(part(sparse, 1), part(dense, 1)), part(qrels, 1),
        grid, k = 5)
      // an EMPTY train split trains nothing: the oracle's `best` CTE is
      // empty and emits zero rows, so the degenerate case must emit
      // zero rows here too, not a grid.head fallback row (ADVICE
      // r13). The placeholder weights only shape the dead plan below
      // the lit(false) filter.
      val weightsOpt = trained.select(col("weights")).head(1).headOption
        .map(_.getString(0).split(",").map(_.toLong).toSeq)
      val weights = weightsOpt.getOrElse(grid.head)
      val evalTiers = Seq(part(sparse, 0), part(dense, 0))
      val evalQrels = part(qrels, 0)
      def sumMrr(ranked: DataFrame): DataFrame =
        Retrieval.evalRanking(ranked, evalQrels, k = 5)
          .agg(coalesce(sum(col("mrr_bp")), lit(0L)).as("v"))
      val tm = sumMrr(Retrieval.weightedRrfFuse(evalTiers, weights, k = 5)
        .select(col("query_id"), col("doc_id"), col("rnk")))
        .select(col("v").as("eval_trained_mrr_bp"))
      val em = sumMrr(Retrieval.rrfFuse(evalTiers, k = 5)
        .select(col("query_id"), col("doc_id"), col("rnk")))
        .select(col("v").as("eval_equal_mrr_bp"))
      tm.crossJoin(em).select(lit(weights.mkString(",")).as("weights"),
        col("eval_trained_mrr_bp"), col("eval_equal_mrr_bp"))
        .where(lit(weightsOpt.isDefined))
    },
    Some {
      val gridValues = grid.zipWithIndex.flatMap { case (ws, wid) =>
        ws.zipWithIndex.map { case (w, tier) => s"($wid, $tier, $w)" }
      }.mkString(", ")
      s"""WITH $bmQuerySql,
        |${hybridCtesFor("documents")},
        |c1 AS (SELECT query_id, doc_id, 0 AS tier,
        |    10000 // (60 + rnk) AS c FROM sp
        |  UNION ALL SELECT query_id, doc_id, 1 AS tier,
        |    10000 // (60 + rnk) FROM dtier),
        |trainc AS (SELECT * FROM c1
        |  WHERE CAST(substr(query_id, 2) AS INTEGER) % 2 = 1),
        |evalc AS (SELECT * FROM c1
        |  WHERE CAST(substr(query_id, 2) AS INTEGER) % 2 = 0),
        |wgrid(wid, tier, wgt) AS (VALUES $gridValues),
        |fall AS (SELECT g.wid, c.query_id, c.doc_id,
        |    CAST(sum(g.wgt * c.c) AS BIGINT) AS fscore
        |  FROM trainc c JOIN wgrid g USING (tier) GROUP BY 1, 2, 3),
        |topw AS (SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY wid, query_id ORDER BY fscore DESC, doc_id) AS rnk
        |    FROM fall) WHERE rnk <= 5),
        |qtc AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM q GROUP BY 1),
        |lead8 AS (SELECT doc_id,
        |    unnest(list_distinct(list_slice(w, 1, 8))) AS term FROM toks),
        |rels AS (SELECT query_id, doc_id FROM (
        |    SELECT q.query_id, l.doc_id, count(DISTINCT q.term) AS n_match
        |    FROM lead8 l JOIN q USING (term) GROUP BY 1, 2) m
        |  JOIN qtc USING (query_id) WHERE m.n_match = qtc.n_terms),
        |trels AS (SELECT * FROM rels
        |  WHERE CAST(substr(query_id, 2) AS INTEGER) % 2 = 1),
        |erels AS (SELECT * FROM rels
        |  WHERE CAST(substr(query_id, 2) AS INTEGER) % 2 = 0),
        |ms AS (SELECT t.wid, t.query_id,
        |    min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END) AS fr
        |  FROM topw t LEFT JOIN trels r
        |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        |  GROUP BY 1, 2),
        |sw AS (SELECT wid, CAST(sum(CASE WHEN fr IS NULL THEN 0
        |    ELSE 10000 // fr END) AS BIGINT) AS s FROM ms GROUP BY 1),
        |best AS (SELECT wid FROM sw ORDER BY s DESC, wid LIMIT 1),
        |wstr AS (SELECT wid, string_agg(CAST(wgt AS VARCHAR), ','
        |    ORDER BY tier) AS weights FROM wgrid GROUP BY 1),
        |ef AS (SELECT c.query_id, c.doc_id,
        |    CAST(sum(g.wgt * c.c) AS BIGINT) AS fscore
        |  FROM evalc c JOIN wgrid g USING (tier) JOIN best USING (wid)
        |  WHERE g.wid = best.wid GROUP BY 1, 2),
        |etop AS (SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rnk
        |    FROM ef) WHERE rnk <= 5),
        |etm AS (SELECT CAST(coalesce(sum(CASE WHEN fr IS NULL THEN 0
        |      ELSE 10000 // fr END), 0) AS BIGINT) AS v FROM (
        |    SELECT t.query_id,
        |      min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END) AS fr
        |    FROM etop t LEFT JOIN erels r
        |      ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        |    GROUP BY 1)),
        |eqf AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS fscore
        |  FROM evalc GROUP BY 1, 2),
        |eqtop AS (SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rnk
        |    FROM eqf) WHERE rnk <= 5),
        |eqm AS (SELECT CAST(coalesce(sum(CASE WHEN fr IS NULL THEN 0
        |      ELSE 10000 // fr END), 0) AS BIGINT) AS v FROM (
        |    SELECT t.query_id,
        |      min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END) AS fr
        |    FROM eqtop t LEFT JOIN erels r
        |      ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        |    GROUP BY 1))
        |SELECT wstr.weights, etm.v AS eval_trained_mrr_bp,
        |  eqm.v AS eval_equal_mrr_bp
        |FROM best JOIN wstr USING (wid), etm, eqm""".stripMargin
    })
  private val textHybridTrainedHoldout =
    trainedHoldoutQ("text_hybrid_trained_holdout", fusionGrid)

  /** The SIMPLEX-SWEPT candidate grid (VERDICT r13 #3): w_sparse +
    * w_dense = 16 held constant (RRF ranking is scale-invariant in the
    * total, so the simplex IS the whole search space for two tiers) and
    * every integer mix from (1,15) to (15,1) evaluated — a real 1-D
    * sweep of the operating point instead of 5 hand-picked vectors.
    * The equal-weight point (8,8) is IN the sweep, so the trained pick
    * can only match or beat plain RRF on the training judgments. */
  private val fusionGridSweep: Seq[Seq[Long]] =
    (1L to 15L).map(i => Seq(i, 16L - i))

  /** Held-out trained fusion over the swept simplex — same train →
    * select → serve → measure protocol as text_hybrid_trained_holdout
    * (whose 5-point grid it subsumes in resolution), one oracled row:
    * the swept pick's weights plus its EVAL-split MRR vs equal-weight
    * RRF. The whole 15-point grid still evaluates in ONE plan
    * (trainedFuse's contribs×grid join — |grid|·|queries|·k rows, so a
    * 3× finer grid costs 3× a tiny frame, not 3× the corpus). */
  private val textHybridTrainedSweep =
    trainedHoldoutQ("text_hybrid_trained_sweep", fusionGridSweep)


  /** RAG context DIVERSIFICATION capstone — retrieve → fuse → MMR →
    * deliver: the fused sparse⊕dense chunk ranking (top-20 candidates
    * this time, the MMR working set) re-ranked by greedy
    * maximal-marginal-relevance over the chunk embeddings, so the 5
    * delivered contexts are complementary instead of five near-copies
    * of the best chunk — the step that makes a RAG context window worth
    * its tokens when the corpus contains near-duplicate chunks (every
    * overlapping-window chunking does). All integer/round-4 arithmetic
    * ⇒ the oracle chains the chunk CTEs, the hybrid fusion fragment and
    * the unrolled MMR twin end to end. */
  private val pipelineRagMmr = Q("pipeline_rag_mmr",
    (s, dir) => {
      val cdocs = ragChunkDocs(s, dir)
      val (sparse, dense) = hybridTiers(s, cdocs)
      val fused = Retrieval.rrfFuse(Seq(sparse, dense), k = 20)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      Retrieval.mmrDiversify(fused,
        docVecsFrom(cdocs).select(col("vec_id").as("doc_id"), col("embedding")),
        k = 5)
        .select(col("query_id"), col("rank"),
          split(col("doc_id"), ":").getItem(0).cast("bigint").as("doc_id"),
          split(col("doc_id"), ":").getItem(1).cast("int").as("chunk_idx"))
    },
    Some(s"""WITH RECURSIVE $bmQuerySql,
      |$chunkDocsCtes,
      |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
      |  AS doc_id, chunk_text AS text FROM chunks),
      |${hybridCtesFor("cd")},
      |cnd0 AS (SELECT query_id, doc_id, rnk2 AS rnk FROM rr WHERE rnk2 <= 20),
      |cand AS MATERIALIZED (SELECT c.query_id, c.doc_id,
      |    CAST((21 - c.rnk) * 500 AS BIGINT) AS rel_bp, n.v, n.nrm
      |  FROM cnd0 c JOIN n ON n.vec_id = c.doc_id),
      |${Retrieval.mmrSql(5)}
      |SELECT query_id, rank,
      |  CAST(string_split(doc_id, ':')[1] AS BIGINT) AS doc_id,
      |  CAST(string_split(doc_id, ':')[2] AS INTEGER) AS chunk_idx
      |FROM mmr_out""".stripMargin))

  /** pipeline_rag_retrieval's TRAINED-index twin — the RAG capstone with
    * the chunk-embedding leg on the persisted-centroid IVF path
    * (text_hybrid_ivf's posture over the chunk corpus): completes the
    * brute / LSH / IVF dense-leg matrix at the RAG tier too. Same
    * composite chunk key, same output contract; derived oracle from the
    * chunk-centroid literals. */
  private val pipelineRagIvf = Q("pipeline_rag_ivf",
    (s, dir) => {
      val cdocs = ragChunkDocs(s, dir)
      hybridTopKFrom(s, cdocs,
          ivfCents = Some(ragChunkCentroids(s, dir))).select(
        (col("query_id") +: ragUnpack) ++ Seq(
          col("rrf_score"), col("n_tiers"), col("rnk")): _*)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH RECURSIVE $bmQuerySql,
        |$chunkDocsCtes,
        |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
        |  AS doc_id, chunk_text AS text FROM chunks),
        |${hybridCtesFor("cd", ivfCents = Some(ragChunkCentroids(s, dir)))}
        |SELECT query_id,
        |  CAST(string_split(doc_id, ':')[1] AS BIGINT) AS doc_id,
        |  CAST(string_split(doc_id, ':')[2] AS INTEGER) AS chunk_idx,
        |  rrf_score, CAST(n_tiers AS BIGINT) AS n_tiers,
        |  CAST(rnk2 AS INTEGER) AS rnk
        |FROM rr WHERE rnk2 <= 5""".stripMargin
    })

  /** RAG context DELIVERY — the step after retrieval: the fused top-5
    * chunk ids joined back to their chunk TEXT, i.e. the actual context
    * strings a generator consumes (retrieval alone hands back keys; a
    * RAG pipeline ships text). Dense leg on the indexed LSH path (the
    * 100-TB posture); the ranked side is |queries|×5 rows, so the
    * text-attach join broadcasts it against the persisted chunk frame —
    * one candidate-sized join, never a corpus re-scan. */
  private val pipelineRagContexts = Q("pipeline_rag_contexts",
    (s, dir) => {
      val cdocs = ragChunkDocs(s, dir)
      broadcast(hybridTopKFrom(s, cdocs, denseLsh = true))
        .join(cdocs.select(col("doc_id"), col("text").as("context")),
          "doc_id")
        .select((col("query_id") +: ragUnpack) ++ Seq(
          col("rnk"), col("context")): _*)
    },
    Some(s"""WITH RECURSIVE $bmQuerySql,
      |$chunkDocsCtes,
      |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
      |  AS doc_id, chunk_text AS text FROM chunks),
      |${hybridCtesFor("cd", lsh = true)}
      |SELECT rr.query_id,
      |  CAST(string_split(rr.doc_id, ':')[1] AS BIGINT) AS doc_id,
      |  CAST(string_split(rr.doc_id, ':')[2] AS INTEGER) AS chunk_idx,
      |  CAST(rr.rnk2 AS INTEGER) AS rnk, cd.text AS context
      |FROM rr JOIN cd ON cd.doc_id = rr.doc_id WHERE rr.rnk2 <= 5""".stripMargin))

  /** RAG retriever MEASUREMENT (Retrieval.evalRanking over the fused
    * chunk ranking): the build → index → fuse → measure loop closed in
    * one call. Chunk-level qrels are boolean-AND matches over each
    * chunk's LEADING 8 tokens (the same answer-in-the-opening proxy as
    * text_retrieval_eval — whole-chunk AND is too easy for the fused
    * ranker and every column degenerates to a perfect score). Output:
    * per-query hits@5, first relevant rank, integer MRR. */
  private val pipelineRagEval = Q("pipeline_rag_eval",
    (s, dir) => {
      import s.implicits._
      val cdocs = ragChunkDocs(s, dir)
      val q = bmQueryTerms.toDF("query_id", "term")
      val fused = hybridTopKFrom(s, cdocs)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      Retrieval.evalRanking(fused, leading8Qrels(cdocs, q), k = 5)
    },
    Some(s"""WITH RECURSIVE $bmQuerySql,
      |$chunkDocsCtes,
      |cd AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
      |  AS doc_id, chunk_text AS text FROM chunks),
      |${hybridCtesFor("cd")},
      |topk AS (SELECT query_id, doc_id, CAST(rnk2 AS INTEGER) AS rnk
      |  FROM rr WHERE rnk2 <= 5),
      |qcnt AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM q GROUP BY 1),
      |clead AS (SELECT doc_id, unnest(list_distinct(list_slice(w, 1, 8))) AS term
      |  FROM toks),
      |rels AS (SELECT query_id, doc_id FROM (
      |    SELECT q.query_id, l.doc_id, count(DISTINCT l.term) AS n_match
      |    FROM clead l JOIN q USING (term) GROUP BY 1, 2) m
      |  JOIN qcnt USING (query_id) WHERE m.n_match = qcnt.n_terms),
      |$evalTailSql""".stripMargin))

  /** Shared leading-8 boolean-AND qrels over any (doc_id, text) corpus —
    * the derivable relevance proxy of text_retrieval_eval, reused by the
    * training-data ops below. */
  private def leading8Qrels(docs: DataFrame, q: DataFrame): DataFrame = {
    val nterms = q.groupBy(col("query_id"))
      .agg(countDistinct(col("term")).as("n_terms"))
    val lead = graft.plans.Stage(docs.select(col("doc_id"), col("text")),
        "w", TextFns.tokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(slice(col("w"), 1, 8))).as("term"))
    lead.join(broadcast(q), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_match"))
      .join(broadcast(nterms), "query_id")
      .where(col("n_match") === col("n_terms"))
      .select(col("query_id"), col("doc_id"))
  }

  /** The shared SQL half: BM25 top-10 (`topk`) + leading-8 qrels
    * (`rels`) + the non-relevant ranked rows with their dense negative
    * rank (`neg`) — the CTE chain under both training-data ops. */
  private def hardNegCtesSql: String =
    s"""toks AS (SELECT doc_id, $duckToks AS w FROM documents),
      |post AS (SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM toks),
      |tdf AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |${Retrieval.bm25ScoreCtesSql()},
      |topk AS (SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS rnk
      |  FROM ranked WHERE rnk <= 10),
      |qcnt AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM q GROUP BY 1),
      |lead AS (SELECT doc_id, unnest(list_distinct(list_slice(w, 1, 8))) AS term
      |  FROM toks),
      |rels AS (SELECT query_id, doc_id FROM (
      |    SELECT q.query_id, l.doc_id, count(DISTINCT l.term) AS n_match
      |    FROM lead l JOIN q USING (term) GROUP BY 1, 2) m
      |  JOIN qcnt USING (query_id) WHERE m.n_match = qcnt.n_terms),
      |neg AS (SELECT t.query_id, t.doc_id, t.rnk,
      |    row_number() OVER (PARTITION BY t.query_id ORDER BY t.rnk, t.doc_id) AS nr
      |  FROM topk t LEFT JOIN rels r
      |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
      |  WHERE r.doc_id IS NULL)""".stripMargin

  /** Hard-negative mining (Retrieval.hardNegatives — DPR, Karpukhin et
    * al. 2020): per query, the 3 highest-BM25-ranked documents that are
    * NOT relevant under the leading-8 qrels — the negatives a
    * contrastive retriever trains against. Candidate-sized: broadcast
    * anti-join + a window over ≤ 10 rows per query. */
  private val pipelineHardNegatives = Q("pipeline_hard_negatives",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val q = bmQueryTerms.toDF("query_id", "term")
      Retrieval.hardNegatives(
        Retrieval.bm25TopK(docs, q, k = 10), leading8Qrels(docs, q),
        nNeg = 3)
    },
    Some(s"""WITH $bmQuerySql,
      |$hardNegCtesSql
      |SELECT query_id, doc_id, rnk, CAST(nr AS INTEGER) AS neg_rnk
      |FROM neg WHERE nr <= 3""".stripMargin))

  /** Contrastive training triplets (Retrieval.contrastiveTriplets):
    * every RANKED relevant doc × its query's 3 hard negatives — the
    * (query, positive, negative) emission a dual-encoder trains on; a
    * relevant doc the ranker never surfaced cannot appear as a positive
    * (the DPR retrieved-positives construction). */
  private val pipelineContrastiveTriplets = Q("pipeline_contrastive_triplets",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val q = bmQueryTerms.toDF("query_id", "term")
      Retrieval.contrastiveTriplets(
        Retrieval.bm25TopK(docs, q, k = 10), leading8Qrels(docs, q),
        nNeg = 3)
    },
    Some(s"""WITH $bmQuerySql,
      |$hardNegCtesSql,
      |pos AS (SELECT t.query_id, t.doc_id AS pos_doc_id, t.rnk AS pos_rnk
      |  FROM topk t JOIN rels r
      |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id)
      |SELECT p.query_id, p.pos_doc_id, p.pos_rnk,
      |  n.doc_id AS neg_doc_id, CAST(n.nr AS INTEGER) AS neg_rnk
      |FROM pos p JOIN neg n ON n.query_id = p.query_id WHERE n.nr <= 3""".stripMargin))

  /** Strict-order funnel per user (Funnel.userFunnel): the Spark side is a
    * single-shuffle sorted fold; the oracle is the equivalent cascaded
    * min-join formulation (step i = min ts of its type strictly after step
    * i-1), so the two independently-derived forms must agree row-for-row. */
  private val eFunnelUsers = Q("e_funnel_users",
    (s, dir) => Funnel.userFunnel(
      // µs granularity: DuckDB reads the parquet nanos column at µs
      // precision (same normalization as t_session_windows), so the
      // strict-order comparisons must run on the SAME clock both sides.
      Tables.events(s, dir).withColumn("ts", expr("ts div 1000")),
      Seq("view", "click", "purchase")),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type FROM events
      | WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.tus) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.tus > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.tus) AS t3 FROM e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.tus > s2.t2 GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM e)
      |SELECT u.user_id, s1.t1 AS t_view, s2.t2 AS t_click, s3.t3 AS t_purchase,
      |  CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3 WHEN s2.t2 IS NOT NULL THEN 2
      |       WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS steps_completed
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)""".stripMargin))

  /** Funnel stage summary (Funnel.funnelSummary): users reaching each
    * stage + conversion from the previous stage in basis-point floors
    * (exact integer division both sides). */
  private val eFunnelSummary = Q("e_funnel_summary",
    (s, dir) => Funnel.funnelSummary(
      Tables.events(s, dir).withColumn("ts", expr("ts div 1000")),
      Seq("view", "click", "purchase")),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type FROM events
      | WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.tus) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.tus > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.tus) AS t3 FROM e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.tus > s2.t2 GROUP BY 1),
      |c AS (SELECT (SELECT count(*) FROM s1) AS n1,
      |  (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
      |SELECT CAST(1 AS INTEGER) AS stage, 'view' AS step,
      |  CAST(n1 AS BIGINT) AS n_users, CAST(10000 AS BIGINT) AS conv_bp FROM c
      |UNION ALL SELECT CAST(2 AS INTEGER), 'click', CAST(n2 AS BIGINT),
      |  CAST((n2 * 10000) // n1 AS BIGINT) FROM c
      |UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', CAST(n3 AS BIGINT),
      |  CAST((n3 * 10000) // n2 AS BIGINT) FROM c""".stripMargin))

  /** Weekly cohort retention (Funnel.retention) over the events table.
    * Period arithmetic is pure integer division on the epoch clock; the
    * nested-floor identity makes the ns (Spark) and µs (DuckDB) clocks
    * agree exactly on period numbers. */
  private val eRetention = Q("e_retention",
    (s, dir) => Funnel.retention(Tables.events(s, dir),
      periodTicks = 7L * 24 * 3600 * 1000000000L),
    Some("""WITH p AS (SELECT DISTINCT user_id AS u,
      |  epoch_us(ts) // (7 * 24 * 3600 * 1000000::BIGINT) AS period FROM events),
      |c AS (SELECT u, min(period) AS cohort FROM p GROUP BY u)
      |SELECT c.cohort AS cohort_period, p.period - c.cohort AS period_offset,
      |  count(*) AS n_users
      |FROM p JOIN c USING (u) GROUP BY 1, 2""".stripMargin))

  /** Gopher-style quality gate (TextAnalysis.qualityRules) with bounds
    * fitted to the synthetic corpus (10–200 tokens). All comparisons are
    * exact integer arithmetic — no float division reaches the output. */
  private val textQualityRules = Q("text_quality_rules",
    (s, dir) => TextAnalysis.qualityRules(Tables.documents(s, dir),
      minTokens = 10, maxTokens = 200),
    Some(s"""WITH toks AS (SELECT doc_id, text, $duckToks AS w FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(array_to_string(w, '')) AS BIGINT) AS sum_wlen,
      |  CAST(len(list_filter(w, t -> list_contains(['the','of','and','to','in','is','a'], t))) AS BIGINT) AS stop_hits,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
      |  CAST(length(text) AS BIGINT) AS n_chars FROM toks)
      |SELECT doc_id, n_tokens,
      |  CAST(n_tokens >= 10 AND n_tokens <= 200 AS INTEGER) AS ok_len,
      |  CAST(n_tokens > 0 AND sum_wlen >= 3 * n_tokens AND sum_wlen <= 10 * n_tokens AS INTEGER) AS ok_word_len,
      |  CAST(stop_hits >= 1 AS INTEGER) AS ok_stopword,
      |  CAST(n_alpha * 10 >= n_chars * 7 AS INTEGER) AS ok_alpha,
      |  CAST(n_tokens >= 10 AND n_tokens <= 200
      |    AND n_tokens > 0 AND sum_wlen >= 3 * n_tokens AND sum_wlen <= 10 * n_tokens
      |    AND stop_hits >= 1 AND n_alpha * 10 >= n_chars * 7 AS INTEGER) AS keep
      |FROM m""".stripMargin))

  /** Classifier-based quality gate (TextAnalysis.qualityModelScore): integer
    * linear model over the quality metrics, keep ⇔ logit > 0. Weights are
    * fixed model artifacts; the oracle recomputes the identical integer
    * arithmetic (DuckDB `//` ≡ Spark `div` on the non-negative operands
    * used here). */
  private val textQualityModel = Q("text_quality_model",
    (s, dir) => TextAnalysis.qualityModelScore(Tables.documents(s, dir)),
    Some(s"""WITH toks AS (SELECT doc_id, text, $duckToks AS w FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(array_to_string(w, '')) AS BIGINT) AS sum_wlen,
      |  CAST(len(list_filter(w, t -> list_contains(['the','of','and','to','in','is','a'], t))) AS BIGINT) AS stop_hits,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
      |  CAST(length(text) AS BIGINT) AS n_chars FROM toks),
      |f AS (SELECT doc_id, n_tokens,
      |  (sum_wlen * 100) // greatest(n_tokens, 1) AS wlen_x100,
      |  (stop_hits * 1000) // greatest(n_tokens, 1) AS stop_x1000,
      |  (n_alpha * 1000) // greatest(n_chars, 1) AS alpha_x1000 FROM m),
      |s AS (SELECT doc_id, n_tokens, wlen_x100, stop_x1000, alpha_x1000,
      |  -2600 + 6 * stop_x1000 + 3 * alpha_x1000
      |    - 4 * abs(wlen_x100 - 450) - 5 * abs(n_tokens - 55) AS logit FROM f)
      |SELECT doc_id, n_tokens, wlen_x100, stop_x1000, alpha_x1000, logit,
      |  CAST(logit > 0 AS INTEGER) AS keep
      |FROM s""".stripMargin))

  /** customer with realistic-entropy display names, shared by both ER
    * queries: `c_name` + a 6-hex-char md5 tag. Bare `c_name` is a DENSE
    * sequential id, where nearly every record has ~100 genuine distance-1
    * neighbors and linkage output grows superlinearly (measured 14.8M
    * exact pairs at sf1); real names are not dense, and on dense keys you
    * would link on the id directly. */
  private def erNames(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("id"),
      concat(col("c_name"), lit("-"),
        md5(col("c_custkey").cast("string")).substr(1, 6)).as("name"))

  /** The simulated second feed: one deterministic character deletion at
    * position `id % len + 1` of the normalized name. */
  private def erCorrupted(base: DataFrame): DataFrame = {
    val nm = EntityResolution.normalizeName(col("name"))
    val pos = (col("id") % greatest(length(nm), lit(1))).cast("int") + 1
    base.select(col("id"),
      concat(nm.substr(lit(1), pos - 1), nm.substr(pos + 1, length(nm))).as("name"))
  }

  // ── shared DuckDB fragments mirroring erNames / erCorrupted /
  //    EntityResolution.deletionNeighborhood. b0 re-normalizes the
  //    corrupted name exactly as the Scala side does (fuzzyPairs
  //    normalizes its inputs): a deletion can merge tokens across a
  //    space, and without the re-normalization the two engines would key
  //    different strings on any space-bearing corpus. ──
  private def erNorm(x: String): String =
    s"lower(trim(regexp_replace($x, '\\s+', ' ', 'g')))"
  private def erA0Sql: String =
    s"a0 AS (SELECT c_custkey AS id, ${erNorm("c_name || '-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)")} AS nm FROM customer)"
  private def erB0Sql(where: String): String =
    s"b0 AS (SELECT id, ${erNorm("substr(nm, 1, CAST(id % greatest(length(nm), 1) AS INTEGER)) || substr(nm, CAST(id % greatest(length(nm), 1) AS INTEGER) + 2)")} AS nm FROM a0$where)"
  private def erKeysSql(cte: String, idAs: String, nmAs: String, src: String): String =
    s"$cte AS (SELECT id AS $idAs, nm AS $nmAs, unnest(list_distinct(list_transform(range(0, length(nm) + 1), i -> CASE WHEN i = 0 THEN nm ELSE substr(nm, 1, CAST(i AS INTEGER) - 1) || substr(nm, CAST(i AS INTEGER) + 1) END))) AS k FROM $src)"
  private def erVerifySql: String =
    """cand AS (SELECT DISTINCT id_a, na, id_b, nb FROM ka JOIN kb USING (k))
      |SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INTEGER) AS dist
      |FROM cand WHERE levenshtein(na, nb) <= 1""".stripMargin

  /** Record linkage over the simulated second feed (EntityResolution):
    * the corrupted copy of every name linked back with symmetric-delete
    * blocking + a levenshtein <= 1 verify. Output is the planted (i, i)
    * links plus rare genuine tag collisions -- linear in the corpus. The
    * oracle mirrors block generation AND verify, so recall and precision
    * are both checked hash-exact. */
  private val erFuzzyPairs = Q("er_fuzzy_pairs",
    (s, dir) => {
      val base = erNames(s, dir)
      EntityResolution.fuzzyPairs(base, erCorrupted(base))
    },
    Some(s"""WITH $erA0Sql,
      |${erB0Sql("")},
      |${erKeysSql("ka", "id_a", "na", "a0")},
      |${erKeysSql("kb", "id_b", "nb", "b0")},
      |$erVerifySql""".stripMargin),
    bench = true)

  /** Incremental linkage (EntityResolution.fuzzyPairsIncremental): the
    * full customer side is a prebuilt nameIndex artifact (stand-in for a
    * loaded parquet index -- history never re-normalized or re-keyed); the
    * batch is the id%5==0 slice arriving corrupted from the second feed.
    * Oracle re-derives both sides from raw names, knowing nothing of the
    * index. */
  private val erFuzzyIncr = Q("er_fuzzy_incr",
    (s, dir) => {
      val base = erNames(s, dir)
      val batch = erCorrupted(base.where(pmod(col("id"), lit(5)) === 0))
      EntityResolution.fuzzyPairsIncremental(EntityResolution.nameIndex(base), batch)
    },
    Some(s"""WITH $erA0Sql,
      |${erB0Sql(" WHERE id % 5 = 0")},
      |${erKeysSql("ka", "id_a", "na", "a0")},
      |${erKeysSql("kb", "id_b", "nb", "b0")},
      |$erVerifySql""".stripMargin))

  /** One unrolled integer-PageRank iteration for the DuckDB oracle —
    * mirrors Graph.pageRank's update rule exactly (floored contribution
    * div, BIGINT sums, base 150000). */
  private def prIterSql(i: Int): String =
    s"""c$i AS (SELECT e0.dst AS node, CAST(sum((s${i - 1}.r * 85) // (100 * deg.d)) AS BIGINT) AS c
       |  FROM e0 JOIN deg USING (src) JOIN s${i - 1} ON s${i - 1}.node = e0.src GROUP BY 1),
       |s$i AS (SELECT nodes.node, 150000 + coalesce(c$i.c, 0) AS r FROM nodes LEFT JOIN c$i USING (node))""".stripMargin

  /** Link-graph authority scoring (Graph.pageRank): 5 iterations of
    * integer PageRank over a deterministic synthetic citation graph on the
    * documents table (ring + scatter edges, every 10th doc also cites the
    * hub doc 0). Integer ppm scores make the ENTIRE iterative computation
    * hash-exact cross-engine — the oracle unrolls the same five updates as
    * CTEs. The hub ends up with the top rank; curation would weight
    * documents by it. Non-contiguous doc_ids (the sf1 replication) make
    * some modulus targets dangling pseudo-nodes; both sides derive the
    * node set from the edge list, so the computation stays identical. */
  /** The deterministic synthetic citation graph both graph queries run
    * on: ring + scatter edges, every 10th doc also cites the hub doc 0. */
  private def docGraphEdges(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val nF = docs.agg((max(col("doc_id")) + 1).as("n"))
    // 1-row broadcast crossJoin (the documented benign global-aggregate
    // pattern) to parameterize the modulus
    val base = docs.crossJoin(broadcast(nF))
    val ring = struct(col("doc_id").as("src"),
      pmod(col("doc_id") + 1, col("n")).as("dst"))
    val scatter = struct(col("doc_id").as("src"),
      pmod(col("doc_id") * 7 + 3, col("n")).as("dst"))
    val hub = struct(col("doc_id").as("src"), lit(0L).as("dst"))
    base.select(explode(
      when(pmod(col("doc_id"), lit(10)) === 0, array(ring, scatter, hub))
        .otherwise(array(ring, scatter))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** DuckDB mirror of [[docGraphEdges]] (`e0`). */
  private def docGraphSql: String =
    """nn AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM documents),
      |e0 AS (
      |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, nn
      |  UNION ALL SELECT doc_id, (doc_id * 7 + 3) % n FROM documents, nn
      |  UNION ALL SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  private val graphPagerank = Q("graph_pagerank",
    (s, dir) => Graph.pageRank(docGraphEdges(s, dir), 5),
    Some(s"""WITH $docGraphSql,
      |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
      |deg AS (SELECT src, count(*) AS d FROM e0 GROUP BY 1),
      |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |${(1 to 5).map(prIterSql).mkString(",\n")}
      |SELECT node, CAST(r AS BIGINT) AS rank_ppm FROM s5""".stripMargin))

  /** Per-node triangle counts (Graph.triangleCounts) on the same citation
    * graph — the local clustering signal web-corpus analysis pairs with
    * authority scores (link farms triangulate; organic graphs do less).
    * Pure integer joins ⇒ hash-exact oracle via the same 3-way self-join. */
  private val graphTriangles = Q("graph_triangles",
    (s, dir) => Graph.triangleCounts(docGraphEdges(s, dir)),
    Some(s"""WITH $docGraphSql,
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0 WHERE src <> dst),
      |tri AS (SELECT t1.a, t1.b, t2.c
      |  FROM und t1
      |  JOIN (SELECT a AS b, b AS c FROM und) t2 USING (b)
      |  JOIN (SELECT a, b AS c FROM und) t3 USING (a, c))
      |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1""".stripMargin))

  /** Robust outlier detection (Profiling.madOutliers): per-source
    * median/MAD flags on document token counts — the data-quality monitor
    * that catches a crawler regression (truncated or exploded docs)
    * without float statistics; k = 3.5 passes as k100 = 350. Exact
    * integer math end-to-end ⇒ hash-exact oracle. */
  private val aOutliersMad = Q("a_outliers_mad",
    (s, dir) => Profiling.madOutliers(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextFns.tokenCount(col("text")).as("n_tokens")),
      "source", "doc_id", "n_tokens", 350),
    Some(s"""WITH t AS (SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS x FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY x) AS rn,
      |  count(*) OVER (PARTITION BY source) AS n FROM t),
      |med AS (SELECT source, x AS med FROM r WHERE rn = (n + 1) // 2),
      |d AS (SELECT t.doc_id, t.source, t.x, med.med, abs(t.x - med.med) AS adev
      |  FROM t JOIN med USING (source)),
      |r2 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY adev) AS rn,
      |  count(*) OVER (PARTITION BY source) AS n FROM d),
      |mad AS (SELECT source, adev AS mad FROM r2 WHERE rn = (n + 1) // 2)
      |SELECT d.doc_id, d.source, d.x, d.med, mad.mad,
      |  CAST(d.adev * 100 > mad.mad * 350 AS INTEGER) AS outlier
      |FROM d JOIN mad USING (source)""".stripMargin))

  /** Curriculum bucketing (TextAnalysis.curriculumBuckets): per-source
    * quality deciles over the model logit, bucket 1 = best. Deterministic
    * ntile with a total-order tie-break, so the oracle replays the same
    * feature extraction + window. */
  private val pipelineCurriculum = Q("pipeline_curriculum",
    (s, dir) => TextAnalysis.curriculumBuckets(Tables.documents(s, dir), 10),
    Some(s"""WITH toks AS (SELECT doc_id, source, text, $duckToks AS w FROM documents),
      |m AS (SELECT doc_id, source,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(array_to_string(w, '')) AS BIGINT) AS sum_wlen,
      |  CAST(len(list_filter(w, t -> list_contains(['the','of','and','to','in','is','a'], t))) AS BIGINT) AS stop_hits,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
      |  CAST(length(text) AS BIGINT) AS n_chars FROM toks),
      |f AS (SELECT doc_id, source, n_tokens,
      |  (sum_wlen * 100) // greatest(n_tokens, 1) AS wlen_x100,
      |  (stop_hits * 1000) // greatest(n_tokens, 1) AS stop_x1000,
      |  (n_alpha * 1000) // greatest(n_chars, 1) AS alpha_x1000 FROM m),
      |sc AS (SELECT doc_id, source,
      |  -2600 + 6 * stop_x1000 + 3 * alpha_x1000
      |    - 4 * abs(wlen_x100 - 450) - 5 * abs(n_tokens - 55) AS logit FROM f)
      |SELECT doc_id, source, logit,
      |  CAST(ntile(10) OVER (PARTITION BY source ORDER BY logit DESC, doc_id) AS INTEGER) AS bucket
      |FROM sc""".stripMargin))

  /** Epoch upsampling (TextAnalysis.epochUpsample): per-source fractional
    * training epochs — src0 2.5×, src1 1×, src2 0.25×, default 1×. The
    * oracle replays the md5-uniform fractional membership and
    * generate_series full copies. */
  private val pipelineEpochUpsample = Q("pipeline_epoch_upsample",
    (s, dir) => TextAnalysis.epochUpsample(Tables.documents(s, dir),
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25), defaultEpochs = 1.0),
    Some("""WITH w AS (SELECT doc_id, source,
      |  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0 WHEN 'src2' THEN 0.25 ELSE 1.0 END AS e,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) / 16777216.0 AS u FROM documents),
      |n AS (SELECT doc_id, source,
      |  CAST(floor(e) AS INTEGER) + CASE WHEN u < e - floor(e) THEN 1 ELSE 0 END AS n_copies FROM w)
      |SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS epoch
      |FROM n WHERE n_copies > 0""".stripMargin))

  private val simBruteTopk = Q("sim_brute_topk",
    (s, dir) => Similarity.bruteTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) AS cosine
      |      FROM q CROSS JOIN n WHERE n.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** Same contract as sim_brute_topk, computed with the bounded-heap
    * aggregate instead of a rank window (the 100 TB shape: ≤k rows per
    * query cross the shuffle). Shares the brute-force oracle. */
  private val simTopkAgg = Q("sim_topk_agg",
    (s, dir) => Similarity.bruteTopKAgg(Tables.embeddings(s, dir), k = 10, stride = 20),
    simBruteTopk.oracle, bench = true)

  private val simIvfTopk = Q("sim_ivf_topk",
    (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |reps AS (
      |  SELECT label AS cell, v AS cv, nrm AS cnrm FROM (
      |    SELECT *, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn FROM n)
      |  WHERE rn = 1),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cell FROM (
      |    SELECT n.vec_id, n.v, n.nrm, reps.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(reps.cv, n.v) / (reps.cnrm * n.nrm), 6) DESC, reps.cell) AS crn
      |    FROM n CROSS JOIN reps)
      |  WHERE crn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell FROM assigned WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) AS cosine
      |      FROM q JOIN assigned a ON a.cell = q.cell WHERE a.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** DuckDB oracle for the trained-IVF paths: training is bit-deterministic
    * (candidates sorted, Lloyd means rounded to 6 dp — see
    * Similarity.kmeansCentroids), so the trained centroids interpolate into
    * the oracle as literals, exactly like the LSH planes; both engines then
    * derive norms, the round-6 argmax cell assignment (min-cell tie-break)
    * and the search identically. nProbes > 1 adds the multi-probe ranking
    * CTE (each query probes its nProbes nearest cells by centroid cosine). */
  private def ivfTrainedOracle(spark: SparkSession, dir: String, nProbes: Int): String = {
    val cents = Similarity.kmeansCentroidArrays(
      Tables.embeddings(spark, dir), nCells = 10)
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    val qCte =
      if (nProbes <= 1)
        "q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell FROM assigned WHERE vec_id % 20 = 0)"
      else
        s"""q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM assigned WHERE vec_id % 20 = 0),
           |q AS (SELECT query_id, qv, qnrm, cell FROM (
           |    SELECT q0.query_id, q0.qv, q0.qnrm, cn.cell,
           |      row_number() OVER (PARTITION BY q0.query_id
           |        ORDER BY ROUND(list_dot_product(q0.qv, cn.cv) / (q0.qnrm * cn.cnrm), 6) DESC, cn.cell) AS pr
           |    FROM q0 CROSS JOIN cn)
           |  WHERE pr <= $nProbes)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |c(cell, cv) AS (VALUES
       |  $values),
       |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
       |assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
       |    FROM n CROSS JOIN cn)
       |  WHERE crn = 1),
       |$qCte,
       |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
       |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) AS cosine
       |      FROM q JOIN assigned a ON a.cell = q.cell WHERE a.vec_id != q.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** IVF over TRAINED k-means‖ cells (Similarity.ivfTopKKmeans) — the
    * production centroid path next to the deterministic-reps sim_ivf_topk.
    * Training is bit-deterministic since round 6, so the oracle is DERIVED
    * at verify time (trained centroids as literals, like the LSH planes);
    * recall@10 vs sim_brute_topk stays asserted in OperatorsSpec and
    * recorded in NOTES.md. */
  private val simIvfKmeansTopk = Q("sim_ivf_kmeans_topk",
    (s, dir) => Similarity.ivfTopKKmeans(Tables.embeddings(s, dir),
      k = 10, stride = 20, nCells = 10),
    None, oracleFn = Some((s, dir) => ivfTrainedOracle(s, dir, nProbes = 1)))

  /** Multi-probe variant (each query probes its 3 nearest cells) — the IVF
    * recall knob; recall@10 at P=3 vs P=1 is asserted in OperatorsSpec and
    * recorded in NOTES.md. Derived oracle, like sim_ivf_kmeans_topk. */
  private val simIvfMultiprobe = Q("sim_ivf_multiprobe",
    (s, dir) => Similarity.ivfTopKKmeans(Tables.embeddings(s, dir),
      k = 10, stride = 20, nCells = 10, nProbes = 3),
    None, oracleFn = Some((s, dir) => ivfTrainedOracle(s, dir, nProbes = 3)))

  /** SemDeDup semantic dedup (Similarity.semanticDedup — Abbas et al.
    * 2023): k-means cells scope the pairwise-cosine pass (never corpus
    * all-pairs), and within a cell every vector with a higher-priority
    * near-twin (round-4 cosine ≥ 0.2) is dropped — priority is the
    * paper's keep-farthest-from-centroid rule, vec_id on ties. Training
    * is bit-deterministic, so the oracle derives at verify time with the
    * trained centroids as literals (the sim_ivf_kmeans pattern) and
    * independently re-assigns, re-pairs and re-judges dominance. */
  /** The centroid-literal assignment CTEs shared by the semantic-dedup
    * oracles: e/n/c/cn/assigned over the embeddings table, `assigned`
    * carrying (vec_id, v, nrm, cell, cell_cos). */
  private def semAssignedCtes(cents: Seq[Array[Double]]): String = {
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |c(cell, cv) AS (VALUES
      |  $values),
      |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cell, cell_cos FROM (
      |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
      |      ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) + 0.0 AS cell_cos,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
      |    FROM n CROSS JOIN cn)
      |  WHERE crn = 1)""".stripMargin
  }

  /** Dominated-vec_id subquery body over relation `rel` (the SemDeDup
    * drop rule: a same-cell near-twin farther from the centroid, vec_id
    * tie-break). */
  private def semDominatedSql(rel: String): String =
    s"""SELECT DISTINCT x.vec_id
      |  FROM $rel x JOIN $rel y
      |    ON x.cell = y.cell AND x.vec_id <> y.vec_id
      |  WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) >= 0.2
      |    AND (y.cell_cos < x.cell_cos
      |      OR (y.cell_cos = x.cell_cos AND y.vec_id < x.vec_id))""".stripMargin

  /** Trained embedding-table centroids for the semantic-dedup queries —
    * PERSISTED per (sfDir, key) as a parquet centroidsToDF artifact
    * (r12): training is bit-deterministic, so every consumer — query fn,
    * derived oracle, a later JVM (Bench after Verify) — loads the SAME
    * index instead of re-running the ~8-pass eager training loop. The
    * in-process map only saves the parquet read within one JVM. Same
    * immutable-sfDir assumption as docCentroidCache; the artifact name
    * encodes nCells (the only build parameter). */
  private val embCentroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Array[Double]]]()
  private def embCentroids(s: SparkSession, dir: String, key: String,
      frame: => DataFrame): Seq[Array[Double]] =
    embCentroidCache.computeIfAbsent((dir, key),
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, s"centroids_emb_${key}_c10", "embeddings")(
          Similarity.centroidsToDF(s,
            Similarity.kmeansCentroidArrays(frame, nCells = 10)))))

  private val dedupSemantic = Q("dedup_semantic",
    (s, dir) => Similarity.semanticDedupWith(Tables.embeddings(s, dir),
      embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
      minCosine = 0.2),
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      s"""WITH ${semAssignedCtes(cents)},
        |dropped AS (${semDominatedSql("assigned")})
        |SELECT a.vec_id, a.cell, a.cell_cos,
        |  CAST(d.vec_id IS NULL AS INTEGER) AS is_survivor
        |FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id""".stripMargin
    })

  /** Incremental SemDeDup (Similarity.semanticDedupIncremental): the
    * batch (vec_id % 7 ≠ 0) probes a persisted SURVIVOR index built from
    * the history (vec_id % 7 = 0) with centroids trained on history only
    * — history vectors are never re-scored against each other and a
    * stored twin always drops the arrival (history immutable; the
    * first-seen posture of every incremental dedup tier here).
    * Batch-internal drops use the standard dominance rule. Derived
    * oracle re-runs both stages from the centroid literals. */
  private val dedupSemanticIncr = Q("dedup_semantic_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = e.where(pmod(col("vec_id"), lit(7)) === 0)
      val cents = embCentroids(s, dir, "hist7", hist)
      Similarity.semanticDedupIncremental(
        e.where(pmod(col("vec_id"), lit(7)) =!= 0), cents,
        Similarity.semanticIndex(hist, cents, minCosine = 0.2),
        minCosine = 0.2)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "hist7",
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0))
      s"""WITH ${semAssignedCtes(cents)},
        |hist AS (SELECT * FROM assigned WHERE vec_id % 7 = 0),
        |hdrop AS (${semDominatedSql("hist")}),
        |hsurv AS (SELECT h.* FROM hist h LEFT JOIN hdrop d
        |  ON d.vec_id = h.vec_id WHERE d.vec_id IS NULL),
        |batch AS (SELECT * FROM assigned WHERE vec_id % 7 <> 0),
        |vhist AS (SELECT DISTINCT b.vec_id FROM batch b
        |  JOIN hsurv h ON b.cell = h.cell
        |  WHERE ROUND(list_dot_product(b.v, h.v) / (b.nrm * h.nrm), 4) >= 0.2),
        |bdrop AS (${semDominatedSql("batch")}),
        |drops AS (SELECT vec_id FROM vhist UNION SELECT vec_id FROM bdrop)
        |SELECT b.vec_id, b.cell, b.cell_cos,
        |  CAST(d.vec_id IS NULL AS INTEGER) AS is_survivor
        |FROM batch b LEFT JOIN drops d ON d.vec_id = b.vec_id""".stripMargin
    })

  /** Shared fixture for the incremental-IVF queries: train ONLY on history
    * (vec_id % 10 ≠ 0), persist through the centroidsToDF round-trip, then
    * assign history and the new batch against the LOADED index — no
    * retraining pass touches the batch. */
  private def ivfIncrAssignments(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val hist = e.where(pmod(col("vec_id"), lit(10)) =!= 0)
    val index = Similarity.centroidsToDF(s,
      Similarity.kmeansCentroidArrays(hist, nCells = 10))
    Similarity.ivfAssignBatch(hist, index, "history")
      .unionByName(Similarity.ivfAssignBatch(
        e.where(pmod(col("vec_id"), lit(10)) === 0), index, "batch"))
  }

  /** The assignment/drift halves of the derived oracle share these CTEs:
    * centroids trained on history interpolate as literals (deterministic
    * training, as in ivfTrainedOracle), then DuckDB re-derives the round-6
    * argmax assignment of BOTH origins against that one index. */
  private def ivfIncrAssignedCtes(spark: SparkSession, dir: String): String = {
    val cents = Similarity.kmeansCentroidArrays(
      Tables.embeddings(spark, dir).where(pmod(col("vec_id"), lit(10)) =!= 0),
      nCells = 10)
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |c(cell, cv) AS (VALUES
       |  $values),
       |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
       |assigned AS (
       |  SELECT vec_id, cell, cell_cos,
       |    CASE WHEN vec_id % 10 = 0 THEN 'batch' ELSE 'history' END AS origin
       |  FROM (
       |    SELECT n.vec_id, cn.cell,
       |      ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) + 0.0 AS cell_cos,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
       |    FROM n CROSS JOIN cn)
       |  WHERE crn = 1)""".stripMargin
  }

  /** Incremental IVF maintenance (Similarity.ivfAssignBatch): the appended
    * assignment table after a new batch lands against the persisted
    * centroid index — the ANN leg of the incremental-index family
    * (dedup_exact_incr / dedup_minhash_incr / dedup_exact_substr_incr).
    * Derived oracle, same pattern as sim_ivf_kmeans_topk. */
  private val simIvfIncr = Q("sim_ivf_incr",
    (s, dir) => ivfIncrAssignments(s, dir),
    None, oracleFn = Some { (s, dir) =>
      s"""${ivfIncrAssignedCtes(s, dir)}
         |SELECT vec_id, cell, cell_cos, origin FROM assigned""".stripMargin
    })
  // (not bench-flagged: the registered form re-trains k-means per call for
  // oracle determinism, so its wall is training-dominated — redundant with
  // sim_ivf_topk's benched assignment path and it would inflate the bench
  // total ~25% with no new plan signal)

  /** The drift gate over the same appended table
    * (Similarity.ivfDriftSignal): integral weak-share basis points per
    * origin and the retrain flag. */
  private val simIvfDrift = Q("sim_ivf_drift",
    (s, dir) => Similarity.ivfDriftSignal(ivfIncrAssignments(s, dir)),
    None, oracleFn = Some { (s, dir) =>
      s"""${ivfIncrAssignedCtes(s, dir)},
         |shares AS (
         |  SELECT origin, (sum(CASE WHEN cell_cos < 0.7 THEN 1 ELSE 0 END) * 10000)
         |      // count(*) AS weak_bp
         |  FROM assigned GROUP BY origin)
         |SELECT
         |  CAST(max(CASE WHEN origin = 'history' THEN weak_bp END) AS BIGINT) AS hist_weak_bp,
         |  CAST(max(CASE WHEN origin = 'batch' THEN weak_bp END) AS BIGINT) AS batch_weak_bp,
         |  CAST(max(CASE WHEN origin = 'batch' THEN weak_bp END)
         |    - max(CASE WHEN origin = 'history' THEN weak_bp END) AS BIGINT) AS degradation_bp,
         |  CAST(CASE WHEN max(CASE WHEN origin = 'batch' THEN weak_bp END)
         |    - max(CASE WHEN origin = 'history' THEN weak_bp END) > 500
         |    THEN 1 ELSE 0 END AS INTEGER) AS retrain
         |FROM shares""".stripMargin
    })

  private val simLshTopk = Q("sim_lsh_topk",
    (s, dir) => Similarity.lshTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 20 = 0),
        |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) AS cosine
        |      FROM q JOIN n USING (bucket) WHERE n.vec_id != q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    }, bench = true)

  /** Multi-probe LSH (own bucket + every Hamming-1 bucket per query) —
    * the deterministic ANN recall knob, oracle-checked unlike the trained
    * IVF paths. Probe list is query-side only; corpus joins by its single
    * bucket key, so no pair dedup is needed. */
  private val simLshMultiprobe = Q("sim_lsh_multiprobe",
    (s, dir) => Similarity.lshTopKMultiProbe(Tables.embeddings(s, dir),
      k = 10, stride = 20),
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 20 = 0),
        |probes AS (SELECT query_id, qv, qnrm, xor(bucket, flip) AS bucket
        |           FROM q CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip)),
        |s AS (SELECT p.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(p.qv, n.v) / (p.qnrm * n.nrm), 4) AS cosine
        |      FROM probes p JOIN n USING (bucket) WHERE n.vec_id != p.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Embedding int8 quantization stats: per-vector scale + checksum of the
    * quantized values. Quantization uses `floor(x·127/max + 0.5)` — the
    * same IEEE product floored identically in both engines (a `round()`
    * call would hit the half-boundary algorithm split found earlier). */
  private val simQuantize = Q("sim_quantize",
    (s, dir) => {
      val v = toDouble(col("embedding"))
      val maxAbs = array_max(transform(v, x => abs(x)))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        maxAbs.as("max_abs"),
        aggregate(
          transform(v, x => floor(x * lit(127.0) / maxAbs + lit(0.5)).cast("long")),
          lit(0L), (acc, q) => acc + q).as("q_checksum"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e)
      |SELECT vec_id, max_abs,
      |  CAST(list_sum(list_transform(v, x -> CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT))) AS BIGINT) AS q_checksum
      |FROM m""".stripMargin))

  /** Trained PQ codebooks for the embeddings table — persisted per sfDir
    * as a pqBooksToDF parquet artifact (the embCentroids posture): m=8
    * subspaces × ksub=16 codes over dim 64, trained once on a bounded
    * deterministic sample, loaded by query fn + derived oracle + later
    * JVMs alike. */
  private val pqBooksCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Seq[Array[Double]]]]()
  private def pqBooksFor(s: SparkSession, dir: String, key: String,
      frame: => DataFrame): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, key),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, s"pq_books_${key}_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrain(frame, m = 8, ksub = 16)))))
  private def pqBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksFor(s, dir, "all", Tables.embeddings(s, dir))

  /** Persisted all-corpus PQ code tables (VERDICT r13 #1) — the flat ADC
    * family's stored index, the posture every other expensive tier
    * already has: the corpus encodes ONCE per (data fingerprint,
    * codebooks) and every search (and every later JVM — Verify builds,
    * Bench reads warm) loads m ints per vector instead of re-running
    * the packed-min argmin aggregate over the raw vectors. At 100 TB
    * the difference is a code-table scan vs a full corpus re-encode per
    * query batch. The wide variant additionally persists the
    * one-row-per-vector array<int> layout the AdcSumL kernel reads. */
  private def pqCodesAll(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir, "pq_codes_all_m8_k16", "embeddings")(
      Similarity.pqEncode(Tables.embeddings(s, dir), pqBooks(s, dir)))
  private def pqCodesAllWide(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir, "pq_codes_all_wide_m8_k16", "embeddings")(
      Similarity.pqCodesWide(pqCodesAll(s, dir)))

  /** Shared derived-oracle CTE block for the PQ family: codebook VALUES
    * literals with self-dots, per-subspace corpus slices, and the encode
    * relation `enc(vec_id, sub, code)` — round-6 micro-L2 argmin with
    * the same (d2u, code) total order the packed-min aggregate uses. */
  private def pqCtes(books: Seq[Seq[Array[Double]]],
      srcSql: String = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"): String = {
    val values = books.zipWithIndex.flatMap { case (cs, sub) =>
      cs.zipWithIndex.map { case (c, code) =>
        s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
    }.mkString(",\n  ")
    s"""cbv(sub, code, cv) AS (VALUES
      |  $values),
      |cb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM cbv),
      |e AS ($srcSql),
      |sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 8 + 1, r.range * 8 + 8) AS xs
      |  FROM e CROSS JOIN range(0, 8) r),
      |sd AS (SELECT vec_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM sv JOIN cb USING (sub)),
      |enc AS (SELECT vec_id, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM sd)
      |  WHERE rn = 1)""".stripMargin
  }

  /** PQ encode (Similarity.pqEncode): the corpus as (vec_id, sub, code) —
    * m codes per vector against the persisted codebooks. THIS relation is
    * what a 100 TB deployment stores and searches (m bytes instead of D
    * floats per vector); the derived oracle re-runs the round-6 micro-L2
    * argmin from the codebook literals. */
  private val simPqCodes = Q("sim_pq_codes",
    (s, dir) => pqCodesAll(s, dir),
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))}
        |SELECT vec_id, sub, code FROM enc""".stripMargin
    })

  /** PQ asymmetric-distance top-k (Similarity.pqTopKAdc): queries
    * (vec_id ≡ 0 mod 20, raw vectors) search the ENCODED corpus — the
    * query expands to its exact per-(sub, code) distance LUT once, and
    * every corpus vector scores as m integer lookups + adds, never
    * touching the stored vectors. Integer micro-L2 end to end ⇒
    * hash-exact vs the DuckDB re-derivation from the same literals. */
  private val simPqTopk = Q("sim_pq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKAdc(pqCodesAll(s, dir),
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        pqBooks(s, dir), k = 10)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** PQ ADC + exact re-rank (Similarity.pqTopKRefined, the "+R"
    * refinement): the corpus-wide pass runs on CODES (ADC shortlist of
    * 50 per query), then only the |queries|×50 shortlisted vectors are
    * read back for an exact round-4 cosine top-10 — crossTopK's output
    * contract from a fraction of its vector reads. Recall vs brute is
    * measured in ProfilePq / NOTES; determinism is oracled end to end
    * from the codebook literals. */
  private val simPqRerank = Q("sim_pq_rerank",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKRefined(pqCodesAll(s, dir), e,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        pqBooks(s, dir), k = 10, shortlist = 50)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 50),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv,
        |    sqrt(list_dot_product(v, v)) AS qnrm FROM e
        |  WHERE vec_id % 20 = 0 AND list_dot_product(v, v) > 0),
        |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM sl JOIN n ON n.vec_id = sl.vec_id
        |    JOIN qn ON qn.query_id = sl.query_id),
        |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM rr WHERE rank <= 10""".stripMargin
    })

  /** EXACT Hamming near-dup pairs via pigeonhole banding
    * (Similarity.hammingNearDupPairs) — the dedup-family face of the
    * sign-bit tier, run on the CLUSTERED fixture where same-cluster
    * vectors share most of their sign pattern: 4-bit bands over the
    * 16 real sign bits give nBands = 4 > maxHamming = 3, so the banded
    * equi-join provably misses nothing and the verified result is the
    * EXACT Hamming-threshold self-join — the MinHash-banding shape with
    * a guarantee instead of a probability. The oracle brute-counts sign
    * disagreements over all pairs (560² is nothing in DuckDB; the
    * Spark side never forms that product — bands cover only the dim
    * REAL bits, because a band over the packed word's always-zero tail
    * matches every pair and quietly degenerates the join). */
  private val dedupHammingPairs = Q("dedup_hamming_pairs",
    (s, dir) =>
      Similarity.hammingNearDupPairs(Similarity.synthesizeClustered(s),
        dim = 16, maxHamming = 3, bandBits = 4),
    Some("""WITH fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(a.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM fix a JOIN fix b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, hamming FROM p WHERE hamming <= 3""".stripMargin))

  /** Incremental exact-Hamming dedup (Similarity
    * .hammingNearDupIncremental) — the stored-index twin of
    * dedup_hamming_pairs: the HISTORY code table (vec_id ≡ 0 mod 7 of
    * the fixture) is a write-once parquet artifact (16 B/vector; bands
    * re-derive from it on load — the index IS the code table); a batch
    * encodes fresh, joins its bands against the stored side plus
    * itself, and every surviving pair verifies exactly. History is
    * never re-encoded and never self-joined. Oracle brute-splits the
    * same corpus by origin. */
  private val dedupHammingIncr = Q("dedup_hamming_incr",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val hist = parquetArtifact(s, dir, "binq_codes_fixture_hist7",
        "embeddings")(Similarity.hammingCodesChecked(
        fix.where(pmod(col("vec_id"), lit(7)) === 0), dim = 16))
      Similarity.hammingNearDupIncremental(
        fix.where(pmod(col("vec_id"), lit(7)) =!= 0), hist,
        dim = 16, maxHamming = 3, bandBits = 4)
    },
    Some("""WITH fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |b AS (SELECT * FROM fix WHERE vec_id % 7 <> 0),
      |h AS (SELECT * FROM fix WHERE vec_id % 7 = 0),
      |ph AS (SELECT b.vec_id AS vec_a, h.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(b.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (h.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM b CROSS JOIN h),
      |pb AS (SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(a.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (b2.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM b a JOIN b b2 ON a.vec_id < b2.vec_id)
      |SELECT vec_a, vec_b, hamming, 'history' AS origin FROM ph WHERE hamming <= 3
      |UNION ALL
      |SELECT vec_a, vec_b, hamming, 'batch' AS origin FROM pb WHERE hamming <= 3""".stripMargin))

  /** dedup_hamming_incr through the persisted band-key bloom prefilter
    * (the dedup_minhash_incr_bloom posture): bloom-negative batch band
    * keys never reach the history join — exact, because an inner join
    * drops them anyway — so the oracle is IDENTICAL to the unfiltered
    * twin's and the pigeonhole guarantee is untouched. */
  private val dedupHammingIncrBloom = Q("dedup_hamming_incr_bloom",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val hist = parquetArtifact(s, dir, "binq_codes_fixture_hist7",
        "embeddings")(Similarity.hammingCodesChecked(
        fix.where(pmod(col("vec_id"), lit(7)) === 0), dim = 16))
      val bloom = Similarity.buildHammingBandBloom(hist, dim = 16,
        bandBits = 4, expectedItems = 1 << 12)
      Similarity.hammingNearDupIncremental(
        fix.where(pmod(col("vec_id"), lit(7)) =!= 0), hist,
        dim = 16, maxHamming = 3, bandBits = 4,
        historyBandBloom = Some(bloom))
    },
    dedupHammingIncr.oracle)

  /** Connected components over the EXACT Hamming near-dup graph — the
    * cluster face of the quantized dedup tier (dedup_clusters for
    * minhash, dedup_embedding_clusters for cosine-LSH): min-label
    * propagation over dedup_hamming_pairs' edge set labels every
    * near-dup family with its minimum vec_id. maxHamming = 1 here (the
    * bound probed before shipping: at 3 the sign families CHAIN into 2
    * super-components; at 1 the 560 vectors resolve into 7 families ≈
    * the 8 planted clusters, adjacent sign patterns merged) — the
    * pipeline pairs → components works end-to-end on 16-byte codes.
    * Oracle = the recursive-closure pattern over the brute pair set. */
  private val dedupHammingClusters = Q("dedup_hamming_clusters",
    (s, dir) => Dedup.components(
      Similarity.hammingNearDupPairs(Similarity.synthesizeClustered(s),
          dim = 16, maxHamming = 1, bandBits = 4)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster")),
    Some("""WITH RECURSIVE fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |pairs AS MATERIALIZED (SELECT vec_a, vec_b FROM (
      |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |      CAST(list_sum(list_transform(a.v,
      |        (x, i) -> CASE WHEN (x > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END))
      |        AS INTEGER) AS hamming
      |    FROM fix a JOIN fix b ON a.vec_id < b.vec_id)
      |  WHERE hamming <= 1),
      |edges AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM pairs
      |          UNION ALL SELECT vec_b, vec_a FROM pairs),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached)
      |SELECT node AS vec_id, least(node, min(reached)) AS cluster
      |FROM reach GROUP BY node""".stripMargin))

  /** Oracled recall for the flat-PQ "+R" tier — the last quantized
    * serving face without a hash-checked recall figure (binq/sq8 have
    * sim_binq_recall/sim_sq8_recall; residual/OPQ are oracled on the
    * planted fixtures): per-query overlap between the exact brute
    * top-10 and pqTopKRefined's top-10 at shortlist 200 (ProfilePq:
    * 0.768 aggregate at m8k16). Both rankings deterministic, so the
    * recall figures themselves hash-check against DuckDB's
    * re-derivation of both chains from the codebook literals. */
  private val simPqRecall = Q("sim_pq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val pq = Similarity.pqTopKRefined(pqCodesAll(s, dir), e,
          e.where(pmod(col("vec_id"), lit(20)) === 0),
          pqBooks(s, dir), k = 10, shortlist = 200)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(pq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nn
        |  WHERE vec_id % 20 = 0),
        |bbs AS (SELECT qn.query_id, nn.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN nn WHERE nn.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bbs)
        |  WHERE rank <= 10),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM qn CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 200),
        |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM sl JOIN nn ON nn.vec_id = sl.vec_id
        |    JOIN qn ON qn.query_id = sl.query_id),
        |pq AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
        |  WHERE rank <= 10),
        |hits AS (SELECT b.query_id, count(*) AS n_overlap
        |  FROM brute b JOIN pq USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
        |FROM base LEFT JOIN hits USING (query_id)""".stripMargin
    })

  /** Incremental PQ index maintenance — the code-table sibling of
    * sim_ivf_incr: codebooks train on HISTORY only (vec_id ≡ 0 mod 7)
    * and persist; the history CODE TABLE is itself a parquet artifact
    * (encoded once, never re-encoded); a new batch encodes against the
    * LOADED codebooks — one broadcast + one packed-min aggregate per
    * batch, history vectors never rescanned — and appends with its
    * origin tag. Derived oracle re-encodes every row from the
    * history-trained literals (encode is per-row, so one enc relation
    * serves both origins). */
  private val simPqIncr = Q("sim_pq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val books = pqBooksFor(s, dir, "hist7",
        e.where(pmod(col("vec_id"), lit(7)) === 0))
      val histCodes = parquetArtifact(s, dir, "pq_codes_hist7", "embeddings")(
        Similarity.pqEncode(e.where(pmod(col("vec_id"), lit(7)) === 0), books))
      histCodes.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.pqEncode(e.where(pmod(col("vec_id"), lit(7)) =!= 0), books)
            .withColumn("origin", lit("batch")))
    },
    None, oracleFn = Some { (s, dir) =>
      val books = pqBooksFor(s, dir, "hist7",
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0))
      s"""WITH ${pqCtes(books)}
        |SELECT vec_id, sub, code,
        |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
        |FROM enc""".stripMargin
    })

  /** TRAINED-OPQ index on the REAL embeddings table — the production
    * face of sim_opq_trained (which proves the quality claim on the
    * planted fixture): the rotation trains once on the bounded sample
    * and persists (centroidsToDF layout — row index as `cell`), the
    * ROTATED code table persists (the pq_codes_all posture), and the
    * search is plain ADC over stored codes with rotated queries. On
    * this near-uniform corpus the rotation is ~recall-neutral
    * (ProfileQuant sf0.1: plain 0.162 vs OPQ 0.174 — the covariance is
    * already ~isotropic); the point here is the
    * operating pipeline: rotate → encode once → search codes, all
    * artifacts write-once, oracle re-derives rotation + encode + ADC
    * from the persisted literals end to end. */
  private def opqEmbR(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir + "#opqrot",
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "opq_rot_emb_m8", "embeddings")(
          Similarity.centroidsToDF(s,
            Similarity.opqTrainRotation(Tables.embeddings(s, dir), m = 8)))))
  private def opqEmbRotated(s: SparkSession, dir: String): DataFrame =
    Similarity.rotateEmbeddings(Tables.embeddings(s, dir), opqEmbR(s, dir))
  private def opqEmbBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksFor(s, dir, "opqrot", opqEmbRotated(s, dir))
  private val simOpqTopk = Q("sim_opq_topk",
    (s, dir) => {
      // WIDE layout (bit-identical to narrow, same oracle): one stored
      // array<int> row per vector and one adc_sum_l per pair — the
      // narrow twin's per-(query, vec) re-aggregation is the measured
      // sf1 bottleneck (85 s narrow vs ~32 s wide, NOTES r14)
      val codesWide = parquetArtifact(s, dir, "pq_codes_opqrot_wide_m8_k16",
        "embeddings")(Similarity.pqCodesWide(
        Similarity.pqEncode(opqEmbRotated(s, dir), opqEmbBooks(s, dir))))
      Similarity.pqTopKAdcWide(codesWide,
        opqEmbRotated(s, dir).where(pmod(col("vec_id"), lit(20)) === 0),
        opqEmbBooks(s, dir), k = 10)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |${pqCtes(opqEmbBooks(s, dir), "SELECT vec_id, v FROM rot")},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Incremental OPQ maintenance — the rotated-code sibling of
    * sim_pq_incr: rotation AND codebooks train on HISTORY only
    * (vec_id ≡ 0 mod 7) and persist; the history ROTATED code table is
    * a write-once artifact; a new batch rotates + encodes against the
    * LOADED artifacts and appends origin-tagged — history vectors never
    * rescanned, the rotation never retrained per batch. Derived oracle
    * re-rotates and re-encodes every row from the history-trained
    * literals. */
  private def opqHistR(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir + "#opqrot_hist7",
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "opq_rot_hist7_m8", "embeddings")(
          Similarity.centroidsToDF(s,
            Similarity.opqTrainRotation(
              Tables.embeddings(s, dir)
                .where(pmod(col("vec_id"), lit(7)) === 0), m = 8)))))
  private val simOpqIncr = Q("sim_opq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val r = opqHistR(s, dir)
      def rot(df: DataFrame): DataFrame = Similarity.rotateEmbeddings(df, r)
      val books = pqBooksFor(s, dir, "opqrot_hist7",
        rot(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      val histCodes = parquetArtifact(s, dir, "opq_codes_hist7_m8_k16",
        "embeddings")(
        Similarity.pqEncode(rot(e.where(pmod(col("vec_id"), lit(7)) === 0)), books))
      histCodes.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.pqEncode(rot(e.where(pmod(col("vec_id"), lit(7)) =!= 0)), books)
            .withColumn("origin", lit("batch")))
    },
    None, oracleFn = Some { (s, dir) =>
      val r = opqHistR(s, dir)
      val books = pqBooksFor(s, dir, "opqrot_hist7",
        Similarity.rotateEmbeddings(
          Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0), r))
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(r)}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(x.rv, e0.v0) ORDER BY x.i) AS v
        |  FROM e0 CROSS JOIN rm x GROUP BY e0.vec_id),
        |${pqCtes(books, "SELECT vec_id, v FROM rot")}
        |SELECT vec_id, sub, code,
        |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
        |FROM enc""".stripMargin
    })

  /** Oracle-gated recall for the OPQ serving tier (VERDICT r14 #2) — the
    * last quantized serving face without a hash-checked recall figure
    * (pq/binq/sq8 have sim_*_recall rows; the OPQ number lived only in
    * ProfileQuant): per-query overlap between the exact brute top-10
    * over the RAW embeddings and sim_opq_topk's ADC top-10 over the
    * PERSISTED rotated code artifact (rotated queries, stored codes —
    * the serving face itself, no rerank). Both rankings deterministic,
    * so the recall figures hash-check against DuckDB's re-derivation of
    * both chains from the rotation + codebook literals. On this
    * near-uniform corpus the figure is low by construction (~0.17,
    * ProfileQuant — 16-byte codes over 64 near-isotropic dims); the
    * contract is that the figure is ORACLED, not that it is high — the
    * quality claim lives on the planted fixture (sim_opq_trained). */
  private val simOpqRecall = Q("sim_opq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesWide = parquetArtifact(s, dir, "pq_codes_opqrot_wide_m8_k16",
        "embeddings")(Similarity.pqCodesWide(
        Similarity.pqEncode(opqEmbRotated(s, dir), opqEmbBooks(s, dir))))
      val opq = Similarity.pqTopKAdcWide(codesWide,
          opqEmbRotated(s, dir).where(pmod(col("vec_id"), lit(20)) === 0),
          opqEmbBooks(s, dir), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(opq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |${pqCtes(opqEmbBooks(s, dir), "SELECT vec_id, v FROM rot")},
        |nn AS (SELECT vec_id, v0 AS v, sqrt(list_dot_product(v0, v0)) AS nrm
        |  FROM e0 WHERE list_dot_product(v0, v0) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nn
        |  WHERE vec_id % 20 = 0),
        |bbs AS (SELECT qn.query_id, nn.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN nn WHERE nn.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bbs)
        |  WHERE rank <= 10),
        |q AS (SELECT vec_id AS query_id, v AS rqv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |opq AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 10),
        |hits AS (SELECT b.query_id, count(*) AS n_overlap
        |  FROM brute b JOIN opq USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
        |FROM base LEFT JOIN hits USING (query_id)""".stripMargin
    })

  /** IVF-PQ composition (Similarity.ivfPqTopK): cell-probed ADC — the
    * corpus is cell-assigned against the persisted embedding centroids
    * AND PQ-encoded against the persisted codebooks; a query probes its
    * 3 nearest cells and scores only those cells' CODES. Both pruning
    * structures are loaded artifacts; the derived oracle re-runs
    * assignment, probe ranking and ADC from the two literal sets. */
  private val simIvfpqTopk = Q("sim_ivfpq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(e,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
        pqBooks(s, dir), k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |c2(cell, w) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 3),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN asgn a ON a.vec_id = enc.vec_id
        |    JOIN pb ON pb.cell = a.cell
        |    JOIN lut l ON l.query_id = pb.query_id
        |      AND l.sub = enc.sub AND l.code = enc.code
        |  WHERE enc.vec_id <> pb.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** IVF cell-balance audit — the hot-key audit the other bucketed
    * families already have (Dedup.oversizedBuckets for MinHash bands,
    * oversizedJoinKeys for ER blocks): per cell of the PERSISTED index,
    * the member count, its share in basis points, and a hot flag at
    * 3× the even share — a skewed cell is a hot partition at 100 TB
    * (every probe of it scans outsize data), and the audit reads the
    * same assignment relation the searches use. Integral arithmetic ⇒
    * hash-exact; derived oracle re-assigns from the centroid
    * literals. */
  private val simIvfBalance = Q("sim_ivf_balance",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val counts = Similarity.kmeansAssignWith(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("cell"), col("n"),
          // integral div BY CONSTRUCTION (the file's `div` convention):
          // double-divide + cast truncates, which only equals the
          // oracle's floor `//` while IEEE rounding never lands just
          // above an integer boundary (ADVICE r13)
          expr("n * 10000 div total").as("share_bp"),
          (col("n") * lit(cents.size.toLong) > lit(3L) * col("total"))
            .as("hot"))
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |cnt AS (SELECT cell, count(*) AS n FROM asgn GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
        |SELECT cell, CAST(n AS BIGINT) AS n,
        |  CAST(n * 10000 // total AS BIGINT) AS share_bp,
        |  n * ${cents.size} > 3 * total AS hot
        |FROM cnt, t""".stripMargin
    })

  /** FILTERED ANN against the persisted index — the production pattern
    * where a metadata predicate (here label = 1) composes with the
    * TRAINED index instead of forcing a rebuild: the SAME persisted
    * "all"-corpus centroids serve the filtered search, the predicate
    * lands on the (stored) assignment rows before the cell equi-join,
    * and queries probe exactly as in the unfiltered path. At 100 TB
    * this is a parquet filter on the assignment table — pushdown-
    * friendly, index untouched. Derived oracle from the same centroid
    * literals with the label predicate in the assigned CTE. */
  private val simIvfFiltered = Q("sim_ivf_filtered",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.crossTopKIvf(e.where(col("label") === 1),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10,
        embCentroids(s, dir, "all", e), nProbes = 2)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn WHERE n.label = 1)
        |  WHERE crn = 1),
        |q AS (SELECT query_id, qv, qnrm, cell FROM (
        |    SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qnrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.cv) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 2),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN assigned a ON a.cell = q.cell),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Binary (sign-bit) code table (Similarity.binqEncode, exploded to
    * (vec_id, w_idx, word) rows — the storable relation): each BIGINT
    * word packs 32 sign bits, dim/8 bytes per vector instead of 4·dim
    * float bytes. The oracle re-derives every word as the sum of
    * 2^((i−1) mod 32) over the word's strictly-positive dims — pinning
    * the exact bit layout, not just a checksum. */
  private val simBinqCodes = Q("sim_binq_codes",
    (s, dir) => Similarity.binqEncode(Tables.embeddings(s, dir))
      .select(col("vec_id"), posexplode(col("bw")))
      .select(col("vec_id"), col("pos").cast("int").as("w_idx"),
        col("col").as("word")),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT vec_id,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM e)
      |SELECT vec_id, CAST((i - 1) // 32 AS INTEGER) AS w_idx,
      |  CAST(sum(CASE WHEN x > 0 THEN 1::BIGINT << ((i - 1) % 32)
      |           ELSE 0::BIGINT END) AS BIGINT) AS word
      |FROM x GROUP BY 1, 2""".stripMargin))

  /** Hamming top-k over the sign-bit codes (Similarity.binqTopK): the
    * whole corpus-wide pass reads 16-byte codes and scores each pair as
    * two xor+POPCNTs (native hamming_l, whole-stage codegen) — never a
    * stored vector, never a dim-wide dot. Fully DETERMINISTIC with no
    * trained input, so unlike the PQ/IVF tiers the oracle is static SQL:
    * DuckDB recounts sign disagreements from the raw vectors (the
    * identity the packing preserves) and the ranking hash-matches. */
  private val simBinqTopk = Q("sim_binq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.binqTopK(Similarity.binqEncode(e),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY hamming, vec_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank,
      |  vec_id AS neighbor_id, hamming
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** Hamming shortlist + exact re-rank (Similarity.binqTopKRefined): the
    * binary tier's "+R" — the corpus pass runs on codes (shortlist 50),
    * then only |queries|×50 vectors are read back for an exact round-4
    * cosine top-10 (crossTopK's contract). Static oracle end to end. */
  private val simBinqRerank = Q("sim_binq_rerank",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.binqTopKRefined(Similarity.binqEncode(e), e,
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10, shortlist = 50)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |sl AS (SELECT query_id, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS rank FROM s)
      |  WHERE rank <= 50),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv,
      |    sqrt(list_dot_product(v, v)) AS qnrm FROM e
      |  WHERE vec_id % 20 = 0 AND list_dot_product(v, v) > 0),
      |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM sl JOIN n ON n.vec_id = sl.vec_id
      |    JOIN qn ON qn.query_id = sl.query_id),
      |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM rr WHERE rank <= 10""".stripMargin))

  /** ORACLED recall measurement — the binary tier's quality as a
    * hash-checked OUTPUT, not a NOTES claim: per query, the overlap
    * between the exact brute top-10 and the Hamming-shortlist(200) +
    * exact-rerank top-10. Both rankings are deterministic, so their
    * intersection is too — DuckDB re-derives both chains and must agree
    * on every per-query recall figure. (ProfileQuant's aggregate
    * recall@10 = mean of recall_bp/10⁴ over queries.) */
  private val simBinqRecall = Q("sim_binq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val binq = Similarity.binqTopKRefined(Similarity.binqEncode(e), e, qs,
          k = 10, shortlist = 200)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(binq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          // integral div by construction, matching the oracle's floor
          // `//` (ADVICE r13 — truncation==floor held only by IEEE luck)
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      |  WHERE vec_id % 20 = 0),
      |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
      |  WHERE rank <= 10),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |hs AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |sl AS (SELECT query_id, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS rank FROM hs)
      |  WHERE rank <= 200),
      |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM sl JOIN n ON n.vec_id = sl.vec_id
      |    JOIN qn ON qn.query_id = sl.query_id),
      |binq AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
      |  WHERE rank <= 10),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN binq USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin))

  /** Int8 scalar-quantization top-k (Similarity.sq8Encode + sq8TopK): the
    * stored row is dim int8 codes + two scale doubles (~4× scan shrink,
    * the faiss SQ8 layout); the approximate cosine dequantizes the exact
    * integer code dot with the per-vector scales — every factor
    * bit-deterministic, so the static oracle re-quantizes from the raw
    * vectors and hash-matches. */
  private val simSq8Topk = Q("sim_sq8_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.sq8TopK(Similarity.sq8Encode(e),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs,
      |    sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |c AS (SELECT vec_id,
      |    list_transform(v, x -> floor(x * 127.0 / max_abs + 0.5)) AS q8,
      |    max_abs, nrm FROM m),
      |q AS (SELECT vec_id AS query_id, q8 AS qq8, max_abs AS qmax,
      |    nrm AS qnrm FROM c WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, c.vec_id,
      |    ROUND(list_dot_product(q.qq8, c.q8) * q.qmax * c.max_abs
      |      / (16129.0 * q.qnrm * c.nrm), 6) + 0.0 AS score
      |  FROM q CROSS JOIN c WHERE c.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, vec_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank,
      |  vec_id AS neighbor_id, score
      |FROM r WHERE rank <= 10""".stripMargin))

  /** Oracled recall for the int8 tier (the sim_binq_recall pattern):
    * per-query overlap between the exact brute top-10 and the
    * sq8 dequantized-cosine top-10 — hash-checks the tier's near-exact
    * claim (ProfileQuant: 0.98 aggregate) instead of noting it. */
  private val simSq8Recall = Q("sim_sq8_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val sq8 = Similarity.sq8TopK(Similarity.sq8Encode(e),
          e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(sq8, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          // integral div by construction, matching the oracle's floor
          // `//` (ADVICE r13 — truncation==floor held only by IEEE luck)
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      |  WHERE vec_id % 20 = 0),
      |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
      |  WHERE rank <= 10),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs,
      |    sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |c AS (SELECT vec_id,
      |    list_transform(v, x -> floor(x * 127.0 / max_abs + 0.5)) AS q8,
      |    max_abs, nrm FROM m),
      |q8q AS (SELECT vec_id AS query_id, q8 AS qq8, max_abs AS qmax,
      |    nrm AS qnrm FROM c WHERE vec_id % 20 = 0),
      |ss AS (SELECT q.query_id, c.vec_id,
      |    ROUND(list_dot_product(q.qq8, c.q8) * q.qmax * c.max_abs
      |      / (16129.0 * q.qnrm * c.nrm), 6) + 0.0 AS score
      |  FROM q8q q CROSS JOIN c WHERE c.vec_id <> q.query_id),
      |sq8 AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id) AS rank FROM ss)
      |  WHERE rank <= 10),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN sq8 USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin))

  /** Incremental binary-code index maintenance (VERDICT r13 #4) — the
    * sign-bit sibling of sim_pq_incr: the HISTORY code table (vec_id ≡ 0
    * mod 7) is a write-once parquet artifact (encoded once, never
    * re-encoded — and with no trained input the binq tier needs no
    * codebook artifact at all); a new batch encodes fresh and appends
    * with its origin tag, history vectors never rescanned. Output is the
    * exploded storable relation (the sim_binq_codes layout) so the
    * static oracle pins every word of both origins bit-for-bit. */
  private val simBinqIncr = Q("sim_binq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = parquetArtifact(s, dir, "binq_codes_hist7", "embeddings")(
        Similarity.binqEncode(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      hist.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.binqEncode(e.where(pmod(col("vec_id"), lit(7)) =!= 0))
            .withColumn("origin", lit("batch")))
        .select(col("vec_id"), posexplode(col("bw")), col("origin"))
        .select(col("vec_id"), col("pos").cast("int").as("w_idx"),
          col("col").as("word"), col("origin"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT vec_id,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM e)
      |SELECT vec_id, CAST((i - 1) // 32 AS INTEGER) AS w_idx,
      |  CAST(sum(CASE WHEN x > 0 THEN 1::BIGINT << ((i - 1) % 32)
      |           ELSE 0::BIGINT END) AS BIGINT) AS word,
      |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
      |FROM x GROUP BY 1, 2""".stripMargin))

  /** Incremental int8 scalar-quantization index maintenance — the sq8
    * sibling: history codes persist once (per-vector scales ride the
    * stored row, so dequantization needs no global artifact either),
    * batches append origin-tagged. Exploded to (vec_id, d_idx, code,
    * max_abs, origin) so the oracle pins every code and scale. */
  private val simSq8Incr = Q("sim_sq8_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = parquetArtifact(s, dir, "sq8_codes_hist7", "embeddings")(
        Similarity.sq8Encode(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      hist.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.sq8Encode(e.where(pmod(col("vec_id"), lit(7)) =!= 0))
            .withColumn("origin", lit("batch")))
        .select(col("vec_id"), posexplode(col("q8")), col("max_abs"),
          col("origin"))
        .select(col("vec_id"), col("pos").cast("int").as("d_idx"),
          col("col").as("code"), col("max_abs"), col("origin"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |x AS (SELECT vec_id, max_abs,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM m)
      |SELECT vec_id, CAST(i - 1 AS INTEGER) AS d_idx,
      |  CAST(floor(x * 127.0 / max_abs + 0.5) AS INTEGER) AS code,
      |  max_abs,
      |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
      |FROM x""".stripMargin))

  /** Trained artifacts for the CLUSTERED fixture (VERDICT r13 #2) —
    * deterministic AND data-independent (the fixture is closed-form in
    * vec_id), so per-JVM memoization suffices; no on-disk artifact for
    * a 560-row corpus. ksub = 8 on purpose: with 8 planted clusters,
    * raw PQ's 8 codes per subspace get consumed by the 8 cluster
    * projections (no intra-cluster detail left), while residual codes
    * spend all 8 on local detail — the configuration where the
    * residual claim is starkest (ProfileQuant: raw 0.225 vs residual
    * 0.918 recall@10). */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def fixCents(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("cents", _ =>
      Similarity.kmeansCentroidArrays(Similarity.synthesizeClustered(s),
        nCells = 8)).asInstanceOf[Seq[Array[Double]]]
  private def fixRawBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("raw", _ =>
      Similarity.pqTrain(Similarity.synthesizeClustered(s), m = 8, ksub = 8))
      .asInstanceOf[Seq[Seq[Array[Double]]]]
  private def fixResBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("res", _ =>
      Similarity.pqTrainResidual(Similarity.synthesizeClustered(s),
        fixCents(s), m = 8, ksub = 8)).asInstanceOf[Seq[Seq[Array[Double]]]]

  /** Residual IVF-PQ beats raw IVF-PQ at EQUAL code budget — proven on
    * the planted clustered corpus and ORACLE-CHECKED (VERDICT r13 #2):
    * the testdata's embeddings are near-uniform (centroids ≈ origin, so
    * residual ≈ raw there — the honest caveat NOTES r13 recorded); this
    * query runs both searches on [[Similarity.synthesizeClustered]]
    * (8 real clusters, dyadic-exact, re-derivable in SQL from
    * `range()`), same m=8/ksub=8/nProbes=2 budget, and emits per-query
    * recall vs the exact brute top-10 for BOTH tiers — the separation
    * (mean raw_bp ≈ 2250 vs resid_bp ≈ 9180) is IN the hashed output,
    * the sim_binq_recall pattern. The oracle re-derives the corpus, the
    * brute ground truth, and both quantized pipelines from the trained
    * literals end to end. */
  private val simResidualGain = Q("sim_residual_gain",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val fq = fix.where(pmod(col("vec_id"), lit(20)) === 0)
      val cents = fixCents(s)
      val brute = Similarity.bruteTopK(fix, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val raw = Similarity.ivfPqTopK(fix, fq, cents, fixRawBooks(s),
          k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      val res = Similarity.ivfPqResidualTopK(
          Similarity.ivfPqResidualEncode(fix, cents, fixResBooks(s)),
          fq, cents, fixResBooks(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(raw, "raw_overlap"), Seq("query_id"), "left")
        .join(overlap(res, "resid_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("raw_overlap"), lit(0L)).as("raw_overlap"),
          coalesce(col("resid_overlap"), lit(0L)).as("resid_overlap"),
          expr("coalesce(raw_overlap, 0) * 10000 div n_brute").as("raw_bp"),
          expr("coalesce(resid_overlap, 0) * 10000 div n_brute").as("resid_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      def bookValues(books: Seq[Seq[Array[Double]]]): String =
        books.zipWithIndex.flatMap { case (cs, sub) =>
          cs.zipWithIndex.map { case (c, code) =>
            s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
        }.mkString(",\n  ")
      val centValues = fixCents(s).zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH fix AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
        |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
        |  FROM range(0, 560) r),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM fix),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |c2(cell, w) AS (VALUES
        |  $centValues),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 2),
        |rb(sub, code, cv) AS (VALUES
        |  ${bookValues(fixRawBooks(s))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rb),
        |sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM fix CROSS JOIN range(0, 8) r),
        |sd AS (SELECT vec_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sv JOIN rcb USING (sub)),
        |renc AS (SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM sd)
        |  WHERE rn = 1),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM qn CROSS JOIN range(0, 8) r),
        |rlut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN rcb USING (sub)),
        |rsc AS (SELECT l.query_id, renc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM renc JOIN asgn a ON a.vec_id = renc.vec_id
        |    JOIN pb ON pb.cell = a.cell
        |    JOIN rlut l ON l.query_id = pb.query_id
        |      AND l.sub = renc.sub AND l.code = renc.code
        |  WHERE renc.vec_id <> pb.query_id
        |  GROUP BY 1, 2),
        |rtop AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM rsc)
        |  WHERE rank <= 10),
        |sb(sub, code, cv) AS (VALUES
        |  ${bookValues(fixResBooks(s))}),
        |scb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM sb),
        |resid AS (SELECT n.vec_id, a.cell,
        |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
        |  FROM n JOIN asgn a ON a.vec_id = n.vec_id
        |    JOIN cn ON cn.cell = a.cell),
        |rsv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM resid CROSS JOIN range(0, 8) r),
        |rsd AS (SELECT vec_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM rsv JOIN scb USING (sub)),
        |senc AS (SELECT vec_id, cell, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM rsd)
        |  WHERE rn = 1),
        |qres AS (SELECT pb.query_id, pb.cell,
        |    list_transform(q.qv, (x, i) -> x - cn.w[i]) AS rqv
        |  FROM pb JOIN qn q ON q.query_id = pb.query_id
        |    JOIN cn ON cn.cell = pb.cell),
        |sqs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM qres CROSS JOIN range(0, 8) r),
        |slut AS (SELECT query_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sqs JOIN scb USING (sub)),
        |ssc AS (SELECT l.query_id, senc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM senc JOIN slut l ON l.cell = senc.cell
        |      AND l.sub = senc.sub AND l.code = senc.code
        |  WHERE senc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |stop AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM ssc)
        |  WHERE rank <= 10),
        |hr AS (SELECT b.query_id, count(*) AS raw_overlap
        |  FROM brute b JOIN rtop USING (query_id, neighbor_id) GROUP BY 1),
        |hs AS (SELECT b.query_id, count(*) AS resid_overlap
        |  FROM brute b JOIN stop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hr.raw_overlap, 0) AS BIGINT) AS raw_overlap,
        |  CAST(coalesce(hs.resid_overlap, 0) AS BIGINT) AS resid_overlap,
        |  CAST(coalesce(hr.raw_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS raw_bp,
        |  CAST(coalesce(hs.resid_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS resid_bp
        |FROM base LEFT JOIN hr USING (query_id) LEFT JOIN hs USING (query_id)""".stripMargin
    })

  /** OPQ fixture frames + trained books (VERDICT r13 #8, Ge et al.
    * 2013): the corpus is H·z — an axis-aligned anisotropic latent z
    * ([[Similarity.synthesizeAniso]]) SMEARED across every dimension by
    * the self-inverse scaled Hadamard rotation H₁₆/4, so identity-split
    * PQ sees 8 mutually-correlated subspaces while the OPQ rotation
    * (here H itself — on this corpus the latent basis IS the optimal
    * rotation, the deterministic stand-in for OPQ's trained R) recovers
    * z exactly and re-aligns the code budget with the data axes. All
    * arithmetic is dyadic-exact (H entries ±1/4), so corpus, rotation
    * and both searches re-derive in SQL. */
  private def opqCorpus(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(Similarity.synthesizeAniso(s),
      Similarity.hadamard16)
  private def opqUnrot(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(opqCorpus(s), Similarity.hadamard16)
  private def opqPlainBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_plain", _ =>
      Similarity.pqTrain(opqCorpus(s), m = 8, ksub = 16))
      .asInstanceOf[Seq[Seq[Array[Double]]]]
  private def opqRotBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_rot", _ =>
      Similarity.pqTrain(opqUnrot(s), m = 8, ksub = 16))
      .asInstanceOf[Seq[Seq[Array[Double]]]]

  /** Shared oracle fragments for the OPQ family: codebook / rotation-
    * matrix VALUES literals and the per-tier flat-ADC pipeline (dsub=2,
    * m=8, k=10, queries = vec_id % 20 == 0) over a named source CTE. */
  private def opqBookValues(books: Seq[Seq[Array[Double]]]): String =
    books.zipWithIndex.flatMap { case (cs, sub) =>
      cs.zipWithIndex.map { case (c, code) =>
        s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
    }.mkString(",\n  ")
  private def opqMatValues(m: Seq[Array[Double]]): String =
    m.zipWithIndex.map { case (r, i) =>
      s"($i, ${r.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
  private def opqAdcTier(tag: String, src: String, cbRel: String): String =
    s"""${tag}sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
      |  FROM $src CROSS JOIN range(0, 8) r),
      |${tag}sd AS (SELECT vec_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}sv JOIN $cbRel USING (sub)),
      |${tag}enc AS (SELECT vec_id, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM ${tag}sd)
      |  WHERE rn = 1),
      |${tag}qs AS (SELECT vec_id AS query_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
      |  FROM $src CROSS JOIN range(0, 8) r WHERE vec_id % 20 = 0),
      |${tag}lut AS (SELECT query_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}qs JOIN $cbRel USING (sub)),
      |${tag}sc AS (SELECT l.query_id, ${tag}enc.vec_id,
      |    CAST(sum(l.d2u) AS BIGINT) AS d2u
      |  FROM ${tag}enc JOIN ${tag}lut l USING (sub, code)
      |  WHERE ${tag}enc.vec_id <> l.query_id
      |  GROUP BY 1, 2),
      |${tag}top AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY d2u, vec_id) AS rank FROM ${tag}sc)
      |  WHERE rank <= 10)""".stripMargin

  /** OPQ rotation beats identity-split PQ at equal code budget on the
    * smeared-latent corpus — ORACLE-CHECKED recall pair (the
    * sim_residual_gain pattern): plain PQ quantizes H·z directly
    * (correlated subspaces, codes misallocated), the OPQ path rotates
    * by H first (recovering the axis-aligned latent, every subspace
    * independent) and searches rotated queries against rotated codes —
    * legal because the orthonormal rotation preserves every dot product
    * BIT-EXACTLY here (H entries ±1/4 on dyadic inputs). Both recalls
    * ride in the hashed output (ProfileQuant: plain 0.496, OPQ 0.811
    * @ m=8 ksub=16). The oracle re-derives latent, rotation, ground
    * truth and both ADC pipelines from the trained literals. */
  private val simOpqGain = Q("sim_opq_gain",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val unrot = opqUnrot(s)
      val cq = corpus.where(pmod(col("vec_id"), lit(20)) === 0)
      val uq = unrot.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val plain = Similarity.pqTopKAdc(
          Similarity.pqEncode(corpus, opqPlainBooks(s)), cq,
          opqPlainBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val opq = Similarity.pqTopKAdc(
          Similarity.pqEncode(unrot, opqRotBooks(s)), uq,
          opqRotBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(plain, "pq_overlap"), Seq("query_id"), "left")
        .join(overlap(opq, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("pq_overlap"), lit(0L)).as("pq_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(pq_overlap, 0) * 10000 div n_brute").as("pq_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      val bookValues = opqBookValues _
      val hValues = opqMatValues(Similarity.hadamard16)
      val adcTier = opqAdcTier _
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  $hValues),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |unrot AS (SELECT c.vec_id,
        |    list(list_dot_product(h.rv, c.v) ORDER BY h.i) AS v
        |  FROM corpus c CROSS JOIN hm h GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |pbk(sub, code, cv) AS (VALUES
        |  ${bookValues(opqPlainBooks(s))}),
        |pcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM pbk),
        |obk(sub, code, cv) AS (VALUES
        |  ${bookValues(opqRotBooks(s))}),
        |ocb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM obk),
        |${adcTier("p", "corpus", "pcb")},
        |${adcTier("o", "unrot", "ocb")},
        |hp AS (SELECT b.query_id, count(*) AS pq_overlap
        |  FROM brute b JOIN ptop USING (query_id, neighbor_id) GROUP BY 1),
        |ho AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hp.pq_overlap, 0) AS BIGINT) AS pq_overlap,
        |  CAST(coalesce(ho.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hp.pq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS pq_bp,
        |  CAST(coalesce(ho.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hp USING (query_id) LEFT JOIN ho USING (query_id)""".stripMargin
    })

  /** TRAINED OPQ — the full parametric solution (Ge et al. 2013 §4):
    * [[Similarity.opqTrainRotation]] eigen-decomposes the corpus second
    * moment (deterministic cyclic Jacobi on the bounded sample) and
    * allocates eigen-directions to subspaces by greedy log-eigenvalue
    * balancing; unlike sim_opq_gain the latent basis is NOT given — the
    * rotation is learned from data and must rediscover it (ProfileQuant:
    * trained 0.796 vs known-basis 0.811 vs plain 0.496 recall@10). The
    * rotation matrix interpolates into the oracle as literals (the
    * trained-centroid posture), rotated values are index-order dots of
    * identical doubles in both engines, and the whole recall pair is
    * hash-checked. Output: the sim_opq_gain contract with opq_* =
    * trained-rotation figures. */
  private def opqTrainedR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opq_trained_r", _ =>
      Similarity.opqTrainRotation(opqCorpus(s), m = 8))
      .asInstanceOf[Seq[Array[Double]]]
  private def opqTrainedBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_trained_books", _ =>
      Similarity.pqTrain(
        Similarity.rotateEmbeddings(opqCorpus(s), opqTrainedR(s)),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  private val simOpqTrained = Q("sim_opq_trained",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val rotT = Similarity.rotateEmbeddings(corpus, opqTrainedR(s))
      val cq = corpus.where(pmod(col("vec_id"), lit(20)) === 0)
      val tq = rotT.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val plain = Similarity.pqTopKAdc(
          Similarity.pqEncode(corpus, opqPlainBooks(s)), cq,
          opqPlainBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val trained = Similarity.pqTopKAdc(
          Similarity.pqEncode(rotT, opqTrainedBooks(s)), tq,
          opqTrainedBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(plain, "pq_overlap"), Seq("query_id"), "left")
        .join(overlap(trained, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("pq_overlap"), lit(0L)).as("pq_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(pq_overlap, 0) * 10000 div n_brute").as("pq_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  ${opqMatValues(Similarity.hadamard16)}),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |tm(i, rv) AS (VALUES
        |  ${opqMatValues(opqTrainedR(s))}),
        |rott AS (SELECT c.vec_id,
        |    list(list_dot_product(t.rv, c.v) ORDER BY t.i) AS v
        |  FROM corpus c CROSS JOIN tm t GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |pbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqPlainBooks(s))}),
        |pcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM pbk),
        |tbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqTrainedBooks(s))}),
        |tcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM tbk),
        |${opqAdcTier("p", "corpus", "pcb")},
        |${opqAdcTier("t", "rott", "tcb")},
        |hp AS (SELECT b.query_id, count(*) AS pq_overlap
        |  FROM brute b JOIN ptop USING (query_id, neighbor_id) GROUP BY 1),
        |ht AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN ttop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hp.pq_overlap, 0) AS BIGINT) AS pq_overlap,
        |  CAST(coalesce(ht.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hp.pq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS pq_bp,
        |  CAST(coalesce(ht.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hp USING (query_id) LEFT JOIN ht USING (query_id)""".stripMargin
    })

  /** Residual-IVF ADC tier over a named source CTE — the oracle fragment
    * for the COMPOSED quantized layouts (VERDICT r14 #1): assignment
    * (round-6 cosine desc, min-cell tie-break), whole-vector residual,
    * dsub-wide encode (m=8; dsub 2 on the dim-16 fixtures, 8 on the
    * dim-64 table), nProbes probed cells
    * per query (vec_id ≡ 0 mod 20), one exact LUT per probed cell from
    * the query's own residual, ADC sum, top-10 by (d2u, vec_id). The
    * caller supplies the source relation plus codebook (`cbRel`: sub,
    * code, cv, cc) and centroid (`cnRel`: cell, w, cnrm) relations. */
  private def opqResidTier(tag: String, src: String, cbRel: String,
      cnRel: String, nProbes: Int, dsub: Int = 2): String =
    s"""${tag}vn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM $src),
      |${tag}asgn AS (SELECT vec_id, cell FROM (
      |    SELECT n.vec_id, cn.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
      |    FROM ${tag}vn n CROSS JOIN $cnRel cn)
      |  WHERE crn = 1),
      |${tag}resid AS (SELECT n.vec_id, a.cell,
      |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
      |  FROM ${tag}vn n JOIN ${tag}asgn a ON a.vec_id = n.vec_id
      |    JOIN $cnRel cn ON cn.cell = a.cell),
      |${tag}sv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(rv, r.range * $dsub + 1, r.range * $dsub + $dsub) AS xs
      |  FROM ${tag}resid CROSS JOIN range(0, 8) r),
      |${tag}sd AS (SELECT vec_id, cell, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}sv JOIN $cbRel USING (sub)),
      |${tag}enc AS (SELECT vec_id, cell, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM ${tag}sd)
      |  WHERE rn = 1),
      |${tag}pb AS (SELECT query_id, cell FROM (
      |    SELECT n.vec_id AS query_id, cn.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
      |    FROM ${tag}vn n CROSS JOIN $cnRel cn WHERE n.vec_id % 20 = 0)
      |  WHERE pr <= $nProbes),
      |${tag}qres AS (SELECT pb.query_id, pb.cell,
      |    list_transform(q.v, (x, i) -> x - cn.w[i]) AS rqv
      |  FROM ${tag}pb pb JOIN ${tag}vn q ON q.vec_id = pb.query_id
      |    JOIN $cnRel cn ON cn.cell = pb.cell),
      |${tag}qs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(rqv, r.range * $dsub + 1, r.range * $dsub + $dsub) AS xs
      |  FROM ${tag}qres CROSS JOIN range(0, 8) r),
      |${tag}lut AS (SELECT query_id, cell, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}qs JOIN $cbRel USING (sub)),
      |${tag}sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
      |  FROM ${tag}enc enc JOIN ${tag}lut l ON l.cell = enc.cell
      |      AND l.sub = enc.sub AND l.code = enc.code
      |  WHERE enc.vec_id <> l.query_id
      |  GROUP BY 1, 2),
      |${tag}top AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY d2u, vec_id) AS rank FROM ${tag}sc)
      |  WHERE rank <= 10)""".stripMargin

  /** Trained pieces for the COMPOSED OPQ ∘ residual-IVF-PQ gain pair on
    * the smeared aniso fixture: both tiers train their own cells (8 — the
    * probe sweep in ProfileOpqIvfPq: at 8 cells the rotation wins, resid
    * 0.807 vs opq∘resid 0.832 recall@10, both above flat trained-OPQ's
    * 0.796) and their own residual codebooks; the OPQ tier trains in the
    * ROTATED space (the FAISS OPQ-pretransform order). */
  private def opqIvfCentsU(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivf_cents_u", _ =>
      Similarity.kmeansCentroidArrays(opqCorpus(s), nCells = 8))
      .asInstanceOf[Seq[Array[Double]]]
  private def opqIvfBooksU(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivf_books_u", _ =>
      Similarity.pqTrainResidual(opqCorpus(s), opqIvfCentsU(s),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  private def opqIvfRotC(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(opqCorpus(s), opqTrainedR(s))
  private def opqIvfCentsR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivf_cents_r", _ =>
      Similarity.kmeansCentroidArrays(opqIvfRotC(s), nCells = 8))
      .asInstanceOf[Seq[Array[Double]]]
  private def opqIvfBooksR(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivf_books_r", _ =>
      Similarity.pqTrainResidual(opqIvfRotC(s), opqIvfCentsR(s),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  private def centValues(cents: Seq[Array[Double]]): String =
    cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")

  /** OPQ composed with residual IVF-PQ beats the unrotated residual tier
    * at equal code budget on the smeared-latent corpus — ORACLE-CHECKED
    * recall pair (VERDICT r14 #1, the sim_residual_gain pattern) over the
    * complete FAISS production layout (Similarity.opqIvfPqEncodeWide /
    * opqIvfPqTopKWide): rotate by the TRAINED Jacobi rotation, cell-assign
    * the rotated vector, PQ-encode the rotated residual, search with one
    * exact per-probed-cell LUT from the rotated query's residual. Both
    * code tables are persisted WIDE artifacts; both searches read stored
    * codes only. ProfileOpqIvfPq at 8 cells / 2 probes: resid 0.807,
    * opq∘resid 0.832 recall@10 (flat trained OPQ: 0.796) — the residual
    * tier already absorbs most of the anisotropy the rotation targets
    * (centroids capture the low-rank structure), so the composition's
    * gain is real but modest, exactly FAISS's guidance for OPQ over
    * IVFADC. The oracle re-derives latent, rotation, both centroid sets,
    * both codebook sets, both full search chains and both recalls from
    * the trained literals. */
  private val simOpqIvfpq = Q("sim_opq_ivfpq",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesU = parquetArtifact(s, dir, "opqivf_codes_u_wide_m8_k16_c8",
        "embeddings")(Similarity.pqCodesWide(
        Similarity.ivfPqResidualEncode(corpus, opqIvfCentsU(s),
          opqIvfBooksU(s)), Seq("cell")))
      val resid = Similarity.ivfPqResidualTopKWide(codesU,
          corpus.where(pmod(col("vec_id"), lit(20)) === 0),
          opqIvfCentsU(s), opqIvfBooksU(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      val codesR = parquetArtifact(s, dir, "opqivf_codes_r_wide_m8_k16_c8",
        "embeddings")(Similarity.opqIvfPqEncodeWide(corpus, opqTrainedR(s),
        opqIvfCentsR(s), opqIvfBooksR(s)))
      val opq = Similarity.opqIvfPqTopKWide(codesR,
          corpus.where(pmod(col("vec_id"), lit(20)) === 0), opqTrainedR(s),
          opqIvfCentsR(s), opqIvfBooksR(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(resid, "resid_overlap"), Seq("query_id"), "left")
        .join(overlap(opq, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("resid_overlap"), lit(0L)).as("resid_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(resid_overlap, 0) * 10000 div n_brute").as("resid_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  ${opqMatValues(Similarity.hadamard16)}),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |tm(i, rv) AS (VALUES
        |  ${opqMatValues(opqTrainedR(s))}),
        |rott AS (SELECT c.vec_id,
        |    list(list_dot_product(t.rv, c.v) ORDER BY t.i) AS v
        |  FROM corpus c CROSS JOIN tm t GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |ubk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfBooksU(s))}),
        |ucb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM ubk),
        |uc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfCentsU(s))}),
        |ucn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM uc2),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfBooksR(s))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfCentsR(s))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("u", "corpus", "ucb", "ucn", nProbes = 2)},
        |${opqResidTier("o", "rott", "rcb", "rcn", nProbes = 2)},
        |hu AS (SELECT b.query_id, count(*) AS resid_overlap
        |  FROM brute b JOIN utop USING (query_id, neighbor_id) GROUP BY 1),
        |ho AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hu.resid_overlap, 0) AS BIGINT) AS resid_overlap,
        |  CAST(coalesce(ho.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hu.resid_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS resid_bp,
        |  CAST(coalesce(ho.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hu USING (query_id) LEFT JOIN ho USING (query_id)""".stripMargin
    })

  /** Production face of the composed layout on the REAL embeddings
    * table — the full FAISS `OPQ8,IVF10,PQ8` chain over persisted
    * artifacts only: the trained rotation (opq_rot_emb_m8), centroids
    * trained in the ROTATED space (centroids_emb_opqrot_c10), residual
    * codebooks trained on rotated residuals (pq_books_opqrot_resid),
    * and the write-once wide code table — the search never touches a
    * raw corpus vector and scans ~nProbes/10 of the 8-byte-code rows.
    * Derived oracle re-runs rotate → assign → residual-encode → probe →
    * per-cell LUT ADC from the three literal sets. */
  private def opqEmbResidCents(s: SparkSession, dir: String): Seq[Array[Double]] =
    embCentroids(s, dir, "opqrot", opqEmbRotated(s, dir))
  private def opqEmbResidBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, "opqrot_resid"),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, "pq_books_opqrot_resid_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrainResidual(opqEmbRotated(s, dir),
              opqEmbResidCents(s, dir), m = 8, ksub = 16)))))
  private val simOpqIvfpqTopk = Q("sim_opq_ivfpq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val codesWide = parquetArtifact(s, dir,
        "opq_ivfpq_resid_codes_wide_m8_k16_c10", "embeddings")(
        Similarity.opqIvfPqEncodeWide(e, opqEmbR(s, dir),
          opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir)))
      Similarity.opqIvfPqTopKWide(codesWide,
        e.where(pmod(col("vec_id"), lit(20)) === 0), opqEmbR(s, dir),
        opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir),
        k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqEmbResidBooks(s, dir))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqEmbResidCents(s, dir))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("o", "rot", "rcb", "rcn", nProbes = 3, dsub = 8)},
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM osc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Residual-trained PQ codebooks (pq_books_resid artifact): trained on
    * v − c(cell) against the persisted embedding centroids — shares the
    * pqBooksCache/parquetArtifact posture of the raw-vector books. */
  private def pqResidBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, "resid"),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, "pq_books_resid_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrainResidual(Tables.embeddings(s, dir),
              embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
              m = 8, ksub = 16)))))

  /** Residual IVF-PQ search (Similarity.ivfPqResidualTopK) — the complete
    * FAISS IVFADC layout: the stored code table is (vec_id, cell, sub,
    * code) over RESIDUALS v − c(cell) (a persisted artifact, encoded
    * once), queries probe 3 of the 10 persisted cells and ADC-score with
    * one exact LUT PER PROBED CELL from their own residual. The derived
    * oracle re-runs assignment, residuals, encode, probe ranking and ADC
    * from the two literal sets (centroids + residual codebooks). */
  private val simIvfpqResidual = Q("sim_ivfpq_residual",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val books = pqResidBooks(s, dir)
      val codes = parquetArtifact(s, dir, "ivfpq_resid_codes_m8_k16_c10",
        "embeddings")(Similarity.ivfPqResidualEncode(e, cents, books))
      Similarity.ivfPqResidualTopK(codes,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, books, k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val books = pqResidBooks(s, dir)
      val bookValues = books.zipWithIndex.flatMap { case (cs, sub) =>
        cs.zipWithIndex.map { case (c, code) =>
          s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
      }.mkString(",\n  ")
      val centValues = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH cbv(sub, code, cv) AS (VALUES
        |  $bookValues),
        |cb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM cbv),
        |c2(cell, w) AS (VALUES
        |  $centValues),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |resid AS (SELECT n.vec_id, a.cell,
        |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
        |  FROM n JOIN asgn a ON a.vec_id = n.vec_id
        |    JOIN cn ON cn.cell = a.cell),
        |sv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM resid CROSS JOIN range(0, 8) r),
        |sd AS (SELECT vec_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sv JOIN cb USING (sub)),
        |enc AS (SELECT vec_id, cell, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM sd)
        |  WHERE rn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 3),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qres AS (SELECT pb.query_id, pb.cell,
        |    list_transform(q.qv, (x, i) -> x - cn.w[i]) AS rqv
        |  FROM pb JOIN q ON q.query_id = pb.query_id
        |    JOIN cn ON cn.cell = pb.cell),
        |qs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM qres CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l ON l.cell = enc.cell
        |      AND l.sub = enc.sub AND l.code = enc.code
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** WIDE-layout twin of sim_pq_topk (Similarity.pqCodesWide +
    * pqTopKAdcWide): one array<int> code row per vector, the query LUT
    * flattened to a broadcast array, and each pair scored by ONE native
    * adc_sum_l (m loads+adds) — no per-(query, vec) re-aggregation of m
    * joined rows, which is what dominates the narrow search at sf1
    * (NOTES r13 measurements). Bit-identical results ⇒ the SAME derived
    * oracle as the narrow twin. */
  private val simPqTopkWide = Q("sim_pq_topk_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKAdcWide(pqCodesAllWide(s, dir),
        e.where(pmod(col("vec_id"), lit(20)) === 0), pqBooks(s, dir), k = 10)
    },
    None, oracleFn = simPqTopk.oracleFn, bench = true)

  /** WIDE-layout twin of sim_ivfpq_topk (Similarity.ivfPqTopKWide):
    * raw-vector LUTs are cell-independent, so each query ships one
    * broadcast array; the probe relation restricts the cell equi-join
    * and each surviving pair costs one adc_sum_l. Same derived oracle —
    * bit-identical ranking. */
  private val simIvfpqTopkWide = Q("sim_ivfpq_topk_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      // the stored (vec_id, cell, codes) row persists once (r14 — the
      // sim_ivfpq_residual posture): searches read the artifact, never
      // re-assign or re-encode the corpus
      val codesWide = parquetArtifact(s, dir, "ivfpq_codes_wide_m8_k16_c10",
        "embeddings")(Similarity.ivfPqEncodeWide(e, cents, pqBooks(s, dir)))
      Similarity.ivfPqTopKWideFrom(codesWide,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, pqBooks(s, dir), k = 10, nProbes = 3)
    },
    None, oracleFn = simIvfpqTopk.oracleFn)

  /** WIDE-layout twin of sim_ivfpq_residual: the stored code artifact
    * reshapes to (vec_id, cell, codes) once at load, per-probe LUTs
    * collapse to broadcast arrays, and the cell equi-join + one
    * adc_sum_l per pair replaces the narrow join + 8-rows-per-pair
    * aggregate. Same derived oracle — results are bit-identical. */
  private val simIvfpqResidualWide = Q("sim_ivfpq_residual_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val books = pqResidBooks(s, dir)
      val codes = parquetArtifact(s, dir, "ivfpq_resid_codes_m8_k16_c10",
        "embeddings")(Similarity.ivfPqResidualEncode(e, cents, books))
      Similarity.ivfPqResidualTopKWide(
        Similarity.pqCodesWide(codes, Seq("cell")),
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, books, k = 10, nProbes = 3)
    },
    None, oracleFn = simIvfpqResidual.oracleFn)

  private val multimodalFeatures = Q("multimodal_features",
    (s, dir) => Multimodal.features(Tables.documents(s, dir)),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  sha256(text) AS sha256,
      |  CAST(doc_id % 320 + 64 AS INTEGER) AS width,
      |  CAST(doc_id % 240 + 48 AS INTEGER) AS height,
      |  CAST((doc_id % 320 + 64) * (doc_id % 240 + 48) AS INTEGER) AS n_pixels
      |FROM documents""".stripMargin))

  /** Frame sampling over binary payloads (multimodal scale path: sample
    * before decode). The oracle uses character substrings — valid because
    * the corpus is verified ASCII, so char offsets ≡ byte offsets; the
    * Spark side genuinely slices binary. */
  private val multimodalFrames = Q("multimodal_frames",
    (s, dir) => Multimodal.sampleFrames(Tables.documents(s, dir), frameBytes = 64, stride = 2)
      .select(col("asset_id"), col("frame_idx"),
        octet_length(col("frame_bytes")).as("n_bytes"), col("frame_sha")),
    Some("""WITH a AS (SELECT doc_id AS asset_id, text,
      |    CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS n_frames
      |  FROM documents),
      |f AS (SELECT asset_id, text,
      |    unnest(generate_series(0, greatest(n_frames - 1, 0), 2)) AS frame_idx
      |  FROM a WHERE n_frames > 0)
      |SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(len(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS INTEGER) AS n_bytes,
      |  sha256(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_sha
      |FROM f""".stripMargin))

  /** REAL image decode round-trip (Multimodal.synthesizeImages →
    * decodeImageFeatures): javax.imageio PNG encode, a repartition so the
    * binary payloads genuinely cross an exchange, then PNG decode + raster
    * luma sums + 2× nearest-neighbor resample. The synthetic pixels are
    * closed-form in doc_id (two gray bands a = id mod 256 / b = 7·id mod
    * 256; width even, height a multiple of 4), so DuckDB re-derives every
    * decoded feature arithmetically: any encoder/decoder disagreement,
    * channel-order slip, or resample off-by-one breaks the hash. */
  private val multimodalDecode = Q("multimodal_decode",
    (s, dir) => Multimodal.decodeImageFeatures(s,
      Multimodal.synthesizeImages(s, Tables.documents(s, dir))
        .repartition(col("asset_id")))
      .toDF(),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(2 * (4 + doc_id % 30) AS BIGINT) AS width,
      |  CAST(4 * (2 + (doc_id * 3) % 10) AS BIGINT) AS height,
      |  CAST(2 * (4 + doc_id % 30) * (2 * (2 + (doc_id * 3) % 10))
      |    * ((doc_id % 256) + ((doc_id * 7) % 256)) AS BIGINT) AS sum_luma,
      |  CAST(4 + doc_id % 30 AS BIGINT) AS rs_width,
      |  CAST(2 * (2 + (doc_id * 3) % 10) AS BIGINT) AS rs_height,
      |  CAST((4 + doc_id % 30) * (2 + (doc_id * 3) % 10)
      |    * ((doc_id % 256) + ((doc_id * 7) % 256)) AS BIGINT) AS rs_sum_luma
      |FROM documents""".stripMargin), bench = true)

  /** REAL lossy-codec decode (Multimodal.synthesizeJpegs →
    * decodeJpegFeatures): javax.imageio JFIF/JPEG encode at default
    * quality, an exchange, then JPEG decode + luma sums + 2× resample.
    * The planted rasters are UNIFORM — the one input the DCT pipeline
    * reproduces exactly (flat block ⇒ DC-only; quant step divides the
    * scaled DC; exhaustive roundtrip spec) — so even a lossy codec sits
    * under a closed-form arithmetic oracle: any quantization drift,
    * chroma-subsample slip, or MCU-padding bug breaks the hash. */
  private val multimodalJpeg = Q("multimodal_jpeg",
    (s, dir) => Multimodal.decodeJpegFeatures(s,
      Multimodal.synthesizeJpegs(s, Tables.documents(s, dir))
        .repartition(col("asset_id")))
      .toDF(),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(8 + doc_id % 41 AS BIGINT) AS width,
      |  CAST(6 + (doc_id * 3) % 29 AS BIGINT) AS height,
      |  CAST((8 + doc_id % 41) * (6 + (doc_id * 3) % 29) * (doc_id % 256) AS BIGINT) AS sum_luma,
      |  CAST((8 + doc_id % 41) // 2 AS BIGINT) AS rs_width,
      |  CAST((6 + (doc_id * 3) % 29) // 2 AS BIGINT) AS rs_height,
      |  CAST(((8 + doc_id % 41) // 2) * ((6 + (doc_id * 3) % 29) // 2) * (doc_id % 256) AS BIGINT) AS rs_sum_luma
      |FROM documents""".stripMargin))

  /** REAL audio decode (Multimodal.synthesizeAudio/decodeAudioFeatures —
    * VERDICT r8 missing #5): RIFF/WAVE PCM16 square-wave files cross an
    * exchange, are container-parsed by javax.sound AudioSystem, and the
    * decoded samples feed integer signal features. Rate/length/amplitude/
    * period are closed-form in doc_id, so the oracle re-derives every
    * feature arithmetically (sum|s| = n·amp, Σs² = n·amp², crossings =
    * ⌊(n−1)/period⌋): a header mis-parse, endianness slip, or sample
    * off-by-one breaks the hash. */
  private val multimodalAudio = Q("multimodal_audio",
    (s, dir) => Multimodal.decodeAudioFeatures(s,
      Multimodal.synthesizeAudio(s, Tables.documents(s, dir))
        .repartition(col("asset_id")))
      .toDF(),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(400 + (doc_id % 50) * 16 AS BIGINT) AS n_samples,
      |  CAST((400 + (doc_id % 50) * 16) * (1000 + (doc_id % 100) * 250) AS BIGINT) AS sum_abs,
      |  CAST(1000 + (doc_id % 100) * 250 AS BIGINT) AS max_abs,
      |  CAST((400 + (doc_id % 50) * 16 - 1) // (2 + doc_id % 9) AS BIGINT) AS n_zero_cross,
      |  CAST((400 + (doc_id % 50) * 16) * (1000 + (doc_id % 100) * 250)
      |    * (1000 + (doc_id % 100) * 250) AS BIGINT) AS sum_sq
      |FROM documents""".stripMargin))

  /** REAL arbitrary-size resize (Multimodal.resizeImages): PNG decode →
    * nearest-neighbor resample to 16×12 (src(⌊x·w/tw⌋, ⌊y·h/th⌋)) → real
    * PNG re-encode. The two-band sources make the resampled luma
    * closed-form: per target row, the source row index decides band a or
    * b — the oracle recomputes the row mapping integer-exactly, so a
    * rounding slip in the resampler breaks the hash. */
  private val multimodalResize = Q("multimodal_resize",
    (s, dir) => Multimodal.resizeImages(s,
      Multimodal.synthesizeImages(s, Tables.documents(s, dir))
        .repartition(col("asset_id")), targetW = 16, targetH = 12)
      .toDF().drop("png"),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(2 * (4 + doc_id % 30) AS BIGINT) AS src_width,
      |  CAST(4 * (2 + (doc_id * 3) % 10) AS BIGINT) AS src_height,
      |  CAST(16 AS BIGINT) AS width,
      |  CAST(12 AS BIGINT) AS height,
      |  CAST(16 * list_sum(list_transform(range(0, 12), ty ->
      |    CASE WHEN (ty * (4 * (2 + (doc_id * 3) % 10))) // 12
      |           < (4 * (2 + (doc_id * 3) % 10)) // 2
      |         THEN doc_id % 256 ELSE (doc_id * 7) % 256 END)) AS BIGINT) AS sum_luma
      |FROM documents""".stripMargin))

  /** REAL multi-frame video decode (Multimodal.synthesizeVideos /
    * decodeVideoFeatures): animated-GIF containers — the JRE's one true
    * multi-frame codec (LZW, palettes, frame sequencing) — cross an
    * exchange and are frame-walked by the GIF reader; uniform-gray frames
    * make every decoded feature closed-form in (doc_id, frame index), so
    * the oracle re-derives frame counts and luma totals arithmetically.
    * With this, image (PNG), audio (WAV) and video (GIF) decode are all
    * REAL codec paths; only richer codecs (JPEG-video etc.) remain behind
    * StubCodec for lack of container libs. */
  private val multimodalVideo = Q("multimodal_video",
    (s, dir) => Multimodal.decodeVideoFeatures(s,
      Multimodal.synthesizeVideos(s, Tables.documents(s, dir))
        .repartition(col("asset_id")))
      .toDF(),
    Some("""SELECT doc_id AS asset_id,
      |  CAST(2 + doc_id % 6 AS BIGINT) AS n_frames,
      |  CAST(8 + doc_id % 16 AS BIGINT) AS width,
      |  CAST(8 + (doc_id * 3) % 12 AS BIGINT) AS height,
      |  CAST((8 + doc_id % 16) * (8 + (doc_id * 3) % 12)
      |    * list_sum(list_transform(range(0, 2 + doc_id % 6),
      |        k -> (5 * doc_id + 17 * k) % 256)) AS BIGINT) AS sum_luma_all,
      |  CAST((5 * doc_id) % 256 AS BIGINT) AS first_mean_luma,
      |  CAST((5 * doc_id + 17 * (1 + doc_id % 6)) % 256 AS BIGINT) AS last_mean_luma
      |FROM documents""".stripMargin))

  /** Multimodal near-dup (Multimodal.nearDupImages): banded perceptual
    * block-hash over REALLY decoded pixels — encode → exchange → decode →
    * 4×4 block-mean signature → per-row nibble band keys → capped band
    * self-join → exact Σ|Δblock| verify. The synthesized rasters make
    * every block mean a closed-form function of doc_id (top rows a =
    * id mod 256, bottom rows b = 7·id mod 256), so the oracle re-derives
    * candidates and distances arithmetically: band keys reduce to the a/b
    * nibbles and Σ|Δblock| to 8·|Δa| + 8·|Δb|. */
  private val dedupMultimodal = Q("dedup_multimodal",
    (s, dir) => Multimodal.nearDupImages(s,
      Multimodal.synthesizeImages(s, Tables.documents(s, dir))
        .repartition(col("asset_id"))),
    Some("""WITH f AS (SELECT doc_id, doc_id % 256 AS a, (doc_id * 7) % 256 AS b
      |  FROM documents),
      |bk AS (SELECT doc_id, a, b, band,
      |    CASE WHEN band < 2 THEN a // 16 ELSE b // 16 END AS key
      |  FROM f CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bands),
      |capped AS (SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
      |    FROM bk) WHERE rn <= 1000),
      |cand AS (SELECT DISTINCT x.doc_id AS asset_a, y.doc_id AS asset_b
      |  FROM capped x JOIN capped y
      |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
      |SELECT c.asset_a, c.asset_b,
      |  CAST(8 * abs(fa.a - fb.a) + 8 * abs(fa.b - fb.b) AS BIGINT) AS sum_abs_diff
      |FROM cand c
      |JOIN f fa ON fa.doc_id = c.asset_a
      |JOIN f fb ON fb.doc_id = c.asset_b
      |WHERE 8 * abs(fa.a - fb.a) + 8 * abs(fa.b - fb.b) <= 128""".stripMargin),
    bench = true)

  /** Incremental multimodal near-dup: the batch (doc_id % 7 ≠ 0) probes a
    * persisted signature index of the history (doc_id % 7 = 0) — history
    * pixels never re-decoded, history-vs-history pairs never recomputed.
    * Oracle re-derives both sides from the closed-form block means (top
    * rows = doc_id mod 256, bottom rows = 7·doc_id mod 256), so Spark's
    * imageio decode chain and DuckDB's arithmetic must agree pair-for-pair
    * — two independent derivations, like dedup_minhash_incr. */
  private val dedupMultimodalIncr = Q("dedup_multimodal_incr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // persist: stands in for the parquet-backed index load — without it
      // the inline synthesize→decode chain would run once per reference
      // (the operator references the index twice; see its scaladoc).
      val histIdx = Multimodal.signatureIndex(s,
        Multimodal.synthesizeImages(s, docs.where(pmod(col("doc_id"), lit(7)) === 0))
          .repartition(col("asset_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Multimodal.nearDupImagesIncremental(s,
        Multimodal.synthesizeImages(s, docs.where(pmod(col("doc_id"), lit(7)) =!= 0))
          .repartition(col("asset_id")),
        histIdx)
    },
    Some("""WITH f AS (SELECT doc_id, doc_id % 256 AS a, (doc_id * 7) % 256 AS b
      |  FROM documents),
      |bands AS (SELECT unnest(generate_series(0, 3)) AS band),
      |bk_n AS (SELECT doc_id, a, b, band,
      |    CASE WHEN band < 2 THEN a // 16 ELSE b // 16 END AS key
      |  FROM f CROSS JOIN bands WHERE doc_id % 7 <> 0),
      |bk_h AS (SELECT doc_id, a, b, band,
      |    CASE WHEN band < 2 THEN a // 16 ELSE b // 16 END AS key
      |  FROM f CROSS JOIN bands WHERE doc_id % 7 = 0),
      |capped_n AS (SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
      |    FROM bk_n) WHERE rn <= 1000),
      |capped_h AS (SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
      |    FROM bk_h) WHERE rn <= 1000),
      |cand AS (
      |  SELECT DISTINCT n.doc_id AS asset_a, h.doc_id AS asset_b, 'history' AS origin
      |  FROM capped_n n JOIN capped_h h ON n.band = h.band AND n.key = h.key
      |  UNION
      |  SELECT DISTINCT x.doc_id AS asset_a, y.doc_id AS asset_b, 'batch' AS origin
      |  FROM capped_n x JOIN capped_n y
      |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
      |SELECT c.asset_a, c.asset_b,
      |  CAST(8 * abs(fa.a - fb.a) + 8 * abs(fa.b - fb.b) AS BIGINT) AS sum_abs_diff,
      |  c.origin
      |FROM cand c
      |JOIN f fa ON fa.doc_id = c.asset_a
      |JOIN f fb ON fb.doc_id = c.asset_b
      |WHERE 8 * abs(fa.a - fb.a) + 8 * abs(fa.b - fb.b) <= 128""".stripMargin))

  /** Rows-only by design: file counts and byte totals are
    * parquet-encoder- and history-dependent — the check is "the catalog
    * lists the artifacts and never errors", not a hash. */
  private val artifactCatalogQ = Q("artifact_catalog",
    (s, dir) => artifactCatalog(s, dir), None)

  // ──────────────────────────────── registry ────────────────────────────────

  val all: Seq[Q] = Seq(
    q1PricingSummary, f1IsinFilter, f2EqFilterJson, xVariantShred,
    xVariantHetero,
    j1JoinAgg, j1StrkeyJoin, j2SemiJoin, jAntiJoin, j3ChainAgg, jAsofJoin,
    jAsofNearest, jRangeJoin,
    a1Counts, a3CollectIds, a4LastWins, a5Scalar, aSaltedAgg, aPercentiles,
    aColumnProfile, aKeySkew, jSaltedJoin,
    cNullFns, tGapfill,
    wTopkPerGroup, wTopkPlan, wRunningSum, wLagLead, wNtile, wPctRank, wFirstNth,
    aHistogram, sOrderbyLimit, cStringFns, cArrayFns, cMapFns,
    cTimeFns, cNanosEastern, oddsDomain, oddsNativeExpr, aggRollup, aggCube, aggPivot,
    aggGroupingSets, aggUnpivot, aggIncrMaintain, aggIncrDistinct,
    aOutliersMad, jScalarSubquery,
    xFlagshipFlatten, xFlagshipC4Strict, x3BranchUnion, xSetOps, seedingPipeline,
    uMergeUpsert, uScd2History, uSnapshotDiff,
    wagerBookReplay, tWindowHourly, tSessionWindows, decodeRoundtrip, fSampleBernoulli,
    s1LadderScan, c11UuidWagers, fHashSample,
    dedupExact, dedupExactNfc, dedupUrl, dedupUrlIncr, pipelineRobotsFilter,
    aHostProfile,
    dedupExactIncr, dedupExactIncrBloom, dedupMinhashIncr,
    dedupMinhashIncrBloom,
    dedupMinhashPairs, dedupClusters, dedupSurvivorQuality, dedupSimhash, dedupEmbedding,
    dedupEmbeddingLsh, dedupEmbeddingLshMp, dedupEmbeddingClusters,
    pipelineDocsPrep, pipelineDropReport, pipelineCurateFull, pipelinePackDocs,
    pipelinePackSequences, pipelinePackIds, pipelineCrawlToTrainer, pipelineTokenIds, pipelineTemperedSample,
    pipelineChunkDocs,
    pipelineClassSample, pipelineTrainSplit, pipelineGroupSplit, pipelineDatasetCard,
    pipelineDatasetCardIncr,
    textNormalize, textCompress, textStats, textBpeTokens, textBpeVocab, textBpeCompression, textLangid,
    textLangidModel, textTopTerms,
    textCollocations, textFamiliarity, textLmScore,
    textCorpusDrift, textVocab, textVocabApprox,
    textFingerprints,
    textRepetition, textContamination, textMixtureSample,
    textPiiRedact, textQualityRules, textQualityModel, erFuzzyPairs,
    erFuzzyIncr, pipelineEpochUpsample, pipelineCurriculum, graphPagerank,
    graphTriangles,
    dedupParagraphs, dedupExactSubstr,
    dedupExactSubstrIncr, dedupExactSubstrIncrBloom,
    textTfidf, textShardStats,
    textCleanLines, textLineDedup, textBoilerplate, textBoilerplateIncr,
    textBoilerplateMerge,
    pipelinePageClean, textHtmlExtract, pipelineWetClean, pipelineCrawlFrontier,
    textPhraseSearch, textPhrasePositional, textProximity, textLinkDensity,
    pipelineContentExtract,
    textBm25Topk, textBm25Indexed, textBm25Incr, textBm25Fielded, textBm25FieldedWet,
    textBm25Snippets, textBm25Pruned, textPositionalIncr, textPositionalDelta,
    textBm25FieldedIncr, textBm25FieldedIndexed, textHybridTopk, textHybridLsh,
    textHybridLsh4, textHybridIvf, textHybridTrained,
    textHybridTrainedHoldout, textHybridTrainedSweep, textMmrTopk, textMmrLocal,
    pipelineRagRetrieval, pipelineRagIvf, pipelineRagMmr,
    pipelineRagLsh, pipelineRagContexts, textBm25Prf,
    textRetrievalEval, pipelineRagEval, pipelineHardNegatives,
    pipelineContrastiveTriplets,
    eFunnelUsers, eFunnelSummary, eRetention, eSessionize, eAttribution,
    eTopPaths,
    textTokenBudget, pipelineEmbedDocs, pipelineEmbedTopk, pipelineDecontamTopk,
    pipelineDecontamLsh, pipelineTopicClusters, pipelineTopicSample,
    simCrossLshTopk, simCrossLshMp, simCrossIvfTopk,
    sketchCmsHeavyHitters, sketchQuantileHist, sketchKllQuantiles,
    sketchKllByGroup, sketchHllShards, sketchHllOverlap,
    simBruteTopk, simTopkAgg, simIvfTopk, simIvfKmeansTopk, simIvfMultiprobe,
    simIvfIncr, simIvfDrift, dedupSemantic, dedupSemanticIncr,
    simLshTopk, simLshMultiprobe, simQuantize, simPqCodes, simPqTopk,
    simPqRerank, simPqRecall, simIvfpqTopk, simPqIncr, dedupHammingPairs, dedupHammingIncr, dedupHammingIncrBloom, dedupHammingClusters,
    simIvfBalance, simIvfFiltered, simBinqCodes, simBinqTopk, simBinqRerank, simBinqRecall, simSq8Topk, simSq8Recall, simIvfpqResidual,
    simBinqIncr, simSq8Incr, simResidualGain, simOpqGain, simOpqTrained, simOpqTopk, simOpqIncr,
    simOpqRecall, simOpqIvfpq, simOpqIvfpqTopk,
    simPqTopkWide, simIvfpqResidualWide, simIvfpqTopkWide,
    multimodalFeatures, multimodalFrames, multimodalDecode, multimodalJpeg, multimodalAudio,
    multimodalVideo, multimodalResize, dedupMultimodal,
    dedupMultimodalIncr, artifactCatalogQ)

  val queries: Map[String, QueryFn] = all.map(q => q.name -> q.fn).toMap
  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
  val benchNames: Seq[String] = all.filter(_.bench).map(_.name)

  /** Oracles derived from the data at verify time (trained-centroid
    * literals). Runs Spark jobs — call once, from Verify. A failed
    * derivation degrades that query to rows-only (logged), never fails the
    * whole dump. */
  def derivedOracleSql(spark: SparkSession, dir: String): Map[String, String] =
    all.flatMap { q =>
      q.oracleFn.flatMap { f =>
        try Some(q.name -> f(spark, dir))
        catch {
          case e: Throwable =>
            System.err.println(
              s"[oracle] derived oracle for ${q.name} failed (rows-only): $e")
            None
        }
      }
    }.toMap
}
