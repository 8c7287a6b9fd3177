package graft.sources

import graft.Tables
import graft.functions.{OddsFns, TimeFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic nested betting-entity fixture (FIXTURES.md §B), synthesized
  * from the driver's `orders`/`lineitem`/`region` parquet so every field is a
  * pure function of those tables — which is what lets a DuckDB oracle
  * reproduce the flattened output without ever building the nest.
  *
  * Shape mirrors the reference's entity tree (SURVEY.md §1.1): one
  * sport-event per order; one market per lineitem; even line numbers carry a
  * `market_lines` array (the "lines" variant, reference `src/main.py:82`),
  * odd ones carry bare double-nested `selections` (`src/main.py:134-136`).
  * Selections are arrays-of-arrays on purpose — the lines branch reads
  * `selection[0]` (`src/main.py:120`), the no-lines branch iterates every
  * inner element (`src/main.py:135-136`), so the fixture gives branch A two
  * singleton outer groups (rows k=1,2) and branch B groups [sel1] +
  * [sel2, sel3] (rows k=1,2,3).
  *
  * Intentional null coverage (to exercise the `.get(…, default)` semantics,
  * reference `src/main.py:96-125`): `favourite` is null when
  * l_partkey %% 7 = 0; competitor-2 abbreviation is null when
  * o_orderkey %% 11 = 0.
  */
object BettingFixture {

  /** Tournament names the config "interests" filter keeps
    * (reference `src/config.py:18` / `src/mm_calls.py:83`). */
  val InterestedTournaments: Seq[String] = Seq("AMERICA", "ASIA", "EUROPE")

  private def selection(k: Int): Column = {
    val li = col("l_orderkey"); val ln = col("l_linenumber")
    struct(
      concat(lit("s"), li, lit("-"), ln, lit("-"), lit(k)).as("line_id"),
      concat(lit("Sel "), lit(k)).as("display_name"),
      lit(Seq("home", "away", "draw")(k - 1)).as("name"),
      OddsFns.ladderAt(
        pmod(col("l_partkey") * 7 + ln * 13 + lit(k * 31), lit(291)))
        .cast("int").as("odds"),
      col("l_extendedprice").cast("decimal(12,2)").cast("string").as("stake"),
      (col("l_discount") * 100).cast("decimal(8,2)").cast("string").as("value"))
  }

  private def marketLine: Column = {
    val qty = col("l_quantity").cast("int")
    struct(
      concat(lit("ml"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("id"),
      concat(lit("Line "), qty).as("name"),
      qty.cast("string").as("line"),
      when(pmod(col("l_partkey"), lit(7)) =!= 0,
        when(pmod(col("l_partkey"), lit(2)) === 0, "home").otherwise("away"))
        .as("favourite"),
      lit("points").as("type"),
      array(array(selection(1)), array(selection(2))).as("selections"))
  }

  private def market: Column = {
    val hasLines = pmod(col("l_linenumber"), lit(2)) === 0
    struct(
      concat(lit("m"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("id"),
      concat(lit("Market "), col("l_returnflag")).as("name"),
      when(pmod(col("l_linenumber"), lit(3)) === 0, "moneyline")
        .when(pmod(col("l_linenumber"), lit(3)) === 1, "spread")
        .otherwise("total").as("type"),
      when(col("l_linestatus") === "O", "open").otherwise("settled").as("status"),
      (unix_timestamp(col("l_shipdate")) * lit(1000000000L)).as("updated_at"),
      when(hasLines, array(marketLine)).as("market_lines"),
      when(!hasLines, array(array(selection(1)), array(selection(2), selection(3))))
        .as("selections"))
  }

  /** The nested `sport_events` table: one row per event, markets collected
    * into an array. The `groupBy(collect_list)` shuffle and the
    * orderkey-equi join are co-partitioned on the same key, so at scale this
    * is one exchange; in production the nested data would arrive in this
    * shape directly from the source (S2–S4). */
  /** [[sportEvents]] persisted once as nested parquet and read back — the
    * PRODUCTION shape: a frame log lands already nested (S2–S4 deliver
    * event→markets→lines trees), so consumers scan a nested table; they do
    * not re-synthesize it from relational parts per query. Keyed by the
    * source files' size+mtime so a testdata regeneration invalidates the
    * cache; the build is write-to-temp + atomic rename (safe across
    * concurrent callers), and every later call — including later JVMs —
    * is a pure parquet scan. This is bench hygiene (VERDICT r8 #4):
    * ~80% of the flagship wall was fixture synthesis, not the flatten
    * being measured. Results are bit-identical to [[sportEvents]]. */
  /** Bumped on ANY change to [[sportEvents]]'s synthesis logic — the cache
    * key folds it in, so an edited fixture can never be silently served
    * from a stale persisted copy (ADVICE r9: size+mtime of the SOURCE
    * files alone can't see logic changes). */
  private val FixtureLogicVersion = 2

  def sportEventsCached(spark: SparkSession, sfDir: String): DataFrame = this.synchronized {
    def stat(name: String): String = {
      val f = new java.io.File(s"$sfDir/$name.parquet")
      s"$name:${f.length}:${f.lastModified}"
    }
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((s"v$FixtureLogicVersion;" + sfDir +
        Seq("orders", "lineitem", "region").map(stat).mkString(";"))
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    // Rooted under the build dir, not /tmp: not shared/world-readable
    // across users, and swept by a clean build (ADVICE r9). "target/" is
    // cwd-relative, so anchor it: GRAFT_FIXTURE_CACHE_DIR overrides for
    // any launcher whose working directory is not the repo root
    // (spark-submit of the assembled jar, IDE runners) — round-10 review.
    val root = sys.env.getOrElse("GRAFT_FIXTURE_CACHE_DIR",
      new java.io.File("target/graft_fixture_cache").getAbsolutePath)
    val dir = new java.io.File(s"$root/sport_events_$key")
    if (!dir.exists()) {
      val tmp = new java.io.File(dir.getParentFile,
        s"${dir.getName}.tmp${ProcessHandle.current().pid()}")
      try {
        sportEvents(spark, sfDir).write.mode("overwrite").parquet(tmp.toString)
        if (!tmp.renameTo(dir) && !dir.exists())
          sys.error(s"fixture cache rename failed: $tmp -> $dir")
      } finally if (tmp.exists()) deleteTree(tmp) // losing racer / failed write
      // Orphan hygiene: sweep .tmp<pid> leftovers from crashed builders.
      // Live caches of OTHER keys are NOT pruned — each scale factor has
      // its own legitimate key, so "not my key" ≠ stale; superseded keys
      // (testdata regeneration, version bumps) persist until the next
      // `sbt clean` sweeps target/, bounded by one directory per
      // (sfDir, vintage) in practice.
      val staleMs = System.currentTimeMillis() - 60L * 60 * 1000
      Option(dir.getParentFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.contains(".tmp") && f.getName.startsWith("sport_events_")
          && f.lastModified() < staleMs) // never a concurrent builder's live tmp
        .foreach(deleteTree)
    }
    spark.read.parquet(dir.toString)
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }

  def sportEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)

    val markets = li
      .select(col("l_orderkey").as("ev_key"), market.as("market"))
      .groupBy("ev_key")
      .agg(collect_list(col("market")).as("markets"))

    o.join(broadcast(r), pmod(col("o_custkey"), lit(5)) === col("r_regionkey"))
      .join(markets, col("o_orderkey") === col("ev_key"))
      .select(
        col("o_orderkey").as("event_id"),
        pmod(col("o_custkey"), lit(5)).as("tournament_id"),
        col("r_name").as("tournament_name"),
        date_format(col("o_orderdate"), TimeFns.IsoUtcFormat).as("scheduled"),
        concat(lit("Order #"), col("o_orderkey")).as("display_name"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("live").as("status"),
        array(
          struct(
            concat(lit("Cust "), col("o_custkey")).as("display_name"),
            concat(lit("C"), pmod(col("o_custkey"), lit(100))).as("abbreviation"),
            lit("home").as("side")),
          struct(
            concat(lit("Opp "), pmod(col("o_orderkey"), lit(97))).as("display_name"),
            when(pmod(col("o_orderkey"), lit(11)) =!= 0,
              concat(lit("O"), pmod(col("o_orderkey"), lit(97)))).as("abbreviation"),
            lit("away").as("side"))).as("competitors"),
        col("markets"))
  }
}
