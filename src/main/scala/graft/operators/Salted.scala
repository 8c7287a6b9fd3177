package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building block: two-phase salted aggregation.
  *
  * A plain `groupBy(key)` on a skewed key funnels the hot key's rows into
  * one reducer. Salting splits each key into `nSalts` sub-keys for the
  * first (map-heavy) aggregation, then combines the per-salt partials —
  * the hot key's work spreads over `nSalts` tasks and the second shuffle
  * carries only |keys|×nSalts rows. Correct for any algebraic aggregate;
  * here sums/counts (decimal-exact, so the result is bit-identical to the
  * unsalted plan — which is what the DuckDB oracle computes).
  *
  * AQE's skew handling covers sort-merge *joins*; skewed *aggregations*
  * still need this pattern (or partial-agg luck), hence an explicit
  * operator.
  */
object Salted {

  /** Per-key count + decimal-exact sum of `valueCol`, salted `nSalts` ways.
    *
    * The salt is derived from row CONTENT (xxhash64 over every input
    * column), never from physical placement (`spark_partition_id`,
    * `monotonically_increasing_id`): under task/stage retry after a shuffle
    * fetch failure, recomputed rows must hash to the same salt as the
    * already-fetched partials or the two-phase aggregate double-counts /
    * drops rows — exactly the fault this skew operator exists to survive.
    * Identical rows share a salt, so spread relies on value diversity
    * within the hot key (true for any real fact table; degenerate
    * all-identical-rows input degrades to the unsalted plan, not to
    * wrong answers). */
  def countSum(df: DataFrame, key: Column, valueCol: Column, nSalts: Int): DataFrame = {
    val salted = df.select(
      key.as("key"),
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(nSalts)).as("salt"),
      valueCol.cast("decimal(18,2)").as("v"))
    salted
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      .groupBy(col("key"))
      .agg(sum(col("pn")).cast("long").as("n"),
        sum(col("pv")).cast("double").as("total"))
  }

  /** Salted inner equi-join on `key` — the REPLICATION side of the skew
    * toolkit: the fact side's hot-key rows spread over `nSalts` shuffle
    * partitions (content-derived salt, same retry-safety argument as
    * [[countSum]]), and every dim row is replicated to all `nSalts`
    * sub-keys so each fact row still meets its match exactly once. Output
    * = the plain inner join row-for-row, at nSalts× the dim side's shuffle
    * volume — the price of splitting a hot key AQE can't (skewed
    * BROADCAST-ineligible dims, non-AQE clusters, or skew introduced
    * upstream of a stage AQE has already planned).
    *
    * Prefer `broadcast(dim)` when the dim fits, and AQE's sort-merge skew
    * split when it applies (both demonstrated elsewhere in this engine);
    * this operator is the remaining corner: medium dims × hot fact keys.
    * Columns: output carries fact columns then dim columns (key once).
    *
    * Salt derivation: by default the salt hashes ALL fact columns (so a
    * task retry re-derives the same salt — no exactly-once hazard), which
    * has two caveats: (1) fully IDENTICAL duplicate fact rows all hash to
    * one salt, so a hot key composed of duplicates is NOT spread (answers
    * stay correct; the plan degrades to unsalted for that key); (2) hashing
    * wide payload columns costs per-row CPU. Pass `saltCols` to salt on a
    * caller-chosen high-diversity subset (e.g. a row id) when either bites. */
  def equiJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(nSalts >= 1, s"need nSalts >= 1, got $nSalts")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "equiJoin reserves the column name _salt; rename it on the inputs")
    val saltSrc = if (saltCols.nonEmpty) saltCols else fact.columns.toIndexedSeq
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSrc.map(col): _*), lit(nSalts)))
    val repDim = dim.withColumn("_salt",
      explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(repDim, Seq(key, "_salt")).drop("_salt")
  }
}
