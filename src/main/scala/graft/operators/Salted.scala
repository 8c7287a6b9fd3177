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
}
