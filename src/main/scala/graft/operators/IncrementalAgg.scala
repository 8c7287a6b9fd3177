package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a persisted, MERGEABLE per-key
  * partial-aggregate state, so a standing rollup (per-customer order stats,
  * per-source corpus stats, …) is maintained by aggregating ONLY each new
  * batch and merging — history raw data is never rescanned. This is the
  * materialized-view half of the incremental-index family the engine
  * already carries for dedup/ANN (hash, band, span, bloom, centroid,
  * signature indexes): same persist-an-artifact contract, applied to
  * aggregation.
  *
  * The state columns are chosen to be merge-closed (count/sum/min/max —
  * each combines with the same function that built it), which is exactly
  * the partial/final split Spark's own HashAggregate performs inside one
  * job, lifted across job boundaries. Derived metrics that are NOT
  * merge-closed (averages) are computed only in [[finalizeState]], from
  * merged state.
  *
  * Scale shape (100 TB): building state for a batch is one hash aggregate
  * over that batch; merging shuffles only state rows (≈ |keys| × 5 columns,
  * independent of history row count); the merge aggregate is itself
  * map-combinable. Nothing rescans or re-shuffles history data.
  */
object IncrementalAgg {

  /** Partial-aggregate state for one slice of `orders`:
    * `(key, cnt, sum_cents, min_ts, max_ts)`. Money is held as exact
    * integer cents (decimal sum ×100 → long) so merge order can never
    * perturb a float sum; timestamps as epoch seconds (merge-closed under
    * min/max, no timestamp-typed columns in any artifact). */
  def orderState(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey").as("key"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("sum_cents"),
        min(TimeFns.epochSeconds(col("o_orderdate"))).as("min_ts"),
        max(TimeFns.epochSeconds(col("o_orderdate"))).as("max_ts"))

  /** Merge any number of state frames (history artifact + new batches).
    * Associative and commutative — each column merges with its own
    * builder function — so batches can land in any order or grouping. */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("key"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_ts")).as("min_ts"),
        max(col("max_ts")).as("max_ts"))

  /** Per-key DISTINCT-count state: count distinct is the one standing
    * metric that is NOT merge-closed in exact form (merging per-batch
    * exact distinct counts over-counts shared values), so the state holds
    * a mergeable DataSketches HLL per key — ~4 KB/key independent of
    * cardinality. Register updates are max-merges, so the union of
    * per-batch sketches is bit-identical to one sketch over all rows
    * (same invariant `Sketch.hllShardSketches` pins): incremental
    * maintenance costs NO accuracy vs resketching history. */
  def distinctState(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Merge per-batch distinct states (strict: mixed lgK errors out). */
  def mergeDistinct(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("key"))
      .agg(hll_union_agg(col("sketch"), false).as("sketch"))

  def finalizeDistinct(state: DataFrame): DataFrame =
    state.select(col("key"),
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"))

  /** Render merged state for consumers: totals plus the derived (non
    * merge-closed) average, as exact integral cents. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      col("key"),
      col("cnt").as("n_orders"),
      (col("sum_cents").cast("decimal(20,0)") / 100)
        .cast("decimal(20,2)").cast("double").as("sum_total"),
      col("min_ts").as("first_ts"),
      col("max_ts").as("last_ts"),
      expr("sum_cents div cnt").as("avg_cents"))
}
