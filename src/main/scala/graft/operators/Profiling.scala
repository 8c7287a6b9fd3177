package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the ANALYZE-style statistics a 100 TB pipeline
  * runs before (and after) every expensive stage — to size shuffles, pick
  * broadcast sides, and catch skew before it becomes a straggler.
  *
  * Both operators are single-scan aggregations with map-side partials; the
  * outputs are O(columns) / O(topN) rows, so driver traffic is trivial at
  * any input size.
  */
object Profiling {

  /** Per-column profile in ONE scan: null count, exact distinct count, and
    * min/max (aggregated in the column's native type, cast to string only
    * for the uniform output schema — casting before the min/max would rank
    * numerics lexicographically).
    *
    * Output: (col_name, n_nulls, n_distinct, min_val, max_val), one row per
    * requested column, in request order.
    *
    * Scale note: multiple exact `count(DISTINCT …)` aggregates expand the
    * input |columns|+1× before the partial aggregate (Catalyst's Expand
    * plan). That is the price of exactness and is what the oracle checks;
    * at 100 TB profile with `approxDistinct = true` instead — the HLL++
    * sketch aggregates in one pass with no Expand, at ±rsd accuracy. */
  def columnStats(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "columnStats needs at least one column")
    val aggs = columns.flatMap { c =>
      val ndv =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nulls_$c"),
        ndv.as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns
      .map(c => s"'$c', `__nulls_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${columns.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Top-N heaviest keys with their share of the table in basis points —
    * the pre-flight skew report for any join/aggregation on `key` (pair
    * with [[Salted.countSum]] as the remediation when a key crosses the
    * salting threshold).
    *
    * share_bp is integral (cnt·10000 div total) so both engines compute it
    * identically; ordering is (cnt desc, key) so the cut is deterministic
    * under ties. The global top-N is `orderBy().limit()` — Spark plans it
    * as TakeOrderedAndProject (per-partition bounded heaps merged on the
    * driver), NOT a global sort, so the report costs one aggregation
    * however many distinct keys exist. */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
