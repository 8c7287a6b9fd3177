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
    // Internal aliases are INDEX-based, the output col_name is a literal,
    // and input names are backtick-escaped before col() parses them — so
    // names with dots, quotes, or backticks profile as well as any other.
    def c0(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      val ndv =
        if (approxDistinct) approx_count_distinct(c0(c))
        else count_distinct(c0(c))
      Seq(
        coalesce(sum(when(c0(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nulls_$i"),
        ndv.as(s"__ndv_$i"),
        min(c0(c)).cast("string").as(s"__min_$i"),
        max(c0(c)).cast("string").as(s"__max_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__nulls_$i").as("n_nulls"),
        col(s"__ndv_$i").as("n_distinct"), col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    wide.select(inline(array(rows: _*)))
  }

  /** Top-N heaviest keys with their share of the table in basis points —
    * the pre-flight skew report for any join/aggregation on `key` (pair
    * with [[Salted.countSum]] as the remediation when a key crosses the
    * salting threshold).
    *
    * share_bp is integral (cnt·10000 div total) so both engines compute it
    * identically; ordering is (cnt desc, key NULLS LAST) — nulls-last
    * matches the other engine's ascending default, keeping the cut
    * deterministic cross-engine even for a nullable key. The global top-N
    * is `orderBy().limit()` — Spark plans it as TakeOrderedAndProject
    * (per-partition bounded heaps merged on the driver), NOT a global sort.
    *
    * Single scan: the grand total is summed from the per-key counts frame
    * rather than re-aggregated from the table, so both branches contain the
    * SAME scan + partial-count + exchange subtree and Spark plans a
    * ReusedExchange — the table is read and shuffled once; only the cheap
    * post-shuffle aggregates (|keys| rows) run per branch. Plan-asserted in
    * ProfilingSpec. (A rollup grouping-set total was tried first: Catalyst
    * pushes the grouping-id filters below the partial aggregate, making the
    * two exchanges differ — two full scans.) */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"))
      .orderBy(col("cnt").desc, col("key").asc_nulls_last)
      .limit(topN)
  }

  /** Robust per-group outlier flags on an INTEGER metric: median / MAD
    * (median absolute deviation) instead of mean / stddev — mean-based
    * z-scores are both float (cross-engine unstable) and themselves
    * dragged by the outliers they're meant to find. Lower medians are
    * taken as the value at sorted position `(n+1) div 2`, so everything
    * stays in exact integer arithmetic and the flags hash-check against a
    * SQL oracle. A row is an outlier when `|x − med| · 100 > k100 · MAD`
    * (k100 = 100·k, so k = 3.5 passes as 350 — no float threshold).
    * Degenerate groups where MAD = 0 (over half the values identical)
    * flag ANY deviation, the standard MAD-rule edge; callers wanting
    * leniency there should gate on `mad > 0`.
    *
    * Scale shape: two per-group rank windows (value, then |x − med|) and
    * joins against the O(groups)-row median frames — left unhinted so AQE
    * broadcasts them when small but falls back to a shuffle join if group
    * cardinality is huge; parallel across groups; a single giant group is
    * one sorted partition (same caveat as every per-group window here,
    * `curriculumBuckets` included). */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k100: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(col(groupCol))
    val medPos = expr("(n + 1) div 2") // lower median, pure integer
    // The input subtree feeds the median derivation AND the deviation
    // frame (which itself feeds the MAD derivation and the output) —
    // checkpoint the 3-column projection once so an expensive upstream
    // (tokenization, in the a_outliers_mad use) is not re-run per
    // reference; blocks are freed by the ContextCleaner when the result
    // is dropped.
    val base = df.select(col(groupCol), col(idCol),
      col(valueCol).cast("long").as("x")).localCheckpoint(false)
    val med = base
      .withColumn("rn", row_number().over(grp.orderBy(col("x"))))
      .withColumn("n", count(lit(1)).over(grp))
      .where(col("rn") === medPos)
      .select(col(groupCol), col("x").as("med"))
    val dev = base
      .join(med, groupCol)
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev
      .withColumn("rn", row_number().over(grp.orderBy(col("adev"))))
      .withColumn("n", count(lit(1)).over(grp))
      .where(col("rn") === medPos)
      .select(col(groupCol), col("adev").as("mad"))
    dev.join(mad, groupCol)
      .select(col(idCol), col(groupCol), col("x"), col("med"), col("mad"),
        (col("adev") * 100 > col("mad") * k100).cast("int").as("outlier"))
  }
}
