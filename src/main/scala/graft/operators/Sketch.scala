package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream, as a pure-DataFrame operator —
  * the "novel sketch" extension slot (SURVEY.md §2.10). A CMS answers
  * frequency queries over an unbounded corpus in O(depth × width) space:
  * every occurrence increments `depth` counters (one per hash row); the
  * estimate for a term is the MIN of its counters — an upper bound on the
  * true count that overshoots by ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * 100 TB posture: the sketch is a (depth·width)-row TABLE, invariant in
  * corpus size, produced by one shuffle of at most depth·width partial
  * rows per map partition (partial aggregation collapses occurrences
  * map-side). Two sketches merge by summing matching cells — the property
  * that makes CMS the standard distributed/streaming frequency structure.
  *
  * Hashing reuses the md5-based 28-bit universal family from
  * [[graft.functions.TextFns]] (`(base·Aᵢ+Bᵢ) mod P mod width`), so the
  * whole sketch is bit-identical in DuckDB and the oracle can check the
  * TABLE, not just row counts.
  */
object Sketch {

  /** CMS cells for one token column: (row, bucket, n), depth×width grid
    * (absent cells are zero). `tokens` must hold one row per occurrence. */
  def countMin(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")
    val base = TextFns.md5Base28(md5(col(tokenCol)))
    tokens
      .select(posexplode(array((0 until depth).map(i =>
        (base * lit(TextFns.minhashA(i)) + lit(TextFns.minhashB(i)))
          % lit(TextFns.MinhashPrime) % lit(width)): _*)))
      .withColumnsRenamed(Map("pos" -> "row", "col" -> "bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-estimate the frequency of each distinct probe term against a
    * sketch: min over the term's `depth` cells. Join shape: probes explode
    * to depth rows and hash-join the (tiny, broadcastable) sketch — no
    * scan of the original corpus. */
  def estimate(cms: DataFrame, probes: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame = {
    val base = TextFns.md5Base28(md5(col(termCol)))
    probes
      .select(col(termCol).as("term"), posexplode(array((0 until depth).map(i =>
        (base * lit(TextFns.minhashA(i)) + lit(TextFns.minhashB(i)))
          % lit(TextFns.MinhashPrime) % lit(width)): _*)))
      .withColumnsRenamed(Map("pos" -> "row", "col" -> "bucket"))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_count"))
  }

  /** Histogram-based quantile estimate: bucket the values into fixed-width
    * bins (one map-side-combined aggregate — the histogram is the sketch:
    * fixed memory, merges by bucket-wise sum), then walk the cumulative
    * counts to the p50/p90 bucket and report its upper edge. Error is
    * bounded by the bin width; all arithmetic is integral, so the estimate
    * is bit-identical cross-engine — unlike interpolated approx-percentile
    * sketches, whose internals differ per engine. The cumulative window
    * runs over the BUCKET table (O(bins), not O(rows)), so the global
    * ordering is safe at any input scale. */
  def histQuantiles(values: DataFrame, valueCol: String, width: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = values
      .select(floor(col(valueCol).cast("decimal(18,2)") / lit(width)).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val cum = b.withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(b.agg(sum(col("n")).cast("long").as("tot"))))
    cum.agg(
        min(when(col("cum") * 2 >= col("tot"), col("bucket"))).as("b50"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("bucket"))).as("b90"))
      .select(
        ((col("b50") + 1) * width).cast("long").as("p50_upper"),
        ((col("b90") + 1) * width).cast("long").as("p90_upper"))
  }

  /** Mergeable KLL-style quantile estimates ([[graft.plans.KllQuantilesAgg]])
    * for `valueCol`: one row, `qs ARRAY<DOUBLE>` with the estimate per
    * requested quantile, in order. The production quantile shape next to
    * [[histQuantiles]]: no value-range assumption, O(k·log(n/k)) state,
    * merges across partitions — but engine-internal, so rows-only checked
    * (the rank-error guarantee is property-tested instead). */
  def kllQuantiles(values: DataFrame, valueCol: String, k: Int,
      quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    values.agg(GraftBridge.column(
      graft.plans.KllQuantilesAgg(
        GraftBridge.expression(col(valueCol).cast("double")), k, quantiles)
        .toAggregateExpression()).as("qs"))
  }

  /** Per-group KLL quantiles — the mergeable-sketch answer to "p50/p90 per
    * key over 100 TB": one hash aggregate whose state is a fixed-size
    * sketch per group (ObjectHashAggregate with map-side partial merges),
    * never a per-group sort. Estimates carry the same published rank-error
    * bound the global [[kllQuantiles]] property-tests; pair with the exact
    * `percentile` twin (a_percentiles) when the group is small enough to
    * sort. */
  def kllQuantilesBy(values: DataFrame, byCol: String, valueCol: String,
      k: Int, quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    values.groupBy(col(byCol)).agg(GraftBridge.column(
      graft.plans.KllQuantilesAgg(
        GraftBridge.expression(col(valueCol).cast("double")), k, quantiles)
        .toAggregateExpression()).as("qs"))
  }

  /** Matching DuckDB fragment: bucket of `termSql` in hash row `i`. Kept
    * beside the Column version so the two stay in lock-step (same pattern
    * as [[TextFns.minhashNumSql]]). */
  def bucketSql(termSql: String, i: Int, width: Int): String =
    s"((${TextFns.md5Base28Sql(s"md5($termSql)")}) * ${TextFns.minhashA(i)} + " +
      s"${TextFns.minhashB(i)}) % ${TextFns.MinhashPrime} % $width"

  /** Per-shard mergeable cardinality sketches (Spark's DataSketches HLL):
    * one small BINARY per `shardCol` value — the incremental-index idea
    * applied to cardinality. Persist the frame; a later batch sketches
    * itself the same way and [[hllMergedEstimate]] over the UNION of the
    * stored frames answers "distinct across everything so far" without
    * rescanning any shard. Register updates are max-merges, so a union of
    * sketches over disjoint row sets is bit-identical to one sketch over
    * the whole — sharding costs no accuracy (SketchSpec pins estimate
    * equality, and the rank error stays the published HLL bound:
    * rsd ≈ 1.04/√2^lgK, 1.6% at the default lgK = 12). */
  def hllShardSketches(df: DataFrame, shardCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union the stored shard sketches (strict: mixed lgK is an error, not a
    * silent downgrade) and estimate the global distinct count. */
  def hllMergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col("sketch"), false)).as("n_distinct_est"))

  /** Distinct-overlap estimate between two value streams by
    * inclusion–exclusion over HLL sketches: |A∩B| ≈ |A| + |B| − |A∪B|,
    * each term one sketch estimate. The decontamination sizing tool: "how
    * many distinct n-grams does the training corpus share with the eval
    * set" over 100 TB costs two sketch scans (each persistable and
    * shardable via [[hllShardSketches]]) and NO join — run it to decide
    * whether the exact `TextAnalysis.contamination` join is worth
    * scheduling.
    *
    * Error contract (document it wherever the number is shown): each term
    * carries the HLL rsd (≈1.6% at lgK 12), so the DIFFERENCE carries an
    * absolute error on the scale of |A∪B|·rsd — fine for overlaps that are
    * a meaningful fraction of the union, meaningless for overlaps far
    * below it (the raw inclusion–exclusion difference can go negative;
    * the returned `n_intersect_est` is already clamped at 0 here).
    * Output: 1 row (n_a_est, n_b_est, n_union_est, n_intersect_est). */
  def hllOverlapEstimate(dfA: DataFrame, colA: String,
      dfB: DataFrame, colB: String, lgK: Int = 12): DataFrame = {
    val sa = dfA.agg(hll_sketch_agg(col(colA), lgK).as("ska"))
    val sb = dfB.agg(hll_sketch_agg(col(colB), lgK).as("skb"))
    sa.crossJoin(sb) // 1-row × 1-row
      .select(
        hll_sketch_estimate(col("ska")).as("n_a_est"),
        hll_sketch_estimate(col("skb")).as("n_b_est"),
        hll_sketch_estimate(hll_union(col("ska"), col("skb")))
          .as("n_union_est"))
      .withColumn("n_intersect_est",
        greatest(col("n_a_est") + col("n_b_est") - col("n_union_est"), lit(0L)))
  }
}
