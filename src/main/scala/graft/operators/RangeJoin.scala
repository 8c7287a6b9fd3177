package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second classic temporal join the
  * DataFrame API lacks as a scalable primitive (alongside
  * [[AsOfJoin]]): match every point `p` to the intervals with
  * `start ≤ p < end`.
  *
  * Catalyst plans a bare range predicate (no equi-key) as a broadcast
  * nested-loop or cartesian product — O(|points|·|intervals|) comparisons,
  * a non-starter at 100 TB. This operator makes the join an EQUI-join by
  * binning time (tier (a), composition): every interval is exploded to the
  * fixed-width bins it overlaps, every point maps to exactly ONE bin, and
  * the bin id becomes the shuffle key; the exact range predicate then
  * filters within the bin bucket. Because a point has a unique bin and an
  * interval appears at most once per bin, no post-join dedup is needed.
  *
  * Scale shape: shuffle volume is |points| + Σᵢ ⌈spanᵢ/binWidth⌉ rows —
  * linear, and tunable by `binWidth` (pick ≈ the median interval span so
  * the fan-out factor stays ~2; the same knob as a range-join bin hint).
  * Bin arithmetic is integral (`DIV`), never double division — µs epochs
  * exceed 2^53 territory fast enough that float quotients are a
  * correctness bug, not a style choice.
  */
object RangeJoin {

  /** Join `points` to `intervals` on `start ≤ point < end` (half-open).
    * Column names must be disjoint across the two inputs. Output: all
    * point columns + all interval columns, one row per matching pair. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = binWidth.toString
    val binned = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_bin",
        explode(sequence(expr(s"$startCol DIV $w"), expr(s"($endCol - 1) DIV $w"))))
    val p = points.withColumn("_bin", expr(s"$pointCol DIV $w"))
    p.join(binned, Seq("_bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bin")
  }

  /** [[pointInInterval]] with the bin width picked from the data: the
    * median interval span (one tiny aggregate over the interval side, the
    * same pre-pass a range-join hint asks the user to eyeball). Median ⇒
    * the typical interval explodes to ≤ 2 bins, so shuffle fan-out stays
    * ~2× regardless of the span distribution's tail; a handful of
    * outlier-wide intervals fan out more, which is the right trade. */
  def pointInIntervalAuto(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String): DataFrame = {
    val medianRow = intervals
      .where(col(endCol) > col(startCol))
      .agg(expr(s"percentile_approx($endCol - $startCol, 0.5)").cast("long"))
      .head()
    // No valid intervals ⇒ the aggregate is NULL; any width yields the
    // same (empty) join, so fall back to 1.
    val median = if (medianRow.isNullAt(0)) 1L else medianRow.getLong(0)
    pointInInterval(points, intervals, pointCol, startCol, endCol,
      math.max(median, 1L))
  }
}
