package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for every probe row, attach the payload of the latest
  * snapshot row with the same keys and `ts ≤` the probe's — the canonical
  * "odds at bet time" / "price at trade time" lookup that Spark's
  * DataFrame API lacks as a primitive.
  *
  * Implemented by composition (preference tier (a), SURVEY.md §4): tag and
  * union both sides, then one `last(_, ignoreNulls)` window per key
  * ordered by (ts, side) — snapshots sort before probes at equal
  * timestamps, so `ts = probe_ts` matches inclusively. Scale shape: ONE
  * shuffle of |probes|+|snapshots| rows on the key columns and a
  * sort-based window — no range-join row explosion, no per-probe scan of
  * the snapshot history; skew follows the key distribution like any
  * windowed aggregate.
  *
  * Contract: `payload` columns ride along nullable; probes with no
  * preceding snapshot keep nulls (ASOF LEFT JOIN semantics). Snapshot
  * timestamps should be unique per key (pre-aggregate if not — with ties
  * the window takes the last in (ts, payload-order), which a plain ASOF
  * join leaves unspecified).
  */
object AsOfJoin {

  /** @param probes    left side; must contain `keys`, `tsCol`, `probeCols`
    * @param snapshots right side; must contain `keys`, `tsCol`, `payloadCols`
    * @param direction `"backward"` (latest snapshot ≤ probe ts, the
    *                  default), `"forward"` (earliest snapshot ≥ probe
    *                  ts), or `"nearest"` (whichever of the two is closer
    *                  in |ts|; ties prefer the backward match) — the three
    *                  variants of the standard as-of surface. backward and
    *                  forward are one window pass each; nearest runs both
    *                  passes over the SAME shuffle (two sorts, one
    *                  exchange) and picks per row.
    * @param tolerance max |probe ts − snapshot ts| to accept; farther
    *                  matches null out (row kept, LEFT semantics).
    *                  Requires a numeric `tsCol`. */
  def lastValueAsOf(probes: DataFrame, snapshots: DataFrame, keys: Seq[String],
      tsCol: String, probeCols: Seq[String], payloadCols: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val keyCols = keys.map(col)
    // Payloads ride as ONE struct so a single last(_, ignoreNulls) picks the
    // whole latest snapshot atomically. Per-column last() windows would
    // backfill a NULL payload field from an OLDER snapshot, stitching fields
    // from different snapshot rows — not ASOF semantics. The snapshot's own
    // ts rides in the struct for the tolerance check.
    val payloadType = StructType(
      payloadCols.map(c => snapshots.schema(c)) :+ snapshots.schema(tsCol).copy(name = "_snap_ts"))
    val p = probes.select(keyCols ++ Seq(col(tsCol), lit(1).as("_side")) ++
      probeCols.map(col) :+ lit(null).cast(payloadType).as("_payload"): _*)
    val s = snapshots.select(keyCols ++ Seq(col(tsCol), lit(0).as("_side")) ++
      probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) :+
      struct(payloadCols.map(col) :+ col(tsCol).as("_snap_ts"): _*).as("_payload"): _*)
    // Snapshots sort before probes at equal ts in BOTH directions (side
    // ascending), so ts == probe_ts matches inclusively.
    def lastOver(tsOrder: Column): Column =
      last(col("_payload"), ignoreNulls = true).over(
        Window.partitionBy(keyCols: _*)
          .orderBy(tsOrder, col("_side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val unioned = p.unionByName(s)
    val base = keyCols ++ Seq(col(tsCol), col("_side")) ++ probeCols.map(col)
    val matched = direction match {
      case d @ ("backward" | "forward") =>
        val ord = if (d == "backward") col(tsCol).asc else col(tsCol).desc
        unioned.select(base :+ lastOver(ord).as("_payload"): _*)
          .where(col("_side") === 1)
      case "nearest" =>
        val both = unioned
          .select(base :+ lastOver(col(tsCol).asc).as("_pb")
            :+ lastOver(col(tsCol).desc).as("_pf"): _*)
          .where(col("_side") === 1)
        val dBack = abs(col(tsCol) - col("_pb").getField("_snap_ts"))
        val dFwd = abs(col("_pf").getField("_snap_ts") - col(tsCol))
        both.withColumn("_payload",
            when(col("_pb").isNull, col("_pf"))
              .when(col("_pf").isNull, col("_pb"))
              .when(dFwd < dBack, col("_pf"))
              .otherwise(col("_pb"))) // tie prefers the backward match
          .drop("_pb", "_pf")
    }
    val gated = tolerance.fold(matched) { tol =>
      matched.withColumn("_payload",
        when(abs(col(tsCol) - col("_payload").getField("_snap_ts")) <= tol,
          col("_payload")))
    }
    gated.select(keyCols ++ Seq(col(tsCol)) ++ probeCols.map(col) ++
      payloadCols.map(c => col("_payload").getField(c).as(c)): _*)
  }
}
