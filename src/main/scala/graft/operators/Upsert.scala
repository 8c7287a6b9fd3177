package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE / CDC-apply: fold a change log (UPSERT / DELETE commands)
  * into a base table — the lakehouse table-maintenance primitive behind
  * `MERGE INTO`, expressed as a plain shuffle-once DataFrame plan.
  *
  * Semantics: per key, the latest change (by `(ordCol, tieCol)`, a total
  * order) wins; an UPSERT inserts-or-replaces the row, a DELETE removes
  * it; keys untouched by the log pass through. Equivalent SQL is a windowed
  * dedup of the log + a full outer join — which is exactly the plan here,
  * so the DuckDB oracle states the same thing.
  *
  * Scale shape: ONE hash shuffle of base ∪ latest-changes on the key (the
  * windowed change-dedup shuffles only the log, which is typically ≪
  * base). No driver-side state; appending the fold over daily change logs
  * is how the 100 TB snapshot stays current without rewriting history.
  */
object Upsert {

  /** @param base    current snapshot; schema: `keyCol` + `valueCols`
    * @param changes change log; schema: `keyCol` + `valueCols` + `opCol`
    *                ("UPSERT"/"DELETE") + `ordCol`,`tieCol` (total order)
    * @return the next snapshot, same schema as `base` */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      valueCols: Seq[String], opCol: String, ordCol: String, tieCol: String): DataFrame = {
    // Only UPSERT/DELETE are commands; any other op value is ignored BEFORE
    // latest-wins selection (an unknown op must not shadow a real command,
    // and must never fall into the "not UPSERT ⇒ drop" arm like a DELETE).
    val latest = changes
      .where(col(opCol).isin("UPSERT", "DELETE"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(ordCol).desc, col(tieCol).desc)))
      .where(col("_rn") === 1)
      .select(col(keyCol) +: col(opCol).as("_op") +:
        valueCols.map(c => col(c).as(s"_new_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .where(col("_op").isNull || col("_op") === "UPSERT")
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("_op") === "UPSERT", col(s"_new_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** SCD Type-2 history from a change log: every UPSERT becomes a VERSION
    * row with a validity interval `[valid_from, valid_to)`; `valid_to` is
    * the NEXT change's ord for the key (whatever its op — a later UPSERT
    * supersedes, a DELETE closes) or null while still current;
    * `is_current` = 1 on open rows. DELETE commands emit no version of
    * their own — their effect is entirely the closing of the previous one.
    *
    * `(ordCol, tieCol)` must be a total order per key, same contract as
    * [[applyChanges]]. Scale shape: ONE shuffle of the log on the key and
    * a lead() window — no self-join of history against itself; rebuilding
    * from the full log and incrementally folding a day's tail produce the
    * same rows because valid_to depends only on the key's next change. */
  def scd2FromChanges(changes: DataFrame, keyCol: String, valueCols: Seq[String],
      opCol: String, ordCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).asc, col(tieCol).asc)
    changes
      .where(col(opCol).isin("UPSERT", "DELETE"))
      .withColumn("_valid_to", lead(col(ordCol), 1).over(w))
      .where(col(opCol) === "UPSERT")
      .select(col(keyCol) +: valueCols.map(col) :+
        col(ordCol).as("valid_from") :+ col("_valid_to").as("valid_to") :+
        col("_valid_to").isNull.cast("int").as("is_current"): _*)
  }

  /** Incremental SCD2 application: fold a NEW tail of the change log into
    * existing [[scd2FromChanges]] history — the nightly shape, where
    * rebuilding from the full log would rescan years of changes.
    * Requires the tail to be append-only per key (every new change's ord
    * later than the key's open version's valid_from). Open rows of
    * touched keys close at the key's FIRST new change (whatever its op);
    * the tail's own versions chain via [[scd2FromChanges]]; untouched
    * history passes through. One broadcast-sized join (keys-in-tail) +
    * the tail's window: no history self-join, no rescan.
    * `scd2Fold(rebuild(day1), day2) == rebuild(day1 ++ day2)` is pinned
    * by UpsertSpec. */
  def scd2Fold(history: DataFrame, changes: DataFrame, keyCol: String,
      valueCols: Seq[String], opCol: String, ordCol: String,
      tieCol: String): DataFrame = {
    val firstNew = changes
      .where(col(opCol).isin("UPSERT", "DELETE"))
      .groupBy(col(keyCol)).agg(min(col(ordCol)).as("_first_new"))
    val closed = history.join(firstNew, Seq(keyCol), "left")
      .select(col(keyCol) +: valueCols.map(col) :+
        col("valid_from") :+
        coalesce(col("valid_to"), col("_first_new")).as("valid_to") :+
        coalesce(col("valid_to"), col("_first_new")).isNull.cast("int")
          .as("is_current"): _*)
    closed.unionByName(
      scd2FromChanges(changes, keyCol, valueCols, opCol, ordCol, tieCol))
  }

  /** Point-in-time (time-travel) read over [[scd2FromChanges]] output: the
    * rows whose validity interval contains `ts` — i.e. the table exactly
    * as the change log had built it at that moment. A pure filter: at
    * scale, partition the history by a coarse bucket of `valid_from` (or
    * cluster on `is_current` for the current-snapshot case) and this
    * prunes files before scanning. */
  def snapshotAt(history: DataFrame, ts: Long): DataFrame =
    history
      .where(col("valid_from") <= ts &&
        (col("valid_to").isNull || col("valid_to") > ts))
      .drop("valid_to", "is_current")

  /** Dataset-version diff: compare two corpus snapshots by key and report
    * one row per key present in either — `added` (new in B), `removed`
    * (gone from B), `changed` (present in both, any fingerprint column
    * differs), `unchanged`. The audit a curation pipeline runs between
    * published versions ("what did this rerun actually touch?").
    *
    * Change detection hashes the fingerprint columns (md5 over a
    * null-tagged concat — single-space field separator + a length prefix per
    * field so no concatenation of different fields collides), so wide rows
    * compare by one fixed-size value and the full-outer join carries keys
    * + 32-byte hashes, never the payloads. ONE hash shuffle per side on
    * the key; at 100 TB run it on key-bucketed snapshots and the join is
    * exchange-free. Output: (key, status, fp_a, fp_b) with null fp on the
    * absent side.
    *
    * Precondition: `keyCol` must be unique and non-null within each
    * snapshot (the contract of a published corpus version). A duplicated
    * key cross-products in the full-outer join and double-counts the
    * audit; a null key never equi-joins, so an identical null-keyed row
    * reports as removed + added. Run exact dedup / a key-null gate before
    * publishing if upstream can violate this. */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
      fingerprintCols: Seq[String]): DataFrame = {
    require(fingerprintCols.nonEmpty, "need >= 1 fingerprint column")
    def fp(df: DataFrame, out: String) = df.select(col(keyCol),
      md5(concat_ws(" ",
        fingerprintCols.flatMap(c => Seq(
          length(coalesce(col(c).cast("string"), lit("null"))).cast("string"),
          coalesce(col(c).cast("string"), lit("null")))): _*)).as(out))
    fp(a, "fp_a").join(fp(b, "fp_b"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"),
        col("fp_a"), col("fp_b"))
  }
}
