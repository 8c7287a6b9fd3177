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
}
