package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, col, explode}

/** Materialization barrier for expression-heavy pipelines.
  *
  * Catalyst's CollapseProject inlines projected expressions into every
  * downstream reference, and higher-order-function lambdas re-evaluate any
  * *expression* (as opposed to attribute) they capture once per array
  * element. A tokenize→shingle→minhash pipeline written as nested
  * expressions therefore re-runs the regex tokenizer per shingle per hash —
  * measured 10–20× slowdowns at sf0.1.
  *
  * `Stage(df, name, expr)` forces `expr` to evaluate exactly once per row by
  * routing it through a single-element `explode(array(…))` Generate node:
  * projections don't collapse across Generate, and everything downstream
  * references a materialized attribute. Cost: one pass-through generator —
  * negligible next to the recomputation it prevents, and it composes with
  * predicate pushdown (filters on other columns still push below).
  */
object Stage {
  /** df + one materialized column `name` = `c`. */
  def apply(df: DataFrame, name: String, c: Column): DataFrame =
    df.select(col("*"), explode(array(c)).as(name))
}
