package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, col, explode}

/** Materialization barrier for HOF-heavy (non-codegen) pipelines.
  *
  * Catalyst inlines projected expressions into downstream references, and
  * higher-order-function lambdas re-evaluate any *expression* (as opposed
  * to attribute) they capture once per array element. A tokenize→shingle→
  * minhash pipeline written as nested expressions therefore re-runs the
  * regex tokenizer per shingle per hash — measured 30× slowdowns at sf0.1
  * (a plain chained-`select` rewrite of the minhash signatures ran 88 s vs
  * 1.7 s with barriers).
  *
  * `Stage(df, name, expr)` forces `expr` to evaluate exactly once per row by
  * routing it through a single-element `explode(array(…))` Generate node:
  * projections don't collapse across Generate, and everything downstream
  * references a materialized attribute. It composes with predicate
  * pushdown (filters on other columns still push below the Generate).
  *
  * WHEN TO USE — decision rule, both branches measured:
  *  - Pipeline of higher-order functions (`transform`/`aggregate`/
  *    `filter` lambdas — CodegenFallback territory): barrier each stage.
  *    Physical subexpression elimination does NOT cover these, so repeated
  *    references re-execute in full.
  *  - Pipeline of codegen'd scalar expressions (json path, base64, string
  *    ops, arithmetic): do NOT barrier — put the repeats in ONE projection
  *    and let whole-stage codegen's subexpression elimination dedup them.
  *    The interpreted Generate costs ~5 µs/row, which dwarfs the saved
  *    work (measured 0.6 s vs 3.2 s on the T4 frame decode at sf0.1).
  */
object Stage {
  /** df + one materialized column `name` = `c`. */
  def apply(df: DataFrame, name: String, c: Column): DataFrame =
    df.select(col("*"), explode(array(c)).as(name))
}
