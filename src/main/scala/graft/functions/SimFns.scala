package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity vocabulary for the ANN extension operators
  * (SURVEY.md §2.10). Embeddings arrive as `array<float>`; all arithmetic is
  * promoted to double *first* so a DuckDB oracle (`embedding::DOUBLE[]`)
  * accumulates bit-identically. Pure higher-order functions — the dot
  * product is a codegen'd fold, no UDF, no collect.
  */
object SimFns {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (deterministic accumulation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a precomputed-norm pair — avoids recomputing norms inside a
    * k×N cross join (the norms are computed once per side and reused). */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
