package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity vocabulary for the ANN extension operators
  * (SURVEY.md §2.10). Embeddings arrive as `array<float>`; all arithmetic is
  * promoted to double *first* so a DuckDB oracle (`embedding::DOUBLE[]`)
  * accumulates bit-identically. The dot product is a native codegen
  * expression ([[graft.plans.DotProductD]]) — no UDF, no HOF fallback, no
  * per-row intermediate array; same left-to-right accumulation order as
  * the `aggregate(zip_with(...))` fold it replaced.
  */
object SimFns {

  /** array<float> → array<double> via the native Cast (codegen'd
    * elementwise widening) — NOT transform(cast), which is an
    * ArrayTransform HOF (CodegenFallback + interpreted lambda) on a
    * per-row prep path every similarity operator runs (r15; same
    * values bit-for-bit, every oracle hash-exact across the swap). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product (deterministic index-order accumulation).
    * Inputs must be `array<double>` (use [[toDouble]]). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.DotProductD(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(a),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(b)))

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a precomputed-norm pair — avoids recomputing norms inside a
    * k×N cross join (the norms are computed once per side and reused). */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Matrix·vector against a TRAINED rotation shipped as literals
    * ([[graft.plans.MatVecD]]) — the OPQ pretransform kernel: element i
    * is the index-order dot of matrix row i with the (double-promoted)
    * vector, bit-identical to the HOF chain it replaced. One primitive
    * loop in whole-stage codegen; the literal matrix constant-folds to
    * a bound ArrayData. */
  def matVec(m: Seq[Array[Double]], v: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.MatVecD(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(
        array(m.map(row => array(row.map(x => lit(x)): _*)): _*)),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(toDouble(v))))

  /** Elementwise vector subtraction ([[graft.plans.VecSubD]]) — the
    * residual v − c(cell) kernel; one primitive codegen loop instead of
    * the zip_with HOF. Inputs must be `array<double>`. */
  def vecSub(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.VecSubD(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(a),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(b)))

  /** Sign-bit packing ([[graft.plans.SignPackL]]) — the binary-quantize
    * encode kernel: 32 strictly-positive sign bits per BIGINT word, one
    * primitive loop in codegen. Input must be `array<double>`. */
  def signPack(v: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.SignPackL(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(v)))

  /** Fused PQ encode ([[graft.plans.PqEncodeI]]): all m codes of one
    * vector in one codegen loop against the flattened codebook literal —
    * the zero-shuffle encode path. Input must be `array<double>`. */
  def pqEncodeCodes(v: Column, books: Seq[Seq[Array[Double]]]): Column = {
    val m = books.size
    val ksub = books.head.size
    val flat = books.flatten.flatten
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.PqEncodeI(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(v),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(
        array(flat.map(x => lit(x)): _*)),
      m, ksub))
  }

  /** Max |element| ([[graft.plans.AbsMaxD]]) — the SQ8 per-vector scale;
    * null-element handling matches array_max(transform(abs)) (skipped). */
  def absMax(v: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.AbsMaxD(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(v)))

  /** Int8 scalar-quantize codes ([[graft.plans.Sq8CodesI]]):
    * (int) floor(x·127/max_abs + 0.5) per element, one codegen loop. */
  def sq8Codes(v: Column, maxAbs: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.Sq8CodesI(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(v),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(maxAbs)))

  /** Hamming distance between two word-packed bit patterns
    * (`array<bigint>`, 32 sign bits per word — [[graft.operators
    * .Similarity.binqEncode]]'s layout). Native codegen
    * ([[graft.plans.HammingL]]): one xor + POPCNT per word in the pair
    * loop, no per-pair allocation. */
  def hammingWords(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.HammingL(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(a),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(b)))

  /** ADC lookup sum over the wide PQ layout ([[graft.plans.AdcSumL]]):
    * `codes` the vector's m codes (`array<int>`), `lut` the query's
    * flattened sub-major m×ksub distance table (`array<bigint>`),
    * `ksub` the trained codebook size — explicit so a wrong-m codes
    * array can never infer a misaligned layout (ADVICE r13). */
  def adcSum(codes: Column, lut: Column, ksub: Int): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.AdcSumL(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(codes),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(lut),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(lit(ksub))))
}
