package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-grade language ID (VERDICT r8 #3): a hashed char-trigram integer
  * linear classifier — the fastText-style architecture (bag of hashed
  * character n-grams → per-class linear scores → argmax), in the same
  * no-float house style as `qualityModelScore`: every feature and weight
  * is integral, so the scores are bit-identical cross-engine and the
  * whole model is oracle-checkable.
  *
  * Features: all character trigrams of `lower(text)`, hashed into
  * [[B]] buckets via the portable [[TextFns.hash16]] (md5-nibble) hash.
  * Weights: per-language integer vectors over the buckets, trained
  * OFFLINE (the production posture — scoring is what must scale) as
  * 100·log naive-Bayes likelihood ratios on public-domain UDHR-derived
  * samples, pinned here like a shipped model file. `LangIdModelSpec`
  * re-derives a reference score in plain JVM code and asserts the Column
  * pipeline matches; the model separates its four training languages with
  * large margins (≥ +3000 vs ≤ −3000 logits on the training text).
  *
  * Scale shape: narrow per-row expressions only — trigram array, bucket
  * map, four weighted folds — no shuffle, composes with predicate
  * pushdown; the weight table rides in the plan (staged once per row as a
  * materialized attribute so the interpreted HOF lambdas never rebuild
  * the 256-literal array per element).
  */
object LangIdModel {

  /** Hash buckets per language. */
  val B = 64

  /** Model languages, in prediction tie-break priority order. */
  val Langs: Seq[String] = Seq("en", "de", "fr", "es")

  /** Pinned per-language weights (length [[B]] each): 100·log NB ratios. */
  val Weights: Map[String, IndexedSeq[Long]] = Map(
    "en" -> Vector(-8, -21, -44, -48, 59, 77, -11, -10, -39, -34, 61, 37,
      53, -20, -39, 41, 61, -86, -50, -17, 4, -17, -8, -25, 27, -32, 37,
      59, 12, -21, 27, -6, -68, 122, -8, -32, 30, -17, 24, -39, 27, 53, 4,
      -17, 3, -77, 6, 30, -26, -108, -57, -98, -17, 27, -86, 12, -28,
      -118, 53, 46, 41, 35, 53, -79),
    "de" -> Vector(-25, -38, -2, -186, -22, -7, 37, 47, 31, -10, -47, -2,
      -9, -53, -38, 64, 22, 110, -31, 13, 61, -16, -47, 28, 46, -2, -2,
      -9, 47, -43, -24, -27, 31, 54, 44, -2, 72, 54, 7, 43, 46, -56, -64,
      -44, 22, -25, -85, 3, -25, 54, 54, 13, -38, -64, 54, -5, -97, 9, 20,
      -9, 13, -125, -56, -9),
    "fr" -> Vector(20, 7, 24, -78, -53, -50, -13, -11, -40, 21, -50, -4,
      -40, 41, 70, -99, -50, -18, 7, 11, -136, 41, -78, 3, -26, 52, -33,
      -81, -81, 18, 3, 26, 16, 52, -9, -74, -40, 23, -18, 0, -26, 26, 25,
      5, -21, 52, 52, -40, 76, 0, 33, 40, 29, -136, 23, -7, 26, 6, -143,
      -11, 11, 11, -18, -11),
    "es" -> Vector(-8, 20, -3, 96, -23, -49, -34, -39, 30, 7, 21, -32,
      -80, -20, 71, -29, -49, -86, 28, 12, 4, -39, 61, 4, -65, -32, -3,
      -10, -57, -3, 4, -6, -17, 52, -8, 45, 30, -17, -17, -39, -65, -98,
      26, 39, -49, -8, -17, 30, -187, 30, -57, 41, 1, 73, -46, -6, 41, 32,
      -3, -39, -29, 34, 12, 59))

  /** All weights flattened in [[Langs]] order — the per-row staged lookup
    * table: weight(lang i, bucket b) = element (i·B + b + 1), 1-based. */
  val FlatWeights: IndexedSeq[Long] = Langs.flatMap(Weights).toVector

  /** Character trigrams of a (pre-lowercased) text column; < 3 chars ⇒
    * empty array. Native one-pass kernel since r16
    * ([[graft.plans.TrigramsS]] — the per-position Substring HOF was the
    * hottest remaining text site at 13 s / 500k docs);
    * [[trigramsHof]] kept for the parity suite. */
  def trigrams(t: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(
      graft.plans.TrigramsS(
        org.apache.spark.sql.graftbridge.GraftBridge.expression(t)))

  /** The pre-r16 HOF form — parity-spec reference only (the `sequence(1,
    * n)` guard is required, not defensive: it counts DOWN for n < 1). */
  private[graft] def trigramsHof(t: Column): Column =
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Trigram array → hash-bucket array. The md5 runs in the native
    * `md5_base28_l` kernel since r16 (hash16 ≡ base28 >> 12, bit-equal);
    * only the trivial shift/mod lambda remains interpreted. The int cast
    * keeps the bucket element type (and every dumped schema) identical
    * to the pre-r16 int-typed hash16 form. */
  def buckets(tg: Column): Column =
    transform(TextFns.shingleHashes(tg),
      h => pmod(shiftright(h, 12), lit(B)).cast("int"))

  /** Integer score for language index `li` over a bucket array, reading
    * weights from the STAGED flat-weight array attribute `wall` (lambdas
    * must capture attributes, not expressions — Stage.scala rationale). */
  def score(bk: Column, wall: Column, li: Int): Column =
    aggregate(transform(bk, b => element_at(wall, b + lit(li * B + 1)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** The flat-weight array as a literal Column (stage it once per row). */
  def weightArray: Column = array(FlatWeights.map(lit): _*)

  /** argmax prediction with [[Langs]] priority on ties; `und` when the
    * text has no trigram (fewer than 3 chars). */
  def predict(nTrigrams: Column, scores: Seq[Column]): Column = {
    val best = scores.reduce((a, b) => greatest(a, b))
    val cases = Langs.zip(scores).foldRight(lit("und")) {
      case ((lang, s), els) => when(s === best, lit(lang)).otherwise(els)
    }
    when(nTrigrams === 0, lit("und")).otherwise(cases)
  }

  // ─────────────────────────── oracle fragments ───────────────────────────

  /** DuckDB expression mirroring [[TextFns.hash16]] over variable `g`. */
  def hash16Sql(g: String): String =
    s"""((strpos('0123456789abcdef', substr(md5($g), 1, 1)) - 1) * 4096 +
       | (strpos('0123456789abcdef', substr(md5($g), 2, 1)) - 1) * 256 +
       | (strpos('0123456789abcdef', substr(md5($g), 3, 1)) - 1) * 16 +
       | (strpos('0123456789abcdef', substr(md5($g), 4, 1)) - 1))""".stripMargin

  /** DuckDB list literal of [[FlatWeights]]. */
  def flatWeightsSql: String = FlatWeights.mkString("[", ", ", "]")

  /** DuckDB trigram expression over pre-lowercased text variable `t`. */
  def trigramsSql(t: String): String =
    s"""CASE WHEN length($t) >= 3
       | THEN list_transform(range(1, length($t) - 1),
       |   i -> substr($t, CAST(i AS INTEGER), 3))
       | ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** DuckDB score expression over bucket-list variable `bk` for language
    * index `li`, reading a weight-list variable `wall`. */
  def scoreSql(bk: String, wall: String, li: Int): String =
    s"CAST(coalesce(list_sum(list_transform($bk, b -> $wall[b + ${li * B + 1}])), 0) AS BIGINT)"
}
