package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** American-odds domain rules (SURVEY.md §2.6 C13 / FIXTURES.md §D).
  *
  * The ladder is re-derived from the *band structure* of the reference's
  * `VALID_ODDS_BACKUP` constant (reference `src/constants.py:1-291`): nine
  * step bands on the positive side (100–120 step 1, 120–200 step 2, 200–300
  * step 5, 300–500 step 10, 500–1000 step 20, 1000–2000 step 100, 2000–3000
  * step 250, 3000–5000 step 500, 5000–10000 step 2500), mirrored negative
  * with −100 excluded — 146 positive + 145 negative = 291 values. Generated
  * from the rule rather than transcribed.
  *
  * The normalization rule (never emit −100; flip it to +100) is from
  * reference `src/mm_calls.py:410-418`.
  */
object OddsFns {
  /** (loInclusive, hiExclusive, step) bands of the positive half. */
  val LadderBands: Seq[(Int, Int, Int)] = Seq(
    (100, 120, 1), (120, 200, 2), (200, 300, 5), (300, 500, 10),
    (500, 1000, 20), (1000, 2000, 100), (2000, 3000, 250),
    (3000, 5000, 500), (5000, 10000, 2500))

  val PositiveLadder: Seq[Int] =
    LadderBands.flatMap { case (lo, hi, step) => lo until hi by step } :+ 10000

  /** Full ladder, ascending: −10000…−101 then +100…+10000 (no −100). */
  val Ladder: Seq[Int] =
    PositiveLadder.filter(_ != 100).map(-_).sorted ++ PositiveLadder

  private val ladderCol: Column = typedLit(Ladder)

  /** C13 — the −100 avoidance rule (`src/mm_calls.py:416-418`). */
  def normalizeOdds(c: Column): Column =
    when(c === -100, lit(100)).otherwise(c)

  /** Deterministic ladder pick by index ∈ [0, 291). */
  def ladderAt(idx: Column): Column =
    element_at(ladderCol, (idx + lit(1)).cast("int"))

  /** Ladder membership test. */
  def isValidOdds(c: Column): Column = array_contains(ladderCol, c)

  /** Snap an arbitrary signed value to the nearest ladder value (ties go to
    * the smaller absolute element encountered first — the fold keeps the
    * earliest minimum). Natural generalization of ladder membership; pure
    * fold over the 291-value literal, stays inside codegen. */
  def snapToLadder(c: Column): Column = {
    val best = aggregate(
      ladderCol,
      struct(lit(Int.MaxValue).cast("long").as("d"), lit(0).as("v")),
      (acc, x) => {
        val d = abs(x - c).cast("long")
        when(d < acc.getField("d"), struct(d.as("d"), x.as("v"))).otherwise(acc)
      })
    normalizeOdds(best.getField("v"))
  }

  /** American → decimal (European) odds. */
  def americanToDecimal(c: Column): Column =
    when(c > 0, lit(1.0) + c / lit(100.0))
      .otherwise(lit(1.0) + lit(100.0) / -c)

  /** Decimal → American odds (inverse of [[americanToDecimal]], normalized). */
  def decimalToAmerican(c: Column): Column = normalizeOdds(
    when(c >= 2.0, round((c - 1.0) * 100).cast("int"))
      .otherwise(round(lit(-100.0) / (c - 1.0)).cast("int")))
}
