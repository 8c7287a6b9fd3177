package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flagship query (SURVEY.md §2.5 X1–X3): the reference's 4-level
  * flatten `extract_event_data_for_sheets` (reference `src/main.py:40-177`)
  * as one declarative DataFrame statement — explode → explode → explode →
  * `element_at` → defaulted 25-column projection, with the variant-schema
  * branch split (`"market_lines" in market.keys()`, `src/main.py:82`)
  * expressed as an `isNotNull` filter + `unionByName`.
  *
  * Scale shape: no shuffle at all — both branches are narrow
  * explode/project pipelines over the nested scan, and the union is a plan
  * union, not an exchange. Catalyst prunes unread struct fields from the
  * scan (nested-schema pruning), so a 100 TB nested table only reads the
  * fields the 25 columns touch.
  *
  * Column semantics (reference line refs in parentheses):
  *  - branch A (lines): event_scheduled_time is ISO-parsed, shifted to
  *    America/New_York and rendered (C1+C2, `main.py:89-95`); one output row
  *    per *outer* selections group, taking its first element
  *    (`selection[0]`, `main.py:120`).
  *  - branch B (no lines): the five line columns are the literal "NA"
  *    (`main.py:161-165`), the schedule string passes through unparsed
  *    (`main.py:148`), and *every* inner selection yields a row
  *    (`main.py:135-136`).
  *  - market_updated: epoch-nanos → US/Eastern render in both branches —
  *    branch B is normalized to C3 (the reference's local-timezone C4 at
  *    `main.py:172-174` is a documented divergence, SURVEY.md §2.6).
  *  - every field goes through `coalesce(col, default)` mirroring
  *    `.get(field, default)` (C15, `main.py:96-175`).
  */
object Flatten {

  val NA = "NA"

  private def s(c: Column): Column = coalesce(c.cast("string"), lit(""))

  private def eventCols: Seq[Column] = {
    val c1 = element_at(col("competitors"), 1)
    val c2 = element_at(col("competitors"), 2)
    Seq(
      s(col("event_id")).as("event_id"),
      s(col("display_name")).as("event_name"),
      s(c1.getField("display_name")).as("competitor1_name"),
      s(c1.getField("abbreviation")).as("competitor1_abbr"),
      s(c1.getField("side")).as("competitor1_side"),
      s(c2.getField("display_name")).as("competitor2_name"),
      s(c2.getField("abbreviation")).as("competitor2_abbr"),
      s(c2.getField("side")).as("competitor2_side"),
      s(col("status")).as("event_status"))
  }

  private def marketCols: Seq[Column] = Seq(
    s(col("m_id")).as("market_id"),
    s(col("m_name")).as("market_name"),
    s(col("m_type")).as("market_type"),
    s(col("m_status")).as("market_status"),
    TimeFns.render(TimeFns.nanosToEastern(coalesce(col("m_updated_at"), lit(0L))))
      .as("market_updated"))

  private def selectionCols(sel: Column): Seq[Column] = Seq(
    s(sel.getField("line_id")).as("selection_id"),
    s(sel.getField("display_name")).as("selection_name"),
    s(sel.getField("odds")).as("selection_odds"),
    s(sel.getField("stake")).as("selection_stake"),
    s(sel.getField("value")).as("selection_value"))

  /** Sheet column order (reference `src/main.py:50-78`, snake_cased). */
  val SheetColumns: Seq[String] = Seq(
    "event_id", "event_scheduled_time", "event_name",
    "competitor1_name", "competitor1_abbr", "competitor1_side",
    "competitor2_name", "competitor2_abbr", "competitor2_side",
    "market_id", "market_name", "market_type", "market_status",
    "line_id", "line_name", "line_value", "line_favourite", "line_type",
    "selection_id", "selection_name", "selection_odds",
    "event_status", "selection_stake", "selection_value", "market_updated")

  /** nested sport_events (BettingFixture schema) → the 25-column sheet. */
  def flatten25(sportEvents: DataFrame): DataFrame = {
    // Market subfields are lifted to top-level columns right after the
    // first explode — chained `select(*, explode)` over nested getFields
    // trips Catalyst's nested-attribute extraction, and flat columns also
    // give the clearest pruned scan.
    val withMarket = sportEvents
      .select(
        col("event_id"), col("scheduled"), col("display_name"), col("status"),
        col("competitors"), explode(col("markets")).as("market"))
      .select(
        col("event_id"), col("scheduled"), col("display_name"), col("status"),
        col("competitors"),
        col("market.id").as("m_id"), col("market.name").as("m_name"),
        col("market.type").as("m_type"), col("market.status").as("m_status"),
        col("market.updated_at").as("m_updated_at"),
        col("market.market_lines").as("m_lines"),
        col("market.selections").as("m_selections"))

    // Branch A — market_lines present (X1): …→lines→outer-selections→[0].
    val linesBranch = withMarket
      .where(col("m_lines").isNotNull)
      .withColumn("ml", explode(col("m_lines")))
      .select(
        col("event_id"), col("scheduled"), col("display_name"), col("status"),
        col("competitors"), col("m_id"), col("m_name"), col("m_type"),
        col("m_status"), col("m_updated_at"),
        col("ml.id").as("ml_id"), col("ml.name").as("ml_name"),
        col("ml.line").as("ml_line"), col("ml.favourite").as("ml_favourite"),
        col("ml.type").as("ml_type"), col("ml.selections").as("ml_selections"))
      .withColumn("sel_outer", explode(col("ml_selections")))
      .withColumn("sel", element_at(col("sel_outer"), 1))
      .select(
        eventCols ++ marketCols ++ selectionCols(col("sel")) ++ Seq(
          TimeFns.render(TimeFns.toNewYork(TimeFns.parseIso(col("scheduled"))))
            .as("event_scheduled_time"),
          s(col("ml_id")).as("line_id"),
          s(col("ml_name")).as("line_name"),
          s(col("ml_line")).as("line_value"),
          coalesce(col("ml_favourite"), lit(NA)).as("line_favourite"),
          s(col("ml_type")).as("line_type")): _*)

    // Branch B — no market_lines (X2): every inner selection, NA line cols.
    val noLinesBranch = withMarket
      .where(col("m_lines").isNull)
      .withColumn("sel_outer", explode(col("m_selections")))
      .withColumn("sel", explode(col("sel_outer")))
      .select(
        eventCols ++ marketCols ++ selectionCols(col("sel")) ++ Seq(
          s(col("scheduled")).as("event_scheduled_time"),
          lit(NA).as("line_id"), lit(NA).as("line_name"),
          lit(NA).as("line_value"), lit(NA).as("line_favourite"),
          lit(NA).as("line_type")): _*)

    // X3 — branch union, then the fixed sheet order.
    linesBranch.unionByName(noLinesBranch)
      .select(SheetColumns.map(col): _*)
  }
}
