package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** The flagship query (SURVEY.md §2.5 X1–X3): the reference's 4-level
  * flatten `extract_event_data_for_sheets` (reference `src/main.py:40-177`)
  * as one declarative DataFrame pipeline — explode → explode → explode →
  * `element_at` → defaulted 25-column projection.
  *
  * The variant-schema branch (`"market_lines" in market.keys()`,
  * `src/main.py:82`) is handled in a SINGLE pass, not a filter+union pair:
  * a filter/union plan executes the nested scan (and, for the test fixture,
  * its build shuffle) once per branch, while here the branch choice is a
  * `when(hasLines, …)` on each column — one narrow pipeline, no duplicate
  * subtree, no shuffle at all. Catalyst prunes unread struct fields from
  * the scan, so a 100 TB nested table reads only the fields the 25 columns
  * touch.
  *
  * Column semantics (reference line refs):
  *  - lines branch: schedule is ISO-parsed → America/New_York → rendered
  *    (C1+C2, `main.py:89-95`); one row per *outer* selections group taking
  *    its first element (`selection[0]`, `main.py:120`).
  *  - no-lines branch: the five line columns are literal "NA"
  *    (`main.py:161-165`), the schedule string passes through unparsed
  *    (`main.py:148`), and *every* inner selection yields a row
  *    (`main.py:135-136`).
  *  - market_updated: epoch-nanos → US/Eastern render in both branches by
  *    default — the no-lines branch is normalized to C3 (the reference's
  *    local-timezone C4 at `main.py:172-174` depends on where the process
  *    runs, SURVEY.md §2.6). Strict C4 parity is opt-in: pass `noLinesTz`
  *    naming the machine zone and the no-lines branch renders there,
  *    reproducing the reference bit-for-bit for that deployment.
  *  - every field goes through `coalesce(col, default)` mirroring
  *    `.get(field, default)` (C15, `main.py:96-175`).
  */
object Flatten {

  val NA = "NA"

  private def s(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Sheet column order (reference `src/main.py:50-78`, snake_cased). */
  val SheetColumns: Seq[String] = Seq(
    "event_id", "event_scheduled_time", "event_name",
    "competitor1_name", "competitor1_abbr", "competitor1_side",
    "competitor2_name", "competitor2_abbr", "competitor2_side",
    "market_id", "market_name", "market_type", "market_status",
    "line_id", "line_name", "line_value", "line_favourite", "line_type",
    "selection_id", "selection_name", "selection_odds",
    "event_status", "selection_stake", "selection_value", "market_updated")

  /** nested sport_events (BettingFixture schema) → the 25-column sheet.
    * `noLinesTz = Some(zone)` enables strict C4 parity (see class doc). */
  def flatten25(sportEvents: DataFrame,
      noLinesTz: Option[String] = None): DataFrame = {
    // Typed null line-struct for the no-lines branch, derived from the
    // input schema so the operator works on any conforming nested source.
    val marketType = sportEvents.schema("markets").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val lineElemType = marketType("market_lines").dataType
      .asInstanceOf[ArrayType].elementType

    // Two principles shape this pipeline:
    //  1. Expensive per-entity work (timezone parse+convert+format,
    //     competitor extraction) happens at the entity's own cardinality —
    //     per event / per market — never per flattened output row (~10×
    //     fewer evaluations at fixture shape).
    //  2. Each explode carries only scalars forward: nested structs
    //     (competitors, the market-line struct with its selections arrays)
    //     are dissolved into flat columns at the first Generate after they
    //     are no longer needed, so the 3-deep Generate chain copies narrow
    //     rows, not nested arrays, per emitted row.
    val c1 = element_at(col("competitors"), 1)
    val c2 = element_at(col("competitors"), 2)

    val withMarket = sportEvents
      .select(
        // per-event scalars, final-string form
        s(col("event_id")).as("event_id"),
        when(col("scheduled").isNotNull,
          TimeFns.render(TimeFns.toNewYork(TimeFns.parseIso(col("scheduled")))))
          .as("sched_ny"),
        s(col("scheduled")).as("sched_raw"),
        s(col("display_name")).as("event_name"),
        s(col("status")).as("event_status"),
        s(c1.getField("display_name")).as("competitor1_name"),
        s(c1.getField("abbreviation")).as("competitor1_abbr"),
        s(c1.getField("side")).as("competitor1_side"),
        s(c2.getField("display_name")).as("competitor2_name"),
        s(c2.getField("abbreviation")).as("competitor2_abbr"),
        s(c2.getField("side")).as("competitor2_side"),
        explode(col("markets")).as("market"))
      .select(
        col("event_id"), col("sched_ny"), col("sched_raw"), col("event_name"),
        col("event_status"),
        col("competitor1_name"), col("competitor1_abbr"), col("competitor1_side"),
        col("competitor2_name"), col("competitor2_abbr"), col("competitor2_side"),
        s(col("market.id")).as("market_id"),
        s(col("market.name")).as("market_name"),
        s(col("market.type")).as("market_type"),
        s(col("market.status")).as("market_status"),
        {
          val muNanos = coalesce(col("market.updated_at"), lit(0L))
          val eastern = TimeFns.render(TimeFns.nanosToEastern(muNanos))
          noLinesTz.fold(eastern)(tz =>
            when(col("market.market_lines").isNotNull, eastern)
              .otherwise(TimeFns.render(TimeFns.nanosToZone(muNanos, tz))))
        }.as("market_updated"),
        col("market.market_lines").isNotNull.as("has_lines"),
        // no-lines markets get one synthetic null line so a single explode
        // path serves both variants
        coalesce(col("market.market_lines"), array(lit(null).cast(lineElemType)))
          .as("m_lines"),
        col("market.selections").as("m_selections"))

    def passthrough: Seq[Column] = Seq(
      col("event_id"), col("sched_ny"), col("sched_raw"), col("event_name"),
      col("event_status"),
      col("competitor1_name"), col("competitor1_abbr"), col("competitor1_side"),
      col("competitor2_name"), col("competitor2_abbr"), col("competitor2_side"),
      col("market_id"), col("market_name"), col("market_type"),
      col("market_status"), col("market_updated"), col("has_lines"))

    def lineCol(c: Column): Column = when(col("has_lines"), s(c)).otherwise(lit(NA))

    // Explode lines; dissolve the line struct into final-string scalars and
    // keep only the branch-resolved outer-selections array.
    val withLine = withMarket
      .select(passthrough :+ col("m_selections") :+ explode(col("m_lines")).as("ml"): _*)
      .select(passthrough ++ Seq(
        lineCol(col("ml.id")).as("line_id"),
        lineCol(col("ml.name")).as("line_name"),
        lineCol(col("ml.line")).as("line_value"),
        when(col("has_lines"), coalesce(col("ml.favourite"), lit(NA)))
          .otherwise(lit(NA)).as("line_favourite"),
        lineCol(col("ml.type")).as("line_type"),
        // lines branch reads ml.selections; no-lines branch the market's own
        coalesce(col("ml.selections"), col("m_selections")).as("sel_outer_src")): _*)

    val lineCols = Seq(col("line_id"), col("line_name"), col("line_value"),
      col("line_favourite"), col("line_type"))

    // X1 takes selection[0] per outer group; X2 iterates every inner.
    val withSel = withLine
      .select(passthrough ++ lineCols :+ explode(col("sel_outer_src")).as("sel_outer"): _*)
      .select(passthrough ++ lineCols :+ explode(
        when(col("has_lines"), slice(col("sel_outer"), 1, 1))
          .otherwise(col("sel_outer"))).as("sel"): _*)

    withSel.select(
      col("event_id"),
      when(col("has_lines"), col("sched_ny"))
        .otherwise(col("sched_raw")).as("event_scheduled_time"),
      col("event_name"),
      col("competitor1_name"), col("competitor1_abbr"), col("competitor1_side"),
      col("competitor2_name"), col("competitor2_abbr"), col("competitor2_side"),
      col("market_id"), col("market_name"), col("market_type"), col("market_status"),
      col("line_id"), col("line_name"), col("line_value"), col("line_favourite"),
      col("line_type"),
      s(col("sel.line_id")).as("selection_id"),
      s(col("sel.display_name")).as("selection_name"),
      s(col("sel.odds")).as("selection_odds"),
      col("event_status"),
      s(col("sel.stake")).as("selection_stake"),
      s(col("sel.value")).as("selection_value"),
      col("market_updated"))
  }
}
