package graft

import graft.operators.Flatten
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Golden-fixture test of the flagship flatten (SURVEY.md §5.5): both
  * market variants, double-nested selections, absent-field defaults. */
class FlattenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val selType = StructType(Seq(
    StructField("line_id", StringType), StructField("display_name", StringType),
    StructField("name", StringType), StructField("odds", IntegerType),
    StructField("stake", StringType), StructField("value", StringType)))
  private val lineType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("line", StringType), StructField("favourite", StringType),
    StructField("type", StringType),
    StructField("selections", ArrayType(ArrayType(selType)))))
  private val marketType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("type", StringType), StructField("status", StringType),
    StructField("updated_at", LongType),
    StructField("market_lines", ArrayType(lineType)),
    StructField("selections", ArrayType(ArrayType(selType)))))
  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("scheduled", StringType),
    StructField("display_name", StringType), StructField("status", StringType),
    StructField("competitors", ArrayType(StructType(Seq(
      StructField("display_name", StringType),
      StructField("abbreviation", StringType),
      StructField("side", StringType))))),
    StructField("markets", ArrayType(marketType))))

  private def sel(id: String, odds: Int) = Row(id, s"Sel $id", "n", odds, "10.00", "1.00")

  // 1 GMT-noon nanos: 2024-01-01T12:00:00Z = 1704110400 s
  private val ns = 1704110400L * 1000000000L

  private val fixture = Seq(
    // Event 1: one lines-market (2 outer selection groups → 2 rows, [0] taken)
    Row(1L, "2024-01-01T12:00:00Z", "Ev One", "open",
      Seq(Row("Home T", "H", "home"), Row("Away T", null, "away")),
      Seq(Row("m1", "ML Market", "moneyline", "open", ns,
        Seq(Row("ml1", "Line A", "2.5", null, "points",
          Seq(Seq(sel("a", 150), sel("ignored", -110)), Seq(sel("b", -120))))),
        null))),
    // Event 2: one no-lines market ([[c],[d,e]] → 3 rows, all inner taken)
    Row(2L, "2024-06-01T00:00:00Z", "Ev Two", "live",
      Seq(Row("X", "X1", "home"), Row("Y", "Y1", "away")),
      Seq(Row("m2", "Spread", "spread", "closed", ns, null,
        Seq(Seq(sel("c", -100)), Seq(sel("d", 200), sel("e", 300)))))))

  private lazy val out = Flatten.flatten25(
    spark.createDataFrame(fixture.asJava, schema)).cache()

  test("row counts per branch: lines branch takes selection[0] per outer group") {
    assert(out.count() == 5) // 2 (event 1) + 3 (event 2)
    assert(out.where(out("event_id") === "1").count() == 2)
    assert(out.where(out("event_id") === "2").count() == 3)
  }

  test("lines branch: NY conversion, favourite default NA, [0]-selection") {
    val r = out.where(out("selection_id") === "a").collect()
    assert(r.length == 1)
    val m = r.head.getValuesMap[String](Flatten.SheetColumns)
    assert(m("event_scheduled_time") == "2024-01-01 07:00:00") // UTC noon → NY 7am (EST)
    assert(m("line_favourite") == "NA")    // null → NA (main.py:118)
    assert(m("line_id") == "ml1")
    assert(m("selection_odds") == "150")
    assert(out.where(out("selection_id") === "ignored").count() == 0) // only [0] taken
  }

  test("no-lines branch: NA line columns, raw schedule passthrough, all inner selections") {
    val m = out.where(out("selection_id") === "d").collect().head
      .getValuesMap[String](Flatten.SheetColumns)
    assert(m("line_id") == "NA" && m("line_name") == "NA" && m("line_type") == "NA")
    assert(m("event_scheduled_time") == "2024-06-01T00:00:00Z") // unparsed (main.py:148)
    assert(m("market_updated") == "2024-01-01 07:00:00") // nanos → US/Eastern (C3)
  }

  test("absent competitor abbreviation defaults to empty string") {
    val m = out.where(out("event_id") === "1").collect().head
      .getValuesMap[String](Flatten.SheetColumns)
    assert(m("competitor2_abbr") == "")
  }

  test("column order matches the 25-column sheet schema") {
    assert(out.columns.toSeq == Flatten.SheetColumns)
  }

  test("strict C4 mode renders the no-lines branch in the named machine zone only") {
    val strict = Flatten.flatten25(
      spark.createDataFrame(fixture.asJava, schema),
      noLinesTz = Some("America/Chicago")).cache()
    // Lines branch (event 1): unchanged — still US/Eastern.
    val lines = strict.where(strict("selection_id") === "a").collect().head
      .getValuesMap[String](Flatten.SheetColumns)
    assert(lines("market_updated") == "2024-01-01 07:00:00")
    // No-lines branch (event 2): UTC noon → Chicago 6am (CST, UTC−6).
    val noLines = strict.where(strict("selection_id") === "d").collect().head
      .getValuesMap[String](Flatten.SheetColumns)
    assert(noLines("market_updated") == "2024-01-01 06:00:00")
    // Every other column is identical to the default mode.
    val diff = strict.drop("market_updated")
      .exceptAll(out.drop("market_updated"))
    assert(diff.isEmpty)
    strict.unpersist()
  }
}
