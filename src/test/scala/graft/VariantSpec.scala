package graft

import graft.operators.VariantOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 VARIANT tier (operators.VariantOps): parse-once binary
  * semi-structured values, typed shredding, heterogeneous per-row typing,
  * and the parquet persistence round-trip. */
class VariantSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def payloads = VariantOps.eventPayload(Tables.events(spark, dir))

  test("shred round-trips every typed field losslessly from the base columns") {
    val events = Tables.events(spark, dir)
    val expected = events.select(
      col("event_id"),
      col("user_id").as("uid"),
      col("event_type").as("etype"),
      coalesce(get_json_object(col("props"), "$.k"), lit("0")).cast("int")
        .as("k"),
      (col("value") * 2).as("val2"))
    val got = VariantOps.shred(payloads)
      .select("event_id", "uid", "etype", "k", "val2")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("heterogeneous $.tag: typed read nulls on the string rows, string read covers both") {
    val rows = VariantOps.shred(payloads)
      .select("event_id", "tag_int", "tag_str").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) {
        assert(r.getInt(1) == (id % 100).toInt)
        assert(r.getString(2) == (id % 100).toString)
      } else {
        assert(r.isNullAt(1), s"tag_int must be null for string row $id")
        assert(r.getString(2) == s"t-${id % 100}")
      }
    }
  }

  test("missing path and strict-vs-try semantics") {
    val df = Seq("""{"a":1}""").toDF("payload")
      .select(parse_json(col("payload")).as("v"))
    // Missing path: null in both modes (no error).
    assert(df.select(variant_get(col("v"), "$.nope", "int")).head().isNullAt(0))
    assert(df.select(try_variant_get(col("v"), "$.nope", "int")).head().isNullAt(0))
    // Failed typed read: try_ nulls; strict variant_get throws.
    val bad = Seq("""{"a":"xyz"}""").toDF("payload")
      .select(parse_json(col("payload")).as("v"))
    assert(bad.select(try_variant_get(col("v"), "$.a", "int")).head().isNullAt(0))
    assertThrows[Exception] {
      bad.select(variant_get(col("v"), "$.a", "int")).collect()
    }
  }

  test("malformed JSON: parse_json throws, try_parse_json nulls (quarantine gate)") {
    val bad = Seq("""{"k": 1""", "not json", "").toDF("payload")
    assertThrows[Exception] {
      bad.select(parse_json(col("payload"))).collect()
    }
    // try_parse_json is the gate-at-ingest shape: corrupt rows become null
    // variants to route to quarantine (same contract as the try_to_binary
    // decode quarantine), clean rows shred normally.
    val gated = bad.select(try_parse_json(col("payload")).as("v"))
    assert(gated.where(col("v").isNull).count() == 3)
    val mixed = Seq("""{"k":1}""", "nope").toDF("payload")
      .select(try_parse_json(col("payload")).as("v"))
    assert(mixed.where(col("v").isNotNull).count() == 1)
  }

  test("shred runs unchanged over readStream (gate-at-ingest shape)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val out = VariantOps.shred(input.toDF().toDF("event_id", "payload"))
    val q = out.writeStream.format("memory").queryName("variantstream")
      .outputMode("append").start()
    try {
      input.addData(
        (3L, """{"meta":{"type":"purchase","uid":9},"k":4,"vals":[1.5,3.0],"tag":3}"""),
        (4L, """{"meta":{"type":"click","uid":8},"k":2,"vals":[2.5,5.0],"tag":"t-4"}"""))
      q.processAllAvailable()
      val rows = spark.table("variantstream")
        .select("event_id", "uid", "etype", "k", "val2", "tag_int", "tag_str")
        .collect().sortBy(_.getLong(0))
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 9 && rows(0).getString(2) == "purchase" &&
        rows(0).getInt(3) == 4 && rows(0).getDouble(4) == 3.0 &&
        rows(0).getInt(5) == 3 && rows(0).getString(6) == "3")
      assert(rows(1).isNullAt(5) && rows(1).getString(6) == "t-4")
    } finally q.stop()
  }

  test("variant column persists to parquet and shreds identically after reload") {
    val out = java.nio.file.Files.createTempDirectory("variant-pq").toString
    payloads.select(col("event_id"), parse_json(col("payload")).as("v"))
      .write.mode("overwrite").parquet(out)
    val re = spark.read.parquet(out)
    assert(re.schema("v").dataType.typeName == "variant")
    val got = re.select(
      col("event_id"),
      variant_get(col("v"), "$.meta.uid", "bigint").as("uid"),
      variant_get(col("v"), "$.vals[1]", "double").as("val2"))
    val expected = Tables.events(spark, dir).select(
      col("event_id"), col("user_id").as("uid"),
      (col("value") * 2).as("val2"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
