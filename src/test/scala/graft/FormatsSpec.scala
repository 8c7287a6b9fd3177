package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-format ingest: the engine's tables are parquet, but a 100 TB
  * pipeline receives ORC, CSV, and JSONL drops. These cases pin that the
  * same declarative plans work over each built-in source with the scale
  * properties intact (ORC predicate pushdown) and with the
  * corrupt-record quarantine pattern (PERMISSIVE + corrupt-column
  * routing) for the text formats. */
class FormatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("ORC round-trip with predicate pushdown") {
    val out = java.nio.file.Files.createTempDirectory("fmt-orc").toString
    Tables.customer(spark, sf).write.mode("overwrite").orc(out)
    val re = spark.read.orc(out)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    val plan = re.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"ORC scan must push the predicate:\n$plan")
    val viaParquet = Tables.customer(spark, sf)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    assert(re.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(re).isEmpty)
  }

  test("CSV ingest: schema enforced, corrupt rows quarantined not dropped") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-csv")
    val f = dir.resolve("drop.csv")
    java.nio.file.Files.writeString(f,
      "1,alpha,10.5\n2,beta,not-a-number\n3,gamma,7.25\nmangled line\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("_bad", StringType)))
    // persist before routing: Spark refuses plans that read ONLY the
    // corrupt column from the raw file (the parse that would fill it got
    // pruned away); materializing the parsed frame once is also the
    // realistic quarantine shape — parse once, route twice.
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(dir.toString)
      .persist()
    val clean = df.where(col("_bad").isNull)
    val quarantine = df.where(col("_bad").isNotNull)
    assert(clean.count() == 2) // rows 1 and 3
    assert(quarantine.count() == 2) // bad number + mangled line
    // the corrupt ROW text is preserved for replay/debugging
    assert(quarantine.select("_bad").as[String].collect()
      .exists(_.contains("not-a-number")))
  }

  test("JSONL ingest: permissive parse with corrupt-record routing") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-jsonl")
    java.nio.file.Files.writeString(dir.resolve("drop.jsonl"),
      """{"id":1,"text":"good"}
        |{"id":2,"text":"also good"}
        |{"id":3,"text": BROKEN
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("_bad", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir.toString)
      .persist() // same corrupt-column-pruning restriction as the CSV case
    assert(df.where(col("_bad").isNull).count() == 2)
    assert(df.where(col("_bad").isNotNull).count() == 1)
    // same shred logic as the parquet path runs over the clean rows
    val toks = df.where(col("_bad").isNull)
      .select(graft.functions.TextFns.tokenCount(col("text")).as("n"))
      .as[Int].collect().sorted
    assert(toks.toSeq == Seq(1, 2))
  }
}
