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

  test("schema evolution: mergeSchema unifies widened batches, old rows null the new column") {
    // The standing-dataset reality: a later drop adds a column. Parquet's
    // per-file schemas merge on read; pre-widening rows surface NULL and
    // filters on ORIGINAL columns still push down across both vintages.
    val out = java.nio.file.Files.createTempDirectory("fmt-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$out/batch=1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(s"$out/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(out)
    assert(df.columns.sorted.toSeq == Seq("batch", "id", "score", "v"))
    val rows = df.select("id", "score").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))
    // pushdown on a pre-evolution column reaches both file vintages
    val plan = df.where(col("id") === 3L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,3)"), plan)
    // filtering on the NEW column keeps old-vintage rows out without error
    assert(df.where(col("score") > 0).count() == 2)
  }
}
