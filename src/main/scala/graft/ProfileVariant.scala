package graft
import graft.operators.VariantOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the VARIANT tier's claim (operators.VariantOps): extracting k
  * fields from a JSON string costs k text parses with `get_json_object`,
  * ONE with `parse_json` → k × `variant_get` (codegen CSE dedups the
  * parse), and ZERO text parses when the variant was persisted to parquet
  * by an upstream job. Prints warm timings for all three at the same field
  * count, plus a 1-field column to separate parse cost from probe cost.
  */
object ProfileVariant {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    // Staged payload strings (forced once to parquet so every branch reads
    // the identical text column and synthesis cost is out of the timings).
    // Replicated 30x (distinct event_ids) so the sf0.1 events table gives a
    // parse-dominated measurement instead of scheduler noise.
    val reps = sys.env.getOrElse("GRAFT_VARIANT_REPS", "30").toInt
    val staged = java.nio.file.Files.createTempDirectory("variant-prof").toString
    VariantOps.eventPayload(Tables.events(spark, sfDir))
      .select(explode(array((0 until reps).map(lit): _*)).as("rep"),
        col("event_id"), col("payload"))
      .select((col("event_id") * reps + col("rep")).as("event_id"), col("payload"))
      .write.mode("overwrite").parquet(s"$staged/text")
    val text = spark.read.parquet(s"$staged/text")

    def g(f: String) = get_json_object(col("payload"), "$." + f)
    val viaJson = text.select(
      g("meta.uid").cast("bigint").as("uid"),
      g("meta.type").as("etype"),
      g("k").cast("int").as("k"),
      g("vals[1]").cast("double").as("val2"),
      g("tag").as("tag_str"),
      g("vals[0]").cast("double").as("val0"))
    val viaVariant = {
      val v = parse_json(col("payload"))
      text.select(
        variant_get(v, "$.meta.uid", "bigint").as("uid"),
        variant_get(v, "$.meta.type", "string").as("etype"),
        variant_get(v, "$.k", "int").as("k"),
        variant_get(v, "$.vals[1]", "double").as("val2"),
        variant_get(v, "$.tag", "string").as("tag_str"),
        variant_get(v, "$.vals[0]", "double").as("val0"))
    }
    // Upstream-persisted binary variant: the 100 TB steady state.
    text.select(col("event_id"), parse_json(col("payload")).as("v"))
      .write.mode("overwrite").parquet(s"$staged/binary")
    val binary = spark.read.parquet(s"$staged/binary").select(
      variant_get(col("v"), "$.meta.uid", "bigint").as("uid"),
      variant_get(col("v"), "$.meta.type", "string").as("etype"),
      variant_get(col("v"), "$.k", "int").as("k"),
      variant_get(col("v"), "$.vals[1]", "double").as("val2"),
      variant_get(col("v"), "$.tag", "string").as("tag_str"),
      variant_get(col("v"), "$.vals[0]", "double").as("val0"))

    // Touch EVERY extracted column — an aggregate over a subset would let
    // Catalyst prune the other extractions and undercount the parse work
    // (the count()-prunes-the-fixture lesson from the flagship attribution).
    // collect(), not count(): count() of a global aggregate short-circuits
    // to 1 without evaluating the sums.
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("uid")), sum(length(col("etype"))),
        sum(col("k")), sum(col("val2")),
        sum(length(col("tag_str"))), sum(col("val0"))).collect().length.toLong
    println(s"[profile] corpus rows: ${text.count()}")
    (1 to 3).foreach(i => time(s"get_json_object x6 fields $i")(force(viaJson)))
    (1 to 3).foreach(i => time(s"parse_json once + variant_get x6 $i")(force(viaVariant)))
    (1 to 3).foreach(i => time(s"persisted binary variant, variant_get x6 $i")(force(binary)))
    // 1-field variants to separate parse cost from probe cost.
    // Filter-after-shred shapes (the x_variant_shred question): (A) one
    // projection + where — Catalyst pushes the etype predicate into the
    // scan as a DataFilter that re-runs parse_json there, then the Project
    // parses again in the next stage (no CSE across stages); (B) the parse
    // staged behind a Generate barrier — structurally ONE parse, the
    // filter probes the materialized variant binary.
    def shredCols(v: org.apache.spark.sql.Column) = Seq(
      variant_get(v, "$.meta.uid", "bigint").as("uid"),
      variant_get(v, "$.meta.type", "string").as("etype"),
      variant_get(v, "$.k", "int").as("k"),
      variant_get(v, "$.vals[1]", "double").as("val2"),
      variant_get(v, "$.tag", "string").as("tag_str"),
      variant_get(v, "$.vals[0]", "double").as("val0"))
    val filteredA = text.select(shredCols(parse_json(col("payload"))): _*)
      .where(col("etype").isin("purchase", "click"))
    val filteredB = graft.plans.Stage(text.select(col("payload")), "v",
        parse_json(col("payload")))
      .select(shredCols(col("v")): _*)
      .where(col("etype").isin("purchase", "click"))
    (1 to 3).foreach(i => time(s"filter-after-shred, inline parse (A) $i")(force(filteredA)))
    (1 to 3).foreach(i => time(s"filter-after-shred, Stage-barriered parse (B) $i")(force(filteredB)))

    (1 to 3).foreach(i => time(s"get_json_object x1 $i") {
      text.select(g("meta.uid").cast("bigint").as("uid")).agg(sum("uid"))
        .collect().length.toLong
    })
    (1 to 3).foreach(i => time(s"variant_get x1 (parse inline) $i") {
      text.select(variant_get(parse_json(col("payload")), "$.meta.uid", "bigint")
        .as("uid")).agg(sum("uid")).collect().length.toLong
    })
    spark.stop()
  }
}
