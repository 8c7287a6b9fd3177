package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage cost attribution for the end-to-end curation pipeline
  * (pipeline_curate_full), for the scale-step question "which stage drives
  * the 10× growth curve?". Stages share plan fragments with the registered
  * query (Queries.curateGated / curateSurvivors), so the numbers attribute
  * the REAL plan, not a reconstruction.
  *
  * Stage timings overlap by construction — survivors includes the gate,
  * pairs includes survivors (cached after first materialization) — so read
  * deltas, not absolutes. Run twice; r2 is the warm number.
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      time(s"r$i gate")(noop(Queries.curateGated(spark, sfDir)))
      val survivors = Queries.curateSurvivors(spark, sfDir)
      time(s"r$i exact-dedup survivors")(noop(survivors))
      val pairs = Dedup.nearDupPairs(
        survivors.select(col("doc_id"), col("text")), 0.2)
      time(s"r$i neardup pairs")(noop(pairs))
      time(s"r$i docs_prep full")(
        noop(SparkEntry.queries("pipeline_docs_prep")(spark, sfDir)))
      time(s"r$i curate_full")(
        noop(SparkEntry.queries("pipeline_curate_full")(spark, sfDir)))
    }
    // Cap headroom on the real corpus: the band-bucket size distribution of
    // the post-exact-dedup survivors (what the LSH self-join actually sees).
    val survivors = Queries.curateSurvivorsFrom(Queries.curateGated(spark, sfDir))
    val dist = Dedup.oversizedBuckets(
        survivors.select(col("doc_id"), col("text")), 1)
      .agg(coalesce(max(col("bucket_n")), lit(0)).as("largest"),
        count(when(col("bucket_n") > 1000, 1)).as("over_default_cap"),
        count(lit(1)).as("multi_member_buckets"))
      .head()
    // coalesce above: max over an empty frame is null, and unboxing a null
    // Int would NPE on a corpus with no multi-member band buckets.
    println(s"[profile] band buckets: largest=${dist.getAs[Int]("largest")} " +
      s"over_default_cap=${dist.getAs[Long]("over_default_cap")} " +
      s"multi_member=${dist.getAs[Long]("multi_member_buckets")}")
    spark.stop()
  }
}
