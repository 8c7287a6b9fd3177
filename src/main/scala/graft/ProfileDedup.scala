package graft

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the minhash dedup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("tokens only") {
      docs.select(col("doc_id"), explode(array(TextFns.tokens(col("text")))).as("w"))
        .agg(sum(size(col("w")))).count()
    }
    val toks = graft.plans.Stage(docs.select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text"))).select(col("doc_id"), col("w"))
    val sh = graft.plans.Stage(toks, "sh", TextFns.shingles(col("w"), 3))
      .select(col("doc_id"), col("sh"))
    time("shingles (staged)") { sh.agg(sum(size(col("sh")))).count() }
    time("one minhash") {
      sh.select(col("doc_id"), TextFns.minhash(col("sh"), 0).as("m")).agg(count(col("m"))).count()
    }
    val sigs = sh.select(col("doc_id"),
      array((0 until 4).map(b => TextFns.minhashBand(col("sh"), b)): _*).as("keys"))
    time("8 minhashes (sigs)") { sigs.agg(count(col("keys"))).count() }
    time("banded + self-join + distinct (candidates)") {
      Dedup.minhashCandidates(docs).count()
    }
    time("full nearDupPairs") { Dedup.nearDupPairs(docs, 0.2).count() }
    spark.stop()
  }
}
