package graft
import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileDedup2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val toks = graft.plans.Stage(docs.select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text"))).select(col("doc_id"), col("w"))
    val sh = graft.plans.Stage(toks, "sh", TextFns.shingles(col("w"), 3))
      .select(col("doc_id"), col("sh"))
    val sigs = sh.select(col("doc_id"),
      array((0 until 4).map(b => TextFns.minhashBand(col("sh"), b)): _*).as("keys"))
    (1 to 3).foreach(i => time(s"sigs $i") { sigs.agg(count(col("keys"))).count() })
    (1 to 3).foreach(i => time(s"candidates $i") { Dedup.minhashCandidates(docs).count() })
    val banded = sigs.select(col("doc_id"), posexplode(col("keys")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "key"))
    (1 to 2).foreach(i => time(s"banded $i") { banded.count() })
    val aj = banded.alias("a"); val bj = banded.alias("b")
    val joined = aj.join(bj, col("a.band") === col("b.band") && col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
    (1 to 2).foreach(i => time(s"join-no-distinct $i") { joined.count() })
    val candOnce = Dedup.minhashCandidates(docs)
    (1 to 3).foreach(i => time(s"candidates reused-plan $i") { candOnce.count() })
    (1 to 2).foreach(i => time(s"nearDupPairs $i") { Dedup.nearDupPairs(docs, 0.2).count() })
    spark.stop()
  }
}
