package graft

import graft.operators.{GraphAnn, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: serving-knob response at 10× corpus (sf1) — how much
  * ef/hops/entries must grow to hold recall as N grows, the FAISS
  * "size the probe budget to the corpus" guidance quantified for the
  * graph tier. Build uses the pinned construction (one graph). Run:
  *   sbt "runMain graft.ProfileGraphScale /tmp/sf1"
  */
object ProfileGraphScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir).cache()
    val brute = Similarity.bruteTopK(emb, k = 10, stride = 20)
      .select("query_id", "neighbor_id").cache()
    val nBrute = brute.count().toDouble

    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      brute.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count() / nBrute

    val t0 = System.nanoTime()
    val g = GraphAnn.buildGraph(emb).cache()
    val nEdges = g.count()
    println(f"build pinned k=${GraphAnn.K} rounds=${GraphAnn.Rounds} " +
      f"edges=$nEdges ${(System.nanoTime() - t0) / 1e9}%.1fs")
    for ((ef, hops, ent) <- Seq((64, 4, 16), (64, 6, 16), (128, 4, 16),
        (128, 6, 16), (128, 6, 64), (256, 6, 64), (256, 8, 64))) {
      val t1 = System.nanoTime()
      val r = recall(GraphAnn.graphTopK(emb, g, k = 10, stride = 20,
        ef = ef, hops = hops, nEntries = ent))
      println(f"  ef=$ef hops=$hops ent=$ent  recall@10=$r%.3f  " +
        f"${(System.nanoTime() - t1) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
