package graft

import graft.operators.{GraphAnn, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: recall/cost sweep for the graph-ANN serving knobs
  * (ef, hops, nEntries) and the build knobs (k, rounds) — the
  * ProfileOpqIvfPq pattern: measure BEFORE pinning the constants the
  * oracles encode. Run:
  *   sbt "runMain graft.ProfileGraph /root/testdata/sf0.1"
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    for ((k, rounds) <- Seq((8, 1), (8, 2), (12, 2))) {
      val t0 = System.nanoTime()
      val g = GraphAnn.buildGraph(emb, k = k, rounds = rounds).cache()
      val nEdges = g.count()
      val buildS = (System.nanoTime() - t0) / 1e9
      println(f"build k=$k rounds=$rounds edges=$nEdges ${buildS}%.1fs")
      for (ef <- Seq(32, 48, 64, 96); hops <- Seq(3, 4, 5); ent <- Seq(16)) {
        val t1 = System.nanoTime()
        val r = recall(GraphAnn.graphTopK(emb, g, k = 10, stride = 20,
          ef = ef, hops = hops, nEntries = ent))
        val qS = (System.nanoTime() - t1) / 1e9
        println(f"  k=$k r=$rounds ef=$ef hops=$hops ent=$ent  recall@10=$r%.3f  ${qS}%.1fs")
      }
      g.unpersist()
    }
    spark.stop()
  }
}
