package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r15 OPQ ∘ residual-IVF-PQ composition: recall@10 of
  * (a) unrotated residual IVF-PQ, (b) trained-OPQ-rotated residual
  * IVF-PQ, (c) flat trained-OPQ ADC (reference point), on the smeared
  * aniso fixture, across (nCells, nProbes) — picks the gain-pair
  * configuration before the oracle is pinned. */
object ProfileOpqIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Similarity.rotateEmbeddings(
      Similarity.synthesizeAniso(spark), Similarity.hadamard16)
    val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nQ = brute.select("query_id").distinct().count()
    def recall(cand: DataFrame): Double =
      brute.join(cand.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / (nQ * 10.0)

    val r = Similarity.opqTrainRotation(corpus, m = 8)
    val rotC = Similarity.rotateEmbeddings(corpus, r).cache()
    corpus.cache()

    for (nCells <- Seq(8, 10, 16); nProbes <- Seq(2, 3)) {
      val centsU = Similarity.kmeansCentroidArrays(corpus, nCells)
      val booksU = Similarity.pqTrainResidual(corpus, centsU, m = 8, ksub = 16)
      val codesU = Similarity.pqCodesWide(
        Similarity.ivfPqResidualEncode(corpus, centsU, booksU), Seq("cell"))
      val ru = recall(Similarity.ivfPqResidualTopKWide(codesU,
        corpus.where(pmod(col("vec_id"), lit(20)) === 0),
        centsU, booksU, k = 10, nProbes = nProbes))

      val centsR = Similarity.kmeansCentroidArrays(rotC, nCells)
      val booksR = Similarity.pqTrainResidual(rotC, centsR, m = 8, ksub = 16)
      val codesR = Similarity.pqCodesWide(
        Similarity.ivfPqResidualEncode(rotC, centsR, booksR), Seq("cell"))
      val rr = recall(Similarity.ivfPqResidualTopKWide(codesR,
        rotC.where(pmod(col("vec_id"), lit(20)) === 0),
        centsR, booksR, k = 10, nProbes = nProbes))
      println(f"[opqivfpq] nCells=$nCells%2d nProbes=$nProbes resid=$ru%.3f opq_resid=$rr%.3f")
    }
    // the CLUSTERED fixture (residual coding's home turf): does the
    // trained rotation add anything on top of residuals when the
    // cluster structure is real? (r15 probe for the r16 candidate)
    val fix = Similarity.synthesizeClustered(spark).cache()
    val fBrute = Similarity.bruteTopK(fix, k = 10, stride = 20)
      .select(col("query_id"), col("neighbor_id")).cache()
    val fN = fBrute.select("query_id").distinct().count()
    def fRecall(cand: org.apache.spark.sql.DataFrame): Double =
      fBrute.join(cand.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / (fN * 10.0)
    val fR = Similarity.opqTrainRotation(fix, m = 8)
    val fRot = Similarity.rotateEmbeddings(fix, fR).cache()
    for (kk <- Seq(8, 16)) {
      val cU = Similarity.kmeansCentroidArrays(fix, nCells = 8)
      val bU = Similarity.pqTrainResidual(fix, cU, m = 8, ksub = kk)
      val ru = fRecall(Similarity.ivfPqResidualTopKWide(
        Similarity.pqCodesWide(
          Similarity.ivfPqResidualEncode(fix, cU, bU), Seq("cell")),
        fix.where(pmod(col("vec_id"), lit(20)) === 0),
        cU, bU, k = 10, nProbes = 2))
      val cR = Similarity.kmeansCentroidArrays(fRot, nCells = 8)
      val bR = Similarity.pqTrainResidual(fRot, cR, m = 8, ksub = kk)
      val rr = fRecall(Similarity.opqIvfPqTopKWide(
        Similarity.opqIvfPqEncodeWide(fix, fR, cR, bR),
        fix.where(pmod(col("vec_id"), lit(20)) === 0),
        fR, cR, bR, k = 10, nProbes = 2))
      println(f"[opqivfpq] CLUSTERED ksub=$kk resid=$ru%.3f opq_resid=$rr%.3f")
    }
    spark.stop()
  }
}
