package graft.operators

import graft.functions.SimFns._
import graft.plans.Stage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.10).
  *
  * Two paths, same contract (query_id, rank, neighbor_id, cosine):
  *  - [[bruteTopK]]: exact top-k — the correctness baseline. The query set
  *    is broadcast against the corpus scan, cosine is a codegen'd fold, and
  *    top-k is a per-query window. At 100 TB the corpus side stays
  *    partitioned-and-parallel; only |queries|×k rows survive the window.
  *  - [[ivfTopK]]: IVF-style scale path — the corpus is bucketed into cells
  *    by nearest centroid, and each query probes only its own cell
  *    (1/|cells| of the corpus). Centroids here are deterministic
  *    representatives (min vec_id per label) so results are exactly
  *    reproducible cross-engine; a production build would k-means them.
  *
  * Norms are precomputed once per side; the window's `orderBy` rounds the
  * cosine and tie-breaks on neighbor id so ranking is deterministic.
  */
object Similarity {

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** Exact brute-force top-k cosine for queries (vec_id ≡ 0 mod `stride`). */
  def bruteTopK(embeddings: DataFrame, k: Int, stride: Int): DataFrame = {
    val corpus = prepared(embeddings)
    val queries = corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Exact top-k via the bounded-heap aggregate ([[TopK]]) instead of a
    * rank window — the scale path: at most k rows per query survive the
    * map side, so the shuffle carries |queries|×k rows regardless of
    * corpus size. Same contract and results as [[bruteTopK]]. */
  def bruteTopKAgg(embeddings: DataFrame, k: Int, stride: Int): DataFrame = {
    val corpus = prepared(embeddings)
    val queries = corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 4)
          .as("cosine"))
    val tk = udaf(TopK.topK(k), org.apache.spark.sql.Encoders.product[TopK.Scored])
    scored.groupBy(col("query_id"))
      .agg(tk(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cosine"))
  }

  /** Random-hyperplane LSH planes: `nPlanes`×`dim` ±1 signs from a fixed
    * seed — data-independent constants shared verbatim with the DuckDB
    * oracle (interpolated as literals). */
  def lshPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** LSH-bucketed approximate top-k (the other classic ANN scale path next
    * to IVF): the sign pattern of `nPlanes` random-hyperplane projections
    * is the bucket key; a query probes only its own bucket (~N/2^nPlanes of
    * the corpus). Buckets are a plain `groupBy`-free equi-join key, so the
    * whole search is one hash join however large the corpus. */
  def lshTopK(embeddings: DataFrame, k: Int, stride: Int, nPlanes: Int = 6): DataFrame = {
    val dim = 64
    val planes = lshPlanes(nPlanes, dim)
    def bucketOf(v: Column): Column =
      (0 until nPlanes).map { p =>
        when(dot(v, typedLit(planes(p))) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    // Stage the double-cast vector: bucketOf references it nPlanes times.
    val corpus = Stage(
      embeddings.select(col("vec_id"), col("embedding")),
      "v", toDouble(col("embedding")))
      .select(col("vec_id"), col("v"),
        l2Norm(col("v")).as("nrm"), bucketOf(col("v")).as("bucket"))
    val queries = corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = corpus.join(broadcast(queries), "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF-bucketed approximate top-k: assign every vector to its nearest
    * deterministic centroid, then search only within the query's cell. */
  def ivfTopK(embeddings: DataFrame, k: Int, stride: Int): DataFrame = {
    val corpus = prepared(embeddings)
    // Deterministic centroids: the min-vec_id representative of each label.
    val reps = corpus
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("vec_id"))))
      .where(col("rn") === 1)
      .select(col("label").as("cell"), col("v").as("cv"), col("nrm").as("cnrm"))
    // Cell assignment: argmax cosine against the (broadcast) centroid set.
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(round(cosinePrenormed(dot(col("cv"), col("v")), col("cnrm"), col("nrm")), 6).desc,
        col("cell"))
    val assigned = corpus.crossJoin(broadcast(reps))
      .withColumn("crn", row_number().over(assignW))
      .where(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val queries = assigned.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cell"))
    val scored = assigned.join(broadcast(queries), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
