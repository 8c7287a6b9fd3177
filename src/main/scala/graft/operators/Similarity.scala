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

  /** Nearest-centroid assignment for IVF: (vec_id, v, nrm, cell) with cell
    * = argmax-cosine centroid (round-6, min-cell tie-break). `cents` must
    * have columns (cell, cv, cnrm), NON-NEGATIVE int cell ids, and be small
    * enough to broadcast.
    *
    * The argmax is a `min` over a single packed long — (1e6-scaled negated
    * round-6 cosine) · 2³² + cell — so the aggregation buffer is one
    * primitive and the plan is a whole-stage-codegen HashAggregate with a
    * map-side partial: each task reduces its |slice|×|cells| expansion to
    * one row per vec_id before the shuffle. (A struct-valued min or max_by
    * would fall back to SortAggregate; a row_number window — the shape this
    * replaced — shuffles and sorts the full expansion.) v/nrm ride along as
    * grouping keys, so no rejoin against the corpus is needed. */
  private[operators] def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val cellType = cents.schema("cell").dataType
    val negScaled = round(
      (lit(0.0) - round(
        cosinePrenormed(dot(col("cv"), col("v")), col("cnrm"), col("nrm")), 6))
        * lit(1e6), 0).cast("long")
    val packed = negScaled * lit(4294967296L) + col("cell").cast("long")
    corpus.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"), col("v"), col("nrm"))
      .agg(min(packed).as("best"))
      .select(col("vec_id"), col("v"), col("nrm"),
        pmod(col("best"), lit(4294967296L)).cast(cellType).as("cell"))
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
    // Cell assignment: argmax cosine against the (broadcast) centroid set,
    // as a partial-merging hash aggregate (see assignCells) — identical
    // ordering to the row_number window it replaces, but with no per-vec_id
    // shuffle+sort of the corpus×cells expansion.
    val assigned = assignCells(corpus, reps)
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
