package graft

import graft.operators.{Retrieval, Similarity, TextAnalysis}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 retrieval-tier measurements backing NOTES.md claims:
  *
  *  1. **Dense-leg recall, LSH vs brute** — `text_hybrid_lsh` /
  *     `pipeline_rag_lsh` put the fusion capstones' dense tier on the
  *     bucket equi-join; this records what that buys (plan) and costs
  *     (recall@10 of crossTopKLsh against the exact crossTopK, fused
  *     top-5 overlap, MRR of both fused variants on the leading-8
  *     qrels), so the twins ship with a measured trade, not a vibe.
  *  2. **pipeline_rag_eval per-stage split** — the one r11 10×-scale
  *     curve left unprofiled (2.3×): chunk build vs sparse tier vs
  *     dense tier vs full fuse+eval, at SPARK_GRAFT_SF_DIR (run once at
  *     sf0.1 and once at /tmp/sf1, compare per-stage ratios).
  *  3. **Delta vs absolute positional artifact bytes** — the storage
  *     claim behind the delta tier, measured on disk (parquet, snappy),
  *     plus warm decode wall for the linear PrefixSumI kernel.
  *
  * Measurement conventions: min-of-3 in one JVM, cache cleared per rep
  * (ProfileScaleWeak convention). Fixtures duplicate Queries' private
  * bmQueryTerms verbatim — a profile main, not engine surface.
  */
object ProfileRetrievalR12 {

  private val bmQueryTerms: Seq[(String, String)] = Seq(
    "q1" -> "table", "q1" -> "scan",
    "q2" -> "window", "q2" -> "agg",
    "q3" -> "join", "q3" -> "merge", "q3" -> "batch",
    "q4" -> "stream", "q4" -> "vector",
    "q5" -> "slow", "q5" -> "fast",
    "q6" -> "customer", "q6" -> "order")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[r12] $label: ${ts.map(_._1).min}%.2f s (rows=${ts.head._2}; " +
        f"reps=${ts.map(t => f"${t._1}%.2f").mkString(",")})")
    }

    println(s"[r12] sfDir=$sfDir")
    val docs = Tables.documents(spark, sfDir)

    // ── 1. dense-leg recall: crossTopKLsh vs crossTopK ──
    def docVecs(d: DataFrame): DataFrame =
      TextAnalysis.embedDocuments(d, dim = 16)
        .select(col("doc_id").as("vec_id"),
          transform(col("embedding"), _.cast("double")).as("embedding"))
        .where(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x) > 0)
    val qdocs = bmQueryTerms.groupBy(_._1).toSeq
      .map { case (q, ts) => (q.drop(1).toLong, ts.map(_._2).mkString(" ")) }
      .toDF("doc_id", "text")
    val corpus = docVecs(docs).persist()
    val qvecs = docVecs(qdocs).persist()
    val brute = Similarity.crossTopK(corpus, qvecs, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(label: String, ranked: DataFrame): Unit = {
      val got = ranked
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = brute.map { case (q, b) =>
        q -> (got.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size)
      }
      println(f"[r12] dense recall@10 ($label vs brute), per query: " +
        recalls.toSeq.sortBy(_._1)
          .map { case (q, r) => f"q$q=$r%.2f" }.mkString(" ") +
        f"; mean=${recalls.values.sum / recalls.size}%.3f")
    }
    recallOf("LSH 6 planes, own bucket",
      Similarity.crossTopKLsh(corpus, qvecs, k = 10, nPlanes = 6, dim = 16))
    recallOf("LSH 6 planes, MULTI-PROBE own+Hamming-1",
      Similarity.crossTopKLshMultiProbe(corpus, qvecs, k = 10,
        nPlanes = 6, dim = 16))
    // nPlanes sensitivity: the bucket-count/recall knob — fewer planes =
    // bigger buckets = higher recall at a larger scanned fraction
    // ((p+1)/2^p of bucket space for multi-probe)
    for (p <- Seq(4, 8)) {
      recallOf(s"LSH $p planes, own bucket",
        Similarity.crossTopKLsh(corpus, qvecs, k = 10, nPlanes = p, dim = 16))
      recallOf(s"LSH $p planes, MULTI-PROBE",
        Similarity.crossTopKLshMultiProbe(corpus, qvecs, k = 10,
          nPlanes = p, dim = 16))
    }

    // fused top-5 overlap + MRR of both fused variants on leading-8 qrels
    val fusedBrute = Queries.queries("text_hybrid_topk")(spark, sfDir)
      .select($"query_id", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fusedLsh = Queries.queries("text_hybrid_lsh")(spark, sfDir)
      .select($"query_id", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fOverlap = fusedBrute.map { case (q, b) =>
      q -> (fusedLsh.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size)
    }
    println(f"[r12] fused top-5 overlap (LSH vs brute dense leg): " +
      fOverlap.toSeq.sorted.map { case (q, r) => f"$q=$r%.2f" }.mkString(" ") +
      f"; mean=${fOverlap.values.sum / fOverlap.size}%.3f")
    def fusedMrr(name: String): DataFrame = {
      val q = bmQueryTerms.toDF("query_id", "term")
      val nterms = q.groupBy($"query_id")
        .agg(countDistinct($"term").as("n_terms"))
      val lead = graft.plans.Stage(docs.select($"doc_id", $"text"),
          "w", TextFns.tokens($"text"))
        .select($"doc_id", explode(array_distinct(slice($"w", 1, 8))).as("term"))
      val qrels = lead.join(broadcast(q), "term")
        .groupBy($"query_id", $"doc_id")
        .agg(countDistinct($"term").as("n_match"))
        .join(broadcast(nterms), "query_id")
        .where($"n_match" === $"n_terms")
        .select($"query_id", $"doc_id")
      Retrieval.evalRanking(
        Queries.queries(name)(spark, sfDir)
          .select($"query_id", $"doc_id", $"rnk"), qrels, k = 5)
    }
    for (n <- Seq("text_hybrid_topk", "text_hybrid_lsh")) {
      val rows = fusedMrr(n).select($"query_id", $"n_hits", $"mrr_bp")
        .as[(String, Long, Long)].collect().sortBy(_._1)
      println(s"[r12] $n eval (leading-8 qrels, k=5): " +
        rows.map { case (q, h, m) => s"$q hits=$h mrr=$m" }.mkString("; ") +
        f"; meanMRRbp=${rows.map(_._3).sum / rows.length}")
    }
    time("text_hybrid_topk (brute dense)")(
      Queries.queries("text_hybrid_topk")(spark, sfDir).count())
    time("text_hybrid_lsh (bucketed dense)")(
      Queries.queries("text_hybrid_lsh")(spark, sfDir).count())

    // ── 2. pipeline_rag_eval per-stage split ──
    def chunks: DataFrame =
      TextAnalysis.chunkDocuments(docs, chunkTokens = 128, overlap = 32)
        .select(concat($"doc_id".cast("string"), lit(":"),
            $"chunk_idx".cast("string")).as("doc_id"),
          $"chunk_text".as("text"))
    time("rag s1: chunk build (BPE window chain)")(chunks.count())
    time("rag s2: + sparse tier (bm25TopK over chunks)")(
      Retrieval.bm25TopK(chunks, bmQueryTerms.toDF("query_id", "term"),
        k = 10).count())
    time("rag s3: + dense tier (embed + crossTopK over chunks)")(
      Similarity.crossTopK(docVecs(chunks), qvecs, k = 10).count())
    time("rag s4: full pipeline_rag_eval (fuse + qrels + eval)")(
      Queries.queries("pipeline_rag_eval")(spark, sfDir).count())
    time("rag s4lsh: full pipeline_rag_lsh")(
      Queries.queries("pipeline_rag_lsh")(spark, sfDir).count())

    // ── 3. delta vs absolute positional artifact bytes ──
    val idx = Retrieval.positionalIndex(docs)
    val absPath = "/tmp/graft_prof_posidx_abs"
    val dltPath = "/tmp/graft_prof_posidx_delta"
    idx.write.mode("overwrite").parquet(absPath)
    Retrieval.positionalIndexDelta(idx).write.mode("overwrite").parquet(dltPath)
    def dirBytes(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(p))
    println(f"[r12] positional artifact bytes: absolute=${dirBytes(absPath)}%,d " +
      f"delta=${dirBytes(dltPath)}%,d " +
      f"ratio=${dirBytes(dltPath).toDouble / dirBytes(absPath)}%.3f")
    val delta = spark.read.parquet(dltPath)
    time("delta full decode (linear prefix_sum_i over the whole artifact)")(
      Retrieval.positionalIndexFromDelta(delta)
        .agg(sum(size($"positions"))).as[Long].head())

    // LONG-doc twin of the size measurement: postings delta compression
    // (IIR §5) pays off when absolute positions grow large while gaps
    // stay small — short-doc corpora (the testdata's ~100-token docs)
    // bit-pack both forms identically. 50× repeated text ⇒ ~5k-token
    // docs, frequent-term positions in the thousands, gaps unchanged.
    val longDocs = docs.limit(2000)
      .select($"doc_id", concat_ws(" ", array_repeat($"text", 50)).as("text"))
    val idxL = Retrieval.positionalIndex(longDocs)
    idxL.write.mode("overwrite").parquet(absPath + "_long")
    Retrieval.positionalIndexDelta(idxL)
      .write.mode("overwrite").parquet(dltPath + "_long")
    println(f"[r12] positional artifact bytes, 5k-token docs: " +
      f"absolute=${dirBytes(absPath + "_long")}%,d " +
      f"delta=${dirBytes(dltPath + "_long")}%,d " +
      f"ratio=${dirBytes(dltPath + "_long").toDouble / dirBytes(absPath + "_long")}%.3f")

    spark.stop()
  }
}
