package graft

import graft.functions.{Bpe, DecodeFns, OddsFns, TextFns, TimeFns}
import graft.functions.SimFns.toDouble
import graft.operators._
import graft.sources.BettingFixture
import graft.streaming.{EventStreams, WagerBook}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense similarity: brute/IVF/LSH tiers, the quantized matrix
  * (PQ/OPQ/binary/SQ8/residual-IVFADC and their compositions),
  * Hamming dedup, semantic dedup, and the artifact catalog
  * (SURVEY §2.14). */
private[graft] trait QueriesSim extends QueriesRetrieval {

  protected val simBruteTopk = Q("sim_brute_topk",
    (s, dir) => Similarity.bruteTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) AS cosine
      |      FROM q CROSS JOIN n WHERE n.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** Same contract as sim_brute_topk, computed with the bounded-heap
    * aggregate instead of a rank window (the 100 TB shape: ≤k rows per
    * query cross the shuffle). Shares the brute-force oracle. */
  protected val simTopkAgg = Q("sim_topk_agg",
    (s, dir) => Similarity.bruteTopKAgg(Tables.embeddings(s, dir), k = 10, stride = 20),
    simBruteTopk.oracle, bench = true)

  protected val simIvfTopk = Q("sim_ivf_topk",
    (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |reps AS (
      |  SELECT label AS cell, v AS cv, nrm AS cnrm FROM (
      |    SELECT *, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn FROM n)
      |  WHERE rn = 1),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cell FROM (
      |    SELECT n.vec_id, n.v, n.nrm, reps.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(reps.cv, n.v) / (reps.cnrm * n.nrm), 6) DESC, reps.cell) AS crn
      |    FROM n CROSS JOIN reps)
      |  WHERE crn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell FROM assigned WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
      |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) AS cosine
      |      FROM q JOIN assigned a ON a.cell = q.cell WHERE a.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** DuckDB oracle for the trained-IVF paths: training is bit-deterministic
    * (candidates sorted, Lloyd means rounded to 6 dp — see
    * Similarity.kmeansCentroids), so the trained centroids interpolate into
    * the oracle as literals, exactly like the LSH planes; both engines then
    * derive norms, the round-6 argmax cell assignment (min-cell tie-break)
    * and the search identically. nProbes > 1 adds the multi-probe ranking
    * CTE (each query probes its nProbes nearest cells by centroid cosine). */
  protected def ivfTrainedOracle(spark: SparkSession, dir: String, nProbes: Int): String = {
    val cents = Similarity.kmeansCentroidArrays(
      Tables.embeddings(spark, dir), nCells = 10)
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    val qCte =
      if (nProbes <= 1)
        "q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell FROM assigned WHERE vec_id % 20 = 0)"
      else
        s"""q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM assigned WHERE vec_id % 20 = 0),
           |q AS (SELECT query_id, qv, qnrm, cell FROM (
           |    SELECT q0.query_id, q0.qv, q0.qnrm, cn.cell,
           |      row_number() OVER (PARTITION BY q0.query_id
           |        ORDER BY ROUND(list_dot_product(q0.qv, cn.cv) / (q0.qnrm * cn.cnrm), 6) DESC, cn.cell) AS pr
           |    FROM q0 CROSS JOIN cn)
           |  WHERE pr <= $nProbes)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |c(cell, cv) AS (VALUES
       |  $values),
       |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
       |assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
       |    FROM n CROSS JOIN cn)
       |  WHERE crn = 1),
       |$qCte,
       |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
       |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) AS cosine
       |      FROM q JOIN assigned a ON a.cell = q.cell WHERE a.vec_id != q.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** IVF over TRAINED k-means‖ cells (Similarity.ivfTopKKmeans) — the
    * production centroid path next to the deterministic-reps sim_ivf_topk.
    * Training is bit-deterministic since round 6, so the oracle is DERIVED
    * at verify time (trained centroids as literals, like the LSH planes);
    * recall@10 vs sim_brute_topk stays asserted in OperatorsSpec and
    * recorded in NOTES.md. */
  protected val simIvfKmeansTopk = Q("sim_ivf_kmeans_topk",
    (s, dir) => Similarity.ivfTopKKmeans(Tables.embeddings(s, dir),
      k = 10, stride = 20, nCells = 10),
    None, oracleFn = Some((s, dir) => ivfTrainedOracle(s, dir, nProbes = 1)))

  /** Multi-probe variant (each query probes its 3 nearest cells) — the IVF
    * recall knob; recall@10 at P=3 vs P=1 is asserted in OperatorsSpec and
    * recorded in NOTES.md. Derived oracle, like sim_ivf_kmeans_topk. */
  protected val simIvfMultiprobe = Q("sim_ivf_multiprobe",
    (s, dir) => Similarity.ivfTopKKmeans(Tables.embeddings(s, dir),
      k = 10, stride = 20, nCells = 10, nProbes = 3),
    None, oracleFn = Some((s, dir) => ivfTrainedOracle(s, dir, nProbes = 3)))

  /** SemDeDup semantic dedup (Similarity.semanticDedup — Abbas et al.
    * 2023): k-means cells scope the pairwise-cosine pass (never corpus
    * all-pairs), and within a cell every vector with a higher-priority
    * near-twin (round-4 cosine ≥ 0.2) is dropped — priority is the
    * paper's keep-farthest-from-centroid rule, vec_id on ties. Training
    * is bit-deterministic, so the oracle derives at verify time with the
    * trained centroids as literals (the sim_ivf_kmeans pattern) and
    * independently re-assigns, re-pairs and re-judges dominance. */
  /** The centroid-literal assignment CTEs shared by the semantic-dedup
    * oracles: e/n/c/cn/assigned over the embeddings table, `assigned`
    * carrying (vec_id, v, nrm, cell, cell_cos). */
  protected def semAssignedCtes(cents: Seq[Array[Double]]): String = {
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |c(cell, cv) AS (VALUES
      |  $values),
      |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cell, cell_cos FROM (
      |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
      |      ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) + 0.0 AS cell_cos,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
      |    FROM n CROSS JOIN cn)
      |  WHERE crn = 1)""".stripMargin
  }

  /** Dominated-vec_id subquery body over relation `rel` (the SemDeDup
    * drop rule: a same-cell near-twin farther from the centroid, vec_id
    * tie-break). */
  protected def semDominatedSql(rel: String): String =
    s"""SELECT DISTINCT x.vec_id
      |  FROM $rel x JOIN $rel y
      |    ON x.cell = y.cell AND x.vec_id <> y.vec_id
      |  WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) >= 0.2
      |    AND (y.cell_cos < x.cell_cos
      |      OR (y.cell_cos = x.cell_cos AND y.vec_id < x.vec_id))""".stripMargin



  protected val dedupSemantic = Q("dedup_semantic",
    (s, dir) => Similarity.semanticDedupWith(Tables.embeddings(s, dir),
      embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
      minCosine = 0.2),
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      s"""WITH ${semAssignedCtes(cents)},
        |dropped AS (${semDominatedSql("assigned")})
        |SELECT a.vec_id, a.cell, a.cell_cos,
        |  CAST(d.vec_id IS NULL AS INTEGER) AS is_survivor
        |FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id""".stripMargin
    })

  /** Incremental SemDeDup (Similarity.semanticDedupIncremental): the
    * batch (vec_id % 7 ≠ 0) probes a persisted SURVIVOR index built from
    * the history (vec_id % 7 = 0) with centroids trained on history only
    * — history vectors are never re-scored against each other and a
    * stored twin always drops the arrival (history immutable; the
    * first-seen posture of every incremental dedup tier here).
    * Batch-internal drops use the standard dominance rule. Derived
    * oracle re-runs both stages from the centroid literals. */
  protected val dedupSemanticIncr = Q("dedup_semantic_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = e.where(pmod(col("vec_id"), lit(7)) === 0)
      val cents = embCentroids(s, dir, "hist7", hist)
      Similarity.semanticDedupIncremental(
        e.where(pmod(col("vec_id"), lit(7)) =!= 0), cents,
        Similarity.semanticIndex(hist, cents, minCosine = 0.2),
        minCosine = 0.2)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "hist7",
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0))
      s"""WITH ${semAssignedCtes(cents)},
        |hist AS (SELECT * FROM assigned WHERE vec_id % 7 = 0),
        |hdrop AS (${semDominatedSql("hist")}),
        |hsurv AS (SELECT h.* FROM hist h LEFT JOIN hdrop d
        |  ON d.vec_id = h.vec_id WHERE d.vec_id IS NULL),
        |batch AS (SELECT * FROM assigned WHERE vec_id % 7 <> 0),
        |vhist AS (SELECT DISTINCT b.vec_id FROM batch b
        |  JOIN hsurv h ON b.cell = h.cell
        |  WHERE ROUND(list_dot_product(b.v, h.v) / (b.nrm * h.nrm), 4) >= 0.2),
        |bdrop AS (${semDominatedSql("batch")}),
        |drops AS (SELECT vec_id FROM vhist UNION SELECT vec_id FROM bdrop)
        |SELECT b.vec_id, b.cell, b.cell_cos,
        |  CAST(d.vec_id IS NULL AS INTEGER) AS is_survivor
        |FROM batch b LEFT JOIN drops d ON d.vec_id = b.vec_id""".stripMargin
    })

  /** Shared fixture for the incremental-IVF queries: train ONLY on history
    * (vec_id % 10 ≠ 0), persist through the centroidsToDF round-trip, then
    * assign history and the new batch against the LOADED index — no
    * retraining pass touches the batch. */
  protected def ivfIncrAssignments(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val hist = e.where(pmod(col("vec_id"), lit(10)) =!= 0)
    val index = Similarity.centroidsToDF(s,
      Similarity.kmeansCentroidArrays(hist, nCells = 10))
    Similarity.ivfAssignBatch(hist, index, "history")
      .unionByName(Similarity.ivfAssignBatch(
        e.where(pmod(col("vec_id"), lit(10)) === 0), index, "batch"))
  }

  /** The assignment/drift halves of the derived oracle share these CTEs:
    * centroids trained on history interpolate as literals (deterministic
    * training, as in ivfTrainedOracle), then DuckDB re-derives the round-6
    * argmax assignment of BOTH origins against that one index. */
  protected def ivfIncrAssignedCtes(spark: SparkSession, dir: String): String = {
    val cents = Similarity.kmeansCentroidArrays(
      Tables.embeddings(spark, dir).where(pmod(col("vec_id"), lit(10)) =!= 0),
      nCells = 10)
    val values = cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |c(cell, cv) AS (VALUES
       |  $values),
       |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
       |assigned AS (
       |  SELECT vec_id, cell, cell_cos,
       |    CASE WHEN vec_id % 10 = 0 THEN 'batch' ELSE 'history' END AS origin
       |  FROM (
       |    SELECT n.vec_id, cn.cell,
       |      ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) + 0.0 AS cell_cos,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
       |    FROM n CROSS JOIN cn)
       |  WHERE crn = 1)""".stripMargin
  }

  /** Incremental IVF maintenance (Similarity.ivfAssignBatch): the appended
    * assignment table after a new batch lands against the persisted
    * centroid index — the ANN leg of the incremental-index family
    * (dedup_exact_incr / dedup_minhash_incr / dedup_exact_substr_incr).
    * Derived oracle, same pattern as sim_ivf_kmeans_topk. */
  protected val simIvfIncr = Q("sim_ivf_incr",
    (s, dir) => ivfIncrAssignments(s, dir),
    None, oracleFn = Some { (s, dir) =>
      s"""${ivfIncrAssignedCtes(s, dir)}
         |SELECT vec_id, cell, cell_cos, origin FROM assigned""".stripMargin
    })
  // (not bench-flagged: the registered form re-trains k-means per call for
  // oracle determinism, so its wall is training-dominated — redundant with
  // sim_ivf_topk's benched assignment path and it would inflate the bench
  // total ~25% with no new plan signal)

  /** The drift gate over the same appended table
    * (Similarity.ivfDriftSignal): integral weak-share basis points per
    * origin and the retrain flag. */
  protected val simIvfDrift = Q("sim_ivf_drift",
    (s, dir) => Similarity.ivfDriftSignal(ivfIncrAssignments(s, dir)),
    None, oracleFn = Some { (s, dir) =>
      s"""${ivfIncrAssignedCtes(s, dir)},
         |shares AS (
         |  SELECT origin, (sum(CASE WHEN cell_cos < 0.7 THEN 1 ELSE 0 END) * 10000)
         |      // count(*) AS weak_bp
         |  FROM assigned GROUP BY origin)
         |SELECT
         |  CAST(max(CASE WHEN origin = 'history' THEN weak_bp END) AS BIGINT) AS hist_weak_bp,
         |  CAST(max(CASE WHEN origin = 'batch' THEN weak_bp END) AS BIGINT) AS batch_weak_bp,
         |  CAST(max(CASE WHEN origin = 'batch' THEN weak_bp END)
         |    - max(CASE WHEN origin = 'history' THEN weak_bp END) AS BIGINT) AS degradation_bp,
         |  CAST(CASE WHEN max(CASE WHEN origin = 'batch' THEN weak_bp END)
         |    - max(CASE WHEN origin = 'history' THEN weak_bp END) > 500
         |    THEN 1 ELSE 0 END AS INTEGER) AS retrain
         |FROM shares""".stripMargin
    })

  protected val simLshTopk = Q("sim_lsh_topk",
    (s, dir) => Similarity.lshTopK(Tables.embeddings(s, dir), k = 10, stride = 20),
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 20 = 0),
        |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm), 4) AS cosine
        |      FROM q JOIN n USING (bucket) WHERE n.vec_id != q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    }, bench = true)

  /** Multi-probe LSH (own bucket + every Hamming-1 bucket per query) —
    * the deterministic ANN recall knob, oracle-checked unlike the trained
    * IVF paths. Probe list is query-side only; corpus joins by its single
    * bucket key, so no pair dedup is needed. */
  protected val simLshMultiprobe = Q("sim_lsh_multiprobe",
    (s, dir) => Similarity.lshTopKMultiProbe(Tables.embeddings(s, dir),
      k = 10, stride = 20),
    Some {
      val planes = Similarity.lshPlanes(6, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM n WHERE vec_id % 20 = 0),
        |probes AS (SELECT query_id, qv, qnrm, xor(bucket, flip) AS bucket
        |           FROM q CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip)),
        |s AS (SELECT p.query_id, n.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(p.qv, n.v) / (p.qnrm * n.nrm), 4) AS cosine
        |      FROM probes p JOIN n USING (bucket) WHERE n.vec_id != p.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Embedding int8 quantization stats: per-vector scale + checksum of the
    * quantized values. Quantization uses `floor(x·127/max + 0.5)` — the
    * same IEEE product floored identically in both engines (a `round()`
    * call would hit the half-boundary algorithm split found earlier). */
  protected val simQuantize = Q("sim_quantize",
    (s, dir) => {
      val v = toDouble(col("embedding"))
      val maxAbs = array_max(transform(v, x => abs(x)))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        maxAbs.as("max_abs"),
        aggregate(
          transform(v, x => floor(x * lit(127.0) / maxAbs + lit(0.5)).cast("long")),
          lit(0L), (acc, q) => acc + q).as("q_checksum"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e)
      |SELECT vec_id, max_abs,
      |  CAST(list_sum(list_transform(v, x -> CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT))) AS BIGINT) AS q_checksum
      |FROM m""".stripMargin))

  /** Trained PQ codebooks for the embeddings table — persisted per sfDir
    * as a pqBooksToDF parquet artifact (the embCentroids posture): m=8
    * subspaces × ksub=16 codes over dim 64, trained once on a bounded
    * deterministic sample, loaded by query fn + derived oracle + later
    * JVMs alike. */
  protected val pqBooksCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Seq[Array[Double]]]]()
  protected def pqBooksFor(s: SparkSession, dir: String, key: String,
      frame: => DataFrame): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, key),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, s"pq_books_${key}_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrain(frame, m = 8, ksub = 16)))))
  protected def pqBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksFor(s, dir, "all", Tables.embeddings(s, dir))

  /** Persisted all-corpus PQ code tables (VERDICT r13 #1) — the flat ADC
    * family's stored index, the posture every other expensive tier
    * already has: the corpus encodes ONCE per (data fingerprint,
    * codebooks) and every search (and every later JVM — Verify builds,
    * Bench reads warm) loads m ints per vector instead of re-running
    * the packed-min argmin aggregate over the raw vectors. At 100 TB
    * the difference is a code-table scan vs a full corpus re-encode per
    * query batch. The wide variant additionally persists the
    * one-row-per-vector array<int> layout the AdcSumL kernel reads. */
  protected def pqCodesAll(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir, "pq_codes_all_m8_k16", "embeddings")(
      Similarity.pqEncode(Tables.embeddings(s, dir), pqBooks(s, dir)))
  protected def pqCodesAllWide(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir, "pq_codes_all_wide_m8_k16", "embeddings")(
      // fused kernel (r15): one zero-shuffle projection over the raw
      // table — identical content to the narrow-artifact reshape it
      // replaced (parity spec; artifact name/fingerprint unchanged)
      Similarity.pqEncodeWideDirect(Tables.embeddings(s, dir), pqBooks(s, dir)))

  /** Shared derived-oracle CTE block for the PQ family: codebook VALUES
    * literals with self-dots, per-subspace corpus slices, and the encode
    * relation `enc(vec_id, sub, code)` — round-6 micro-L2 argmin with
    * the same (d2u, code) total order the packed-min aggregate uses. */
  protected def pqCtes(books: Seq[Seq[Array[Double]]],
      srcSql: String = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"): String = {
    val values = books.zipWithIndex.flatMap { case (cs, sub) =>
      cs.zipWithIndex.map { case (c, code) =>
        s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
    }.mkString(",\n  ")
    s"""cbv(sub, code, cv) AS (VALUES
      |  $values),
      |cb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM cbv),
      |e AS ($srcSql),
      |sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 8 + 1, r.range * 8 + 8) AS xs
      |  FROM e CROSS JOIN range(0, 8) r),
      |sd AS (SELECT vec_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM sv JOIN cb USING (sub)),
      |enc AS (SELECT vec_id, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM sd)
      |  WHERE rn = 1)""".stripMargin
  }

  /** PQ encode (Similarity.pqEncode): the corpus as (vec_id, sub, code) —
    * m codes per vector against the persisted codebooks. THIS relation is
    * what a 100 TB deployment stores and searches (m bytes instead of D
    * floats per vector); the derived oracle re-runs the round-6 micro-L2
    * argmin from the codebook literals. */
  protected val simPqCodes = Q("sim_pq_codes",
    (s, dir) => pqCodesAll(s, dir),
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))}
        |SELECT vec_id, sub, code FROM enc""".stripMargin
    })

  /** PQ asymmetric-distance top-k (Similarity.pqTopKAdc): queries
    * (vec_id ≡ 0 mod 20, raw vectors) search the ENCODED corpus — the
    * query expands to its exact per-(sub, code) distance LUT once, and
    * every corpus vector scores as m integer lookups + adds, never
    * touching the stored vectors. Integer micro-L2 end to end ⇒
    * hash-exact vs the DuckDB re-derivation from the same literals. */
  protected val simPqTopk = Q("sim_pq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKAdc(pqCodesAll(s, dir),
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        pqBooks(s, dir), k = 10)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** PQ ADC + exact re-rank (Similarity.pqTopKRefined, the "+R"
    * refinement): the corpus-wide pass runs on CODES (ADC shortlist of
    * 50 per query), then only the |queries|×50 shortlisted vectors are
    * read back for an exact round-4 cosine top-10 — crossTopK's output
    * contract from a fraction of its vector reads. Recall vs brute is
    * measured in ProfilePq / NOTES; determinism is oracled end to end
    * from the codebook literals. */
  protected val simPqRerank = Q("sim_pq_rerank",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKRefined(pqCodesAll(s, dir), e,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        pqBooks(s, dir), k = 10, shortlist = 50)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 50),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv,
        |    sqrt(list_dot_product(v, v)) AS qnrm FROM e
        |  WHERE vec_id % 20 = 0 AND list_dot_product(v, v) > 0),
        |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM sl JOIN n ON n.vec_id = sl.vec_id
        |    JOIN qn ON qn.query_id = sl.query_id),
        |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM rr WHERE rank <= 10""".stripMargin
    })

  /** EXACT Hamming near-dup pairs via pigeonhole banding
    * (Similarity.hammingNearDupPairs) — the dedup-family face of the
    * sign-bit tier, run on the CLUSTERED fixture where same-cluster
    * vectors share most of their sign pattern: 4-bit bands over the
    * 16 real sign bits give nBands = 4 > maxHamming = 3, so the banded
    * equi-join provably misses nothing and the verified result is the
    * EXACT Hamming-threshold self-join — the MinHash-banding shape with
    * a guarantee instead of a probability. The oracle brute-counts sign
    * disagreements over all pairs (560² is nothing in DuckDB; the
    * Spark side never forms that product — bands cover only the dim
    * REAL bits, because a band over the packed word's always-zero tail
    * matches every pair and quietly degenerates the join). */
  protected val dedupHammingPairs = Q("dedup_hamming_pairs",
    (s, dir) =>
      Similarity.hammingNearDupPairs(Similarity.synthesizeClustered(s),
        dim = 16, maxHamming = 3, bandBits = 4),
    Some("""WITH fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(a.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM fix a JOIN fix b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, hamming FROM p WHERE hamming <= 3""".stripMargin))

  /** Incremental exact-Hamming dedup (Similarity
    * .hammingNearDupIncremental) — the stored-index twin of
    * dedup_hamming_pairs: the HISTORY code table (vec_id ≡ 0 mod 7 of
    * the fixture) is a write-once parquet artifact (16 B/vector; bands
    * re-derive from it on load — the index IS the code table); a batch
    * encodes fresh, joins its bands against the stored side plus
    * itself, and every surviving pair verifies exactly. History is
    * never re-encoded and never self-joined. Oracle brute-splits the
    * same corpus by origin. */
  protected val dedupHammingIncr = Q("dedup_hamming_incr",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val hist = parquetArtifact(s, dir, "binq_codes_fixture_hist7",
        "embeddings")(Similarity.hammingCodesChecked(
        fix.where(pmod(col("vec_id"), lit(7)) === 0), dim = 16))
      Similarity.hammingNearDupIncremental(
        fix.where(pmod(col("vec_id"), lit(7)) =!= 0), hist,
        dim = 16, maxHamming = 3, bandBits = 4)
    },
    Some("""WITH fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |b AS (SELECT * FROM fix WHERE vec_id % 7 <> 0),
      |h AS (SELECT * FROM fix WHERE vec_id % 7 = 0),
      |ph AS (SELECT b.vec_id AS vec_a, h.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(b.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (h.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM b CROSS JOIN h),
      |pb AS (SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
      |    CAST(list_sum(list_transform(a.v,
      |      (x, i) -> CASE WHEN (x > 0) <> (b2.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM b a JOIN b b2 ON a.vec_id < b2.vec_id)
      |SELECT vec_a, vec_b, hamming, 'history' AS origin FROM ph WHERE hamming <= 3
      |UNION ALL
      |SELECT vec_a, vec_b, hamming, 'batch' AS origin FROM pb WHERE hamming <= 3""".stripMargin))

  /** dedup_hamming_incr through the persisted band-key bloom prefilter
    * (the dedup_minhash_incr_bloom posture): bloom-negative batch band
    * keys never reach the history join — exact, because an inner join
    * drops them anyway — so the oracle is IDENTICAL to the unfiltered
    * twin's and the pigeonhole guarantee is untouched. */
  protected val dedupHammingIncrBloom = Q("dedup_hamming_incr_bloom",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val hist = parquetArtifact(s, dir, "binq_codes_fixture_hist7",
        "embeddings")(Similarity.hammingCodesChecked(
        fix.where(pmod(col("vec_id"), lit(7)) === 0), dim = 16))
      val bloom = Similarity.buildHammingBandBloom(hist, dim = 16,
        bandBits = 4, expectedItems = 1 << 12)
      Similarity.hammingNearDupIncremental(
        fix.where(pmod(col("vec_id"), lit(7)) =!= 0), hist,
        dim = 16, maxHamming = 3, bandBits = 4,
        historyBandBloom = Some(bloom))
    },
    dedupHammingIncr.oracle, bench = true)

  /** Connected components over the EXACT Hamming near-dup graph — the
    * cluster face of the quantized dedup tier (dedup_clusters for
    * minhash, dedup_embedding_clusters for cosine-LSH): min-label
    * propagation over dedup_hamming_pairs' edge set labels every
    * near-dup family with its minimum vec_id. maxHamming = 1 here (the
    * bound probed before shipping: at 3 the sign families CHAIN into 2
    * super-components; at 1 the 560 vectors resolve into 7 families ≈
    * the 8 planted clusters, adjacent sign patterns merged) — the
    * pipeline pairs → components works end-to-end on 16-byte codes.
    * Oracle = the recursive-closure pattern over the brute pair set. */
  protected val dedupHammingClusters = Q("dedup_hamming_clusters",
    (s, dir) => Dedup.components(
      Similarity.hammingNearDupPairs(Similarity.synthesizeClustered(s),
          dim = 16, maxHamming = 1, bandBits = 4)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster")),
    Some("""WITH RECURSIVE fix AS (SELECT r.range AS vec_id,
      |    list_transform(generate_series(0, 15), d ->
      |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
      |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
      |  FROM range(0, 560) r),
      |pairs AS MATERIALIZED (SELECT vec_a, vec_b FROM (
      |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |      CAST(list_sum(list_transform(a.v,
      |        (x, i) -> CASE WHEN (x > 0) <> (b.v[i] > 0) THEN 1 ELSE 0 END))
      |        AS INTEGER) AS hamming
      |    FROM fix a JOIN fix b ON a.vec_id < b.vec_id)
      |  WHERE hamming <= 1),
      |edges AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM pairs
      |          UNION ALL SELECT vec_b, vec_a FROM pairs),
      |reach AS (SELECT a AS node, b AS reached FROM edges
      |          UNION SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached)
      |SELECT node AS vec_id, least(node, min(reached)) AS cluster
      |FROM reach GROUP BY node""".stripMargin))

  /** Oracled recall for the flat-PQ "+R" tier — the last quantized
    * serving face without a hash-checked recall figure (binq/sq8 have
    * sim_binq_recall/sim_sq8_recall; residual/OPQ are oracled on the
    * planted fixtures): per-query overlap between the exact brute
    * top-10 and pqTopKRefined's top-10 at shortlist 200 (ProfilePq:
    * 0.768 aggregate at m8k16). Both rankings deterministic, so the
    * recall figures themselves hash-check against DuckDB's
    * re-derivation of both chains from the codebook literals. */
  protected val simPqRecall = Q("sim_pq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val pq = Similarity.pqTopKRefined(pqCodesAll(s, dir), e,
          e.where(pmod(col("vec_id"), lit(20)) === 0),
          pqBooks(s, dir), k = 10, shortlist = 200)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(pq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nn
        |  WHERE vec_id % 20 = 0),
        |bbs AS (SELECT qn.query_id, nn.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN nn WHERE nn.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bbs)
        |  WHERE rank <= 10),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM qn CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 200),
        |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM sl JOIN nn ON nn.vec_id = sl.vec_id
        |    JOIN qn ON qn.query_id = sl.query_id),
        |pq AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
        |  WHERE rank <= 10),
        |hits AS (SELECT b.query_id, count(*) AS n_overlap
        |  FROM brute b JOIN pq USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
        |FROM base LEFT JOIN hits USING (query_id)""".stripMargin
    })

  /** Incremental PQ index maintenance — the code-table sibling of
    * sim_ivf_incr: codebooks train on HISTORY only (vec_id ≡ 0 mod 7)
    * and persist; the history CODE TABLE is itself a parquet artifact
    * (encoded once, never re-encoded); a new batch encodes against the
    * LOADED codebooks — one broadcast + one packed-min aggregate per
    * batch, history vectors never rescanned — and appends with its
    * origin tag. Derived oracle re-encodes every row from the
    * history-trained literals (encode is per-row, so one enc relation
    * serves both origins). */
  protected val simPqIncr = Q("sim_pq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val books = pqBooksFor(s, dir, "hist7",
        e.where(pmod(col("vec_id"), lit(7)) === 0))
      val histCodes = parquetArtifact(s, dir, "pq_codes_hist7", "embeddings")(
        Similarity.pqEncode(e.where(pmod(col("vec_id"), lit(7)) === 0), books))
      histCodes.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.pqEncode(e.where(pmod(col("vec_id"), lit(7)) =!= 0), books)
            .withColumn("origin", lit("batch")))
    },
    None, oracleFn = Some { (s, dir) =>
      val books = pqBooksFor(s, dir, "hist7",
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0))
      s"""WITH ${pqCtes(books)}
        |SELECT vec_id, sub, code,
        |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
        |FROM enc""".stripMargin
    })

  /** TRAINED-OPQ index on the REAL embeddings table — the production
    * face of sim_opq_trained (which proves the quality claim on the
    * planted fixture): the rotation trains once on the bounded sample
    * and persists (centroidsToDF layout — row index as `cell`), the
    * ROTATED code table persists (the pq_codes_all posture), and the
    * search is plain ADC over stored codes with rotated queries. On
    * this near-uniform corpus the rotation is ~recall-neutral
    * (ProfileQuant sf0.1: plain 0.162 vs OPQ 0.174 — the covariance is
    * already ~isotropic); the point here is the
    * operating pipeline: rotate → encode once → search codes, all
    * artifacts write-once, oracle re-derives rotation + encode + ADC
    * from the persisted literals end to end. */
  protected def opqEmbR(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir + "#opqrot",
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "opq_rot_emb_m8", "embeddings")(
          Similarity.centroidsToDF(s,
            Similarity.opqTrainRotation(Tables.embeddings(s, dir), m = 8)))))
  protected def opqEmbRotated(s: SparkSession, dir: String): DataFrame =
    Similarity.rotateEmbeddings(Tables.embeddings(s, dir), opqEmbR(s, dir))
  protected def opqEmbBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksFor(s, dir, "opqrot", opqEmbRotated(s, dir))
  protected val simOpqTopk = Q("sim_opq_topk",
    (s, dir) => {
      // WIDE layout (bit-identical to narrow, same oracle): one stored
      // array<int> row per vector and one adc_sum_l per pair — the
      // narrow twin's per-(query, vec) re-aggregation is the measured
      // sf1 bottleneck (85 s narrow vs ~32 s wide, NOTES r14)
      val codesWide = parquetArtifact(s, dir, "pq_codes_opqrot_wide_m8_k16",
        "embeddings")(Similarity.pqEncodeWideDirect(
        opqEmbRotated(s, dir), opqEmbBooks(s, dir)))
      Similarity.pqTopKAdcWide(codesWide,
        opqEmbRotated(s, dir).where(pmod(col("vec_id"), lit(20)) === 0),
        opqEmbBooks(s, dir), k = 10)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |${pqCtes(opqEmbBooks(s, dir), "SELECT vec_id, v FROM rot")},
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    }, bench = true)

  /** Incremental OPQ maintenance — the rotated-code sibling of
    * sim_pq_incr: rotation AND codebooks train on HISTORY only
    * (vec_id ≡ 0 mod 7) and persist; the history ROTATED code table is
    * a write-once artifact; a new batch rotates + encodes against the
    * LOADED artifacts and appends origin-tagged — history vectors never
    * rescanned, the rotation never retrained per batch. Derived oracle
    * re-rotates and re-encodes every row from the history-trained
    * literals. */
  protected def opqHistR(s: SparkSession, dir: String): Seq[Array[Double]] =
    docCentroidArtifactCache.computeIfAbsent(dir + "#opqrot_hist7",
      _ => Similarity.centroidsFromDF(
        parquetArtifact(s, dir, "opq_rot_hist7_m8", "embeddings")(
          Similarity.centroidsToDF(s,
            Similarity.opqTrainRotation(
              Tables.embeddings(s, dir)
                .where(pmod(col("vec_id"), lit(7)) === 0), m = 8)))))
  protected val simOpqIncr = Q("sim_opq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val r = opqHistR(s, dir)
      def rot(df: DataFrame): DataFrame = Similarity.rotateEmbeddings(df, r)
      val books = pqBooksFor(s, dir, "opqrot_hist7",
        rot(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      val histCodes = parquetArtifact(s, dir, "opq_codes_hist7_m8_k16",
        "embeddings")(
        Similarity.pqEncode(rot(e.where(pmod(col("vec_id"), lit(7)) === 0)), books))
      histCodes.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.pqEncode(rot(e.where(pmod(col("vec_id"), lit(7)) =!= 0)), books)
            .withColumn("origin", lit("batch")))
    },
    None, oracleFn = Some { (s, dir) =>
      val r = opqHistR(s, dir)
      val books = pqBooksFor(s, dir, "opqrot_hist7",
        Similarity.rotateEmbeddings(
          Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0), r))
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(r)}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(x.rv, e0.v0) ORDER BY x.i) AS v
        |  FROM e0 CROSS JOIN rm x GROUP BY e0.vec_id),
        |${pqCtes(books, "SELECT vec_id, v FROM rot")}
        |SELECT vec_id, sub, code,
        |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
        |FROM enc""".stripMargin
    })

  /** Oracle-gated recall for the OPQ serving tier (VERDICT r14 #2) — the
    * last quantized serving face without a hash-checked recall figure
    * (pq/binq/sq8 have sim_*_recall rows; the OPQ number lived only in
    * ProfileQuant): per-query overlap between the exact brute top-10
    * over the RAW embeddings and sim_opq_topk's ADC top-10 over the
    * PERSISTED rotated code artifact (rotated queries, stored codes —
    * the serving face itself, no rerank). Both rankings deterministic,
    * so the recall figures hash-check against DuckDB's re-derivation of
    * both chains from the rotation + codebook literals. On this
    * near-uniform corpus the figure is low by construction (~0.17,
    * ProfileQuant — 16-byte codes over 64 near-isotropic dims); the
    * contract is that the figure is ORACLED, not that it is high — the
    * quality claim lives on the planted fixture (sim_opq_trained). */
  protected val simOpqRecall = Q("sim_opq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesWide = parquetArtifact(s, dir, "pq_codes_opqrot_wide_m8_k16",
        "embeddings")(Similarity.pqEncodeWideDirect(
        opqEmbRotated(s, dir), opqEmbBooks(s, dir)))
      val opq = Similarity.pqTopKAdcWide(codesWide,
          opqEmbRotated(s, dir).where(pmod(col("vec_id"), lit(20)) === 0),
          opqEmbBooks(s, dir), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(opq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |${pqCtes(opqEmbBooks(s, dir), "SELECT vec_id, v FROM rot")},
        |nn AS (SELECT vec_id, v0 AS v, sqrt(list_dot_product(v0, v0)) AS nrm
        |  FROM e0 WHERE list_dot_product(v0, v0) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nn
        |  WHERE vec_id % 20 = 0),
        |bbs AS (SELECT qn.query_id, nn.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN nn WHERE nn.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bbs)
        |  WHERE rank <= 10),
        |q AS (SELECT vec_id AS query_id, v AS rqv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l USING (sub, code)
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |opq AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM sc)
        |  WHERE rank <= 10),
        |hits AS (SELECT b.query_id, count(*) AS n_overlap
        |  FROM brute b JOIN opq USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
        |FROM base LEFT JOIN hits USING (query_id)""".stripMargin
    })

  /** IVF-PQ composition (Similarity.ivfPqTopK): cell-probed ADC — the
    * corpus is cell-assigned against the persisted embedding centroids
    * AND PQ-encoded against the persisted codebooks; a query probes its
    * 3 nearest cells and scores only those cells' CODES. Both pruning
    * structures are loaded artifacts; the derived oracle re-runs
    * assignment, probe ranking and ADC from the two literal sets. */
  protected val simIvfpqTopk = Q("sim_ivfpq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(e,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
        pqBooks(s, dir), k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH ${pqCtes(pqBooks(s, dir))},
        |c2(cell, w) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 3),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM q CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN asgn a ON a.vec_id = enc.vec_id
        |    JOIN pb ON pb.cell = a.cell
        |    JOIN lut l ON l.query_id = pb.query_id
        |      AND l.sub = enc.sub AND l.code = enc.code
        |  WHERE enc.vec_id <> pb.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** IVF cell-balance audit — the hot-key audit the other bucketed
    * families already have (Dedup.oversizedBuckets for MinHash bands,
    * oversizedJoinKeys for ER blocks): per cell of the PERSISTED index,
    * the member count, its share in basis points, and a hot flag at
    * 3× the even share — a skewed cell is a hot partition at 100 TB
    * (every probe of it scans outsize data), and the audit reads the
    * same assignment relation the searches use. Integral arithmetic ⇒
    * hash-exact; derived oracle re-assigns from the centroid
    * literals. */
  protected val simIvfBalance = Q("sim_ivf_balance",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val counts = Similarity.kmeansAssignWith(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("cell"), col("n"),
          // integral div BY CONSTRUCTION (the file's `div` convention):
          // double-divide + cast truncates, which only equals the
          // oracle's floor `//` while IEEE rounding never lands just
          // above an integer boundary (ADVICE r13)
          expr("n * 10000 div total").as("share_bp"),
          (col("n") * lit(cents.size.toLong) > lit(3L) * col("total"))
            .as("hot"))
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |cnt AS (SELECT cell, count(*) AS n FROM asgn GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
        |SELECT cell, CAST(n AS BIGINT) AS n,
        |  CAST(n * 10000 // total AS BIGINT) AS share_bp,
        |  n * ${cents.size} > 3 * total AS hot
        |FROM cnt, t""".stripMargin
    })

  /** FILTERED ANN against the persisted index — the production pattern
    * where a metadata predicate (here label = 1) composes with the
    * TRAINED index instead of forcing a rebuild: the SAME persisted
    * "all"-corpus centroids serve the filtered search, the predicate
    * lands on the (stored) assignment rows before the cell equi-join,
    * and queries probe exactly as in the unfiltered path. At 100 TB
    * this is a parquet filter on the assignment table — pushdown-
    * friendly, index untouched. Derived oracle from the same centroid
    * literals with the label predicate in the assigned CTE. */
  protected val simIvfFiltered = Q("sim_ivf_filtered",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.crossTopKIvf(e.where(col("label") === 1),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10,
        embCentroids(s, dir, "all", e), nProbes = 2)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val values = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c(cell, cv) AS (VALUES
        |  $values),
        |cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.cv, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn WHERE n.label = 1)
        |  WHERE crn = 1),
        |q AS (SELECT query_id, qv, qnrm, cell FROM (
        |    SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qnrm, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.cv) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 2),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |        ROUND(list_dot_product(q.qv, a.v) / (q.qnrm * a.nrm), 4) + 0.0 AS cosine
        |      FROM q JOIN assigned a ON a.cell = q.cell),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** Binary (sign-bit) code table (Similarity.binqEncode, exploded to
    * (vec_id, w_idx, word) rows — the storable relation): each BIGINT
    * word packs 32 sign bits, dim/8 bytes per vector instead of 4·dim
    * float bytes. The oracle re-derives every word as the sum of
    * 2^((i−1) mod 32) over the word's strictly-positive dims — pinning
    * the exact bit layout, not just a checksum. */
  protected val simBinqCodes = Q("sim_binq_codes",
    (s, dir) => Similarity.binqEncode(Tables.embeddings(s, dir))
      .select(col("vec_id"), posexplode(col("bw")))
      .select(col("vec_id"), col("pos").cast("int").as("w_idx"),
        col("col").as("word")),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT vec_id,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM e)
      |SELECT vec_id, CAST((i - 1) // 32 AS INTEGER) AS w_idx,
      |  CAST(sum(CASE WHEN x > 0 THEN 1::BIGINT << ((i - 1) % 32)
      |           ELSE 0::BIGINT END) AS BIGINT) AS word
      |FROM x GROUP BY 1, 2""".stripMargin))

  /** Hamming top-k over the sign-bit codes (Similarity.binqTopK): the
    * whole corpus-wide pass reads 16-byte codes and scores each pair as
    * two xor+POPCNTs (native hamming_l, whole-stage codegen) — never a
    * stored vector, never a dim-wide dot. Fully DETERMINISTIC with no
    * trained input, so unlike the PQ/IVF tiers the oracle is static SQL:
    * DuckDB recounts sign disagreements from the raw vectors (the
    * identity the packing preserves) and the ranking hash-matches. */
  protected val simBinqTopk = Q("sim_binq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.binqTopK(Similarity.binqEncode(e),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY hamming, vec_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank,
      |  vec_id AS neighbor_id, hamming
      |FROM r WHERE rank <= 10""".stripMargin), bench = true)

  /** Hamming shortlist + exact re-rank (Similarity.binqTopKRefined): the
    * binary tier's "+R" — the corpus pass runs on codes (shortlist 50),
    * then only |queries|×50 vectors are read back for an exact round-4
    * cosine top-10 (crossTopK's contract). Static oracle end to end. */
  protected val simBinqRerank = Q("sim_binq_rerank",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.binqTopKRefined(Similarity.binqEncode(e), e,
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10, shortlist = 50)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |sl AS (SELECT query_id, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS rank FROM s)
      |  WHERE rank <= 50),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv,
      |    sqrt(list_dot_product(v, v)) AS qnrm FROM e
      |  WHERE vec_id % 20 = 0 AND list_dot_product(v, v) > 0),
      |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM sl JOIN n ON n.vec_id = sl.vec_id
      |    JOIN qn ON qn.query_id = sl.query_id),
      |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
      |FROM rr WHERE rank <= 10""".stripMargin))

  /** ORACLED recall measurement — the binary tier's quality as a
    * hash-checked OUTPUT, not a NOTES claim: per query, the overlap
    * between the exact brute top-10 and the Hamming-shortlist(200) +
    * exact-rerank top-10. Both rankings are deterministic, so their
    * intersection is too — DuckDB re-derives both chains and must agree
    * on every per-query recall figure. (ProfileQuant's aggregate
    * recall@10 = mean of recall_bp/10⁴ over queries.) */
  protected val simBinqRecall = Q("sim_binq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val binq = Similarity.binqTopKRefined(Similarity.binqEncode(e), e, qs,
          k = 10, shortlist = 200)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(binq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          // integral div by construction, matching the oracle's floor
          // `//` (ADVICE r13 — truncation==floor held only by IEEE luck)
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      |  WHERE vec_id % 20 = 0),
      |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
      |  WHERE rank <= 10),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
      |hs AS (SELECT q.query_id, e.vec_id,
      |    CAST(list_sum(list_transform(q.qv,
      |      (x, i) -> CASE WHEN (x > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END))
      |      AS INTEGER) AS hamming
      |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
      |sl AS (SELECT query_id, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS rank FROM hs)
      |  WHERE rank <= 200),
      |x AS (SELECT sl.query_id, sl.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM sl JOIN n ON n.vec_id = sl.vec_id
      |    JOIN qn ON qn.query_id = sl.query_id),
      |binq AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM x)
      |  WHERE rank <= 10),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN binq USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin))

  /** Int8 scalar-quantization top-k (Similarity.sq8Encode + sq8TopK): the
    * stored row is dim int8 codes + two scale doubles (~4× scan shrink,
    * the faiss SQ8 layout); the approximate cosine dequantizes the exact
    * integer code dot with the per-vector scales — every factor
    * bit-deterministic, so the static oracle re-quantizes from the raw
    * vectors and hash-matches. */
  protected val simSq8Topk = Q("sim_sq8_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.sq8TopK(Similarity.sq8Encode(e),
        e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs,
      |    sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |c AS (SELECT vec_id,
      |    list_transform(v, x -> floor(x * 127.0 / max_abs + 0.5)) AS q8,
      |    max_abs, nrm FROM m),
      |q AS (SELECT vec_id AS query_id, q8 AS qq8, max_abs AS qmax,
      |    nrm AS qnrm FROM c WHERE vec_id % 20 = 0),
      |s AS (SELECT q.query_id, c.vec_id,
      |    ROUND(list_dot_product(q.qq8, c.q8) * q.qmax * c.max_abs
      |      / (16129.0 * q.qnrm * c.nrm), 6) + 0.0 AS score
      |  FROM q CROSS JOIN c WHERE c.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, vec_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank,
      |  vec_id AS neighbor_id, score
      |FROM r WHERE rank <= 10""".stripMargin))

  /** Oracled recall for the int8 tier (the sim_binq_recall pattern):
    * per-query overlap between the exact brute top-10 and the
    * sq8 dequantized-cosine top-10 — hash-checks the tier's near-exact
    * claim (ProfileQuant: 0.98 aggregate) instead of noting it. */
  protected val simSq8Recall = Q("sim_sq8_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val sq8 = Similarity.sq8TopK(Similarity.sq8Encode(e),
          e.where(pmod(col("vec_id"), lit(20)) === 0), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(sq8, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          // integral div by construction, matching the oracle's floor
          // `//` (ADVICE r13 — truncation==floor held only by IEEE luck)
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      |  WHERE vec_id % 20 = 0),
      |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
      |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
      |  WHERE rank <= 10),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs,
      |    sqrt(list_dot_product(v, v)) AS nrm FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |c AS (SELECT vec_id,
      |    list_transform(v, x -> floor(x * 127.0 / max_abs + 0.5)) AS q8,
      |    max_abs, nrm FROM m),
      |q8q AS (SELECT vec_id AS query_id, q8 AS qq8, max_abs AS qmax,
      |    nrm AS qnrm FROM c WHERE vec_id % 20 = 0),
      |ss AS (SELECT q.query_id, c.vec_id,
      |    ROUND(list_dot_product(q.qq8, c.q8) * q.qmax * c.max_abs
      |      / (16129.0 * q.qnrm * c.nrm), 6) + 0.0 AS score
      |  FROM q8q q CROSS JOIN c WHERE c.vec_id <> q.query_id),
      |sq8 AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id) AS rank FROM ss)
      |  WHERE rank <= 10),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN sq8 USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin))

  /** Incremental binary-code index maintenance (VERDICT r13 #4) — the
    * sign-bit sibling of sim_pq_incr: the HISTORY code table (vec_id ≡ 0
    * mod 7) is a write-once parquet artifact (encoded once, never
    * re-encoded — and with no trained input the binq tier needs no
    * codebook artifact at all); a new batch encodes fresh and appends
    * with its origin tag, history vectors never rescanned. Output is the
    * exploded storable relation (the sim_binq_codes layout) so the
    * static oracle pins every word of both origins bit-for-bit. */
  protected val simBinqIncr = Q("sim_binq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = parquetArtifact(s, dir, "binq_codes_hist7", "embeddings")(
        Similarity.binqEncode(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      hist.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.binqEncode(e.where(pmod(col("vec_id"), lit(7)) =!= 0))
            .withColumn("origin", lit("batch")))
        .select(col("vec_id"), posexplode(col("bw")), col("origin"))
        .select(col("vec_id"), col("pos").cast("int").as("w_idx"),
          col("col").as("word"), col("origin"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT vec_id,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM e)
      |SELECT vec_id, CAST((i - 1) // 32 AS INTEGER) AS w_idx,
      |  CAST(sum(CASE WHEN x > 0 THEN 1::BIGINT << ((i - 1) % 32)
      |           ELSE 0::BIGINT END) AS BIGINT) AS word,
      |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
      |FROM x GROUP BY 1, 2""".stripMargin))

  /** Incremental int8 scalar-quantization index maintenance — the sq8
    * sibling: history codes persist once (per-vector scales ride the
    * stored row, so dequantization needs no global artifact either),
    * batches append origin-tagged. Exploded to (vec_id, d_idx, code,
    * max_abs, origin) so the oracle pins every code and scale. */
  protected val simSq8Incr = Q("sim_sq8_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val hist = parquetArtifact(s, dir, "sq8_codes_hist7", "embeddings")(
        Similarity.sq8Encode(e.where(pmod(col("vec_id"), lit(7)) === 0)))
      hist.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.sq8Encode(e.where(pmod(col("vec_id"), lit(7)) =!= 0))
            .withColumn("origin", lit("batch")))
        .select(col("vec_id"), posexplode(col("q8")), col("max_abs"),
          col("origin"))
        .select(col("vec_id"), col("pos").cast("int").as("d_idx"),
          col("col").as("code"), col("max_abs"), col("origin"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e
      |  WHERE list_dot_product(v, v) > 0),
      |x AS (SELECT vec_id, max_abs,
      |    unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}), recursive := true)
      |  FROM m)
      |SELECT vec_id, CAST(i - 1 AS INTEGER) AS d_idx,
      |  CAST(floor(x * 127.0 / max_abs + 0.5) AS INTEGER) AS code,
      |  max_abs,
      |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
      |FROM x""".stripMargin))

  /** Trained artifacts for the CLUSTERED fixture (VERDICT r13 #2) —
    * deterministic AND data-independent (the fixture is closed-form in
    * vec_id), so per-JVM memoization suffices; no on-disk artifact for
    * a 560-row corpus. ksub = 8 on purpose: with 8 planted clusters,
    * raw PQ's 8 codes per subspace get consumed by the 8 cluster
    * projections (no intra-cluster detail left), while residual codes
    * spend all 8 on local detail — the configuration where the
    * residual claim is starkest (ProfileQuant: raw 0.225 vs residual
    * 0.918 recall@10). */
  protected val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  protected def fixCents(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("cents", _ =>
      Similarity.kmeansCentroidArrays(Similarity.synthesizeClustered(s),
        nCells = 8)).asInstanceOf[Seq[Array[Double]]]
  protected def fixRawBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("raw", _ =>
      Similarity.pqTrain(Similarity.synthesizeClustered(s), m = 8, ksub = 8))
      .asInstanceOf[Seq[Seq[Array[Double]]]]
  protected def fixResBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("res", _ =>
      Similarity.pqTrainResidual(Similarity.synthesizeClustered(s),
        fixCents(s), m = 8, ksub = 8)).asInstanceOf[Seq[Seq[Array[Double]]]]

  /** Residual IVF-PQ beats raw IVF-PQ at EQUAL code budget — proven on
    * the planted clustered corpus and ORACLE-CHECKED (VERDICT r13 #2):
    * the testdata's embeddings are near-uniform (centroids ≈ origin, so
    * residual ≈ raw there — the honest caveat NOTES r13 recorded); this
    * query runs both searches on [[Similarity.synthesizeClustered]]
    * (8 real clusters, dyadic-exact, re-derivable in SQL from
    * `range()`), same m=8/ksub=8/nProbes=2 budget, and emits per-query
    * recall vs the exact brute top-10 for BOTH tiers — the separation
    * (mean raw_bp ≈ 2250 vs resid_bp ≈ 9180) is IN the hashed output,
    * the sim_binq_recall pattern. The oracle re-derives the corpus, the
    * brute ground truth, and both quantized pipelines from the trained
    * literals end to end. */
  protected val simResidualGain = Q("sim_residual_gain",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val fq = fix.where(pmod(col("vec_id"), lit(20)) === 0)
      val cents = fixCents(s)
      val brute = Similarity.bruteTopK(fix, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val raw = Similarity.ivfPqTopK(fix, fq, cents, fixRawBooks(s),
          k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      val res = Similarity.ivfPqResidualTopK(
          Similarity.ivfPqResidualEncode(fix, cents, fixResBooks(s)),
          fq, cents, fixResBooks(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(raw, "raw_overlap"), Seq("query_id"), "left")
        .join(overlap(res, "resid_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("raw_overlap"), lit(0L)).as("raw_overlap"),
          coalesce(col("resid_overlap"), lit(0L)).as("resid_overlap"),
          expr("coalesce(raw_overlap, 0) * 10000 div n_brute").as("raw_bp"),
          expr("coalesce(resid_overlap, 0) * 10000 div n_brute").as("resid_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      def bookValues(books: Seq[Seq[Array[Double]]]): String =
        books.zipWithIndex.flatMap { case (cs, sub) =>
          cs.zipWithIndex.map { case (c, code) =>
            s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
        }.mkString(",\n  ")
      val centValues = fixCents(s).zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH fix AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
        |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
        |  FROM range(0, 560) r),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM fix),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |c2(cell, w) AS (VALUES
        |  $centValues),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 2),
        |rb(sub, code, cv) AS (VALUES
        |  ${bookValues(fixRawBooks(s))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rb),
        |sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM fix CROSS JOIN range(0, 8) r),
        |sd AS (SELECT vec_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sv JOIN rcb USING (sub)),
        |renc AS (SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM sd)
        |  WHERE rn = 1),
        |qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(qv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM qn CROSS JOIN range(0, 8) r),
        |rlut AS (SELECT query_id, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN rcb USING (sub)),
        |rsc AS (SELECT l.query_id, renc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM renc JOIN asgn a ON a.vec_id = renc.vec_id
        |    JOIN pb ON pb.cell = a.cell
        |    JOIN rlut l ON l.query_id = pb.query_id
        |      AND l.sub = renc.sub AND l.code = renc.code
        |  WHERE renc.vec_id <> pb.query_id
        |  GROUP BY 1, 2),
        |rtop AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM rsc)
        |  WHERE rank <= 10),
        |sb(sub, code, cv) AS (VALUES
        |  ${bookValues(fixResBooks(s))}),
        |scb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM sb),
        |resid AS (SELECT n.vec_id, a.cell,
        |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
        |  FROM n JOIN asgn a ON a.vec_id = n.vec_id
        |    JOIN cn ON cn.cell = a.cell),
        |rsv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM resid CROSS JOIN range(0, 8) r),
        |rsd AS (SELECT vec_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM rsv JOIN scb USING (sub)),
        |senc AS (SELECT vec_id, cell, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM rsd)
        |  WHERE rn = 1),
        |qres AS (SELECT pb.query_id, pb.cell,
        |    list_transform(q.qv, (x, i) -> x - cn.w[i]) AS rqv
        |  FROM pb JOIN qn q ON q.query_id = pb.query_id
        |    JOIN cn ON cn.cell = pb.cell),
        |sqs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 2 + 1, r.range * 2 + 2) AS xs
        |  FROM qres CROSS JOIN range(0, 8) r),
        |slut AS (SELECT query_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sqs JOIN scb USING (sub)),
        |ssc AS (SELECT l.query_id, senc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM senc JOIN slut l ON l.cell = senc.cell
        |      AND l.sub = senc.sub AND l.code = senc.code
        |  WHERE senc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |stop AS (SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u, vec_id) AS rank FROM ssc)
        |  WHERE rank <= 10),
        |hr AS (SELECT b.query_id, count(*) AS raw_overlap
        |  FROM brute b JOIN rtop USING (query_id, neighbor_id) GROUP BY 1),
        |hs AS (SELECT b.query_id, count(*) AS resid_overlap
        |  FROM brute b JOIN stop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hr.raw_overlap, 0) AS BIGINT) AS raw_overlap,
        |  CAST(coalesce(hs.resid_overlap, 0) AS BIGINT) AS resid_overlap,
        |  CAST(coalesce(hr.raw_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS raw_bp,
        |  CAST(coalesce(hs.resid_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS resid_bp
        |FROM base LEFT JOIN hr USING (query_id) LEFT JOIN hs USING (query_id)""".stripMargin
    })

  /** OPQ fixture frames + trained books (VERDICT r13 #8, Ge et al.
    * 2013): the corpus is H·z — an axis-aligned anisotropic latent z
    * ([[Similarity.synthesizeAniso]]) SMEARED across every dimension by
    * the self-inverse scaled Hadamard rotation H₁₆/4, so identity-split
    * PQ sees 8 mutually-correlated subspaces while the OPQ rotation
    * (here H itself — on this corpus the latent basis IS the optimal
    * rotation, the deterministic stand-in for OPQ's trained R) recovers
    * z exactly and re-aligns the code budget with the data axes. All
    * arithmetic is dyadic-exact (H entries ±1/4), so corpus, rotation
    * and both searches re-derive in SQL. */
  protected def opqCorpus(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(Similarity.synthesizeAniso(s),
      Similarity.hadamard16)
  protected def opqUnrot(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(opqCorpus(s), Similarity.hadamard16)
  protected def opqPlainBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_plain", _ =>
      Similarity.pqTrain(opqCorpus(s), m = 8, ksub = 16))
      .asInstanceOf[Seq[Seq[Array[Double]]]]
  protected def opqRotBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_rot", _ =>
      Similarity.pqTrain(opqUnrot(s), m = 8, ksub = 16))
      .asInstanceOf[Seq[Seq[Array[Double]]]]

  /** Shared oracle fragments for the OPQ family: codebook / rotation-
    * matrix VALUES literals and the per-tier flat-ADC pipeline (dsub=2,
    * m=8, k=10, queries = vec_id % 20 == 0) over a named source CTE. */
  protected def opqBookValues(books: Seq[Seq[Array[Double]]]): String =
    books.zipWithIndex.flatMap { case (cs, sub) =>
      cs.zipWithIndex.map { case (c, code) =>
        s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
    }.mkString(",\n  ")
  protected def opqMatValues(m: Seq[Array[Double]]): String =
    m.zipWithIndex.map { case (r, i) =>
      s"($i, ${r.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")
  protected def opqAdcTier(tag: String, src: String, cbRel: String): String =
    s"""${tag}sv AS (SELECT vec_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
      |  FROM $src CROSS JOIN range(0, 8) r),
      |${tag}sd AS (SELECT vec_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}sv JOIN $cbRel USING (sub)),
      |${tag}enc AS (SELECT vec_id, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM ${tag}sd)
      |  WHERE rn = 1),
      |${tag}qs AS (SELECT vec_id AS query_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(v, r.range * 2 + 1, r.range * 2 + 2) AS xs
      |  FROM $src CROSS JOIN range(0, 8) r WHERE vec_id % 20 = 0),
      |${tag}lut AS (SELECT query_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}qs JOIN $cbRel USING (sub)),
      |${tag}sc AS (SELECT l.query_id, ${tag}enc.vec_id,
      |    CAST(sum(l.d2u) AS BIGINT) AS d2u
      |  FROM ${tag}enc JOIN ${tag}lut l USING (sub, code)
      |  WHERE ${tag}enc.vec_id <> l.query_id
      |  GROUP BY 1, 2),
      |${tag}top AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY d2u, vec_id) AS rank FROM ${tag}sc)
      |  WHERE rank <= 10)""".stripMargin

  /** OPQ rotation beats identity-split PQ at equal code budget on the
    * smeared-latent corpus — ORACLE-CHECKED recall pair (the
    * sim_residual_gain pattern): plain PQ quantizes H·z directly
    * (correlated subspaces, codes misallocated), the OPQ path rotates
    * by H first (recovering the axis-aligned latent, every subspace
    * independent) and searches rotated queries against rotated codes —
    * legal because the orthonormal rotation preserves every dot product
    * BIT-EXACTLY here (H entries ±1/4 on dyadic inputs). Both recalls
    * ride in the hashed output (ProfileQuant: plain 0.496, OPQ 0.811
    * @ m=8 ksub=16). The oracle re-derives latent, rotation, ground
    * truth and both ADC pipelines from the trained literals. */
  protected val simOpqGain = Q("sim_opq_gain",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val unrot = opqUnrot(s)
      val cq = corpus.where(pmod(col("vec_id"), lit(20)) === 0)
      val uq = unrot.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val plain = Similarity.pqTopKAdc(
          Similarity.pqEncode(corpus, opqPlainBooks(s)), cq,
          opqPlainBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val opq = Similarity.pqTopKAdc(
          Similarity.pqEncode(unrot, opqRotBooks(s)), uq,
          opqRotBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(plain, "pq_overlap"), Seq("query_id"), "left")
        .join(overlap(opq, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("pq_overlap"), lit(0L)).as("pq_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(pq_overlap, 0) * 10000 div n_brute").as("pq_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      val bookValues = opqBookValues _
      val hValues = opqMatValues(Similarity.hadamard16)
      val adcTier = opqAdcTier _
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  $hValues),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |unrot AS (SELECT c.vec_id,
        |    list(list_dot_product(h.rv, c.v) ORDER BY h.i) AS v
        |  FROM corpus c CROSS JOIN hm h GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |pbk(sub, code, cv) AS (VALUES
        |  ${bookValues(opqPlainBooks(s))}),
        |pcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM pbk),
        |obk(sub, code, cv) AS (VALUES
        |  ${bookValues(opqRotBooks(s))}),
        |ocb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM obk),
        |${adcTier("p", "corpus", "pcb")},
        |${adcTier("o", "unrot", "ocb")},
        |hp AS (SELECT b.query_id, count(*) AS pq_overlap
        |  FROM brute b JOIN ptop USING (query_id, neighbor_id) GROUP BY 1),
        |ho AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hp.pq_overlap, 0) AS BIGINT) AS pq_overlap,
        |  CAST(coalesce(ho.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hp.pq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS pq_bp,
        |  CAST(coalesce(ho.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hp USING (query_id) LEFT JOIN ho USING (query_id)""".stripMargin
    })

  /** TRAINED OPQ — the full parametric solution (Ge et al. 2013 §4):
    * [[Similarity.opqTrainRotation]] eigen-decomposes the corpus second
    * moment (deterministic cyclic Jacobi on the bounded sample) and
    * allocates eigen-directions to subspaces by greedy log-eigenvalue
    * balancing; unlike sim_opq_gain the latent basis is NOT given — the
    * rotation is learned from data and must rediscover it (ProfileQuant:
    * trained 0.796 vs known-basis 0.811 vs plain 0.496 recall@10). The
    * rotation matrix interpolates into the oracle as literals (the
    * trained-centroid posture), rotated values are index-order dots of
    * identical doubles in both engines, and the whole recall pair is
    * hash-checked. Output: the sim_opq_gain contract with opq_* =
    * trained-rotation figures. */
  protected def opqTrainedR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opq_trained_r", _ =>
      Similarity.opqTrainRotation(opqCorpus(s), m = 8))
      .asInstanceOf[Seq[Array[Double]]]
  protected def opqTrainedBooks(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opq_trained_books", _ =>
      Similarity.pqTrain(
        Similarity.rotateEmbeddings(opqCorpus(s), opqTrainedR(s)),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  protected val simOpqTrained = Q("sim_opq_trained",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val rotT = Similarity.rotateEmbeddings(corpus, opqTrainedR(s))
      val cq = corpus.where(pmod(col("vec_id"), lit(20)) === 0)
      val tq = rotT.where(pmod(col("vec_id"), lit(20)) === 0)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val plain = Similarity.pqTopKAdc(
          Similarity.pqEncode(corpus, opqPlainBooks(s)), cq,
          opqPlainBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val trained = Similarity.pqTopKAdc(
          Similarity.pqEncode(rotT, opqTrainedBooks(s)), tq,
          opqTrainedBooks(s), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(plain, "pq_overlap"), Seq("query_id"), "left")
        .join(overlap(trained, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("pq_overlap"), lit(0L)).as("pq_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(pq_overlap, 0) * 10000 div n_brute").as("pq_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  ${opqMatValues(Similarity.hadamard16)}),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |tm(i, rv) AS (VALUES
        |  ${opqMatValues(opqTrainedR(s))}),
        |rott AS (SELECT c.vec_id,
        |    list(list_dot_product(t.rv, c.v) ORDER BY t.i) AS v
        |  FROM corpus c CROSS JOIN tm t GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |pbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqPlainBooks(s))}),
        |pcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM pbk),
        |tbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqTrainedBooks(s))}),
        |tcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM tbk),
        |${opqAdcTier("p", "corpus", "pcb")},
        |${opqAdcTier("t", "rott", "tcb")},
        |hp AS (SELECT b.query_id, count(*) AS pq_overlap
        |  FROM brute b JOIN ptop USING (query_id, neighbor_id) GROUP BY 1),
        |ht AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN ttop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hp.pq_overlap, 0) AS BIGINT) AS pq_overlap,
        |  CAST(coalesce(ht.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hp.pq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS pq_bp,
        |  CAST(coalesce(ht.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hp USING (query_id) LEFT JOIN ht USING (query_id)""".stripMargin
    })

  /** Residual-IVF ADC tier over a named source CTE — the oracle fragment
    * for the COMPOSED quantized layouts (VERDICT r14 #1): assignment
    * (round-6 cosine desc, min-cell tie-break), whole-vector residual,
    * dsub-wide encode (m=8; dsub 2 on the dim-16 fixtures, 8 on the
    * dim-64 table), nProbes probed cells
    * per query (vec_id ≡ 0 mod 20), one exact LUT per probed cell from
    * the query's own residual, ADC sum, top-10 by (d2u, vec_id). The
    * caller supplies the source relation plus codebook (`cbRel`: sub,
    * code, cv, cc) and centroid (`cnRel`: cell, w, cnrm) relations. */
  protected def opqResidTier(tag: String, src: String, cbRel: String,
      cnRel: String, nProbes: Int, dsub: Int = 2): String =
    s"""${tag}vn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM $src),
      |${tag}asgn AS (SELECT vec_id, cell FROM (
      |    SELECT n.vec_id, cn.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
      |    FROM ${tag}vn n CROSS JOIN $cnRel cn)
      |  WHERE crn = 1),
      |${tag}resid AS (SELECT n.vec_id, a.cell,
      |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
      |  FROM ${tag}vn n JOIN ${tag}asgn a ON a.vec_id = n.vec_id
      |    JOIN $cnRel cn ON cn.cell = a.cell),
      |${tag}sv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(rv, r.range * $dsub + 1, r.range * $dsub + $dsub) AS xs
      |  FROM ${tag}resid CROSS JOIN range(0, 8) r),
      |${tag}sd AS (SELECT vec_id, cell, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}sv JOIN $cbRel USING (sub)),
      |${tag}enc AS (SELECT vec_id, cell, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY d2u, code) AS rn FROM ${tag}sd)
      |  WHERE rn = 1),
      |${tag}pb AS (SELECT query_id, cell FROM (
      |    SELECT n.vec_id AS query_id, cn.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
      |    FROM ${tag}vn n CROSS JOIN $cnRel cn WHERE n.vec_id % 20 = 0)
      |  WHERE pr <= $nProbes),
      |${tag}qres AS (SELECT pb.query_id, pb.cell,
      |    list_transform(q.v, (x, i) -> x - cn.w[i]) AS rqv
      |  FROM ${tag}pb pb JOIN ${tag}vn q ON q.vec_id = pb.query_id
      |    JOIN $cnRel cn ON cn.cell = pb.cell),
      |${tag}qs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(rqv, r.range * $dsub + 1, r.range * $dsub + $dsub) AS xs
      |  FROM ${tag}qres CROSS JOIN range(0, 8) r),
      |${tag}lut AS (SELECT query_id, cell, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM ${tag}qs JOIN $cbRel USING (sub)),
      |${tag}sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
      |  FROM ${tag}enc enc JOIN ${tag}lut l ON l.cell = enc.cell
      |      AND l.sub = enc.sub AND l.code = enc.code
      |  WHERE enc.vec_id <> l.query_id
      |  GROUP BY 1, 2),
      |${tag}top AS (SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY d2u, vec_id) AS rank FROM ${tag}sc)
      |  WHERE rank <= 10)""".stripMargin

  /** Trained pieces for the COMPOSED OPQ ∘ residual-IVF-PQ gain pair on
    * the smeared aniso fixture: both tiers train their own cells (8 — the
    * probe sweep in ProfileOpqIvfPq: at 8 cells the rotation wins, resid
    * 0.807 vs opq∘resid 0.832 recall@10, both above flat trained-OPQ's
    * 0.796) and their own residual codebooks; the OPQ tier trains in the
    * ROTATED space (the FAISS OPQ-pretransform order). */
  protected def opqIvfCentsU(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivf_cents_u", _ =>
      Similarity.kmeansCentroidArrays(opqCorpus(s), nCells = 8))
      .asInstanceOf[Seq[Array[Double]]]
  protected def opqIvfBooksU(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivf_books_u", _ =>
      Similarity.pqTrainResidual(opqCorpus(s), opqIvfCentsU(s),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  protected def opqIvfRotC(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(opqCorpus(s), opqTrainedR(s))
  protected def opqIvfCentsR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivf_cents_r", _ =>
      Similarity.kmeansCentroidArrays(opqIvfRotC(s), nCells = 8))
      .asInstanceOf[Seq[Array[Double]]]
  protected def opqIvfBooksR(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivf_books_r", _ =>
      Similarity.pqTrainResidual(opqIvfRotC(s), opqIvfCentsR(s),
        m = 8, ksub = 16)).asInstanceOf[Seq[Seq[Array[Double]]]]
  protected def centValues(cents: Seq[Array[Double]]): String =
    cents.zipWithIndex.map { case (v, i) =>
      s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n  ")

  /** OPQ composed with residual IVF-PQ beats the unrotated residual tier
    * at equal code budget on the smeared-latent corpus — ORACLE-CHECKED
    * recall pair (VERDICT r14 #1, the sim_residual_gain pattern) over the
    * complete FAISS production layout (Similarity.opqIvfPqEncodeWide /
    * opqIvfPqTopKWide): rotate by the TRAINED Jacobi rotation, cell-assign
    * the rotated vector, PQ-encode the rotated residual, search with one
    * exact per-probed-cell LUT from the rotated query's residual. Both
    * code tables are persisted WIDE artifacts; both searches read stored
    * codes only. ProfileOpqIvfPq at 8 cells / 2 probes: resid 0.807,
    * opq∘resid 0.832 recall@10 (flat trained OPQ: 0.796) — the residual
    * tier already absorbs most of the anisotropy the rotation targets
    * (centroids capture the low-rank structure), so the composition's
    * gain is real but modest, exactly FAISS's guidance for OPQ over
    * IVFADC. The oracle re-derives latent, rotation, both centroid sets,
    * both codebook sets, both full search chains and both recalls from
    * the trained literals. */
  protected val simOpqIvfpq = Q("sim_opq_ivfpq",
    (s, dir) => {
      val corpus = opqCorpus(s)
      val brute = Similarity.bruteTopK(corpus, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesU = parquetArtifact(s, dir, "opqivf_codes_u_wide_m8_k16_c8",
        "embeddings")(Similarity.ivfPqResidualEncodeWide(corpus,
        opqIvfCentsU(s), opqIvfBooksU(s)))
      val resid = Similarity.ivfPqResidualTopKWide(codesU,
          corpus.where(pmod(col("vec_id"), lit(20)) === 0),
          opqIvfCentsU(s), opqIvfBooksU(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      val codesR = parquetArtifact(s, dir, "opqivf_codes_r_wide_m8_k16_c8",
        "embeddings")(Similarity.opqIvfPqEncodeWide(corpus, opqTrainedR(s),
        opqIvfCentsR(s), opqIvfBooksR(s)))
      val opq = Similarity.opqIvfPqTopKWide(codesR,
          corpus.where(pmod(col("vec_id"), lit(20)) === 0), opqTrainedR(s),
          opqIvfCentsR(s), opqIvfBooksR(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(resid, "resid_overlap"), Seq("query_id"), "left")
        .join(overlap(opq, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("resid_overlap"), lit(0L)).as("resid_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(resid_overlap, 0) * 10000 div n_brute").as("resid_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH lat AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST((r.range * 13 + d * 7 + (r.range * d) % 29) % 65 - 32 AS DOUBLE)
        |      / 32.0 / power(2.0, CAST(d AS DOUBLE))) AS z
        |  FROM range(0, 560) r),
        |hm(i, rv) AS (VALUES
        |  ${opqMatValues(Similarity.hadamard16)}),
        |corpus AS (SELECT l.vec_id,
        |    list(list_dot_product(h.rv, l.z) ORDER BY h.i) AS v
        |  FROM lat l CROSS JOIN hm h GROUP BY l.vec_id),
        |tm(i, rv) AS (VALUES
        |  ${opqMatValues(opqTrainedR(s))}),
        |rott AS (SELECT c.vec_id,
        |    list(list_dot_product(t.rv, c.v) ORDER BY t.i) AS v
        |  FROM corpus c CROSS JOIN tm t GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |ubk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfBooksU(s))}),
        |ucb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM ubk),
        |uc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfCentsU(s))}),
        |ucn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM uc2),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfBooksR(s))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfCentsR(s))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("u", "corpus", "ucb", "ucn", nProbes = 2)},
        |${opqResidTier("o", "rott", "rcb", "rcn", nProbes = 2)},
        |hu AS (SELECT b.query_id, count(*) AS resid_overlap
        |  FROM brute b JOIN utop USING (query_id, neighbor_id) GROUP BY 1),
        |ho AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hu.resid_overlap, 0) AS BIGINT) AS resid_overlap,
        |  CAST(coalesce(ho.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hu.resid_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS resid_bp,
        |  CAST(coalesce(ho.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hu USING (query_id) LEFT JOIN ho USING (query_id)""".stripMargin
    })

  /** Production face of the composed layout on the REAL embeddings
    * table — the full FAISS `OPQ8,IVF10,PQ8` chain over persisted
    * artifacts only: the trained rotation (opq_rot_emb_m8), centroids
    * trained in the ROTATED space (centroids_emb_opqrot_c10), residual
    * codebooks trained on rotated residuals (pq_books_opqrot_resid),
    * and the write-once wide code table — the search never touches a
    * raw corpus vector and scans ~nProbes/10 of the 8-byte-code rows.
    * Derived oracle re-runs rotate → assign → residual-encode → probe →
    * per-cell LUT ADC from the three literal sets. */
  protected def opqEmbResidCents(s: SparkSession, dir: String): Seq[Array[Double]] =
    embCentroids(s, dir, "opqrot", opqEmbRotated(s, dir))
  protected def opqEmbResidBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, "opqrot_resid"),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, "pq_books_opqrot_resid_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrainResidual(opqEmbRotated(s, dir),
              opqEmbResidCents(s, dir), m = 8, ksub = 16)))))
  protected val simOpqIvfpqTopk = Q("sim_opq_ivfpq_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val codesWide = parquetArtifact(s, dir,
        "opq_ivfpq_resid_codes_wide_m8_k16_c10", "embeddings")(
        Similarity.opqIvfPqEncodeWide(e, opqEmbR(s, dir),
          opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir)))
      Similarity.opqIvfPqTopKWide(codesWide,
        e.where(pmod(col("vec_id"), lit(20)) === 0), opqEmbR(s, dir),
        opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir),
        k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqEmbResidBooks(s, dir))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqEmbResidCents(s, dir))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("o", "rot", "rcb", "rcn", nProbes = 3, dsub = 8)},
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM osc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    }, bench = true)

  /** Oracled recall for the COMPOSED serving face — the sim_opq_recall
    * shape over sim_opq_ivfpq_topk's chain (stored wide residual codes,
    * rotated queries, per-probed-cell LUT ADC at nProbes = 3): per-query
    * overlap vs the exact brute top-10 over the RAW table, figures
    * hash-checked from the three literal sets. Closes the matrix —
    * EVERY serving tier (flat PQ "+R", binq, sq8, flat OPQ, composed
    * OPQ∘residual-IVF-PQ) now carries an oracle-gated recall row. */
  protected val simOpqIvfpqRecall = Q("sim_opq_ivfpq_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesWide = parquetArtifact(s, dir,
        "opq_ivfpq_resid_codes_wide_m8_k16_c10", "embeddings")(
        Similarity.opqIvfPqEncodeWide(e, opqEmbR(s, dir),
          opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir)))
      val opq = Similarity.opqIvfPqTopKWide(codesWide,
          e.where(pmod(col("vec_id"), lit(20)) === 0), opqEmbR(s, dir),
          opqEmbResidCents(s, dir), opqEmbResidBooks(s, dir),
          k = 10, nProbes = 3)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(opq, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqEmbR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqEmbResidBooks(s, dir))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqEmbResidCents(s, dir))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("o", "rot", "rcb", "rcn", nProbes = 3, dsub = 8)},
        |nn AS (SELECT vec_id, v0 AS v, sqrt(list_dot_product(v0, v0)) AS nrm
        |  FROM e0 WHERE list_dot_product(v0, v0) > 0),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nn
        |  WHERE vec_id % 20 = 0),
        |bbs AS (SELECT qn.query_id, nn.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, nn.v) / (qn.qnrm * nn.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN nn WHERE nn.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bbs)
        |  WHERE rank <= 10),
        |hits AS (SELECT b.query_id, count(*) AS n_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
        |FROM base LEFT JOIN hits USING (query_id)""".stripMargin
    })

  /** Composed-beats-residual on REALISTIC clustered data — the second
    * oracled gain pair for the composed layout (the aniso pair proves
    * the rotation effect where residuals DON'T absorb it; this one
    * proves the rotation still adds ON TOP of residual coding when the
    * cluster structure is real — ProfileOpqIvfPq r15: resid 0.918 vs
    * composed 0.961 recall@10 at m=8 ksub=8 nProbes=2 on the planted
    * 8-cluster corpus, +4.3 points at residual coding's BEST operating
    * point). Same contract as sim_opq_ivfpq; all trained literals
    * (rotation, both centroid sets, both residual codebook sets)
    * interpolate into the oracle; both wide code tables persist. */
  private def opqIvfcR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivfc_r", _ =>
      Similarity.opqTrainRotation(Similarity.synthesizeClustered(s), m = 8))
      .asInstanceOf[Seq[Array[Double]]]
  private def opqIvfcRotC(s: SparkSession): DataFrame =
    Similarity.rotateEmbeddings(Similarity.synthesizeClustered(s), opqIvfcR(s))
  private def opqIvfcCentsU(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivfc_cents_u", _ =>
      Similarity.kmeansCentroidArrays(Similarity.synthesizeClustered(s),
        nCells = 8)).asInstanceOf[Seq[Array[Double]]]
  private def opqIvfcBooksU(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivfc_books_u", _ =>
      Similarity.pqTrainResidual(Similarity.synthesizeClustered(s),
        opqIvfcCentsU(s), m = 8, ksub = 8))
      .asInstanceOf[Seq[Seq[Array[Double]]]]
  private def opqIvfcCentsR(s: SparkSession): Seq[Array[Double]] =
    fixtureCache.computeIfAbsent("opqivfc_cents_r", _ =>
      Similarity.kmeansCentroidArrays(opqIvfcRotC(s), nCells = 8))
      .asInstanceOf[Seq[Array[Double]]]
  private def opqIvfcBooksR(s: SparkSession): Seq[Seq[Array[Double]]] =
    fixtureCache.computeIfAbsent("opqivfc_books_r", _ =>
      Similarity.pqTrainResidual(opqIvfcRotC(s), opqIvfcCentsR(s),
        m = 8, ksub = 8)).asInstanceOf[Seq[Seq[Array[Double]]]]
  protected val simOpqIvfpqGain = Q("sim_opq_ivfpq_gain",
    (s, dir) => {
      val fix = Similarity.synthesizeClustered(s)
      val brute = Similarity.bruteTopK(fix, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val codesU = parquetArtifact(s, dir, "opqivfc_codes_u_wide_m8_k8_c8",
        "embeddings")(Similarity.ivfPqResidualEncodeWide(fix,
        opqIvfcCentsU(s), opqIvfcBooksU(s)))
      val resid = Similarity.ivfPqResidualTopKWide(codesU,
          fix.where(pmod(col("vec_id"), lit(20)) === 0),
          opqIvfcCentsU(s), opqIvfcBooksU(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      val codesR = parquetArtifact(s, dir, "opqivfc_codes_r_wide_m8_k8_c8",
        "embeddings")(Similarity.opqIvfPqEncodeWide(fix, opqIvfcR(s),
        opqIvfcCentsR(s), opqIvfcBooksR(s)))
      val opq = Similarity.opqIvfPqTopKWide(codesR,
          fix.where(pmod(col("vec_id"), lit(20)) === 0), opqIvfcR(s),
          opqIvfcCentsR(s), opqIvfcBooksR(s), k = 10, nProbes = 2)
        .select(col("query_id"), col("neighbor_id"))
      def overlap(cand: DataFrame, name: String): DataFrame =
        brute.join(cand, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(name))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(overlap(resid, "resid_overlap"), Seq("query_id"), "left")
        .join(overlap(opq, "opq_overlap"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("resid_overlap"), lit(0L)).as("resid_overlap"),
          coalesce(col("opq_overlap"), lit(0L)).as("opq_overlap"),
          expr("coalesce(resid_overlap, 0) * 10000 div n_brute").as("resid_bp"),
          expr("coalesce(opq_overlap, 0) * 10000 div n_brute").as("opq_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH fix AS (SELECT r.range AS vec_id,
        |    list_transform(generate_series(0, 15), d ->
        |      CAST(((r.range % 8) * 5 + d * 3) % 17 - 8 AS DOUBLE) / 4.0
        |      + CAST((r.range * 13 + d * 7) % 9 - 4 AS DOUBLE) / 32.0) AS v
        |  FROM range(0, 560) r),
        |tm(i, rv) AS (VALUES
        |  ${opqMatValues(opqIvfcR(s))}),
        |rott AS (SELECT c.vec_id,
        |    list(list_dot_product(t.rv, c.v) ORDER BY t.i) AS v
        |  FROM fix c CROSS JOIN tm t GROUP BY c.vec_id),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM fix),
        |qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
        |  WHERE vec_id % 20 = 0),
        |bs AS (SELECT qn.query_id, n.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(qn.qv, n.v) / (qn.qnrm * n.nrm), 4) + 0.0 AS cosine
        |  FROM qn CROSS JOIN n WHERE n.vec_id <> qn.query_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank FROM bs)
        |  WHERE rank <= 10),
        |ubk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfcBooksU(s))}),
        |ucb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM ubk),
        |uc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfcCentsU(s))}),
        |ucn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM uc2),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfcBooksR(s))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfcCentsR(s))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("u", "fix", "ucb", "ucn", nProbes = 2)},
        |${opqResidTier("o", "rott", "rcb", "rcn", nProbes = 2)},
        |hu AS (SELECT b.query_id, count(*) AS resid_overlap
        |  FROM brute b JOIN utop USING (query_id, neighbor_id) GROUP BY 1),
        |ho AS (SELECT b.query_id, count(*) AS opq_overlap
        |  FROM brute b JOIN otop USING (query_id, neighbor_id) GROUP BY 1),
        |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
        |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
        |  CAST(coalesce(hu.resid_overlap, 0) AS BIGINT) AS resid_overlap,
        |  CAST(coalesce(ho.opq_overlap, 0) AS BIGINT) AS opq_overlap,
        |  CAST(coalesce(hu.resid_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS resid_bp,
        |  CAST(coalesce(ho.opq_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS opq_bp
        |FROM base LEFT JOIN hu USING (query_id) LEFT JOIN ho USING (query_id)""".stripMargin
    })

  /** Incremental maintenance for the COMPOSED index — the sim_opq_incr
    * posture applied to the full chain: rotation, rotated-space cells
    * and residual codebooks all train on HISTORY only (vec_id ≡ 0
    * mod 7) and persist; the history (vec_id, cell, sub, code) table is
    * a write-once artifact; a new batch rotates + cell-assigns +
    * residual-encodes against the LOADED artifacts and appends
    * origin-tagged — history vectors never rescanned, nothing ever
    * retrained per batch. Derived oracle re-runs rotate → assign →
    * residual-encode for every row from the history-trained literals
    * (per-row ops, so one derivation serves both origins). */
  protected def opqIvfHistCents(s: SparkSession, dir: String): Seq[Array[Double]] =
    embCentroids(s, dir, "opqrot_hist7",
      Similarity.rotateEmbeddings(
        Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(7)) === 0),
        opqHistR(s, dir)))
  protected def opqIvfHistBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, "opqrot_hist7_resid"),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, "pq_books_opqrot_hist7_resid_m8_k16",
          "embeddings")(Similarity.pqBooksToDF(s,
          Similarity.pqTrainResidual(
            Similarity.rotateEmbeddings(
              Tables.embeddings(s, dir)
                .where(pmod(col("vec_id"), lit(7)) === 0), opqHistR(s, dir)),
            opqIvfHistCents(s, dir), m = 8, ksub = 16)))))
  protected val simOpqIvfpqIncr = Q("sim_opq_ivfpq_incr",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val rH = opqHistR(s, dir)
      def rot(df: DataFrame): DataFrame = Similarity.rotateEmbeddings(df, rH)
      val cents = opqIvfHistCents(s, dir)
      val books = opqIvfHistBooks(s, dir)
      val histCodes = parquetArtifact(s, dir,
        "opq_ivfpq_resid_codes_hist7_m8_k16_c10", "embeddings")(
        Similarity.ivfPqResidualEncode(
          rot(e.where(pmod(col("vec_id"), lit(7)) === 0)), cents, books))
      histCodes.withColumn("origin", lit("history"))
        .unionByName(
          Similarity.ivfPqResidualEncode(
              rot(e.where(pmod(col("vec_id"), lit(7)) =!= 0)), cents, books)
            .withColumn("origin", lit("batch")))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH rm(i, rv) AS (VALUES
        |  ${opqMatValues(opqHistR(s, dir))}),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |rot AS (SELECT e0.vec_id,
        |    list(list_dot_product(r.rv, e0.v0) ORDER BY r.i) AS v
        |  FROM e0 CROSS JOIN rm r GROUP BY e0.vec_id),
        |rbk(sub, code, cv) AS (VALUES
        |  ${opqBookValues(opqIvfHistBooks(s, dir))}),
        |rcb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM rbk),
        |rc2(cell, w) AS (VALUES
        |  ${centValues(opqIvfHistCents(s, dir))}),
        |rcn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM rc2),
        |${opqResidTier("o", "rot", "rcb", "rcn", nProbes = 1, dsub = 8)}
        |SELECT vec_id, cell, sub, code,
        |  CASE WHEN vec_id % 7 = 0 THEN 'history' ELSE 'batch' END AS origin
        |FROM oenc""".stripMargin
    })

  /** Residual-trained PQ codebooks (pq_books_resid artifact): trained on
    * v − c(cell) against the persisted embedding centroids — shares the
    * pqBooksCache/parquetArtifact posture of the raw-vector books. */
  protected def pqResidBooks(s: SparkSession, dir: String): Seq[Seq[Array[Double]]] =
    pqBooksCache.computeIfAbsent((dir, "resid"),
      _ => Similarity.pqBooksFromDF(
        parquetArtifact(s, dir, "pq_books_resid_m8_k16", "embeddings")(
          Similarity.pqBooksToDF(s,
            Similarity.pqTrainResidual(Tables.embeddings(s, dir),
              embCentroids(s, dir, "all", Tables.embeddings(s, dir)),
              m = 8, ksub = 16)))))

  /** Residual IVF-PQ search (Similarity.ivfPqResidualTopK) — the complete
    * FAISS IVFADC layout: the stored code table is (vec_id, cell, sub,
    * code) over RESIDUALS v − c(cell) (a persisted artifact, encoded
    * once), queries probe 3 of the 10 persisted cells and ADC-score with
    * one exact LUT PER PROBED CELL from their own residual. The derived
    * oracle re-runs assignment, residuals, encode, probe ranking and ADC
    * from the two literal sets (centroids + residual codebooks). */
  protected val simIvfpqResidual = Q("sim_ivfpq_residual",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val books = pqResidBooks(s, dir)
      val codes = parquetArtifact(s, dir, "ivfpq_resid_codes_m8_k16_c10",
        "embeddings")(Similarity.ivfPqResidualEncode(e, cents, books))
      Similarity.ivfPqResidualTopK(codes,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, books, k = 10, nProbes = 3)
    },
    None, oracleFn = Some { (s, dir) =>
      val cents = embCentroids(s, dir, "all", Tables.embeddings(s, dir))
      val books = pqResidBooks(s, dir)
      val bookValues = books.zipWithIndex.flatMap { case (cs, sub) =>
        cs.zipWithIndex.map { case (c, code) =>
          s"($sub, $code, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
      }.mkString(",\n  ")
      val centValues = cents.zipWithIndex.map { case (v, i) =>
        s"($i, ${v.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH cbv(sub, code, cv) AS (VALUES
        |  $bookValues),
        |cb AS (SELECT sub, code, cv, list_dot_product(cv, cv) AS cc FROM cbv),
        |c2(cell, w) AS (VALUES
        |  $centValues),
        |cn AS (SELECT cell, w, sqrt(list_dot_product(w, w)) AS cnrm FROM c2),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |asgn AS (SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(cn.w, n.v) / (cn.cnrm * n.nrm), 6) DESC, cn.cell) AS crn
        |    FROM n CROSS JOIN cn)
        |  WHERE crn = 1),
        |resid AS (SELECT n.vec_id, a.cell,
        |    list_transform(n.v, (x, i) -> x - cn.w[i]) AS rv
        |  FROM n JOIN asgn a ON a.vec_id = n.vec_id
        |    JOIN cn ON cn.cell = a.cell),
        |sv AS (SELECT vec_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM resid CROSS JOIN range(0, 8) r),
        |sd AS (SELECT vec_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM sv JOIN cb USING (sub)),
        |enc AS (SELECT vec_id, cell, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d2u, code) AS rn FROM sd)
        |  WHERE rn = 1),
        |pb AS (SELECT query_id, cell FROM (
        |    SELECT n.vec_id AS query_id, cn.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY ROUND(list_dot_product(n.v, cn.w) / (n.nrm * cn.cnrm), 6) DESC, cn.cell) AS pr
        |    FROM n CROSS JOIN cn WHERE n.vec_id % 20 = 0)
        |  WHERE pr <= 3),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
        |qres AS (SELECT pb.query_id, pb.cell,
        |    list_transform(q.qv, (x, i) -> x - cn.w[i]) AS rqv
        |  FROM pb JOIN q ON q.query_id = pb.query_id
        |    JOIN cn ON cn.cell = pb.cell),
        |qs AS (SELECT query_id, cell, CAST(r.range AS INTEGER) AS sub,
        |    list_slice(rqv, r.range * 8 + 1, r.range * 8 + 8) AS xs
        |  FROM qres CROSS JOIN range(0, 8) r),
        |lut AS (SELECT query_id, cell, sub, code,
        |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
        |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
        |  FROM qs JOIN cb USING (sub)),
        |sc AS (SELECT l.query_id, enc.vec_id, CAST(sum(l.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN lut l ON l.cell = enc.cell
        |      AND l.sub = enc.sub AND l.code = enc.code
        |  WHERE enc.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2u, vec_id) AS rank FROM sc)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  vec_id AS neighbor_id, d2u
        |FROM r WHERE rank <= 10""".stripMargin
    })

  /** WIDE-layout twin of sim_pq_topk (Similarity.pqCodesWide +
    * pqTopKAdcWide): one array<int> code row per vector, the query LUT
    * flattened to a broadcast array, and each pair scored by ONE native
    * adc_sum_l (m loads+adds) — no per-(query, vec) re-aggregation of m
    * joined rows, which is what dominates the narrow search at sf1
    * (NOTES r13 measurements). Bit-identical results ⇒ the SAME derived
    * oracle as the narrow twin. */
  protected val simPqTopkWide = Q("sim_pq_topk_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopKAdcWide(pqCodesAllWide(s, dir),
        e.where(pmod(col("vec_id"), lit(20)) === 0), pqBooks(s, dir), k = 10)
    },
    None, oracleFn = simPqTopk.oracleFn, bench = true)

  /** WIDE-layout twin of sim_ivfpq_topk (Similarity.ivfPqTopKWide):
    * raw-vector LUTs are cell-independent, so each query ships one
    * broadcast array; the probe relation restricts the cell equi-join
    * and each surviving pair costs one adc_sum_l. Same derived oracle —
    * bit-identical ranking. */
  protected val simIvfpqTopkWide = Q("sim_ivfpq_topk_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      // the stored (vec_id, cell, codes) row persists once (r14 — the
      // sim_ivfpq_residual posture): searches read the artifact, never
      // re-assign or re-encode the corpus
      val codesWide = parquetArtifact(s, dir, "ivfpq_codes_wide_m8_k16_c10",
        "embeddings")(Similarity.ivfPqEncodeWide(e, cents, pqBooks(s, dir)))
      Similarity.ivfPqTopKWideFrom(codesWide,
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, pqBooks(s, dir), k = 10, nProbes = 3)
    },
    None, oracleFn = simIvfpqTopk.oracleFn)

  /** WIDE-layout twin of sim_ivfpq_residual: the stored code artifact
    * reshapes to (vec_id, cell, codes) once at load, per-probe LUTs
    * collapse to broadcast arrays, and the cell equi-join + one
    * adc_sum_l per pair replaces the narrow join + 8-rows-per-pair
    * aggregate. Same derived oracle — results are bit-identical. */
  protected val simIvfpqResidualWide = Q("sim_ivfpq_residual_wide",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = embCentroids(s, dir, "all", e)
      val books = pqResidBooks(s, dir)
      val codes = parquetArtifact(s, dir, "ivfpq_resid_codes_m8_k16_c10",
        "embeddings")(Similarity.ivfPqResidualEncode(e, cents, books))
      Similarity.ivfPqResidualTopKWide(
        Similarity.pqCodesWide(codes, Seq("cell")),
        e.where(pmod(col("vec_id"), lit(20)) === 0),
        cents, books, k = 10, nProbes = 3)
    },
    None, oracleFn = simIvfpqResidual.oracleFn)

  /** Debug catalog of the persisted artifacts under this sfDir's root
    * (VERDICT r14 #7): one row per artifact dir — logical name, source
    * fingerprint, file count, total bytes. Driver-local listing (the
    * artifact root is a driver-side tmp dir by construction). NOT a
    * registry query (r16): byte totals are parquet-encoder-dependent
    * and the listing is execution-order-dependent, so this stays a
    * spec-covered debug view (ArtifactStoreSpec); the oracle-checked
    * face is [[artifactCatalogChecked]]. Touches one known artifact
    * first so the catalog is never empty regardless of query
    * execution order. */
  protected def artifactCatalog(s: SparkSession, dir: String): DataFrame = {
    pqCodesAll(s, dir).count() // ensure at least one artifact exists
    val root = new java.io.File(artifactPath(dir, "x")).getParentFile
    val rows = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && !f.getName.contains("_tmp_"))
      .sortBy(_.getName)
      .map { d =>
        val files = Option(d.listFiles()).toSeq.flatten.filter(_.isFile)
        val m = "^(.*)_(\\d+)_(\\d+)$".r
        val (nm, fp) = d.getName match {
          case m(n, len, mt) => (n, s"${len}_$mt")
          case other => (other, "")
        }
        (nm, fp, files.size, files.map(_.length()).sum)
      }
    import s.implicits._
    rows.toDF("artifact", "fingerprint", "n_files", "total_bytes")
  }

  /** Checkable face of the artifact store (VERDICT r15 #8 — the last
    * rows-only exemption retired): a FIXED artifact set is touched
    * (built on first run, loaded warm after), then each row reports
    * the store's own derivation rules as oracle-checkable facts —
    * `fp_ok` pins that the served directory is exactly
    * `<name>_<srcLen>_<srcMtime>` of the declared fingerprint source
    * with a complete `_SUCCESS` marker, and `n_rows` pins the artifact's
    * cardinality against the source table (8 codes/vector narrow, one
    * row/vector wide). Byte totals and the full history listing stay in
    * [[artifactCatalog]] (spec-covered debug view — encoder- and
    * execution-order-dependent by nature, so never hashable). */
  protected def artifactCatalogChecked(s: SparkSession, dir: String): DataFrame = {
    val fixed = Seq[(String, String, () => DataFrame)](
      ("pq_codes_all_m8_k16", "embeddings", () => pqCodesAll(s, dir)),
      ("pq_codes_all_wide_m8_k16", "embeddings", () => pqCodesAllWide(s, dir)))
    val rows = fixed.map { case (nm, fpTable, touch) =>
      val served = touch()
      val src = new java.io.File(s"$dir/$fpTable.parquet")
      val expect = new java.io.File(
        artifactPath(dir, s"${nm}_${src.length()}_${src.lastModified()}"))
      val fpOk = expect.isDirectory &&
        new java.io.File(expect, "_SUCCESS").isFile
      (nm, fpOk, served.count())
    }
    import s.implicits._
    rows.toDF("artifact", "fp_ok", "n_rows")
  }

  protected val artifactCatalogQ = Q("artifact_catalog",
    (s, dir) => artifactCatalogChecked(s, dir),
    Some("""SELECT 'pq_codes_all_m8_k16' AS artifact, true AS fp_ok,
      |       8 * count(*) AS n_rows FROM embeddings
      |UNION ALL
      |SELECT 'pq_codes_all_wide_m8_k16' AS artifact, true AS fp_ok,
      |       count(*) AS n_rows FROM embeddings""".stripMargin))
  // ---------------------------------------------------------------
  // Graph-ANN (NSW family, VERDICT r15 #6 "or take it"): a
  // deterministic NN-Descent-built navigable graph + unrolled beam
  // search — the graph-ANN tier built with Spark-native joins instead
  // of HNSW's sequential inserts. All four rows are STATIC oracles:
  // the whole build + walk re-derives in DuckDB (GraphAnn.buildSql /
  // beamSql share the operator's constants, so the unrolled depths
  // can never drift).
  // ---------------------------------------------------------------

  /** The persisted navigable graph for this sfDir — built once
    * (write-once parquet artifact, the pq_codes_all posture), loaded
    * warm by every serving row and by Bench. */
  protected def graphNswAll(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir,
      s"graph_nsw_k${GraphAnn.K}_r${GraphAnn.Rounds}_skip", "embeddings")(
      GraphAnn.buildGraph(Tables.embeddings(s, dir)))

  /** Embeddings for the graph SERVING paths: a raw scan WITHOUT the
    * Tables fan-out repartition. Serving re-reads the corpus in every
    * hop's checkpoint job only to probe ≤ef·|Q| candidates — locally
    * that side ends in a BroadcastExchange, so the fan-out exchange
    * under it is pure waste (the Tables scaladoc's own criterion), and
    * at scale the scan carries its own parallelism. The BUILD path
    * (graphNswAll) keeps the fan-out: NN-Descent scoring is heavy
    * per-row compute over the whole corpus, exactly what it is for.
    * r16 optimization, guide §2.4. */
  protected def embServe(s: SparkSession, dir: String): DataFrame =
    Tables.rawParquet(s, s"$dir/embeddings.parquet")

  private def graphFinalSelect(poolCte: String): String =
    s"""SELECT query_id, CAST(rnk AS INTEGER) AS rank, node AS neighbor_id, cosine
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, node) AS rnk
       |  FROM $poolCte WHERE node <> query_id)
       |WHERE rnk <= 10""".stripMargin

  private val graphQueriesCte =
    "qy AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nb WHERE vec_id % 20 = 0)"

  /** The graph itself, rank-faced: every edge of the final navigable
    * graph (NN-Descent top-K ∪ ring), per-src rank by (cosine DESC,
    * dst). Hash-checks CONSTRUCTION — init buckets, both refinement
    * rounds, ring union — not just serving. */
  protected val simGraphBuild = Q("sim_graph_build",
    (s, dir) => {
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cosine").desc, col("dst"))
      graphNswAll(s, dir)
        .withColumn("rank", row_number().over(w).cast("int"))
        .select(col("src"), col("rank"), col("dst"), col("cosine"))
    },
    Some(s"""WITH ${GraphAnn.buildSql()}
      |SELECT src, CAST(row_number() OVER (PARTITION BY src
      |    ORDER BY cosine DESC, dst) AS INTEGER) AS rank, dst, cosine
      |FROM gf""".stripMargin))

  /** Beam-served top-k over the persisted graph (the sim_*_topk
    * contract: queries = every 20th vector, k=10). Serving reads ONLY
    * the stored adjacency + vectors; each hop is one equi-join of the
    * ≤ef·|Q| frontier against the distributed graph — the 100 TB
    * shape. */
  protected val simGraphTopk = Q("sim_graph_topk",
    (s, dir) => GraphAnn.graphTopK(embServe(s, dir),
      graphNswAll(s, dir), k = 10, stride = 20),
    Some(s"""WITH ${GraphAnn.buildSql()},
      |$graphQueriesCte,
      |${GraphAnn.beamSql("qy")}
      |${graphFinalSelect(s"bb${GraphAnn.Hops}")}""".stripMargin),
    bench = true)

  /** Oracled recall for the graph tier (the sim_pq_recall pattern):
    * per-query overlap between exact brute top-10 and the beam's
    * top-10. Both rankings deterministic ⇒ the recall figures
    * themselves hash-check against DuckDB's re-derivation of both
    * chains. */
  protected val simGraphRecall = Q("sim_graph_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val g = GraphAnn.graphTopK(embServe(s, dir), graphNswAll(s, dir),
          k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(g, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    Some(s"""WITH ${GraphAnn.buildSql()},
      |$graphQueriesCte,
      |bbs AS (SELECT qy.query_id, nb.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qy.qv, nb.v) / (qy.qnrm * nb.nrm), 4) + 0.0 AS cosine
      |  FROM qy CROSS JOIN nb WHERE nb.vec_id <> qy.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rnk FROM bbs)
      |  WHERE rnk <= 10),
      |${GraphAnn.beamSql("qy")},
      |gr AS (SELECT query_id, node AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, node) AS rnk
      |    FROM bb${GraphAnn.Hops} WHERE node <> query_id)
      |  WHERE rnk <= 10),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN gr USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin))

  /** Incremental graph maintenance: history (vec_id ≢ 0 mod 5) builds
    * and persists its graph ONCE; a new batch attaches by beam-
    * SEARCHING the frozen history graph (its top-K become the new
    * node's out-edges, origin-tagged) — history edges never
    * recomputed, history vectors probed only by the beam's equi-joins.
    * Periodic full rebuilds re-level the graph (the FAISS
    * add-with-frozen-coarse posture); appends stay one bounded walk
    * per new row. */
  /** The persisted history-side (vec_id ≢ 0 mod 5) graph — shared by
    * the incremental-maintenance and cross-corpus rows. */
  protected def graphNswHist5(s: SparkSession, dir: String): DataFrame =
    parquetArtifact(s, dir,
      s"graph_nsw_hist5_k${GraphAnn.K}_r${GraphAnn.Rounds}_skip",
      "embeddings")(GraphAnn.buildGraph(
      Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(5)) =!= 0)))

  protected val simGraphIncr = Q("sim_graph_incr",
    (s, dir) => {
      val e = embServe(s, dir)
      val hist = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = e.where(pmod(col("vec_id"), lit(5)) === 0)
      val hg = graphNswHist5(s, dir)
      hg.withColumn("origin", lit("history"))
        .unionByName(GraphAnn.attachBatch(hg, hist, batch)
          .withColumn("origin", lit("batch")))
    },
    Some(s"""WITH ${GraphAnn.buildSql(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0",
        tag = "h")},
      |qb AS (SELECT vec_id AS query_id, v AS qv,
      |    sqrt(list_dot_product(v, v)) AS qnrm
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |        WHERE vec_id % 5 = 0)
      |  WHERE list_dot_product(v, v) > 0),
      |${GraphAnn.beamSql("qb", tag = "h")}
      |SELECT src, dst, cosine, 'history' AS origin FROM gfh
      |UNION ALL
      |SELECT query_id AS src, node AS dst, cosine, 'batch' AS origin
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, node) AS rnk
      |  FROM bb${GraphAnn.Hops}h WHERE node <> query_id)
      |WHERE rnk <= ${GraphAnn.K}""".stripMargin))

  /** Shared batch-side (vec_id ≡ 0 mod 5) query relation for the
    * hist5-graph oracles. */
  private val graphBatchQrelCte =
    """qb AS (SELECT vec_id AS query_id, v AS qv,
      |    sqrt(list_dot_product(v, v)) AS qnrm
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |        WHERE vec_id % 5 = 0)
      |  WHERE list_dot_product(v, v) > 0)""".stripMargin

  /** Attribute-FILTERED graph serving (the sim_ivf_filtered contract
    * on the graph tier — DiskANN's filtered-search posture): top-10
    * among label=1 rows only, with the beam routing over the FULL
    * stored graph (non-matching nodes remain routers — what keeps
    * recall when the filter is selective) while a second accumulator
    * collects every matching node the walk scores. The filter comes
    * from the STORED label column — no re-embedding, no second
    * index. */
  protected val simGraphFiltered = Q("sim_graph_filtered",
    (s, dir) => {
      val e = embServe(s, dir)
      GraphAnn.graphTopKFiltered(e, graphNswAll(s, dir),
        e.where(col("label") === 1).select(col("vec_id")),
        k = 10, stride = 20)
    },
    Some(s"""WITH ${GraphAnn.buildSql()},
      |$graphQueriesCte,
      |mm AS (SELECT vec_id FROM embeddings WHERE label = 1),
      |${GraphAnn.beamSql("qy", matchRel = Some("mm"))}
      |SELECT query_id, CAST(rnk AS INTEGER) AS rank, node AS neighbor_id, cosine
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, node) AS rnk
      |  FROM rr)
      |WHERE rnk <= 10""".stripMargin))

  /** Cross-corpus graph serving (the sim_cross_lsh_topk contract on
    * the graph tier): the held-out fifth of the table queries the
    * OTHER four-fifths through its persisted graph — the
    * decontamination shape (queries = benchmark set, corpus = training
    * candidates). Reuses sim_graph_incr's hist5 artifact; the two id
    * spaces are disjoint so no id-equality exclusion applies
    * (crossTopK posture). */
  protected val simCrossGraphTopk = Q("sim_cross_graph_topk",
    (s, dir) => {
      val e = embServe(s, dir)
      GraphAnn.crossGraphTopK(
        e.where(pmod(col("vec_id"), lit(5)) =!= 0),
        graphNswHist5(s, dir),
        e.where(pmod(col("vec_id"), lit(5)) === 0), k = 10)
    },
    Some(s"""WITH ${GraphAnn.buildSql(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0",
        tag = "h")},
      |$graphBatchQrelCte,
      |${GraphAnn.beamSql("qb", tag = "h")}
      |SELECT query_id, CAST(rnk AS INTEGER) AS rank, node AS neighbor_id, cosine
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, node) AS rnk
      |  FROM bb${GraphAnn.Hops}h)
      |WHERE rnk <= 10""".stripMargin))

  /** Graph-tier ops audit (the sim_ivf_balance posture): the out-degree
    * histogram of the STORED navigable graph — the serving join's skew
    * profile (a hot node would fan every pool that reaches it) and the
    * degree-bound invariant (≤ K + 15 ring links) as an oracle-checked
    * fact rather than a spec-only assertion. Reads only the artifact;
    * the oracle re-derives the whole build and histograms it. */
  protected val simGraphBalance = Q("sim_graph_balance",
    (s, dir) => graphNswAll(s, dir)
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).cast("long").as("n_nodes"))
      .select(col("degree"), col("n_nodes")),
    Some(s"""WITH ${GraphAnn.buildSql()}
      |SELECT CAST(degree AS BIGINT) AS degree,
      |       CAST(count(*) AS BIGINT) AS n_nodes
      |FROM (SELECT src, count(*) AS degree FROM gf GROUP BY src)
      |GROUP BY 1""".stripMargin))

  /** Per-query ADC LUT CTEs over `qy` + `cb` (the simPqRecall chain) —
    * shared by the graph-ADC oracles. */
  private val graphAdcLutCtes =
    """qs AS (SELECT query_id, CAST(r.range AS INTEGER) AS sub,
      |    list_slice(qv, r.range * 8 + 1, r.range * 8 + 8) AS xs
      |  FROM qy CROSS JOIN range(0, 8) r),
      |lut AS (SELECT query_id, sub, code,
      |    CAST(ROUND(ROUND(list_dot_product(xs, xs)
      |      - 2 * list_dot_product(xs, cv) + cc, 6) * 1000000, 0) AS BIGINT) AS d2u
      |  FROM qs JOIN cb USING (sub))""".stripMargin

  private def graphAdcRerankSelect(poolCte: String): String =
    s"""SELECT query_id, CAST(rnk AS INTEGER) AS rank, node AS neighbor_id, cosine
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, node) AS rnk
       |  FROM (SELECT s.query_id, s.node,
       |      ROUND(list_dot_product(q.qv, nb.v) / (q.qnrm * nb.nrm), 4) + 0.0 AS cosine
       |    FROM $poolCte s JOIN nb ON nb.vec_id = s.node
       |      JOIN qy q ON q.query_id = s.query_id
       |    WHERE s.node <> s.query_id))
       |WHERE rnk <= 10""".stripMargin

  /** Graph routing over STORED PQ CODES + exact re-rank — the DiskANN
    * memory posture composed from three persisted artifacts (navigable
    * graph, wide code table, trained codebooks): the beam scores
    * candidates with the native `adc_sum_l` kernel against the
    * broadcast per-query LUT (integer micro-L2 — corpus VECTORS are
    * untouched during routing), and only the final ≤ef shortlist
    * reads true vectors for the exact cosine re-rank. At 100 TB the
    * serving tier holds m bytes/vector, not the embeddings. */
  protected val simGraphAdcTopk = Q("sim_graph_adc_topk",
    (s, dir) => GraphAnn.graphAdcTopK(embServe(s, dir),
      graphNswAll(s, dir), pqCodesAllWide(s, dir), pqBooks(s, dir),
      k = 10, stride = 20),
    None, bench = true, oracleFn = Some { (s, dir) =>
      s"""WITH ${GraphAnn.buildSql()},
        |${pqCtes(pqBooks(s, dir))},
        |$graphQueriesCte,
        |$graphAdcLutCtes,
        |${GraphAnn.beamAdcSql("qy")}
        |${graphAdcRerankSelect("rq")}""".stripMargin })

  /** Oracled recall for the ADC-routed serving face (the
    * sim_graph_recall shape): quantized routing + exact re-rank vs
    * exact brute, per query. */
  protected val simGraphAdcRecall = Q("sim_graph_adc_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val brute = Similarity.bruteTopK(e, k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val g = GraphAnn.graphAdcTopK(embServe(s, dir), graphNswAll(s, dir),
          pqCodesAllWide(s, dir), pqBooks(s, dir), k = 10, stride = 20)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(g, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_brute"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_brute"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 10000 div n_brute").as("recall_bp"))
    },
    None, oracleFn = Some { (s, dir) =>
      s"""WITH ${GraphAnn.buildSql()},
      |${pqCtes(pqBooks(s, dir))},
      |$graphQueriesCte,
      |$graphAdcLutCtes,
      |bbs AS (SELECT qy.query_id, nb.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qy.qv, nb.v) / (qy.qnrm * nb.nrm), 4) + 0.0 AS cosine
      |  FROM qy CROSS JOIN nb WHERE nb.vec_id <> qy.query_id),
      |brute AS (SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rnk FROM bbs)
      |  WHERE rnk <= 10),
      |${GraphAnn.beamAdcSql("qy")},
      |ga AS (SELECT query_id, neighbor_id FROM (
      |  ${graphAdcRerankSelect("rq")})),
      |hits AS (SELECT b.query_id, count(*) AS n_overlap
      |  FROM brute b JOIN ga USING (query_id, neighbor_id) GROUP BY 1),
      |base AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY 1)
      |SELECT base.query_id, CAST(base.n_brute AS BIGINT) AS n_brute,
      |  CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(hits.n_overlap, 0) * 10000 // base.n_brute AS BIGINT) AS recall_bp
      |FROM base LEFT JOIN hits USING (query_id)""".stripMargin })

  /** This family's registrar — composed into [[Queries.all]]. */
  protected def simQs: Seq[Q] = Seq(
    simBruteTopk, simTopkAgg, simIvfTopk, simIvfKmeansTopk,
    simIvfMultiprobe, simIvfIncr, simIvfDrift, dedupSemantic,
    dedupSemanticIncr, simLshTopk, simLshMultiprobe, simQuantize,
    simPqCodes, simPqTopk, simPqRerank, simPqRecall,
    simIvfpqTopk, simPqIncr, dedupHammingPairs, dedupHammingIncr,
    dedupHammingIncrBloom, dedupHammingClusters, simIvfBalance, simIvfFiltered,
    simBinqCodes, simBinqTopk, simBinqRerank, simBinqRecall,
    simSq8Topk, simSq8Recall, simIvfpqResidual, simBinqIncr,
    simSq8Incr, simResidualGain, simOpqGain, simOpqTrained,
    simOpqTopk, simOpqIncr, simOpqRecall, simOpqIvfpq,
    simOpqIvfpqTopk, simOpqIvfpqIncr, simOpqIvfpqRecall, simOpqIvfpqGain, simPqTopkWide, simIvfpqResidualWide, simIvfpqTopkWide,
    simGraphBuild, simGraphTopk, simGraphRecall, simGraphIncr,
    simGraphFiltered, simCrossGraphTopk, simGraphAdcTopk, simGraphAdcRecall,
    simGraphBalance,
    artifactCatalogQ)
}
