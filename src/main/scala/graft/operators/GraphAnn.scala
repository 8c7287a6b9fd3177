package graft.operators

import graft.functions.SimFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN (the NSW family), Spark-native (SURVEY.md §2.17).
  *
  * HNSW-proper is built by SEQUENTIAL data-dependent inserts — each
  * vector's entry point depends on every earlier insert — which has no
  * faithful distributed expression. The graph-ANN *family*, however,
  * has a data-parallel member: an NSW-style navigable graph whose KNN
  * core is built by NN-Descent (Dong et al., WWW 2011 — "Efficient
  * K-Nearest Neighbor Graph Construction for Generic Similarity
  * Measures"), the construction FAISS/pyNNDescent use offline. Every
  * stage here is a bounded equi-join + top-K aggregate:
  *
  *  - '''init''': candidate edges from shared sign-LSH buckets (the
  *    [[Similarity.lshCorpus]] planes — per-bucket pairs, ~N·(N/2^p)
  *    pairs total, never corpus all-pairs) plus a deterministic
  *    SKIP-LIST RING in vec_id rank order (+2^j successors, the
  *    O(log N)-diameter navigability device replacing HNSW's
  *    long-range upper layers — see [[RingOffsets]]);
  *  - '''refinement''' (×`rounds`): NN-Descent — candidates(x) =
  *    U ∪ (U ⋈ U) where U = E ∪ reverse(E); per-src top-K by
  *    (round-4 cosine DESC, dst). Candidate volume is N·(2K)² per
  *    round — linear in N, bounded per node;
  *  - '''serving''': multi-entry unrolled BEAM search, `hops` fixed
  *    expansion steps: pool ← top-ef(pool ∪ score(pool ⋈ G)) per
  *    query. The frontier is |Q|·ef rows (broadcastable); the graph
  *    and vector tables stay partitioned and are probed by equi-join —
  *    at 100 TB each hop is one hash join however large the corpus.
  *    Entry points are the `nEntries` smallest nodes in
  *    (md5(vec_id), vec_id) order — a deterministic pseudo-random
  *    spread, the distributed stand-in for HNSW's top-layer descent.
  *
  * Everything is deterministic (fixed planes, round-4 cosine, id
  * tie-breaks, monotone pool growth), so the ENTIRE build + search
  * re-derives in DuckDB as one bounded unrolled CTE chain
  * ([[buildSql]]/[[beamSql]]) — the oracle posture VERDICT r15 #6
  * asked for, vs the thousands of dependent CTEs replaying HNSW's
  * insert order would need.
  *
  * Scale notes: the one non-equi-join step is the ring's global
  * row_number (a sort of (vec_id) pairs — 16 bytes/row — on one
  * task). It runs ONCE per corpus inside the graph-build artifact; at
  * 10^10 rows you'd derive the same rank with range partitioning +
  * per-partition offsets (the zipWithIndex construction). Documented
  * rather than built: the build path is already artifact-once.
  */
object GraphAnn {

  /** Shared build/search constants — the Spark operator and the DuckDB
    * oracle builders both read THESE, so the unrolled depths can never
    * drift apart. */
  val K = 12         // graph out-degree (refined KNN edges per node)
  val Rounds = 2     // NN-Descent refinement rounds

  /** Skip-list ring offsets: each node links to its +2^j-th successor
    * in vec_id rank order (wrapping) — the deterministic distributed
    * analog of HNSW's layer hierarchy. Successor links alone gave the
    * graph O(N) diameter (measured: recall@10 fell 0.90 → 0.44 going
    * 500 → 2000 vectors, one query at 0.0 — the beam could not cross
    * the corpus); power-of-two skips give O(log N) navigability, the
    * Kleinberg small-world / skip-list construction. The list is FIXED
    * (not derived from N) so the oracle stays static: offsets ≥ N wrap
    * via mod into pseudo-random mid-range links, which only add
    * navigability. 15 offsets cover N ≤ 32768 with true halving steps;
    * at larger corpora extend the literal list (log₂N entries). */
  val RingOffsets: Seq[Int] = (0 to 14).map(1 << _)
  val NPlanes = 6    // init LSH planes (shared with Similarity.lshPlanes)
  val Ef = 64        // beam width
  val Hops = 4       // unrolled beam expansion steps
  val NEntries = 16  // deterministic entry points
  val Shortlist = 200 // ADC-routed exact-re-rank pool (pqTopKRefined size)

  /** (vec_id, v, nrm, bucket) over positive-norm vectors — the build
    * prep. Zero-norm vectors carry no cosine ordering and are excluded
    * from the graph entirely (same posture as scoreAgainst's nrm > 0). */
  private def prepped(embeddings: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    Similarity.lshCorpus(embeddings.select(col("vec_id"), col("embedding")),
      nPlanes, dim).where(col("nrm") > 0)

  /** Round-4 cosine for a distinct (src, dst) pair frame — two hash
    * joins against the vector table (the distributed NN-Descent shape:
    * pair generation and scoring are both equi-joins). */
  private def scorePairs(pairs: DataFrame, n: DataFrame): DataFrame =
    pairs
      .join(n.select(col("vec_id").as("src"), col("v").as("sv"),
        col("nrm").as("snrm")), "src")
      .join(n.select(col("vec_id").as("dst"), col("v").as("dv"),
        col("nrm").as("dnrm")), "dst")
      .select(col("src"), col("dst"),
        round(cosinePrenormed(dot(col("sv"), col("dv")),
          col("snrm"), col("dnrm")), 4).as("cosine"))

  /** Per-src top-k by (cosine DESC, dst) — the one deterministic edge
    * ranking rule, shared by init, every refinement round and the
    * final rank face. */
  private def topPerSrc(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k).select(col("src"), col("dst"), col("cosine"))
  }

  /** Deterministic skip-list ring: each node links to its +offset-th
    * successor in vec_id rank order (wrapping) for every
    * [[RingOffsets]] entry — one navigable component with O(log N)
    * diameter whatever the refinement keeps. */
  private def ringEdges(n: DataFrame, offsets: Seq[Int]): DataFrame = {
    val rk = n.select(col("vec_id"))
      .withColumn("rn", row_number().over(Window.orderBy(col("vec_id"))) - 1)
    val total = n.agg(count(lit(1)).as("n_total")) // 1-row annotation
    rk.crossJoin(broadcast(total))
      .select(col("vec_id").as("src"), col("rn"), col("n_total"),
        explode(array(offsets.map(lit): _*)).as("j"))
      .withColumn("dst_rn", (col("rn") + col("j")) % col("n_total"))
      .join(rk.select(col("vec_id").as("dst"), col("rn").as("dst_rn")), "dst_rn")
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /** The navigable graph: (src, dst, cosine), out-degree ≤ K + |offsets|.
    * Final edge set = NN-Descent-refined top-K ∪ ring. Deterministic
    * end to end, so it persists as a write-once artifact and the
    * DuckDB oracle re-derives it bit-exactly. */
  def buildGraph(embeddings: DataFrame, k: Int = K, rounds: Int = Rounds,
      nPlanes: Int = NPlanes, dim: Int = 64,
      offsets: Seq[Int] = RingOffsets): DataFrame = {
    val n = prepped(embeddings, nPlanes, dim)
    val ring = ringEdges(n, offsets)
    refinedFrom(n, ring, k, rounds)
      .unionByName(scorePairs(ring, n)).distinct()
  }

  /** The NN-Descent-refined top-K edges alone (no ring union) — exposed
    * for the monotonicity spec: each round ranks over a candidate set
    * that CONTAINS the previous edge set, so per-src edge quality can
    * only improve round over round. */
  private[graft] def refinedEdges(embeddings: DataFrame, k: Int = K,
      rounds: Int = Rounds, nPlanes: Int = NPlanes, dim: Int = 64,
      offsets: Seq[Int] = RingOffsets): DataFrame = {
    val n = prepped(embeddings, nPlanes, dim)
    refinedFrom(n, ringEdges(n, offsets), k, rounds)
  }

  private def refinedFrom(n: DataFrame, ring: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val bucketPairs = n.select(col("vec_id").as("src"), col("bucket"))
      .join(n.select(col("vec_id").as("dst"), col("bucket")), "bucket")
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    // Same lineage-cut reasoning as the beam: each round references the
    // previous edge set four times (U twice, the 2-hop self-join twice
    // more), so without a cut the plan tree grows ~4^rounds.
    var edges = topPerSrc(
      scorePairs(bucketPairs.unionByName(ring).distinct(), n), k)
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val u = edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val twoHop = u.select(col("src"), col("dst").as("mid"))
        .join(u.select(col("src").as("mid"), col("dst")), "mid")
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
      edges = topPerSrc(scorePairs(u.unionByName(twoHop).distinct(), n), k)
        .localCheckpoint()
    }
    edges
  }

  /** The `nEntries` deterministic entry points: smallest nodes in
    * (md5(vec_id-as-string), vec_id) order — a fixed pseudo-random
    * spread over the corpus, identical in both engines. */
  private def entryPoints(n: DataFrame, nEntries: Int): DataFrame =
    n.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nEntries)
      .select(col("vec_id"), col("v"), col("nrm"))

  /** Unrolled multi-entry beam search over a prebuilt graph:
    * `queries` must carry (query_id, qv, qnrm); returns the standard
    * sim contract (query_id, rank, neighbor_id, cosine), self-pairs
    * excluded at the final rank (the query's own node stays in the
    * pool mid-walk — it is a useful router). Each hop expands the
    * whole ≤ef pool through the adjacency (DiskANN-style beam, not
    * best-first: monotone pool growth keeps the unrolled plan — and
    * the oracle — free of visited-set anti-joins). */
  def beamSearch(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries): DataFrame =
    beamCore(graph, corpus, queries, k, ef, hops, nEntries,
      matchIds = None, excludeSelf = true)

  /** Cross-corpus beam serving (the crossTopK posture): queries come
    * from a different id space, so no pair is excluded by id equality —
    * an incidental collision between the two spaces can never silently
    * drop a real neighbor. */
  def crossBeamTopK(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries): DataFrame =
    beamCore(graph, corpus, queries, k, ef, hops, nEntries,
      matchIds = None, excludeSelf = false)

  /** Attribute-FILTERED graph serving (the DiskANN filtered-search
    * posture, mirroring sim_ivf_filtered's contract): the beam routes
    * over the FULL stored graph — non-matching nodes stay usable as
    * routers, which is what keeps recall when the filter is selective —
    * while a second accumulator collects every MATCHING node the walk
    * scores; the final top-k ranks only the matched pool. `matchIds`
    * must be a (vec_id) frame of the rows satisfying the predicate
    * (derivable from any stored attribute column — no re-embedding,
    * no second index). Like the IVF row, id-equal pairs are NOT
    * excluded (a query that itself matches may return itself). */
  def beamSearchFiltered(graph: DataFrame, corpus: DataFrame,
      queries: DataFrame, matchIds: DataFrame, k: Int, ef: Int = Ef,
      hops: Int = Hops, nEntries: Int = NEntries): DataFrame =
    beamCore(graph, corpus, queries, k, ef, hops, nEntries,
      matchIds = Some(matchIds), excludeSelf = false)

  private def beamCore(graph: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, ef: Int, hops: Int, nEntries: Int,
      matchIds: Option[DataFrame], excludeSelf: Boolean): DataFrame = {
    val n = corpus.select(col("vec_id"), col("v"), col("nrm"))
      .where(col("nrm") > 0)
    // The query side is ≤|Q| rows by construction and is re-read by a
    // broadcast build in EVERY hop's checkpoint job — without a cut each
    // of those builds re-runs the whole query-prep lineage (scan +
    // fan-out exchange + norm projection). One materialization serves
    // all hops (guide §2.4: remove repeated work feeding each exchange).
    val q = queries.where(col("qnrm") > 0).localCheckpoint(eager = false)
    val mset = matchIds.map(m =>
      broadcast(m.select(col("vec_id").as("node")).distinct()))
    // ONE exchange per cap (guide §2.4): pre-partition by query_id —
    // hashpartitioning(query_id) satisfies the clustered distribution of
    // BOTH the (query_id, node) dedup aggregate and the query_id rank
    // window, so agg + sort + window + filter all run in that single
    // shuffle's stage (was: one exchange for the aggregate keyed
    // (query_id, node), then a second re-keying to query_id for the
    // window). AQE coalesces the tiny partitions.
    def capped(pool: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("node"))
      pool.repartition(col("query_id"))
        .groupBy(col("query_id"), col("node"))
        .agg(min(col("cosine")).as("cosine"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= ef)
        .select(col("query_id"), col("node"), col("cosine"))
    }
    def scoreNodes(cand: DataFrame): DataFrame =
      cand.join(n.select(col("vec_id").as("node"), col("v"), col("nrm")), "node")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("node"),
          round(cosinePrenormed(dot(col("qv"), col("v")),
            col("qnrm"), col("nrm")), 4).as("cosine"))
    def matched(scored: DataFrame): DataFrame =
      mset.map(m => scored.join(m, Seq("node"), "leftsemi")).getOrElse(scored)
    // Each hop references the pool TWICE (expand + union): without a
    // lineage cut the plan tree doubles per hop — 2^hops copies of the
    // entry scoring, measured 13 s → 21 s → 44 s for hops 3/4/5 at
    // sf0.1. localCheckpoint materializes the ≤|Q|·ef-row pool (tiny by
    // construction) and truncates the lineage, making serving O(hops).
    // At cluster scale the same cut is a reliable checkpoint or a
    // persisted intermediate table — the standard iterative-algorithm
    // posture.
    // scored0 is consumed once in unfiltered mode (by the first cap) —
    // checkpoint it only when the matched accumulator references it too.
    val scored0raw = scoreNodes(
      q.select(col("query_id"))
        .crossJoin(broadcast(entryPoints(n, nEntries).select(col("vec_id").as("node")))))
    // LAZY checkpoints throughout the walk (r16, second pass): the cut
    // exists for LINEAGE (the plan tree doubles per hop), not for
    // scheduling — eager cuts ran one materialization job per hop plus
    // the next hop's broadcast-build job re-reading it (2 jobs/hop of
    // pure overhead on ≤|Q|·ef rows, ~0.4 s/hop warm at sf0.1, gprof3).
    // eager=false truncates the plan identically while the RDD
    // materializes once, cached, inside the next consumer's own job —
    // the per-hop scheduling overhead collapses into the broadcast
    // builds the walk already pays.
    val scored0 = if (mset.isEmpty) scored0raw
      else scored0raw.localCheckpoint(eager = false)
    var pool = capped(scored0).localCheckpoint(eager = false)
    // Matched-result accumulator (filtered mode only): fed from the
    // UNCAPPED per-hop scorings, so a matching node the routing pool
    // evicts still reaches the final rank. PASSIVE (feeds nothing back
    // into the walk) ⇒ one end-of-walk cap returns the identical set
    // (top-k(top-k(A) ∪ B) = top-k(A ∪ B)) with hops fewer window
    // stages; the union is bounded per query (hops·ef·degree rows) at
    // any corpus size.
    var matchedAcc = if (mset.isEmpty) None else Some(matched(scored0))
    for (_ <- 1 to hops) {
      // BROADCAST the ≤|Q|·ef frontier into the adjacency probe — the
      // documented 100 TB shape made explicit (guide §3.1): the graph
      // stays partitioned and is probed by a broadcast hash join, no
      // exchange of graph bytes whatever the corpus size. The per-hop
      // dedup `.distinct()` this replaces bought almost nothing
      // (measured 41k → 39.6k rows at sf0.1) and cost an exchange +
      // two aggregates per hop: duplicate (query_id, node) candidates
      // score to the SAME deterministic cosine and collapse in the
      // cap's (query_id, node) aggregate, so results are identical.
      val expand = graph.select(col("src"), col("dst"))
        .join(broadcast(pool.select(col("query_id"), col("node").as("src"))), "src")
        .select(col("query_id"), col("dst").as("node"))
      // the per-hop scoring is referenced twice only in filtered mode
      // (routing pool + matched accumulator) — checkpoint it there;
      // unfiltered serving consumes it once and skips the extra
      // materialization
      val scored = if (mset.isEmpty) scoreNodes(expand)
        else scoreNodes(expand).localCheckpoint(eager = false)
      pool = capped(pool.unionByName(scored)).localCheckpoint(eager = false)
      matchedAcc = matchedAcc.map(_.unionByName(matched(scored)))
    }
    val outPool = matchedAcc.map(capped).getOrElse(pool)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("node"))
    val base = if (excludeSelf) outPool.where(col("node") =!= col("query_id"))
      else outPool
    base.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("node").as("neighbor_id"), col("cosine"))
  }

  /** Self-join convenience (the sim_*_topk contract): queries are the
    * stride-th vectors, searched against the full corpus through
    * `graph`. */
  def graphTopK(embeddings: DataFrame, graph: DataFrame, k: Int, stride: Int,
      ef: Int = Ef, hops: Int = Hops, nEntries: Int = NEntries,
      nPlanes: Int = NPlanes, dim: Int = 64): DataFrame = {
    val n = prepped(embeddings, nPlanes, dim)
      .select(col("vec_id"), col("v"), col("nrm"))
    val q = n.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    beamSearch(graph, n, q, k, ef, hops, nEntries)
  }

  /** [[graphTopK]] with an attribute filter: top-k among the
    * `matchIds` rows only, routed over the FULL graph (see
    * [[beamSearchFiltered]]). Mirrors sim_ivf_filtered's contract:
    * queries are unfiltered, id-equal pairs are not excluded. */
  def graphTopKFiltered(embeddings: DataFrame, graph: DataFrame,
      matchIds: DataFrame, k: Int, stride: Int, ef: Int = Ef,
      hops: Int = Hops, nEntries: Int = NEntries, nPlanes: Int = NPlanes,
      dim: Int = 64): DataFrame = {
    val n = prepped(embeddings, nPlanes, dim)
      .select(col("vec_id"), col("v"), col("nrm"))
    val q = n.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    beamSearchFiltered(graph, n, q, matchIds, k, ef, hops, nEntries)
  }

  /** Cross-corpus convenience: `queries` is a separate (vec_id,
    * embedding) frame searched against `corpus` through its prebuilt
    * graph — the decontamination / retrieval shape ([[crossBeamTopK]]
    * semantics: no id-equality exclusion). */
  def crossGraphTopK(corpus: DataFrame, graph: DataFrame,
      queries: DataFrame, k: Int, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries, nPlanes: Int = NPlanes,
      dim: Int = 64): DataFrame = {
    val n = prepped(corpus, nPlanes, dim)
      .select(col("vec_id"), col("v"), col("nrm"))
    val q = prepped(queries, nPlanes, dim)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    crossBeamTopK(graph, n, q, k, ef, hops, nEntries)
  }

  /** Graph routing with ADC scoring over STORED PQ codes + exact
    * re-rank of the surviving pool — the DiskANN memory posture made
    * Spark-native: at 100 TB the full vectors don't fit a serving
    * tier, the m-byte codes do, so the beam walks the graph scoring
    * candidates with [[graft.plans.AdcSumL]] against the per-query
    * flattened LUT (integer micro-L2, broadcast — corpus vectors
    * untouched during routing), and only the final ≤ef shortlist per
    * query reads true vectors for the exact cosine re-rank (the
    * pqTopKRefined posture). Composes three persisted artifacts:
    * the navigable graph, the wide code table, the trained codebooks.
    * Deterministic end to end (integer ADC distances, id tie-breaks)
    * ⇒ static-oracle-checkable. */
  def graphAdcTopK(embeddings: DataFrame, graph: DataFrame,
      codesWide: DataFrame, books: Seq[Seq[Array[Double]]], k: Int,
      stride: Int, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries, nPlanes: Int = NPlanes,
      dim: Int = 64, shortlist: Int = Shortlist): DataFrame = {
    require(books.forall(_.size == books.head.size),
      "wide ADC layout requires uniform per-subspace codebook sizes")
    val (m, ksub) = (books.size, books.head.size)
    val n = prepped(embeddings, nPlanes, dim)
      .select(col("vec_id"), col("v"), col("nrm"))
    // q and the per-query LUT are ≤|Q| / |Q|·m·ksub rows by construction
    // and re-read by broadcast builds in every hop's checkpoint job —
    // one materialization each serves all hops (guide §2.4; the LUT
    // derivation in particular re-runs an embeddings scan + the full
    // codebook arithmetic per rebuild).
    val q = n.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .localCheckpoint(eager = false)
    val lutW = broadcast(Similarity.adcLutWideFrom(
        Similarity.adcLut(
          embeddings.where(pmod(col("vec_id"), lit(stride)) === 0), books))
      .where(Similarity.validWideLut(m, ksub))
      .localCheckpoint(eager = false))
    val codes = codesWide.where(Similarity.validWideCodes(m, ksub))
      .select(col("vec_id").as("node"), col("codes"))
    def scoreAdc(cand: DataFrame): DataFrame =
      cand.join(codes, "node").join(lutW, "query_id")
        .select(col("query_id"), col("node"),
          adcSum(col("codes"), col("lut"), ksub).as("d2u"))
    // single-exchange cap — same reasoning as beamCore's capped():
    // hashpartitioning(query_id) satisfies both the (query_id, node)
    // dedup aggregate and the rank window, so one shuffle serves both.
    def capAt(limit: Int)(pool: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d2u").asc_nulls_last, col("node"))
      pool.repartition(col("query_id"))
        .groupBy(col("query_id"), col("node"))
        .agg(min(col("d2u")).as("d2u"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= limit)
        .select(col("query_id"), col("node"), col("d2u"))
    }
    // Two accumulators (the pqTopKRefined shortlist posture): the
    // ROUTING pool stays at ef (what the walk expands), while the
    // RE-RANK shortlist keeps the best `shortlist` ADC candidates ever
    // scored — a true neighbor the ef-pool evicts still reaches the
    // exact re-rank (measured at sf0.001: recall@10 0.712 with the
    // ef-pool as shortlist vs 0.94+ with shortlist 200). The shortlist
    // is PASSIVE (feeds nothing back into the walk), and top-k
    // selection satisfies top-k(top-k(A) ∪ B) = top-k(A ∪ B), so ONE
    // end-of-walk cap over the unioned per-hop scorings returns the
    // identical set with hops fewer window stages; the union stays
    // bounded per query (hops·ef·degree rows) at ANY corpus size.
    // lazy checkpoints — same reasoning as beamCore's walk: the cut is
    // for lineage, the materialization rides inside the consumers' jobs
    val scored0 = scoreAdc(
      q.select(col("query_id"))
        .crossJoin(broadcast(entryPoints(n, nEntries).select(col("vec_id").as("node")))))
      .localCheckpoint(eager = false)
    var pool = capAt(ef)(scored0).localCheckpoint(eager = false)
    var shortAcc = scored0
    for (_ <- 1 to hops) {
      // broadcast frontier + no per-hop distinct — same reasoning (and
      // identical-results argument) as beamCore's expand: duplicate
      // (query_id, node) candidates carry the same deterministic d2u
      // and collapse in the caps' (query_id, node) aggregates.
      val expand = graph.select(col("src"), col("dst"))
        .join(broadcast(pool.select(col("query_id"), col("node").as("src"))), "src")
        .select(col("query_id"), col("dst").as("node"))
      val scored = scoreAdc(expand).localCheckpoint(eager = false)
      pool = capAt(ef)(pool.unionByName(scored)).localCheckpoint(eager = false)
      shortAcc = shortAcc.unionByName(scored)
    }
    val short = capAt(shortlist)(shortAcc)
    // exact re-rank of the shortlist: only here do corpus vectors load
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("node"))
    short.where(col("node") =!= col("query_id"))
      .join(n.select(col("vec_id").as("node"), col("v"), col("nrm")), "node")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("node"),
        round(cosinePrenormed(dot(col("qv"), col("v")),
          col("qnrm"), col("nrm")), 4).as("cosine"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("node").as("neighbor_id"), col("cosine"))
  }

  /** Incremental maintenance: a new batch attaches by SEARCHING the
    * frozen history graph (beam top-K become the new node's out-edges)
    * — history edges are never recomputed, the history table never
    * rescanned beyond the equi-join probes the beam makes. This is the
    * standard streaming posture for graph indexes (FAISS add-with-
    * frozen-coarse, DiskANN's in-memory insert buffer): periodic full
    * rebuilds re-level the graph, appends stay cheap. */
  def attachBatch(historyGraph: DataFrame, history: DataFrame,
      batch: DataFrame, k: Int = K, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries, nPlanes: Int = NPlanes,
      dim: Int = 64): DataFrame = {
    val hn = prepped(history, nPlanes, dim)
      .select(col("vec_id"), col("v"), col("nrm"))
    val q = prepped(batch, nPlanes, dim)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    beamSearch(historyGraph, hn, q, k, ef, hops, nEntries)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cosine"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle builders — the SAME constants drive the unrolled
  // depths, so Spark and SQL can never disagree about a round/hop count.
  // ------------------------------------------------------------------

  /** CTE fragments deriving the final graph `gf(src, dst, cosine)` from
    * a source relation of (vec_id, embedding) named by `srcSql`
    * (default: the embeddings table; the incremental oracle passes a
    * filtered SELECT). Caller must start the WITH clause. */
  def buildSql(srcSql: String = "SELECT vec_id, embedding FROM embeddings",
      k: Int = K, rounds: Int = Rounds, nPlanes: Int = NPlanes,
      dim: Int = 64, offsets: Seq[Int] = RingOffsets,
      tag: String = ""): String = {
    val planes = Similarity.lshPlanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    def score(cand: String): String =
      s"""SELECT c.src, c.dst,
         |    ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0 AS cosine
         |  FROM $cand c JOIN nb$tag a ON a.vec_id = c.src
         |    JOIN nb$tag b ON b.vec_id = c.dst""".stripMargin
    def rank(scored: String): String =
      s"""SELECT src, dst, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY src
         |    ORDER BY cosine DESC, dst) AS rnk FROM $scored) WHERE rnk <= $k"""
        .stripMargin
    val jList = offsets.mkString("[", ", ", "]")
    val roundsSql = (1 to rounds).map { i =>
      s"""uu$i$tag AS (SELECT src, dst FROM gg${i - 1}$tag
         |  UNION SELECT dst, src FROM gg${i - 1}$tag),
         |cc$i$tag AS (SELECT src, dst FROM uu$i$tag
         |  UNION SELECT x.src, y.dst FROM uu$i$tag x JOIN uu$i$tag y
         |    ON x.dst = y.src WHERE x.src <> y.dst),
         |ss$i$tag AS (${score(s"cc$i$tag")}),
         |gg$i$tag AS (${rank(s"ss$i$tag")})""".stripMargin
    }.mkString(",\n")
    s"""ee$tag AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM ($srcSql)),
       |nb$tag AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    $bucket AS bucket
       |  FROM ee$tag WHERE list_dot_product(v, v) > 0),
       |rk$tag AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rn
       |  FROM nb$tag),
       |ct$tag AS (SELECT count(*) AS n_total FROM nb$tag),
       |rg$tag AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM rk$tag a CROSS JOIN ct$tag
       |  CROSS JOIN (SELECT unnest($jList) AS j) jj
       |  JOIN rk$tag b ON b.rn = (a.rn + jj.j) % n_total
       |  WHERE a.vec_id <> b.vec_id),
       |cd0$tag AS (SELECT a.vec_id AS src, b.vec_id AS dst
       |    FROM nb$tag a JOIN nb$tag b USING (bucket)
       |    WHERE a.vec_id <> b.vec_id
       |  UNION SELECT src, dst FROM rg$tag),
       |ss0$tag AS (${score(s"cd0$tag")}),
       |gg0$tag AS (${rank(s"ss0$tag")}),
       |$roundsSql,
       |sr$tag AS (${score(s"rg$tag")}),
       |gf$tag AS MATERIALIZED (SELECT src, dst, cosine FROM gg$rounds$tag
       |  UNION SELECT src, dst, cosine FROM sr$tag)""".stripMargin
  }

  /** CTE fragments running the unrolled beam over `gf<tag>` for a query
    * relation `qrel(query_id, qv, qnrm)` the caller must have defined;
    * leaves the final pool in `bb<hops><tag>(query_id, node, cosine)`.
    * With `matchRel` (a (vec_id) CTE of filter-matching rows), also
    * unrolls the matched-result accumulator — fed from the UNCAPPED
    * per-hop scorings, exactly like [[beamSearchFiltered]] — leaving it
    * in `rr<hops><tag>`. */
  def beamSql(qrel: String, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries, tag: String = "",
      matchRel: Option[String] = None): String = {
    def cap(unioned: String): String =
      s"""SELECT query_id, node, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node) AS rnk
         |  FROM (SELECT query_id, node, min(cosine) AS cosine
         |        FROM ($unioned) GROUP BY 1, 2)) WHERE rnk <= $ef""".stripMargin
    def semi(rel: String): String = matchRel.map(m =>
      s"SELECT p.query_id, p.node, p.cosine FROM $rel p JOIN $m mm ON mm.vec_id = p.node")
      .getOrElse("")
    val hopsSql = (1 to hops).map { h =>
      val core =
        s"""xx$h$tag AS (SELECT DISTINCT p.query_id, g.dst AS node
           |  FROM bb${h - 1}$tag p JOIN gf$tag g ON g.src = p.node),
           |yy$h$tag AS (SELECT x.query_id, x.node,
           |    ROUND(list_dot_product(q.qv, nb$tag.v) / (q.qnrm * nb$tag.nrm), 4) + 0.0 AS cosine
           |  FROM xx$h$tag x JOIN nb$tag ON nb$tag.vec_id = x.node
           |    JOIN $qrel q ON q.query_id = x.query_id),
           |bb$h$tag AS (${cap(s"SELECT * FROM bb${h - 1}$tag UNION ALL SELECT * FROM yy$h$tag")})"""
          .stripMargin
      core
    }.mkString(",\n")
    // matched accumulator (filtered mode): ONE end-of-walk cap over the
    // unioned uncapped scorings — identical set to per-hop capping
    // (top-k union invariance), fewer window passes
    val rrTail = matchRel.map { _ =>
      val legs = (s"pe$tag" +: (1 to hops).map(h => s"yy$h$tag"))
        .map(semi).mkString("\n  UNION ALL ")
      s""",
        |rr$tag AS (${cap(legs)})""".stripMargin
    }.getOrElse("")
    s"""en$tag AS (SELECT vec_id, v, nrm FROM nb$tag
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nEntries),
       |pe$tag AS (SELECT q.query_id, e.vec_id AS node,
       |    ROUND(list_dot_product(q.qv, e.v) / (q.qnrm * e.nrm), 4) + 0.0 AS cosine
       |  FROM $qrel q CROSS JOIN en$tag e),
       |bb0$tag AS (${cap(s"SELECT * FROM pe$tag")}),
       |$hopsSql$rrTail""".stripMargin
  }

  /** CTE fragments for the ADC-scored beam ([[graphAdcTopK]]'s oracle):
    * same walk as [[beamSql]], but candidates score as the integer
    * micro-L2 sum of their `enc` codes against the per-query `lut`
    * relation (both defined by the caller — the pqCtes / qs-lut chain),
    * capped by (d2u ASC, node). Leaves the shortlist in
    * `bq<hops>(query_id, node, d2u)`; the caller re-ranks it exactly. */
  def beamAdcSql(qrel: String, ef: Int = Ef, hops: Int = Hops,
      nEntries: Int = NEntries, shortlist: Int = Shortlist): String = {
    def cap(limit: Int)(unioned: String): String =
      s"""SELECT query_id, node, d2u FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2u ASC, node) AS rnk
         |  FROM (SELECT query_id, node, min(d2u) AS d2u
         |        FROM ($unioned) GROUP BY 1, 2)) WHERE rnk <= $limit""".stripMargin
    def score(cand: String): String =
      s"""SELECT x.query_id, x.node, CAST(sum(l.d2u) AS BIGINT) AS d2u
         |  FROM $cand x JOIN enc ON enc.vec_id = x.node
         |  JOIN lut l ON l.query_id = x.query_id
         |    AND l.sub = enc.sub AND l.code = enc.code
         |  GROUP BY 1, 2""".stripMargin
    val hopsSql = (1 to hops).map { h =>
      s"""xq$h AS (SELECT DISTINCT p.query_id, g.dst AS node
         |  FROM bq${h - 1} p JOIN gf g ON g.src = p.node),
         |yq$h AS (${score(s"xq$h")}),
         |bq$h AS (${cap(ef)(s"SELECT * FROM bq${h - 1} UNION ALL SELECT * FROM yq$h")})"""
        .stripMargin
    }.mkString(",\n")
    // the re-rank shortlist is passive: one end-of-walk cap over all
    // per-hop scorings — identical set to per-hop capping (top-k union
    // invariance)
    val rqLegs = ("SELECT * FROM sq0" +:
      (1 to hops).map(h => s"SELECT * FROM yq$h")).mkString("\n  UNION ALL ")
    s"""enx AS (SELECT vec_id FROM nb
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nEntries),
       |cnd AS (SELECT q.query_id, x.vec_id AS node FROM $qrel q CROSS JOIN enx x),
       |sq0 AS (${score("cnd")}),
       |bq0 AS (${cap(ef)("SELECT * FROM sq0")}),
       |$hopsSql,
       |rq AS (${cap(shortlist)(rqLegs)})""".stripMargin
  }
}
