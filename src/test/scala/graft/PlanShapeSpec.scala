package graft

import graft.operators.{Seeding, Similarity}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards on physical-plan shape — the properties that make
  * these operators survive a 100 TB scale-up. A change that silently turns
  * a broadcast into a shuffle, loses scan pushdown, or drops map-side
  * top-k limiting fails here, not in production.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Count-pinned tests must build their plans from a CLEAN cache: suites
    * sharing this JVM leave CacheManager entries (persisted chunk/postings
    * frames, artifact builds), and a pinned query that substitutes a
    * leftover InMemoryRelation prints that entry's cached build subtree —
    * inflating scan/exchange counts nondeterministically (observed: the
    * same suite order passing and failing across runs as GC/ContextCleaner
    * timing shifted which entries were still resident). Clearing first
    * reproduces the fresh-JVM state PinProbe measures ceilings in. */
  private def cleanCache(): Unit = spark.catalog.clearCache()

  private def shuffleCount(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("seeding: interest filter pushed into the region scan, dims broadcast") {
    val p = plan(Seeding.seededEvents(spark, sf))
    assert(p.contains("PushedFilters: [In(r_name"), "isin must reach the parquet scan")
    assert(p.contains("BroadcastHashJoin"), "region/tournaments must broadcast")
  }

  test("flagship flatten: nested parquet scan, ZERO exchanges (bench-hygiene shape)") {
    // entry reads the persisted nested fixture: the whole flatten must be
    // a narrow Generate chain over one FileScan — any exchange here means
    // fixture synthesis leaked back into the measured query.
    val p = plan(SparkEntry.entry(spark))
    assert(p.contains("Scan parquet"), s"flagship lost its parquet-scan source:\n$p")
    assert(shuffleCount(p) == 0, s"flagship flatten grew a shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin Inner"))
  }

  test("flagship flatten (synthesized fixture): one co-partitioned shuffle pair only") {
    val p = plan(graft.operators.Flatten.flatten25(
      graft.sources.BettingFixture.sportEvents(spark, sf)))
    // orders side + markets collect_list side of the single equi-join
    assert(shuffleCount(p) <= 2, s"flatten grew extra shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin Inner"))
  }

  test("bench board: exchange/scan counts pinned per query (duplicate-subtree guard)") {
    cleanCache()
    // The regression class this catches (it has bitten three times: minhash
    // bands, multimodal signatures, collocations/familiarity — VERDICT r8
    // #7): an un-staged shared subtree silently duplicating, which shows up
    // as extra `Scan parquet` leaves and/or extra exchanges. Ceilings are
    // pinned at today's plan shapes; a query exceeding its ceiling (or a
    // new bench query missing here) fails with the observed counts so the
    // pin is a one-line update AFTER the plan is understood.
    // (exchCeil counts shuffle exchanges; scans counts parquet leaves.)
    // r17: Tables' fan-out switched round-robin → hash on the leading id
    // column, so (a) fan-out exchanges now COUNT here (hashpartitioning —
    // round-robin never matched the regex), and (b) identical fan-out
    // subtrees dedupe via ReusedExchange and downstream ops keyed on the
    // same id reuse the partitioning — several pins moved DOWN (e.g.
    // a_column_profile scans 5→1, j3_chain_agg 2→1, dedup_exact_substr
    // 4→2, er_fuzzy_pairs 3→1). Re-probed with PinProbe at sf0.001.
    val ceilings: Map[String, (Int, Int)] = Map( // name -> (exchanges, scans)
      "q1_pricing_summary" -> (2, 1),
      "x_variant_shred" -> (1, 1),
      "j3_chain_agg" -> (1, 4),
      "j_asof_join" -> (2, 2),
      "a4_last_wins" -> (1, 1),
      "a_column_profile" -> (2, 1),
      "w_topk_per_group" -> (1, 1),
      "w_topk_plan" -> (1, 1),
      "x_flagship_flatten" -> (0, 1),
      "seeding_pipeline" -> (1, 3),
      "wager_book_replay" -> (2, 2),
      "t_window_hourly" -> (1, 1),
      "t_session_windows" -> (1, 1),
      "decode_roundtrip" -> (1, 1),
      "dedup_exact_incr_bloom" -> (3, 3),
      "dedup_minhash_pairs" -> (3, 2),  // r16 s2: sh rides the band rows, verify joins gone
      "pipeline_docs_prep" -> (5, 9),  // r16 s2: fused pair verify + broadcast drop anti-join
      "pipeline_curate_full" -> (6, 9),  // r16 s2: same
      "text_stats" -> (0, 1),
      "text_bpe_tokens" -> (0, 1),
      "text_top_terms" -> (1, 1),
      "er_fuzzy_pairs" -> (1, 2),
      "dedup_exact_substr" -> (2, 3),
      "pipeline_decontam_lsh" -> (1, 2),
      "sim_brute_topk" -> (3, 2),
      "sim_topk_agg" -> (3, 2),
      "sim_ivf_topk" -> (7, 4),
      "sim_lsh_topk" -> (3, 2),
      "multimodal_decode" -> (1, 1),
      // r16 session 2: min-band emission dropped the candidate distinct's
      // exchange+aggregate; the fanned+cached band frame serves both join
      // sides (7,4 → 6,2)
      "dedup_multimodal" -> (6, 2),
      // round-10 board additions; capstone counts are pre-execution print
      // inflation across the docs_prep persist boundary — see the
      // round-10 pin test's comment for the executed shape
      "pipeline_dataset_card" -> (4, 2),
      "pipeline_crawl_to_trainer" -> (18, 15),  // r16 s2: same
      "pipeline_page_clean" -> (4, 3),
      "text_bm25_topk" -> (6, 3),
      // round-11 hybrid tier: bm25 branch (persisted postings, 6) + the
      // dense branch (embed is narrow; rank window 1) + RRF fusion agg +
      // fused rank window; the RAG capstone adds the chunk build's
      // doc-keyed window/assembly exchanges over the persisted chunk
      // frame (scan counts are pre-execution persist-boundary prints,
      // the crawl_to_trainer caveat)
      "text_hybrid_topk" -> (8, 4),
      // r12 LSH twin: same fusion shape; the dense leg's cross join
      // becomes a broadcast hash join on bucket (keys are narrow
      // projections — no extra exchange)
      "text_hybrid_lsh" -> (8, 4),
      "pipeline_rag_retrieval" -> (12, 4),
      // r13 binary tier: corpus-code build scan + query encode scan feed
      // one pair loop; the only exchange is the rank window
      "sim_binq_topk" -> (3, 2),
      // r14 quantized-tier bench representative: the PERSISTED wide code
      // artifact scans once, queries scan once (LUT build broadcasts);
      // exchanges are the LUT-collapse aggregate + the rank window —
      // no corpus re-encode anywhere in the plan
      "sim_pq_topk_wide" -> (2, 2),
      // r15 dedup-tier bench representative: batch codes scan once, the
      // PERSISTED history code artifact scans once; bands derive with
      // bit math (no exchange), the bloom prefilters the history leg
      // pre-join, and verify + pair-aggregate stay map-side at fixture
      // size — zero exchanges end to end
      "dedup_hamming_incr_bloom" -> (0, 2),
      // r15 OPQ serving face: the persisted ROTATED wide code artifact
      // scans once, rotated queries scan once; exchanges are the LUT
      // collapse + rank window (the sim_pq_topk_wide shape — rotation
      // adds projections, never an exchange or a corpus re-encode)
      "sim_opq_topk" -> (2, 2),
      // r15 composed production face (OPQ ∘ residual IVF-PQ): the
      // persisted wide residual-code artifact scans once, queries scan
      // once; the rotation + per-probed-cell LUT build rides the
      // broadcast side, the cell equi-join restricts pairs to probed
      // cells — exchanges are the LUT collapse + rank window only
      "sim_opq_ivfpq_topk" -> (2, 2),
      // r16 graph-ANN serving face: the beam's per-hop pools are
      // localCheckpoint-cut (the lineage-doubling fix measured in
      // ProfileGraph), so the FINAL plan is just the rank window over
      // the checkpointed pool RDD — one exchange, one RDD scan leaf.
      // The per-hop shape (frontier equi-join vs the graph artifact,
      // no product joins) is pinned structurally by GraphAnnSpec +
      // the four hash oracles instead.
      "sim_graph_topk" -> (1, 1),
      // r16 ADC-routed graph face: the passive shortlist takes ONE
      // end-of-walk cap, so the final plan shows the 5 checkpointed
      // scoring legs (entry + 4 hops, RDD scans) unioned into the cap
      // (groupBy + rank-window exchanges) plus the two vector-table
      // scans of the exact re-rank (corpus side + broadcast query
      // prep). Routing hops stay behind their checkpoint cuts, pinned
      // by oracles + the ladder spec like sim_graph_topk.
      "sim_graph_adc_topk" -> (1, 7))
    val failures = Queries.benchNames.flatMap { name =>
      ceilings.get(name) match {
        case None => Seq(s"$name: new bench query — add a (exchanges, scans) pin")
        case Some((exchCeil, scanCeil)) =>
          val p = plan(Queries.queries(name)(spark, sf))
          val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
          val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
          val product = p.contains("CartesianProduct") ||
            p.contains("BroadcastNestedLoopJoin Inner")
          Seq(
            if (exch > exchCeil) Some(s"$name: $exch exchanges > ceiling $exchCeil")
            else None,
            if (scans > scanCeil) Some(s"$name: $scans scan leaves > ceiling $scanCeil (duplicate subtree?)")
            else None,
            if (product && name != "sim_brute_topk" && name != "sim_topk_agg")
              Some(s"$name: product join appeared") else None).flatten
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("explicit fan-outs track session parallelism at TWO settings (low-core guard)") {
    cleanCache()
    // VERDICT r16 #6: an explicit repartition tuned for one parallelism is
    // the classic local[32]-only "win". Two invariants, asserted at two
    // shuffle-partition settings (≪ and ≫ the session's 4 cores):
    //  1. fannedBands-style fan-outs (dedup_multimodal's capped band frame)
    //     must follow spark.sql.shuffle.partitions — the session-scale conf
    //     — at WHATEVER value it has, never a compiled-in constant;
    //  2. Tables' scan fan-out follows defaultParallelism (cluster cores),
    //     NOT the shuffle conf — flipping the conf must not change it.
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq(2, 64)) {
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        cleanCache() // a band frame persisted at the other setting must not serve this one
        val pm = plan(Queries.queries("dedup_multimodal")(spark, sf))
        assert(pm.contains(s"RoundRobinPartitioning($p)"),
          s"fannedBands must fan to the session's shuffle parallelism ($p):\n$pm")
        // embeddings.parquet at sf0.001 is >64 KB → Tables fans it out to
        // min(defaultParallelism, 32) = 4 on this session, conf-independent
        // (documents.parquet sits just UNDER the tiny cutoff there)
        val pt = plan(Tables.embeddings(spark, sf))
        assert(pt.contains("hashpartitioning(vec_id") && pt.contains(", 4)"),
          s"Tables fan-out must follow defaultParallelism (4), not the shuffle conf ($p):\n$pt")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", orig)
      cleanCache()
    }
  }

  test("sim family: no expensive expression (dot_d) in any join condition") {
    cleanCache()
    // The regression class this catches (VERDICT r12 #1): a per-pair
    // filter over an aliased projection of the cosine — Catalyst
    // substitutes the alias and pushes the predicate into the join
    // CONDITION, so the dim-wide dot product evaluates TWICE per
    // query×corpus pair (once to test, once to project). scoreAgainst
    // now guards per row; this pin makes a re-introduction fail loudly.
    val names = Seq("sim_brute_topk", "sim_topk_agg", "sim_ivf_topk",
      "sim_lsh_topk", "sim_lsh_multiprobe", "sim_ivf_multiprobe",
      "sim_ivf_kmeans_topk", "sim_cross_lsh_topk", "sim_cross_lsh_mp",
      "sim_cross_ivf_topk", "text_hybrid_topk", "text_hybrid_lsh",
      "text_hybrid_lsh4", "text_hybrid_ivf",
      "sim_pq_topk", "sim_pq_rerank", "sim_ivfpq_topk",
      "sim_binq_topk", "sim_binq_rerank", "sim_sq8_topk",
      "sim_ivfpq_residual", "sim_pq_topk_wide", "sim_ivfpq_residual_wide",
      "sim_ivfpq_topk_wide",
      // r14 additions: the fixture recall pairs, trained OPQ (fixture +
      // embeddings-table), and the incremental code tiers
      "sim_residual_gain", "sim_opq_gain", "sim_opq_trained",
      "sim_opq_topk", "sim_binq_incr", "sim_sq8_incr",
      "dedup_hamming_pairs", "sim_pq_recall", "sim_opq_incr",
      "text_mmr_local",
      "pipeline_decontam_topk", "pipeline_rag_retrieval")
    val failures = names.flatMap { name =>
      val p = plan(Queries.queries(name)(spark, sf))
      p.linesIterator.filter(l =>
          l.contains("Join") || l.contains("CartesianProduct"))
        .filter(l => l.contains("dot_d") || l.contains("hamming_l") ||
          l.contains("adc_sum_l"))
        .map(l => s"$name: pair kernel inside a join condition:\n  ${l.trim}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("round-10 queries: exchange/scan counts pinned (duplicate-subtree guard)") {
    cleanCache()
    // Same contract as the bench-board pin above, for the round-10
    // additions (not on the bench board, so not auto-covered there).
    // dedup_survivor_quality builds its cluster frame EAGERLY (the
    // label-propagation loop runs at query-build time); its pinned plan is
    // the final join+window over the checkpointed labels.
    val ceilings: Map[String, (Int, Int)] = Map(
      "dedup_url" -> (1, 1),
      "dedup_url_incr" -> (2, 2),
      "pipeline_robots_filter" -> (1, 1),
      "a_host_profile" -> (3, 2),
      "dedup_survivor_quality" -> (2, 2),
      "pipeline_pack_ids" -> (4, 3),
      "multimodal_jpeg" -> (1, 1),
      "text_normalize" -> (0, 1),
      // doc pass + per-source agg + (source, lang) agg + mode window + join
      "pipeline_dataset_card" -> (6, 2),
      "dedup_exact_nfc" -> (1, 1),
      "text_compress" -> (0, 1),
      // PRE-execution counts: the gate+URL subtree prints once per
      // pre-persist reference (exact-keep agg + survivor join — the
      // docs_prep persist boundary, audited there), and each carries the
      // URL window/join, so the printed tree is ~2.4× docs_prep's. At
      // execution the persisted survivors serve all downstream stages
      // (PlanFinal: InMemoryTableScans + ReusedExchange, one URL shuffle).
      "pipeline_crawl_to_trainer" -> (20, 15))
    val failures = ceilings.toSeq.sortBy(_._1).flatMap { case (name, (exchCeil, scanCeil)) =>
      val p = plan(Queries.queries(name)(spark, sf))
      val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
      val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
      val product = p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin Inner")
      Seq(
        if (exch > exchCeil) Some(s"$name: $exch exchanges > ceiling $exchCeil")
        else None,
        if (scans > scanCeil) Some(s"$name: $scans scan leaves > ceiling $scanCeil (duplicate subtree?)")
        else None,
        if (product) Some(s"$name: product join appeared") else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("line-cleaning + retrieval families: exchange/scan counts pinned " +
      "(duplicate-subtree guard)") {
    cleanCache()
    // Same contract as the round-10 pin above. Shapes, by design:
    //  - clean_lines / line_dedup: NARROW (0 exchanges, 1 scan);
    //  - boilerplate / page_clean: the CCNet two-pass shape — frequency
    //    pass (distinct + count) and strip pass share the corpus scan
    //    lineage but scan separately (+1 pruned scan for n_docs), with
    //    reassembly's groupBy(doc_id) = 4 exchanges / 3 scans;
    //  - bm25_topk: persisted postings feed tf + df branches (cached plan
    //    prints its build exchange), score agg + window + one-row stats =
    //    6 exchanges / 3 scans, stats attach is the only nested loop
    //    (Cross, one row);
    //  - bm25_incr: three disjoint batch indexes (2 exchanges each) whose
    //    merge agg folds in = 6 exchanges / 3 filter-pushed scans.
    val ceilings: Map[String, (Int, Int)] = Map(
      "text_clean_lines" -> (0, 1),
      "text_line_dedup" -> (0, 1),
      "text_html_extract" -> (0, 1),
      // round-11 rebase onto the merged-state path: 3 batch states ×
      // (membership distinct + per-key count + the n_docs rider count)
      // + ONE N-way merge aggregate (mergeBoilerplateStatesAll) + the
      // read-time threshold attach — all over tiny line-hash frames; the
      // scan count is persist-boundary print inflation (extracted pages
      // cached once, printed per consumer — the crawl_frontier caveat)
      "pipeline_wet_clean" -> (10, 7),
      "text_boilerplate" -> (4, 3),
      "text_boilerplate_incr" -> (4, 3),
      "pipeline_page_clean" -> (4, 3),
      "text_bm25_topk" -> (6, 3),
      "text_bm25_incr" -> (6, 3),
      "text_bm25_fielded" -> (6, 3),
      "text_bm25_fielded_wet" -> (6, 3),
      "text_bm25_snippets" -> (7, 4),
      "text_bm25_pruned" -> (7, 4),
      "text_phrase_search" -> (1, 1),
      // start-keyed distinct-offset agg (2, countDistinct is two-phase)
      // + the per-(phrase, doc) rollup — all candidate-sized
      "text_phrase_positional" -> (3, 1),
      // persisted candidate frame's two legs + join + rollup
      "text_proximity" -> (4, 2),
      "text_link_density" -> (0, 1),
      "pipeline_content_extract" -> (0, 1),
      // three batch states x (distinct + count-by-key + n_docs rider)
      // + the merge aggregate — the by-design disjoint-batch shape
      "text_boilerplate_merge" -> (11, 6),
      // PRE-execution counts: the extracted-pages persist boundary prints
      // its frontier subtree (robots verdict + history anti-join + fetch
      // join) once per pageClean consumer — same print-inflation caveat
      // as pipeline_crawl_to_trainer; PlanFinal shows InMemoryTableScans
      "pipeline_crawl_frontier" -> (13, 12))
    val failures = ceilings.toSeq.sortBy(_._1).flatMap { case (name, (exchCeil, scanCeil)) =>
      val p = plan(Queries.queries(name)(spark, sf))
      val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
      val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
      val product = p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin Inner")
      Seq(
        if (exch > exchCeil) Some(s"$name: $exch exchanges > ceiling $exchCeil")
        else None,
        if (scans > scanCeil) Some(s"$name: $scans scan leaves > ceiling $scanCeil (duplicate subtree?)")
        else None,
        if (product) Some(s"$name: product join appeared") else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("round-11 queries: exchange/scan counts pinned (duplicate-subtree guard)") {
    cleanCache()
    // Same contract as the bench-board pin. Shapes, briefly:
    //  - positional_incr: 3 batch positional-index aggregates + the
    //    N-way merge + the phrase core's start-keyed countDistinct pair
    //    and rollup — the by-design disjoint-batch demo;
    //  - fielded_incr: 3 batch fielded postings+index aggregates folding
    //    into one merge aggregate;
    //  - bm25_prf: TWO scoring passes over the persisted postings (agg +
    //    rank window each) + the feedback tf aggregate + expansion rank
    //    window — all candidate-sized after the pass-1 broadcast;
    //  - dedup_semantic: assignment aggregate + the cell-keyed self-join
    //    legs over the persisted assignment + survivors join.
    //  - drop_report: the docs_prep family's counts + the attribution
    //    joins over the persisted measured frame;
    //  - semantic_incr: history index + batch assignment persist
    //    boundaries print their subtrees pre-execution (the
    //    crawl_frontier caveat) around the two dominance self-joins;
    //  - retrieval_eval: bm25's pinned 6 + the two countDistinct qrel
    //    aggregates + the per-query eval aggregate.
    val ceilings: Map[String, (Int, Int)] = Map(
      "text_positional_incr" -> (7, 3),
      // full index build + encode/decode (narrow) + the phrase core
      "text_positional_delta" -> (5, 1),
      "text_bm25_fielded_incr" -> (6, 3),
      "text_bm25_prf" -> (15, 7),
      "dedup_semantic" -> (7, 3),
      "pipeline_drop_report" -> (8, 10),
      "dedup_semantic_incr" -> (18, 7),
      "text_retrieval_eval" -> (10, 4),
      // the RAG capstone's fused counts + the chunk-level qrel
      // aggregates + the eval aggregate, printed across the persisted
      // chunk frame's boundary (the crawl_frontier caveat)
      "pipeline_rag_eval" -> (18, 5))
    val failures = ceilings.toSeq.sortBy(_._1).flatMap { case (name, (exchCeil, scanCeil)) =>
      val p = plan(Queries.queries(name)(spark, sf))
      val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
      val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
      val product = p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin Inner")
      Seq(
        if (exch > exchCeil) Some(s"$name: $exch exchanges > ceiling $exchCeil")
        else None,
        if (scans > scanCeil) Some(s"$name: $scans scan leaves > ceiling $scanCeil (duplicate subtree?)")
        else None,
        if (product) Some(s"$name: product join appeared") else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("round-13 queries: exchange/scan counts pinned (duplicate-subtree guard)") {
    cleanCache()
    // Same contract as the bench-board pin. Eager-training queries
    // (text_hybrid_trained, *_mmr — argmax/greedy loops run at build
    // time) pin their final localCheckpoint-read shape, the
    // dedup_survivor_quality convention; pipeline_rag_ivf carries the
    // chunk-persist print inflation (crawl_to_trainer caveat).
    // r17: +counted fan-out exchanges (Tables round-robin → id-hash; the
    // recall/rerank rows compose several embedding scans whose pruned
    // columns differ, so their fan-out subtrees do not ReusedExchange).
    val ceilings: Map[String, (Int, Int)] = Map(
      "sim_binq_codes" -> (1, 1),
      "sim_binq_rerank" -> (6, 4),
      "sim_binq_recall" -> (15, 8), // two full ranking chains by design
      "sim_sq8_topk" -> (3, 2),
      "sim_ivfpq_residual" -> (3, 2),
      "sim_ivfpq_residual_wide" -> (3, 2),
      "sim_pq_topk_wide" -> (4, 2),
      "sim_ivfpq_topk_wide" -> (6, 3),
      "sim_pq_codes" -> (1, 1),
      "sim_pq_topk" -> (3, 2),
      "sim_pq_rerank" -> (6, 4),
      "sim_ivfpq_topk" -> (6, 4),
      "sim_pq_incr" -> (1, 2),
      "text_hybrid_trained" -> (0, 1),
      "pipeline_rag_mmr" -> (0, 1),
      "text_mmr_topk" -> (0, 1),
      "text_hybrid_lsh4" -> (12, 7),
      "text_hybrid_ivf" -> (14, 7),
      "pipeline_rag_ivf" -> (28, 14))
    val failures = ceilings.toSeq.sortBy(_._1).flatMap { case (name, (exchCeil, scanCeil)) =>
      val p = plan(Queries.queries(name)(spark, sf))
      val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
      val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
      Seq(
        if (exch > exchCeil) Some(s"$name: $exch exchanges > ceiling $exchCeil")
        else None,
        if (scans > scanCeil) Some(s"$name: $scans scan leaves > ceiling $scanCeil (duplicate subtree?)")
        else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("packSequences: shard window + straddle explode + one assembly aggregate, no products") {
    val p = plan(graft.operators.TextAnalysis.packSequences(
      Tables.documents(spark, sf), capacityTokens = 512, nShards = 8))
    assert(shuffleCount(p) <= 2, s"packSequences grew extra shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("brute top-k: map-side WindowGroupLimit before the exchange") {
    val p = plan(Similarity.bruteTopK(Tables.embeddings(spark, sf), 10, 20))
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing")
  }

  test("hybrid/RAG LSH twins: the dense leg is a BUCKET equi-join — " +
      "strictly fewer nested-loop joins than the brute twin (only the " +
      "1-row stats attaches remain)") {
    // The whole point of the r12 `_lsh` twins: the corpus×queries vector
    // scan (a Cross BroadcastNestedLoopJoin in the brute dense leg)
    // becomes a BroadcastHashJoin keyed on the sign-LSH bucket, so the
    // dense candidate set is bucket-sized at ANY corpus size. Pin both
    // halves: the bucket hash join exists, and the nested-loop count
    // DROPS vs the brute twin (what's left is the 1-row BM25 stats
    // attach, which is a broadcast of one row, not a scan product).
    val bnlj = "BroadcastNestedLoopJoin".r
    val bucketJoin = "BroadcastHashJoin \\[[^\\]]*bucket".r
    for ((brute, lsh) <- Seq(
        ("text_hybrid_topk", "text_hybrid_lsh"),
        ("pipeline_rag_retrieval", "pipeline_rag_lsh"))) {
      val pB = plan(Queries.queries(brute)(spark, sf))
      val pL = plan(Queries.queries(lsh)(spark, sf))
      assert(bucketJoin.findFirstIn(pL).isDefined,
        s"$lsh: dense leg must equi-join on the LSH bucket:\n$pL")
      assert(bnlj.findAllIn(pL).length < bnlj.findAllIn(pB).length,
        s"$lsh: nested-loop joins must drop vs $brute " +
          s"(${bnlj.findAllIn(pL).length} vs ${bnlj.findAllIn(pB).length})")
      assert(!pL.contains("CartesianProduct"), s"$lsh grew a cartesian:\n$pL")
    }
  }

  test("hybrid IVF twin: dense leg equi-joins on the CELL against " +
      "broadcast centroids — never a corpus×queries vector product") {
    // The r13 trained-index twin (VERDICT r12 #7): the only nested-loop
    // joins left are broadcast attaches of the 10-row centroid frame
    // (assignment + probe ranking) and the 1-row BM25 stats — the
    // corpus×queries pair scan of the brute twin is gone, replaced by a
    // BroadcastHashJoin keyed on the assigned cell. The 4-plane LSH dial
    // twin must keep the bucket-join shape of its 6-plane sibling.
    val cellJoin = "BroadcastHashJoin \\[[^\\]]*cell".r
    val bnlj = "BroadcastNestedLoopJoin".r
    val pI = plan(Queries.queries("text_hybrid_ivf")(spark, sf))
    val pB = plan(Queries.queries("text_hybrid_topk")(spark, sf))
    assert(cellJoin.findFirstIn(pI).isDefined,
      s"text_hybrid_ivf: dense leg must equi-join on the cell:\n$pI")
    assert(!pI.contains("CartesianProduct"))
    // centroid attaches are ≤10-row broadcasts; the PAIR loop must not
    // be among the nested loops: every BNLJ line must mention neither qv
    // nor a corpus-vector operand (the brute twin's has both sides' vecs)
    assert(!pI.linesIterator.exists(l =>
        l.contains("BroadcastNestedLoopJoin") && l.contains("dot_d")),
      s"text_hybrid_ivf: a vector product survived:\n$pI")
    val pL4 = plan(Queries.queries("text_hybrid_lsh4")(spark, sf))
    assert("BroadcastHashJoin \\[[^\\]]*bucket".r.findFirstIn(pL4).isDefined,
      s"text_hybrid_lsh4: dense leg must equi-join on the LSH bucket")
    assert(bnlj.findAllIn(pL4).length < bnlj.findAllIn(pB).length,
      "text_hybrid_lsh4: nested-loop joins must drop vs the brute twin")
  }

  test("paragraph dedup: rank-limit pushes a map-side WindowGroupLimit; no product joins") {
    val p = plan(graft.operators.TextAnalysis.paragraphDedup(
      Tables.documents(spark, sf), paraTokens = 20))
    assert(p.contains("WindowGroupLimit"), "first-occurrence window lost its rank-limit pushdown")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("exact-substr dedup: sortless aggregate dup-marking, never a product or window") {
    val p = plan(graft.operators.TextAnalysis.exactSubstrDedup(
      Tables.documents(spark, sf), spanTokens = 10))
    // Anchoring on the shingle HASH keeps duplicate detection equi-keyed on
    // a 32-byte value — any product join would be the all-pairs blowup the
    // bucketing avoids. Dup-marking must stay a map-side-combinable hash
    // aggregate: a row_number window here would put a megahit boilerplate
    // shingle's every occurrence into ONE sort buffer.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"exact-substr grew a product join:\n$p")
    assert(!p.contains("Window"), s"dup-marking regressed to a sort window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      "per-shingle aggregate missing")
  }

  test("strict-C4 flagship keeps the default's plan shape (branch is a projection)") {
    val p = plan(graft.operators.Flatten.flatten25(
      graft.sources.BettingFixture.sportEvents(spark, sf),
      noLinesTz = Some("America/Chicago")))
    // The tz branch must stay a per-row when() projection — not a second
    // scan, filter+union pair, or extra exchange over the default plan.
    assert(shuffleCount(p) <= 2, s"strict C4 grew extra shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin Inner"))
  }

  test("tfidf: vocab side of the term join stays broadcast-or-hash, never a product") {
    val p = plan(graft.operators.TextAnalysis.tfidfTopTerms(
      Tables.documents(spark, sf), k = 3))
    assert(p.contains("HashJoin"), s"term join must be a hash join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("WindowGroupLimit"), "per-doc rank-limit pushdown missing")
  }

  test("funnel: step-type filter reaches the scan; one shuffle, no per-step joins") {
    val df = graft.operators.Funnel.userFunnel(
      Tables.events(spark, sf), Seq("view", "click", "purchase"))
    val p = plan(df)
    assert(p.contains("PushedFilters: [In(event_type"),
      "step IN-list must push into the parquet scan")
    assert(shuffleCount(p) == 1,
      s"funnel fold must be ONE user shuffle, not a per-step join cascade:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("token budget: prefix side broadcasts; the big window keys on (source, bucket)") {
    val p = plan(graft.operators.TextAnalysis.tokenBudgetSample(
      Tables.documents(spark, sf), Map("src0" -> 700L), defaultBudget = 500L))
    assert(p.contains("BroadcastHashJoin"), "tiny prefix table must broadcast")
    assert("hashpartitioning\\(source#\\d+, bucket#\\d+".r.findFirstIn(p).isDefined,
      s"running sum must partition by (source, bucket) for 256-way parallelism:\n$p")
  }

  test("bloom incremental dedup: history consults via broadcast semi, never a history shuffle") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val hist = docs.where(col("doc_id") % 7 === 0)
      .select(md5(col("text")).as("text_md5"))
    val bloom = graft.operators.Dedup.buildHashBloom(hist, "text_md5", 1 << 16)
    val p = plan(graft.operators.Dedup.exactIncrementalBloom(
      docs.where(col("doc_id") % 7 =!= 0), hist, bloom))
    assert(p.contains("might_contain"), "bloom probe must be in the plan")
    assert(p.contains("BroadcastHashJoin") &&
      (p.contains("LeftSemi") || p.contains("LeftAnti")),
      s"history must join via broadcast semi/anti, not a shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join would shuffle the 100 TB history side:\n$p")
  }

  test("salted join: the join key carries the salt (hot keys spread over reducers)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val dim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val p = plan(graft.operators.Salted.equiJoin(
      ev.select(col("event_id"), col("event_type")), dim, "event_type", 8))
    assert(p.contains("_salt"), s"join must key on (key, _salt):\n$p")
  }

  test("ivf cell assignment is a hash aggregate, not a per-vector window") {
    val p = plan(Similarity.ivfTopK(Tables.embeddings(spark, sf), 10, 20))
    assert(!p.contains("windowspecdefinition(vec_id"),
      "assignment regressed to a row_number window over vec_id")
    assert(p.contains("HashAggregate"),
      s"assignment argmax must be a (partial) hash aggregate:\n$p")
  }

  test("decode_roundtrip: routing filter stays ABOVE the fan-out exchange") {
    // Regression guard for the round-5 serialization bug: without the
    // Stage barrier on `raw`, the routing predicate inlines the whole
    // encode expression and pushes below Tables' repartition — onto the
    // 1-task single-row-group scan, running the encode on one core.
    val p = plan(Queries.queries("decode_roundtrip")(spark, sf))
    val iFilter = p.indexOf("Filter ")
    // r17: the fan-out is a hash exchange on the leading id column now
    // (see Tables.load) — the guard is the same: encode + routing must
    // evaluate ABOVE it, on the fanned-out side.
    val iExchange = p.indexOf("Exchange hashpartitioning(l_orderkey")
    assert(iFilter >= 0 && iExchange >= 0, s"expected Filter + id-hash fan-out:\n$p")
    // toString prints top-down: the filter must print BEFORE (above) the
    // fan-out exchange, i.e. evaluate post-fan-out, in parallel.
    assert(iFilter < iExchange,
      s"routing filter was pushed below the fan-out repartition:\n$p")
    // The encode (Generate barrier) must also sit above the exchange.
    val iGenerate = p.indexOf("Generate explode")
    assert(iGenerate >= 0 && iGenerate < iExchange,
      s"encode must run post-fan-out, not on the scan side:\n$p")
  }

  test("pack: one shard shuffle; chunk: doc-keyed exchanges only, no products") {
    val pPack = plan(Queries.queries("pipeline_pack_docs")(spark, sf))
    assert(shuffleCount(pPack) == 1,
      s"packing must shuffle once, on the shard key:\n$pPack")
    // chunking rebuilds chunk_text from original words (round-9 review):
    // per-word spans need a doc-keyed window + a doc-keyed reassembly
    // aggregate — both on the SAME near-uniform key, and nothing else.
    val pChunk = plan(Queries.queries("pipeline_chunk_docs")(spark, sf))
    assert(shuffleCount(pChunk) <= 2,
      s"chunking must stay on doc-keyed exchanges:\n$pChunk")
    assert(!pChunk.contains("CartesianProduct") &&
      !pChunk.contains("BroadcastNestedLoopJoin"))
  }

  test("multi-probe LSH stays one equi-join, no cartesian product") {
    val p = plan(Queries.queries("sim_lsh_multiprobe")(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"probe expansion must stay an equi-join on bucket:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query side must broadcast:\n$p")
  }

  test("q1 scan prunes unused lineitem columns") {
    val p = plan(Queries.queries("q1_pricing_summary")(spark, sf))
    assert(!p.contains("l_suppkey") && !p.contains("l_partkey"),
      "column pruning lost — scan reads unused columns")
  }

  test("minhash candidates: equi-join on band key, never a cross join") {
    val p = plan(graft.operators.Dedup.minhashCandidates(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct"), "LSH banding must stay an equi-join")
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    // Bucket both fact tables on the join key — the 100 TB recipe for a
    // repeatedly-joined pair: pay the layout cost once at write time, then
    // every orderkey join runs exchange-free.
    Tables.orders(spark, sf).write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val p = plan(joined)
    val joinSection = p.substring(p.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle its inputs:\n$p")
    assert(joined.collect().map(_.getAs[Long]("n")).sum == 6000) // all lineitems
    spark.sql("DROP TABLE orders_b"); spark.sql("DROP TABLE lineitem_b")
  }

  test("snapshotDiff on key-bucketed snapshots joins exchange-free") {
    // The scale claim in Upsert.snapshotDiff's doc, proven: store each
    // corpus version bucketed on the key and the version diff's full-outer
    // join needs no shuffle at all — diffing two 100 TB snapshots moves
    // only fingerprints within already-co-located buckets.
    import org.apache.spark.sql.functions.{col, concat, lit, pmod, when}
    val docs = Tables.documents(spark, sf)
    val snapB = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")))
    docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_a_b")
    snapB.write.bucketBy(4, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_b_b")
    val diff = graft.operators.Upsert.snapshotDiff(
      spark.table("snap_a_b"), spark.table("snap_b_b"), "doc_id", Seq("text"))
    val p = plan(diff)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed snapshot diff must not shuffle:\n$p")
    val byStatus = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("changed", 0L) > 0 &&
      byStatus.getOrElse("unchanged", 0L) > 0 &&
      !byStatus.contains("added") && !byStatus.contains("removed"))
    spark.sql("DROP TABLE snap_a_b"); spark.sql("DROP TABLE snap_b_b")
  }

  test("runtime bloom filter injects into the big side of a selective shuffle join") {
    // The 100 TB shape: a selective dim filter grows a bloom filter that
    // prunes the fact scan BEFORE the shuffle. Raw scan legs keep this
    // guard deterministic: whether a Tables-loaded leg also qualifies
    // depends on whether its size-gated fan-out repartition engaged (tiny
    // single-row-group files skip it, real layouts may not — same class
    // of effect as the decode_roundtrip pushdown lesson). Thresholds are
    // forced because local test files are tiny; the two size gates point
    // OPPOSITE ways — creation (dim) side must be UNDER its threshold,
    // application (fact) scan OVER its own.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.col
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ords = spark.read.parquet(s"$sf/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val j = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      assert(j.queryExecution.optimizedPlan.toString.contains("bloom_filter_agg"),
        "selective dim join must grow a runtime bloom filter for the fact scan")
      assert(j.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: dim filter prunes the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("dpp_events").toString
    Tables.events(spark, sf)
      .withColumn("day", expr("ts div (86400L * 1000000000L)"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val facts = spark.read.parquet(dir)
    val dim = spark.range(0, 50000)
      .selectExpr("id AS day", "id % 5 AS grp").where("grp = 0")
    val j = facts.join(dim, "day")
    val p = plan(j)
    assert(p.contains("dynamicpruning"),
      s"partitioned fact scan must take a dynamic pruning subquery:\n$p")
    assert(j.collect().nonEmpty)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 90% of the fact rows share ONE key — the melt-a-reducer shape that
      // salting (operators.Salted) fixes for aggregates and AQE fixes for
      // joins, with no query rewrite.
      val fact = Tables.lineitem(spark, sf)
        .select(when(pmod(col("l_orderkey"), lit(10)) < 9, 1L)
          .otherwise(col("l_orderkey")).as("k"), col("l_quantity"))
      val dim = Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS QueryExecution (count() would wrap a new
      // one and leave this adaptive plan unevaluated at its initial state)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join must split the hot partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
