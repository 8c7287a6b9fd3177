package graft

import graft.operators.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer BM25: postings/index correctness on a hand-computed corpus,
  * index merge ≡ single pass over disjoint batches, the two classic
  * ranking monotonicities (tf saturation, df discounting), and plan
  * shape (query set broadcast, postings exchange reused for df). */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("postings: tf and dl per (term, doc)") {
    val p = Retrieval.postings(docs(
        (1L, "red red blue"), (2L, "blue")))
      .orderBy("term", "doc_id")
      .as[(String, Long, Long, Long)].collect()
    assert(p.toSeq == Seq(
      ("blue", 1L, 3L, 1L), ("blue", 2L, 1L, 1L), ("red", 1L, 3L, 2L)))
  }

  test("termIndex over disjoint batches merges to the single-pass index, " +
      "any association order") {
    val d = docs((1L, "a b a"), (2L, "b c"), (3L, "a"), (4L, "c c c"))
    val whole = Retrieval.termIndex(d)
      .as[(String, Long, Long)].collect().toSet
    val parts = (0 until 3).map(i =>
      Retrieval.termIndex(d.where(pmod($"doc_id", lit(3)) === i)))
    val left = Retrieval.mergeTermIndex(
      Retrieval.mergeTermIndex(parts(0), parts(1)), parts(2))
    val right = Retrieval.mergeTermIndex(parts(0),
      Retrieval.mergeTermIndex(parts(1), parts(2)))
    assert(left.as[(String, Long, Long)].collect().toSet == whole)
    assert(right.as[(String, Long, Long)].collect().toSet == whole)
    assert(whole == Set(("a", 2L, 3L), ("b", 2L, 2L), ("c", 2L, 4L)))
  }

  test("ranking: higher tf at equal length ranks first; rarer term " +
      "outweighs a common one") {
    // corpus: 'rare' in one doc, 'common' in three; equal doc lengths
    val d = docs(
      (1L, "rare pad pad pad"),
      (2L, "common common pad pad"),
      (3L, "common pad pad pad"),
      (4L, "common pad pad pad"))
    val q = Seq(("qa", "common"), ("qb", "rare"), ("qb", "common"))
      .toDF("query_id", "term")
    val out = Retrieval.bm25TopK(d, q, k = 4)
      .select($"query_id", $"doc_id", $"score", $"rnk")
      .as[(String, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // qa: doc 2 (tf=2) beats docs 3/4 (tf=1); 3 before 4 on the tie-break
    assert(out("qa").map(_._2).toSeq == Seq(2L, 3L, 4L))
    // qb: the rare-term doc must beat every common-term doc
    assert(out("qb").head._2 == 1L)
    // saturation: doubling tf must NOT double the score contribution
    val s2 = out("qa")(0)._3; val s1 = out("qa")(1)._3
    assert(s2 > s1 && s2 < 2 * s1,
      s"tf=2 score $s2 vs tf=1 score $s1: saturation violated")
  }

  test("shorter doc ranks above longer doc at equal tf (length " +
      "normalization)") {
    val d = docs(
      (1L, "hit pad"), (2L, "hit pad pad pad pad pad pad pad"))
    val q = Seq(("q", "hit")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(d, q, k = 2)
      .orderBy("rnk").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("BM25F: a title hit outranks the same term buried in a body of " +
      "equal weighted length; either-field df") {
    val fields = Seq(
      (1L, "hit title here", "pad pad pad pad pad pad"),    // title hit
      (2L, "other title here", "hit pad pad pad pad pad"),  // body hit
      (3L, "no match at", "all pad pad pad pad pad"))
      .toDF("doc_id", "title", "body")
    val q = Seq(("q", "hit")).toDF("query_id", "term")
    val out = Retrieval.bm25FieldedTopK(fields, q, k = 3)
      .orderBy("rnk").select("doc_id").as[Long].collect()
    // equal weighted dl (3*3 + 6 = 15 each): title weight decides
    assert(out.toSeq == Seq(1L, 2L), s"title hit must rank first: ${out.toSeq}")
  }

  test("phrase search: overlapping occurrences count, single-token docs " +
      "never false-match, absent phrases contribute nothing") {
    val d = docs(
      (1L, "x x x pad"),          // "x x" twice (overlap)
      (2L, "x pad x"),            // no adjacency
      (3L, "x"))                  // 1-token doc: whole-doc shingle "x"
    val p = Seq(("a", "x x"), ("b", "never here")).toDF("phrase_id", "phrase")
    val out = Retrieval.phraseSearch(d, p)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 2L)), s"got $out")
  }

  test("positional phrases: trigram with a decoy prefix, repeated-term " +
      "phrase, overlap counting, and agreement with the bigram tier on " +
      "2-term phrases") {
    val d = docs(
      (1L, "a b c pad a b x"),    // "a b c" once; decoy "a b" prefix at 5
      (2L, "go go go stop"),      // "go go" overlaps: starts 1,2
      (3L, "c b a"))              // reversed: no hit
    val p = Seq(
      ("t3", Seq("a", "b", "c")),
      ("rep", Seq("go", "go")),
      ("t2", Seq("a", "b")))
      .toDF("phrase_id", "terms")
    val out = Retrieval.phraseSearchPositional(d, p)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("t3", 1L, 1L), ("rep", 2L, 2L),
      ("t2", 1L, 2L)), s"got $out")
    // 2-term positional == bigram-tier counts on the same corpus
    val bigram = Retrieval.phraseSearch(d,
        Seq(("t2", "a b")).toDF("phrase_id", "phrase"))
      .as[(String, Long, Long)].collect().toSet
    assert(bigram == out.filter(_._1 == "t2"))
  }

  test("proximity: either order within the window, boundary inclusive, " +
      "outside-window and missing-term pairs contribute nothing") {
    val d = docs(
      (1L, "a x x b"),      // |0-3| = 3 -> inside at window 3
      (2L, "b x a"),        // reversed order, |2-0| = 2 -> inside
      (3L, "a x x x b"),    // |0-4| = 4 -> outside
      (4L, "a only here"))  // partner missing
    val p = Seq(("w", "a", "b")).toDF("pair_id", "term_a", "term_b")
    val out = Retrieval.proximitySearch(d, p, window = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("w", 1L, 1L), ("w", 2L, 1L)), s"got $out")
  }

  test("positional index merges to the single-pass index over disjoint " +
      "batches, any association order; indexed phrase/proximity equal " +
      "the one-shot forms") {
    val d = docs(
      (1L, "a b c pad a b x"), (2L, "go go go stop"),
      (3L, "c b a"), (4L, "a x x b"), (5L, "b x a"))
    val whole = Retrieval.positionalIndex(d)
      .as[(String, Long, Seq[Int])].collect().toSet
    val parts = (0 until 3).map(i =>
      Retrieval.positionalIndex(d.where(pmod($"doc_id", lit(3)) === i)))
    val left = Retrieval.mergePositionalIndex(
      Retrieval.mergePositionalIndex(parts(0), parts(1)), parts(2))
    val right = Retrieval.mergePositionalIndex(parts(0),
      Retrieval.mergePositionalIndex(parts(1), parts(2)))
    assert(left.as[(String, Long, Seq[Int])].collect().toSet == whole)
    assert(right.as[(String, Long, Seq[Int])].collect().toSet == whole)
    // positions are sorted 0-based: doc 1's 'a' at 0 and 4, 'b' at 1 and 5
    assert(whole.contains(("a", 1L, Seq(0, 4))))
    assert(whole.contains(("b", 1L, Seq(1, 5))))
    // a doc SPLIT across states (not the disjoint contract, but the
    // monoid must still absorb it): positions interleave and re-sort
    val split = Retrieval.mergePositionalIndex(
      Seq(("a", 9L, Seq(4))).toDF("term", "doc_id", "positions"),
      Seq(("a", 9L, Seq(0, 7))).toDF("term", "doc_id", "positions"))
      .as[(String, Long, Seq[Int])].collect().toSet
    assert(split == Set(("a", 9L, Seq(0, 4, 7))))
    // indexed forms over the merged index == the one-shot wrappers
    val phrases = Seq(("t3", Seq("a", "b", "c")), ("rep", Seq("go", "go")))
      .toDF("phrase_id", "terms")
    val oneShot = Retrieval.phraseSearchPositional(d, phrases)
      .as[(String, Long, Long)].collect().toSet
    val viaIndex = Retrieval.phraseSearchPositionalIndexed(left, phrases)
      .as[(String, Long, Long)].collect().toSet
    assert(viaIndex == oneShot && oneShot.nonEmpty, s"$viaIndex vs $oneShot")
    val pairs = Seq(("w", "a", "b")).toDF("pair_id", "term_a", "term_b")
    val proxOne = Retrieval.proximitySearch(d, pairs, window = 3)
      .as[(String, Long, Long)].collect().toSet
    val proxIdx = Retrieval.proximitySearchIndexed(right, pairs, window = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(proxIdx == proxOne && proxOne.nonEmpty, s"$proxIdx vs $proxOne")
  }

  test("delta encoding stores first + gaps exactly (not merely any " +
      "self-inverse pair) and round-trips to the identical index") {
    val d = docs((1L, "a b a x a"), (2L, "a"))
    val idx = Retrieval.positionalIndex(d)
    val enc = Retrieval.positionalIndexDelta(idx)
      .as[(String, Long, Seq[Int])].collect().toSet
    // doc 1 'a' at 0,2,4 -> first 0, gaps 2,2; single occurrence stays
    assert(enc.contains(("a", 1L, Seq(0, 2, 2))), s"got $enc")
    assert(enc.contains(("a", 2L, Seq(0))))
    assert(enc.contains(("b", 1L, Seq(1))) && enc.contains(("x", 1L, Seq(3))))
    val back = Retrieval.positionalIndexFromDelta(
        Retrieval.positionalIndexDelta(idx))
      .as[(String, Long, Seq[Int])].collect().toSet
    assert(back == idx.as[(String, Long, Seq[Int])].collect().toSet)
  }

  test("delta artifact is queried DIRECTLY: phrase/proximity over the " +
      "encoded index ≡ the plain-index path (term-filter before decode)") {
    val d = docs(
      (1L, "a b c a b c go go"), (2L, "a x b pad c"), (3L, "go pad go"))
    val idx = Retrieval.positionalIndex(d)
    val delta = Retrieval.positionalIndexDelta(idx)
    val phrases = Seq(("t3", Seq("a", "b", "c")), ("rep", Seq("go", "go")))
      .toDF("phrase_id", "terms")
    val plain = Retrieval.phraseSearchPositionalIndexed(idx, phrases)
      .as[(String, Long, Long)].collect().toSet
    val direct = Retrieval.phraseSearchPositionalDelta(delta, phrases)
      .as[(String, Long, Long)].collect().toSet
    assert(direct == plain && plain.nonEmpty, s"$direct vs $plain")
    val pairs = Seq(("w", "a", "c"), ("self", "go", "go"))
      .toDF("pair_id", "term_a", "term_b")
    val proxPlain = Retrieval.proximitySearchIndexed(idx, pairs, window = 2)
      .as[(String, Long, Long)].collect().toSet
    val proxDirect = Retrieval.proximitySearchDelta(delta, pairs, window = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(proxDirect == proxPlain && proxPlain.nonEmpty,
      s"$proxDirect vs $proxPlain")
    // the self-pair guard fires before the term filter on the delta path too
    assert(!proxDirect.exists(_._1 == "self"))
  }

  test("prefix_sum_i: linear decode kernel — inclusive running sum, " +
      "empty array, null element, null array; codegen ≡ interpreted") {
    val df = Seq(
      (1L, Some(Seq(Some(0), Some(2), Some(2)))),
      (2L, Some(Seq.empty[Option[Int]])),
      (3L, Some(Seq(Some(5), None, Some(1)))),
      (4L, Option.empty[Seq[Option[Int]]]))
      .toDF("id", "deltas")
    def run(codegen: String): Map[Long, Option[Seq[Int]]] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try Retrieval.positionalIndexFromDelta(
          df.select(lit("t").as("term"), $"id".as("doc_id"), $"deltas"))
        .select($"doc_id", $"positions")
        .as[(Long, Option[Seq[Int]])].collect().toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val expected = Map(
      1L -> Some(Seq(0, 2, 4)), 2L -> Some(Seq.empty[Int]),
      3L -> None, 4L -> None)
    assert(run("true") == expected)
    assert(run("false") == expected)
  }

  test("proximity rejects self-pairs: term_a = term_b contributes no " +
      "rows even when the term occurs many times") {
    val d = docs((1L, "x x x"), (2L, "x pad x"))
    val p = Seq(("self", "x", "x"), ("ok", "x", "pad"))
      .toDF("pair_id", "term_a", "term_b")
    val out = Retrieval.proximitySearch(d, p, window = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(!out.exists(_._1 == "self"), s"self-pair must be rejected: $out")
    assert(out == Set(("ok", 2L, 2L)), s"got $out")
  }

  test("fielded termIndex merges to the single-pass fielded index over " +
      "disjoint batches (mergeTermIndex monoid)") {
    val fields = Seq(
      (1L, "hit title", "pad body text"),
      (2L, "other one", "hit pad pad"),
      (3L, "pad hit", "hit hit pad"))
      .toDF("doc_id", "title", "body")
    val whole = Retrieval.fieldedTermIndex(fields)
      .as[(String, Long, Long)].collect().toSet
    val merged = (0 until 2).map(i =>
        Retrieval.fieldedTermIndex(fields.where(pmod($"doc_id", lit(2)) === i)))
      .reduce(Retrieval.mergeTermIndex)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
    // hit: doc1 title only (tf 3), doc2 body (tf 1), doc3 both (3 + 2)
    assert(whole.contains(("hit", 3L, 9L)), s"got $whole")
  }

  test("RRF fusion: a doc both tiers agree on beats each tier's own " +
      "top hit; integer contributions are 10000 div (60 + rnk)") {
    val tierA = Seq(("q", 10L, 1), ("q", 3L, 2), ("q", 11L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val tierB = Seq(("q", 20L, 1), ("q", 3L, 2), ("q", 21L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val fused = Retrieval.rrfFuse(Seq(tierA, tierB), k = 5)
      .orderBy("rnk")
      .as[(String, Long, Long, Long, Int)].collect()
    // doc 3 is rank 2 in BOTH tiers yet fuses to rank 1 — the hybrid
    // win neither tier alone produces (each ranks its own doc first)
    assert(fused.head._2 == 3L, s"consensus doc must fuse first: ${fused.toSeq}")
    assert(fused.head._3 == 2 * (10000 / 62), "integer RRF arithmetic")
    assert(fused.head._4 == 2L, "n_tiers counts contributing tiers")
    // single-tier docs tie at 10000 div 61 and break on doc_id
    assert(fused(1)._2 == 10L && fused(2)._2 == 20L, s"${fused.toSeq}")
  }

  test("df-prune: a term in EVERY doc is dropped before the candidate " +
      "join and the ranking equals the query without it") {
    val d = docs(
      (1L, "stop rare pad"), (2L, "stop pad pad"), (3L, "stop pad x"))
    val both = Seq(("q", "stop"), ("q", "rare")).toDF("query_id", "term")
    val rareOnly = Seq(("q", "rare")).toDF("query_id", "term")
    // df(stop) = 3 = N -> idf_bp = 0 exactly, so pruning at 90% is
    // result-identical to never having asked for the term
    val pruned = Retrieval.bm25TopK(d, both, k = 3, maxDfShareBp = 9000)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toSet
    val without = Retrieval.bm25TopK(d, rareOnly, k = 3)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toSet
    assert(pruned == without, s"$pruned vs $without")
    assert(pruned.map(_._1) == Set(1L), "only the rare-term doc ranks")
  }

  test("RRF fusion: tier order never matters, and a third tier composes " +
      "(contributions just add)") {
    val a = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("query_id", "doc_id", "rnk")
    val b = Seq(("q", 2L, 1), ("q", 3L, 2)).toDF("query_id", "doc_id", "rnk")
    val c = Seq(("q", 3L, 1), ("q", 1L, 2)).toDF("query_id", "doc_id", "rnk")
    def run(ts: Seq[org.apache.spark.sql.DataFrame]) =
      Retrieval.rrfFuse(ts, k = 5)
        .as[(String, Long, Long, Long, Int)].collect().toSet
    val abc = run(Seq(a, b, c))
    assert(run(Seq(c, a, b)) == abc && run(Seq(b, c, a)) == abc,
      "tier permutation changed the fusion")
    // every doc: one rank-1 (163) + one rank-2 (161) contribution from
    // its two tiers — full three-way tie, broken by doc_id
    val exp = (10000L / 61) + (10000L / 62)
    assert(abc == Set(("q", 1L, exp, 2L, 1), ("q", 2L, exp, 2L, 2),
      ("q", 3L, exp, 2L, 3)), s"got $abc")
  }

  test("PRF expansion recovers a vocabulary-mismatch doc pass 1 cannot " +
      "reach; zero expansion terms reduce to plain BM25 ranking scaled " +
      "by the original weight") {
    val d = docs(
      (1L, "car motor wheel"),        // the feedback doc
      (2L, "motor wheel engine"),     // no 'car' — invisible to pass 1
      (3L, "banana fruit pad"))
    val q = Seq(("q", "car")).toDF("query_id", "term")
    val out = Retrieval.bm25PrfTopK(d, q, k = 3, fbDocs = 2, fbTerms = 2)
      .orderBy("rnk")
      .as[(String, Long, Long, Int)].collect()
    // expansion = {motor, wheel} from doc 1 -> doc 2 is now retrievable;
    // doc 1 (original + both expansion terms) stays first; doc 3 never
    assert(out.map(_._2).toSeq == Seq(1L, 2L), s"got ${out.toSeq}")
    // fbTerms = 0: ranking identical to plain BM25, scores = 10x
    val plain = Retrieval.bm25TopK(d, q, k = 3)
      .as[(String, Long, Long, Int)].collect().toSet
    val noExp = Retrieval.bm25PrfTopK(d, q, k = 3, fbTerms = 0)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(noExp == plain.map { case (a, b, s, r) => (a, b, 10 * s, r) },
      s"$noExp vs $plain")
  }

  test("evalRanking: hits counted within k only, first relevant rank, " +
      "integer MRR, all-miss query reports zeros") {
    val ranked = Seq(
      ("qa", 10L, 1), ("qa", 20L, 2), ("qa", 30L, 3), ("qa", 40L, 4),
      ("qb", 50L, 1), ("qb", 60L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("qa", 20L), ("qa", 40L), ("qa", 99L), ("qb", 99L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalRanking(ranked, qrels, k = 3)
      .as[(String, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    // qa: rank 4 is OUTSIDE k=3 — 1 hit, first at rank 2, MRR 5000
    assert(out("qa") == (("qa", 3L, 1L, 2, 5000L)), s"got ${out("qa")}")
    // qb: no relevant doc ranked — zeros, not a missing row
    assert(out("qb") == (("qb", 2L, 0L, 0, 0L)), s"got ${out("qb")}")
  }

  test("snippets: window centers on the FIRST hit of any query term and " +
      "clamps at the doc start") {
    val d = docs(
      (1L, "hit a b c d e f g h i j"),            // hit at pos 1 -> clamp
      (2L, "a b c d e hit f g h i j"))            // hit at pos 6 -> centered
    val q = Seq(("q", "hit"), ("q", "zzz")).toDF("query_id", "term")
    val out = Retrieval.bm25Snippets(d, q, k = 2, window = 5)
      .orderBy("doc_id")
      .select($"hit_pos", $"snippet").as[(Long, String)].collect()
    assert(out(0) == ((1L, "hit a b c d")), s"clamped window wrong: ${out(0)}")
    assert(out(1) == ((6L, "d e hit f g")), s"centered window wrong: ${out(1)}")
  }

  test("bm25TopKIndexed: scoring from the pre-built postings + stats " +
      "index reproduces bm25TopK bit-exactly, including the df-prune arm") {
    val d = docs(
      (1L, "stop rare pad pad"), (2L, "stop pad pad"),
      (3L, "stop pad x rare"), (4L, "stop y z"))
    val q = Seq(("qa", "rare"), ("qa", "stop"), ("qb", "x"))
      .toDF("query_id", "term")
    val post = Retrieval.postings(d)
    val stats = Retrieval.corpusStats(d)
    def rows(df: DataFrame) =
      df.as[(String, Long, Long, Int)].collect().toSet
    // plain: identical rows AND scores (df over the term-filtered index
    // rows is exact — a term's df needs only its own posting list)
    assert(rows(Retrieval.bm25TopKIndexed(post, stats, q, k = 4)) ==
      rows(Retrieval.bm25TopK(d, q, k = 4)))
    // df-prune arm: 'stop' (df = N) pruned identically on both paths
    assert(rows(Retrieval.bm25TopKIndexed(post, stats, q, k = 4,
        maxDfShareBp = 9000)) ==
      rows(Retrieval.bm25TopK(d, q, k = 4, maxDfShareBp = 9000)))
  }

  test("eval-gated ranker quality: PRF MRR ≥ plain BM25 MRR on the " +
      "vocabulary-mismatch fixture, and RRF fusion MRR ≥ either tier's — " +
      "the regression guard every ranker/index change must keep green") {
    // qrels: the ONLY relevant doc for q lacks the query term entirely —
    // plain BM25 cannot rank it (MRR 0); PRF reaches it via expansion
    // terms shared with the feedback doc, so its MRR is strictly higher.
    val d = docs(
      (1L, "car motor wheel"),        // feedback doc (has the query term)
      (2L, "motor wheel engine"),     // relevant, but no 'car'
      (3L, "banana fruit pad"))
    val q = Seq(("q", "car")).toDF("query_id", "term")
    val qrels = Seq(("q", 2L)).toDF("query_id", "doc_id")
    def mrr(ranked: org.apache.spark.sql.DataFrame): Long =
      Retrieval.evalRanking(ranked, qrels, k = 3)
        .select($"mrr_bp").as[Long].collect().headOption.getOrElse(0L)
    val plainMrr = mrr(Retrieval.bm25TopK(d, q, k = 3))
    val prfMrr = mrr(Retrieval.bm25PrfTopK(d, q, k = 3,
      fbDocs = 2, fbTerms = 2))
    assert(prfMrr >= plainMrr,
      s"PRF must not degrade MRR on the planted fixture: $prfMrr < $plainMrr")
    assert(plainMrr == 0L && prfMrr == 5000L,
      s"pinned values moved: plain=$plainMrr prf=$prfMrr (doc 2 must be " +
        "unreachable for pass 1 and rank 2 after expansion)")
    // fusion: each tier ranks its own pet doc first and the relevant doc
    // second; RRF's consensus puts the relevant doc first, so the fused
    // MRR strictly beats both tier MRRs (10000 vs 5000)
    val tierA = Seq(("q", 10L, 1), ("q", 2L, 2)).toDF("query_id", "doc_id", "rnk")
    val tierB = Seq(("q", 20L, 1), ("q", 2L, 2)).toDF("query_id", "doc_id", "rnk")
    val fusedMrr = mrr(Retrieval.rrfFuse(Seq(tierA, tierB), k = 3)
      .select($"query_id", $"doc_id", $"rnk"))
    val (aMrr, bMrr) = (mrr(tierA), mrr(tierB))
    assert(fusedMrr >= math.max(aMrr, bMrr),
      s"fusion must not degrade MRR here: $fusedMrr < max($aMrr, $bMrr)")
    assert(fusedMrr == 10000L && aMrr == 5000L && bMrr == 5000L,
      s"pinned values moved: fused=$fusedMrr a=$aMrr b=$bMrr")
  }

  test("trained fusion: argmax picks the weights that rescue the " +
      "relevant doc, MRR(trained) >= MRR(equal RRF) whenever equal " +
      "weighting is in the grid, and the exposed (wid, weights) columns " +
      "name the winner") {
    // tier A buries the relevant doc at rank 3; tier B ranks it FIRST.
    // Equal RRF leaves the consensus junk doc ahead; a dense-heavy
    // weight vector lets tier B's vote win — the argmax must find it.
    val tierA = Seq(("q", 10L, 1), ("q", 11L, 2), ("q", 2L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val tierB = Seq(("q", 2L, 1), ("q", 10L, 2), ("q", 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q", 2L)).toDF("query_id", "doc_id")
    val grid = Seq(Seq(10L, 10L), Seq(10L, 40L))
    val fused = Retrieval.trainedFuse(Seq(tierA, tierB), qrels, grid, k = 3)
    val winner = fused.select($"wid", $"weights").distinct()
      .as[(Int, String)].collect().toSeq
    assert(winner == Seq((1, "10,40")),
      s"dense-heavy weights must win on this fixture: $winner")
    def mrr(ranked: org.apache.spark.sql.DataFrame): Long =
      Retrieval.evalRanking(ranked, qrels, k = 3)
        .select($"mrr_bp").as[Long].collect().headOption.getOrElse(0L)
    val trainedMrr = mrr(fused.select($"query_id", $"doc_id", $"rnk"))
    val equalMrr = mrr(Retrieval.rrfFuse(Seq(tierA, tierB), k = 3)
      .select($"query_id", $"doc_id", $"rnk"))
    assert(trainedMrr >= equalMrr && trainedMrr == 10000L,
      s"argmax over a grid containing equal weights can never lose to " +
        s"plain RRF: trained=$trainedMrr equal=$equalMrr")
  }

  test("weightedRrfFuse with equal weights ranks exactly like rrfFuse " +
      "(the serving face degrades to the fixed combiner)") {
    val tierA = Seq(("q", 10L, 1), ("q", 11L, 2), ("q", 2L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val tierB = Seq(("q", 2L, 1), ("q", 10L, 2), ("q", 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val weighted = Retrieval.weightedRrfFuse(Seq(tierA, tierB),
        Seq(7L, 7L), k = 4)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    val plain = Retrieval.rrfFuse(Seq(tierA, tierB), k = 4)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    assert(weighted == plain, s"$weighted != $plain")
  }

  test("simplex sweep (r14): the swept grid subsumes the 5-point grid's " +
      "resolution — on the engine's own holdout protocol the swept " +
      "pick's held-out MRR is >= the 5-point pick's (data-pinned on the " +
      "sf0.001 fixture tables), and a fine sweep finds an operating " +
      "point a coarse grid misses on an adversarial fixture") {
    // 1. the registered queries, same data, same protocol
    def evalMrr(name: String): Long =
      Queries.queries(name)(spark, "/root/testdata/sf0.001")
        .select($"eval_trained_mrr_bp").as[Long].collect()
        .headOption.getOrElse(0L)
    val sweep = evalMrr("text_hybrid_trained_sweep")
    val coarse = evalMrr("text_hybrid_trained_holdout")
    assert(sweep >= coarse,
      s"swept pick generalizes worse than the 5-point pick: $sweep < $coarse")
    // 2. resolution matters: relevant doc rescued only in a narrow
    // weight band — tier A (w=9..16 scaled) buries it, the coarse
    // grid's dense-heaviest point (10,30) ~ (4,12) overdoses on tier
    // B's junk, only a mid mix like (6,10) wins. Construct: rel doc r
    // at A-rank 3 / B-rank 1; junk j1 at A-rank 1 / B-rank 3; j2 at
    // A-rank 2 / B-rank 2.
    val tierA = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 9L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val tierB = Seq(("q", 9L, 1), ("q", 2L, 2), ("q", 1L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q", 9L)).toDF("query_id", "doc_id")
    val sweepGrid = (1L to 15L).map(i => Seq(i, 16L - i))
    val swept = Retrieval.trainedFuse(Seq(tierA, tierB), qrels,
      sweepGrid, k = 3)
    // any dense-leaning point rescues doc 9; the sweep must find one
    // (argmax ties break to the smallest wid = most sparse-leaning
    // winner, so the pick itself is deterministic)
    val rank9 = swept.where($"doc_id" === 9L).select($"rnk")
      .as[Int].collect().headOption
    assert(rank9.contains(1),
      s"sweep failed to rescue the relevant doc: rank=$rank9")
  }

  test("mmrDiversifyLocal == mmrDiversify bit-for-bit: long AND string " +
      "ids, near-dup ties, fewer-than-k candidates, zero-norm drops") {
    // 10 docs on 3 axes with jitter → near-dups exist; doc 9 zero vector
    val vecsL = ((0 until 9).map { i =>
      (i.toLong, Seq.tabulate(4)(d =>
        (if (d == i % 3) 1.0f else 0.0f) + 0.01f * ((i + d) % 4)))
    } :+ (9L, Seq.fill(4)(0.0f))).toDF("doc_id", "embedding")
    val rankedL = (for (q <- 0 until 3; r <- 1 to 10)
      yield (s"q$q", ((q * 3 + r * 7) % 10).toLong, r))
      .toDF("query_id", "doc_id", "rnk")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    for (k <- Seq(3, 5, 12)) {
      assert(
        rowsOf(Retrieval.mmrDiversifyLocal(rankedL, vecsL, k, candN = 10)) ==
          rowsOf(Retrieval.mmrDiversify(rankedL, vecsL, k, candN = 10)),
        s"local != distributed at k=$k (long ids)")
    }
    // string doc ids (the RAG composite chunk key shape)
    val vecsS = vecsL.select(concat(lit("d:"), col("doc_id")).as("doc_id"),
      col("embedding"))
    val rankedS = rankedL.select(col("query_id"),
      concat(lit("d:"), col("doc_id")).as("doc_id"), col("rnk"))
    assert(
      rowsOf(Retrieval.mmrDiversifyLocal(rankedS, vecsS, 4, candN = 10)) ==
        rowsOf(Retrieval.mmrDiversify(rankedS, vecsS, 4, candN = 10)),
      "local != distributed (string ids)")
    // RAGGED vector table: dim-mismatched pairs sim as NULL in the
    // distributed twin (dot_d kernel) and max ignores them — the local
    // greedy must mirror that, not drop the rows (r14 self-review)
    val vecsR = ((0 until 6).map { i =>
      (i.toLong, Seq.tabulate(4)(d =>
        (if (d == i % 3) 1.0f else 0.0f) + 0.01f * ((i + d) % 4)))
    } ++ Seq((6L, Seq(1.0f, 0.5f)), (7L, Seq(0.5f, 1.0f))))
      .toDF("doc_id", "embedding")
    val rankedR = (for (q <- 0 until 2; r <- 1 to 8)
      yield (s"q$q", ((q * 3 + r * 5) % 8).toLong, r))
      .toDF("query_id", "doc_id", "rnk")
    for (k <- Seq(3, 8)) {
      assert(
        rowsOf(Retrieval.mmrDiversifyLocal(rankedR, vecsR, k, candN = 8)) ==
          rowsOf(Retrieval.mmrDiversify(rankedR, vecsR, k, candN = 8)),
        s"local != distributed on a ragged vector table at k=$k")
    }
  }

  test("trained fusion on EMPTY tiers returns an empty frame with the " +
      "output schema, never a head-on-empty crash (review r13)") {
    val empty = Seq.empty[(String, Long, Int)].toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q", 2L)).toDF("query_id", "doc_id")
    val out = Retrieval.trainedFuse(Seq(empty, empty), qrels,
      Seq(Seq(10L, 10L)), k = 3)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("query_id", "doc_id", "fscore", "rnk", "wid", "weights"))
  }

  test("hard negatives + contrastive triplets: relevant docs never " +
      "appear as negatives, unranked relevant docs never as positives, " +
      "duplicate qrels don't fan out") {
    // ranked list for one query: docs 1..4 at ranks 1..4; doc 2 relevant,
    // doc 99 relevant but NEVER ranked
    val ranked = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3), ("q", 4L, 4))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q", 2L), ("q", 2L), ("q", 99L)) // dup judgment
      .toDF("query_id", "doc_id")
    val neg = Retrieval.hardNegatives(ranked, qrels, nNeg = 2)
      .orderBy("neg_rnk")
      .as[(String, Long, Int, Int)].collect()
    // negatives = top-ranked NON-relevant: docs 1 (rnk 1) and 3 (rnk 3),
    // with dense neg ranks 1, 2; relevant doc 2 excluded
    assert(neg.toSeq == Seq(("q", 1L, 1, 1), ("q", 3L, 3, 2)), s"${neg.toSeq}")
    val trip = Retrieval.contrastiveTriplets(ranked, qrels, nNeg = 2)
      .orderBy("neg_rnk")
      .as[(String, Long, Int, Long, Int)].collect()
    // exactly one RANKED positive (doc 2; doc 99 never surfaced) × the
    // two negatives — the duplicate judgment must not double the rows
    assert(trip.toSeq == Seq(
      ("q", 2L, 2, 1L, 1), ("q", 2L, 2, 3L, 2)), s"${trip.toSeq}")
  }

  test("plan shape: query set broadcast; tf and df branches read the " +
      "PERSISTED postings (one corpus explode), not two explodes") {
    val d = docs((1L, "a b"), (2L, "b c"))
    val q = Seq(("q", "b")).toDF("query_id", "term")
    val df = Retrieval.bm25TopK(d, q, k = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$p")
    // both consumers must hit the cached postings — a shared lazy subtree
    // does NOT dedupe (column pruning diverges the df branch's partial
    // aggregate and ReusedExchange never fires; measured round 10)
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2,
      s"tf and df branches must both read the persisted postings:\n$p")
    // the only nested-loop is the one-row stats attach
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }
}
