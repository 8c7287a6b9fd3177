package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantics on a hand-built 2-D fixture: near-twins inside a
  * cell collapse to the copy FARTHEST from the centroid (the paper's
  * diversity rule), below-threshold neighbors all survive, and the pair
  * pass is cell-scoped. */
class SemanticDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("near-twins collapse to the farthest-from-centroid copy; " +
      "below-threshold vectors survive; dominance is per-cell") {
    // centroids: c0 along x, c1 along y
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (1L, 0, Seq(10.0f, 0.0f)),    // cell 0, on-axis (cell_cos = 1)
      (2L, 0, Seq(10.0f, 0.1f)),    // cell 0, near-twin of 1, slightly off
      (3L, 0, Seq(0.1f, 10.0f)),    // cell 1, slightly off-axis
      (4L, 0, Seq(0.0f, 10.0f)),    // cell 1, near-twin of 3, on-axis
      (5L, 0, Seq(7.0f, 7.0f)))     // cell 0 (tie -> min cell), no near-twin
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.semanticDedupWith(vecs, cents, minCosine = 0.99)
      .orderBy("vec_id")
      .as[(Long, Int, Double, Int)].collect()
    val survivors = out.filter(_._4 == 1).map(_._1).toSet
    // 1 vs 2: cos ~ 0.99995 >= 0.99; 2 is farther from c0 -> 2 survives.
    // 3 vs 4: 3 is farther from c1 -> 3 survives. 5 has no twin.
    assert(survivors == Set(2L, 3L, 5L), s"got $out")
    // cell assignment sanity: 1, 2, 5 -> cell 0; 3, 4 -> cell 1
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0))
    // the on-axis member reads cell_cos = 1.0 exactly (round-6)
    assert(out.find(_._1 == 1L).get._3 == 1.0)
  }

  test("incremental: a stored survivor drops a batch near-twin even when " +
      "the arrival is farther from the centroid (history wins); " +
      "batch-internal dominance unchanged; history never re-judged") {
    val cents = Seq(Array(1.0, 0.0))
    val hist = Seq(
      (1L, 0, Seq(10.0f, 0.0f)),     // dominated by 3 within history
      (3L, 0, Seq(10.0f, 0.1f)))     // history survivor -> the index
      .toDF("vec_id", "label", "embedding")
    val index = Similarity.semanticIndex(hist, cents, minCosine = 0.99)
    assert(index.select("vec_id").as[Long].collect().toSet == Set(3L),
      "index holds only history survivors")
    val batch = Seq(
      (2L, 0, Seq(10.0f, 0.05f)),    // twin of stored 3 -> dropped
      (4L, 0, Seq(10.0f, 0.5f)),     // twin of 3, FARTHER from centroid:
                                     // full run would keep 4; incremental
                                     // defers to immutable history
      (5L, 0, Seq(0.0f, 10.0f)),     // no history twin; beats 6 in-batch
      (6L, 0, Seq(0.1f, 10.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.semanticDedupIncremental(batch, cents, index,
        minCosine = 0.99)
      .as[(Long, Int, Double, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    // 6 is FARTHER from the centroid than 5 (cell_cos 0.01 vs 0.0)? No:
    // 5's cell_cos is 0.0 (orthogonal), 6's is ~0.01 — 5 is farther, 5
    // survives, 6 drops to it.
    assert(out == Map(2L -> 0, 4L -> 0, 5L -> 1, 6L -> 0), s"got $out")
  }

  test("tie on cell_cos breaks to the LOWER vec_id surviving") {
    // identical vectors: same cell, same cell_cos, cosine 1.0 pair
    val cents = Seq(Array(1.0, 0.0))
    val vecs = Seq(
      (7L, 0, Seq(3.0f, 4.0f)),
      (9L, 0, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.semanticDedupWith(vecs, cents, minCosine = 0.99)
      .as[(Long, Int, Double, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out == Map(7L -> 1, 9L -> 0), s"got $out")
  }
}

/** Drop-attribution report: every arm exercised on a planted corpus —
  * first-kill attribution order (quality before lang), exact dedup among
  * the gated, near-dup attribution of the cluster loser, and kept mass
  * equal to the docs-prep output. */
class DropReportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("every stage arm fires; kept equals the docs-prep survivor count") {
    def periodic(fam: Int, reps: Int): String =
      Seq.fill(reps)(s"the qx${fam}a zr${fam}b").mkString(" ")
    val corpus = Seq(
      (1L, periodic(1, 40)),    // kept (cluster survivor: quality tie -> min id)
      (2L, periodic(1, 41)),    // near_dup of 1 (same shingle SET, distinct string)
      (3L, periodic(1, 40)),    // exact_dup of 1 (identical text, higher id)
      (4L, Seq.fill(40)("der die und das ist ein").mkString(" ")), // lang: de
      (5L, "tiny doc"))         // quality: 2 tokens, fails the length term
      .toDF("doc_id", "text")
    val rep = Queries.dropReportFrom(corpus)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rep.keySet == Set("kept", "near_dup", "exact_dup", "lang", "quality"),
      s"got $rep")
    assert(rep("kept")._1 == 1L && rep("near_dup")._1 == 1L &&
      rep("exact_dup")._1 == 1L && rep("lang")._1 == 1L &&
      rep("quality")._1 == 1L, s"got $rep")
    // attribution must agree with the pipeline itself
    val kept = Queries.docsPrepPrepped(corpus).count()
    assert(kept == rep("kept")._1, s"report kept ${rep("kept")._1} != pipeline $kept")
  }
}
