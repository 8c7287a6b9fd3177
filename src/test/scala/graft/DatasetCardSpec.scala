package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable dataset card: state(A ∪ B) ≡ merge(state(A), state(B))
  * on every scalar field regardless of merge shape, HLL estimate within
  * the derived bound, and the streaming foreachBatch card (per-batch-id
  * state dirs) equal to the batch card including across an at-least-once
  * replay. */
class DatasetCardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def scalarKey(card: DataFrame): Map[String, (Long, Long, Long, Long, String, Long)] =
    card.select($"source", $"n_docs".cast("long"), $"n_tokens".cast("long"),
        $"n_chars".cast("long"), $"mean_quality_bp".cast("long"),
        $"top_lang", $"top_lang_share_bp".cast("long"))
      .as[(String, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("merged batch states reproduce the single-pass card exactly on " +
      "scalar fields, any association order; HLL estimate within the " +
      "derived bound") {
    val docs = Tables.documents(spark, sf)
    val whole = TextAnalysis.cardFromState(TextAnalysis.datasetCardState(docs))
    val parts = (0 until 3).map(i =>
      TextAnalysis.datasetCardState(docs.where(pmod($"doc_id", lit(3)) === i)))
    // two different merge trees over the same three states
    val leftFold = TextAnalysis.cardFromState(
      TextAnalysis.mergeCardStates(
        TextAnalysis.mergeCardStates(parts(0), parts(1)), parts(2)))
    val rightFold = TextAnalysis.cardFromState(
      TextAnalysis.mergeCardStates(parts(0),
        TextAnalysis.mergeCardStates(parts(1), parts(2))))
    val w = scalarKey(whole)
    assert(w.nonEmpty)
    assert(scalarKey(leftFold) == w, "left-fold merge diverged from single-pass")
    assert(scalarKey(rightFold) == w, "right-fold merge diverged from single-pass")
    // estimate quality: each derived card's HLL distinct within the
    // 3σ bound of exact, for every source
    val exact = docs.groupBy($"source")
      .agg(countDistinct(md5($"text")).as("n_exact"))
    for ((card, label) <- Seq((whole, "whole"), (leftFold, "leftFold"))) {
      val bad = card.join(exact, "source")
        .where(abs($"n_distinct_est" - $"n_exact") * 100 >
          $"n_exact" * TextAnalysis.CardHllBoundPct)
        .count()
      assert(bad == 0, s"$label: HLL estimate outside the " +
        s"${TextAnalysis.CardHllBoundPct}% bound")
    }
  }

  test("a source present in only one batch merges through (no inner-join loss)") {
    val a = TextAnalysis.datasetCardState(
      Seq((1L, "only_a", "alpha beta gamma delta")).toDF("doc_id", "source", "text"))
    val b = TextAnalysis.datasetCardState(
      Seq((2L, "only_b", "epsilon zeta eta theta")).toDF("doc_id", "source", "text"))
    val merged = TextAnalysis.cardFromState(TextAnalysis.mergeCardStates(a, b))
    assert(merged.select($"source").as[String].collect().toSet ==
      Set("only_a", "only_b"))
  }
}

class StreamingCardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("streaming card sink: per-batch states merge to the batch card, " +
      "and an at-least-once replay does not double-count") {
    import java.nio.file.Files
    val corpus: Seq[(Long, String, String)] = Seq(
      (1L, "web", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "web", "the quick brown fox jumps over the lazy dog again and again"), // exact dup
      (3L, "web", "completely different page about cooking pasta at home tonight"),
      (4L, "books", "call me ishmael some years ago never mind how long precisely"),
      (5L, "books", "it was the best of times it was the worst of times indeed"))
    val (part1, part2) = corpus.partition(_._1 <= 3L)
    val docsDf = corpus.toDF("doc_id", "source", "text")
    val batchCard = TextAnalysis.cardFromState(TextAnalysis.datasetCardState(docsDf))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val dir = Files.createTempDirectory("streamcard")
    val statePath = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString
    def drain(): Unit = {
      val q = graft.streaming.Sinks.datasetCardSink(
        input.toDF().toDF("doc_id", "source", "text"), statePath, ckpt)
      assert(q.awaitTermination(120000), "AvailableNow drain must terminate")
    }
    input.addData(part1: _*)
    drain()
    // crash between sink write and commit: delete the last commit marker
    // (and its CRC) so the restart REPLAYS that batch into the same
    // batch_id dir — the idempotent-overwrite contract under test
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty, "run 1 committed no batches")
    assert(commits.last.delete())
    new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc").delete()
    input.addData(part2: _*)
    drain()
    val streamCard = graft.streaming.Sinks.datasetCardRead(spark, statePath)
    def key(df: DataFrame) = df
      .select($"source", $"n_docs".cast("long"), $"n_tokens".cast("long"),
        $"n_chars".cast("long"), $"mean_quality_bp".cast("long"),
        $"n_distinct_est".cast("long"), $"top_lang",
        $"top_lang_share_bp".cast("long"))
      .as[(String, Long, Long, Long, Long, Long, String, Long)].collect().toSet
    assert(key(streamCard) == key(batchCard),
      s"stream card ${key(streamCard)} != batch card ${key(batchCard)}")
    // tiny corpus ⇒ the HLL sits in exact (coupon) range: web has one
    // exact dup, books none
    val dup = streamCard.select($"source", $"dup_est_bp".cast("long"))
      .as[(String, Long)].collect().toMap
    assert(dup("web") == 3333L && dup("books") == 0L, s"dup rates: $dup")
  }
}
