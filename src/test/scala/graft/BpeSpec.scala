package graft

import graft.functions.{Bpe, TextFns}
import graft.plans.BpeKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ─────────────────────────────── train ───────────────────────────────

  test("train: greedy highest-count pair, deterministic tie-break, a==b skipped") {
    // weighted dictionary: "aab"×3, "ab"×2 → pair counts: (a,a)=3 (banned),
    // (a,b)=5 → merge 1 = (a,b). After: aab→[a,ab], ab→[ab] → only (a,ab)=3
    // remains → merge 2 = (a,ab). Then nothing adjacent is mergeable
    // (single symbols) → training exhausts early.
    val merges = Bpe.train(Seq("aab" -> 3L, "ab" -> 2L), nMerges = 5)
    assert(merges == Vector(("a", "b"), ("a", "ab")))
  }

  test("train: tie on count breaks on (a, b) lexicographic") {
    // "xy" and "xz" each count 1 → tie → ("x","y") < ("x","z").
    val merges = Bpe.train(Seq("xy" -> 1L, "xz" -> 1L), nMerges = 1)
    assert(merges == Vector(("x", "y")))
  }

  test("trainFromCorpus on sf0.001 reproduces the pinned DefaultMerges") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainFromCorpus(docs, nMerges = Bpe.DefaultMerges.size)
    assert(merges == Bpe.DefaultMerges,
      "trainer drift: retrain no longer matches the pinned default vocab")
  }

  test("trainDistributed equals the in-memory trainer (greedy prefix property)") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // greedy training is sequential: the first k merges of a longer run
    // equal a k-merge run, so 12 ranks suffice to pin the two trainers.
    val dist = Bpe.trainDistributed(docs, nMerges = 12)
    assert(dist == Bpe.DefaultMerges.take(12),
      s"distributed trainer diverged: $dist")
  }

  // ─────────────────────────────── apply ───────────────────────────────

  private def enc(words: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    val df = Seq(Tuple1(words)).toDF("w")
    df.select(Bpe.encode(col("w"), merges).as("t"))
      .collect()(0).getSeq[String](0)
  }

  test("encode: merges apply in rank order, left-to-right, concat-preserving") {
    // rank 1 (a,b) then rank 2 (ab,c): "abc" → [ab, c] → [abc];
    // "acb" has no (a,b) adjacency → stays chars.
    val m = Seq(("a", "b"), ("ab", "c"))
    assert(enc(Seq("abc"), m) == Seq("abc"))
    assert(enc(Seq("acb"), m) == Seq("a", "c", "b"))
    // flattening across words preserves word order
    assert(enc(Seq("abc", "ab", "x"), m) == Seq("abc", "ab", "x"))
  }

  test("encode: a later rank never re-enables an earlier one (rank order is the spec)") {
    // rank 1 (b,c), rank 2 (a,b): "abc" — rank 1 merges bc first ⇒ the
    // (a,b) adjacency never exists. Priority-queue BPE agrees because a
    // trained table orders creation before use; the SPEC here is rank
    // order, which is what the DuckDB oracle executes.
    assert(enc(Seq("abc"), Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
  }

  test("encode: left-to-right non-overlap within a rank") {
    // (x,y) over "xyxy" → [xy, xy]; over "xyy" → [xy, y].
    val m = Seq(("x", "y"))
    assert(enc(Seq("xyxy"), m) == Seq("xy", "xy"))
    assert(enc(Seq("xyy"), m) == Seq("xy", "y"))
  }

  test("encode under DefaultMerges: token concat reconstructs each word") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs
      .select(explode(TextFns.tokens(col("text"))).as("w")).distinct()
      .select(col("w"), Bpe.encode(array(col("w"))).as("t"))
      .where(concat_ws("", col("t")) =!= col("w"))
      .count()
    assert(bad == 0L, "BPE tokens must concatenate back to the word")
  }

  test("encode: frequent corpus words collapse to single tokens") {
    // trained vocabulary behavior, pinned: high-frequency words become one
    // token, rare words stay subword-split.
    assert(enc(Seq("query"), Bpe.DefaultMerges) == Seq("query"))
    assert(enc(Seq("window"), Bpe.DefaultMerges) == Seq("window"))
    assert(enc(Seq("the"), Bpe.DefaultMerges) == Seq("t", "h", "e"))
  }

  test("encode: unicode symbols are code points (surrogate pairs intact)") {
    // U+1D400 (𝐀) is a surrogate pair in UTF-16; a char-based splitter
    // would shatter it. No merges → pure code-point split.
    assert(enc(Seq("a𝐀b"), Seq(("q", "z"))) ==
      Seq("a", "𝐀", "b"))
  }

  test("kernel rejects a == b merges (oracle-equivalence restriction)") {
    val ex = intercept[IllegalArgumentException] {
      new BpeKernel(Array(Array("a", "a"))).encodeWord("aaa")
    }
    assert(ex.getMessage.contains("a == b"))
  }

  test("encode: empty word array and empty word") {
    assert(enc(Seq.empty[String], Bpe.DefaultMerges) == Seq.empty)
    assert(enc(Seq(""), Bpe.DefaultMerges) == Seq.empty)
  }

  test("tokenCount matches manual sum over words") {
    val df = Seq(("query window the", 1)).toDF("text", "x")
    val n = df.select(Bpe.tokenCount(col("text")).as("n")).collect()(0).getInt(0)
    // query→1, window→1, the→3
    assert(n == 5)
  }
}
