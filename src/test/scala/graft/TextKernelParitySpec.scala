package graft

import graft.functions.TextFns
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r16 text kernels against the legacy HOF chains they replaced,
  * through REAL DataFrame execution (whole-stage codegen path — the
  * interpreted-eval path is pinned separately by TextKernelProps).
  * Every DuckDB oracle on the text tier mirrors the HOF arithmetic, so
  * kernel == HOF here is what keeps those oracles hash-exact. */
class TextKernelParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // token arrays with the nasty shapes: unicode, empties, dups, blanks,
  // null elements (concat/skip semantics), single-token and empty docs
  private lazy val toks = Seq(
    Seq("alpha", "beta", "gamma", "beta", "alpha"),
    Seq("汉字", "ünïcode", "éclair", "普通话"),
    Seq("one"),
    Seq.empty[String],
    Seq("x", "y"),
    Seq("repeat", "repeat", "repeat", "repeat")
  ).toDF("w")
    .union(Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit(null).cast("string"))
        .as("w")))

  private def bothEqual(native: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column, tag: String): Unit = {
    val rows = toks.select(native.as("n"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.get(0) == r.get(1), s"$tag row $i: native=${r.get(0)} hof=${r.get(1)}")
    }
  }

  test("shingles_s == HOF shingles for n=1..4 incl. null tokens and empties") {
    for (n <- 1 to 4)
      bothEqual(TextFns.shingles($"w", n), TextFns.shinglesHof($"w", n), s"shingles n=$n")
  }

  test("md5_base28_l == md5-hex + nibble-decode HOF incl. null elements") {
    bothEqual(TextFns.shingleHashes($"w"), TextFns.shingleHashesHof($"w"), "base28")
  }

  test("minhash sig/band == per-index array_min HOF incl. all-null input") {
    val hs = toks.select(TextFns.shingleHashes(
      TextFns.shingles($"w", 3)).as("hs"))
      .union(Seq(1).toDF("i").select(
        array(lit(null).cast("long"), lit(null).cast("long")).as("hs")))
    for (i <- 0 until 8) {
      val rows = hs.select(TextFns.minhashNum($"hs", i).as("n"),
        TextFns.minhashNumHof($"hs", i).as("h")).collect()
      rows.foreach(r => assert(r.get(0) == r.get(1), s"minhash $i: $r"))
    }
    val bands = hs.select(TextFns.minhashBandNum($"hs", 1).as("n"),
      concat(TextFns.minhashNumHof($"hs", 2).cast("string"), lit(":"),
        TextFns.minhashNumHof($"hs", 3).cast("string")).as("h")).collect()
    bands.foreach(r => assert(r.get(0) == r.get(1), s"band: $r"))
  }

  test("simhash16_l == nested-aggregate HOF incl. the null-element-zeroes quirk") {
    val hs = toks.select(TextFns.shingleHashes($"w").as("hs"))
      .union(Seq(1).toDF("i").select(
        array(lit(7L), lit(null).cast("long"), lit(12L)).as("hs")))
    val rows = hs.select(TextFns.simhash16($"hs").as("n"),
      TextFns.simhash16Hof($"hs").as("h")).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), s"simhash: $r"))
    // the quirk row really is 0
    assert(hs.select(TextFns.simhash16($"hs")).collect().last.getInt(0) == 0)
  }

  test("hash16 == md5_base28 >> 12 (the Dedup.simhash / LangIdModel.buckets " +
      "rewrite): top 4 of the 7 decoded nibbles") {
    val rows = toks.select(explode($"w").as("t"))
      .select(TextFns.hash16($"t").cast("long").as("h16"),
        shiftright(element_at(TextFns.shingleHashes(array($"t")), 1), 12).as("hk"))
      .collect()
    assert(rows.nonEmpty)
    // null tokens: both sides null — compare boxed (getLong NPEs on null)
    rows.foreach(r => assert(r.get(0) == r.get(1), s"$r"))
  }

  test("trigrams_s == per-position substr HOF incl. multi-byte chars, " +
      "short and empty strings") {
    import graft.functions.LangIdModel
    val texts = Seq("the quick brown fox", "汉字普通话测试", "ab", "", "éäü",
      "a b", "𐍈𐍈𐍈x").toDF("t")
    val rows = texts.select(LangIdModel.trigrams($"t").as("n"),
      LangIdModel.trigramsHof($"t").as("h")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"$r"))
  }

  test("embedDocuments == HOF form on the real documents table (and the " +
      "dumped schema keeps a nullable embedding element)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextAnalysis.embedDocuments(docs, dim = 16)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.embedDocumentsHof(docs, dim = 16)
      .orderBy("doc_id").collect().toSeq
    assert(a.nonEmpty && a == b)
    val el = TextAnalysis.embedDocuments(docs, dim = 16)
      .schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(el.containsNull, "schema parity with the HOF chain (optional element)")
  }
}
