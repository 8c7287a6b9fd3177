package graft

import graft.functions.TextFns
import graft.plans.Stage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16, VERDICT r15 #1): which of the remaining text-side HOF
  * chains are actually hot? Measures each site's pattern in isolation on
  * 500k synthetic docs (~30 tokens each — the documents-table shape),
  * warm min-of-3, so ports happen only where a native kernel would pay
  * (the sim-tier lesson: transform/aggregate are CodegenFallback and
  * interpret their lambda per element; md5/regex built-ins inside the
  * lambda run interpreted too).
  */
object ProfileTextHof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 500000
    // ~30 pseudo-words per doc, deterministic
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(k =>
        concat(lit("w"), ((col("id") * 31 + k * 7) % 997).cast("string"))): _*)
        .as("text")).persist()
    docs.count()

    def time(tag: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[texthof] $tag min=${times.min}%.2f s " +
        f"reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // staged inputs (each step persisted so the next measures only itself)
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .persist(); toks.count()
    val sh = toks.select(col("doc_id"),
      TextFns.shingles(col("w"), 3).as("sh")).persist(); sh.count()
    val hs = sh.select(col("doc_id"),
      TextFns.shingleHashes(col("sh")).as("hs")).persist(); hs.count()

    // 1. tokenize (split — native codegen, the floor)
    time("tokens")(
      docs.select(sum(size(TextFns.tokens(col("text"))))).head())
    // 2. shingles: transform(sequence) + concat_ws(element_at…) HOF
    time("shingles3_hof")(
      toks.select(sum(size(TextFns.shinglesHof(col("w"), 3)))).head())
    time("shingles3_native")(
      toks.select(sum(size(TextFns.shingles(col("w"), 3)))).head())
    // 3. base hashes: double transform, md5 + 7-nibble decode per shingle
    time("shingle_hashes_hof")(
      sh.select(sum(element_at(TextFns.shingleHashesHof(col("sh")), 1))).head())
    time("shingle_hashes_native")(
      sh.select(sum(element_at(TextFns.shingleHashes(col("sh")), 1))).head())
    // 4. minhash bands: 8 HOF passes of array_min(transform) vs 4 native
    //    two-minima passes
    def bandsHof = (0 until 4).map(b => sum(length(
      concat(TextFns.minhashNumHof(col("hs"), 2 * b).cast("string"), lit(":"),
        TextFns.minhashNumHof(col("hs"), 2 * b + 1).cast("string")))))
    time("minhash_4bands_hof")(hs.select(bandsHof: _*).head())
    time("minhash_4bands_native")(
      hs.select((0 until 4).map(b =>
        sum(length(TextFns.minhashBandNum(col("hs"), b)))): _*).head())
    // 5. simhash16: 16 × |hs| nested aggregate vs one native pass
    time("simhash16_hof")(
      hs.select(sum(TextFns.simhash16Hof(col("hs")))).head())
    time("simhash16_native")(
      hs.select(sum(TextFns.simhash16(col("hs")))).head())
    // 6. embed fold: per-token hash struct transform + dim×T fold vs the
    //    fused one-pass kernel
    time("embed_dim16_hof")(
      graft.operators.TextAnalysis.embedDocumentsHof(docs, dim = 16)
        .select(sum(element_at(col("embedding"), 1))).head())
    time("embed_dim16_native")(
      graft.operators.TextAnalysis.embedDocuments(docs, dim = 16)
        .select(sum(element_at(col("embedding"), 1))).head())
    // 6b. fingerprint min/max: TWO md5-per-shingle HOF passes per doc
    time("fingerprint_minmax_hof")(
      sh.select(sum(length(array_min(transform(col("sh"), s => md5(s)))) +
        length(array_max(transform(col("sh"), s => md5(s))))).as("x")).head())
    // 6c. langid trigrams: transform(sequence, substr) per char position
    time("trigrams_hof")(
      docs.select(sum(size(graft.functions.LangIdModel.trigramsHof(
        lower(col("text"))))).as("x")).head())
    time("trigrams_native")(
      docs.select(sum(size(graft.functions.LangIdModel.trigrams(
        lower(col("text"))))).as("x")).head())
    // 7. line link-density: regex extract + aggregate(length) per line —
    //    is the aggregate or the regex the cost?
    val A1 = ""; val A2 = ""
    val pages = spark.range(100000).select(col("id").as("doc_id"),
      concat_ws("\n", (0 until 10).map(k => concat(
        lit(s"some line $k with ${A1}a link$A2 and "),
        ((col("id") + k) % 97).cast("string"))): _*).as("text"))
      .persist(); pages.count()
    val lined = Stage(pages, "l0", split(col("text"), "\n", -1))
      .persist(); lined.count()
    time("linkdensity_regex_only")(
      lined.select(sum(size(transform(col("l0"), x =>
        regexp_extract_all(x, lit(s"$A1([^$A1$A2]*)$A2"), lit(1)))))).head())
    time("linkdensity_full")(
      lined.select(sum(element_at(transform(col("l0"), x =>
        aggregate(regexp_extract_all(x, lit(s"$A1([^$A1$A2]*)$A2"), lit(1)),
          lit(0L), (acc, s) => acc + length(s))), 1))).head())
    spark.stop()
  }
}
