package graft

import graft.operators.LineOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level page cleaning: every c4 rule exercised individually,
  * first-occurrence dedup order, boilerplate share boundary (≥, not >),
  * the all-boilerplate degenerate page, composed-pass equivalence to the
  * three standalone ops, and plan shape (narrow ops stay narrow). */
class LineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def pages(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length

  test("c4 rules: each drop-reason fires alone; survivors keep order") {
    val doc = Seq(
      "This sentence has enough words to pass.",   // kept
      "Too short.",                                // < 5 words
      "this line has five words but no terminal punctuation", // punct
      "Please enable JavaScript to view this page.",          // javascript
      "We use cookie banners on this site today.",            // cookie
      "Lorem ipsum dolor sit amet consectetur elit.",         // lorem ipsum
      "var config = { tracking: true } please ignore.",       // brace
      "And one more good closing sentence right here!"        // kept
    ).mkString("\n")
    val out = LineOps.cleanLines(pages((1L, doc))).collect().head
    assert(out.getAs[Long]("n_lines") == 8)
    assert(out.getAs[Long]("n_kept") == 2)
    assert(out.getAs[String]("cleaned_text") ==
      "This sentence has enough words to pass.\n" +
      "And one more good closing sentence right here!")
  }

  test("c4: empty page and sub-minWords page keep nothing but stay in the output") {
    val out = LineOps.cleanLines(pages((1L, ""), (2L, "tiny page here.")))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_lines") == 1)   // split("") = [""]
    assert(out(0).getAs[Long]("n_kept") == 0)
    assert(out(0).getAs[String]("cleaned_text") == "")
    assert(out(1).getAs[Long]("n_kept") == 0)    // 3 words < 5
  }

  test("within-doc dedup: first occurrence wins, order preserved, " +
      "interleaved repeats collapse") {
    val doc = Seq("alpha", "beta", "alpha", "gamma", "beta", "alpha")
      .mkString("\n")
    val out = LineOps.dedupLinesWithinDoc(pages((1L, doc))).collect().head
    assert(out.getAs[Long]("n_lines") == 6)
    assert(out.getAs[Long]("n_unique") == 3)
    assert(out.getAs[String]("deduped_text") == "alpha\nbeta\ngamma")
  }

  test("boilerplate: share boundary is >= (a line in exactly 30% of docs " +
      "is stripped at 3000 bp); uniques survive") {
    // 10 docs; "NAV" appears in docs 1-3 (exactly 30%), "RARE" in 1-2 (20%)
    val ps = pages((1 to 10).map { i =>
      val ls = Seq(s"content line $i") ++
        (if (i <= 3) Seq("NAV") else Nil) ++
        (if (i <= 2) Seq("RARE") else Nil)
      (i.toLong, ls.mkString("\n"))
    }: _*)
    val out = LineOps.stripBoilerplate(ps, 3000)
      .orderBy("doc_id").collect()
    assert(out.forall(r => !r.getAs[String]("cleaned_text").contains("NAV")),
      "a line at exactly the share threshold must be stripped")
    assert(out(0).getAs[String]("cleaned_text").contains("RARE"),
      "a line below the threshold must survive")
    assert(out(0).getAs[Long]("n_kept") == 2 && out(0).getAs[Long]("n_lines") == 3)
  }

  test("boilerplate: the all-boilerplate page survives with an empty " +
      "cleaned_text, not a missing row") {
    val ps = pages(
      (1L, "NAV\ncontent one stays here."),
      (2L, "NAV\ncontent two stays here."),
      (3L, "NAV"))
    val out = LineOps.stripBoilerplate(ps, 5000).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(2).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[String]("cleaned_text") == "")
  }

  test("pageClean == stripBoilerplate then cleanLines then " +
      "dedupLinesWithinDoc, including the all-boilerplate degenerate") {
    val ps = pages(
      (1L, Seq("NAV", "Good content sentence number one stays.",
        "Good content sentence number one stays.",
        "Second good content sentence also stays!", "short.").mkString("\n")),
      (2L, Seq("NAV", "Another page with one good sentence only.").mkString("\n")),
      (3L, "NAV"))
    val composed = LineOps.pageClean(ps, minDocShareBp = 5000)
      .orderBy("doc_id").collect()
    val chained = LineOps.dedupLinesWithinDoc(
        LineOps.cleanLines(
          LineOps.stripBoilerplate(ps, 5000)
            .select($"doc_id", $"cleaned_text".as("text")))
          .select($"doc_id", $"cleaned_text".as("text")))
      .orderBy("doc_id").collect()
    for ((c, h) <- composed.zip(chained)) {
      assert(c.getAs[String]("cleaned_text") == h.getAs[String]("deduped_text"),
        s"doc ${c.getAs[Long]("doc_id")} text diverged")
    }
    // doc 1: dup line collapsed, short line dropped -> 2 kept, gated in
    assert(composed(0).getAs[Long]("n_kept") == 2 &&
      composed(0).getAs[Int]("keep_doc") == 1)
    // doc 2: one kept line -> gated out but present
    assert(composed(1).getAs[Long]("n_kept") == 1 &&
      composed(1).getAs[Int]("keep_doc") == 0)
    // doc 3: all boilerplate -> 0 kept (the sequence(1,0) guard path)
    assert(composed(2).getAs[Long]("n_kept") == 0 &&
      composed(2).getAs[Int]("keep_doc") == 0)
  }

  test("htmlExtract: blocks stripped (script body with a bare '<'), " +
      "entities decoded once (&amp;lt; stays literal), BLOCK tags become " +
      "line breaks, inline tags spaces, title pulled; narrow plan") {
    val html = "<html><head><title>T &amp; U</title></head><body>" +
      "<h1>Head</h1><script>if (a < b) { go(); }</script>" +
      "<style>.x { color: red }</style><!-- note -->" +
      "<p>A &quot;quoted&quot; <b>bold</b> it&#39;s &amp;lt;kept&amp;gt; &lt;real&gt;</p>" +
      "</body></html>"
    val df = LineOps.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
    val out = df.collect().head
    assert(out.getAs[String]("title") == "T &amp; U",
      "title is extracted RAW (decode is a body-text step)")
    assert(out.getAs[String]("text") ==
      "T & U\nHead\nA \"quoted\" bold it's &lt;kept&gt; <real>",
      "block boundaries must become single line breaks, inline tags spaces")
    assert(out.getAs[Long]("n_lines") == 3)
    assert(out.getAs[Int]("n_tokens") == 10)
    assert("Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).isEmpty,
      "html extraction must be narrow")
  }

  test("htmlExtract robustness: uppercase block tags break lines, " +
      "prefix-colliding inline tags (<link>, <param>, <track>) do NOT, " +
      "and CRLF input leaves no \\r on line ends") {
    val html = "<HTML><BODY><P>First real sentence here today.</P>\r\n" +
      "<P>Second <link rel=\"x\"> sentence <param name=\"y\"> here too.</P>" +
      "</BODY></HTML>"
    val out = LineOps.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("text") ==
      "First real sentence here today.\nSecond sentence here too.",
      s"got: ${out.getAs[String]("text").replace("\n", "\\n").replace("\r", "\\r")}")
    assert(out.getAs[Long]("n_lines") == 2)
  }

  test("htmlExtract: MULTI-LINE script/style/comment bodies strip " +
      "completely — no JS/CSS text leaks into the extracted lines") {
    val html = "<html><body><p>Real prose stays on this page.</p>" +
      "<script>\nvar leak = 1;\nfunction go() {\n  return 2 < 3;\n}\n</script>" +
      "<style>\n.nav {\n  color: red;\n}\n</style>" +
      "<!-- build\nmarker\nspans lines -->" +
      "<p>Second real sentence survives too.</p></body></html>"
    val out = LineOps.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("text") ==
      "Real prose stays on this page.\nSecond real sentence survives too.",
      s"got: ${out.getAs[String]("text").replace("\n", "\\n")}")
    assert(out.getAs[Long]("n_lines") == 2)
    // two same-line blocks stay separate (non-greedy): prose between
    // them survives
    val twoBlocks = "<p>Keep A.</p><script>x</script><p>Keep B.</p>" +
      "<script>y</script><p>Keep C.</p>"
    val t2 = LineOps.htmlExtract(Seq((1L, twoBlocks)).toDF("doc_id", "html"))
      .collect().head.getAs[String]("text")
    assert(t2 == "Keep A.\nKeep B.\nKeep C.", s"got: $t2")
  }

  test("plan shape: cleanLines, dedupLinesWithinDoc AND the boilerplate " +
      "APPLY side are NARROW; only the index build shuffles") {
    val ps = pages((1L, "a\nb"), (2L, "a\nc"))
    assert(shuffles(plan(LineOps.cleanLines(ps))) == 0,
      "c4 cleaning must not shuffle")
    assert(shuffles(plan(LineOps.dedupLinesWithinDoc(ps))) == 0,
      "within-doc dedup must not shuffle")
    val p = plan(LineOps.stripBoilerplate(ps, 3000))
    // index build only: distinct(lh, doc) + groupBy(lh); the n_docs count
    // and the index->array collapse are one-row SinglePartition aggs; the
    // corpus side stays a narrow lambda filter (no explode+reassembly)
    val hash = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hash <= 2, s"boilerplate grew extra hash exchanges ($hash):\n$p")
    assert(p.contains("BroadcastExchange"),
      s"frequent-set array must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"one-row attaches must stay broadcast nested loops:\n$p")
  }

  test("linkDensity: nav line reads mostly-anchor, inline link small, " +
      "plain line zero; unbalanced anchor counts nothing and leaves no " +
      "sentinel in the output") {
    val html = "<html><body>" +
      "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      "<p>prose with a <a href=\"x\">tiny</a> link inside it.</p>" +
      "<p>no links at all here.</p>" +
      "<p>broken <a href=\"y\">anchor never closes.</p>" +
      "<p>nested <a href=\"o\">x <a href=\"i\">inner</a> tail stays plain.</p>" +
      "</body></html>"
    val out = LineOps.linkDensity(
        Seq((1L, html)).toDF("doc_id", "html"))
      .orderBy("pos")
      .select($"line", $"n_chars", $"link_chars", $"link_bp", $"is_content")
      .as[(String, Long, Long, Long, Int)].collect()
    assert(out(0) == (("Home About", 10L, 9L, 9000L, 0)), s"nav: ${out(0)}")
    assert(out(1)._1 == "prose with a tiny link inside it." &&
      out(1)._3 == 4L && out(1)._5 == 1, s"inline: ${out(1)}")
    assert(out(2)._3 == 0L && out(2)._5 == 1)
    // the unclosed anchor's sentinel matches nothing and is stripped
    assert(out(3)._1 == "broken anchor never closes." && out(3)._3 == 0L,
      s"unbalanced: ${out(3)}")
    // NESTED anchor: only the innermost balanced span counts — the outer
    // opener's text and trailing plain text never count as link chars
    assert(out(4)._1 == "nested x inner tail stays plain." &&
      out(4)._3 == 5L, s"nested: ${out(4)}")
    assert(!out.exists(r => r._1.exists(c => c == '\u0001' || c == '\u0002')))
  }

  test("contentExtract: the density gate kills a link-heavy line that " +
      "PASSES the c4 rules; prose survives; gate two-sided") {
    val html = "<html><body>" +
      // c4-passing (7 words, terminal '.') but 72% anchor chars
      "<p>Read our <a href=\"r\">full detailed report about everything</a> here.</p>" +
      "<p>This plain prose sentence clearly stays around.</p>" +
      "<p>Second plain prose sentence also stays here.</p>" +
      "</body></html>"
    val out = LineOps.contentExtract(
        Seq((1L, html)).toDF("doc_id", "html")).collect().head
    assert(out.getAs[Long]("n_lines") == 3)
    assert(out.getAs[Long]("n_content") == 2,
      "the c4-passing link-farm line must die to DENSITY, not c4")
    assert(out.getAs[Long]("n_kept") == 2 && out.getAs[Int]("keep_doc") == 1)
    assert(out.getAs[String]("main_text") ==
      "This plain prose sentence clearly stays around.\n" +
      "Second plain prose sentence also stays here.")
    // single-content doc gates out
    val one = LineOps.contentExtract(Seq(
      (2L, "<html><body><p>Only one good sentence here now.</p></body></html>"))
      .toDF("doc_id", "html")).collect().head
    assert(one.getAs[Int]("keep_doc") == 0)
  }

  test("boilerplate state: disjoint-batch merge equals the single-pass " +
      "index at ANY read-time threshold, any association order") {
    val ps = pages((1 to 10).map { i =>
      val ls = Seq(s"content $i") ++
        (if (i <= 5) Seq("HALF") else Nil) ++ Seq("ALL")
      (i.toLong, ls.mkString("\n"))
    }: _*)
    val parts = (0 until 3).map(i =>
      LineOps.boilerplateState(ps.where(pmod($"doc_id", lit(3)) === i)))
    val left = LineOps.mergeBoilerplateStates(
      LineOps.mergeBoilerplateStates(parts(0), parts(1)), parts(2))
    val right = LineOps.mergeBoilerplateStates(parts(0),
      LineOps.mergeBoilerplateStates(parts(1), parts(2)))
    for (bp <- Seq(3000, 6000, 9900); st <- Seq(left, right)) {
      val fromState = LineOps.indexFromState(st, bp)
        .as[String].collect().toSet
      val single = LineOps.boilerplateIndex(ps, bp)
        .as[String].collect().toSet
      assert(fromState == single, s"threshold $bp diverged")
    }
    // the thresholds genuinely separate: ALL (100%) at all three,
    // HALF (50%) only at <= 50%
    assert(LineOps.indexFromState(left, 3000).count() == 2)
    assert(LineOps.indexFromState(left, 6000).count() == 1)
  }

  test("pageCleanWithIndex over a MERGED state equals single-pass " +
      "pageClean (the incremental wet-clean posture)") {
    val corpus = pages(
      (1L, "Shared footer line.\nUnique first sentence stays here.\nSecond unique sentence stays too."),
      (2L, "Shared footer line.\nAnother page keeps its own prose alive.\nIts second sentence also survives fine."),
      (3L, "Shared footer line.\nThird page first proper sentence here.\nThird page second proper sentence here."),
      (4L, "Shared footer line.\nFourth page first proper sentence here.\nFourth page second proper sentence here."))
    val single = LineOps.pageClean(corpus, minDocShareBp = 5000)
      .collect().map(_.toSeq).toSet
    val state = (0 until 3).map(i =>
        LineOps.boilerplateState(corpus.where(pmod($"doc_id", lit(3)) === i)))
      .reduce(LineOps.mergeBoilerplateStates)
    val viaState = LineOps.pageCleanWithIndex(corpus,
      LineOps.indexFromState(state, minDocShareBp = 5000))
      .collect().map(_.toSeq).toSet
    assert(viaState == single && single.nonEmpty)
    // the shared footer was actually stripped (the index is non-trivial)
    assert(!single.exists(_.exists(v =>
      v.toString.contains("Shared footer"))), s"footer must strip: $single")
  }

  test("applyBoilerplate cleans a STREAMING frame against a static index, " +
      "result batch-identical (the ingest posture)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchPages = pages(
      (1L, "NAV\ncontent one stays here."),
      (2L, "NAV\ncontent two stays here."),
      (3L, "NAV"))
    val index = LineOps.boilerplateIndex(batchPages, 5000)
    val expected = LineOps.applyBoilerplate(batchPages, index)
      .orderBy("doc_id").collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = LineOps.applyBoilerplate(
        in.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("stream_clean")
      .outputMode("append").start()
    try {
      in.addData((1L, "NAV\ncontent one stays here."))
      in.addData((2L, "NAV\ncontent two stays here."), (3L, "NAV"))
      q.processAllAvailable()
      val got = spark.table("stream_clean").orderBy("doc_id").collect().toSeq
      assert(got == expected, s"stream diverged from batch:\n$got\n$expected")
      assert(got.exists(_.getAs[Long]("n_kept") == 0),
        "the all-boilerplate doc must flow through the stream too")
    } finally q.stop()
  }

  test("multi-line tags: a newline before the attributes still opens a " +
      "block boundary and an anchor span; <TITLE> with attributes " +
      "extracts; trailing whitespace never vetoes c4 punctuation") {
    // block tag with the first attribute on its own line — must break
    val ext = LineOps.htmlExtract(Seq((1L,
      "<html><body><div\nclass=\"a\">First paragraph stays here fine." +
        "</div><div>Second paragraph also stays here fine.</div>" +
        "</body></html>")).toDF("doc_id", "html"))
      .select("text").as[String].head()
    assert(ext.count(_ == '\n') >= 1,
      s"multi-line <div> must still be a block boundary: ${ext.replace("\n", "\\n")}")
    // anchor with a newline before href: its chars must count as link
    val ld = LineOps.linkDensity(Seq((1L,
      "<html><body><p><a\nhref=\"/x\">Home link</a></p></body></html>"))
      .toDF("doc_id", "html"))
      .where($"n_chars" > 0)
      .select("link_bp").as[Long].collect()
    assert(ld.nonEmpty && ld.forall(_ == 10000L),
      s"multi-line <a> must still mark an anchor span: ${ld.toSeq}")
    // shouting/attributed <TITLE>
    val t = LineOps.htmlExtract(Seq((1L,
      "<html><head><TITLE lang=\"en\">The Title</TITLE></head>" +
        "<body><p>Body text sentence here okay.</p></body></html>"))
      .toDF("doc_id", "html"))
      .select("title").as[String].head()
    assert(t == "The Title", s"got '$t'")
    // c4: terminal punct judged on the TRIMMED line
    import org.apache.spark.sql.functions.lit
    val keep = Seq(1).toDF("x")
      .select(LineOps.c4KeepLine(lit("A perfectly good sentence here. "))
        .as("k")).as[Boolean].head()
    assert(keep, "trailing space must not veto the punctuation rule")
  }
}
