package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Stage

/** Line-level page cleaning — the tier a crawl corpus passes BEFORE
  * document-level quality gates and dedup (C4's line rules, Gopher/CCNet's
  * repeated-line removal, RefinedWeb's corpus-frequent boilerplate strip).
  * The reference pipeline has no line tier (its payloads are API JSON,
  * not crawled pages — /root/reference/src/main.py:61-101 flattens
  * structured events); these are engine extensions for the LLM-data
  * story, same charter as TextAnalysis (SURVEY.md §2.10).
  *
  * Everything here is built from portable primitives with bit-identical
  * DuckDB twins (`split`/`instr`/`md5`, no regex anchors — the round-10
  * `$`-vs-`\z` lesson is designed out by using `substring`/`instr`
  * instead of anchored regexes).
  *
  * Scale posture: [[cleanLines]] and [[dedupLinesWithinDoc]] are NARROW —
  * per-row array lambdas, zero exchanges, so they run at scan speed on
  * any corpus size. [[stripBoilerplate]] is the one genuinely global op
  * (doc-frequency needs the corpus): one distinct+count aggregation over
  * exploded lines, then the (tiny) frequent-line set broadcast back onto
  * the exploded frame — the CCNet shape. No driver-side collect; the
  * boilerplate set size is bounded by the share threshold (≤ 1/share
  * distinct lines can exceed a doc-share bound, e.g. ≤ 33 lines at 3%).
  */
object LineOps {

  /** Split page text into lines. `split` never yields an empty array
    * (splitting "" gives [""]), so downstream `sequence(1, size)` is safe. */
  def lines(text: Column): Column = split(text, "\n")

  /** C4 keep-predicate for one line (Raffel et al. 2020 §2.2, the public
    * c4 rules): ≥ `minWords` words, terminal punctuation, and none of the
    * javascript / lorem-ipsum / cookie / curly-brace markers. Substring
    * checks via `instr` (portable); terminal punct via last-char `isin`
    * (no regex anchor — engines disagree on `$`). */
  def c4KeepLine(x: Column, minWords: Int = 5): Column = {
    val words = size(split(trim(x), "\\s+"))
    val lx = lower(x)
    (words >= minWords) &&
      // terminal punctuation on the TRIMMED line, like the word count —
      // a trailing space (pre-extracted corpora that never went through
      // htmlExtract's whitespace normalization) must not veto an
      // otherwise-valid sentence (review r12)
      substring(trim(x), -1, 1).isin(".", "!", "?") &&
      instr(lx, "javascript") === 0 &&
      instr(lx, "lorem ipsum") === 0 &&
      instr(lx, "cookie") === 0 &&
      instr(lx, "{") === 0
  }

  /** C4-style line cleaning over (doc_id, text) pages: drop lines failing
    * [[c4KeepLine]], rebuild the page, count kept/total. Narrow (no
    * exchange): both the line array and the kept array are staged behind
    * Generate barriers so neither lambda re-evaluates per consumer. */
  def cleanLines(pages: DataFrame, minWords: Int = 5): DataFrame = {
    val withLines = Stage(pages.select(col("doc_id"), col("text")),
      "l", lines(col("text")))
    val withKept = Stage(withLines,
      "k", filter(col("l"), x => c4KeepLine(x, minWords)))
    withKept.select(
      col("doc_id"),
      size(col("l")).cast("long").as("n_lines"),
      size(col("k")).cast("long").as("n_kept"),
      array_join(col("k"), "\n").as("cleaned_text"))
  }

  /** Within-document repeated-line removal (the Gopher/CCNet in-doc rule):
    * keep each line's FIRST occurrence, preserving order. Narrow: the
    * kept-index array is `filter(1..n, i -> first_index(l, l[i]) == i)` —
    * `array_position` returns the first index in both engines, so the
    * predicate is portable verbatim. */
  def dedupLinesWithinDoc(pages: DataFrame): DataFrame = {
    val withLines = Stage(pages.select(col("doc_id"), col("text")),
      "l", lines(col("text")))
    val withIdx = Stage(withLines,
      "ki", filter(sequence(lit(1), size(col("l"))),
        i => array_position(col("l"), element_at(col("l"), i)) === i))
    withIdx.select(
      col("doc_id"),
      size(col("l")).cast("long").as("n_lines"),
      size(col("ki")).cast("long").as("n_unique"),
      array_join(transform(col("ki"), i => element_at(col("l"), i)), "\n")
        .as("deduped_text"))
  }

  /** Corpus-frequent boilerplate-line removal (RefinedWeb/CCNet: a line
    * appearing in ≥ `minDocShareBp`/10000 of documents is nav/footer
    * chrome, not content — strip it everywhere): build the frequent-line
    * index over this corpus ([[boilerplateIndex]], the only global pass)
    * and apply it in place ([[applyBoilerplate]], narrow).
    * Output: (doc_id, n_lines, n_kept, cleaned_text). */
  def stripBoilerplate(pages: DataFrame, minDocShareBp: Int): DataFrame =
    applyBoilerplate(pages, boilerplateIndex(pages, minDocShareBp))

  /** The frequent-line index — md5 keys (the repo-wide 128-bit
    * text-equality convention) of every line appearing in ≥
    * `minDocShareBp`/10000 of documents. This is the PERSISTED index of
    * the incremental form (built on yesterday's crawl, applied to
    * today's batches) and the only global pass of the tier: one distinct
    * + one count aggregation, both map-side combinable, md5 keys through
    * the shuffle rather than raw strings. The result is provably tiny —
    * each entry covers ≥ share of all docs, so at most
    * avgLinesPerDoc · 10⁴ / shareBp entries exist (≤ 27 here; ≤ ~33k
    * even for 10⁴-line pages at 30%). */
  def boilerplateIndex(pages: DataFrame, minDocShareBp: Int): DataFrame = {
    val ex = Stage(pages.select(col("doc_id"), col("text")),
        "l", lines(col("text")))
      .select(col("doc_id"), explode(col("l")).as("line"))
    val nDocs = pages.agg(count(lit(1)).as("n_docs"))
    ex.select(md5(col("line")).as("lh"), col("doc_id")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(nDocs))
      .where(col("doc_freq") * 10000 >= col("n_docs") * minDocShareBp)
      .select(col("lh"))
  }

  /** Mergeable boilerplate-index STATE over a document batch: one row
    * per distinct line key with its doc-frequency, plus a NULL-key row
    * carrying the batch's doc count (the n_docs rider that makes the
    * share threshold computable after any merge). States from DISJOINT
    * batches fold with [[mergeBoilerplateStates]]; [[indexFromState]]
    * applies the share threshold — so the threshold is a READ-time
    * decision over the persisted state, and new crawl batches fold in
    * without rescanning history (the termIndex/datasetCardState
    * posture). */
  def boilerplateState(pages: DataFrame): DataFrame = {
    val freq = Stage(pages.select(col("doc_id"), col("text")),
        "l", lines(col("text")))
      .select(col("doc_id"), explode(col("l")).as("line"))
      .select(md5(col("line")).as("lh"), col("doc_id")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("cnt"))
    freq.unionByName(
      pages.agg(count(lit(1)).as("cnt"))
        .select(lit(null).cast("string").as("lh"), col("cnt")))
  }

  /** Monoid merge of [[boilerplateState]] frames from disjoint batches
    * (doc-frequencies and the NULL-key doc count are both additive). */
  def mergeBoilerplateStates(a: DataFrame, b: DataFrame): DataFrame =
    mergeBoilerplateStatesAll(Seq(a, b))

  /** N-way [[mergeBoilerplateStates]] — ONE union + ONE aggregate for a
    * backfill over many batch states (folding N states pairwise plans
    * N − 1 aggregates; the monoid collapses them into one exchange). */
  def mergeBoilerplateStatesAll(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(col("lh")).agg(sum(col("cnt")).as("cnt"))
  }

  /** The frequent-line index from a (possibly merged) state: lines in ≥
    * `minDocShareBp`/10000 of the state's total docs. Equals
    * [[boilerplateIndex]] over the union of the state's batches. */
  def indexFromState(state: DataFrame, minDocShareBp: Int): DataFrame = {
    val nDocs = state.where(col("lh").isNull)
      .agg(sum(col("cnt")).as("n_docs"))
    state.where(col("lh").isNotNull)
      .crossJoin(broadcast(nDocs))
      .where(col("cnt") * 10000 >= col("n_docs") * minDocShareBp)
      .select(col("lh"))
  }

  /** Apply a frequent-line index: STATELESS AND NARROW — the index
    * collapses to a one-row array (bounded, see [[boilerplateIndex]]),
    * broadcast onto every page, and the line array filters against it
    * in place. No explode, no reassembly shuffle, order trivially
    * preserved — and because nothing here is stateful, the same operator
    * cleans a STREAMING frame against a static index unchanged (the
    * ingest posture: yesterday's index, today's stream). */
  def applyBoilerplate(pages: DataFrame, index: DataFrame): DataFrame = {
    val bl = index.agg(collect_list(col("lh")).as("boiler"))
    val withLines = Stage(pages.select(col("doc_id"), col("text")),
        "l", lines(col("text")))
      .crossJoin(broadcast(bl))
    val withKept = Stage(withLines,
      "k", filter(col("l"), x => !array_contains(col("boiler"), md5(x))))
    withKept.select(
      col("doc_id"),
      size(col("l")).cast("long").as("n_lines"),
      size(col("k")).cast("long").as("n_kept"),
      array_join(col("k"), "\n").as("cleaned_text"))
  }

  /** Block-level HTML tags — their boundaries become LINE BREAKS in the
    * extracted text (the WET convention), so the downstream line tier
    * ([[cleanLines]] / [[stripBoilerplate]] / [[pageClean]]) sees real
    * page structure. Inline tags (a, b, span, …) fall through to the
    * generic tag strip and become spaces. */
  val BlockTags: String =
    "p|div|h1|h2|h3|li|ul|ol|tr|table|br|head|body|html|title"

  /** The extraction chain — ONE list drives both the Column fold and the
    * SQL twin ([[htmlStripSql]]), so the engines cannot drift. Patterns
    * stay inside the Java∩RE2 subset (no anchors, no DOTALL flag; `(?i)`
    * is common to both); the tab and newline characters are literal in
    * both (RE2 reads the raw chars). Block bodies (script/style/comment)
    * match newlines via `[\s\S]` — identical semantics in both engines —
    * so MULTI-LINE script bodies on real crawl HTML strip completely
    * instead of leaking JS text into the extracted lines (ADVICE r10;
    * the non-greedy `*?` keeps two blocks on one line separate). */
  private val HtmlSteps: List[(String, String)] = List(
    "(?i)<script[^>]*>[\\s\\S]*?</script>" -> " ",
    "(?i)<style[^>]*>[\\s\\S]*?</style>" -> " ",
    "<!--[\\s\\S]*?-->" -> " ",
    // case-insensitive (legacy crawl pages shout <P>) with a tag-NAME
    // boundary — without it <link>/<param>/<track> match via the
    // li/p/tr alternatives and inject spurious line breaks
    // [ \t\r\n] (not just space/tab): template engines emit the first
    // attribute on its own line — "<div\nclass=…>" must still be a block
    // boundary, or separate paragraphs merge into one c4/boilerplate line
    // (review r12)
    s"(?i)</?($BlockTags)(/?>|[ \t\r\n][^>]*>)" -> "\n",
    "<[^>]*>" -> " ",
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&",
    // whitespace normalization: spaces/tabs/CRs collapse per line (CRLF
    // input must not leave \r on line ends — c4's terminal-punct check
    // and the boilerplate md5 keys would both break), line edges trim,
    // empty lines squeeze — each step left-to-right in both engines
    "[ \t\r]+" -> " ",
    " ?\n ?" -> "\n",
    "\n+" -> "\n")

  /** SQL twin of the [[htmlExtract]] strip chain over expression `x`
    * (DuckDB needs the 'g' flag — its regexp_replace defaults to
    * first-match-only, Spark's is global). */
  def htmlStripSql(x: String): String = stripSql(HtmlSteps, x)

  /** SQL fold of any strip chain (shared by the plain and anchor-marked
    * variants so the quoting convention lives once). */
  private def stripSql(steps: List[(String, String)], x: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    steps.foldLeft(x) { case (acc, (pat, repl)) =>
      s"regexp_replace($acc, ${q(pat)}, ${q(repl)}, 'g')"
    }
  }

  /** Column fold of any strip chain (shared likewise). */
  private def stripFold(steps: List[(String, String)]): Column =
    steps.foldLeft(col("html")) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }

  /** Sentinel characters bracketing anchor text through the
    * [[linkDensity]] chain - control chars no whitespace step touches
    * and no real page text contains. */
  private val A1 = "\u0001"
  private val A2 = "\u0002"

  /** Anchor-marking steps for [[linkDensity]] - spliced into the
    * extraction chain BEFORE the block/generic tag strips, so anchor
    * text survives bracketed by the sentinels. */
  private val AnchorMarkSteps: List[(String, String)] = List(
    // same multi-line-tag tolerance as the block step: "<a\nhref=…>"
    // must still open an anchor span, or its chars count as content and
    // nav chrome passes the density gate (review r12)
    "(?i)<a(/?>|[ \t\r\n][^>]*>)" -> A1,
    "(?i)</a[ \t\r\n]*>" -> A2)

  private val LinkedSteps: List[(String, String)] =
    HtmlSteps.take(3) ++ AnchorMarkSteps ++ HtmlSteps.drop(3)

  /** SQL twin of the [[linkDensity]] strip chain over expression `x`. */
  def linkedStripSql(x: String): String = stripSql(LinkedSteps, x)

  /** Per-line LINK DENSITY - the trafilatura-style main-content signal:
    * nav/related/footer chrome is mostly anchor text, article prose is
    * not. Anchors are sentinel-marked through the same extraction chain
    * ([[LinkedSteps]]), then each line reports its anchor-char share in
    * basis points with the sentinels removed from the output text.
    * Narrow except the one posexplode Generate; integer bp => hash-exact.
    * Unbalanced anchors (crawl junk) simply leave an unmatched sentinel
    * that counts no chars and is stripped from the output.
    * Output: (doc_id, pos, line, n_chars, link_chars, link_bp,
    * is_content = link_bp <= maxLinkBp). */
  /* KNOWN LIMITATION (review r12, kept by design): link chars are
   * counted PER LINE, so an anchor wrapping block elements ("<a><div>…"
   * — its open and close sentinels land on different lines) contributes
   * zero link chars to each line it spans. This is a structural property
   * of line-wise density heuristics (trafilatura-class extractors share
   * it); fixing it needs cross-line span state that a per-row array
   * lambda cannot carry. Corpus-frequent nav of this shape is still
   * killed by the boilerplate tier, which keys on line content, not
   * density. */
  def linkDensity(pages: DataFrame, maxLinkBp: Int = 5000): DataFrame = {
    val stripped = stripFold(LinkedSteps)
    val staged = Stage(pages.select(col("doc_id"), col("html")),
      "text", trim(stripped, " \n"))
    val exploded = staged
      .select(col("doc_id"), posexplode(lines(col("text"))).as(Seq("p0", "raw")))
    val withChars = Stage(Stage(exploded,
        "link_chars", aggregate(
          regexp_extract_all(col("raw"), lit(s"$A1([^$A1$A2]*)$A2"), lit(1)),
          lit(0L), (acc, s) => acc + length(s))),
      "line", regexp_replace(col("raw"), s"[$A1$A2]", ""))
    withChars.select(
      col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
      col("line"),
      length(col("line")).cast("long").as("n_chars"),
      col("link_chars"),
      expr("CASE WHEN length(line) = 0 THEN 0L " +
        "ELSE link_chars * 10000 div length(line) END").as("link_bp"))
      .withColumn("is_content",
        // EXACT-ratio comparison (not the floored link_bp) so this flag
        // agrees with contentExtract's gate at every boundary
        (col("link_chars") * 10000 <= col("n_chars") * maxLinkBp).cast("int"))
  }

  /** MAIN-CONTENT extraction end-to-end (the trafilatura composition):
    * extract with sentinel-marked anchors, drop lines whose link density
    * exceeds `maxLinkBp` (nav/related/footer chrome), strip the
    * sentinels, then the c4 rules, within-doc line dedup and the
    * doc-level gate. FULLY NARROW - every stage is a per-row array
    * lambda over the staged line array, so the whole pass runs at scan
    * speed on any corpus size (no boilerplate frequency pass here; that
    * tier composes separately when corpus-global chrome matters).
    * Output: (doc_id, n_lines, n_content, n_kept, keep_doc, main_text). */
  def contentExtract(pages: DataFrame, maxLinkBp: Int = 5000,
      minWords: Int = 5, minKeptLines: Int = 2): DataFrame = {
    val stripped = stripFold(LinkedSteps)
    val withLines = Stage(Stage(pages.select(col("doc_id"), col("html")),
      "text", trim(stripped, " \n")), "l0", lines(col("text")))
    // ONE regex pass per line: clean text + anchor chars land in a
    // struct, the density gate reads the struct fields (HOF lambdas
    // re-evaluate every expression reference - the Stage lesson), and
    // the anchor-span class excludes BOTH sentinels so an unclosed
    // opener counts nothing
    val withMeta = Stage(withLines,
      "lm", transform(col("l0"), x => struct(
        regexp_replace(x, s"[$A1$A2]", "").as("clean"),
        aggregate(
          regexp_extract_all(x, lit(s"$A1([^$A1$A2]*)$A2"), lit(1)),
          lit(0L), (acc, s) => acc + length(s)).as("lc"))))
    // EXACT-ratio gate (same comparison as linkDensity.is_content);
    // empty lines pass - c4 drops them next
    val withClean = Stage(withMeta,
      "l", transform(filter(col("lm"), m =>
          m.getField("lc") * 10000 <=
            length(m.getField("clean")).cast("long") * maxLinkBp),
        m => m.getField("clean")))
    val withIdx = c4DedupIdx(withClean, "l", minWords)
    withIdx.select(
      col("doc_id"),
      size(col("l0")).cast("long").as("n_lines"),
      size(col("l")).cast("long").as("n_content"),
      size(col("ki")).cast("long").as("n_kept"),
      (size(col("ki")) >= minKeptLines).cast("int").as("keep_doc"),
      array_join(transform(col("ki"), i => element_at(col("k"), i)), "\n")
        .as("main_text"))
  }

  /** WET-style HTML → text extraction — the step BEFORE any line/doc
    * cleaning in a crawl pipeline: drop script/style blocks and comments,
    * turn BLOCK tag boundaries into newlines and strip the remaining
    * (inline) tags to spaces, decode the five core entities (&amp; LAST,
    * so entity-encoded entities don't double-decode), then normalize
    * whitespace per line and squeeze empty lines. Pure chained codegen'd
    * regexp_replace — narrow, zero exchanges, streaming-safe. Block
    * bodies (script/style/comment) strip across newlines ([[HtmlSteps]]'
    * `[\s\S]` classes), so raw multi-line crawl HTML needs no upstream
    * newline-normalizing; stray CRs are folded by the whitespace steps.
    * Output: (doc_id, title, text, n_lines, n_tokens) with
    * line-structured `text` that feeds [[pageClean]] directly. */
  def htmlExtract(pages: DataFrame): DataFrame = {
    val stripped = stripFold(HtmlSteps)
    val staged = Stage(pages.select(col("doc_id"), col("html")),
      "text", trim(stripped, " \n"))
    staged.select(
      col("doc_id"),
      // (?i) + the BlockTags tag-name boundary `(>|[ \t\r\n][^>]*>)` — a
      // legacy <TITLE> or <title lang=…> must not yield an empty title
      // (review r12), and a tag merely STARTING with "title"
      // (<titlefoo …>) must not be mistaken for one (ADVICE r12)
      regexp_extract(col("html"),
        "(?i)<title(>|[ \t\r\n][^>]*>)([^<]*)</title>", 2).as("title"),
      col("text"),
      size(lines(col("text"))).cast("long").as("n_lines"),
      size(graft.functions.TextFns.tokens(col("text"))).as("n_tokens"))
  }

  /** First occurrence of a tag's RAW inner text (the [[htmlExtract]]
    * title convention generalized — decode is a body-text step). For
    * field-weighted retrieval over extracted pages: the h1 usually
    * carries the content headline where <title> is site chrome. */
  def htmlField(html: Column, tag: String): Column =
    regexp_extract(html, s"(?i)<$tag(>|[ \t\r\n][^>]*>)([^<]*)</$tag>", 2)

  /** One-pass FIELDED extraction for retrieval: the h1 headline (raw,
    * like the title convention) + the extracted body — no second scan
    * and no self-join back to the raw frame. */
  def htmlExtractFields(pages: DataFrame): DataFrame =
    Stage(pages.select(col("doc_id"), col("html")),
        "body", trim(stripFold(HtmlSteps), " \n"))
      .select(col("doc_id"),
        htmlField(col("html"), "h1").as("title"), col("body"))

  /** Shared tail of the composed passes: c4-filter the `src` line
    * array into `k`, then the first-occurrence dedup index `ki` (size-0
    * guarded because Spark's sequence(1, 0) is DESCENDING, not empty).
    * One copy of the guard/tie semantics for pageClean AND
    * contentExtract. */
  private def c4DedupIdx(df: DataFrame, src: String,
      minWords: Int): DataFrame =
    Stage(Stage(df,
      "k", filter(col(src), x => c4KeepLine(x, minWords))),
      "ki", when(size(col("k")) === 0, array().cast("array<int>"))
        .otherwise(filter(sequence(lit(1), size(col("k"))),
          i => array_position(col("k"), element_at(col("k"), i)) === i)))

  /** The composed page-cleaning pass a crawl corpus runs end-to-end:
    * corpus-frequent boilerplate strip → C4 line rules → within-doc
    * repeated-line removal, plus the C4 DOC-level gate (≥ `minKeptLines`
    * surviving lines, else the page is flagged dropped — kept in the
    * output with keep_doc = 0 so the caller sees what the gate cost).
    * Output: (doc_id, n_lines, n_kept, keep_doc, cleaned_text). */
  def pageClean(pages: DataFrame, minDocShareBp: Int = 3000,
      minWords: Int = 5, minKeptLines: Int = 2): DataFrame =
    pageCleanWithIndex(pages, boilerplateIndex(pages, minDocShareBp),
      minWords, minKeptLines)

  /** [[pageClean]] against a PRE-BUILT frequent-line index (a
    * [[boilerplateIndex]], or [[indexFromState]] over merged
    * [[boilerplateState]]s) — the incremental/streaming posture:
    * yesterday's persisted index cleans today's batch with the apply
    * side fully narrow. */
  def pageCleanWithIndex(pages: DataFrame, index: DataFrame,
      minWords: Int = 5, minKeptLines: Int = 2): DataFrame = {
    // One boilerplate pass, then the narrow per-doc stages run on the
    // SURVIVING line arrays directly — no re-split round-trip and no
    // self-join back to the stripped frame (the duplicate-subtree trap:
    // reusing the stripBoilerplate frame on both sides of a join would
    // run its scan + both shuffles twice).
    val deb = applyBoilerplate(pages, index)
      .select(col("doc_id"), col("n_lines"), col("cleaned_text").as("text"))
    val withLines = Stage(deb, "l0", lines(col("text")))
    val withIdx = c4DedupIdx(withLines, "l0", minWords)
    withIdx.select(
      col("doc_id"), col("n_lines"),
      size(col("ki")).cast("long").as("n_kept"),
      (size(col("ki")) >= minKeptLines).cast("int").as("keep_doc"),
      array_join(transform(col("ki"), i => element_at(col("k"), i)), "\n")
        .as("cleaned_text"))
  }
}
