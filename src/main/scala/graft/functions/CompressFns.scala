package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-based compressibility — the entropy-proxy quality signal a
  * pretraining corpus runs to catch low-entropy junk (repeated boilerplate,
  * keyword stuffing, binary-ish noise) that length/punctuation heuristics
  * miss: natural prose deflates to ~40–60% of its bytes, pathological
  * repetition to a few percent, and random noise not at all.
  *
  * Determinism posture (why the registered query emits INVARIANTS, not raw
  * lengths): the exact deflate byte count depends on the zlib build behind
  * the JDK, so it is deterministic within a run — same level, same input,
  * same library — but NOT a cross-engine constant, and DuckDB exposes no
  * SQL deflate to re-derive it. The oracle therefore checks what IS
  * invariant (bounds and repetition-dominance, `text_compress`), and
  * `CompressFnsSpec` pins the real behavior on planted corpora.
  */
object CompressFns {

  /** Fixed compression level — part of the signal's definition. */
  val Level = 6

  /** Per-thread reusable Deflater (reset per call): one native allocation
    * per executor thread for the JVM lifetime — the standard hot-path
    * pattern; `Deflater#end` is deliberately never called because the
    * instance is permanently reusable, not leaked per task. */
  private val local: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(Level, false))

  /** Deflated byte length of the string's UTF-8 bytes. Codegen-callable
    * (static reference-object call, the BpeEncode pattern). */
  def deflatedLen(s: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
