package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-task BPE encode kernel: greedy merge application in strict rank
  * order, each rank applied once, left-to-right and non-overlapping.
  *
  * The rank-order formulation is the SPEC of this operator (not an
  * approximation of the priority-queue one): for a merge table produced by
  * BPE training the two are equivalent — a pair created by merge k only
  * participates in merges of rank > k — and rank order is what a
  * declarative engine (the DuckDB oracle's recursive CTE, one rank per
  * step) can express exactly. Merges with `a == b` are rejected: for
  * `a != b` adjacent matches can never overlap, so "left-to-right" equals
  * "all matches simultaneously" and both engines agree bit-for-bit; with
  * `a == b` runs like `aaa` make the two readings diverge.
  *
  * Symbol atoms are Unicode code points (matches DuckDB `substr`
  * semantics, and never splits surrogate pairs).
  *
  * Scale posture: words repeat Zipf-heavily, so encodes are memoized in a
  * bounded per-kernel cache. The kernel object is part of the codegen
  * reference array — one instance per executor JVM per plan, shared by
  * its tasks, hence the ConcurrentHashMap; when the corpus vocabulary
  * outgrows the bound the cache is cleared wholesale (encode stays
  * correct, only the memoization resets).
  */
final class BpeKernel(mergeList: Array[Array[String]]) extends Serializable {
  require(mergeList.forall(m => m(0) != m(1)),
    "BPE merges with identical halves (a == b) are unsupported: they break " +
      "the left-to-right == simultaneous equivalence the oracle relies on")

  private val maxCache = 1 << 16
  @transient private lazy val cache = new ConcurrentHashMap[String, Array[UTF8String]]()

  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms: Array[String] = {
      val cps = w.codePoints().toArray
      cps.map(cp => new String(Character.toChars(cp)))
    }
    var mi = 0
    while (mi < mergeList.length && syms.length >= 2) {
      val a = mergeList(mi)(0)
      val b = mergeList(mi)(1)
      var i = 0
      var found = false
      while (i < syms.length - 1 && !found) {
        if (syms(i) == a && syms(i + 1) == b) found = true
        i += 1
      }
      if (found) {
        val out = new Array[String](syms.length)
        var n = 0
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out(n) = a + b; n += 1; j += 2
          } else {
            out(n) = syms(j); n += 1; j += 1
          }
        }
        syms = java.util.Arrays.copyOf(out, n)
      }
      mi += 1
    }
    val res = syms.map(UTF8String.fromString)
    if (cache.size >= maxCache) cache.clear()
    cache.put(w, res)
    res
  }

  /** Encode a word array; the outputs are concatenated in word order.
    * Null elements contribute nothing (the house tokenizer never emits
    * them; tolerated rather than crashing codegen). */
  def encodeAll(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) out ++= encodeWord(words.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_encode(words)` — byte-pair-encoding tokenizer APPLY over a word
  * array, returning the flattened subword-token array. Native expression
  * (preference tier (b)): the per-word loop rebinds the symbol list every
  * merge rank, which composed `transform`/`filter` Columns would unroll
  * into an R-deep nested expression tree (R = merge count, ~50) — the same
  * tree-explosion reason as [[HilbertD]]. Codegen emits a single call into
  * the memoizing kernel, so the enclosing stage stays in whole-stage
  * codegen.
  *
  * The merge table is a constructor constant (broadcast with the plan in
  * the codegen reference array — the standard "small dimension as literal"
  * posture; a 50k-merge GPT-style table is ~1 MB, still plan-shippable).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val kernel =
    new BpeKernel(merges.map(m => Array(m._1, m._2)).toArray)

  override protected def nullSafeEval(v: Any): Any =
    kernel.encodeAll(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ker = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ker.encodeAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
