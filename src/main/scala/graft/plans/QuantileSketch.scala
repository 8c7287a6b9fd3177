package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Mergeable, rank-error-bounded streaming quantile sketch — the KLL /
  * MRL compactor-hierarchy family (Karnin–Lang–Liberty 2016; Manku et al.
  * 1998/99), with deterministic alternating compaction.
  *
  * Structure: level `i` holds ≤ `k` values, each standing for `2^i` stream
  * items. When a level fills it is sorted and every other value (the
  * even- or odd-indexed half, alternating per compaction so the ±2^i rank
  * errors cancel in expectation) is promoted to level `i+1`. Memory is
  * O(k · log(n/k)) regardless of n; two sketches merge by concatenating
  * levels and re-compacting — the property that makes this the standard
  * distributed quantile structure, and what the fixed-width
  * [[graft.operators.Sketch.histQuantiles]] (exact-oracleable but
  * value-range-dependent) deliberately isn't.
  *
  * Rank error: one compaction at level `i` shifts any rank estimate by at
  * most `2^i`; level `i` compacts at most `n / (k·2^i)` times, so the
  * total error is ≤ `(H+1)·n/k` for `H+1` levels — published as
  * [[QuantileSketch.rankErrorBound]] and property-checked (the ScalaCheck
  * spec asserts |estRank − trueRank| ≤ bound for every split/merge order).
  *
  * Deterministic given one insertion order, but Spark's partition-merge
  * order is not deterministic across runs ⇒ the registered query is
  * rows-only, like the other nondeterministic entries (C11, F6).
  */
final class QuantileSketch(val k: Int) extends Serializable {
  require(k >= 8, s"compactor capacity too small: $k")

  private[plans] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(new ArrayBuffer[Double])
  private[plans] var parities: ArrayBuffer[Long] = ArrayBuffer(0L)
  var n: Long = 0L

  def update(x: Double): this.type = {
    levels(0) += x
    n += 1
    if (levels(0).length >= k) compact(0)
    this
  }

  def merge(other: QuantileSketch): this.type = {
    require(other.k == k, s"cannot merge sketches with k=$k and k=${other.k}")
    var i = 0
    while (i < other.levels.length) {
      ensureLevel(i)
      levels(i) ++= other.levels(i)
      parities(i) += other.parities(i)
      i += 1
    }
    n += other.n
    i = 0
    while (i < levels.length) { // cascade any overfull level bottom-up
      if (levels(i).length >= k) compact(i)
      i += 1
    }
    this
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) { levels += new ArrayBuffer[Double]; parities += 0L }

  /** Sort level `i`, keep one value behind if the count is odd (retention
    * end alternates), promote alternate values to level `i+1`. */
  private def compact(i: Int): Unit = {
    ensureLevel(i + 1)
    val buf = levels(i)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    buf.clear()
    var len = sorted.length
    var from = 0
    if (len % 2 == 1) { // odd: one value stays at this level
      if (parities(i) % 2 == 0) buf += sorted(len - 1)
      else { buf += sorted(0); from = 1 }
      len -= 1 // compact the remaining even-count range [from, from+len)
    }
    val offset = (parities(i) % 2).toInt
    parities(i) += 1
    var j = from + offset
    val upper = levels(i + 1)
    while (j < from + len) { upper += sorted(j); j += 2 }
    if (upper.length >= k) compact(i + 1)
  }

  /** Estimated number of stream items ≤ x. */
  def estRank(x: Double): Long = {
    var r = 0L
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      val buf = levels(i)
      var j = 0
      while (j < buf.length) { if (buf(j) <= x) r += w; j += 1 }
      i += 1
    }
    r
  }

  /** Worst-case |estRank − trueRank|: (#levels)·n/k (see class doc). */
  def rankErrorBound: Long =
    math.ceil(levels.length.toDouble * n / k).toLong + 1

  /** Value whose estimated rank first reaches ⌈q·n⌉ (q ∈ [0,1]). */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var idx = 0
    while (idx < sorted.length) {
      cum += sorted(idx)._2
      if (cum >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(k); out.writeLong(n); out.writeInt(levels.length)
    var i = 0
    while (i < levels.length) {
      out.writeLong(parities(i))
      out.writeInt(levels(i).length)
      levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bytes.toByteArray
  }
}

object QuantileSketch {
  def deserialize(data: Array[Byte]): QuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val sk = new QuantileSketch(in.readInt())
    sk.n = in.readLong()
    val nLevels = in.readInt()
    sk.levels = ArrayBuffer.fill(nLevels)(new ArrayBuffer[Double])
    sk.parities = ArrayBuffer.fill(nLevels)(0L)
    var i = 0
    while (i < nLevels) {
      sk.parities(i) = in.readLong()
      val len = in.readInt()
      var j = 0
      while (j < len) { sk.levels(i) += in.readDouble(); j += 1 }
      i += 1
    }
    sk
  }
}

/** `kll_quantiles(col)` as a [[TypedImperativeAggregate]] — the proper
  * Catalyst shape for an object-buffer aggregate: partial sketches build
  * map-side (ObjectHashAggregate), serialize across the shuffle, and merge
  * associatively, so the shuffle carries O(k·log(n/k)) bytes per partition
  * however large the input. Evaluates to the estimates for `quantiles`,
  * in order, as `array<double>`. Null inputs are skipped (SQL aggregate
  * convention); the empty-input result is null. */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    quantiles: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buffer: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: non-numeric input $other")
    })
  }

  override def merge(buffer: QuantileSketch, other: QuantileSketch): QuantileSketch =
    buffer.merge(other)

  override def eval(buffer: QuantileSketch): Any =
    if (buffer.n == 0L) null
    else new GenericArrayData(quantiles.map(buffer.quantile).toArray)

  override def serialize(buffer: QuantileSketch): Array[Byte] = buffer.serialize()
  override def deserialize(storage: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren.head)
}
