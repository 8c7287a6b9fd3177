package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY.md §2.9's one custom-aggregate
  * candidate): keeps at most `k` (score, id) pairs per group, merging
  * map-side — the 100 TB alternative to a rank window when the scored
  * pair-set is huge. A window materializes and shuffles every scored row;
  * this aggregate shuffles at most k rows per group (`WindowGroupLimit`
  * closes some of that gap for windows, but still sorts full partitions).
  *
  * Buffer is a sorted-descending Seq capped at k — encodable with the
  * product encoder, cheap to merge (merge-sort of two ≤k lists).
  * Ordering: score desc, then id asc (total order ⇒ deterministic,
  * cross-engine-comparable results).
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def mergeSorted(a: Seq[Scored], b: Seq[Scored], k: Int): Seq[Scored] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      override def zero: Seq[Scored] = Seq.empty
      override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
        if (buf.length >= k && better(buf.last, x)) buf
        else mergeSorted(buf, Seq(x), k)
      override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        mergeSorted(a, b, k)
      override def finish(r: Seq[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
