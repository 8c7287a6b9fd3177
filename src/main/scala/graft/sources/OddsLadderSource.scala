package graft.sources

import graft.functions.OddsFns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** DataSource V2 connector for the odds-ladder source (SURVEY.md §2.1 S1).
  *
  * The reference fetches the ladder from a REST endpoint and falls back to
  * a built-in constant on failure (`src/mm_calls.py:59-66`). This provider
  * is that source's Spark shape: `spark.read.format("graft.sources
  * .OddsLadderSource").load()` yields the ladder as a proper table — the
  * rule-derived constant stands in for the endpoint (a production build
  * would fetch in `planInputPartitions` and keep the constant as the
  * fallback, same contract). Single partition by design: 291 rows.
  *
  * The scan implements the full DSv2 pushdown contract —
  * `SupportsPushDownFilters` (comparison/IN predicates on either column
  * evaluate inside the source; unsupported ones return as residuals for
  * Spark to re-apply) and `SupportsPushDownRequiredColumns` (the reader
  * emits only the projected columns, in Spark's requested order). On 291
  * rows this is about contract completeness; on a real endpoint-backed
  * source the same two hooks are what turn `WHERE odds > 0` into a
  * server-side query parameter instead of a full-ladder fetch.
  *
  * Columns: `odds INT`, `band_step INT` (the generating band's step — the
  * ladder's domain structure, handy for snap-to-ladder style queries).
  */
class OddsLadderSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OddsLadderSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new OddsLadderTable
}

object OddsLadderSource {
  val Schema: StructType = StructType(Seq(
    StructField("odds", IntegerType, nullable = false),
    StructField("band_step", IntegerType, nullable = false)))

  /** (odds, generating band step) for the full signed ladder. */
  def rows: Seq[(Int, Int)] = {
    def stepOf(a: Int): Int =
      OddsFns.LadderBands.collectFirst {
        case (lo, hi, step) if a >= lo && a < hi => step
      }.getOrElse(2500) // +10000 closes the last band
    OddsFns.Ladder.map(v => (v, stepOf(math.abs(v))))
  }

  /** The ONE name→accessor mapping, shared by filter compilation and the
    * reader's projection so the two can never drift when a column is
    * added. */
  private[sources] def accessor(attr: String): Option[((Int, Int)) => Int] =
    attr match {
      case "odds" => Some(_._1)
      case "band_step" => Some(_._2)
      case _ => None
    }

  /** Source-side predicate evaluation. Returns None for filters the source
    * cannot evaluate (they stay residual — Spark re-applies them), Some(p)
    * for the ones it can. Both columns are non-nullable ints, so IsNotNull
    * is trivially true. */
  private[sources] def compile(f: Filter): Option[(Int, Int) => Boolean] = {
    def colv(attr: String): Option[((Int, Int)) => Int] = accessor(attr)
    def num(v: Any): Option[Int] = v match {
      case i: Int => Some(i)
      case l: Long if l.isValidInt => Some(l.toInt)
      case s: Short => Some(s.toInt)
      case b: Byte => Some(b.toInt)
      case _ => None
    }
    f match {
      case IsNotNull(a) if colv(a).isDefined => Some((_, _) => true)
      case EqualTo(a, v) =>
        for (c <- colv(a); x <- num(v)) yield (o: Int, s: Int) => c((o, s)) == x
      case GreaterThan(a, v) =>
        for (c <- colv(a); x <- num(v)) yield (o: Int, s: Int) => c((o, s)) > x
      case GreaterThanOrEqual(a, v) =>
        for (c <- colv(a); x <- num(v)) yield (o: Int, s: Int) => c((o, s)) >= x
      case LessThan(a, v) =>
        for (c <- colv(a); x <- num(v)) yield (o: Int, s: Int) => c((o, s)) < x
      case LessThanOrEqual(a, v) =>
        for (c <- colv(a); x <- num(v)) yield (o: Int, s: Int) => c((o, s)) <= x
      case In(a, vs) =>
        val xs = vs.toSeq.map(num)
        if (colv(a).isDefined && xs.forall(_.isDefined)) {
          val set = xs.flatten.toSet
          val c = colv(a).get
          Some((o: Int, s: Int) => set.contains(c((o, s))))
        } else None
      case _ => None
    }
  }
}

private class OddsLadderTable extends Table with SupportsRead {
  override def name(): String = "odds_ladder"
  override def schema(): StructType = OddsLadderSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OddsLadderScanBuilder
}

private class OddsLadderScanBuilder extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = OddsLadderSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) =
      filters.partition(f => OddsLadderSource.compile(f).isDefined)
    pushed = supported
    residual // Spark keeps these in the plan's Filter node.
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Empty = COUNT(*)-style scan: emit zero-column rows, one per match.
    required = requiredSchema

  override def build(): Scan = new OddsLadderScan(pushed, required)
}

private class OddsLadderScan(pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(LadderPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new LadderReaderFactory(pushed, required)
  override def description(): String =
    s"odds_ladder PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"
}

private case object LadderPartition extends InputPartition

private class LadderReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val preds = pushed.flatMap(OddsLadderSource.compile)
      private val proj: Array[((Int, Int)) => Int] =
        required.fields.map(f => OddsLadderSource.accessor(f.name)
          .getOrElse(throw new IllegalArgumentException(
            s"odds_ladder has no column ${f.name}")))
      private val it = OddsLadderSource.rows.iterator
        .filter(r => preds.forall(p => p(r._1, r._2)))
      private var current: (Int, Int) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow =
        InternalRow.fromSeq(proj.map(p => p(current)).toIndexedSeq)
      override def close(): Unit = ()
    }
}
