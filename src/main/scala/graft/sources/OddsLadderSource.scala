package graft.sources

import graft.functions.OddsFns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
}

private class OddsLadderTable extends Table with SupportsRead {
  override def name(): String = "odds_ladder"
  override def schema(): StructType = OddsLadderSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new OddsLadderScan
}

private class OddsLadderScan extends Scan with Batch {
  override def readSchema(): StructType = OddsLadderSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(LadderPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new LadderReaderFactory
}

private case object LadderPartition extends InputPartition

private class LadderReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = OddsLadderSource.rows.iterator
      private var current: (Int, Int) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = InternalRow(current._1, current._2)
      override def close(): Unit = ()
    }
}
