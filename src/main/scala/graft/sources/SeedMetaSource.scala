package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** Parameterized DataSource V2 connector for the seeding-metadata tier
  * (SURVEY.md §2.1 S2–S4) — the generalization of [[OddsLadderSource]]'s
  * pushdown contract to the other REST-shaped fixture tables (VERDICT
  * r15 #7).
  *
  * The reference seeds its pipeline from three REST endpoints: the
  * tournaments list, the per-tournament events fetch, and the market
  * batches (`src/mm_calls.py:69-105`). This provider is those endpoints'
  * Spark shape: `spark.read.format("graft.sources.SeedMetaSource")
  * .option("table", …).load()` yields the metadata as a proper table.
  * Tables served (rule-derived fixture stand-ins, same posture as the
  * ladder — a production build would fetch in `planInputPartitions` with
  * these rows as the fallback):
  *
  *  - `tournaments` — (tournament_id INT, tournament_name STRING): the
  *    five-region tournament universe the seeding pipeline joins against
  *    (TPC-H's fixed region constants, which is what the driver's
  *    `region.parquet` holds at every SF — the oracled `s2_meta_scan`
  *    query pins source ≡ parquet).
  *  - `interest` — (tournament_name STRING): the interest list from
  *    [[BettingFixture.InterestedTournaments]] (the reference's config
  *    endpoint, `mm_calls.py:83`).
  *
  * Parameterization (the S3 "param." REST contract — a query parameter
  * the ENDPOINT applies, distinct from predicate pushdown):
  * `.option("tournament_id", n)` restricts the served rows to that
  * tournament before any Spark predicate runs, exactly like the
  * reference's per-tournament events URL.
  *
  * The scan implements the same full DSv2 pushdown contract S1 does —
  * `SupportsPushDownFilters` (equality/IN/IsNotNull on any column,
  * comparisons on int columns; everything else returns residual) and
  * `SupportsPushDownRequiredColumns` (projection-ordered pruned reads,
  * zero-column COUNT(*) scans included). On an endpoint-backed build the
  * pushed filters become server-side query parameters.
  */
class SeedMetaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeedMetaSource.schemaOf(SeedMetaSource.tableName(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeedMetaTable(SeedMetaSource.tableName(
        new CaseInsensitiveStringMap(properties)),
      Option(properties.get("tournament_id")).map(_.trim.toInt))
}

object SeedMetaSource {
  val TournamentsTable = "tournaments"
  val InterestTable = "interest"

  private[sources] def tableName(options: CaseInsensitiveStringMap): String =
    Option(options.get("table")).getOrElse(TournamentsTable) match {
      case t @ (TournamentsTable | InterestTable) => t
      case other => throw new IllegalArgumentException(
        s"SeedMetaSource has no table '$other' " +
          s"(expected $TournamentsTable | $InterestTable)")
    }

  def schemaOf(table: String): StructType = table match {
    case TournamentsTable => StructType(Seq(
      StructField("tournament_id", IntegerType, nullable = false),
      StructField("tournament_name", StringType, nullable = false)))
    case InterestTable => StructType(Seq(
      StructField("tournament_name", StringType, nullable = false)))
  }

  /** The TPC-H region universe (spec §4.2.3 constants — identical at
    * every SF, which is what makes the source oracle-checkable against
    * `region.parquet`). */
  val TournamentRows: Seq[Seq[Any]] = Seq(
    Seq(0, "AFRICA"), Seq(1, "AMERICA"), Seq(2, "ASIA"),
    Seq(3, "EUROPE"), Seq(4, "MIDDLE EAST"))

  def rowsOf(table: String, tournamentId: Option[Int]): Seq[Seq[Any]] =
    table match {
      case TournamentsTable =>
        tournamentId.fold(TournamentRows)(id =>
          TournamentRows.filter(_.head == id))
      case InterestTable =>
        BettingFixture.InterestedTournaments.map(Seq[Any](_))
    }

  /** Source-side predicate evaluation over a schema-aligned row. None =
    * the source cannot evaluate it (stays residual, Spark re-applies);
    * Some(p) = evaluated inside the source. All fixture columns are
    * non-nullable, so IsNotNull is trivially true. */
  private[sources] def compile(table: String, f: Filter)
      : Option[Seq[Any] => Boolean] = {
    val schema = schemaOf(table)
    def safeIdx(attr: String): Option[Int] =
      schema.fields.indexWhere(_.name.equalsIgnoreCase(attr)) match {
        case -1 => None
        case i => Some(i)
      }
    def num(v: Any): Option[Int] = v match {
      case i: Int => Some(i)
      case l: Long if l.isValidInt => Some(l.toInt)
      case s: Short => Some(s.toInt)
      case b: Byte => Some(b.toInt)
      case _ => None
    }
    def intCol(attr: String): Option[Int] = safeIdx(attr)
      .filter(i => schema.fields(i).dataType == IntegerType)
    // scalar equality works uniformly: fixture values are Int | String
    def lit(attr: String, v: Any): Option[Any] = safeIdx(attr).flatMap { i =>
      schema.fields(i).dataType match {
        case IntegerType => num(v)
        case StringType => v match { case s: String => Some(s); case _ => None }
        case _ => None
      }
    }
    f match {
      case IsNotNull(a) if safeIdx(a).isDefined => Some(_ => true)
      case EqualTo(a, v) =>
        for (i <- safeIdx(a); x <- lit(a, v)) yield (r: Seq[Any]) => r(i) == x
      case In(a, vs) =>
        val xs = vs.toSeq.map(v => lit(a, v))
        for (i <- safeIdx(a); _ <- if (xs.forall(_.isDefined)) Some(()) else None)
          yield { val set = xs.flatten.toSet; (r: Seq[Any]) => set.contains(r(i)) }
      case GreaterThan(a, v) =>
        for (i <- intCol(a); x <- num(v))
          yield (r: Seq[Any]) => r(i).asInstanceOf[Int] > x
      case GreaterThanOrEqual(a, v) =>
        for (i <- intCol(a); x <- num(v))
          yield (r: Seq[Any]) => r(i).asInstanceOf[Int] >= x
      case LessThan(a, v) =>
        for (i <- intCol(a); x <- num(v))
          yield (r: Seq[Any]) => r(i).asInstanceOf[Int] < x
      case LessThanOrEqual(a, v) =>
        for (i <- intCol(a); x <- num(v))
          yield (r: Seq[Any]) => r(i).asInstanceOf[Int] <= x
      case _ => None
    }
  }
}

private class SeedMetaTable(table: String, tournamentId: Option[Int])
    extends Table with SupportsRead {
  override def name(): String = s"seed_meta_$table"
  override def schema(): StructType = SeedMetaSource.schemaOf(table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeedMetaScanBuilder(table,
      Option(options.get("tournament_id")).map(_.trim.toInt).orElse(tournamentId))
}

private class SeedMetaScanBuilder(table: String, tournamentId: Option[Int])
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeedMetaSource.schemaOf(table)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) =
      filters.partition(f => SeedMetaSource.compile(table, f).isDefined)
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeedMetaScan(table, tournamentId, pushed, required)
}

private class SeedMetaScan(table: String, tournamentId: Option[Int],
    pushed: Array[Filter], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeedMetaPartition(table, tournamentId))
  override def createReaderFactory(): PartitionReaderFactory =
    new SeedMetaReaderFactory(table, tournamentId, pushed, required)
  override def description(): String =
    s"seed_meta_$table${tournamentId.fold("")(id => s" tournament_id=$id")} " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"
}

private case class SeedMetaPartition(table: String, tournamentId: Option[Int])
    extends InputPartition

private class SeedMetaReaderFactory(table: String, tournamentId: Option[Int],
    pushed: Array[Filter], required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val schema = SeedMetaSource.schemaOf(table)
      private val preds = pushed.flatMap(SeedMetaSource.compile(table, _))
      private val proj: Array[Int] = required.fields.map { f =>
        val i = schema.fields.indexWhere(_.name == f.name)
        if (i < 0) throw new IllegalArgumentException(
          s"seed_meta_$table has no column ${f.name}")
        i
      }
      private val it = SeedMetaSource.rowsOf(table, tournamentId).iterator
        .filter(r => preds.forall(_(r)))
      private var current: Seq[Any] = _
      override def next(): Boolean = {
        val has = it.hasNext; if (has) current = it.next(); has
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(proj.toIndexedSeq.map(i => current(i) match {
          case s: String => UTF8String.fromString(s)
          case other => other
        }))
      override def close(): Unit = ()
    }
}
