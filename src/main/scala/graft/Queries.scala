package graft

import graft.functions.{Bpe, DecodeFns, OddsFns, TextFns, TimeFns}
import graft.functions.SimFns.toDouble
import graft.operators._
import graft.sources.BettingFixture
import graft.streaming.{EventStreams, WagerBook}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** The oracle-checked query inventory (SURVEY.md §2): every SQL-expressible
  * operator gets a Spark implementation and a DuckDB-equivalent oracle over
  * the same parquet tables.
  *
  * Cross-engine determinism rules used throughout (SURVEY.md §5.1):
  *  - money math goes through DECIMAL (exact, order-independent) and is cast
  *    to double only at the end — bit-identical in both engines;
  *  - integer sums are cast to BIGINT (DuckDB's sum(int) is HUGEINT);
  *  - no timestamp-typed output columns — epochs (floor semantics both
  *    sides) or rendered strings instead;
  *  - hashes are md5/sha256 (identical in both engines), never xxhash64;
  *  - every ranking has a total-order tie-break;
  *  - DuckDB ROUND preserves IEEE -0.0 where Spark's round (BigDecimal)
  *    always yields +0.0 — any oracle-side ROUND whose argument can be a
  *    tiny negative gets `+ 0.0` appended (-0.0 + 0.0 = +0.0, every other
  *    value bit-unchanged).
  */
object Queries extends QueriesMultimodal {

  /** The full inventory — the per-family registrars composed in family
    * order (VERDICT r14 #8; same set as the pre-split single Seq). */
  val all: Seq[Q] =
    relationalQs ++ curationQs ++ retrievalQs ++ simQs ++ multimodalQs


  val queries: Map[String, QueryFn] = all.map(q => q.name -> q.fn).toMap
  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
  val benchNames: Seq[String] = all.filter(_.bench).map(_.name)

  /** Oracles derived from the data at verify time (trained-centroid
    * literals). Runs Spark jobs — call once, from Verify. A failed
    * derivation degrades that query to rows-only (logged), never fails the
    * whole dump. */
  def derivedOracleSql(spark: SparkSession, dir: String): Map[String, String] =
    all.flatMap { q =>
      q.oracleFn.flatMap { f =>
        try Some(q.name -> f(spark, dir))
        catch {
          case e: Throwable =>
            System.err.println(
              s"[oracle] derived oracle for ${q.name} failed (rows-only): $e")
            None
        }
      }
    }.toMap
}
