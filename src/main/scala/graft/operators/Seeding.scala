package graft.operators

import graft.Tables
import graft.sources.BettingFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The seeding pipeline (SURVEY.md §3.2, reference `src/mm_calls.py:52-115`)
  * as one declarative join DAG:
  *
  * {{{
  * tournaments ⋉ interested_names      (F1/J2, mm_calls.py:83)
  *   ⋈ events on tournament_id         (J3,    mm_calls.py:85-87)
  *   ⋈ markets on event_id             (J1,    mm_calls.py:99-105)
  * }}}
  *
  * Domain mapping onto the driver tables: tournaments ← `region`,
  * events ← `orders` (tournament_id = o_custkey mod 5), markets ←
  * `lineitem`. The reference's per-event market map probe with skip-on-miss
  * (F5, `mm_calls.py:102-103`) is exactly inner-join semantics.
  *
  * Scale shape: `region` and the interest list are broadcast (tiny dims —
  * no shuffle); the events⋈markets join shuffles both sides on the event
  * key once, and the per-event aggregate is map-side partial before the
  * exchange. The reference's string-typed join key (`str(event_id)`,
  * `mm_calls.py:94,102`) is reproduced in the dedicated J1 string-key
  * parity query, not here — casting join keys to string defeats pushdown
  * and is exactly what a Spark-first design should *not* do.
  */
object Seeding {

  def seededEvents(spark: SparkSession, sfDir: String): DataFrame =
    seededEventsFrom(spark, sfDir, Tables.region(spark, sfDir)
      .select(col("r_regionkey").as("tournament_id"),
        col("r_name").as("tournament_name"))
      .where(col("tournament_name").isin(BettingFixture.InterestedTournaments: _*)))

  /** The same DAG with the tournaments dim served by the parameterized
    * DSv2 seed-metadata connector (VERDICT r15 #7): the interest filter
    * pushes INTO the source (server-side on an endpoint-backed build),
    * everything downstream is byte-identical to [[seededEvents]] — the
    * two registry rows share one oracle. */
  def seededEventsDsv2(spark: SparkSession, sfDir: String): DataFrame =
    seededEventsFrom(spark, sfDir,
      spark.read.format("graft.sources.SeedMetaSource")
        .option("table", "tournaments").load()
        .where(col("tournament_name").isin(BettingFixture.InterestedTournaments: _*)))

  private def seededEventsFrom(spark: SparkSession, sfDir: String,
      tournaments: DataFrame): DataFrame = {
    val events = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("event_id"),
      pmod(col("o_custkey"), lit(5)).as("tournament_id"),
      when(col("o_orderstatus") === "F", "finished")
        .when(col("o_orderstatus") === "O", "open")
        .otherwise("live").as("event_status"))

    val marketsPerEvent = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("event_id"))
      .agg(
        count(lit(1)).as("n_markets"),
        sum(when(pmod(col("l_linenumber"), lit(3)) === 0, 1).otherwise(0))
          .cast("long").as("n_moneyline"))

    events
      .join(broadcast(tournaments), "tournament_id")
      .join(marketsPerEvent, "event_id")
      .select(col("event_id"), col("tournament_id"), col("tournament_name"),
        col("event_status"), col("n_markets"), col("n_moneyline"))
  }
}
