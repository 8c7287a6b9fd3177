package graft.streaming

import graft.functions.{DecodeFns, TimeFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The push leg's stream transforms (SURVEY.md §2.8). Every function here
  * takes a DataFrame and works identically on a batch frame table or a
  * `readStream` source — that symmetry is what makes the decode pipeline
  * oracle-checkable in batch while the streaming tests drive it through
  * `MemoryStream`.
  *
  *  - T1–T3: topic routing (broadcast-vs-private split, per-tournament
  *    binding) as filters on one source — reference `src/mm_calls.py:184-204`.
  *  - T4: frame decode (JSON envelope → base64 payload → typed market
  *    update) — `src/mm_calls.py:164-174`.
  *  - Event-time tumbling windows + watermark: the idiomatic Spark upgrade
  *    (the reference has no event-time processing, SURVEY.md §2.8).
  */
object EventStreams {

  /** Inner payload schema of a market-update frame (FIXTURES.md §C1). */
  val MarketUpdateSchema: StructType = StructType(Seq(
    StructField("market_id", StringType),
    StructField("event_id", LongType),
    StructField("tournament_id", LongType),
    StructField("status", StringType),
    StructField("odds", IntegerType),
    StructField("updated_at", LongType))) // epoch nanos

  /** Envelope schema of a raw frame (channel + routing + base64 payload). */
  val FrameEnvelopeSchema: StructType = StructType(Seq(
    StructField("channel", StringType),
    StructField("event_name", StringType),
    StructField("payload", StringType)))

  /** T4 — decode raw frames (column `raw` holds the JSON envelope). Both
    * `from_json` parses are staged through Generate barriers
    * ([[graft.plans.Stage]]): an un-staged envelope parse gets inlined into
    * every downstream column and routing predicate (3–4 re-parses of the
    * same JSON per frame on the hot ingest path). Routing filters on
    * channel/event_name still push below the payload parse, so dropped
    * frames never pay for the inner decode. */
  def decodeFrames(frames: DataFrame): DataFrame = {
    val env = graft.plans.Stage(frames, "env", from_json(col("raw"), FrameEnvelopeSchema))
      .select(col("env.channel").as("channel"),
        col("env.event_name").as("event_name"),
        col("env.payload").as("payload"))
    graft.plans.Stage(env, "update",
      from_json(unbase64(col("payload")).cast("string"), MarketUpdateSchema))
      .select(col("channel"), col("event_name"), col("update"))
  }

  /** T1 — broadcast-channel leg (`'broadcast' in channel_name`). */
  def broadcastLeg(decoded: DataFrame): DataFrame =
    decoded.where(col("channel").contains("broadcast"))

  /** T2 — per-tournament binding: keep frames for the subscribed topics. */
  def tournamentLeg(decoded: DataFrame, tournamentIds: Seq[Long]): DataFrame =
    broadcastLeg(decoded)
      .where(col("event_name").isin(tournamentIds.map("tournament_" + _): _*))

  /** T3 — private-channel leg. */
  def privateLeg(decoded: DataFrame): DataFrame =
    decoded.where(!col("channel").contains("broadcast"))

  /** Event-time tumbling windows over decoded updates: per-window ×
    * tournament counts and last odds. `withWatermark` bounds state; in
    * batch the same expression runs un-watermarked. */
  def windowedOddsStats(decoded: DataFrame, windowLen: String,
      watermark: Option[String]): DataFrame = {
    val ts = decoded.select(
      TimeFns.nanosToTimestamp(col("update.updated_at")).as("event_time"),
      col("update.tournament_id").as("tournament_id"),
      col("update.odds").as("odds"))
    val wm = watermark.fold(ts)(w => ts.withWatermark("event_time", w))
    wm.groupBy(window(col("event_time"), windowLen), col("tournament_id"))
      .agg(count(lit(1)).as("n_updates"),
        min(col("odds")).as("min_odds"),
        max(col("odds")).as("max_odds"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("tournament_id"), col("n_updates"), col("min_odds"), col("max_odds"))
  }

  /** Fixture-builder: turn deterministic rows into encoded Pusher-style
    * frames (the reverse of T4, used for replay tests and the round-trip
    * oracle query). */
  def encodeFixtureFrames(updates: DataFrame, channel: Column, eventName: Column): DataFrame =
    updates.select(DecodeFns.encodeFrame(channel, eventName,
      struct(col("market_id"), col("event_id"), col("tournament_id"),
        col("status"), col("odds"), col("updated_at"))).as("raw"))
}
