package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, MapState, OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues}

/** The wager book (SURVEY.md §2.8 T5/T6): keyed mutable state over a
  * command stream — PLACE inserts, CANCEL deletes (HTTP 404 counts as
  * success, reference `src/mm_calls.py:317-320`), failed cancels keep the
  * wager (`:321-322`), CANCEL_ALL clears the book (`:297`).
  *
  * Scale design: the book is hash-sharded on external_id into `nShards`
  * state partitions. Keyed commands route to their shard; the global
  * CANCEL_ALL is fanned out to every shard *before* the groupBy (an
  * explode, not a driver loop), so clearing is still a per-shard state
  * update. State per shard is a Map — at 1000 executors each shard holds
  * |book|/nShards entries, and nShards scales with the cluster.
  *
  * [[batchReplay]] is the batch-equivalent fold (used by the DuckDB oracle):
  * a wager survives iff its key's last effective command is a successful
  * PLACE newer than the last successful CANCEL_ALL.
  */
object WagerBook {

  final case class Command(tsn: Long, eventId: Long, externalId: String, op: String,
      http: Int, wagerId: String, stake: Double)
  final case class Wager(externalId: String, wagerId: String, tsn: Long, stake: Double)
  final case class ShardedCommand(shard: Int, cmd: Command)
  final case class BookSnapshot(shard: Int, externalId: String, wagerId: String, stake: Double)

  /** Deterministic command derivation from the driver's `events` table —
    * shared by the batch oracle query and the streaming tests. Timestamps
    * are µs (matching DuckDB's ns→µs coercion, so order-sensitive oracle
    * comparisons can't split on sub-µs ties). */
  def commandsFromEvents(events: DataFrame): DataFrame =
    events.select(
      graft.functions.TimeFns.nanosToMicros(col("ts")).as("tsn"),
      col("event_id"),
      concat(lit("w"), pmod(col("user_id"), lit(50))).as("external_id"),
      when(col("event_type") === "purchase", "PLACE")
        .when(col("event_type") === "error", "CANCEL")
        .when(col("event_type") === "signup" && pmod(col("event_id"), lit(211)) === 0,
          "CANCEL_ALL")
        .otherwise("NOOP").as("op"),
      when(pmod(col("event_id"), lit(20)) === 0, 404)
        .when(pmod(col("event_id"), lit(20)) === 1, 500)
        .otherwise(200).as("http"),
      concat(lit("srv"), col("event_id")).as("wager_id"),
      round(col("value"), 2).as("stake"))

  /** Batch fold of the command log → final book (deterministic). */
  def batchReplay(commands: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val effective = commands.where(
      (col("op") === "PLACE" && col("http") === 200) ||
      (col("op") === "CANCEL" && col("http").isin(200, 404)))
    val lastPerKey = effective
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("external_id"))
          .orderBy(col("tsn").desc, col("event_id").desc)))
      .where(col("rn") === 1)
    // Tie-break CANCEL_ALL on (tsn, event_id) — the same total order the
    // streaming legs sort commands by — so a PLACE sharing the cancel-all's
    // µs timestamp survives iff its event_id is higher, in batch and stream
    // alike (µs coercion makes equal-tsn commands plausible).
    val lastCancelAll = commands
      .where(col("op") === "CANCEL_ALL" && col("http") === 200)
      .agg(max(struct(col("tsn"), col("event_id"))).as("ca"))
      .select(coalesce(col("ca.tsn"), lit(Long.MinValue)).as("ca_tsn"),
        coalesce(col("ca.event_id"), lit(Long.MinValue)).as("ca_eid"))
    // lastCancelAll is a GLOBAL aggregate (no grouping key): exactly one
    // row always — the coalesce defaults fill it when no CANCEL_ALL exists
    // — so this crossJoin is a 1-row broadcast annotation, never a product.
    lastPerKey.crossJoin(broadcast(lastCancelAll))
      .where(col("op") === "PLACE" &&
        (col("tsn") > col("ca_tsn") ||
          (col("tsn") === col("ca_tsn") && col("event_id") > col("ca_eid"))))
      .select(col("external_id"), col("wager_id"),
        col("stake").cast("double").as("stake"))
  }

  /** Apply one command to a shard's book (the T5/T6 transition function). */
  private[graft] def applyCommand(book: Map[String, Wager], c: Command): Map[String, Wager] =
    c.op match {
      case "PLACE" if c.http == 200 =>
        book + (c.externalId -> Wager(c.externalId, c.wagerId, c.tsn, c.stake))
      case "CANCEL" if c.http == 200 || c.http == 404 => // 404 ⇒ already gone: still delete
        book - c.externalId
      case "CANCEL_ALL" if c.http == 200 => Map.empty
      case _ => book // failed place/cancel, NOOP: keep state
    }

  def shardOf(externalId: String, nShards: Int): Int =
    math.floorMod(externalId.hashCode, nShards)

  private def sharded(spark: SparkSession, commands: Dataset[Command],
      nShards: Int): Dataset[ShardedCommand] = {
    import spark.implicits._
    commands.flatMap { c =>
      if (c.op == "CANCEL_ALL") (0 until nShards).map(s => ShardedCommand(s, c))
      else Seq(ShardedCommand(shardOf(c.externalId, nShards), c))
    }
  }

  /** Streaming book: sharded `flatMapGroupsWithState`, emitting the full
    * shard snapshot each update (Update mode).
    *
    * CONSUMER CONTRACT (review r12; applies equally to [[streamTws]] and
    * the bootstrapped/expiring variants): there are NO tombstones — a
    * canceled wager simply stops appearing in its shard's next snapshot.
    * A sink must therefore treat each micro-batch as the COMPLETE truth
    * for every shard key it contains (whole-shard replace), never upsert
    * by (shard, external_id): a per-wager upserter would retain canceled
    * wagers forever. The snapshot-per-shard emission is the whole point
    * (the reference also rewrites its full book each cadence); per-key
    * change events would need a diff against the previous state. */
  def stream(spark: SparkSession, commands: Dataset[Command], nShards: Int): DataFrame = {
    import spark.implicits._
    sharded(spark, commands, nShards)
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Map[String, Wager], BookSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, cmds: Iterator[ShardedCommand], state: GroupState[Map[String, Wager]]) =>
          val sorted = cmds.toSeq.sortBy(sc => (sc.cmd.tsn, sc.cmd.eventId))
          val book0 = state.getOption.getOrElse(Map.empty)
          val book = sorted.foldLeft(book0)((b, sc) => applyCommand(b, sc.cmd))
          state.update(book)
          book.valuesIterator.map(w => BookSnapshot(shard, w.externalId, w.wagerId, w.stake))
      }
      .toDF()
  }

  /** The same book on Spark 4's `transformWithState` API with per-wager
    * `MapState` — the modern scale shape: point inserts/deletes against the
    * (RocksDB-backed) store instead of rewriting a whole map value per
    * batch; CANCEL_ALL is the one whole-shard `clear()`. Requires the
    * RocksDB state-store provider. Semantics identical to [[stream]]. */
  /** The ONE MapState transition kernel every transformWithState
    * processor applies (review r12 — the case-match existed in three
    * copies; the batch/stream equivalence specs guard drift, but one
    * kernel removes the possibility). Mirrors [[applyCommand]]'s rules
    * exactly: PLACE upserts on 200, CANCEL removes on 200 OR 404 (the
    * idempotent-delete rule), CANCEL_ALL clears on 200, everything else
    * is a no-op. `onPlace` hooks the expiring processor's timer
    * registration. */
  private def applyToMapState(book: MapState[String, Wager], c: Command,
      onPlace: Command => Unit = _ => ()): Unit =
    c.op match {
      case "PLACE" if c.http == 200 =>
        book.updateValue(c.externalId, Wager(c.externalId, c.wagerId, c.tsn, c.stake))
        onPlace(c)
      case "CANCEL" if c.http == 200 || c.http == 404 =>
        book.removeKey(c.externalId)
      case "CANCEL_ALL" if c.http == 200 => book.clear()
      case _ => ()
    }

  class Processor extends StatefulProcessor[Int, ShardedCommand, BookSnapshot] {
    @transient private var book: MapState[String, Wager] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      book = getHandle.getMapState[String, Wager](
        "book", Encoders.STRING, ExpressionEncoder[Wager](), TTLConfig.NONE)
    override def handleInputRows(shard: Int, rows: Iterator[ShardedCommand],
        timers: TimerValues): Iterator[BookSnapshot] = {
      rows.toSeq.sortBy(sc => (sc.cmd.tsn, sc.cmd.eventId))
        .foreach(sc => applyToMapState(book, sc.cmd))
      book.values().map(w => BookSnapshot(shard, w.externalId, w.wagerId, w.stake))
    }
  }

  /** [[stream]] on the `transformWithState` engine. */
  def streamTws(spark: SparkSession, commands: Dataset[Command], nShards: Int): DataFrame = {
    import spark.implicits._
    sharded(spark, commands, nShards)
      .groupByKey(_.shard)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** [[Processor]] bootstrapped from a BATCH snapshot: the book restarts
    * from yesterday's [[batchReplay]] output instead of replaying the full
    * command history — the state-migration/upgrade path every long-lived
    * 100 TB streaming job eventually needs (`handleInitialState` receives
    * each snapshot row once, before any input batch). */
  class BootstrappedProcessor
      extends StatefulProcessorWithInitialState[Int, ShardedCommand, BookSnapshot, BookSnapshot] {
    @transient private var book: MapState[String, Wager] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      book = getHandle.getMapState[String, Wager](
        "book", Encoders.STRING, ExpressionEncoder[Wager](), TTLConfig.NONE)
    override def handleInitialState(shard: Int, row: BookSnapshot,
        timers: TimerValues): Unit =
      book.updateValue(row.externalId, Wager(row.externalId, row.wagerId, 0L, row.stake))
    override def handleInputRows(shard: Int, rows: Iterator[ShardedCommand],
        timers: TimerValues): Iterator[BookSnapshot] = {
      rows.toSeq.sortBy(sc => (sc.cmd.tsn, sc.cmd.eventId))
        .foreach(sc => applyToMapState(book, sc.cmd))
      book.values().map(w => BookSnapshot(shard, w.externalId, w.wagerId, w.stake))
    }
  }

  /** [[streamTws]] with the book pre-loaded from a batch snapshot
    * (sharded the same way the live commands are). */
  def streamTwsBootstrapped(spark: SparkSession, commands: Dataset[Command],
      snapshot: DataFrame, nShards: Int): DataFrame = {
    import spark.implicits._
    val initState = snapshot
      .select(col("external_id"), col("wager_id"), col("stake"))
      .as[(String, String, Double)]
      .map { case (ext, wid, stake) =>
        BookSnapshot(shardOf(ext, nShards), ext, wid, stake) }
      .groupByKey(_.shard)
    sharded(spark, commands, nShards)
      .groupByKey(_.shard)
      .transformWithState(new BootstrappedProcessor, TimeMode.None(),
        OutputMode.Update(), initState)
      .toDF()
  }

  final case class TimedCommand(shard: Int, cmd: Command, eventTime: java.sql.Timestamp)
  final case class BookEvent(shard: Int, externalId: String, wagerId: String,
      stake: Double, kind: String) // kind: "live" | "expired"

  /** [[Processor]] plus EVENT-TIME TIMERS: every successful PLACE arms a
    * timer at `place time + ttl`; when the watermark passes it, the shard
    * sweeps out wagers older than the TTL and emits them as `expired`
    * events. This is the reference's scheduled auto-cancel cadence
    * (`src/mm_calls.py:385-389`) re-expressed in the engine's time domain:
    * driver-side wall-clock jobs become per-key timers that replay
    * deterministically and survive restarts with the state store. */
  class ExpiringProcessor(ttlMs: Long) extends StatefulProcessor[Int, TimedCommand, BookEvent] {
    @transient private var book: MapState[String, Wager] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      book = getHandle.getMapState[String, Wager](
        "book", Encoders.STRING, ExpressionEncoder[Wager](), TTLConfig.NONE)
    override def handleInputRows(shard: Int, rows: Iterator[TimedCommand],
        timers: TimerValues): Iterator[BookEvent] = {
      rows.toSeq.sortBy(tc => (tc.cmd.tsn, tc.cmd.eventId))
        .foreach(tc => applyToMapState(book, tc.cmd,
          onPlace = c => getHandle.registerTimer(c.tsn / 1000 + ttlMs)))
      book.values().map(w => BookEvent(shard, w.externalId, w.wagerId, w.stake, "live"))
    }
    override def handleExpiredTimer(shard: Int, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[BookEvent] = {
      // Compare in the SAME ms-truncated domain the timer was registered in
      // (tsn/1000 + ttl): converting the cutoff back to µs would exclude any
      // wager whose tsn is not a whole millisecond, leaving it in state
      // forever once its (only) timer has fired.
      val cutoffMs = expired.getExpiryTimeInMs() - ttlMs
      val dead = book.iterator().filter(_._2.tsn / 1000 <= cutoffMs).toSeq
      dead.foreach { case (k, _) => book.removeKey(k) }
      dead.iterator.map { case (_, w) =>
        BookEvent(shard, w.externalId, w.wagerId, w.stake, "expired") }
    }
  }

  /** The auto-expiring book: commands carry event time, the watermark
    * drives expiry. `delay` is the watermark lateness bound. */
  def streamTwsExpiring(spark: SparkSession, commands: Dataset[Command],
      nShards: Int, ttlMs: Long, delay: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    sharded(spark, commands, nShards)
      .select(col("shard"), col("cmd"), timestamp_micros(col("cmd.tsn")).as("eventTime"))
      .withWatermark("eventTime", delay)
      .as[TimedCommand]
      .groupByKey(_.shard)
      .transformWithState(new ExpiringProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Update())
      .toDF()
  }
}
