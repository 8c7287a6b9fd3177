package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Ordered funnel analysis over an event stream (the standard product
  * analytics primitive; cf. the events table in TESTDATA.md and the
  * reference's event-replay surface, /root/reference/src/main.py:1).
  *
  * Semantics (strict-order funnel): per user, step i is completed at the
  * EARLIEST event of its type that occurs strictly after the completion
  * time of step i-1. Same-instant events never advance two steps — the
  * strict `>` matches the cascaded min-join formulation the oracle uses.
  *
  * Plan at scale: the step-type IN-filter pushes into the parquet scan,
  * then ONE shuffle (groupBy user) collects each user's filtered events;
  * the sequential state walk is a sorted higher-order fold entirely inside
  * the aggregate — no self-join per step (a k-step cascade would be k
  * shuffle-joins over the full event table). Memory per user is bounded by
  * that user's FILTERED event count — the standard funnel contract; cap
  * upstream if a bot user could exceed executor memory.
  */
object Funnel {

  /** Per-user funnel times: one row per user having at least one
    * step-typed event, with `t_<step>` completion columns
    * (null = step not reached; unit = whatever `tsCol` carries) and
    * `steps_completed`. `steps` must be distinct event types; `tsCol` is
    * an epoch long column. */
  def userFunnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct, got $steps")
    val stepArr = array(steps.map(lit): _*)
    val perUser = events
      .where(col(typeCol).isin(steps.map(x => x: Any): _*))
      .select(col(userCol), col(tsCol).as("ts"), col(typeCol).as("et"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("ts"), col("et")))).as("evs"))
    val init = array_repeat(lit(null).cast("long"), steps.length)
    val walk = aggregate(col("evs"), init, (st: Column, e: Column) => {
      val ts = e.getField("ts")
      val et = e.getField("et")
      transform(st, (x: Column, i: Column) => {
        val prev = get(st, i - 1) // null-safe: i=0 reads index -1 => null
        val ready = (i === 0) || (prev.isNotNull && ts > prev)
        when(x.isNotNull, x)
          .when(et === get(stepArr, i) && ready, ts)
          .otherwise(lit(null).cast("long"))
      })
    })
    val staged = perUser.select(col(userCol), walk.as("st"))
    val stepCols = steps.zipWithIndex.map { case (s, i) =>
      get(col("st"), lit(i)).as(s"t_$s")
    }
    staged.select(
      (col(userCol) +: stepCols :+
        size(filter(col("st"), _.isNotNull)).as("steps_completed")): _*)
  }

  /** Input / output records for the streaming funnel. `times` uses −1 as
    * the not-reached sentinel (state-store encoders want a flat array). */
  final case class StepEvent(userId: Long, ts: Long, eventType: String)
  final case class FunnelUpdate(userId: Long, stepsCompleted: Int,
      times: Array[Long])

  /** At-ingest funnel state on Spark 4 `transformWithState`: per user, a
    * ValueState holding the step-completion times; each micro-batch sorts
    * its rows by (ts, type) and advances the walk with the SAME per-slot
    * pre-state rule as the batch fold in [[userFunnel]], emitting an update
    * only when a user's state changed.
    *
    * Contract: the walk is forward-only ACROSS micro-batches — an event
    * arriving in a later batch with an older timestamp can still complete
    * its own step (it only needs to be after the previous step), but it can
    * never IMPROVE an already-recorded completion to an earlier time the
    * way a batch recomputation would. On a feed that is ts-ordered across
    * batches (any log-replay source) streaming == batch exactly; under
    * cross-batch disorder streaming times are upper bounds. */
  class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, StepEvent, FunnelUpdate] {
    @transient private var st: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Long]](
        "funnel", ExpressionEncoder[Array[Long]](), TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[StepEvent],
        timers: TimerValues): Iterator[FunnelUpdate] = {
      val cur = Option(st.get()).getOrElse(Array.fill(steps.length)(-1L))
      val next = cur.clone()
      rows.toSeq.sortBy(e => (e.ts, e.eventType)).foreach { e =>
        val pre = next.clone() // per-slot conditions read PRE-event state
        var i = 0
        while (i < steps.length) {
          if (pre(i) < 0 && steps(i) == e.eventType &&
              (i == 0 || (pre(i - 1) >= 0 && e.ts > pre(i - 1))))
            next(i) = e.ts
          i += 1
        }
      }
      if (java.util.Arrays.equals(next, cur)) Iterator.empty
      else {
        st.update(next)
        Iterator.single(
          FunnelUpdate(userId, next.count(_ >= 0), next))
      }
    }
  }

  /** [[userFunnel]] at ingest: same step semantics, state kept per user in
    * the (RocksDB-backed) store, updates emitted as users advance. */
  def streamingUserFunnel(spark: SparkSession, events: Dataset[StepEvent],
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct, got $steps")
    import spark.implicits._
    val stepSet = steps.toSet
    events.filter(e => stepSet.contains(e.eventType))
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(steps), TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }

  /** Cohort retention matrix: cohort = the period (floor of `tsCol` /
    * `periodTicks`) of a user's FIRST event; a user is retained at offset
    * k if they have any event in period cohort+k. Output one row per
    * (cohort_period, period_offset) with the retained-user count.
    *
    * Plan at scale: project to (user, period), distinct (map-side partial
    * dedup shrinks the shuffle to |user×periods|), one hash aggregate for
    * the per-user min period, then an equi-join back on user (both sides
    * already hash-partitioned on user — no extra exchange under AQE reuse)
    * and a final small aggregate. No windows, no collect. Nested-floor
    * identity: floor(floor(x/a)/b) = floor(x/(ab)), so the period is
    * identical whether the clock is nanos or a coarser truncation of it —
    * the oracle can run at µs precision and still agree exactly. */
  def retention(events: DataFrame, periodTicks: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(periodTicks > 0, s"need periodTicks > 0, got $periodTicks")
    val perPeriod = events
      .select(col(userCol).as("u"),
        // integer div, NOT floor(x / y): epoch-nanos exceed 2^53 and a
        // double division would lose the low bits (SURVEY.md §5.1 rule).
        expr(s"`$tsCol` div ${periodTicks}L").as("period"))
      .distinct()
    val cohorts = perPeriod.groupBy(col("u")).agg(min(col("period")).as("cohort"))
    perPeriod.join(cohorts, "u")
      .groupBy(col("cohort").as("cohort_period"),
        (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gap-based sessionization: assign every event a per-user `session_seq`
    * (1-based), starting a new session when the gap since the previous
    * event is ≥ `gapTicks` — the same break rule as Spark's native
    * `session_window` (half-open windows), but EXPOSED as a per-event id
    * column so downstream joins/aggregates can key on (user, session).
    * One shuffle: both windows (lag + running sum) share the (user, ts)
    * sort. Ties on ts break on `idCol` for a total order. */
  def sessionize(events: DataFrame, gapTicks: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(gapTicks > 0, s"need gapTicks > 0, got $gapTicks")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull || col(tsCol) - prev >= gapTicks, 1L)
      .otherwise(0L)
    events.withColumn("session_seq",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Top-N most frequent length-`pathLen` event-type sequences across all
    * users — the "what do users actually do" path report next to the
    * funnel's "do they do THIS". Per user: ONE shuffle collects and sorts
    * the events ((ts, id) total order), the sliding windows are a pure
    * array expression over the sorted types, and the global top-N is a
    * count + TakeOrderedAndProject. The oracle derives the same report as
    * a (pathLen−1)-step self-join cascade on row_number — two independent
    * algorithms that must agree (the funnel-vs-cascade pattern).
    *
    * Memory per user is bounded by that user's event count (the
    * [[userFunnel]] contract — cap upstream for bot users); `tsCol` must
    * carry the SAME clock the oracle orders by (µs — pass `ts div 1000`,
    * see the t_session_windows lesson in NOTES.md). Events with a null
    * type or timestamp are EXCLUDED up front: `concat_ws` would silently
    * skip a null segment (colliding 'a>null>c' with a real 'a>c') and
    * null order keys sort differently across engines — dropping them is
    * the only cross-engine-stable semantics.
    *
    * RESERVED CHARACTER: `>` is the path delimiter, so an event type
    * containing `>` is ambiguous in the report (type "a>b" renders the
    * same as the sequence a,b). Both engines agree (the oracle joins with
    * the same delimiter) — the report is consistent, just not injective;
    * sanitize event types upstream if they can contain `>`. */
  def topPaths(events: DataFrame, pathLen: Int, topN: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(pathLen >= 2, s"need pathLen >= 2, got $pathLen")
    val seqs = events
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol)))).as("evs"))
      .select(transform(col("evs"), e => e.getField(typeCol)).as("types"))
    seqs
      .where(size(col("types")) >= pathLen)
      .select(explode(transform(
        sequence(lit(1), size(col("types")) - lit(pathLen - 1)),
        i => slice(col("types"), i, lit(pathLen)))).as("p"))
      .groupBy(concat_ws(">", col("p")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }

  /** Funnel summary: users reaching each stage (reaching stage i means
    * steps 1..i all completed) plus the conversion from the previous stage
    * in basis-point floors. Tiny output (|steps| rows) — one extra
    * aggregate over [[userFunnel]]. */
  def funnelSummary(events: DataFrame, steps: Seq[String]): DataFrame = {
    val f = userFunnel(events, steps)
    val reached = steps.indices.map { i =>
      sum(when(col("steps_completed") >= i + 1, 1L).otherwise(0L))
        .as(s"n_${steps(i)}")
    }
    val totals = f.agg(reached.head, reached.tail: _*)
    val stageCols = steps.zipWithIndex.map { case (s, i) =>
      val conv =
        if (i == 0) lit(10000L)
        // null, not NaN/error, when the previous stage is empty — keeps
        // the engines agreeing on degenerate funnels (DuckDB's integer
        // division would raise; Spark's double division would NaN).
        else when(col(s"n_${steps(i - 1)}") === 0, lit(null).cast("long"))
          .otherwise(floor(col(s"n_${steps(i)}") * lit(10000L)
            / col(s"n_${steps(i - 1)}")).cast("long"))
      struct(lit(i + 1).as("stage"), lit(s).as("step"),
        col(s"n_${steps(i)}").as("n_users"), conv.as("conv_bp"))
    }
    totals.select(explode(array(stageCols: _*)).as("r"))
      .select(col("r.stage"), col("r.step"), col("r.n_users"), col("r.conv_bp"))
  }
}
