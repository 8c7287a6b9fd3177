package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
        else floor(col(s"n_${steps(i)}") * lit(10000L) / col(s"n_${steps(i - 1)}"))
          .cast("long")
      struct(lit(i + 1).as("stage"), lit(s).as("step"),
        col(s"n_${steps(i)}").as("n_users"), conv.as("conv_bp"))
    }
    totals.select(explode(array(stageCols: _*)).as("r"))
      .select(col("r.stage"), col("r.step"), col("r.n_users"), col("r.conv_bp"))
  }
}
