package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink leg of the reference pipeline (SURVEY.md §2.2 K1–K6), modeled as
  * Structured Streaming writers. The reference's outbound HTTP calls
  * (Sheets append, wager place/cancel POSTs) are auth plumbing, not query
  * semantics (SURVEY.md §7 non-goals) — here each becomes a `foreachBatch`
  * batching boundary with a pluggable transport, parquet in tests.
  *
  * `foreachBatch` is the right Spark shape for all of them because the
  * reference batches its writes too: the sheet appends whole extracts
  * (`src/main.py:23-37`), wagers post 3 per request (`src/mm_calls.py:264`),
  * batch cancels 4 (`src/mm_calls.py:333`). Micro-batch = request batch.
  */
object Sinks {

  /** K1 — append-mode sink (the Sheets stand-in): every micro-batch appends
    * atomically; errors are logged and swallowed like the reference's
    * `except → log` (`src/main.py:34-37`). RECOVERY CAVEAT (review r12):
    * the swallow makes a failed batch's rows UNRECOVERABLE — the
    * checkpoint advances past them, and unlike the reference (whose next
    * cadence re-extracts the FULL current state, self-healing the lost
    * tick) a row-stream source never re-offers them. Pipelines that
    * cannot afford the loss use [[idempotentAppendSink]], whose writer
    * RETHROWS so Spark retries the batch from the checkpoint. */
  def appendSink(stream: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        try batch.write.mode("append").parquet(path)
        catch { case e: Exception =>
          org.apache.log4j.Logger.getLogger(getClass).error(s"append batch $batchId failed", e)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** K2/K3 — place-wager sink: groups each micro-batch into request-sized
    * chunks (batch_n = 3, `src/mm_calls.py:264`) and hands them to the
    * transport. Runs on executors, one transport per partition.
    *
    * DELIVERY CONTRACT (review r12): foreachBatch is AT-LEAST-ONCE — a
    * crash after `transport` succeeds but before the batch commits
    * replays the whole batch, and a retried task replays its partition.
    * This plain form matches the reference's fire-and-forget POST
    * (`src/mm_calls.py:256-264`, no idempotency key there either); a
    * transport that must not double-place uses [[placeWagerSinkKeyed]],
    * which hands over a deterministic idempotency key per chunk. */
  def placeWagerSink(commands: DataFrame, checkpoint: String,
      transport: Seq[Row] => Unit, batchN: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    placeWagerSinkKeyed(commands, checkpoint,
      (_: String, rows: Seq[Row]) => transport(rows), batchN, trigger)

  /** [[placeWagerSink]] with a DETERMINISTIC per-chunk idempotency key
    * `"<batchId>:<partitionId>:<chunkIdx>"`, so a transport that records
    * sent keys — or forwards the key as the downstream request id —
    * upgrades wager placement to effective exactly-once, the wager-side
    * analogue of [[idempotentAppendSink]].
    *
    * For the key to name the SAME row set on every replay, both the
    * partition contents and the in-partition order must be replay-stable.
    * Contents are (checkpoint replays the same data through the same
    * partitioner), but in-partition ORDER is not — shuffle block fetch
    * order is nondeterministic across retries, so a positional key over
    * raw iterator order could both drop never-sent wagers and
    * double-place others (ADVICE r12). Hence each partition is sorted on
    * `orderBy` (default: every column — content-deterministic with no
    * schema assumption; callers with a natural key, e.g. `tsn`, can
    * narrow it) before chunking. The sort is per-partition
    * (`sortWithinPartitions`) — no shuffle. */
  def placeWagerSinkKeyed(commands: DataFrame, checkpoint: String,
      transport: (String, Seq[Row]) => Unit, batchN: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      orderBy: Seq[String] = Nil): StreamingQuery =
    commands.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // default sort key = every ORDERABLE column: map-typed columns
        // cannot be sort expressions and would fail the whole stream at
        // the first batch (review r13). A schema with NO orderable
        // columns degrades to unsorted chunking — callers needing the
        // exactly-once upgrade there must pass an explicit orderBy over
        // a derivable key.
        val cols =
          if (orderBy.nonEmpty) orderBy
          else batch.schema.fields.filter(f =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType)).map(_.name).toSeq
        val sorted =
          if (cols.isEmpty) batch
          else batch.sortWithinPartitions(
            cols.map(org.apache.spark.sql.functions.col): _*)
        sorted
          .foreachPartition { rows: Iterator[Row] =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            rows.grouped(batchN).zipWithIndex.foreach { case (chunk, i) =>
              transport(s"$batchId:$pid:$i", chunk)
            }
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Exactly-once variant of the append sink: each micro-batch lands in a
    * `batch_id=<id>` directory with overwrite. foreachBatch's delivery
    * contract is at-least-once — after a failure the SAME batch id is
    * replayed — so an idempotent writer (replay overwrites identical data
    * rather than appending a duplicate) is what upgrades the pipeline to
    * effective exactly-once. Readers see one atomic directory per batch;
    * `spark.read.parquet(path)` unions them. */
  def idempotentAppendSink(stream: DataFrame, path: String,
      checkpoint: String, outputMode: String = "append",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(outputMode) // "update" when the stream is a stateful book
      .foreachBatch(idempotentBatchWriter(path))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The writer itself, factored out so batch replay is directly testable:
    * writing the same (batch, batchId) twice leaves ONE copy. */
  private[graft] def idempotentBatchWriter(path: String): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Streaming dataset card at ingest: each micro-batch reduces to its
    * per-source card state (TextAnalysis.datasetCardState — #sources
    * rows of sums + HLL sketch + language histogram) written to
    * `statePath/batch_id=N` under the [[idempotentBatchWriter]] contract:
    * an at-least-once replay OVERWRITES the same directory, so a crash
    * between write and commit can never double-count a batch. The
    * publishable card is [[datasetCardRead]] — a merge over the batch
    * states; merge order never matters (every component is a monoid), so
    * the stream card equals the batch card on all scalar fields however
    * the stream was sliced. State stays per-batch (not folded in place)
    * because a fold-in-place update is NOT idempotent under replay. */
  def datasetCardSink(docs: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.TextAnalysis.datasetCardState(batch.toDF(), cache = false)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$statePath/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Derive the corpus-wide card from a [[datasetCardSink]] state dir. */
  def datasetCardRead(spark: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame =
    graft.operators.TextAnalysis.cardFromState(
      graft.operators.TextAnalysis.mergeCardStates(
        spark.read.parquet(statePath)
          .drop("batch_id"))) // partition-dir column, not state

  /** T7 — the reference's processing-time cadences as triggers
    * (`src/mm_calls.py:385-389`): place every 10 s, cancel every 9 s,
    * batch-cancel every 7 s. [[cadence]] builds the Trigger for the
    * sinks above (every builder takes a `trigger` parameter — review
    * r12: previously they hardcoded AvailableNow and the cadence helper
    * could not be composed with anything); withCadence applies it to a
    * caller-built writer. */
  def cadence(seconds: Int): Trigger =
    Trigger.ProcessingTime(s"$seconds seconds")

  def withCadence(w: DataStreamWriter[Row], seconds: Int): DataStreamWriter[Row] =
    w.trigger(cadence(seconds))
}
