package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}
import java.util

/** DataSource V2 *streaming* connector for the push leg (SURVEY.md §2.1 S9):
  * offset-tracked replay of a frame log.
  *
  * The reference's push leg is a live Pusher websocket
  * (`src/mm_calls.py:143-208`): connect, (re)subscribe, receive raw JSON
  * frames. Its Spark re-expression is a micro-batch source whose offset is
  * "frames consumed so far" — here backed by a newline-delimited frame log
  * (`path`), the durable shape a websocket ingest lands first (a socket is
  * not replayable; a log of its frames is). The contract this source makes
  * first-class, and that `MemoryStream` fixture tests cannot exercise:
  *
  *  - **Offsets + restart**: the committed offset is the line index; a
  *    restarted query resumes from the checkpoint and never re-emits or
  *    skips a frame, including frames appended between runs.
  *  - **Admission control**: `maxFramesPerBatch` bounds each micro-batch
  *    ([[ReadLimit.maxRows]]), so a deep backlog replays as many bounded
  *    batches instead of one giant catch-up batch.
  *  - **Trigger.AvailableNow**: the end offset is pinned at query start, so
  *    a drain run terminates even while the log keeps growing.
  *
  * Output schema: `frame_idx BIGINT, raw STRING` — `raw` feeds
  * [[graft.streaming.EventStreams.decodeFrames]] unchanged.
  *
  * Scale note: line ranges are located by skipping from the file head —
  * fine for fixture replay and test logs; a production build over object
  * storage would keep a byte-offset index per block (the usual frame-log
  * layout) and slice on it, with identical offset semantics.
  */
class FrameReplaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameReplaySource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new FrameReplayTable
}

object FrameReplaySource {
  val Schema: StructType = StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("raw", StringType, nullable = false)))
  /** `spark.readStream.format(FrameReplaySource.Name)` */
  val Name: String = classOf[FrameReplaySource].getName
}

private class FrameReplayTable extends Table with SupportsRead {
  override def name(): String = "frame_replay"
  override def schema(): StructType = FrameReplaySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FrameReplayScan(options)
}

private class FrameReplayScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = FrameReplaySource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("FrameReplaySource requires option 'path'"))
    new FrameReplayStream(path,
      options.getInt("maxFramesPerBatch", 500),
      options.getInt("numSlices", 4))
  }
}

/** Offset = number of frames (lines) consumed from the head of the log. */
private case class FrameOffset(index: Long) extends Offset {
  override def json: String = index.toString
}

private class FrameReplayStream(path: String, maxPerBatch: Int, numSlices: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def availableFrames(): Long = {
    val s = Files.lines(Paths.get(path))
    try s.count() finally s.close()
  }

  // Pinned end offset for Trigger.AvailableNow: a drain run must terminate
  // even if the log grows while it drains.
  @volatile private var availableNowCap: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = availableFrames()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerBatch)

  override def initialOffset(): Offset = FrameOffset(0L)

  // With SupportsAdmissionControl the engine must call the 2-arg overload.
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FrameOffset].index
    val avail = if (availableNowCap >= 0L) availableNowCap else availableFrames()
    val end = limit match {
      case m: ReadMaxRows => math.min(avail, s + m.maxRows())
      case _ => avail
    }
    FrameOffset(math.max(s, end))
  }

  override def reportLatestOffset(): Offset = FrameOffset(availableFrames())

  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].index
    val e = end.asInstanceOf[FrameOffset].index
    val total = e - s
    val n = math.max(1L, math.min(numSlices.toLong, total)).toInt
    (0 until n).flatMap { i =>
      val from = s + i * total / n
      val to = s + (i + 1) * total / n
      if (to > from) Some(FrameSlice(path, from, to)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameSliceReaderFactory
}

private case class FrameSlice(path: String, from: Long, to: Long)
  extends InputPartition

private class FrameSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val slice = partition.asInstanceOf[FrameSlice]
      private val stream = Files.lines(Paths.get(slice.path))
      private val it = stream.skip(slice.from).limit(slice.to - slice.from).iterator()
      private var idx = slice.from - 1
      private var current: String = _
      override def next(): Boolean = {
        val has = it.hasNext
        if (has) { current = it.next(); idx += 1 }
        has
      }
      override def get(): InternalRow =
        InternalRow(idx, UTF8String.fromString(current))
      override def close(): Unit = stream.close()
    }
}
