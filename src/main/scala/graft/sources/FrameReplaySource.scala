package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
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
  *    ([[ReadLimit.maxRows]], honored inside composite limits too), so a
  *    deep backlog replays as many bounded batches instead of one giant
  *    catch-up batch.
  *  - **Trigger.AvailableNow**: the end offset is pinned at query start, so
  *    a drain run terminates even while the log keeps growing.
  *
  * Output schema: `frame_idx BIGINT, raw STRING` — `raw` feeds
  * [[graft.streaming.EventStreams.decodeFrames]] unchanged.
  *
  * Scale: slice boundaries are resolved to BYTE offsets on the driver via
  * an append-only line→byte anchor index (`byteOffsetsOf`), and each
  * reader seeks straight to its slice's byte start — N slices never
  * re-scan the file head, and B successive batches cost one cumulative
  * driver pass over the log (each boundary scan resumes from the greatest
  * anchor below it; an append-only log never invalidates an anchor).
  * Framing: a frame is a `\n`-TERMINATED byte segment (a trailing `\r` is
  * stripped for `\r\n` parity; a bare `\r` is CONTENT, not a terminator).
  * An unterminated tail is a frame still being appended — it is NOT
  * available until its `\n` lands, so a mid-append read can never emit a
  * truncated payload and skip the rest. All three counters —
  * `availableFrames`, the byte-anchor index, and the slice reader — share
  * that single definition, so offsets, line indexes, and payloads can
  * never disagree on what a frame is.
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

  // COMPLETE frames only: the count of '\n' bytes. An unterminated tail is
  // a frame mid-append — counting it would emit a truncated payload and
  // commit an offset past it, losing the rest forever; it becomes
  // available when its terminator lands. Deliberately NOT Files.lines
  // (which splits on bare '\r' and counts partial tails) — this must agree
  // byte-for-byte with the anchor index and the slice reader. Incremental:
  // resumes from the furthest line-start anchor and scans only the file's
  // growth since the last call, in 64 KiB chunks, caching the new furthest
  // line start — B batches over an append-only log cost one cumulative
  // pass, as the class doc promises.
  private def availableFrames(): Long = synchronized {
    val (aLine, aByte) = anchors.last // greatest known (line index, byte start)
    val in = new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path)), 1 << 16)
    try {
      in.skipNBytes(aByte)
      var lines = aLine
      var pos = aByte
      var lastLineStart = aByte
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') { lines += 1; lastLineStart = pos + i + 1 }
          i += 1
        }
        pos += n
        n = in.read(buf)
      }
      anchors(lines) = lastLineStart
      // A non-empty unterminated tail is normally a frame mid-append; on a
      // FINISHED file it means the final frame will never be delivered.
      // Surface it (once per tail position) instead of hiding the drop.
      if (pos > lastLineStart && lastWarnedTail != lastLineStart) {
        lastWarnedTail = lastLineStart
        org.slf4j.LoggerFactory.getLogger(classOf[FrameReplayStream]).warn(
          s"frame log $path has an unterminated ${pos - lastLineStart}-byte " +
            s"tail after frame $lines; it becomes available when its \\n lands")
      }
      lines
    } finally in.close()
  }
  @volatile private var lastWarnedTail: Long = -1L

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

  /** The row cap a limit imposes: a [[ReadMaxRows]] directly, the min over
    * a composite's [[ReadMaxRows]] parts, none otherwise (all-available /
    * min-rows limits put no upper bound on a batch). */
  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case m: ReadMaxRows => Some(m.maxRows().toLong)
    case c: CompositeReadLimit =>
      val maxes = c.getReadLimits.toSeq.flatMap(maxRowsOf)
      if (maxes.isEmpty) None else Some(maxes.min)
    case _ => None
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FrameOffset].index
    val avail = if (availableNowCap >= 0L) availableNowCap else availableFrames()
    val end = maxRowsOf(limit).map(m => math.min(avail, s + m)).getOrElse(avail)
    FrameOffset(math.max(s, end))
  }

  override def reportLatestOffset(): Offset = FrameOffset(availableFrames())

  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // Line-index → byte-offset anchors for every boundary resolved so far.
  // The log is append-only, so an anchor never invalidates; resolving a
  // new boundary scans only from the greatest anchor below it. Newlines
  // are counted as raw 0x0A bytes — exact under UTF-8 (a continuation
  // byte can never be 0x0A).
  private val anchors = scala.collection.mutable.TreeMap[Long, Long](0L -> 0L)

  /** Byte offsets of the given ascending line indexes (cached, one
    * incremental scan). Synchronized: planInputPartitions is driver-side. */
  private def byteOffsetsOf(lines: Seq[Long]): Map[Long, Long] = synchronized {
    val out = scala.collection.mutable.Map.empty[Long, Long]
    lines.sorted.foreach { target =>
      val cached = anchors.get(target)
      out(target) = cached.getOrElse {
        val (aLine, aByte) = anchors.rangeTo(target).last
        val in = new java.io.BufferedInputStream(
          Files.newInputStream(Paths.get(path)), 1 << 16)
        try {
          in.skipNBytes(aByte)
          var l = aLine
          var b = aByte
          var c = in.read()
          while (l < target && c >= 0) {
            b += 1
            if (c == '\n') l += 1
            c = in.read()
          }
          require(l == target,
            s"frame log truncated: line $target unreachable (EOF at byte $b)")
          anchors(target) = b
          b
        } finally in.close()
      }
    }
    out.toMap
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].index
    val e = end.asInstanceOf[FrameOffset].index
    val total = e - s
    val n = math.max(1L, math.min(numSlices.toLong, total)).toInt
    val bounds = (0 until n).map(i => s + i * total / n).distinct
    val offs = byteOffsetsOf(bounds)
    (0 until n).flatMap { i =>
      val from = s + i * total / n
      val to = s + (i + 1) * total / n
      if (to > from) Some(FrameSlice(path, from, to, offs(from))) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameSliceReaderFactory
}

private case class FrameSlice(path: String, from: Long, to: Long, byteStart: Long)
  extends InputPartition

private class FrameSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val slice = partition.asInstanceOf[FrameSlice]
      // Seek straight to the slice's byte start — no head re-scan.
      private val channel = java.nio.channels.FileChannel.open(
        Paths.get(slice.path), java.nio.file.StandardOpenOption.READ)
      channel.position(slice.byteStart)
      private val in = new java.io.BufferedInputStream(
        java.nio.channels.Channels.newInputStream(channel), 1 << 16)
      private var idx = slice.from - 1
      private var current: String = _

      // Strict '\n'-delimited frame read (NOT BufferedReader.readLine,
      // which would also split on a bare '\r' the byte-anchor index counts
      // as content): bytes up to '\n' or EOF, trailing '\r' stripped ONLY
      // when a '\n' terminated the frame ('\r\n' parity — an EOF-adjacent
      // '\r' is content), null at EOF with nothing buffered. (Offsets only
      // ever cover '\n'-terminated frames, so the EOF branch is defensive.)
      private def readFrame(): String = {
        val buf = new java.io.ByteArrayOutputStream(256)
        var c = in.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
        val bytes = buf.toByteArray
        val len = if (c == '\n' && bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
          bytes.length - 1 else bytes.length
        new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
      }

      override def next(): Boolean = {
        if (idx + 1 >= slice.to) false
        else {
          current = readFrame()
          // EOF before the slice's end offset means the log was truncated or
          // rewritten out of the append-only contract. The batch's end
          // offset will still be committed, so ending the partition quietly
          // would LOSE frames [idx+1, to) forever — fail loudly instead,
          // matching the driver-side byteOffsetsOf require.
          if (current == null) throw new IllegalStateException(
            s"frame log truncated: EOF at frame ${idx + 1}, expected " +
              s"${slice.to} (${slice.path})")
          idx += 1; true
        }
      }
      override def get(): InternalRow =
        InternalRow(idx, UTF8String.fromString(current))
      override def close(): Unit = in.close()
    }
}
