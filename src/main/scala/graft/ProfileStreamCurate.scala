package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput/state measurement for the composed STREAMING curation
  * pipeline (the StreamingCurationSpec shape — gate → streaming exact
  * dedup → streaming near-dup filter → idempotent sink) over the real
  * sf documents corpus with the RocksDB state store — the configuration a
  * long-running 100 TB ingest leg would use (state off-heap, spillable,
  * restart-safe). Prints rows/s, micro-batch count, and per-operator state
  * rows/bytes from the query progress; results recorded in NOTES.md.
  *
  * The spec proves semantics (crash-restart, stream ≡ batch on a planted
  * corpus); this main measures the same plan at corpus scale. Dev-only.
  */
object ProfileStreamCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Changelog checkpointing (GRAFT_CHANGELOG_CKPT=1): per-batch uploads
    // become the delta since the last batch instead of a full SST snapshot
    // — at 100 TB the checkpoint traffic is proportional to CHANGED keys
    // per batch, not resident state. Snapshot mode stays the default so a
    // plain run matches the recorded NOTES baseline.
    val changelog = sys.env.get("GRAFT_CHANGELOG_CKPT").contains("1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    println(s"[profile] changelogCheckpointing=$changelog")
    spark.sparkContext.setLogLevel("WARN")

    // Stage the corpus as a multi-file parquet dir so the file stream
    // source delivers real micro-batches (2 files per trigger).
    val work = java.nio.file.Files.createTempDirectory("streamcurate-prof")
    val staged = work.resolve("staged").toString
    // Event times span HALF the 1-hour dedup horizon: files land in
    // mtime order (nondeterministic across runs), and any row older than
    // an already-advanced watermark would be dropped as late — correct
    // streaming semantics, but it would make the survivor count vary run
    // to run. Bounding the spread below the horizon keeps every row
    // on-time regardless of file order, so the numbers are reproducible.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        (lit(1700000000L) + pmod(col("doc_id"), lit(1800))).cast("timestamp").as("ts"))
    docs.repartition(16).write.mode("overwrite").parquet(staged)
    val nDocs = spark.read.parquet(staged).count()

    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(staged)
    val gated = Queries.curateGateFrom(stream, carry = Seq("ts"))
    val exactDeduped = operators.Dedup
      .streamingExactDedup(gated, "ts", "1 hour").drop("text_md5")
    val nearDeduped = operators.Dedup
      .streamingNearDupDedup(exactDeduped, "ts", "1 hour")
    val out = nearDeduped.select(col("doc_id"), col("n_tokens"), col("quality_bp"))

    val t0 = System.nanoTime()
    val q = streaming.Sinks.idempotentAppendSink(out,
      work.resolve("out").toString, work.resolve("ckpt").toString)
    require(q.awaitTermination(600000), "AvailableNow drain must terminate")
    val secs = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress
    val batches = progress.count(_.numInputRows > 0)
    val survivors = spark.read.parquet(work.resolve("out").toString).count()
    println(f"[profile] corpus=$nDocs%d docs, survivors=$survivors%d, " +
      f"wall=$secs%.1f s, rows/s=${nDocs / secs}%.0f, batches=$batches%d " +
      f"(of ${progress.length}%d progress events)")
    progress.lastOption.foreach { p =>
      p.stateOperators.zipWithIndex.foreach { case (so, i) =>
        import scala.jdk.CollectionConverters._
        val rocks = so.customMetrics.asScala.toSeq
          .filter { case (k, _) => k.contains("SstFileSize") || k.contains("MemoryUsage") ||
            k.contains("MemTable") }
          .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[profile] state[$i] ${so.operatorName}: rows=${so.numRowsTotal} " +
          s"memBytes=${so.memoryUsedBytes} $rocks")
      }
    }
    spark.stop()
  }
}
