package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Dev measurement (VERDICT r13 #7): what MMR diversification costs PER
  * MICRO-BATCH when it serves streaming RAG — mmrDiversify runs k−1
  * tiny jobs over a persisted |queries|·candN candidate frame, and the
  * question is whether that job-scheduling overhead is viable at
  * micro-batch cadence. Query batches arrive on a MemoryStream; each
  * foreachBatch joins the batch's candidates against the STORED vector
  * table (the embeddings parquet — never rescanned per query) and runs
  * mmrDiversify(k=5, candN=20). Prints per-batch wall seconds.
  * `runMain graft.ProfileMmrStream [sfDir]`. */
object ProfileMmrStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxId = vecs.agg(max(col("doc_id"))).head().getLong(0)
    // 3 batches × 30 queries × 20 ranked candidates (deterministic ids)
    def batchRows(b: Int): Seq[(String, Long, Int)] =
      for (q <- 0 until 30; r <- 1 to 20)
        yield (s"b${b}q$q", (b * 997L + q * 31L + r * 7L) % (maxId + 1), r)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Int)]
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val sink = input.toDS().toDF("query_id", "doc_id", "rnk").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val t0 = System.nanoTime()
        val n = Retrieval.mmrDiversify(batch, vecs, k = 5, candN = 20).count()
        val sec = (System.nanoTime() - t0) / 1e9
        times += sec
        println(f"[mmr-stream] batch: ${batch.count()} cand rows -> $n mmr rows in $sec%.2fs")
        ()
      }.start()
    try {
      for (b <- 0 until 3) {
        input.addData(batchRows(b): _*)
        sink.processAllAvailable()
      }
    } finally sink.stop()
    println(f"[mmr-stream] per-batch min=${times.min}%.2fs max=${times.max}%.2fs " +
      f"(k=5 -> 4 sequential pick jobs + 1 persist per batch)")

    // the driver-local twin (bounded-candidate collect + in-memory
    // greedy, bit-identical results) on the same batches — the
    // sub-second serving path
    val timesL = scala.collection.mutable.ArrayBuffer.empty[Double]
    val inputL = MemoryStream[(String, Long, Int)]
    val sinkL = inputL.toDS().toDF("query_id", "doc_id", "rnk").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val t0 = System.nanoTime()
        val n = Retrieval.mmrDiversifyLocal(batch, vecs, k = 5, candN = 20).count()
        val sec = (System.nanoTime() - t0) / 1e9
        timesL += sec
        println(f"[mmr-stream] LOCAL batch -> $n mmr rows in $sec%.2fs")
        ()
      }.start()
    try {
      for (b <- 0 until 3) {
        inputL.addData(batchRows(b): _*)
        sinkL.processAllAvailable()
      }
    } finally sinkL.stop()
    println(f"[mmr-stream] LOCAL per-batch min=${timesL.min}%.2fs " +
      f"max=${timesL.max}%.2fs (one collect of <=600 rows + driver greedy)")
    vecs.unpersist(false)
    spark.stop()
  }
}
