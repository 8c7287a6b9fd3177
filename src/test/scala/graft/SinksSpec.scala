package graft

import graft.streaming.Sinks
import graft.streaming.WagerBook.Command
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, map}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SinksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("K1 append sink: micro-batches append to parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sink").toString
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "a"), (2L, "b"))
    val q = Sinks.appendSink(input.toDF().toDF("id", "v"), s"$dir/out", s"$dir/cp")
    q.awaitTermination()
    input.addData((3L, "c"))
    val q2 = Sinks.appendSink(input.toDF().toDF("id", "v"), s"$dir/out", s"$dir/cp")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == 3) // append, not overwrite
  }

  test("idempotent sink: replaying a batch id leaves exactly one copy") {
    val dir = java.nio.file.Files.createTempDirectory("idemsink").toString
    val writer = Sinks.idempotentBatchWriter(s"$dir/out")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    writer(batch, 7L)
    writer(batch, 7L) // at-least-once replay of the SAME batch id
    writer(Seq((3L, "c")).toDF("id", "v"), 8L)
    val rows = spark.read.parquet(s"$dir/out")
    assert(rows.count() == 3, "replay must overwrite, not duplicate")
    assert(rows.select("batch_id").distinct().count() == 2)
  }

  test("K2/K3 place sink: transport receives request-sized chunks") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sink").toString
    val input = MemoryStream[Command]
    input.addData((1 to 7).map(i =>
      Command(i.toLong, i.toLong, s"w$i", "PLACE", 200, s"srv$i", 1.0)): _*)
    Sizes.clear()
    val q = Sinks.placeWagerSink(input.toDF(), s"$dir/cp",
      rows => Sizes.add(rows.size), batchN = 3)
    q.awaitTermination()
    assert(Sizes.get.sum == 7)
    assert(Sizes.get.forall(_ <= 3)) // batch_n = 3 per request (mm_calls.py:264)
  }

  test("keyed wager sink: deterministic <batchId>:<pid>:<chunk> keys, " +
      "chunks within batchN, and a map-typed column does not kill the " +
      "stream (orderable-only default sort — review r13)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sink-keyed").toString
    val input = MemoryStream[(Long, String)]
    input.addData((1 to 7).map(i => (i.toLong, s"w$i")): _*)
    KeyedRows.clear()
    // map column exercises the non-orderable-type path: the default
    // sort key must silently exclude it instead of throwing
    // AnalysisException at the first micro-batch
    val df = input.toDF().toDF("tsn", "wager_id")
      .withColumn("params", map(lit("k"), col("wager_id")))
    val q = Sinks.placeWagerSinkKeyed(df, s"$dir/cp",
      (key, rows) => KeyedRows.add(key, rows.size), batchN = 3)
    q.awaitTermination()
    val got = KeyedRows.get
    assert(got.map(_._2).sum == 7)
    assert(got.map(_._2).forall(_ <= 3))
    assert(got.map(_._1).forall(_.matches("\\d+:\\d+:\\d+")),
      s"key format: ${got.map(_._1)}")
    assert(got.map(_._1).distinct.size == got.size, "keys must be unique")
  }
}

/** Keyed-transport accumulator (the [[Sizes]] pattern). */
object KeyedRows {
  private val q =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
  def add(key: String, n: Int): Unit = q.add((key, n))
  def get: Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._; q.asScala.toSeq
  }
  def clear(): Unit = q.clear()
}

/** Cross-JVM-safe accumulator for the local[?] test (executors share the
  * driver JVM in local mode, so a static is visible). */
object Sizes {
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def add(n: Int): Unit = sizes.add(n)
  def get: Seq[Int] = { import scala.jdk.CollectionConverters._; sizes.asScala.toSeq }
  def clear(): Unit = sizes.clear()
}
