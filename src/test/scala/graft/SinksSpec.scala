package graft

import graft.streaming.Sinks
import graft.streaming.WagerBook.Command
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}

/** Cross-JVM-safe accumulator for the local[?] test (executors share the
  * driver JVM in local mode, so a static is visible). */
object Sizes {
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def add(n: Int): Unit = sizes.add(n)
  def get: Seq[Int] = { import scala.jdk.CollectionConverters._; sizes.asScala.toSeq }
  def clear(): Unit = sizes.clear()
}
