package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: native plans.SumAbsDiffL vs the CodegenFallback
  * `aggregate(zip_with(...))` fold it replaced in the multimodal verify,
  * at the PRODUCTION shape (wide signatures — grid 8 ⇒ 64 longs — over
  * millions of candidate pairs), where the per-pair intermediate array
  * and interpreted lambdas dominate. Prints warm min-of-3 per variant. */
object ProfileSumAbsDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val pairs = spark.range(4000000).select(
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(col("id") * 31 + i * 7, lit(256L))).as("ba"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(col("id") * 17 + i * 13, lit(256L))).as("bb"))
      .localCheckpoint(true)
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val s = pairs.select(sum(c).as("s")).collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[sumabs] $name: $dt%.2f s (checksum $s)")
        dt
      }.min
      println(f"[sumabs] $name min: $secs%.2f s")
    }
    time("hof_fold", expr(
      "aggregate(zip_with(ba, bb, (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v)"))
    time("native", org.apache.spark.sql.graftbridge.GraftBridge.column(
      graft.plans.SumAbsDiffL(
        org.apache.spark.sql.graftbridge.GraftBridge.expression(col("ba")),
        org.apache.spark.sql.graftbridge.GraftBridge.expression(col("bb")))))
    spark.stop()
  }
}
