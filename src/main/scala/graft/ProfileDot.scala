package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness backing the DotProductD claim: HOF `aggregate(zip_with)`
  * fold (CodegenFallback, per-row intermediate array) vs the native
  * codegen expression, on a synthetic corpus large enough that the dot is
  * the bottleneck rather than the rank window (500k rows × 64 dims). */
object ProfileDot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dot] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // deterministic 64-dim vectors from the row id
    val vecs = spark.range(500000).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * (i + 7), lit(1000)).cast("double") - 500.0) / 500.0)
        .as("v"))
      .select(col("id"), col("v"), col("v").as("w"))
    vecs.cache().count()
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    (1 to 2).foreach { i =>
      time(s"HOF fold dot $i") {
        vecs.select(sum(hofDot(col("v"), col("w")))).head()
      }
      time(s"native DotProductD $i") {
        vecs.select(sum(graft.functions.SimFns.dot(col("v"), col("w")))).head()
      }
    }
    spark.stop()
  }
}
