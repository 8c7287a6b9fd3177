package graft

import graft.plans.TopKPlan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: window row_number vs the custom TopK operator at HIGH
  * rows-per-group (where map-side pruning pays) — lineitem keyed to ~100
  * groups ⇒ thousands of rows per group at sf0.1.
  * `runMain graft.ProfileTopK [reps]` */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def keyed = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_suppkey"), lit(100)).as("g"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def windowed = keyed
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .where(col("rank") <= 10)
    def custom = TopKPlan.topKPerGroup(keyed, Seq("g"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 10)
    def time(label: String, f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[topk] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    def once(label: String, f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[topk] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    once("warmup-window", windowed.count())
    once("warmup-custom", custom.count())
    time("window  ", windowed.count())
    time("custom  ", custom.count())
    spark.stop()
  }
}
