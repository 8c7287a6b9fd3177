package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a comma-separated list of registry queries in order and
  * time each — for bisecting cross-query interference inside one JVM.
  * `runMain graft.BenchSeq q1,q2,q3` */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = Queries.queries(name)(spark, sfDir).count()
      println(f"[seq] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
