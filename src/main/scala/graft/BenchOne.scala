package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registry query (repeatedly) and optionally dump its
  * formatted physical plan. `runMain graft.BenchOne <name> [reps] [--explain]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.drop(1).filterNot(_.startsWith("--")).headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = Queries.queries(name)
    if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
