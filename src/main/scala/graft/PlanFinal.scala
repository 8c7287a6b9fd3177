package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-only plan auditor: run a registered query to completion and print
  * the FINAL adaptive physical plan — the one after AQE stage reuse,
  * runtime broadcast conversion, and skew-join splitting, which the
  * pre-execution `explain` (BenchOne --explain, DumpPlans) cannot show.
  * Usage: runMain graft.PlanFinal <queryName>
  *
  * Reading caveat: every InMemoryTableScan node reprints its entire cached
  * derivation inline (nested caches recursively), so a raw FileScan count
  * over the output wildly overstates real I/O — a cached subtree's scans
  * execute once at materialization however many times they print. Count
  * scans per distinct InMemoryRelation, not globally.
  */
object PlanFinal {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Queries.queries(name)(spark, sfDir)
    val n = df.count()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    println(s"[planfinal] $name rows=$n")
    println(finalPlan)
    spark.stop()
  }
}
