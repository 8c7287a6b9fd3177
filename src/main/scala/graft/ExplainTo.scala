package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` of named queries to
  * <outDir>/<name>_<suffix>.txt — for the plans/r17 before/after
  * evidence. `runMain graft.ExplainTo <outDir> <suffix> q1,q2,...`
  * (sf0.1 by default so fan-out/broadcast size decisions match the
  * bench; override with SPARK_GRAFT_SF_DIR). */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = Queries.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[explain] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
