package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r16 session 2): closure-loop cost attribution inside the
  * docs-prep family — warm cost of Dedup.components() on the real
  * survivor pair graph vs the pair stage vs the drops tail.
  * Run: sbt "runMain graft.ProfileClosure [sfDir]" */
object ProfileClosure {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[closure] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (p <- 1 to 3) {
      println(s"[closure] ---- pass $p ----")
      val survivors = Queries.curateSurvivors(spark, dir)
      t("survivors")(survivors.write.format("noop").mode("overwrite").save())
      val pairs = Dedup.nearDupPairs(
          survivors.select(col("doc_id"), col("text")), 0.2)
        .select(col("doc_a"), col("doc_b"))
      t("pairs")(pairs.write.format("noop").mode("overwrite").save())
      t("components")(Dedup.components(pairs)
        .write.format("noop").mode("overwrite").save())
      t("docs_prep full")(SparkEntry.queries("pipeline_docs_prep")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
