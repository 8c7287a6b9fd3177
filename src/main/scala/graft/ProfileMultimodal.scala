package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r16 optimization): stage split of the multimodal rows —
  * how much of dedup_multimodal / multimodal_decode is PNG ENCODE
  * (synthesize), DECODE, and the relational tail? Run:
  *   sbt "runMain graft.ProfileMultimodal /root/testdata/sf0.1"
  */
object ProfileMultimodal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[mmprof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    for (p <- 1 to 2) {
      println(s"[mmprof] ---- pass $p ----")
      val docs = Tables.documents(spark, dir)
      t("docs count") { docs.count() }
      t("synthesize only") {
        Multimodal.synthesizeImages(spark, docs)
          .write.format("noop").mode("overwrite").save()
      }
      t("synth+repart+decode") {
        Multimodal.decodeImageFeatures(spark,
          Multimodal.synthesizeImages(spark, docs).repartition(col("asset_id")))
          .write.format("noop").mode("overwrite").save()
      }
      t("full dedup_multimodal") {
        Queries.queries("dedup_multimodal")(spark, dir).count()
      }
      t("full multimodal_decode") {
        Queries.queries("multimodal_decode")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
