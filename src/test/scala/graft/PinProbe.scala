package graft

/** Dev probe: print the (exchanges, scans) plan-pin counts PlanShapeSpec
  * asserts, for the query names given as args — run after a plan-shape
  * change to read the new counts before updating the pins.
  * `sbt "Test/runMain graft.PinProbe pipeline_docs_prep ..."` */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      val df = Queries.queries(n)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      val exch = "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length
      val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(p).length
      println(s"PIN $n exchanges=$exch scans=$scans")
    }
    spark.stop()
  }
}
