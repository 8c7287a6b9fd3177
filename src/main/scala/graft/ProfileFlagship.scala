package graft
import graft.operators.Flatten
import graft.sources.BettingFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship-flatten cost breakdown. `count()` is the bench's action but lets
  * Catalyst prune projections, so sub-stages are ALSO forced through the
  * noop sink (full materialization, no driver transfer) — compare both. */
object ProfileFlagship {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.lineitem(spark, sfDir)
    (1 to 2).foreach { i =>
      time(s"r$i fixture count")(BettingFixture.sportEvents(spark, sfDir).count())
      time(s"r$i flatten count")(Flatten.flatten25(BettingFixture.sportEvents(spark, sfDir)).count())
      time(s"r$i flatten noop")(noop(Flatten.flatten25(BettingFixture.sportEvents(spark, sfDir))))
      time(s"r$i fixture noop")(noop(BettingFixture.sportEvents(spark, sfDir)))
      time(s"r$i li scan noop")(noop(li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))))
    }
    spark.stop()
  }
}
