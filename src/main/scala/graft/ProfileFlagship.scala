package graft
import graft.operators.Flatten
import graft.sources.BettingFixture
import org.apache.spark.sql.SparkSession
object ProfileFlagship {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    (1 to 2).foreach { i =>
      time(s"fixture only $i") { BettingFixture.sportEvents(spark, sfDir).count() }
      time(s"full flatten $i") { Flatten.flatten25(BettingFixture.sportEvents(spark, sfDir)).count() }
    }
    spark.stop()
  }
}
