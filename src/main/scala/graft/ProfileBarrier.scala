package graft
import graft.functions.TextFns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileBarrier {
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
    val docs = Tables.documents(spark, sfDir)
    // Plain two-project pipeline: does CollapseProject duplicate tokens()?
    val toksP = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
    val shP = toksP.select(col("doc_id"), TextFns.shingles(col("w"), 3).as("sh"))
    val sigsP = shP.select(col("doc_id"), TextFns.shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id"),
        array((0 until 4).map(b => TextFns.minhashBandNum(col("hs"), b)): _*).as("keys"))
    val q = sigsP.select(explode(col("keys")).as("k")).agg(sum(length(col("k"))))
    val plan = q.queryExecution.optimizedPlan.toString
    println("[plan] n_projects=" + "Project".r.findAllIn(plan).length +
      " len=" + plan.length + " hs_refs=" + "hs#".r.findAllIn(plan).length +
      " split_count=" + "split\\(".r.findAllIn(plan).length)
    time("plain-project sigs once") { q.count() }
    spark.stop()
  }
}
