package graft
import graft.functions.{DecodeFns, TextFns}
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileCse {
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
    // decode as ONE projection: pj subexpression repeated 6x
    val li = Tables.lineitem(spark, sfDir)
    val frames = li.select(DecodeFns.encodeFrame(
      when(pmod(col("l_orderkey"), lit(2)) === 0, "broadcast-main").otherwise("private-user"),
      concat(lit("tournament_"), pmod(col("l_suppkey"), lit(5))),
      struct(col("l_orderkey").as("event_id"), col("l_partkey").as("odds"))).as("raw"))
    def g(c: org.apache.spark.sql.Column, f: String) = get_json_object(c, "$." + f)
    val pj = unbase64(g(col("raw"), "payload")).cast("string")
    val onePro = frames.select(
      g(col("raw"), "channel").as("channel"),
      struct(g(pj, "event_id").cast("long").as("event_id"),
        g(pj, "odds").cast("int").as("odds"),
        g(pj, "event_id").cast("long").as("e2"),
        g(pj, "odds").cast("int").as("o2"),
        g(pj, "event_id").cast("long").as("e3"),
        g(pj, "odds").cast("int").as("o3")).as("update"))
    (1 to 2).foreach(i => time(s"decode ONE projection (6 pj refs) $i") {
      onePro.agg(sum(col("update.odds"))).count()
    })
    // minhash sigs as ONE projection, no barriers: hs expr repeated 8x
    val docs = Tables.documents(spark, sfDir)
    val toks = TextFns.tokens(col("text"))
    val hs = TextFns.shingleHashes(TextFns.shingles(toks, 3))
    val sigs1 = docs.select(col("doc_id"),
      array((0 until 4).map(b => TextFns.minhashBandNum(hs, b)): _*).as("keys"))
    (1 to 2).foreach(i => time(s"sigs ONE projection (8 hs refs) $i") {
      sigs1.select(explode(col("keys")).as("k")).agg(sum(length(col("k")))).count()
    })
    spark.stop()
  }
}
