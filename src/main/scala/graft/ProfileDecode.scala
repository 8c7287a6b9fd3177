package graft
import graft.functions.{DecodeFns, OddsFns}
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileDecode {
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
    val li = Tables.lineitem(spark, sfDir)
    val updates = li.select(
      concat(lit("m"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("market_id"),
      col("l_orderkey").as("event_id"),
      pmod(col("l_suppkey"), lit(5)).as("tournament_id"),
      when(col("l_linestatus") === "O", "open").otherwise("settled").as("status"),
      OddsFns.ladderAt(pmod(col("l_partkey"), lit(291))).cast("int").as("odds"),
      (unix_timestamp(col("l_shipdate")) * lit(1000000000L)).as("updated_at"),
      when(pmod(col("l_orderkey"), lit(2)) === 0, "broadcast-main")
        .otherwise("private-user").as("channel"),
      concat(lit("tournament_"), pmod(col("l_suppkey"), lit(5))).as("event_name"))
    val frames = updates.select(DecodeFns.encodeFrame(
      col("channel"), col("event_name"),
      struct(col("market_id"), col("event_id"), col("tournament_id"),
        col("status"), col("odds"), col("updated_at"))).as("raw"))
    (1 to 2).foreach { i =>
      time(s"updates only $i") { updates.agg(sum(length(col("market_id")))).count() }
      time(s"encode only $i") { frames.agg(sum(length(col("raw")))).count() }
      val envG = frames.select(get_json_object(col("raw"), "$.channel").as("channel"),
        get_json_object(col("raw"), "$.event_name").as("event_name"),
        get_json_object(col("raw"), "$.payload").as("payload"))
      time(s"gjo env + plain unbase64 $i") {
        envG.agg(sum(length(unbase64(col("payload")).cast("string")))).count()
      }
      time(s"gjo env + STAGED unbase64 $i") {
        graft.plans.Stage(envG, "pj", unbase64(col("payload")).cast("string"))
          .agg(sum(length(col("pj")))).count()
      }
      time(s"full new decodeFrames $i") {
        EventStreams.decodeFrames(frames).agg(sum(col("update.odds"))).count()
      }
      time(s"envelope gjo x3 $i") {
        frames.select(get_json_object(col("raw"), "$.channel").as("channel"),
          get_json_object(col("raw"), "$.event_name").as("event_name"),
          get_json_object(col("raw"), "$.payload").as("payload"))
          .agg(sum(length(col("payload")))).count()
      }

      time(s"encode+decode+route $i") {
        EventStreams.tournamentLeg(EventStreams.decodeFrames(frames), 0L until 5L)
          .agg(sum(col("update.odds"))).count()
      }
      // Round-5 finding: the routing filters inline the whole encode
      // expression and get pushed below Tables' fan-out repartition, onto
      // the 1-task single-row-group scan — serializing the encode on one
      // core (the 3-5× gap vs the unfiltered decode above). Staging `raw`
      // behind a Generate barrier pins encode+route above the exchange.
      val stagedFrames = graft.plans.Stage(updates, "raw", DecodeFns.encodeFrame(
        col("channel"), col("event_name"),
        struct(col("market_id"), col("event_id"), col("tournament_id"),
          col("status"), col("odds"), col("updated_at")))).select(col("raw"))
      time(s"encode+decode+route, raw STAGED $i") {
        EventStreams.tournamentLeg(EventStreams.decodeFrames(stagedFrames), 0L until 5L)
          .agg(sum(col("update.odds"))).count()
      }
      // Full-width output (all 7 decoded columns, the real roundtrip
      // shape): 6 GetJsonObject payload parses vs ONE json_tuple parse.
      def full7(df: org.apache.spark.sql.DataFrame) =
        df.select(col("event_name"),
          col("update.market_id"), col("update.event_id"), col("update.tournament_id"),
          col("update.status"), col("update.odds").as("odds"), col("update.updated_at"))
      time(s"FULL7 staged + gjo decode $i") {
        full7(EventStreams.tournamentLeg(EventStreams.decodeFrames(stagedFrames), 0L until 5L))
          .agg(sum(col("odds"))).count()
      }
      def jtDecode(df: org.apache.spark.sql.DataFrame) =
        df.select(col("raw"), json_tuple(col("raw"), "channel", "event_name", "payload")
            .as(Seq("channel", "event_name", "payload")))
          .select(col("raw"), col("channel"), col("event_name"),
            json_tuple(unbase64(col("payload")).cast("string"),
              "market_id", "event_id", "tournament_id", "status", "odds", "updated_at")
              .as(Seq("market_id", "event_id", "tournament_id", "status", "odds", "updated_at")))
          .select(col("raw"), col("channel"), col("event_name"),
            struct(col("market_id"), col("event_id").cast("long").as("event_id"),
              col("tournament_id").cast("long").as("tournament_id"), col("status"),
              col("odds").cast("int").as("odds"),
              col("updated_at").cast("long").as("updated_at")).as("update"))
      time(s"FULL7 UNstaged + json_tuple decode $i") {
        full7(EventStreams.tournamentLeg(jtDecode(frames), 0L until 5L))
          .agg(sum(col("odds"))).count()
      }
      time(s"FULL7 staged + json_tuple decode $i") {
        full7(EventStreams.tournamentLeg(jtDecode(stagedFrames), 0L until 5L))
          .agg(sum(col("odds"))).count()
      }
    }
    spark.stop()
  }
}
