package graft

import graft.functions.OddsFns
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class OddsLadderSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("DSv2 ladder source serves the full rule-derived ladder") {
    val df = spark.read.format("graft.sources.OddsLadderSource").load()
    val odds = df.select("odds").as[Int].collect().sorted.toSeq
    assert(odds == OddsFns.Ladder)
  }

  test("filters push into the scan-side plan and results stay correct") {
    val df = spark.read.format("graft.sources.OddsLadderSource").load()
      .where($"odds" > 0 && $"band_step" === 1)
    assert(df.count() == 20) // positive step-1 band: 100..119
  }

  test("DSv2 pushdown: predicates evaluate in the source, columns prune to the projection") {
    val df = spark.read.format("graft.sources.OddsLadderSource").load()
      .where($"odds" > 0 && $"band_step" === 1)
      .select("odds")
    // The scan itself reports the pushed predicates and the 1-column read
    // schema — evidence the filter ran source-side and band_step was never
    // emitted (on an endpoint-backed source this is the fetch reduction).
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("GreaterThan(odds,0)"), scanDesc)
    assert(scanDesc.contains("EqualTo(band_step,1)"), scanDesc)
    assert(scanDesc.contains("ReadSchema: struct<odds:int>"), scanDesc)
    assert(df.as[Int].collect().sorted.toSeq == (100 to 119).toSeq)
  }

  test("DSv2 pushdown: unsupported filters stay residual and still apply") {
    // odds % 200 = 0 is not a source-compilable predicate — it must return
    // from pushFilters as a residual and Spark must still enforce it.
    val df = spark.read.format("graft.sources.OddsLadderSource").load()
      .where($"odds" % 200 === 0 && $"odds" > 0)
    val got = df.select("odds").as[Int].collect().sorted.toSeq
    val want = OddsFns.Ladder.filter(o => o % 200 == 0 && o > 0)
    assert(got == want)
    // count(*)-style scan: zero-column required schema still yields a row
    // per ladder entry.
    val n = spark.read.format("graft.sources.OddsLadderSource").load().count()
    assert(n == OddsFns.Ladder.size)
  }
}

class SeedMetaSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tournaments = spark.read
    .format("graft.sources.SeedMetaSource").option("table", "tournaments")

  test("tournaments table serves the rule-derived region universe; " +
      "interest table serves the config list") {
    val t = tournaments.load().as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(t == Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST")))
    val i = spark.read.format("graft.sources.SeedMetaSource")
      .option("table", "interest").load().as[String].collect().sorted.toSeq
    assert(i == graft.sources.BettingFixture.InterestedTournaments.sorted)
    val e = intercept[Exception](spark.read
      .format("graft.sources.SeedMetaSource").option("table", "nope").load())
    assert(e.getMessage.contains("no table 'nope'"))
  }

  test("DSv2 pushdown: IN/equality evaluate in the source, columns prune, " +
      "int comparisons compile, string ones on ids don't exist") {
    val df = tournaments.load()
      .where($"tournament_name".isin("ASIA", "EUROPE") && $"tournament_id" >= 1)
      .select("tournament_name")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("In(tournament_name"), scanDesc)
    assert(scanDesc.contains("GreaterThanOrEqual(tournament_id,1)"), scanDesc)
    assert(scanDesc.contains("ReadSchema: struct<tournament_name:string>"), scanDesc)
    assert(df.as[String].collect().sorted.toSeq == Seq("ASIA", "EUROPE"))
  }

  test("unsupported predicates stay residual and still apply; zero-column " +
      "COUNT(*) scans work") {
    // length() is not a source-compilable predicate — residual path
    val df = tournaments.load()
      .where(org.apache.spark.sql.functions.length($"tournament_name") === 6)
    assert(df.select("tournament_name").as[String].collect().sorted.toSeq ==
      Seq("AFRICA", "EUROPE"))
    assert(tournaments.load().count() == 5)
  }

  test("the tournament_id option is endpoint-side parameterization (the " +
      "S3 contract): rows restrict before any Spark predicate") {
    val df = tournaments.option("tournament_id", "4").load()
    assert(df.as[(Int, String)].collect().toSeq == Seq((4, "MIDDLE EAST")))
    // the restriction is in the scan, not a Filter node
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("tournament_id=4"), desc)
  }

  test("seeded pipeline through the DSv2 dim == the parquet-dim pipeline") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.operators.Seeding.seededEvents(spark, dir)
      .orderBy("event_id").collect().toSeq
    val b = graft.operators.Seeding.seededEventsDsv2(spark, dir)
      .orderBy("event_id").collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}

class StreamingDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("dropDuplicatesWithinWatermark keeps first arrival per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Dedup.streamingExactDedup(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      input.addData((t0, "alpha"), (t0, "beta"), (t1, "alpha")) // dup in-batch
      q.processAllAvailable()
      input.addData((t1, "beta"), (t1, "gamma")) // dup across batches
      q.processAllAvailable()
      val texts = spark.table("dedupstream").select("text").as[String].collect().sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("streamingUrlDedup drops canonical-key recrawls within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = Dedup.streamingUrlDedup(
      input.toDF().toDF("ts", "doc_id", "url"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("urlstream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      input.addData(
        (t0, 1L, "http://a.com/x?b=2&a=1"),
        (t0, 2L, "HTTP://WWW.A.com:80/x/?a=1&b=2&utm_medium=m"), // variant of 1
        (t0, 3L, "http://b.com/y"))
      q.processAllAvailable()
      input.addData((t1, 4L, "http://user@a.com/x?a=1&b=2&fbclid")) // recrawl of 1
      q.processAllAvailable()
      val kept = spark.table("urlstream").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 3L),
        "first arrival per canonical key survives; variants and recrawls drop")
      // stream ≡ batch: batch urlDedup over the FULL input must pick the
      // same survivors the stream kept (round-10 review: comparing keys
      // derived from the stream's own output was vacuous)
      val fullInput = Seq(
        (1L, "http://a.com/x?b=2&a=1"),
        (2L, "HTTP://WWW.A.com:80/x/?a=1&b=2&utm_medium=m"),
        (3L, "http://b.com/y"),
        (4L, "http://user@a.com/x?a=1&b=2&fbclid")).toDF("doc_id", "url")
      val batchSurvivors = Dedup.urlDedup(fullInput)
        .where($"is_canonical" === 1).select("doc_id").as[Long].collect().sorted
      assert(batchSurvivors.toSeq == kept.toSeq,
        "batch min-id survivors must equal the stream's first arrivals " +
          "(same canonical key, arrival order = id order here)")
    } finally q.stop()
  }

  test("streaming LSH candidates pair a new arrival against ALL history") {
    implicit val sqlCtx = spark.sqlContext
    val boiler = "the same boilerplate cookie banner text repeated on every page"
    val input = MemoryStream[(Long, String)]
    val out = Dedup.streamingNearDupCandidates(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("lshcand")
      .outputMode("append").start()
    try {
      input.addData((1L, boiler), (2L, boiler))
      q.processAllAvailable()
      def pairs() = spark.table("lshcand").select("doc_a", "doc_b")
        .distinct().as[(Long, Long)].collect().toSet
      assert(pairs() == Set((1L, 2L)))
      // A doc arriving BATCHES later still pairs with every historical doc
      // in its buckets — no rescan, just keyed state.
      input.addData((3L, boiler))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }

  test("streaming LSH candidates: a full bucket truncates, bounding state") {
    implicit val sqlCtx = spark.sqlContext
    val boiler = "the same boilerplate cookie banner text repeated on every page"
    val input = MemoryStream[(Long, String)]
    val truncated = spark.sparkContext.longAccumulator("lsh_truncated_test")
    val out = Dedup.streamingNearDupCandidates(
      input.toDF().toDF("doc_id", "text"), maxBucket = 2, Some(truncated))
    val q = out.writeStream.format("memory").queryName("lshcand_cap")
      .outputMode("append").start()
    try {
      input.addData((1L, boiler), (2L, boiler))
      q.processAllAvailable()
      input.addData((3L, boiler)) // buckets already hold 2 members → truncated
      q.processAllAvailable()
      val got = spark.table("lshcand_cap").select("doc_a", "doc_b")
        .distinct().as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)), s"capped bucket must not emit new pairs: $got")
      // doc 3 dropped in all 4 band buckets — visible, not silent
      assert(truncated.value == 4L, s"truncation metric: ${truncated.value}")
    } finally q.stop()
  }

  test("deduped streaming LSH candidates emit each pair ONCE within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val boiler = "the same boilerplate cookie banner text repeated on every page"
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = Dedup.streamingNearDupCandidatesDeduped(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("lshcand_dedup")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      // identical texts share all 4 band buckets → the raw op emits each
      // pair 4 times (once per band); the wrapper must emit exactly once.
      input.addData((t0, 1L, boiler), (t0, 2L, boiler))
      q.processAllAvailable()
      input.addData((t1, 3L, boiler)) // cross-batch: pairs (1,3) and (2,3)
      q.processAllAvailable()
      val rows = spark.table("lshcand_dedup").select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSeq
      assert(rows.sorted == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
        s"each pair exactly once within the horizon: $rows")
    } finally q.stop()
  }

  test("streaming near-dup filter drops signature-identical docs, keeps distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = Dedup.streamingNearDupDedup(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("neardupstream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      val doc = "the quick brown fox jumps over the lazy dog again and again"
      input.addData((t0, 1L, doc), (t0, 2L, "completely different text about spark plans"))
      q.processAllAvailable()
      // same token stream, different doc id / whitespace ⇒ same signature ⇒ dropped
      input.addData((t1, 3L, "  The QUICK brown fox jumps over the lazy dog again and again "))
      q.processAllAvailable()
      val ids = spark.table("neardupstream").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }
}
