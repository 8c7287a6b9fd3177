package graft

import graft.functions.TimeFns
import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (known Morton values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 8).as("z")).as[Long].collect()
    // morton(5=101b, 3=011b) = x bits at even, y at odd: 0b011011 = 27
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("hilbert: every consecutive pair of curve positions is grid-adjacent") {
    // The defining Hilbert property (Morton fails it): walking d = 0..n²−1
    // moves exactly one step in x or y. Exhaustive on the 32×32 grid.
    val bits = 5
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Layout.hilbertRef(x, y, bits) -> ((x, y))).toMap
    assert(byD.size == n * n, "curve must be a bijection")
    (0 until n * n - 1).foreach { d =>
      val (x0, y0) = byD(d.toLong); val (x1, y1) = byD(d.toLong + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"jump at d=$d: ($x0,$y0)→($x1,$y1)")
    }
  }

  test("hilbert: the column expression matches the reference implementation") {
    val bits = 10
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1 << bits).toLong, rnd.nextInt(1 << bits).toLong)) ++
      Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L), ((1L << bits) - 1, (1L << bits) - 1))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.hilbertValue($"x", $"y", bits).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d == Layout.hilbertRef(x, y, bits), s"mismatch at ($x,$y)")
    }
  }

  test("hilbert layout concentrates dimension filters at least as well as z-order") {
    val nFiles = 16
    val events = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"event_id", $"user_id",
        (TimeFns.nanosToMicros($"ts") / lit(3600000000L)).cast("long")
          .bitwiseAND(lit(1023L)).as("hour_idx"))
    val base = java.nio.file.Files.createTempDirectory("hilbert").toString
    Layout.hilbertShape(events, "user_id", "hour_idx", bits = 10, nFiles = nFiles)
      .write.mode("overwrite").parquet(s"$base/h")
    val touched = spark.read.parquet(s"$base/h")
      .where($"user_id".between(40, 59))
      .select(input_file_name()).distinct().count()
    assert(touched <= nFiles / 2, s"hilbert band filter touched $touched of $nFiles files")
    assert(spark.read.parquet(s"$base/h").count() == events.count())
  }

  test("compactShape: fragmented files → exact count, disjoint key ranges, prunable") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type")
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // simulate the streaming-sink fragmentation problem: 64 tiny files
    events.repartition(64).write.mode("overwrite").parquet(s"$base/frag")
    def partFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(partFiles(s"$base/frag") == 64)

    Layout.compactShape(spark.read.parquet(s"$base/frag"), col("event_id"), 4)
      .write.mode("overwrite").parquet(s"$base/compact")
    assert(partFiles(s"$base/compact") == 4, "compaction must yield exactly nFiles")
    val back = spark.read.parquet(s"$base/compact")
    assert(back.count() == events.count(), "compaction is row-preserving")
    // per-file key ranges are disjoint (event_id is unique), so min-max
    // stats prune key filters after the rewrite
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("lo").as[(String, Long, Long)].collect()
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
      case _ =>
    }
    val touched = back.where($"event_id" === ranges.head._3)
      .select(input_file_name()).distinct().count()
    assert(touched == 1, s"point lookup touched $touched files after compaction")
  }

  test("date-partitioned write prunes directories at scan time") {
    // The other half of layout-driven pruning: coarse directory partitioning
    // on the natural time key, with PartitionFilters doing the skipping
    // before any file is opened.
    val dir = java.nio.file.Files.createTempDirectory("dateparts").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date",
        to_date(TimeFns.nanosToTimestamp($"ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where($"event_date" === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"date filter must become a partition filter:\n$plan")
    val allDates = spark.read.parquet(dir).select("event_date").distinct().count()
    assert(allDates > 5, "fixture must span multiple partitions")
    assert(q.count() > 0)
  }

  test("z-order layout concentrates a dimension filter into few files") {
    val nFiles = 16
    val events = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"event_id", $"user_id",
        (TimeFns.nanosToMicros($"ts") / lit(3600000000L)).cast("long")
          .bitwiseAND(lit(1023L)).as("hour_idx"))

    def filesTouched(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).where(cond)
        .select(input_file_name()).distinct().count()

    val base = java.nio.file.Files.createTempDirectory("layout").toString
    events.repartition(nFiles).write.mode("overwrite").parquet(s"$base/plain")
    Layout.zorderShape(events, "user_id", "hour_idx", bits = 10, nFiles = nFiles)
      .write.mode("overwrite").parquet(s"$base/zorder")

    // same rows in both layouts
    assert(spark.read.parquet(s"$base/zorder").count() ==
      spark.read.parquet(s"$base/plain").count())

    val userBand = $"user_id".between(40, 59)
    val hourBand = $"hour_idx".between(100, 199)
    val plainU = filesTouched(s"$base/plain", userBand)
    val zU = filesTouched(s"$base/zorder", userBand)
    val plainBoth = filesTouched(s"$base/plain", userBand && hourBand)
    val zBoth = filesTouched(s"$base/zorder", userBand && hourBand)
    // round-robin spreads every user over every file; the z-curve keeps a
    // user band inside a strip of files, and a 2-dim box in fewer still.
    assert(plainU == nFiles, s"plain layout should smear the band ($plainU)")
    assert(zU <= nFiles / 2, s"z-order should halve files touched, got $zU")
    assert(zBoth <= zU, s"adding the second dimension must not widen ($zBoth > $zU)")
  }
}
