package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, 100L))
    .toDF("pid", "pt")
  private val intervals = Seq(
    (10L, 0L, 20L),    // catches pt 5, 10, 19 (20 excluded: half-open)
    (11L, 19L, 21L),   // catches 19, 20 — crosses a bin boundary at 20
    (12L, 30L, 31L),   // catches nothing
    (13L, 90L, 90L))   // empty interval: dropped
    .toDF("iid", "s", "e")

  test("binned equi-join matches naive nested-loop semantics, half-open") {
    val expected = points.crossJoin(intervals)
      .where($"pt" >= $"s" && $"pt" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 20L, 1000L)) { // bin width never changes results
      val got = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"binWidth=$w")
      assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L)))
    }
  }

  test("no pair is emitted twice even when an interval spans many bins") {
    val out = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", 2L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(out.length == out.toSet.size, "duplicate point-interval pairs")
  }

  test("auto bin width (median span) returns the same rows") {
    val expected = points.crossJoin(intervals)
      .where($"pt" >= $"s" && $"pt" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.pointInIntervalAuto(points, intervals, "pt", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("auto bin width builds lazily: no job runs at plan-build time") {
    // Carried three rounds as a verdict nit: the auto variant used to run an
    // eager one-row median job while BUILDING the plan, surprising inside a
    // lazily-composed pipeline. The median is now part of the plan itself.
    val sc = spark.sparkContext
    sc.setJobGroup("rj-auto-lazy", "plan-build probe")
    try {
      val df = RangeJoin.pointInIntervalAuto(points, intervals, "pt", "s", "e")
      Thread.sleep(500) // status store updates from the listener bus, async
      assert(sc.statusTracker.getJobIdsForGroup("rj-auto-lazy").isEmpty,
        "building the auto range-join plan ran an eager Spark job")
      assert(df.count() == 5) // …and executing it still works, inside the group
    } finally sc.clearJobGroup()
  }

  test("plan shape: equi-join on the bin key, no nested-loop product") {
    val p = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product:\n$p")
  }
}
