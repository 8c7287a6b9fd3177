package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** JVM reference: same integer update rule, plain maps. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) * 85 / (100 * deg(s)) }.sum).toMap
      r = nodes.map(n => n -> (150000L + contrib.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRank matches the JVM reference on a hand graph; hub outranks leaves") {
    // 1..6 all link the hub 0; 0 links 1; 7 dangles in (no out-edges)
    val edges = (1L to 6L).map(i => (i, 0L)) ++
      Seq((0L, 1L), (3L, 7L), (4L, 1L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refRank(edges, 4))
    assert(got(0L) > got(2L), "hub outranks a leaf")
    assert(got(7L) > 150000L, "dangling-in node still receives mass")
  }

  test("ranks are invariant to edge order and partitioning") {
    val rnd = new scala.util.Random(3)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val a = Graph.pageRank(edges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(
      rnd.shuffle(edges).toDF("src", "dst").repartition(7), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b) // integer math: no float-sum reorder drift
    assert(a == refRank(edges, 3))
  }

  test("triangleCounts: hand graph, direction/duplicates/self-loops ignored") {
    // triangle {1,2,3}, triangle {2,3,4}; 5 hangs off 1; self-loop on 2;
    // duplicate + reversed edges must not double-count
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),        // tri A
      (3L, 2L), (2L, 2L), (1L, 2L),        // reversed dup, self-loop, dup
      (2L, 4L), (4L, 3L),                  // tri B closes via 2-3
      (1L, 5L)                             // dangling edge
    ).toDF("src", "dst")
    val got = graft.operators.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("iteration bounds are enforced") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(df, 0))
    intercept[IllegalArgumentException](Graph.pageRank(df, 51))
  }
}
