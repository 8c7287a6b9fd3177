package graft

import graft.functions.TextFns
import graft.operators.Sketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64 // small width forces collisions — the interesting case

  private def toks = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(explode(TextFns.tokens(col("text"))).as("term"))

  test("CMS estimate is an upper bound on the exact count, for every term") {
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("n"))
    val cms = Sketch.countMin(toks, "term", depth, width)
    val est = Sketch.estimate(cms, exact, "term", depth, width)
    val bad = exact.join(est, "term").where($"cms_count" < $"n").count()
    assert(bad == 0, "CMS must never underestimate")
  }

  test("sketches merge by cell-wise sum: sketch(A ∪ B) == sketch(A) ⊕ sketch(B)") {
    val (a, b) = (toks.where(md5($"term") < "8"), toks.where(md5($"term") >= "8"))
    val merged = Sketch.countMin(a, "term", depth, width)
      .unionByName(Sketch.countMin(b, "term", depth, width))
      .groupBy($"row", $"bucket").agg(sum($"n").as("n"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(toks, "term", depth, width)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sketch size is the grid, not the corpus") {
    val cells = Sketch.countMin(toks, "term", depth, width).count()
    assert(cells <= depth.toLong * width)
    assert(toks.count() > cells, "corpus must dwarf the sketch for the test to mean anything")
  }
}
