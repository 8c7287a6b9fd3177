package graft

import graft.operators.TopK
import graft.operators.TopK.Scored
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeExpressionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def register(): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_odds", exprs => graft.plans.NormalizeOdds(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "american_to_decimal", exprs => graft.plans.AmericanToDecimal(exprs.head), "built-in")
  }

  test("NormalizeOdds matches the Column-combinator semantics (codegen path)") {
    register()
    val out = Seq(-100, 100, -101, 150, -10000).toDF("odds")
      .select(call_function("normalize_odds", $"odds").as("n")).as[Int].collect()
    assert(out.toSeq == Seq(100, 100, -101, 150, -10000))
  }

  test("AmericanToDecimal computes both signs and survives SQL text") {
    register()
    val r = spark.sql("SELECT american_to_decimal(150) AS a, american_to_decimal(-200) AS b")
      .as[(Double, Double)].head()
    assert(r == ((2.5, 1.5)))
  }

  test("null propagates (nullIntolerant)") {
    register()
    val out = Seq[Option[Int]](Some(-100), None).toDF("odds")
      .select(call_function("normalize_odds", $"odds").as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(100), None))
  }
}

class TopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bounded heap keeps k best with deterministic tie-break") {
    val agg = TopK.topK(3)
    val xs = Seq(Scored(5, 0.5), Scored(1, 0.9), Scored(2, 0.9), Scored(3, 0.1),
      Scored(4, 0.7), Scored(6, 0.5))
    val result = xs.foldLeft(agg.zero)(agg.reduce)
    assert(result == Seq(Scored(1, 0.9), Scored(2, 0.9), Scored(4, 0.7)))
    // merge of partial buffers gives the same answer as a single fold
    val (l, r) = xs.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == result)
  }

  test("udaf top-k equals window top-k on the embeddings fixture") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val viaWindow = graft.operators.Similarity.bruteTopK(e, 5, 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val viaAgg = graft.operators.Similarity.bruteTopKAgg(e, 5, 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
