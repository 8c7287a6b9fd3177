package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("columnStats: nulls, exact ndv, native-type min/max in one row per column") {
    val df = Seq(
      (Some(9), Some("b")), (Some(10), None), (Some(9), Some("a")), (None, Some("a")))
      .toDF("n", "s")
    val out = Profiling.columnStats(df, Seq("n", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map { case (c, nulls, ndv, mn, mx) => c -> ((nulls, ndv, mn, mx)) }
      .toMap
    // min/max aggregate as INT then render: 9 < 10 (a string aggregation
    // would have ranked "10" < "9")
    assert(out("n") == ((1L, 2L, "9", "10")))
    assert(out("s") == ((1L, 2L, "a", "b")))
  }

  test("columnStats: empty input profiles to zero counts and null extremes") {
    val out = Profiling.columnStats(spark.range(0).toDF("id"), Seq("id"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 0L && out.head.getLong(2) == 0L)
    assert(out.head.isNullAt(3) && out.head.isNullAt(4))
  }

  test("columnStats: approx variant skips the Expand and stays within HLL error") {
    // two distinct-aggregated columns: the exact path needs Catalyst's
    // Expand (input ×3); the HLL path aggregates in one pass without it
    val df = spark.range(10000).select(col("id"), (col("id") % 100).as("id2"))
    val exact = Profiling.columnStats(df, Seq("id", "id2"))
    val approx = Profiling.columnStats(df, Seq("id", "id2"), approxDistinct = true)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val ndv = approx.collect().head.getLong(2)
    assert(math.abs(ndv - 10000L) < 1000L, s"HLL ndv=$ndv")
  }

  test("keySkew: deterministic top-N, integral shares, no global sort, one scan") {
    // 60 'a', 30 'b', 10 'c' → shares 6000/3000/1000 bp
    val df = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"))
      .toDF("k")
    val out = Profiling.keySkew(df, col("k"), 2)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", 60L, 6000L), ("b", 30L, 3000L)))
    // plan over a non-local source (LocalRelation folds): heap-based top-N
    // and the counts/total branches reusing ONE rollup exchange
    val big = spark.range(1000).select((col("id") % 7).as("k"))
    val skew = Profiling.keySkew(big, col("k"), 3)
    skew.collect() // AQE finalizes the plan
    val plan = skew.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "global top-N must be heap-based")
    assert(plan.contains("ReusedExchange"),
      s"counts and total must share the rollup scan:\n$plan")
  }

  test("keySkew: null keys count as a group and sort last on ties") {
    val df = (Seq.fill(5)(Some("a")) ++ Seq.fill(5)(Option.empty[String]) ++
      Seq.fill(2)(Some("b"))).toDF("k")
    val out = Profiling.keySkew(df, col("k"), 3)
      .as[(Option[String], Long, Long)].collect()
    // 'a' and null tie at 5 — the non-null key wins the tie cross-engine
    assert(out.toSeq == Seq(
      (Some("a"), 5L, 4166L), (None, 5L, 4166L), (Some("b"), 2L, 1666L)))
  }

  test("Salted.equiJoin is row-for-row the plain inner join, each row matched once") {
    import graft.operators.Salted
    val fact = Seq((1L, "hot", 1.0), (2L, "hot", 2.0), (3L, "hot", 3.0),
      (4L, "cold", 4.0), (5L, "never", 5.0)).toDF("id", "k", "v")
    val dim = Seq(("hot", 100L), ("cold", 200L), ("unused", 300L))
      .toDF("k", "d")
    val plain = fact.join(dim, Seq("k")).select("id", "k", "v", "d")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    for (nSalts <- Seq(1, 8)) {
      val salted = Salted.equiJoin(fact, dim, "k", nSalts)
        .select("id", "k", "v", "d")
        .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
      assert(salted == plain, s"nSalts=$nSalts")
    }
  }

  test("columnStats: column names with quotes or backticks profile cleanly") {
    val df = spark.range(3).toDF("it's").withColumn("a`b", col("`it's`") * 2)
    val out = Profiling.columnStats(df, Seq("it's", "a`b"))
      .as[(String, Long, Long, String, String)].collect()
    assert(out.map(_._1).toSeq == Seq("it's", "a`b"))
    assert(out.forall(_._3 == 3L))
  }

  test("madOutliers: hand-computed medians/MAD, only the planted extremes flag") {
    // group a: values 10,11,12,13,100 → med=12 (pos 3), adev=2,1,0,1,88 →
    // mad=1 (pos 3 of 0,1,1,2,88); outlier iff adev·100 > 350 → only 100.
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 11L), (3L, "a", 12L), (4L, "a", 13L),
      (5L, "a", 100L),
      // group b: all identical → mad 0 → any deviation flags (6 rows so
      // the even-n lower median is exercised: med at pos (6+1) div 2 = 3)
      (6L, "b", 7L), (7L, "b", 7L), (8L, "b", 7L), (9L, "b", 7L),
      (10L, "b", 7L), (11L, "b", 9L))
      .toDF("doc_id", "source", "n")
    val out = Profiling.madOutliers(rows, "source", "doc_id", "n", 350)
      .as[(Long, String, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(5L) == ((5L, "a", 100L, 12L, 1L, 1)))
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._6 == 0), "in-band a-rows pass")
    assert(out(5L)._4 == 12L && out(1L)._5 == 1L)
    // degenerate group: mad 0, the single deviating row flags
    assert(out(11L)._6 == 1 && out(6L)._6 == 0 && out(6L)._5 == 0L)
  }
}
