package graft

import graft.plans.TopKPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("custom plan matches the row_number window on orders") {
    val orders = Tables.orders(spark, sf)
    val custom = TopKPlan.topKPerGroup(orders,
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .as[(Long, Int, Long, Double)].collect().toSet
    val window = orders
      .withColumn("rank", row_number().over(
        Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
      .where($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("groups smaller than k emit all rows, ranked and gap-free") {
    val df = Seq(("a", 1), ("a", 5), ("b", 7)).toDF("g", "v")
    val out = TopKPlan.topKPerGroup(df, Seq("g"), Seq(("v", true)), k = 10)
      .select($"g", $"rank", $"v").as[(String, Int, Int)].collect().toSet
    assert(out == Set(("a", 1, 5), ("a", 2, 1), ("b", 1, 7)))
  }

  test("case-insensitive resolve is locale-insensitive: \"ID\" finds `id` " +
      "under a Turkish-locale JVM") {
    // tr-TR default-locale toLowerCase maps "ID" -> "ıd" (dotless i) —
    // the analyzer canon must use Locale.ROOT instead (ADVICE r12)
    val saved = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val df = Seq((1L, "a", 3), (1L, "b", 9), (2L, "c", 5)).toDF("id", "tag", "v")
      val out = TopKPlan.topKPerGroup(df, Seq("ID"), Seq(("V", true)), k = 1)
        .select($"id", $"tag").as[(Long, String)].collect().toSet
      assert(out == Set((1L, "b"), (2L, "c")))
    } finally java.util.Locale.setDefault(saved)
  }

  test("TopKRewrite: row_number window + rank filter optimizes into the custom plan") {
    import graft.plans.{TopKPlan, TopKRewrite}
    val exp = spark.experimental
    val (savedRules, savedStrategies) = (exp.extraOptimizations, exp.extraStrategies)
    exp.extraOptimizations = savedRules :+ TopKRewrite
    if (!exp.extraStrategies.contains(TopKPlan.Strategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPlan.Strategy
    try {
      val windowed = Tables.orders(spark, sf)
        .withColumn("rank", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
        .where($"rank" <= 3 && $"o_custkey" > 100)
        .select($"o_custkey", $"rank", $"o_orderkey")
      val p = windowed.queryExecution.executedPlan.toString
      assert(p.contains("TopKFinal") && p.contains("TopKPartial"),
        s"rewrite did not fire:\n$p")
      assert(!p.contains("Window "), s"window operator should be gone:\n$p")
      // Residual conjunct (o_custkey > 100) must survive as a filter.
      val direct = TopKPlan.topKPerGroup(Tables.orders(spark, sf),
          Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
        .where($"o_custkey" > 100).select($"o_custkey", $"rank", $"o_orderkey")
      assert(windowed.as[(Long, Int, Long)].collect().toSet ==
        direct.as[(Long, Int, Long)].collect().toSet)
    } finally {
      exp.extraOptimizations = savedRules
      exp.extraStrategies = savedStrategies
    }
  }

  test("TopKRewrite leaves non-matching windows alone") {
    import graft.plans.TopKRewrite
    val exp = spark.experimental
    val saved = exp.extraOptimizations
    exp.extraOptimizations = saved :+ TopKRewrite
    try {
      // rank filter on a rank() (not row_number) window must NOT rewrite
      val p = Tables.orders(spark, sf)
        .withColumn("rnk", rank().over(
          Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)))
        .where($"rnk" <= 3)
        .queryExecution.executedPlan.toString
      assert(p.contains("Window ") && !p.contains("TopKFinal"))
    } finally exp.extraOptimizations = saved
  }

  test("downstream groupBy on the same key reuses the top-k exchange") {
    val df = TopKPlan.topKPerGroup(Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .groupBy($"o_custkey").agg(sum($"o_totalprice").as("top3_total"))
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"aggregate after top-k must reuse its partitioning:\n$p")
    assert(df.count() > 0)
  }

  test("codegen: partial prune fuses into a WholeStageCodegen stage") {
    assert(spark.conf.get("spark.sql.codegen.wholeStage") == "true")
    // AQE wraps the plan and defers codegen collapse to stage execution;
    // disable it so the printed plan shows the "*(n)" codegen prefixes.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      TopKPlan.topKPerGroup(Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = TopKPlan.topKPerGroup(Tables.orders(spark, sf),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    // The partial operator must sit INSIDE a codegen stage (prefixed "*(n)"),
    // i.e. the child scan/filter pipeline drains into the heap without an
    // iterator boundary.
    assert("""\*\(\d+\) TopKPartial""".r.findFirstIn(p).isDefined,
      s"TopKPartialExec not codegen'd:\n$p")
    // The final operator codegens too: its post-exchange insert loop and
    // ranked emit run inside their own stage ("*(n) TopKFinal").
    assert("""\*\(\d+\) TopKFinal""".r.findFirstIn(p).isDefined,
      s"TopKFinalExec not codegen'd:\n$p")
    assert(df.count() > 0)
  }

  test("codegen and interpreted paths agree row-for-row") {
    def run() = TopKPlan.topKPerGroup(Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .as[(Long, Int, Long, Double)].collect().toSet
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
      assert(withCodegen.nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("plan shape: partial prune below the one exchange, final above it") {
    val p = TopKPlan.topKPerGroup(Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .queryExecution.executedPlan.toString
    val iPartial = p.indexOf("TopKPartial")
    val iExchange = p.indexOf("Exchange hashpartitioning")
    val iFinal = p.indexOf("TopKFinal")
    assert(iPartial >= 0 && iExchange >= 0 && iFinal >= 0, s"missing operators:\n$p")
    // toString prints top-down: final, then exchange, then partial.
    assert(iFinal < iExchange && iExchange < iPartial,
      s"exchange must sit between partial and final:\n$p")
    assert(!p.contains("Sort "), s"no full partition sort allowed:\n$p")
  }
}
