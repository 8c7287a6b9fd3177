package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production install path: one `withExtensions(new GraftExtensions)`
  * session must surface every engine extension — SQL-callable native
  * expressions, the top-k planner strategy, and the window-rewrite
  * optimizer rule — with no per-query registration calls. */
class ExtensionsSpec extends AnyFunSuite {
  private val base = TestSpark.spark // keeps the shared SparkContext alive

  private def withExtSession[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extensions session: native odds expressions callable from SQL text") {
    withExtSession { s =>
      val row = s.sql(
        "SELECT normalize_odds(-100) AS n, american_to_decimal(150) AS d, " +
          "hilbert_d(5L, 3L, 8) AS h, " +
          "dot_d(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dp").head()
      assert(row.getInt(0) == 100)
      assert(row.getDouble(1) == 2.5)
      assert(row.getLong(2) == graft.operators.Layout.hilbertRef(5L, 3L, 8))
      assert(row.getDouble(3) == 32.0)
      // r13 pair kernels: 5^3 = 0b101 xor 0b011 = 0b110 → 2 bits; ADC
      // lut [10,20,30,40] with m=2/ksub=2 codes [1,0] → 20 + 30
      val r2 = s.sql(
        "SELECT hamming_l(array(5L), array(3L)) AS h, " +
          "adc_sum_l(array(1, 0), array(10L, 20L, 30L, 40L), 2) AS a").head()
      assert(r2.getInt(0) == 2 && r2.getLong(1) == 50L)
      // r16 text kernels callable from SQL text
      val r3 = s.sql(
        "SELECT shingles_s(array('a', 'b', 'c'), 2) AS sh, " +
          "size(md5_base28_l(array('a', 'b'))) AS nh, " +
          "size(minhash_sig_l(array(1L, 2L), 0, 3) ) AS nm, " +
          "simhash16_l(array(0L)) AS s0, " +
          "size(feat_embed_l(array('tok'), 8)) AS ne").head()
      assert(r3.getSeq[String](0) == Seq("a b", "b c") && r3.getInt(1) == 2 &&
        r3.getInt(2) == 3 && r3.getInt(3) == 0 && r3.getInt(4) == 8)
    }
  }

  test("extensions session: non-literal m/ksub/bits args fail analysis " +
      "with a named-argument error, not an eval-time cast") {
    withExtSession { s =>
      s.range(1).selectExpr("id", "array(1.0d, 2.0d) AS v")
        .createOrReplaceTempView("fold_guard")
      for ((sql, arg) <- Seq(
          ("SELECT pq_encode_i(v, v, CAST(id AS INT), 2) FROM fold_guard", "m"),
          ("SELECT pq_encode_i(v, v, 1, CAST(id AS INT)) FROM fold_guard", "ksub"),
          ("SELECT hilbert_d(id, id, CAST(id AS INT)) FROM fold_guard", "bits"))) {
        val e = intercept[org.apache.spark.sql.AnalysisException](s.sql(sql).head())
        assert(e.getCondition == "NON_FOLDABLE_ARGUMENT" &&
          e.getMessage.contains(s"`$arg`"),
          s"expected NON_FOLDABLE_ARGUMENT naming `$arg`, got: ${e.getMessage}")
      }
      // foldable-but-computed literals still work (constant folding)
      assert(s.sql("SELECT pq_encode_i(v, array(0.0d, 0.0d, 1.0d, 1.0d), " +
        "1 + 0, 2) AS c FROM fold_guard").head().getSeq[Int](0) == Seq(1))
    }
  }

  test("abs_max_d keeps Spark's NaN-greatest ordering (parity with " +
      "array_max(transform(v, abs)) on NaN elements)") {
    withExtSession { s =>
      // NaN late in the array: a plain `>` comparison would drop it
      val row = s.sql(
        "SELECT abs_max_d(array(3.0d, double('NaN'), 1.0d)) AS k, " +
          "array_max(transform(array(3.0d, double('NaN'), 1.0d), x -> abs(x))) AS r, " +
          "abs_max_d(array(double('NaN'), 2.0d)) AS k2").head()
      assert(row.getDouble(0).isNaN && row.getDouble(1).isNaN && row.getDouble(2).isNaN)
    }
  }

  test("extensions session: the rewrite fires on SQL-text rank filters too") {
    withExtSession { s =>
      Tables.orders(s, "/root/testdata/sf0.001").createOrReplaceTempView("orders_ext")
      val df = s.sql("""SELECT o_custkey, rnk, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders_ext) WHERE rnk <= 2""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKFinal"), s"SQL-shaped idiom must rewrite:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("extensions session: rank-limit window auto-plans as the top-k operator") {
    withExtSession { s =>
      import s.implicits._
      val df = Tables.orders(s, "/root/testdata/sf0.001")
        .withColumn("rank", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
        .where($"rank" <= 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKFinal") && plan.contains("TopKPartial"),
        s"extensions must install rule + strategy:\n$plan")
      assert(df.count() > 0)
    }
  }
}
