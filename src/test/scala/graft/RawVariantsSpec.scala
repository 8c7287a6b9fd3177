package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The five formerly rows-only driver queries now register hash-checked
  * bound verdicts (round-7 verdict task 5); the raw nondeterministic
  * outputs stay available as `*Raw` and are exercised here so the operator
  * surfaces themselves (uuid projection, Bernoulli sample, KLL estimates,
  * HLL estimate) remain tested, not just their gates.
  */
class RawVariantsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("uuidWagersRaw: one distinct v4 uuid per purchase event") {
    val rows = Queries.uuidWagersRaw(spark, dir).collect()
    assert(rows.nonEmpty)
    val uuids = rows.map(_.getAs[String]("external_id"))
    assert(uuids.distinct.length == uuids.length)
    assert(uuids.forall(_.matches(
      "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")))
  }

  test("sampleBernoulliRaw: fraction concentrates around 0.3") {
    val total = Tables.events(spark, dir).count().toDouble
    val n = Queries.sampleBernoulliRaw(spark, dir).count().toDouble
    val sigma = math.sqrt(0.3 * 0.7 / total)
    assert(math.abs(n / total - 0.3) <= 6 * sigma,
      s"sample fraction ${n / total} outside 6 sigma of 0.3")
  }

  test("kllQuantilesRaw / kllByGroupRaw: estimates land inside the column range") {
    val g = Queries.kllQuantilesRaw(spark, dir).head()
    val (lo, hi) = {
      val r = Tables.orders(spark, dir)
        .agg(min(col("o_totalprice")).cast("double"),
          max(col("o_totalprice")).cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (p50, p90) = (g.getAs[Double]("p50_est"), g.getAs[Double]("p90_est"))
    assert(p50 >= lo && p90 <= hi && p50 <= p90)
    val groups = Queries.kllByGroupRaw(spark, dir).collect()
    assert(groups.length == 5)
    assert(groups.forall(r => r.getAs[Double]("p50_est") <= r.getAs[Double]("p90_est")))
  }

  test("vocabApproxRaw: HLL estimate within 10% of exact vocabulary") {
    val approx = Queries.vocabApproxRaw(spark, dir).head().getAs[Long]("n_vocab_approx")
    val exact = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token"))).head().getLong(0)
    assert(math.abs(approx - exact) <= exact / 10,
      s"hll $approx vs exact $exact drifts past 10%")
  }
}
