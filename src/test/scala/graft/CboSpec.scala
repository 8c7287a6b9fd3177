package graft

import graft.operators.Layout
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization on analyzed catalog tables
  * (Layout.analyzeTable): stats make CostBasedJoinReorder pick the
  * selective dimension join first instead of the as-written fact-fact
  * order. */
class CboSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Leaf catalog-table names of the optimized join tree, left-to-right. */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap {
      case r: LogicalRelation => r.catalogTable.map(_.identifier.table)
      case r: HiveTableRelation => Some(r.tableMeta.identifier.table)
      case _ => None
    }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("analyzed stats drive join reorder: filtered dim joins before the fact table") {
    // Catalog tables (saveAsTable): CBO reads stats from the catalog only.
    Seq("lineitem_cbo", "orders_cbo", "customer_cbo")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.saveAsTable("lineitem_cbo")
    Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .write.saveAsTable("orders_cbo")
    Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .write.saveAsTable("customer_cbo")
    Layout.analyzeTable(spark, "lineitem_cbo", Seq("l_orderkey", "l_quantity"))
    Layout.analyzeTable(spark, "orders_cbo", Seq("o_orderkey", "o_custkey"))
    Layout.analyzeTable(spark, "customer_cbo", Seq("c_custkey", "c_mktsegment"))

    // Written worst-first: fact ⋈ fact, the selective dimension last.
    val sql = """SELECT c_mktsegment, sum(l_quantity) AS q
      FROM lineitem_cbo JOIN orders_cbo ON l_orderkey = o_orderkey
      JOIN customer_cbo ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY c_mktsegment"""

    var withCbo: Seq[String] = null
    var withoutCbo: Seq[String] = null
    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
      withCbo = leafOrder(spark.sql(sql).queryExecution.optimizedPlan)
    }
    withConf("spark.sql.cbo.enabled" -> "false") {
      withoutCbo = leafOrder(spark.sql(sql).queryExecution.optimizedPlan)
    }
    assert(withoutCbo.head == "lineitem_cbo",
      s"baseline should keep the as-written order: $withoutCbo")
    assert(withCbo.head != "lineitem_cbo",
      s"CBO should not start from the fact table: $withCbo")
    assert(withCbo.toSet == withoutCbo.toSet && withCbo.size == 3)

    // Same answer either way.
    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val a = spark.sql(sql).collect()
      withConf("spark.sql.cbo.enabled" -> "false") {
        val b = spark.sql(sql).collect()
        assert(a.sameElements(b) && a.nonEmpty)
      }
    }
  }

  test("analyzeTable records row counts the planner can read") {
    // Self-contained: own table, so the test runs in isolation.
    spark.sql("DROP TABLE IF EXISTS nation_cbo")
    Tables.nation(spark, sf).write.saveAsTable("nation_cbo")
    Layout.analyzeTable(spark, "nation_cbo", Seq("n_nationkey"))
    val stats = spark.table("nation_cbo").queryExecution.optimizedPlan.stats
    // sizeInBytes is always populated; rowCount only via ANALYZE.
    withConf("spark.sql.cbo.enabled" -> "true") {
      val s = spark.table("nation_cbo").queryExecution.optimizedPlan.stats
      assert(s.rowCount.exists(_.toLong == 25L), s"rowCount: ${s.rowCount}")
    }
    assert(stats.sizeInBytes > 0)
  }
}
